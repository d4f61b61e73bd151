package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The degenerate-band-bucket guard (Dedup.boundedPairs): oversized LSH
  * buckets are triangle-split across sub-buckets so no single task runs
  * an unbounded O(k²) pair expansion. The split must be OUTPUT-
  * PRESERVING — these tests force real splitting (tiny targets) and
  * prove the declared q78/q79/q85 results are unchanged, then bound the
  * sub-bucket sizes a synthetic mega-bucket produces.
  */
class BandBucketSplitSpec extends SparkSpec {

  private val dial = "spark.graft.bandBucketTarget"

  private def withTarget[A](t: Int)(body: => A): A = {
    spark.conf.set(dial, t.toString)
    try body finally spark.conf.unset(dial)
  }

  private def rows(name: String, t: Option[Int]): Set[String] = {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    def run() = graft.SparkEntry.queries(name)(spark, sf())
      .collect().map(_.toString).toSet
    t match {
      case Some(v) => withTarget(v)(run())
      case None => run()
    }
  }

  for (q <- Seq("q78_simhash_neardup", "q79_minhash_jaccard_est", "q85_minhash_lsh")) {
    test(s"$q output is unchanged when every bucket is force-split (target=4)") {
      // target=4 puts nearly every band bucket above the dial (m > 1,
      // multi-sub-bucket routing + post-filter everywhere) — the split
      // machinery runs on the whole corpus, and the declared output
      // must not move
      val split = rows(q, Some(4))
      val whole = rows(q, None)
      assert(split == whole, s"$q: forced split changed the output")
      assert(whole.nonEmpty)
    }
  }

  test("q85 output is unchanged at the target=1 edge (every slice is 1 member)") {
    // the degenerate dial: m = bucket size, single-member slices, the
    // within-slice (i = j) triangle emits nothing and ALL pairs come from
    // cross-slice sub-rows — the exactly-once boundary filter is the only
    // thing standing between this and duplicates (PlanLintSpec runs the
    // same dial for its reuse gate, so the shape it gates is proven here)
    val split = rows("q85_minhash_lsh", Some(1))
    val whole = rows("q85_minhash_lsh", None)
    assert(split == whole, "q85: target=1 split changed the output")
    assert(whole.nonEmpty)
  }

  test("mega-bucket: split pairs == brute force, every sub-bucket bounded") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    // one degenerate bucket: 500 members sharing a single band value —
    // the boilerplate-corpus failure the guard exists for
    val n = 500
    val target = 25
    val bands = (1L to n.toLong).toDF("doc_id")
      .withColumn("band", lit(0)).withColumn("bh", lit("deadbeef"))
    val got = withTarget(target) {
      Dedup.boundedPairs(bands, Seq("band", "bh"),
        identity, col("doc_id"),
        ds => call_function("array_pairs", ds))
        .select(col("p.a"), col("p.b")).as[(Long, Long)].collect().toSet
    }
    val expected = (for {
      a <- 1L to n.toLong; b <- (a + 1) to n.toLong
    } yield (a, b)).toSet
    assert(got == expected) // exactly once each: no loss, no duplication

    // bound: every triangle sub-row carries at most 2·target members
    // and the mega bucket really fans out into m(m+1)/2 sub-rows —
    // the single-task quadratic is gone by construction
    val m = math.ceil(n.toDouble / target).toInt
    val subs = withTarget(target) {
      Dedup.triangleSubRows(
        bands.groupBy(col("band"), col("bh"))
          .agg(sort_array(collect_list(col("doc_id"))).as("ds")),
        Seq("band", "bh"), identity)
        .select(size(col("ds"))).as[Int].collect()
    }
    assert(subs.length == m * (m + 1) / 2 && m > 1)
    assert(subs.max <= 2 * target,
      s"sub-row of ${subs.max} members exceeds the 2×target bound")
  }

  test("struct members split identically (hamming_pairs path, threshold kept)") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    // members carry the signature into the bucket (q78's shape); the
    // split must keep the fused threshold semantics
    val sigs = (1L to 120L).map { id =>
      val nib = "0123456789abcdef" ((id % 4).toInt)
      (id, nib.toString * 16) // 4 signature classes, hamming 0 within
    }
    val bands = sigs.toDF("doc_id", "sh")
      .select(lit(0).as("band"), lit("x").as("bv"),
        struct(col("doc_id"), col("sh")).as("e"))
    val got = withTarget(8) {
      Dedup.boundedPairs(bands, Seq("band", "bv"), _.getField("doc_id"), col("e"),
        ds => call_function("hamming_pairs", ds, lit(0)))
        .select(col("p.a"), col("p.b")).as[(Long, Long)].collect().toSet
    }
    val expected = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b && sa == sb
    } yield (a, b)).toSet
    assert(got == expected && expected.nonEmpty)
  }
}
