package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q78's banded candidate generation claims FULL recall at hamming <= 3
  * (4 bands × 16 bits: 3 differing bits leave >= 1 band identical by
  * pigeonhole). Prove it against the brute-force all-pairs computation
  * on the real corpus — if banding dropped any qualifying pair, the two
  * result sets would differ.
  */
class DedupPairsSpec extends SparkSpec {

  test("q78 banded near-dup pairs == brute-force all-pairs (sf0.001)") {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val dir = sf()
    val banded = graft.SparkEntry.queries("q78_simhash_neardup")(spark, dir)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
      .collect().toSet

    // brute force: same signature aggregation, full a<b cross join
    val sig = graft.model.Tables(spark, dir, "documents")
      .filter(col("text") =!= "")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
      .groupBy(col("doc_id"))
      .agg(expr("simhash_agg(md5(w))").as("sh"))
    def half(c: org.apache.spark.sql.Column, off: Int) =
      conv(substring(c, off, 8), 16, 10).cast("long")
    val ham =
      (bit_count(half(col("sa.sh"), 1).bitwiseXOR(half(col("sb.sh"), 1))) +
        bit_count(half(col("sa.sh"), 9).bitwiseXOR(half(col("sb.sh"), 9))))
        .cast("long")
    val brute = sig.as("sa").crossJoin(sig.as("sb"))
      .filter(col("sa.doc_id") < col("sb.doc_id"))
      .select(col("sa.doc_id").as("doc_a"), col("sb.doc_id").as("doc_b"),
        ham.as("hamming"))
      .filter(col("hamming") <= 3)
      .as[(Long, Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
      .collect().toSet

    assert(banded == brute)
    assert(banded.nonEmpty) // the corpus has exact dups → hamming-0 pairs
  }

  test("hamming halves formulation matches per-nibble popcount (property)") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    // random-ish 16-hex pairs from md5 — compare the conv/xor/bit_count
    // halves path (q78's) against a per-nibble lookup-table fold (the
    // oracle's formulation)
    val pairs = (1 to 64).map(i => (md5Hex(s"a$i").take(16), md5Hex(s"b$i").take(16)))
      .toDF("ha", "hb")
    val halves = pairs.withColumn("d", {
      def half(c: String, off: Int) =
        conv(substring(col(c), off, 8), 16, 10).cast("long")
      (bit_count(half("ha", 1).bitwiseXOR(half("hb", 1))) +
        bit_count(half("ha", 9).bitwiseXOR(half("hb", 9)))).cast("long")
    })
    val nibble = pairs.withColumn("d2", expr(
      """CAST(aggregate(sequence(1, 16), 0, (acc, p) ->
        |  acc + CAST(substr('0112122312232334',
        |    ((instr('0123456789abcdef', substr(ha, p, 1)) - 1) ^
        |     (instr('0123456789abcdef', substr(hb, p, 1)) - 1)) + 1, 1) AS INT)) AS BIGINT)""".stripMargin))
    val diff = halves.join(nibble, Seq("ha", "hb"))
      .filter(col("d") =!= col("d2")).count()
    assert(diff == 0)
  }

  test("hamming_pairs emits exactly the qualifying a<b pairs") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val rows = Seq(Seq(
      (1L, "0000000000000000"),
      (2L, "0000000000000001"), // d(1,2)=1
      (3L, "000000000000000f"), // d(1,3)=4, d(2,3)=3
      (4L, "ffffffffffffffff"))) // d=64/63/60 vs the rest
      .toDF("ds")
    val got = rows.select(explode(expr("hamming_pairs(ds, 3)")).as("p"))
      .select("p.a", "p.b", "p.hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 3L)))
  }

  test("hamming_pairs equals scala brute force on seeded random signatures") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val rnd = new scala.util.Random(7)
    // two-nibble space: per-position hamming is Bernoulli(1/2), so
    // ~4% of pairs land under threshold 4 — enough to exercise both
    // branches without the expected set being empty
    val docs = (1L to 300L).map(id =>
      (id, (1 to 16).map(_ => "01".charAt(rnd.nextInt(2))).mkString))
    val expected = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      d = sa.zip(sb).map { case (x, y) =>
        Integer.bitCount(Character.digit(x, 16) ^ Character.digit(y, 16))
      }.sum if d <= 4
    } yield (a, b, d.toLong)).toSet
    val got = Seq(docs).toDF("ds")
      .select(explode(expr("hamming_pairs(ds, 4)")).as("p"))
      .select("p.a", "p.b", "p.hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("minhash_pairs agree counts equal scala brute force on seeded signatures") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val rnd = new scala.util.Random(11)
    // 4-symbol slot alphabet → slot agreement ~1/4: exercises every
    // agree value without degenerate all-equal/all-distinct inputs
    val docs = (1L to 40L).map(id =>
      (id, (1 to 16).map(_ => md5Hex("s" + rnd.nextInt(4)))))
    val expected = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
    } yield (a, b, sa.zip(sb).count { case (x, y) => x == y })).toSet
    val got = Seq(docs.map { case (id, sig) => (id, sig) }).toDF("ds")
      .select(explode(expr("minhash_pairs(ds)")).as("p"))
      .select("p.a", "p.b", "p.agree")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q79 fused estimator == signature-join formulation, and its plan has no shuffle join") {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val dir = sf()
    val fused = graft.SparkEntry.queries("q79_minhash_jaccard_est")(spark, dir)
    // the whole point of the fusion: NO signature join survives after
    // the bucket groupBy (boundedPairs splits oversized buckets with
    // slicing + a repartition, never a join); a shuffled join means
    // the signature re-join crept back in, and anything beyond a
    // single broadcast means a size pre-pass was reintroduced
    val phys = fused.queryExecution.executedPlan
    val shuffled = phys.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shuffled.isEmpty, s"q79 plan contains ${shuffled.size} shuffle join(s)")
    val bcast = phys.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bcast.size <= 1, s"q79 plan contains ${bcast.size} broadcast join(s)")

    // reference formulation: candidates re-joined to the signature table
    // on both sides (the pre-fusion shape), estimator via zip_with
    val sig = graft.model.Tables(spark, dir, "documents")
      .filter(col("text") =!= "")
      .select(col("doc_id"), explode(expr("text_shingles(text)")).as("sh"))
      .distinct()
      .groupBy(col("doc_id")).agg(expr("minhash_agg(sh)").as("sig"))
      .persist()
    val bands = sig.select(col("doc_id"), explode(array(
      (0 until 4).map { b =>
        struct(lit(b).as("band"),
          md5(concat_ws("|",
            (0 until 4).map(r => element_at(col("sig"), b * 4 + r + 1)): _*)).as("bh"))
      }: _*)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bh").as("bh"))
    val cand = bands.groupBy(col("band"), col("bh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .select(explode(expr("array_pairs(ds)")).as("p"))
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("shared_bands"))
    val joined = cand.join(sig.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sig.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("shared_bands"),
        (expr("""aggregate(zip_with(sa.sig, sb.sig, (x, y) -> IF(x = y, 1, 0)),
                |          0, (acc, v) -> acc + v)""".stripMargin)
          .cast("double") / 16.0d).as("est_jac"))
    val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaDouble)
    val a = fused.select("doc_a", "doc_b", "shared_bands", "est_jac").as[(Long, Long, Long, Double)](enc).collect().toSet
    val b = joined.as[(Long, Long, Long, Double)](enc).collect().toSet
    sig.unpersist()
    assert(a == b && a.nonEmpty)
  }

  test("connectedComponents labels chained/path/disjoint graphs with component minima") {
    import spark.implicits._
    // chain 1-2-3 (transitive: 1!~3 directly), disjoint pair 7-8, and a
    // long path 10..19 — the path's diameter forces multi-round
    // convergence (HashMin moves a label one hop per round)
    val chain = Seq((1L, 2L), (2L, 3L), (7L, 8L))
    val path = (10L until 19L).map(i => (i, i + 1))
    val edges = (chain ++ path).toDF("a", "b")
    val got = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val expected =
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L) ++
        (10L to 19L).map(_ -> 10L).toMap
    assert(got == expected)
    // singleton nodes (in no edge) never appear
    assert(!got.contains(4L))
  }

  test("star contraction labels a 1000-link chain in logarithmic rounds") {
    import spark.implicits._
    // the case HashMin propagation could NOT survive: a path graph of
    // diameter 1000 needs ~500 one-hop rounds (tripping the 50-round
    // guard — a hard failure); alternating large-star/small-star
    // halves component height per round and must land in single digits
    val edges = (1L until 1000L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(edges)
    val got = labels.as[(Long, Long)].collect()
    assert(got.length == 1000 && got.forall(_._2 == 1L))
    // ≤ 10 contraction rounds + 1: the convergence probe rides the NEXT
    // round's large-star aggregate (free), so the fixpoint is observed
    // one identity round after it is reached
    assert(rounds <= 11, s"chain took $rounds rounds")
  }

  test("star contraction labels equal union-find on a seeded random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // sparse random graph: mixes singletons-in-edges, small clusters,
    // and one emergent giant component
    val edges = (1 to 300).map(_ => (rnd.nextInt(200) + 1L, rnd.nextInt(200) + 1L))
      .filter { case (a, b) => a != b }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val expected = nodes.map(n => n -> find(n)).toMap
    val got = Dedup.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("connectedComponents is insensitive to edge orientation and duplication") {
    import spark.implicits._
    val e1 = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val e2 = Seq((2L, 1L), (3L, 2L), (1L, 2L), (2L, 3L)).toDF("a", "b")
    val r1 = Dedup.connectedComponents(e1).as[(Long, Long)].collect().toSet
    val r2 = Dedup.connectedComponents(e2).as[(Long, Long)].collect().toSet
    assert(r1 == r2 && r1 == Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("minhash_pairs fails actionably past the pair-expansion cap") {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    val e = intercept[Throwable] {
      Seq(1).toDF("x").select(expr(
        """minhash_pairs(transform(sequence(1, 70000),
          |  i -> named_struct('doc_id', CAST(i AS BIGINT),
          |                    'sig', array('aa'))))""".stripMargin))
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null && m.contains("cap bucket size upstream")))
  }

  test("hamming_pairs fails actionably past the bucket-size cap") {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    // constant-foldable input → may evaluate locally (bare
    // IllegalArgumentException) or in a task (wrapped SparkException)
    val e = intercept[Throwable] {
      Seq(1).toDF("x").select(expr(
        """hamming_pairs(transform(sequence(1, 100001),
          |  i -> named_struct('doc_id', CAST(i AS BIGINT),
          |                    'sh', '0000000000000000')), 3)""".stripMargin))
        .collect()
    }
    // the root-cause message must tell the caller WHAT to do
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null && m.contains("cap bucket size upstream")))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
