package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of Dedup.scrubToFixpoint — the stricter closure over the
  * one-pass scrubDupSpans:
  *
  *  1. FIXPOINT LAW: after the wrapper, a further scrubDupSpans pass
  *     cuts nothing — no qualifying span survives in the FINAL text
  *     (the law the one-pass form can only state for the original);
  *  2. already-converged input returns rounds = 0 and byte-identical
  *     text;
  *  3. wrapper idempotence: re-running on the fixpoint is rounds = 0;
  *  4. cumulative count law: when one productive round suffices (the
  *     organic case), the cumulative n_spans_cut equals the one-pass
  *     counts exactly.
  */
class ScrubFixpointSpec extends SparkSpec {

  private def mk(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("organic fixture: fixpoint reached, final text has no qualifying span") {
    val docs = graft.model.Tables(spark, sf(), "documents")
      .select("doc_id", "text")
    val Dedup.FixpointResult(out, rounds, cleanup) = Dedup.scrubToFixpoint(docs)
    try {
      val o = out.persist()
      assert(o.count() == docs.count(), "rows preserved")
      assert(rounds >= 1, "fixture precondition: pass 1 should cut")
      // the defining law: one more pass on the FINAL text is dry
      val again = Dedup.scrubDupSpans(
        o.select(col("doc_id"), col("scrubbed").as("text")))
      assert(again.filter(col("n_spans_cut") > 0).isEmpty,
        "fixpoint violated: a further pass still cuts")
      // uncut docs byte-identical; cut docs shrink
      assert(o.filter(col("n_spans_cut") === 0 &&
        col("scrubbed") =!= col("text")).isEmpty)
      assert(o.filter(col("n_spans_cut") > 0 &&
        length(col("scrubbed")) >= length(col("text"))).isEmpty)
      if (rounds == 1) {
        // cumulative counts == the one-pass counts, doc by doc
        val onePass = Dedup.scrubDupSpans(docs)
          .select(col("doc_id"), col("n_spans_cut").as("one"))
        assert(o.join(onePass, Seq("doc_id"))
          .filter(col("n_spans_cut") =!= col("one")).isEmpty,
          "single-round cumulative counts must equal the one-pass counts")
      }
      cleanup() // idempotent; the catalog clear below covers o's persist
    } finally spark.catalog.clearCache()
  }

  test("already-converged input: rounds = 0, text byte-preserved") {
    // three docs with no shared content at all
    val docs = mk(
      1L -> ("alpha beta gamma delta " * 5),
      2L -> ("omicron pi rho sigma " * 5),
      3L -> ("zeta eta theta iota " * 5))
    val Dedup.FixpointResult(out, rounds, _) = Dedup.scrubToFixpoint(docs)
    try {
      assert(rounds == 0)
      val rows = out.orderBy("doc_id").collect()
      assert(rows.forall(r =>
        r.getAs[String]("scrubbed") == r.getAs[String]("text") &&
          r.getLong(r.fieldIndex("n_spans_cut")) == 0L))
    } finally spark.catalog.clearCache()
  }

  test("wrapper idempotence: fixpoint output re-enters at rounds = 0") {
    val docs = graft.model.Tables(spark, sf(), "documents")
      .select("doc_id", "text")
    val first = Dedup.scrubToFixpoint(docs)
    val fixed = first.scrubbed.select(col("doc_id"), col("scrubbed").as("text"))
      .persist()
    fixed.count()
    first.cleanup()
    try {
      val second = Dedup.scrubToFixpoint(fixed)
      assert(second.rounds == 0, s"re-scrub of a fixpoint ran ${second.rounds} rounds")
    } finally spark.catalog.clearCache()
  }
}
