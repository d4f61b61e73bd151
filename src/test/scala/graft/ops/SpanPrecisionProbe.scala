package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-span precision audit between boundary rules (r13 ADVICE: before
  * any default flips toward gear:3, check whether its EXTRA spans are
  * real duplication or short-chunk noise).
  *
  * Method: take the detected span sets of two rules (Dedup.
  * dupSpanRanges), classify each span as COMMON (overlaps a span of
  * the other rule in the same doc) or EXCLUSIVE, deterministically
  * sample up to K per class, and ground-truth each sampled span by
  * VERBATIM SEARCH: does the span's exact text occur in some OTHER
  * document? Verbatim occurrence is a conservative precision proxy —
  * a merged span can interleave chunks shared with DIFFERENT docs and
  * still be real duplication without appearing contiguously anywhere
  * else — so the COMMON class's hit rate is the calibration baseline:
  * judge each rule's exclusive spans against it, not against 1.0.
  *
  * Usage: sbt "Test/runMain graft.ops.SpanPrecisionProbe <sfDir> [K]"
  */
object SpanPrecisionProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SpanPrecisionProbe <sfDir> [sampleK]")
    val k = if (args.length >= 2) args(1).toInt else 60
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.model.Tables(spark, args(0), "documents")
      .select(col("doc_id"), col("text"))
      .persist()
    docs.count()

    val rules = Seq("md5", "gear:3")
    val ranges = rules.map(r =>
      r -> Dedup.dupSpanRanges(docs, boundary = r).persist()).toMap
    ranges.values.foreach(_.count())

    def overlap(a: String, b: String) = {
      val ra = ranges(a).select(col("doc_id"),
        col("cs").as("a_cs"), col("ce").as("a_ce"))
      val rb = ranges(b).select(col("doc_id"),
        col("cs").as("b_cs"), col("ce").as("b_ce"))
      ra.join(rb, Seq("doc_id"))
        .filter(col("a_cs") <= col("b_ce") && col("b_cs") <= col("a_ce"))
        .select(col("doc_id"), col("a_cs").as("cs"), col("a_ce").as("ce"))
        .distinct()
    }

    for (rule <- rules) {
      val other = rules.find(_ != rule).get
      val all = ranges(rule)
      val common = overlap(rule, other)
      val exclusive = all.join(common, Seq("doc_id", "cs", "ce"), "left_anti")
      // the r13 confirm under audit: its output should measure ~1.0
      // verbatim (pair chaining over-approximates only via repeated
      // chunk hashes inside one candidate doc). r14: both edge-
      // tolerance regimes, plus the RECOVERED class (tolerant-only
      // confirms) — the r13 recall tail; its verbatim rate is the
      // precision cost of the relaxation, its size vs the strict
      // reject class's verbatim share is the recall gain.
      val strictC = Dedup.confirmContiguous(docs, all, boundary = rule,
        edgeTolerant = false)
      val tolC = Dedup.confirmContiguous(docs, all, boundary = rule,
        edgeTolerant = true)
      val rejStrict = all.join(strictC, Seq("doc_id", "cs", "ce"), "left_anti")
      val rejTol = all.join(tolC, Seq("doc_id", "cs", "ce"), "left_anti")
      val recovered = tolC.join(strictC, Seq("doc_id", "cs", "ce"), "left_anti")
      for ((cls, set) <- Seq("common" -> common, "exclusive" -> exclusive,
          "confirmed_strict" -> strictC, "rejected_strict" -> rejStrict,
          "confirmed_tol" -> tolC, "rejected_tol" -> rejTol,
          "recovered" -> recovered)) {
        val n = set.count()
        // deterministic sample: first K by (doc_id, cs)
        val sample = set.orderBy("doc_id", "cs").limit(k)
          .join(docs, Seq("doc_id"))
          .select(col("doc_id").as("p_doc"),
            expr("substring(text, CAST(cs AS INT), CAST(ce - cs + 1 AS INT))")
              .as("span_text"))
        // verbatim ground truth: the span text occurs in ANOTHER doc.
        // sample is <= K rows -> broadcast nested loop is the right plan
        val hits = docs.join(broadcast(sample),
            col("doc_id") =!= col("p_doc") &&
              expr("instr(text, span_text) > 0"))
          .select("p_doc", "span_text").distinct().count()
        val sampled = sample.count()
        val rate = if (sampled == 0) Double.NaN else hits.toDouble / sampled
        println(f"[span-precision] ${args(0)} rule=$rule class=$cls " +
          f"n=$n sampled=$sampled verbatim_hits=$hits rate=$rate%.3f")
      }
    }
    spark.stop()
  }
}
