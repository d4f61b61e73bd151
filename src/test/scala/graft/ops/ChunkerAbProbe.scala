package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** md5-vs-gear boundary-rule A/B (test-scoped main) — prices the r12
  * verdict's flagged hot loop: CdcChunks computes a full md5 digest per
  * code-point position, GearChunks a one-shift rolling hash. Two
  * measurements per decade dir:
  *
  *  - `chunk-*`: the raw chunker — explode + count + total chunk chars
  *    (isolates the per-position boundary cost from the scrub's joins);
  *  - `scrub-*`: the full scrubDupSpans pass under each boundary rule
  *    (what the pipeline stage actually pays).
  *
  * Usage: sbt "Test/runMain graft.ops.ChunkerAbProbe <dir> [<dir> ...]"
  * — or fresh-JVM via the verify-skill classpath recipe for the
  * SURVEY-quality rows.
  */
object ChunkerAbProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ChunkerAbProbe <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.ensureRegistered(spark)
    // SPARK_GRAFT_AB_SECTIONS=chunk,scrub,strict (default all) — rerun
    // one section without paying the others
    val sections = sys.env.getOrElse("SPARK_GRAFT_AB_SECTIONS",
      "chunk,scrub,strict").split(",").toSet
    def docs(dir: String) = graft.model.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val chunkers = Map("md5" -> "cdc_chunks(text, 8)",
      "gear" -> "cdc_chunks_gear(text)",
      "gear3" -> "cdc_chunks_gear(text, 3)",   // 1/8 rate: shorter chunks
      "gear5" -> "cdc_chunks_gear(text, 5)")   // 1/32 rate: longer chunks
    for (dir <- args; b <- Seq("md5", "gear", "gear3", "gear5"); rep <- 1 to 3
         if sections("chunk")) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = docs(dir)
        .select(explode(expr(chunkers(b))).as("c"))
        .agg(count(lit(1)), sum(col("c.e") - col("c.s") + 1)).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[chunker-ab] $dir chunk-$b rep$rep chunks=${r.getLong(0)} " +
        f"chars=${r.getLong(1)} sec=$sec%.2f")
    }
    for (dir <- args; b <- Seq("md5", "gear", "gear:3", "gear:5"); rep <- 1 to 2
         if sections("scrub")) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = Dedup.scrubDupSpans(docs(dir), boundary = b)
        .agg(sum(col("n_spans_cut")), sum(length(col("scrubbed")))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[chunker-ab] $dir scrub-$b rep$rep spans=${r.getLong(0)} " +
        f"chars=${r.getLong(1)} sec=$sec%.2f")
    }
    // strict contiguous-only mode: prices the confirm join
    // (pair projection + pair-hash join + span-sized aggregate), in
    // BOTH edge-tolerance regimes (r14: tolerant is the default — the
    // interior-pairs filter should price identically; the span DELTA is
    // the recovered recall tail)
    for (dir <- args; tol <- Seq(false, true); rep <- 1 to 2
         if sections("strict")) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = Dedup.scrubDupSpans(docs(dir), contiguousOnly = true,
          edgeTolerant = tol)
        .agg(sum(col("n_spans_cut")), sum(length(col("scrubbed")))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      val mode = if (tol) "tol" else "full"
      println(f"[chunker-ab] $dir scrub-strict-$mode rep$rep spans=${r.getLong(0)} " +
        f"chars=${r.getLong(1)} sec=$sec%.2f")
    }
    spark.stop()
  }
}
