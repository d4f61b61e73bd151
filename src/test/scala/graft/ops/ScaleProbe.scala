package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-soak probe (test-scoped main) — the measurement tool behind
  * SURVEY §8's scaling-decade table.
  *
  * Usage: `sbt "Test/runMain graft.ops.ScaleProbe <dirA> <dirB>"`,
  * where each dir holds `documents.parquet` / `embeddings.parquet`
  * (e.g. `/root/testdata/sf0.1` and a 10× corpus built from it).
  * Prints, for the dedup/similarity family, per-scale output row
  * counts (the construction-validation signal: linear outputs mean the
  * replicas don't cross-contaminate) and the connected-components
  * contraction round count (the O(log n) claim, measured).
  *
  * Timing lives in graft.Bench (`SPARK_GRAFT_ONLY=...`); this probe is
  * about WORK VOLUME, which bench times can't attribute.
  */
object ScaleProbe {
  private val Family = Seq(
    "q78_simhash_neardup", "q79_minhash_jaccard_est", "q81_shingle_jaccard",
    "q85_minhash_lsh", "q95_ngram_jaccard", "q99_knn_join", "q100_dup_clusters")

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: ScaleProbe <sfDir> [<sfDir2> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      for (q <- Family) {
        val n = graft.SparkEntry.queries(q)(spark, dir).count()
        println(s"[scale-probe] rows $dir $q $n")
      }
      val pairs = graft.SparkEntry.queries("q78_simhash_neardup")(spark, dir)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      val (labels, rounds) = Dedup.connectedComponentsWithRounds(pairs)
      println(s"[scale-probe] cc $dir rounds=$rounds members=${labels.count()} " +
        s"clusters=${labels.select("cluster").distinct().count()}")
    }
    spark.stop()
  }
}
