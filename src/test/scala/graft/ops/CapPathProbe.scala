package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Exact-vs-sketch DF-cap A/B (test-scoped main) — measures the q95/q81
  * stop-gram cap's two implementations at soak scale, the "sketch-cap
  * crossover" dial SURVEY §8 documents: the exact path pays two
  * gram-domain-sized exchanges (DISTINCT + groupBy.count + semi-join,
  * sharing one exchange via reuse), the sketch path replaces the count
  * + semi-join with a Count-Min pass and a map-side filter.
  *
  * Usage: sbt "Test/runMain graft.ops.CapPathProbe <dir> [<dir> ...]"
  */
object CapPathProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CapPathProbe <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def grams(dir: String) = graft.model.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(expr("char_ngrams(text, 8)"))).as("g"))
    for (dir <- args; mode <- Seq("exact", "sketch"); rep <- 1 to 2) {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df =
        if (mode == "exact") Extensions.capJaccardPairs(grams(dir), "g", 50, 0.5)
        else Extensions.capJaccardPairsSketch(grams(dir), "g", 50, 0.5)
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[cap-probe] $dir $mode rep$rep rows=$n sec=$sec%.2f")
    }
    spark.stop()
  }
}
