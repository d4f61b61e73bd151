package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade probe for Dedup.scrubToFixpoint (r13, VERDICT #5's "measured
  * round count"): productive rounds, cumulative spans cut, and
  * wall-clock per decade dir, under both boundary rules. The
  * expectation the spec encodes qualitatively — organic corpora
  * converge in ~1 round — gets its numbers here.
  *
  * Usage: sbt "Test/runMain graft.ops.ScrubFixpointProbe <dir> [...]"
  */
object ScrubFixpointProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScrubFixpointProbe <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args; b <- Seq("md5", "gear")) {
      spark.catalog.clearCache()
      val docs = graft.model.Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val t0 = System.nanoTime()
      val fx = Dedup.scrubToFixpoint(docs, boundary = b)
      val r = fx.scrubbed.agg(sum(col("n_spans_cut")),
        sum(length(col("scrubbed"))), count(lit(1))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      fx.cleanup()
      println(f"[fixpoint] $dir boundary=$b rounds=${fx.rounds} " +
        f"spans=${r.getLong(0)} chars=${r.getLong(1)} rows=${r.getLong(2)} " +
        f"sec=$sec%.2f")
    }
    spark.stop()
  }
}
