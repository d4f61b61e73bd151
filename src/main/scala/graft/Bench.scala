package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver
  * (BENCH_r{N}.json).
  *
  * Each query is fully materialized through a `noop` write: unlike
  * `count()`, which lets Catalyst drop sorts/projections and answer from
  * statistics, the noop sink executes the complete physical plan — the
  * number measured is the number a real sink would see.
  *
  * Every query runs once untimed (codegen compilation, JIT, broadcast
  * thread-pool spin-up) and the second, steady-state run is reported —
  * cold-JVM overhead is a constant ~1-3 s per query that would otherwise
  * swamp sub-second operators.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try run(fn) catch { case e: Throwable =>
        System.err.println(s"[bench] $name warmup failed: ${e.getMessage}")
      }
      // the warmup's persisted subplans would satisfy the timed run via
      // plan-canonicalization cache lookup — clear so the timed run pays
      // for its own intermediates
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try run(fn)
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // drop persisted subplans between queries
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
