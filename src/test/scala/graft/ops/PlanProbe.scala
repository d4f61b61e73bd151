package graft.ops

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector (test scope, not shipped): prints the executed
  * plan of a declared query plus exchange/reuse counts — the tool for
  * checking that a plan change kept the shuffle story (ReuseExchange
  * firing, no shuffled joins) without waiting on a bench sweep.
  *
  * sbt "Test/runMain graft.ops.PlanProbe q78_simhash_neardup"
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q78_simhash_neardup")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    if (q == "cc") { ccProbe(dir); return }
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_TARGET forces the band-bucket split dial (probe the
    // big-branch plan shape without editing code)
    sys.env.get("SPARK_GRAFT_TARGET")
      .foreach(t => spark.conf.set("spark.graft.bandBucketTarget", t))
    val df = graft.SparkEntry.queries(q)(spark, dir)
    // run THIS DataFrame's own query execution (a noop write would spawn a
    // separate one) so the adaptive plan finalizes — exchange/stage reuse
    // only materializes in the final plan (isFinalPlan=true)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println(s"== $q ==")
    println("reused_exchange=" + "ReusedExchange".r.findAllIn(plan).length)
    println("shuffle_exchange=" + "Exchange hashpartitioning".r.findAllIn(plan).length)
    println("native_agg_calls=" + "(simhash_agg|minhash_agg)".r.findAllIn(plan).length)
    println(plan)
  }

  /** Times q100's two phases separately and reports the star-contraction
    * round count on the real corpus.
    */
  private def ccProbe(dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val edges = graft.ops.Dedup.nearDupPairs(
      graft.model.Tables(spark, dir, "documents"), 3)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .localCheckpoint(true)
    val t1 = System.nanoTime()
    val (labels, rounds) = graft.ops.Dedup.connectedComponentsWithRounds(edges)
    val n = labels.count()
    val t2 = System.nanoTime()
    println(s"pairs_sec=${(t1 - t0) / 1e9} cc_sec=${(t2 - t1) / 1e9} rounds=$rounds labels=$n")
  }
}
