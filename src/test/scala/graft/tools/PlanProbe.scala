package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector (test scope, not shipped): prints the executed
  * plan of a declared query plus exchange/reuse counts — the tool for
  * checking that a plan change kept the shuffle story (ReuseExchange
  * firing, no shuffled joins) without waiting on a bench sweep.
  *
  * sbt "Test/runMain graft.tools.PlanProbe q78_simhash_neardup"
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q78_simhash_neardup")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(q)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    println(s"== $q ==")
    println("reused_exchange=" + "ReusedExchange".r.findAllIn(plan).length)
    println("shuffle_exchange=" + "Exchange hashpartitioning".r.findAllIn(plan).length)
    println("native_agg_calls=" + "(simhash_agg|minhash_agg)".r.findAllIn(plan).length)
    println(plan)
  }
}
