package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join handling — the runtime half of the skew story (q55's
  * salted aggregation is the manual half for AGG keys, which AQE does
  * not cover). A 90%-one-key join side under tiny advisory thresholds
  * must make AQE split the skewed partition at runtime: the executed
  * SortMergeJoin carries the `skew=true` marker and the job completes
  * with the exact join cardinality.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed join partition at runtime (skew=true in plan)") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // tiny thresholds so local-scale data counts as skewed
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // force a sort-merge join — broadcast would bypass the skew path
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // left: 50k rows, 90% on key 0; right: 200 distinct keys
      val left = spark.range(0, 50000)
        .select((when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 200))
          .as("k"), col("id").as("payload"))
      val right = spark.range(0, 200).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("name"))
      val joined = left.join(right, "k")
      // execute THROUGH this QueryExecution: count() would run its own
      // execution and leave this one's adaptive plan un-finalized (the
      // same trap Bucketing.numShuffles documents)
      val qe = joined.queryExecution
      val n = qe.executedPlan.execute().count()
      // exact cardinality: every left row matches exactly one right row
      assert(n == 50000L)

      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skew join:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
