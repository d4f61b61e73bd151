package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proof of the bucketing contract: a join and an aggregation on the
  * bucket key plan ZERO shuffle exchanges, results match the unbucketed
  * formulation, and equality predicates prune to a single bucket.
  */
class BucketingSpec extends SparkSpec {

  private val buckets = 8

  test("co-bucketed join and agg plan zero shuffles; results match; pruning engages") {
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val orders = Tables(spark, sf(), "orders")
    val lineitem = Tables(spark, sf(), "lineitem")
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", buckets, s"$dir/orders")
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", buckets, s"$dir/lineitem")

    // broadcast off: a broadcast join would hide the exchange question
    // (and at fact⋈fact scale broadcasting is not an option anyway);
    // AQE left ON — numShuffles descends into the adaptive plan
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ob = spark.table("orders_b")
      val lb = spark.table("lineitem_b")

      val joined = ob.join(lb, "o_orderkey")
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      joined.write.format("noop").mode("overwrite").save()
      assert(Bucketing.numShuffles(joined) == 0,
        "co-bucketed join + same-key agg must need no exchange")

      val agg = lb.groupBy("o_orderkey")
        .agg(sum(col("l_quantity")).as("q"))
      agg.write.format("noop").mode("overwrite").save()
      assert(Bucketing.numShuffles(agg) == 0,
        "agg on the bucket key must need no exchange")

      // same numbers as the raw-parquet formulation
      val expected = orders
        .join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"))
        .count()
      assert(ob.join(lb, "o_orderkey").count() == expected)

      // point predicate prunes to one bucket of N — needs the bucketed
      // scan pinned on: with no distribution-requiring operator below,
      // autoBucketedScan reverts to a plain scan (see Bucketing scaladoc)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val someKey = ob.select("o_orderkey").head.getLong(0)
      val pruned = ob.filter(col("o_orderkey") === someKey)
      pruned.write.format("noop").mode("overwrite").save()
      assert(Bucketing.prunedTo(pruned, 1, buckets),
        "equality on the bucket column must prune to 1 bucket")
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      Bucketing.drop(spark, "orders_b", "lineitem_b")
    }
  }
}
