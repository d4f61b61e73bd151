package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Retention partition-drop semantics (reference index.js:269-282 →
  * SURVEY.md §3.3): whole days before the cutoff vanish without reading
  * data; the edge day is rewritten to sub-day precision; rows at/after the
  * cutoff survive (reference deletes `time < cutoff` exclusively).
  */
class RetentionSpec extends SparkSpec {

  test("drops whole partitions before cutoff, rewrites the edge day") {
    import spark.implicits._
    val dir = Files.createTempDirectory("retention").toString
    val rows = Seq(
      ("cpu", Timestamp.valueOf("2024-01-01 05:00:00"), 1.0),
      ("cpu", Timestamp.valueOf("2024-01-02 05:00:00"), 2.0),
      ("cpu", Timestamp.valueOf("2024-01-03 05:00:00"), 3.0), // edge: before cutoff time
      ("cpu", Timestamp.valueOf("2024-01-03 18:00:00"), 4.0), // edge: after cutoff time
      ("cpu", Timestamp.valueOf("2024-01-04 05:00:00"), 5.0)
    ).toDF("series", "ts", "value")
      .withColumn("p_date", to_date(col("ts")))
    rows.write.mode("overwrite").partitionBy("p_date").parquet(dir)

    val (dropped, rewritten) =
      Retention.enforce(spark, dir, Timestamp.valueOf("2024-01-03 12:00:00"))
    assert(dropped == 2)   // 01-01, 01-02 gone without a read
    assert(rewritten == 1) // 01-03 filtered to ts >= cutoff

    val left = spark.read.parquet(dir).select("value")
      .as[Double].collect().sorted.toSeq
    assert(left == Seq(4.0, 5.0))
  }

  test("per-series cutoffs: short-retention series expires while long survives") {
    import spark.implicits._
    val dir = Files.createTempDirectory("retention3").toString
    val rows = Seq(
      // cpu retains from 01-03 12:00; mem retains everything from 01-01
      ("cpu", Timestamp.valueOf("2024-01-01 05:00:00"), 1.0),
      ("mem", Timestamp.valueOf("2024-01-01 05:00:00"), 10.0),
      ("cpu", Timestamp.valueOf("2024-01-02 05:00:00"), 2.0),
      ("mem", Timestamp.valueOf("2024-01-02 05:00:00"), 20.0),
      ("cpu", Timestamp.valueOf("2024-01-03 05:00:00"), 3.0),  // before cpu cutoff time
      ("cpu", Timestamp.valueOf("2024-01-03 18:00:00"), 4.0),  // after cpu cutoff time
      ("mem", Timestamp.valueOf("2024-01-03 05:00:00"), 30.0),
      ("gpu", Timestamp.valueOf("2024-01-01 05:00:00"), 99.0)  // no policy: kept
    ).toDF("series", "ts", "value")
      .withColumn("p_date", to_date(col("ts")))
    rows.write.mode("overwrite").partitionBy("p_date").parquet(dir)

    val (dropped, rewritten) = Retention.enforcePerSeries(spark, dir, Map(
      "cpu" -> Timestamp.valueOf("2024-01-03 12:00:00"),
      "mem" -> Timestamp.valueOf("2024-01-01 00:00:00")))
    // no day is before EVERY cutoff (mem keeps from 01-01) → no drops;
    // days 01-01..01-03 rewritten with the per-series predicate
    assert(dropped == 0 && rewritten == 3)
    val left = spark.read.parquet(dir)
      .select("series", "value").as[(String, Double)].collect().toSet
    assert(left == Set(("cpu", 4.0),
      ("mem", 10.0), ("mem", 20.0), ("mem", 30.0), ("gpu", 99.0)))
  }

  test("per-series cutoffs: days before every cutoff drop without a read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("retention4").toString
    Seq(("cpu", Timestamp.valueOf("2024-01-01 05:00:00"), 1.0),
      ("mem", Timestamp.valueOf("2024-01-01 06:00:00"), 2.0),
      ("cpu", Timestamp.valueOf("2024-01-05 05:00:00"), 3.0),
      ("mem", Timestamp.valueOf("2024-01-05 06:00:00"), 4.0))
      .toDF("series", "ts", "value")
      .withColumn("p_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("p_date").parquet(dir)
    val (dropped, rewritten) = Retention.enforcePerSeries(spark, dir, Map(
      "cpu" -> Timestamp.valueOf("2024-01-04 00:00:00"),
      "mem" -> Timestamp.valueOf("2024-01-03 00:00:00")),
      allSeries = Set("cpu", "mem"))
    // 01-01 is before both cutoffs AND the inventory proves every series
    // has a policy → metadata drop; 01-05 is at/after the latest cutoff's
    // midnight → untouched
    assert(dropped == 1 && rewritten == 0)
    val left = spark.read.parquet(dir).select("value").as[Double].collect().sorted.toSeq
    assert(left == Seq(3.0, 4.0))
  }

  test("no-policy series in a day older than every cutoff is kept, not dropped") {
    import spark.implicits._
    val dir = Files.createTempDirectory("retention5").toString
    Seq(("cpu", Timestamp.valueOf("2024-01-01 05:00:00"), 1.0),
      ("gpu", Timestamp.valueOf("2024-01-01 06:00:00"), 99.0), // no policy
      ("cpu", Timestamp.valueOf("2024-01-05 05:00:00"), 3.0))
      .toDF("series", "ts", "value")
      .withColumn("p_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("p_date").parquet(dir)
    // no allSeries inventory → the cutoff map can't be proven complete, so
    // 01-01 must go through the per-series rewrite (keeping gpu) rather
    // than a wholesale fs.delete
    val (dropped, rewritten) = Retention.enforcePerSeries(spark, dir, Map(
      "cpu" -> Timestamp.valueOf("2024-01-04 00:00:00")))
    assert(dropped == 0 && rewritten == 1)
    val left = spark.read.parquet(dir)
      .select("series", "value").as[(String, Double)].collect().toSet
    assert(left == Set(("gpu", 99.0), ("cpu", 3.0)))
  }

  test("midnight cutoff needs no edge rewrite (pure partition drop)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("retention2").toString
    Seq(("cpu", Timestamp.valueOf("2024-01-01 05:00:00"), 1.0),
      ("cpu", Timestamp.valueOf("2024-01-02 05:00:00"), 2.0))
      .toDF("series", "ts", "value")
      .withColumn("p_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("p_date").parquet(dir)
    val (dropped, rewritten) =
      Retention.enforce(spark, dir, Timestamp.valueOf("2024-01-02 00:00:00"))
    assert(dropped == 1 && rewritten == 0)
    val left = spark.read.parquet(dir).select("value").as[Double].collect().toSeq
    assert(left == Seq(2.0))
  }
}
