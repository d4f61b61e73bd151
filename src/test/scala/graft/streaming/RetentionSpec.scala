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
