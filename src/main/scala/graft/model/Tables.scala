package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Test-table access + canonical schemas (FIXTURES.md §1).
  *
  * All declared queries read the driver-generated parquet tables under a
  * scale-factor directory (`/root/testdata/sf*`). At 100 TB the same loader
  * would point at a date-partitioned table root; Catalyst partition pruning
  * and parquet filter/column pushdown make the access path identical.
  */
object Tables {
  /** Load one test table from `sfDir`. Parquet → vectorized columnar scan;
    * filters/projections applied by callers are pushed into the scan by
    * Catalyst (SURVEY.md §4.1).
    *
    * `events.parquet` carries TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]); it is read with
    * `nanosAsLong` and floor-converted ns→µs — the same truncation DuckDB
    * applies, so oracle comparisons stay sound (FIXTURES.md §1).
    */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df =
      if (name == "events") {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$sfDir/$name.parquet")
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      } else {
        spark.read.parquet(s"$sfDir/$name.parquet")
      }
    // Parquet ms-timestamps surface as TIMESTAMP_NTZ; normalize to
    // TIMESTAMP (identical instants under the forced UTC session) so
    // unix_millis & friends apply uniformly.
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case TimestampNTZType => d.withColumn(f.name, col(f.name).cast(TimestampType))
        case _ => d
      }
    }
  }

  /** Unified metric-store schema — the Spark mapping of the reference's
    * point model `(measurement, time, value: FLOAT)`
    * (reference index.js:196-202): series-as-column in ONE table instead of
    * measurement-per-series, so cross-series queries are plain filters.
    */
  val metricsSchema: StructType = StructType(Seq(
    StructField("series", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("value", DoubleType, nullable = true)
  ))
}
