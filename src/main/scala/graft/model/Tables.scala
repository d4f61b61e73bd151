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
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Keep the raw ns column (`ts_ns`) alongside the µs-truncated
      // timestamp: range predicates belong on `ts_ns` (a plain BIGINT the
      // parquet scan can push down and prune row groups with — see
      // `nsOf`); `ts` is for bucketing/window/output use.
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    } else {
      // ms-timestamps surface as TIMESTAMP_NTZ. Deliberately NOT cast
      // here: filters on the native NTZ column push into the parquet
      // scan, while a wrapped cast(ntz as timestamp) defeats pushdown.
      // Use [[epochMs]] when projecting epoch millis.
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Epoch milliseconds of any timestamp flavor (TIMESTAMP or
    * TIMESTAMP_NTZ — identical instants under the forced UTC session).
    * Projection-side only; never wrap a filter column with this.
    */
  def epochMs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unix_millis(c.cast(TimestampType))

  /** Nanoseconds since epoch for a UTC date/time literal — the pushdown
    * domain of the events `ts_ns` column.
    */
  def nsOf(isoUtc: String): Long =
    java.time.LocalDateTime.parse(isoUtc.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
      .toEpochMilli * 1000000L

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
