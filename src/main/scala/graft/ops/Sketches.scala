package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate aggregates — the sketch tier a 100 TB profile/monitoring
  * pass runs where exact answers would force full shuffles of the key
  * domain (SURVEY.md §2.3 notes these are deliberately OUTSIDE the
  * oracle-checked inventory: approximate results cannot hash-match across
  * engines; their contract is an error bound, which the spec asserts
  * against the exact answer instead).
  *
  *  - [[approxDistinct]] — HyperLogLog++ (`approx_count_distinct`):
  *    fixed-size sketch per group, one narrow shuffle of sketch bytes vs
  *    the exact rollup's shuffle of every distinct key. `rsd` dials
  *    sketch size against precision (default 5%).
  *  - [[approxQuantiles]] — Greenwald-Khanna (`approx_percentile`):
  *    mergeable quantile summaries, same narrow-shuffle property;
  *    `accuracy` is the GK epsilon inverse.
  *
  * Both are Datasketches-style mergeable summaries: map-side partials
  * combine associatively, so the plan shape is identical to a plain
  * map-side-partial aggregation no matter the cluster size.
  */
object Sketches {

  /** Approximate distinct users per event type (exact form: q31). */
  def approxDistinct(s: SparkSession, dir: String, rsd: Double = 0.05): DataFrame =
    Tables(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))

  /** Approximate price quartiles per return flag (exact form: q38). */
  def approxQuantiles(s: SparkSession, dir: String, accuracy: Int = 10000): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.25), lit(accuracy)).as("p25"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(accuracy)).as("p50"),
        percentile_approx(col("l_extendedprice"), lit(0.75), lit(accuracy)).as("p75"))
      .orderBy(col("l_returnflag"))
}
