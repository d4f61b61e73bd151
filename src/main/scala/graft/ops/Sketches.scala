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

  /** Count-Min frequency sketch over document words — the third classic
    * summary next to HLL (distinct) and GK (quantiles): point-queryable
    * approximate term frequencies in `width × depth` counters, mergeable
    * (Spark's `stat.countMinSketch` aggregates partition sketches), with
    * the one-sided CM guarantee: estimate ≥ true count always, and
    * estimate ≤ true + eps·N with probability ≥ confidence. NOTE Spark's
    * parametrization differs from the Cormode–Muthukrishnan paper
    * constants: width = ceil(2/eps) and depth = ceil(ln(1−confidence) /
    * ln(0.5)) — size from eps/confidence, don't derive bounds from
    * width/depth via the e/width paper formulas. The 100 TB use is
    * heavy-hitter discovery — the stop-gram caps in q81/q95 computed
    * from a sketch pass instead of an exact groupBy of every gram, WIRED
    * as [[graft.ops.Extensions.capJaccardPairsSketch]] (which builds its
    * sketch via [[gramFrequencySketch]] and cap-filters map-side through
    * the `cms_estimate` expression). Returns the sketch; callers
    * point-query term counts driver-side or embed the serialized sketch
    * as a `cms_estimate` constant (the sketch is KB-sized — broadcast
    * it, the corpus never reshuffles).
    */
  def wordFrequencySketch(s: SparkSession, dir: String,
                          eps: Double = 0.001, confidence: Double = 0.99,
                          seed: Int = 42): org.apache.spark.util.sketch.CountMinSketch =
    gramFrequencySketch(
      Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= ""),
      "w", eps, confidence, seed)

  /** [[wordFrequencySketch]] generalized to ANY gram/token DataFrame —
    * the build half of the sketch-capped Jaccard path
    * ([[graft.ops.Extensions.capJaccardPairsSketch]]). One pass over the
    * rows, mergeable partials, narrow shuffle of sketch bytes.
    */
  def gramFrequencySketch(grams: DataFrame, column: String,
                          eps: Double = 0.001, confidence: Double = 0.99,
                          seed: Int = 42): org.apache.spark.util.sketch.CountMinSketch =
    grams.stat.countMinSketch(column, eps, confidence, seed)
}
