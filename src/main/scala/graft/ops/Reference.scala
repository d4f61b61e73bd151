package graft.ops

import graft.Q
import graft.model.Tables
import org.apache.spark.sql.functions._

/** REF surface — the five queries that replicate what the reference can
  * actually do (SURVEY.md §2.1 R7-R14, §2.2 q01-q05).
  *
  * The reference pushes its single query shape into InfluxQL
  * (reference index.js:106):
  *   `SELECT "value","time" FROM <t> WHERE time >= .. AND time <= .. LIMIT n`
  * Here the same semantics are declared as a DataFrame plan and Catalyst
  * pushes filter/projection/limit into the parquet scan — the 100 TB path is
  * identical because pruning happens at the scan, not in the engine loop.
  *
  * Determinism (SURVEY.md §7.5): every query ends in a total order with a
  * unique tiebreak; timestamps leave as epoch-millis BIGINT (`unix_millis`,
  * oracle `epoch_ms`), never raw timestamps or strings.
  */
object Reference {

  val queries: Map[String, Q] = Map(

    // R8: time-range scan + projection + inclusive BETWEEN + explicit order
    // + limit. The reference's LIMIT rides on InfluxDB's implicit time order
    // (index.js:106, quirk §1.4.6) — here the order is explicit.
    // The time-range predicate runs on the generation's NATIVE scan column
    // (Tables.tsRange) so the parquet scan prunes row groups
    // (PushedFilters); whole-second bounds are exact in every time domain
    // the data has shipped with.
    "q01_range_scan_limit" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      ev.filter(col("event_type") === "click" &&
          Tables.tsRange(ev, "2024-01-05 00:00:00", "2024-01-10 00:00:00"))
        .orderBy(col("ts"), col("event_id"))
        .limit(100)
        .select(col("event_id"), Tables.epochMs(col("ts")).as("ts_ms"), col("value"))
    }),

    // R14: the `/search` catalog — distinct active series names
    // (reference index.js:74-84). Series-as-column ⇒ SELECT DISTINCT.
    "q02_search_catalog" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(col("event_type"))
        .distinct()
        .orderBy(col("event_type"))
    }),

    // R11+R13: the Grafana table response — fixed (Target, Value, Time)
    // 3-column shape with epoch-ms time (reference index.js:121-123, 140-150).
    "q03_grafana_table_shape" -> ((s, dir) => {
      Tables(s, dir, "events")
        .orderBy(col("ts"), col("event_id"))
        .select(
          col("event_type").as("Target"),
          col("value").as("Value"),
          Tables.epochMs(col("ts")).as("Time"))
    }),

    // R9: multi-target fan-out. The reference fires one InfluxQL query per
    // target and concats client-side via Promise.all (index.js:97-112);
    // Spark-native form is UNION ALL of per-series filters over one table
    // (single scan after Catalyst's filter combining).
    "q04_multi_target_union" -> ((s, dir) => {
      val e = Tables(s, dir, "events").select("event_id", "event_type", "value")
      e.filter(col("event_type") === "click")
        .unionAll(e.filter(col("event_type") === "purchase"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    // The backend downsample the reference leans on implicitly: InfluxDB's
    // `GROUP BY time(interval)` / Grafana's maxDataPoints contract. A
    // 30-day request at 1000 points → fixed 2592-second buckets computed
    // with pure epoch arithmetic (identical in both engines — no calendar
    // functions), mean per (series, bucket). The serving-layer twin is
    // Grafana.downsample; this is the oracle-checked declared form.
    // Scale: one map-side bucket projection + one hash agg on
    // (series, bucket) — the classic pre-aggregation any timeseries store
    // runs; at 100 TB the same plan with the time filter pruning
    // partitions first.
    "q48_downsample" -> ((s, dir) => {
      val startMs = 1704067200000L // 2024-01-01 00:00:00 UTC
      val widthMs = 2592000L       // 30 d / 1000 points in ms
      Tables(s, dir, "events")
        // floor, NOT cast-truncate: a timestamp before startMs (backfill,
        // clock skew) gives a negative quotient, where truncation rounds
        // toward zero but the oracle's FLOOR rounds down — the row would
        // land in different buckets per engine
        .select(col("event_type"), col("value"),
          (floor((Tables.epochMs(col("ts")) - startMs) / widthMs) * widthMs
            + startMs).as("bucket_ms"))
        .groupBy(col("event_type"), col("bucket_ms"))
        // UNROUNDED mean: numerator (exact decimal sum → double) and
        // denominator are bit-identical in both engines, so the IEEE
        // division is too — rounding would INTRODUCE divergence here
        // (the two engines round doubles by different algorithms and
        // disagree on 4th-decimal boundary values; seen at sf0.1)
        .agg(count(lit(1)).as("cnt"),
          (sum(col("value").cast("decimal(18,4)")).cast("double")
            / count(lit(1))).as("avg_v"))
        .orderBy(col("event_type"), col("bucket_ms"))
    }),

    // InfluxQL DERIVATIVE(1s): per-series rate of change between
    // consecutive samples — (value − lag value) / seconds elapsed, NULL
    // for each series' first sample and for zero gaps. One lag window
    // per series over a unique (ts, event_id) order. The rate ships
    // UNROUNDED (§7.5.7): both engines divide bit-identical doubles, so
    // the quotient matches exactly while round() itself could diverge.
    "q49_rate" -> ((s, dir) => {
      // order on the ms-truncated epoch + unique event_id in BOTH engines:
      // DuckDB's raw ts keeps ns precision Spark's µs domain can't see, so
      // ordering by raw ts would resolve same-ms neighbors differently
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("ts_ms"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          Tables.epochMs(col("ts")).as("ts_ms"), col("value"))
        .withColumn("prev_v", lag(col("value"), 1).over(w))
        .withColumn("prev_ms", lag(col("ts_ms"), 1).over(w))
        .select(col("event_type"), col("event_id"), col("ts_ms"),
          when(col("prev_ms").isNotNull && col("ts_ms") > col("prev_ms"),
            (col("value") - col("prev_v"))
              / ((col("ts_ms") - col("prev_ms")) / lit(1000.0)))
            .as("rate_per_s"))
        .orderBy(col("event_type"), col("ts_ms"), col("event_id"))
    }),

    // R7: retention as a filter — rows surviving `ts >= cutoff`
    // (reference deletes `time < cutoff`, index.js:269-282, exclusive cutoff
    // §1.2). At scale this is a partition drop (stream/Retention.scala).
    "q05_retention_filter" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      ev.filter(Tables.tsAtLeast(ev, "2024-01-15 00:00:00"))
        .agg(
          count(lit(1)).as("n"),
          min(Tables.epochMs(col("ts"))).as("min_ms"),
          max(Tables.epochMs(col("ts"))).as("max_ms"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q01_range_scan_limit" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms, value FROM events
        |WHERE event_type = 'click'
        |  AND ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-10 00:00:00'
        |ORDER BY ts, event_id LIMIT 100""".stripMargin,
    "q02_search_catalog" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "q03_grafana_table_shape" ->
      """SELECT event_type AS "Target", value AS "Value", epoch_ms(ts) AS "Time"
        |FROM events ORDER BY ts, event_id""".stripMargin,
    "q04_multi_target_union" ->
      """SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase'
        |ORDER BY event_type, event_id""".stripMargin,
    "q05_retention_filter" ->
      """SELECT count(*) AS n, min(epoch_ms(ts)) AS min_ms, max(epoch_ms(ts)) AS max_ms
        |FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'""".stripMargin,
    "q48_downsample" ->
      """WITH b AS (
        |  SELECT event_type, value,
        |         CAST(FLOOR((epoch_ms(ts) - 1704067200000) / 2592000.0) AS BIGINT)
        |           * 2592000 + 1704067200000 AS bucket_ms
        |  FROM events)
        |SELECT event_type, bucket_ms, count(*) AS cnt,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_v
        |FROM b GROUP BY event_type, bucket_ms
        |ORDER BY event_type, bucket_ms""".stripMargin,
    "q49_rate" ->
      """WITH s AS (
        |  SELECT event_type, event_id, epoch_ms(ts) AS ts_ms, value,
        |         lag(value) OVER w AS prev_v,
        |         lag(epoch_ms(ts)) OVER w AS prev_ms
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_ms(ts), event_id))
        |SELECT event_type, event_id, ts_ms,
        |       CASE WHEN prev_ms IS NOT NULL AND ts_ms > prev_ms
        |            THEN (value - prev_v) / ((ts_ms - prev_ms) / 1000.0)
        |       END AS rate_per_s
        |FROM s ORDER BY event_type, ts_ms, event_id""".stripMargin
  )
}
