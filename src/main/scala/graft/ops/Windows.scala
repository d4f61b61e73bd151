package graft.ops

import graft.Q
import graft.model.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions & time-series operators (SURVEY.md §2.2 q20, q40-q45,
  * q70-q74).
  *
  * The reference has no windows at all — its only time-series op is the
  * range scan (reference index.js:106) and `maxDataPoints` truncation
  * (quirk §1.4.7). Everything here is the north-star extension, built on
  * Spark's window exec (one shuffle on the partition keys, sort within
  * partitions — no driver-side loops) and on `window()` /
  * `session_window()` time bucketing, which are the batch analogs of the
  * Structured Streaming versions in graft.streaming.
  */
object Windows {

  /** Global `row_number` over a UNIQUE sort key WITHOUT a single-task
    * window (r13 VERDICT #2 — q45's range-partitioned rank discipline,
    * factored for reuse): range-partition on the key, rank locally in
    * parallel, add broadcast per-partition prefix offsets. A naked
    * `row_number() OVER (ORDER BY …)` funnels the ENTIRE input through
    * one task — survivable for a top-k that never materializes past the
    * filter, fatal when the full ranked output is consumed (q113's
    * vocab→id assignment: a 100 TB web corpus's space-split vocab is
    * plausibly 10⁸⁺ tokens).
    *
    * The range-partitioned frame MUST be persisted before both
    * consumers read it: RangePartitioner's sampling is not stable
    * across plan executions, so offsets from one partitioning applied
    * to pids of another silently corrupt the global rank — q45's
    * caught-only-at-sf0.1 lesson. The caller owns cache cleanup
    * (CACHE CONTRACT in SparkEntry).
    *
    * `keys` must be a total order (unique): ties across a range
    * boundary would otherwise rank non-deterministically.
    *
    * `partitions <= 0` (the default) derives the range-partition count
    * from `spark.sql.shuffle.partitions` (r14 VERDICT finding #2: a
    * literal 32 pinned the rank stage's parallelism regardless of
    * cluster size — on a 1000-executor cluster the session dial is the
    * one AQE and the operator ecosystem already scale by). The result
    * is partition-count-independent (global row numbers over a total
    * order), so oracle hashes cannot move with the dial.
    */
  private[graft] def globalRowNumber(df: org.apache.spark.sql.DataFrame,
                                     keys: Seq[org.apache.spark.sql.Column],
                                     out: String,
                                     partitions: Int = -1): org.apache.spark.sql.DataFrame = {
    val parts =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val local = df.repartitionByRange(parts, keys: _*)
      .withColumn("_grn_pid", spark_partition_id())
      .withColumn("_grn_lrn", row_number().over(
        Window.partitionBy("_grn_pid").orderBy(keys: _*)).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ≤ `partitions` rows: cumulative counts per range partition,
    // broadcast back (constant partitionBy: deliberately one tiny
    // partition — the q45 idiom)
    val offs = local.groupBy("_grn_pid").agg(count(lit(1)).as("_grn_c"))
      .withColumn("_grn_off", coalesce(sum(col("_grn_c")).over(
        Window.partitionBy(lit(0)).orderBy("_grn_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_grn_pid", "_grn_off")
    local.join(broadcast(offs), "_grn_pid")
      .withColumn(out, col("_grn_off") + col("_grn_lrn"))
      .drop("_grn_pid", "_grn_lrn", "_grn_off")
  }

  val queries: Map[String, Q] = Map(

    // As-of join: for every purchase, the latest prior-or-equal signup of
    // the same user. Spark-first formulation: ONE shuffle on user_id and a
    // running max over an ordered union of both event kinds — no
    // O(purchases × signups) pair join (that formulation is kept oracle-side
    // only, where DuckDB handles the tiny sf easily).
    "q20_asof_latest_prior" -> ((s, dir) => {
      val u = Tables(s, dir, "events")
        .filter(col("event_type").isin("signup", "purchase"))
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "signup", col("ts")).as("signup_ts"),
          when(col("event_type") === "purchase", lit(1)).otherwise(lit(0)).as("is_p"))
      // signup sorts before purchase at equal ts ⇒ equal-ts signup is "prior"
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_p"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("last_signup", max(col("signup_ts")).over(w))
        .filter(col("is_p") === 1)
        .select(col("event_id"), Tables.epochMs(col("ts")).as("p_ms"),
          Tables.epochMs(col("last_signup")).as("s_ms"))
        .orderBy(col("event_id"))
    }),

    // ───────────────────────── ranking windows ───────────────────────────
    "q40_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy(col("o_custkey"), col("rn"))
    }),

    "q41_rank_dense" -> ((s, dir) => {
      val w = Window.partitionBy("p_brand").orderBy(col("p_size").desc)
      Tables(s, dir, "part").select(
        col("p_brand"), col("p_partkey"), col("p_size"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"))
        .orderBy(col("p_brand"), col("p_partkey"))
    }),

    // Distribution windows: percent_rank/cume_dist are pure rank
    // arithmetic — deterministic given the unique window order.
    "q46_pct_rank" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
      Tables(s, dir, "customer").select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        round(percent_rank().over(w), 6).as("pct"),
        round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("c_custkey"))
    }),

    // ───────────────────────── analytic windows ──────────────────────────
    "q42_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events").select(
        col("event_id"), col("user_id"), col("value"),
        lag("value", 1).over(w).as("prev_v"),
        lead("value", 1).over(w).as("next_v"),
        round(col("value") - lag("value", 1).over(w), 4).as("delta"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ROWS frame moving average — decimal-cast sum / count for an exact,
    // order-independent numerator (SURVEY.md §7.5.2).
    "q43_moving_avg_rows" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, 0)
      Tables(s, dir, "events").select(
        col("event_id"), col("user_id"),
        round(sum(col("value").cast("decimal(18,4)")).over(w).cast("double")
          / count(lit(1)).over(w), 4).as("mavg"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // RANGE frame over epoch-millis — 1 h trailing sum; the identical
    // integer-millis formulation runs on both engines (no epoch-seconds
    // division, SURVEY.md §7.3).
    "q44_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ms"))
        .rangeBetween(-3600000L, 0L)
      Tables(s, dir, "events")
        .withColumn("ms", Tables.epochMs(col("ts")))
        .select(col("event_id"), col("user_id"),
          round(sum(col("value").cast("decimal(18,4)")).over(w).cast("double"), 4)
            .as("sum1h"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Global quartiles WITHOUT a global single-task window: a naked
    // `ntile(4) OVER (ORDER BY …)` puts the whole table through one
    // executor. Instead: range-partition on the sort key, rank within
    // partitions in parallel, add broadcast per-partition prefix offsets,
    // and reproduce ntile's bucket arithmetic exactly (first n%4 buckets
    // get ⌈n/4⌉ rows) — the oracle stays the literal ntile(4). The
    // per-segment first/last windows shuffle on c_mktsegment as usual.
    "q45_ntile_first_last" -> ((s, dir) => {
      val cust = Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      val keys = Seq(col("c_acctbal"), col("c_custkey")) // unique sort key
      // pid is captured from the range partitioning, so local rank +
      // prefix offset = exact global rank regardless of where the
      // sampled range boundaries land. MUST be materialized once: both
      // consumers (offsets, ranked join) would otherwise re-execute the
      // range exchange, and RangePartitioner's sampling is not stable
      // across executions — offsets from one partitioning applied to
      // pids of another silently corrupts the global rank (caught by
      // the sf0.1 oracle; invisible at small SFs where every sampling
      // lands the same boundaries).
      val local = cust.repartitionByRange(32, keys: _*)
        .withColumn("pid", spark_partition_id())
        .withColumn("lrn", row_number().over(
          Window.partitionBy("pid").orderBy(keys: _*)).cast("long"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // ≤ 32 rows: cumulative counts per range partition, broadcast back
      // (constant partitionBy: deliberately one tiny partition — and no
      // spurious "no partition defined" WARN in the driver logs)
      val offs = local.groupBy("pid").agg(count(lit(1)).as("c"))
        .withColumn("off", coalesce(sum(col("c")).over(
          Window.partitionBy(lit(0)).orderBy("pid")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select("pid", "off")
      val n1 = cust.agg(count(lit(1)).as("n")) // 1 row, broadcast
      val ranked = local.join(broadcast(offs), "pid")
        .withColumn("rn", col("off") + col("lrn"))
        .crossJoin(broadcast(n1))
      // ntile(4): r = n%4 buckets of size (n div 4)+1, then size n div 4
      val quartile = expr(
        """CAST(CASE WHEN rn <= (n % 4) * ((n div 4) + 1)
          |          THEN (rn - 1) div ((n div 4) + 1) + 1
          |          ELSE (n % 4) + (rn - (n % 4) * ((n div 4) + 1) - 1) div (n div 4) + 1
          |     END AS BIGINT)""".stripMargin)
      val wf = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ranked.select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        quartile.as("quartile"),
        first("c_name").over(wf).as("top_name"),
        last("c_name").over(wf).as("bottom_name"))
        .orderBy(col("c_custkey"))
    }),

    // Gap filling with forward fill — the timeseries-store semantic the
    // reference's InfluxDB backend calls fill(previous): a complete
    // hourly bucket spine per series over the observed range, empty
    // buckets carrying the last observed value forward (NULL before the
    // first observation), with the gap flagged. Spine = one 1-row
    // min/max agg broadcast into a sequence() explode × the distinct
    // series dim — no data-sized shuffle to build it; the fill is one
    // running last() window per series. At 100 TB the spine is still
    // tiny (hours × series), and the per-series window shuffles
    // bucket-rows, not raw events.
    "q47_gap_fill" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val byBucket = ev
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_v"))
      val bounds = ev.agg(
        date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      val spine = bounds
        .select(explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("h"))
        .crossJoin(ev.select(col("event_type")).distinct())
      val wFill = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("h")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      spine.join(byBucket, Seq("h", "event_type"), "left")
        .select(Tables.epochMs(col("h")).as("h_ms"), col("event_type"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          last(col("sum_v"), ignoreNulls = true).over(wFill).as("filled_v"),
          when(col("cnt").isNull, lit(1L)).otherwise(lit(0L)).as("gap"))
        .orderBy(col("event_type"), col("h_ms"))
    }),

    // ─────────────────── time buckets (streaming analogs) ────────────────
    "q70_tumbling_window" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_v"))
        .select(Tables.epochMs(col("w.start")).as("day_ms"), col("event_type"),
          col("cnt"), col("sum_v"))
        .orderBy(col("day_ms"), col("event_type"))
    }),

    // Sliding windows overlap ⇒ each row lands in exactly 2 buckets
    // (duration 1 h, slide 30 min: starts floor30(t) and floor30(t)−30min);
    // the oracle expands that membership explicitly via unnest.
    "q71_sliding_window" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(Tables.epochMs(col("w.start")).as("w_ms"), col("event_type"), col("cnt"))
        .orderBy(col("w_ms"), col("event_type"))
    }),

    // Session windows: 30-min inactivity gap per user. Spark's session
    // window is [first, last + gap); the oracle reproduces exactly that via
    // gaps-and-islands (new session when gap >= 30 min).
    "q72_session_window" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"), Tables.epochMs(col("w.start")).as("start_ms"),
          Tables.epochMs(col("w.end")).as("end_ms"), col("cnt"))
        .orderBy(col("user_id"), col("start_ms"))
    }),

    // Dedup keep-first: row_number()=1 under a total order — NOT
    // dropDuplicates, which keeps an arbitrary row (SURVEY.md §7.5.3).
    "q73_dedup_keep_first" -> ((s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          Tables.epochMs(col("ts")).as("ts_ms"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // Batch analog of the watermarked streaming aggregation; the real
    // streaming query (withWatermark + window) lives in
    // graft.streaming.Collector and is exercised by the streaming test
    // harness (SURVEY.md §5.2.5). The batch tumbling count itself is
    // oracle-checked.
    "q74_watermark_late" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(Tables.epochMs(col("w.start")).as("w_ms"), col("event_type"), col("cnt"))
        .orderBy(col("w_ms"), col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q47_gap_fill" ->
      """WITH bounds AS (
        |  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
        |  FROM events),
        |spine AS (
        |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM events),
        |b AS (
        |  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS cnt,
        |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT s.h, t.event_type, b.cnt, b.sum_v
        |  FROM spine s CROSS JOIN types t
        |  LEFT JOIN b ON b.h = s.h AND b.event_type = t.event_type)
        |SELECT epoch_ms(h) AS h_ms, event_type,
        |       CAST(COALESCE(cnt, 0) AS BIGINT) AS cnt,
        |       last_value(sum_v IGNORE NULLS) OVER (
        |         PARTITION BY event_type ORDER BY h
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_v,
        |       CAST(CASE WHEN cnt IS NULL THEN 1 ELSE 0 END AS BIGINT) AS gap
        |FROM g ORDER BY event_type, h_ms""".stripMargin,
    "q20_asof_latest_prior" ->
      """SELECT p.event_id AS event_id, epoch_ms(p.ts) AS p_ms, epoch_ms(max(s.ts)) AS s_ms
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND s.ts <= p.ts
        |GROUP BY p.event_id, p.ts
        |ORDER BY p.event_id""".stripMargin,
    "q40_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q41_rank_dense" ->
      """SELECT p_brand, p_partkey, p_size,
        |       CAST(rank() OVER w AS BIGINT) AS rnk,
        |       CAST(dense_rank() OVER w AS BIGINT) AS drnk
        |FROM part WINDOW w AS (PARTITION BY p_brand ORDER BY p_size DESC)
        |ORDER BY p_brand, p_partkey""".stripMargin,
    "q46_pct_rank" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |       round(percent_rank() OVER w, 6) AS pct,
        |       round(cume_dist() OVER w, 6) AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q42_lag_lead" ->
      """SELECT event_id, user_id, value,
        |       lag(value) OVER w AS prev_v, lead(value) OVER w AS next_v,
        |       round(value - lag(value) OVER w, 4) AS delta
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q43_moving_avg_rows" ->
      """SELECT event_id, user_id,
        |       round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |             / count(*) OVER w, 4) AS mavg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q44_range_frame" ->
      """SELECT event_id, user_id,
        |       round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE), 4) AS sum1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q45_ntile_first_last" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |       CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile,
        |       first_value(c_name) OVER w AS top_name,
        |       last_value(c_name) OVER w AS bottom_name
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_custkey""".stripMargin,
    "q70_tumbling_window" ->
      """SELECT epoch_ms(date_trunc('day', ts)) AS day_ms, event_type, count(*) AS cnt,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY day_ms, event_type""".stripMargin,
    "q71_sliding_window" ->
      """SELECT w_ms, event_type, count(*) AS cnt FROM (
        |  SELECT event_type,
        |         unnest([epoch_ms(ts) // 1800000 * 1800000 - 1800000,
        |                 epoch_ms(ts) // 1800000 * 1800000]) AS w_ms
        |  FROM events)
        |GROUP BY w_ms, event_type
        |ORDER BY w_ms, event_type""".stripMargin,
    "q74_watermark_late" ->
      """SELECT epoch_ms(ts) // 600000 * 600000 AS w_ms, event_type, count(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY w_ms, event_type""".stripMargin,
    "q72_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                   >= INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, epoch_ms(min(ts)) AS start_ms,
        |       epoch_ms(max(ts) + INTERVAL 30 MINUTE) AS end_ms, count(*) AS cnt
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, start_ms""".stripMargin,
    "q73_dedup_keep_first" ->
      """SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms
        |FROM (SELECT user_id, event_type, event_id, ts,
        |             row_number() OVER (PARTITION BY user_id, event_type
        |                                ORDER BY ts, event_id) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin
  )
}
