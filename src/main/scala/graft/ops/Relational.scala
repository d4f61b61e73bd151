package graft.ops

import graft.Q
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Relational core — filters, projections, joins, aggregations, grouping
  * sets, sorts, set ops, scalar function library (SURVEY.md §2.2
  * q10-q19, q30-q36, q50-q53, q60-q63).
  *
  * None of this exists in the reference (SURVEY.md §2.1: "operator
  * categories the reference does NOT implement") — it is the north-star
  * extension surface, built entirely from Catalyst-optimized builtins:
  * every join shuffles on its keys (or broadcasts a small side), every agg
  * does map-side partial aggregation, and filters/projections push into the
  * parquet scans.
  *
  * Determinism rules (SURVEY.md §7.5): decimal-cast sums cast back to
  * DOUBLE, total ORDER BY with unique tiebreak, explicit NULLS FIRST to
  * match Spark's asc default, integer-typed outputs cast to BIGINT to match
  * DuckDB's wider defaults.
  */
object Relational {

  /** Exact order-independent sum of a double column: cast each value to
    * DECIMAL(18,2), sum exactly, cast the total back to double the same way
    * in both engines.
    */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  val queries: Map[String, Q] = Map(

    // ───────────────────────── filters & projections ─────────────────────
    "q10_filter_pred" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        // literal cast to timestamp_ntz (the column's native type): a
        // TIMESTAMP literal would wrap the column in a cast and defeat
        // parquet predicate pushdown
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp_ntz")
          && col("l_discount").between(0.02, 0.08)
          && (col("l_quantity") < 10 || col("l_quantity") > 40)
          && col("l_returnflag").isin("A", "N"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
          "l_discount", "l_returnflag")
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
        // order by every output column for a total order.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          col("l_discount"), col("l_quantity"), col("l_returnflag"))
    }),

    "q11_project_scalar" -> ((s, dir) => {
      Tables(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 10).as("name10"),
        length(col("p_name")).cast("long").as("name_len"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("bt"),
        round(col("p_retailprice"), 2).as("price_r")
      ).orderBy(col("p_partkey"))
    }),

    // ─────────────────────────────── joins ───────────────────────────────
    "q12_inner_join" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
        .orderBy(col("o_orderkey"))
    }),

    "q13_left_join" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    }),

    "q14_semi_join" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(col("c_custkey"))
    }),

    // Anti join against a filtered right side (customers with no
    // high-value order) so the result is non-trivial at every sf.
    "q15_anti_join" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders").filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(col("c_custkey"))
    }),

    // TPC-H Q3 shape: 3-way join, decimal revenue agg, top-k. Catalyst
    // broadcast-joins the filtered customer side when it fits; the
    // orders⋈lineitem shuffle is on the join key either way.
    "q16_join3_agg_topk" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1997-06-01 00:00:00").cast("timestamp_ntz"))
      val l = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1997-06-01 00:00:00").cast("timestamp_ntz"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        // price (2dp) × (1 - discount) (2dp) is an exact 4-decimal value;
        // cast at scale 4 so neither engine has to break a half-cent tie
        // (scale-2 casts diverge between Spark's HALF_UP-on-shortest-repr
        // and DuckDB's binary rounding).
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          Tables.epochMs(col("o_orderdate")).as("odate_ms"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Explicit broadcast hint: region (5 rows) never deserves a shuffle.
    "q17_broadcast_join" -> ((s, dir) => {
      Tables(s, dir, "nation")
        .join(broadcast(Tables(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")
        .orderBy(col("n_nationkey"))
    }),

    "q18_cross_join" -> ((s, dir) => {
      Tables(s, dir, "region")
        .crossJoin(Tables(s, dir, "nation"))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Equi + range theta join: the equality key carries the shuffle; the
    // BETWEEN range is a post-join filter Catalyst keeps in the hash join.
    "q19_range_join" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate").between(col("o_orderdate"),
              col("o_orderdate") + expr("INTERVAL 90 DAYS")))
        .select(col("l_orderkey"), col("l_linenumber"),
          Tables.epochMs(col("l_shipdate")).as("ship_ms"),
          Tables.epochMs(col("o_orderdate")).as("odate_ms"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("ship_ms"))
    }),

    // Correlated scalar subquery — Catalyst decorrelates it into an
    // aggregate + outer join (SQL surface; the DataFrame API has no
    // correlated-subquery syntax).
    "q21_scalar_subquery" -> ((s, dir) => {
      Tables(s, dir, "customer").createOrReplaceTempView("customer_q21")
      Tables(s, dir, "orders").createOrReplaceTempView("orders_q21")
      s.sql(
        """SELECT c_custkey, c_name,
          |       (SELECT count(*) FROM orders_q21 WHERE o_custkey = c_custkey) AS n_orders,
          |       (SELECT CAST(max(o_totalprice) AS DOUBLE) FROM orders_q21
          |        WHERE o_custkey = c_custkey) AS max_price
          |FROM customer_q21 ORDER BY c_custkey""".stripMargin)
    }),

    // ANSI three-valued NOT IN — the null trap, exercised deliberately:
    // a NULL in the subquery list makes `x NOT IN (...)` UNKNOWN for
    // every x outside the list (never TRUE), so the with-null count
    // collapses wherever NULLIF fires. SQL form on purpose: Spark plans
    // `NOT IN (subquery)` as a null-aware anti join, a distinct physical
    // operator the DataFrame left_anti (null-blind) does not exercise.
    "q22_not_in_nulls" -> ((s, dir) => {
      Tables(s, dir, "customer").createOrReplaceTempView("customer_q22")
      Tables(s, dir, "supplier").createOrReplaceTempView("supplier_q22")
      s.sql(
        """SELECT
          |  (SELECT count(*) FROM customer_q22
          |   WHERE c_nationkey NOT IN (SELECT NULLIF(s_nationkey, 3)
          |                             FROM supplier_q22)) AS with_null,
          |  (SELECT count(*) FROM customer_q22
          |   WHERE c_nationkey NOT IN (SELECT s_nationkey FROM supplier_q22
          |                             WHERE s_nationkey <> 3)) AS without_null""".stripMargin)
    }),

    // LATERAL join — the correlated table subquery (each nation's two
    // highest-balance customers via a per-row dependent subquery).
    // Catalyst decorrelates the lateral into a ranked window join; the
    // SQL surface is what a reference user migrating real queries
    // brings, so it is exercised as SQL in both engines.
    "q23_lateral_topn" -> ((s, dir) => {
      Tables(s, dir, "nation").createOrReplaceTempView("nation_q23")
      Tables(s, dir, "customer").createOrReplaceTempView("customer_q23")
      s.sql(
        """SELECT n.n_name, t.c_custkey, t.c_acctbal
          |FROM nation_q23 n,
          |LATERAL (SELECT c_custkey, c_acctbal FROM customer_q23 c
          |         WHERE c.c_nationkey = n.n_nationkey
          |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
          |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin)
    }),

    // ──────────────────────────── aggregations ───────────────────────────
    // TPC-H Q1 shape (hash agg with map-side partials).
    "q30_groupby_agg" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("disc_price"),
          round(dsum(col("l_quantity")) / count(lit(1)), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q31_count_distinct" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("cnt"))
        .orderBy(col("event_type"))
    }),

    "q32_having" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
        .filter(col("cnt") > 10)
        .orderBy(col("o_custkey"))
    }),

    "q33_rollup" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("o_totalprice")).as("sum_price"),
          grouping(col("o_orderstatus")).cast("long").as("g1"),
          grouping(col("o_orderpriority")).cast("long").as("g2"))
        .orderBy(col("g1"), col("g2"),
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    "q34_cube" -> ((s, dir) => {
      Tables(s, dir, "events")
        .withColumn("u3", col("user_id") % 3)
        .cube(col("event_type"), col("u3"))
        .agg(
          count(lit(1)).as("cnt"),
          grouping(col("event_type")).cast("long").as("g1"),
          grouping(col("u3")).cast("long").as("g2"))
        .orderBy(col("g1"), col("g2"),
          col("event_type").asc_nulls_first, col("u3").asc_nulls_first)
    }),

    // Explicit GROUPING SETS — SQL form (the DataFrame API gained
    // groupingSets only recently; SQL is the stable surface).
    "q35_grouping_sets" -> ((s, dir) => {
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_q35")
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
          |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          |       CAST(grouping(l_returnflag) AS BIGINT) AS g1,
          |       CAST(grouping(l_linestatus) AS BIGINT) AS g2
          |FROM lineitem_q35
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    }),

    "q36_cond_agg" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("l_discount") > 0.05, col("l_extendedprice").cast("decimal(18,2)"))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double").as("disc_rev"),
          sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("big_cnt"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"))
    }),

    // Pivot: status columns per priority (Spark's relational pivot
    // operator; oracle expresses the same contract as conditional aggs).
    "q37_pivot" -> ((s, dir) => {
      val p = Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
      p.select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
        .orderBy(col("o_orderpriority"))
    }),

    // Exact percentiles (linear interpolation — same definition in both
    // engines: index p*(n-1) over the sorted values).
    // Scale note: EXACT percentile buffers every value per group — right
    // for the oracle-exact contract at bench scale, but at 100 TB the
    // scale path is approx_percentile (t-digest sketch, bounded state,
    // mergeable partials); swap is a one-word change when tolerance > 0.
    // Scale note: exact `percentile` is a value→count histogram per
    // group — bounded for discrete domains (quantity: 50 keys), but for
    // a CONTINUOUS column it holds every distinct value, O(distinct) per
    // group. The declared query stays exact because the DuckDB oracle is
    // exact (hash-match gate); the 100 TB path for continuous domains is
    // `approx_percentile(col, q, accuracy)` — fixed-size mergeable
    // sketch, rank error ≤ 1/accuracy — which trades the hash-exact
    // contract for bounded memory. Same trade, same reasoning, as the
    // q75 bloom-vs-exact decontamination pair.
    "q38_percentiles" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("med_qty"),
          // ONE percentile aggregation for all three quartiles (each agg
          // buffers the column separately — three would triple the work);
          // the array stays internal, outputs are scalars — the driver's
          // harness cannot hash array-typed cells.
          expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").as("qs"))
        .select(col("l_returnflag"),
          col("med_qty"),
          // round at 4: quartile interpolation over the 2-decimal price
          // grid yields values ON the 4-decimal grid (round = exact
          // recovery), while rounding at 2 would have to break half-cent
          // ties — which the engines do differently
          round(element_at(col("qs"), 1), 4).as("p25"),
          round(element_at(col("qs"), 2), 4).as("p50"),
          round(element_at(col("qs"), 3), 4).as("p75"))
        .orderBy(col("l_returnflag"))
    }),

    // Statistical aggregates over a numerically tame column (quantity):
    // stddev/variance/corr rounded where engine update formulas can
    // differ in low-order bits.
    "q39_stats_agg" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"))
        .orderBy(col("l_returnflag"))
    }),

    // Salted two-stage aggregation — the skew survival pattern as a
    // first-class operator: stage 1 groups on (key, salt) so one hot key
    // spreads over 16 reducers, stage 2 re-aggregates the 16 partials per
    // key. Results are identical to the plain groupBy (decimal partials
    // sum exactly in any order — §7.5.2), so the oracle is the UNSALTED
    // SQL. lineitem's 3-value l_returnflag is exactly the shape where a
    // plain shuffle would put a third of the table through one task; at
    // 100 TB, salt width scales with observed key skew (AQE's skew-join
    // handles joins, but skewed AGGREGATION keys need this by hand).
    "q55_salted_agg" -> ((s, dir) => {
      val partials = Tables(s, dir, "lineitem")
        .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("p_qty"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).as("p_rev"),
          count(lit(1)).as("p_cnt"))
      partials.groupBy(col("l_returnflag"))
        .agg(sum(col("p_qty")).cast("double").as("sum_qty"),
          sum(col("p_rev")).cast("double").as("sum_rev"),
          sum(col("p_cnt")).as("cnt"))
        .orderBy(col("l_returnflag"))
    }),

    // ───────────────────────── sorts & set ops ───────────────────────────
    "q50_orderby_multi_limit" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .orderBy(col("l_extendedprice").desc, col("l_discount").asc,
          col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    }),

    "q51_union" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val su = Tables(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.unionAll(su).agg(count(lit(1)).as("n_all"))
        .crossJoin(c.unionAll(su).distinct().agg(count(lit(1)).as("n_distinct")))
    }),

    // Ordered string aggregation: engine-portable via sort-then-join
    // (Spark has no ORDER BY inside an aggregate; DuckDB's string_agg
    // ORDER BY expresses the same contract).
    "q54_string_agg" -> ((s, dir) => {
      Tables(s, dir, "nation")
        .join(broadcast(Tables(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
        .orderBy(col("r_name"))
    }),

    "q52_intersect" -> ((s, dir) => {
      Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .intersect(Tables(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy(col("nk"))
    }),

    "q53_except" -> ((s, dir) => {
      Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .except(Tables(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy(col("nk"))
    }),

    // ─────────────────────── scalar function library ─────────────────────
    "q60_string_fns" -> ((s, dir) => {
      Tables(s, dir, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("w1"),
        expr("replace(p_name, ' ', '_')").as("repl"),
        trim(col("p_brand")).as("btrim"),
        lpad(col("p_size").cast("string"), 5, "0").as("sz5"),
        size(split(col("p_name"), " ")).cast("long").as("nwords")
      ).orderBy(col("p_partkey"))
    }),

    "q61_date_fns" -> ((s, dir) => {
      Tables(s, dir, "orders").select(
        col("o_orderkey"),
        unix_millis(date_trunc("month", col("o_orderdate"))).as("month_ms"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("dd")
      ).orderBy(col("o_orderkey"))
    }),

    "q62_math_fns" -> ((s, dir) => {
      Tables(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("r2"),
        floor(col("l_discount") * 100).as("fl"),
        ceil(col("l_tax") * 100).as("ce"),
        abs(col("l_quantity") - 25).as("ab"),
        round(pow(col("l_quantity"), 1.5), 4).as("pw"),
        round(sqrt(col("l_extendedprice")), 4).as("sq"),
        round(log(col("l_extendedprice")), 4).as("lg")
      ).orderBy(col("l_orderkey"), col("l_linenumber"), col("r2"), col("ab"),
        col("fl"), col("ce"))
    }),

    "q63_json_fns" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("k").asc_nulls_first)
    }),

    // UNPIVOT (melt) — the inverse of q37's pivot: wide measure columns
    // to (measure, value) rows via the relational unpivot operator (a
    // generator, no shuffle), then one hash agg per measure. The
    // wide-to-long reshape every metrics export needs; oracle = the
    // engine-portable UNION ALL formulation of the same relation.
    "q68_unpivot" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_tax")),
          "measure", "v")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("cnt"), dsum(col("v")).as("total"))
        .orderBy(col("measure"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q10_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.08
        |  AND (l_quantity < 10 OR l_quantity > 40)
        |  AND l_returnflag IN ('A', 'N')
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount, l_quantity, l_returnflag""".stripMargin,
    "q11_project_scalar" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u, substr(p_name, 1, 10) AS name10,
        |       CAST(length(p_name) AS BIGINT) AS name_len,
        |       p_brand || '#' || p_type AS bt, round(p_retailprice, 2) AS price_r
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q12_inner_join" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q13_left_join" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,
    "q14_semi_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q15_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c.c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    "q16_join3_agg_topk" ->
      """SELECT l_orderkey,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       epoch_ms(o_orderdate) AS odate_ms
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q17_broadcast_join" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
    "q18_cross_join" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name",
    "q19_range_join" ->
      """SELECT l_orderkey, l_linenumber, epoch_ms(l_shipdate) AS ship_ms,
        |       epoch_ms(o_orderdate) AS odate_ms
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey
        | AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
        |ORDER BY l_orderkey, l_linenumber, ship_ms""".stripMargin,
    "q21_scalar_subquery" ->
      """SELECT c_custkey, c_name,
        |       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
        |       (SELECT CAST(max(o_totalprice) AS DOUBLE) FROM orders
        |        WHERE o_custkey = c_custkey) AS max_price
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q54_string_agg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q30_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS disc_price,
        |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q31_count_distinct" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS users, count(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q32_having" ->
      """SELECT o_custkey, count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_custkey HAVING count(*) > 10
        |ORDER BY o_custkey""".stripMargin,
    "q33_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       CAST(grouping(o_orderstatus) AS BIGINT) AS g1,
        |       CAST(grouping(o_orderpriority) AS BIGINT) AS g2
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY g1, g2, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q34_cube" ->
      """SELECT event_type, u3, count(*) AS cnt,
        |       CAST(grouping(event_type) AS BIGINT) AS g1,
        |       CAST(grouping(u3) AS BIGINT) AS g2
        |FROM (SELECT event_type, user_id % 3 AS u3 FROM events)
        |GROUP BY CUBE(event_type, u3)
        |ORDER BY g1, g2, event_type NULLS FIRST, u3 NULLS FIRST""".stripMargin,
    "q35_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(grouping(l_returnflag) AS BIGINT) AS g1,
        |       CAST(grouping(l_linestatus) AS BIGINT) AS g2
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q36_cond_agg" ->
      """SELECT l_returnflag,
        |       CAST(sum(CASE WHEN l_discount > 0.05 THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS disc_rev,
        |       CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS big_cnt,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q37_pivot" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
        |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q38_percentiles" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
        |       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q39_stats_agg" ->
      """SELECT l_returnflag,
        |       round(stddev_samp(l_quantity), 4) AS sd_qty,
        |       round(var_samp(l_quantity), 4) AS var_qty,
        |       round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |       round(covar_samp(l_quantity, l_discount), 6) AS cov_qd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q23_lateral_topn" ->
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin,
    "q22_not_in_nulls" ->
      """SELECT
        |  (SELECT count(*) FROM customer
        |   WHERE c_nationkey NOT IN (SELECT NULLIF(s_nationkey, 3)
        |                             FROM supplier)) AS with_null,
        |  (SELECT count(*) FROM customer
        |   WHERE c_nationkey NOT IN (SELECT s_nationkey FROM supplier
        |                             WHERE s_nationkey <> 3)) AS without_null""".stripMargin,
    // the UNSALTED form: the salted two-stage plan must be result-identical
    "q55_salted_agg" ->
      """SELECT l_returnflag,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_rev,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q50_orderby_multi_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_discount ASC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,
    "q51_union" ->
      """SELECT
        |  (SELECT count(*) FROM (SELECT c_nationkey AS nk FROM customer
        |                         UNION ALL SELECT s_nationkey FROM supplier)) AS n_all,
        |  (SELECT count(*) FROM (SELECT c_nationkey AS nk FROM customer
        |                         UNION SELECT s_nationkey FROM supplier)) AS n_distinct""".stripMargin,
    "q52_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin,
    "q53_except" ->
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin,
    "q60_string_fns" ->
      """SELECT p_partkey, regexp_extract(p_name, '([a-z]+)', 1) AS w1,
        |       replace(p_name, ' ', '_') AS repl, trim(p_brand) AS btrim,
        |       lpad(CAST(p_size AS VARCHAR), 5, '0') AS sz5,
        |       CAST(len(regexp_split_to_array(p_name, ' ')) AS BIGINT) AS nwords
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q61_date_fns" ->
      """SELECT o_orderkey, epoch_ms(date_trunc('month', o_orderdate)) AS month_ms,
        |       CAST(year(o_orderdate) AS BIGINT) AS y,
        |       CAST(month(o_orderdate) AS BIGINT) AS m,
        |       CAST(day(o_orderdate) AS BIGINT) AS d,
        |       CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS dd
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q62_math_fns" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS r2,
        |       CAST(floor(l_discount * 100) AS BIGINT) AS fl,
        |       CAST(ceil(l_tax * 100) AS BIGINT) AS ce,
        |       abs(l_quantity - 25) AS ab,
        |       round(pow(l_quantity, 1.5), 4) AS pw,
        |       round(sqrt(l_extendedprice), 4) AS sq,
        |       round(ln(l_extendedprice), 4) AS lg
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, r2, ab, fl, ce""".stripMargin,
    "q63_json_fns" ->
      """SELECT k, count(*) AS cnt
        |FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY k ORDER BY k NULLS FIRST""".stripMargin,
    "q68_unpivot" ->
      """SELECT measure, count(*) AS cnt,
        |       CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT 'l_quantity' AS measure, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |GROUP BY measure ORDER BY measure""".stripMargin
  )
}
