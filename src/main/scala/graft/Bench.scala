package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver
  * (BENCH_r{N}.json).
  *
  * Each query is fully materialized through a `noop` write: unlike
  * `count()`, which lets Catalyst drop sorts/projections and answer from
  * statistics, the noop sink executes the complete physical plan — the
  * number measured is the number a real sink would see.
  *
  * Every query runs once untimed (codegen compilation, JIT, broadcast
  * thread-pool spin-up), then twice timed, reporting the minimum —
  * cold-JVM overhead is a constant ~1-3 s per query and this host shows
  * multi-second contention stalls that would otherwise land on single
  * unlucky queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // native graft expressions injected at session build; queries also
      // call ensureRegistered (idempotent) for sessions built elsewhere
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String,
            fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable =>
        // name in the message: interleaved stderr from a 70-query sweep
        // must attribute the failure without waiting for the failed-list
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
    // SPARK_GRAFT_ONLY=q81_...,q85_... restricts the sweep — the tool for
    // re-timing a spike in isolation (host stalls and long-JVM effects
    // land on single queries in a full sweep; see verify skill gotchas)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd name must fail loudly — silently dropping it would run an
    // empty (or wrong) sweep that still exits 0 and reports a tiny total
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      if (unknown.nonEmpty) {
        System.err.println(
          s"[bench] unknown SPARK_GRAFT_ONLY names: ${unknown.toSeq.sorted.mkString(",")}")
        sys.exit(2)
      }
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    if (selected.isEmpty) {
      System.err.println("[bench] empty query selection")
      sys.exit(2)
    }
    val results = selected.map { case (name, fn) =>
      run(name, fn) // warmup (codegen/JIT); failure also logged by run()
      var ok = true
      def timedRun(): Double = {
        // a previous run's persisted subplans would satisfy this one via
        // plan-canonicalization cache lookup — clear so every timed run
        // pays for its own intermediates
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        ok &= run(name, fn)
        (System.nanoTime() - t0) / 1e9
      }
      var timed = (1 to 2).map(_ => timedRun())
      // this host shows multi-second contention stalls that can hit BOTH
      // timed runs of one unlucky query (observed: a 0.4 s query
      // reporting 5+ s as the min of two). When the two runs disagree
      // badly AND the min is slow, buy one more sample — min of N stays
      // an honest steady-state estimate and the retry is bounded to
      // genuinely suspicious cases
      if (timed.min > 2.0 && timed.max > 1.5 * timed.min)
        timed = timed :+ timedRun()
      spark.catalog.clearCache()
      (name, timed.min, ok)
    }
    // a failed query reports -1, not its fast-failure duration — a broken
    // query must stand out in the JSON rather than understate the total
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    // short second line: the driver's tail capture can truncate the long
    // per-query line; this one always fits and always parses
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_failed":${results.count(!_._3)}}""")
    spark.stop()
  }
}
