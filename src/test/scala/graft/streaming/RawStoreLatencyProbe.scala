package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the RawStore resolver's per-request latency against the
  * bare read it replaces, and the gen-leg cache's recovery of that
  * cost (test-scoped main).
  *
  * Arrangement: a collector-shaped store (10 days x 24 batch files,
  * ~1.2M rows) is taken through realistic graceful maintenance
  * (retention edge rewrite + compaction of closed days → 8 remapped
  * generations + live plain days + retired-but-unreaped dirs, i.e. the
  * steady state the composed soak serves from). Three read modes are
  * then timed INTERLEAVED (round-robin, so host noise lands across
  * modes, not on one) over a Grafana-style request: resolve → filter a
  * 2-day range for 3 series → collect.
  *
  *  - bare:    spark.read over the table root (the pre-RawStore read;
  *             sees retired content — correctness baseline only)
  *  - resolve: RawStore.read, cacheGenLegs = false (every request
  *             re-lists and re-plans all generation legs)
  *  - cached:  RawStore.read, cacheGenLegs = true (immutable gen legs
  *             memoized; plain days still re-listed per request)
  *
  * Usage: sbt "Test/runMain graft.streaming.RawStoreLatencyProbe"
  * Env: SPARK_GRAFT_CPUS (16), SPARK_GRAFT_RSPROBE_N (40 per mode).
  */
object RawStoreLatencyProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val n = sys.env.getOrElse("SPARK_GRAFT_RSPROBE_N", "40").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = Files.createTempDirectory("rsprobe").toString
    val schema = "series STRING, ts TIMESTAMP, value DOUBLE, p_date DATE, batch_id BIGINT"
    val days = 10
    val filesPerDay = 24
    val rowsPerFile = 5000
    println(s"[rs-probe] building store: $days days x $filesPerDay files x $rowsPerFile rows")
    for (d <- 0 until days; b <- 0 until filesPerDay) {
      val day = java.time.LocalDate.parse("2024-01-01").plusDays(d)
      val batch = (0 until rowsPerFile).map { i =>
        (s"s${i % 20}",
          java.sql.Timestamp.valueOf(s"$day ${"%02d".format(b)}:00:00"),
          i.toDouble)
      }.toDF("series", "ts", "value")
      batch.write.mode("overwrite").json(s"$dir/p_date=$day/batch_id=${d * filesPerDay + b}")
    }

    // graceful maintenance to steady state: compact the 8 oldest closed
    // days (one generation each), then an edge rewrite of day 0 — the
    // shape the soak's serving layer reads through, retired dirs pending
    val grace = Some(3600_000L)
    val c = Compaction.compact(spark, dir, format = "json", maxFiles = 12,
      targetFiles = 1, closedBefore = Some(java.time.LocalDate.parse("2024-01-09")),
      grace = grace)
    val (_, r) = Retention.enforce(spark, dir,
      java.sql.Timestamp.valueOf("2024-01-01 06:00:00"), format = "json",
      grace = grace)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = RawStore.readManifest(fs, dir)
    println(s"[rs-probe] maintained: compacted=$c rewritten=$r " +
      s"gens=${m.active.size} retired=${m.retired.size}")

    import graft.serve.Grafana
    import graft.serve.Grafana.{QueryRequest, Target, TimeRange}
    val req = QueryRequest((0 until 3).map(i => Target(s"s$i", "timeseries")),
      TimeRange("2024-01-07 00:00:00", "2024-01-09 00:00:00"), 200)
    val modes: Seq[(String, () => Int)] = Seq(
      "bare" -> (() => Grafana.query(
        spark.read.schema(schema).json(dir), req).length),
      "resolve" -> (() => Grafana.query(
        RawStore.read(spark, dir, schema, "json", cacheGenLegs = false), req).length),
      "cached" -> (() => Grafana.query(
        RawStore.read(spark, dir, schema, "json"), req).length))

    modes.foreach { case (_, f) => (1 to 3).foreach(_ => f()) } // warmup
    val samples = scala.collection.mutable.Map(
      modes.map(_._1 -> Vector.empty[Double]): _*)
    for (_ <- 1 to n; (name, f) <- modes) {
      val t0 = System.nanoTime()
      f()
      samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e6
    }
    def pct(xs: Vector[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.length - 1, math.max(0, math.ceil(p * s.length).toInt - 1)))
    }
    modes.foreach { case (name, _) =>
      val xs = samples(name)
      println(f"[rs-probe] $name%-8s n=$n p50=${pct(xs, 0.5)}%.1fms " +
        f"p95=${pct(xs, 0.95)}%.1fms min=${xs.min}%.1f max=${xs.max}%.1f")
    }
    spark.stop()
  }
}
