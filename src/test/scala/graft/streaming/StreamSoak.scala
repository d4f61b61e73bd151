package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sustained streaming soak (test-scoped main) — the measurement tool
  * behind SURVEY §8's streaming-throughput table. The spec suite proves
  * the streaming stack's SEMANTICS (replay, demotion, flag parity);
  * this records its sustained RATE and state footprint, which a
  * spec-sized run cannot show.
  *
  * Usage:
  *   sbt "Test/runMain graft.streaming.StreamSoak <rowsPerSec> <minutes>"
  *
  * Drives the rate source at `rowsPerSec` through the full ingest
  * shape: synthetic doc texts (a rotating template population with
  * ~10% near-duplicate re-crawls — edits of an earlier doc — and ~5%
  * exact repeats) → [[StreamingNearDup.flagNearDups]] (the stateful
  * LSH stage, 4 band buckets per doc) → count-only foreachBatch sink
  * (each batch is counted and DISCARDED — an in-memory sink would
  * accumulate every output row, so past ~10 minutes the tool measured
  * its own sink instead of the pipeline). Every
  * `lastProgress` is sampled once per trigger; the printout is the
  * per-~30s downsample plus a summary with:
  *
  *   - sustained processedRowsPerSecond (the throughput claim),
  *   - micro-batch duration p50/p95 (latency),
  *   - state rows + state memory over time (the boundedness claim —
  *     FIFO-capped buckets must flatten once the population saturates).
  *
  * Saturation protocol: run ascending rates; the saturation point is
  * the first rate where processedRowsPerSecond stays below the input
  * rate and batch durations exceed the trigger interval (backlog
  * grows without bound).
  */
object StreamSoak {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StreamSoak <rowsPerSec> <minutes>")
    val rate = args(0).toInt
    val minutes = args(1).toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    // Synthetic doc stream: ~200-word template texts drawn from a
    // 10k-template population (deterministic in the row value), with
    // ~10% near-dup re-crawls (one counter word edited — within
    // hamming <= 3 of the original's simhash with high probability)
    // and ~5% exact repeats. value is globally unique and monotonic —
    // the doc id.
    val docs = spark.readStream.format("rate")
      .option("rowsPerSecond", rate)
      .option("numPartitions", cpus.toInt)
      .load()
      .select(col("value").as("id"))
      .select(col("id"), (col("id") % 100L).as("m"))
      // body seed: dup-class docs (15%) draw their 40-word body from a
      // 1000-doc "popular original" population; the other 85% seed from
      // their own id, so unique docs share ~no words (far apart in
      // simhash space) — the flag rate of the stream is the constructed
      // 15%, not an artifact of a shared template body
      .select(col("id"), col("m"),
        when(col("m") < 15, col("id") % 1000L).otherwise(col("id")).as("seed"))
      .select(col("id"),
        concat(
          // modulus ~1e9 (prime): two seeds share words only when they
          // differ by the full modulus — beyond any soak's id range (a
          // smaller prime made ids exactly-modulus apart identical-body
          // twins, inflating the flag rate ~3×)
          concat_ws(" ", (0 until 40).map(w =>
            concat(lit(s"w$w"), ((col("seed") * 1000003L + w * 7919L) % 999999937L))): _*),
          // 5% exact repeats of the popular original, 10% one-word-edit
          // near-dups of it (7 edit variants), 85% unique
          when(col("m") < 5, lit(" end"))
            .when(col("m") < 15, concat(lit(" edit"), col("id") % 7))
            .otherwise(lit(" end"))).as("text"))
      .as[(Long, String)]

    val flags = StreamingNearDup.flagNearDups(docs)
    // count-only sink: O(1) memory however long the run — the count is
    // the only number the summary needs from the output rows
    val flaggedTotal = new java.util.concurrent.atomic.AtomicLong(0L)
    val query = flags.writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[_], _: Long) =>
        flaggedTotal.addAndGet(df.count()); ()
      }
      .outputMode("append")
      .option("checkpointLocation",
        s"/tmp/stream_soak_ckpt_${System.currentTimeMillis()}")
      .start()

    val deadline = System.currentTimeMillis() + (minutes * 60000).toLong
    final case class Sample(t: Long, inRps: Double, procRps: Double,
                            batchMs: Long, stateRows: Long, stateMem: Long,
                            batchId: Long)
    val samples = collection.mutable.ArrayBuffer.empty[Sample]
    var lastBatch = -1L
    while (System.currentTimeMillis() < deadline) {
      Thread.sleep(1000)
      val p = query.lastProgress
      if (p != null && p.batchId != lastBatch && p.numInputRows > 0) {
        lastBatch = p.batchId
        val so = p.stateOperators
        samples += Sample(System.currentTimeMillis(),
          p.inputRowsPerSecond, p.processedRowsPerSecond,
          p.durationMs.getOrDefault("triggerExecution", 0L),
          if (so.nonEmpty) so(0).numRowsTotal else 0L,
          if (so.nonEmpty) so(0).memoryUsedBytes else 0L,
          p.batchId)
      }
    }
    query.stop()

    val t0 = samples.headOption.map(_.t).getOrElse(0L)
    println(f"[stream-soak] rate=$rate%d rows/s, ${minutes}%.1f min, " +
      s"${samples.size} batches sampled")
    // ~30 s downsample for the record
    var nextPrint = 0L
    samples.foreach { s =>
      if (s.t - t0 >= nextPrint) {
        nextPrint += 30000
        println(f"[stream-soak] t=${(s.t - t0) / 1000}%4ds batch=${s.batchId}%4d " +
          f"in=${s.inRps}%9.1f proc=${s.procRps}%9.1f batch_ms=${s.batchMs}%6d " +
          f"state_rows=${s.stateRows}%8d state_mb=${s.stateMem / 1e6}%7.1f")
      }
    }
    if (samples.nonEmpty) {
      // steady state = second half of the run (warmup + population
      // build-up excluded)
      val steady = samples.drop(samples.size / 2)
      val durs = steady.map(_.batchMs).sorted
      def pct(p: Double) = durs((p * (durs.size - 1)).toInt)
      val flagged = flaggedTotal.get()
      println(f"[stream-soak] steady proc_rps=${steady.map(_.procRps).sum / steady.size}%.1f " +
        f"batch_ms_p50=${pct(0.5)}%d batch_ms_p95=${pct(0.95)}%d " +
        f"state_rows_final=${samples.last.stateRows}%d " +
        f"state_mb_final=${samples.last.stateMem / 1e6}%.1f " +
        f"flags=$flagged%d")
      // boundedness signal: state growth rate in the last quarter vs the
      // first quarter (a capped store must flatten)
      val q1 = samples.take(samples.size / 4)
      val q4 = samples.drop(3 * samples.size / 4)
      def slope(xs: collection.Seq[Sample]) =
        if (xs.size < 2) 0.0
        else (xs.last.stateRows - xs.head.stateRows).toDouble /
          math.max(1L, (xs.last.t - xs.head.t) / 1000)
      println(f"[stream-soak] state_rows_per_s q1=${slope(q1)}%.1f q4=${slope(q4)}%.1f")
    }
    spark.stop()
  }
}
