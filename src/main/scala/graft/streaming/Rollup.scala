package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incrementally-maintained rollup table — the serving-layer complement
  * of the raw point sink: per (series, day) — or (series, hour) —
  * count/sum/min/max kept up-to-date per micro-batch, so dashboard
  * reads (q48's downsample shape) hit a table whose size is buckets ×
  * series instead of scanning raw points. At 100 TB of points the rollup is the difference between
  * a dashboard query reading megabytes and terabytes.
  *
  * Maintenance = read-merge-overwrite of ONLY the date partitions the
  * batch touches (dynamic partition overwrite, same mechanics as the
  * collector sink): existing rollup rows for touched days union the
  * batch's partials, re-aggregate (count/sum/min/max are associative),
  * rewrite those partitions. Untouched days are never read or written.
  *
  * Replay safety is PER PARTITION: every rollup row carries
  * `last_batch` = the batch id that last rewrote its partition. Dynamic
  * partition overwrite is not atomic ACROSS partitions, so a crash
  * mid-commit can leave some touched partitions already carrying this
  * batch and others not — on replay, partitions whose `last_batch`
  * equals the replayed id are excluded from both the merge and the
  * rewrite (their data is in), and only the rest are merged. A stored
  * `last_batch` GREATER than the incoming id means the checkpoint was
  * reset against an existing table — that is refused loudly rather than
  * silently skipping data.
  */
object Rollup {

  /** One merge step at day granularity (partition column `p_date`) —
    * factored out of the stream so replay semantics are directly
    * testable. Returns true if any partition merged, false if the batch
    * was empty or fully recognized as a replay.
    */
  private[streaming] def mergeBatch(spark: SparkSession, batch: DataFrame,
                                    batchId: Long, rollupDir: String): Boolean =
    mergeBatchOn(spark, batch, batchId, rollupDir, "p_date", to_date(col("ts")))

  /** [[mergeBatch]] at hour granularity: partition column `p_hour` =
    * `date_trunc('hour', ts)` (a timestamp partition value). Same
    * machinery, same per-partition replay discipline — a second rollup
    * table for dashboards that zoom below a day; at 100 TB the table is
    * still only hours × series.
    */
  private[streaming] def mergeBatchHourly(spark: SparkSession, batch: DataFrame,
                                          batchId: Long, rollupDir: String): Boolean =
    mergeBatchOn(spark, batch, batchId, rollupDir, "p_hour",
      date_trunc("hour", col("ts")))

  /** The granularity-generic merge core: `bucket` maps `ts` to the
    * partition value stored under `partCol` (day: date, hour:
    * timestamp). Partition values flow as opaque `Any` through the
    * touched/replay bookkeeping — `isin` and map equality behave
    * identically for java.sql.Date and Timestamp.
    */
  /** The checksum-free view of a local filesystem — pointer files are
    * written and read through it so no .crc sidecar can race their
    * atomic rename (non-local filesystems pass through unchanged).
    */
  private[graft] def rawFs(fs: org.apache.hadoop.fs.FileSystem)
      : org.apache.hadoop.fs.FileSystem = fs match {
    case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
    case other => other
  }

  private def mergeBatchOn(spark: SparkSession, batch: DataFrame,
                           batchId: Long, rollupDir: String,
                           partCol: String, bucket: Column): Boolean = {
    // null ts has no partition; null value would poison total (NULL) and
    // the Grafana read's getDouble — same validity discipline as
    // Collector.transform and Grafana.slice
    val partial = batch
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .withColumn(partCol, bucket)
      .groupBy(col("series"), col(partCol))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total"),
        min(col("value")).as("vmin"), max(col("value")).as("vmax"))
      .persist()
    try {
      val touched = partial.select(partCol).distinct()
        .collect().map(_.get(0)).toSeq
      if (touched.isEmpty) return false

      // committed data present? bare path existence is not enough — a
      // crash before any commit can leave staging dirs only, and
      // read.parquet over them would wedge every subsequent batch
      val dirPath = new org.apache.hadoop.fs.Path(rollupDir)
      val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
      val hasData = fs.exists(dirPath) && {
        val it = fs.listFiles(dirPath, true)
        var found = false
        while (!found && it.hasNext)
          found = it.next().getPath.getName.endsWith(".parquet")
        found
      }

      val todo: Seq[Any] =
        if (!hasData) touched
        else {
          val lastByPart = spark.read.parquet(rollupDir)
            .filter(col(partCol).isin(touched: _*))
            .groupBy(partCol).agg(max("last_batch").as("lb"))
            .collect().map(r => r.get(0) -> r.getLong(1)).toMap
          val ahead = lastByPart.filter(_._2 > batchId)
          if (ahead.nonEmpty) throw new IllegalStateException(
            s"rollup at $rollupDir is ahead of batch $batchId for partitions " +
              s"${ahead.keys.map(_.toString).toSeq.sorted.mkString(",")} — the stream's " +
              "checkpoint was reset against an existing table; refusing to " +
              "merge (data would be silently dropped). Point the stream at a " +
              "fresh rollupDir or restore the matching checkpoint.")
          // == batchId: that partition's data is already in (crash landed
          // between its commit and the checkpoint's) — skip just it
          touched.filterNot(d => lastByPart.get(d).contains(batchId))
        }
      if (todo.isEmpty) return false

      val partialTodo = partial.filter(col(partCol).isin(todo: _*))
      val merged0 =
        if (hasData)
          spark.read.parquet(rollupDir)
            .filter(col(partCol).isin(todo: _*))
            .select("series", partCol, "cnt", "total", "vmin", "vmax")
            .unionByName(partialTodo)
        else partialTodo
      merged0
        .groupBy(col("series"), col(partCol))
        .agg(sum(col("cnt")).as("cnt"), sum(col("total")).as("total"),
          min(col("vmin")).as("vmin"), max(col("vmax")).as("vmax"))
        .withColumn("last_batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol)
        .parquet(rollupDir)
      true
    } finally partial.unpersist()
  }

  /** Hour→day demotion — the hour table's retention story. The hour
    * rollup grows at 8760 × series rows/year; dashboards only zoom
    * into RECENT hours, so hours older than `cutoff` (exclusive, the
    * same convention as [[Retention.enforce]]) demote into the day
    * rollup at `dayDir`: their count/sum/min/max aggregate EXACTLY
    * into day rows (all four are associative — no information the day
    * granularity needs is lost) and the hour partitions then drop,
    * metadata-only.
    *
    * Lifecycle note: this is for the DERIVED layout — one stream
    * maintains the hour table, and the day table is the demotion
    * product. If a second stream already maintains the day table
    * directly, demotion would double-count; use
    * [[Retention.enforce]]-style drops on the hour table instead.
    *
    * Crash safety mirrors the merge's per-partition discipline: each
    * rewritten day partition records `demoted_through` = the latest
    * hour folded in. Dropping the hour partitions happens AFTER the
    * day writes, so a crash between the two leaves already-merged
    * hour partitions behind — on re-run, hours at or below the stored
    * watermark are excluded from the merge and only their directories
    * drop. Partial days demote exactly: a later run folds the
    * remaining hours into the same day row (associativity again).
    *
    * Driver-side partition listing, like Retention/Compaction: right
    * for time-partition maintenance windows. Returns
    * (hourPartitionsDropped, dayPartitionsTouched).
    */
  def demoteHours(spark: SparkSession, hourDir: String, dayDir: String,
                  cutoff: java.sql.Timestamp): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val root = new Path(hourDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return (0, 0)
    val hourParts = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("p_hour="))
      .map { s =>
        // partition dir names escape ':' etc. URL-style (%3A)
        val v = java.net.URLDecoder.decode(
          s.getPath.getName.stripPrefix("p_hour="), "UTF-8")
        (s.getPath, java.sql.Timestamp.valueOf(v))
      }
    val old = hourParts.filter(_._2.before(cutoff))
    if (old.isEmpty) return (0, 0)

    val dayPath = new Path(dayDir)
    val hasDay = fs.exists(dayPath) && {
      val it = fs.listFiles(dayPath, true)
      var found = false
      while (!found && it.hasNext)
        found = it.next().getPath.getName.endsWith(".parquet")
      found
    }
    // mergeSchema: stream-written day partitions lack demoted_through;
    // a plain read could sample its schema from one of those footers
    // and silently hide every stored watermark
    def dayTable = spark.read.option("mergeSchema", "true").parquet(dayDir)
    val watermarks: Map[String, java.sql.Timestamp] =
      if (!hasDay || !dayTable.columns.contains("demoted_through")) Map.empty
      else dayTable.groupBy(col("p_date"))
        .agg(max(col("demoted_through")).as("w"))
        .collect()
        .flatMap(r => Option(r.getTimestamp(1)).map(r.getDate(0).toString -> _))
        .toMap
    def dayOf(h: java.sql.Timestamp) =
      java.sql.Date.valueOf(h.toLocalDateTime.toLocalDate)
    val toMerge = old.filter { case (_, h) =>
      !watermarks.get(dayOf(h).toString).exists(w => !h.after(w))
    }
    var daysTouched = 0
    toMerge.groupBy { case (_, h) => dayOf(h) }.toSeq
      .sortBy(_._1.toString)
      .foreach { case (day, hrs) =>
        val hourRows = spark.read.parquet(hourDir)
          .filter(col("p_hour").isin(hrs.map(_._2): _*))
          .select(col("series"), col("cnt"), col("total"),
            col("vmin"), col("vmax"))
        val existing =
          if (hasDay) dayTable.filter(col("p_date") === lit(day))
            .select(col("series"), col("cnt"), col("total"),
              col("vmin"), col("vmax"))
          else null
        // keep the partition's replay bookkeeping intact across the
        // rewrite (mergeBatch reads last_batch per partition)
        val lastBatch: Long =
          if (existing == null) -1L
          else dayTable.filter(col("p_date") === lit(day))
            .agg(coalesce(max(col("last_batch")), lit(-1L)))
            .head().getLong(0)
        val merged = (if (existing == null) hourRows
          else existing.unionByName(hourRows))
          .groupBy(col("series"))
          .agg(sum(col("cnt")).as("cnt"), sum(col("total")).as("total"),
            min(col("vmin")).as("vmin"), max(col("vmax")).as("vmax"))
          .withColumn("last_batch", lit(lastBatch))
          .withColumn("demoted_through",
            lit(hrs.map(_._2).maxBy(_.getTime)))
          .withColumn("p_date", lit(day))
        merged.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("p_date")
          .parquet(dayDir)
        daysTouched += 1
      }
    // drop AFTER all day writes: includes partitions skipped as already
    // merged — the crash leftovers the watermark exists for
    old.foreach { case (p, _) => fs.delete(p, true) }
    (old.size, daysTouched)
  }

  /** Publish the maintained table's CURRENT state as an immutable
    * snapshot under `servedDir/snap=<n>/` and atomically flip the
    * `_CURRENT` pointer file — snapshot isolation for readers that race
    * the maintenance writer.
    *
    * WHY (measured, LifecycleSoak r11): the merge keeps the live table
    * correct with in-place dynamic partition OVERWRITE, which deletes
    * the previous files of every touched partition — a reader that
    * planned its scan before the merge and executed after it fails with
    * FILE_NOT_EXIST; under a 1 s trigger the current day's partition is
    * rewritten every second, so dashboard reads of the live dir race
    * maintenance almost every time. The composed lifecycle soak
    * measured exactly that (rollup-path read failures surviving even a
    * retry) before this tier existed.
    *
    * WHY THIS SHAPE SCALES: the rollup table is aggregate-small BY
    * DESIGN (days-or-hours × series rows — the table's whole point at
    * 100 TB), so a complete snapshot per publish is one small write,
    * independent of raw corpus size. Snapshots are append-only until
    * pruned; `keep` bounds disk while giving in-flight readers a
    * `keep`-generations grace window (a reader must finish within
    * `keep` publishes — the single-box analog of a table format's
    * snapshot retention; at production scale this tier IS the table
    * format's manifest commit).
    *
    * Pointer flip is write-temp + rename (atomic on one filesystem);
    * readers resolve [[servedTable]] → pointer → immutable snapshot dir.
    * Returns the published snapshot id.
    */
  def publish(spark: SparkSession, tableDir: String, servedDir: String,
              keep: Int = 3): Long = {
    import org.apache.hadoop.fs.Path
    val root = new Path(servedDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(root)
    val existing = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("snap="))
      .map(_.getPath.getName.stripPrefix("snap=").toLong)
    val id = if (existing.isEmpty) 0L else existing.max + 1L
    spark.read.parquet(tableDir)
      .write.mode("overwrite").parquet(s"$servedDir/snap=$id")
    val tmp = new Path(root, s"._CURRENT.tmp")
    // write through the RAW (checksum-free) filesystem: the checksummed
    // local FS pairs every file with a .crc sidecar, and rename moves
    // the pair in two steps — a reader can open the new pointer against
    // the old sidecar and die ChecksumException (observed in the
    // composed soak as rollup-path retries). No sidecar, no pair race.
    val out = rawFs(fs).create(tmp, true)
    try out.write(id.toString.getBytes("UTF-8")) finally out.close()
    // FileContext rename(OVERWRITE): atomic replace on one filesystem —
    // FileSystem.rename refuses existing targets on the local FS, and a
    // delete-then-rename pair would reopen the very window this closes
    org.apache.hadoop.fs.FileContext
      .getFileContext(root.toUri, spark.sessionState.newHadoopConf())
      .rename(tmp, new Path(root, "_CURRENT"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // prune beyond the grace window, oldest first, never the current
    existing.sorted.dropRight(math.max(keep - 1, 0))
      .foreach(old => fs.delete(new Path(root, s"snap=$old"), true))
    id
  }

  /** The reader half of [[publish]]: resolve `_CURRENT` and read that
    * immutable snapshot. Plans built from this DataFrame never observe
    * an in-place overwrite — they can only go stale, which for a rollup
    * dashboard read is the correct trade.
    */
  def servedTable(spark: SparkSession, servedDir: String): DataFrame =
    spark.read.parquet(
      s"$servedDir/snap=${currentSnapshot(spark, servedDir)}")

  /** Resolve the `_CURRENT` pointer to the published snapshot id — the
    * cheap (one small file read) per-request freshness check a serving
    * cache keys on ([[graft.serve.SnapshotCache]]); [[servedTable]] is
    * this plus the snapshot read.
    */
  def currentSnapshot(spark: SparkSession, servedDir: String): Long = {
    import org.apache.hadoop.fs.Path
    val p = new Path(servedDir, "_CURRENT")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) throw new IllegalStateException(
      s"no _CURRENT under $servedDir — nothing published yet")
    // read to EOF from ONE open handle — pre-sizing a buffer from a
    // separate getFileStatus is a TOCTOU against publish's atomic
    // replace (stat the 1-byte "9", open the 2-byte "10" ⇒ truncated id
    // pointing at a pruned snapshot). RAW fs: the pointer is written
    // sidecar-free, and a checksummed open would race any legacy .crc
    val in = rawFs(fs).open(p)
    val bos = new java.io.ByteArrayOutputStream()
    try {
      val buf = new Array[Byte](64)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    new String(bos.toByteArray, "UTF-8").trim.toLong
  }

  /** [[start]] + snapshot publication per committed batch: the stream
    * merges into the live table (exactly-once discipline unchanged) and
    * then publishes the post-merge state for racing readers. The serving
    * layer reads [[servedTable]] and never touches the live dir.
    *
    * `minPublishIntervalS` (r13): the publish-cadence dial the
    * SnapshotCache regime analysis asks for — 0 publishes per committed
    * batch (second-scale churn: maximal freshness, the cache's measured
    * LOSING regime), N > 0 publishes at most every N seconds (the served
    * tier lags the live table by up to N — the dashboard arrangement
    * where snapshot lifetime ≫ request interarrival and the cache's
    * pinned frame + memo pay off). Merging is NEVER gated — only
    * publication; the heal-on-restart publish also bypasses the gate.
    *
    * DRAIN CONTRACT (gated mode): state merged after the last publish
    * stays unpublished until the next batch opens the gate — up to N
    * seconds of served-tier lag persists across a drain-then-stop. A
    * deployment that stops the stream and keeps serving flushes with
    * one explicit [[publish]] call after `stop()` (publishing an
    * unchanged state is harmless — a fresh snapshot of identical
    * content, same as the heal path).
    */
  def startServed(spark: SparkSession, points: DataFrame, rollupDir: String,
                  servedDir: String, checkpointDir: String,
                  trigger: Trigger = Trigger.ProcessingTime("1 second"),
                  granularity: String = "day", keep: Int = 3,
                  minPublishIntervalS: Long = 0): StreamingQuery = {
    val merge: (DataFrame, Long) => Boolean = granularity match {
      case "day" => mergeBatch(spark, _, _, rollupDir)
      case "hour" => mergeBatchHourly(spark, _, _, rollupDir)
      case g => throw new IllegalArgumentException(
        s"granularity must be 'day' or 'hour', got '$g'")
    }
    // heal-on-restart: a crash between merge-commit and publish leaves
    // the served tier pointing at the pre-crash snapshot, and the
    // replayed batch's merge returns FALSE (already-in detection) — so
    // the first batch after (re)start publishes unconditionally when
    // the live table has data. Publishing an unchanged state is
    // harmless (a fresh snapshot of identical content).
    val healed = new java.util.concurrent.atomic.AtomicBoolean(false)
    // epoch-0 start: the FIRST merged batch always publishes (readers
    // need a snapshot to exist before the cadence gate matters). NOT
    // Long.MinValue — `now - MinValue` overflows negative and the gate
    // would never open.
    // PER-PROCESS by contract (r13 VERDICT #4, closed document-only): a
    // stream restart re-arms the gate, so the first post-restart batch
    // always publishes. Intentional: the cadence dial exists to bound
    // publish I/O under steady ingest, and a fresh process publishing
    // immediately re-establishes serving freshness after downtime —
    // persisting the gate across restarts would trade that for nothing.
    val lastPubMs = new java.util.concurrent.atomic.AtomicLong(0L)
    points.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val merged = merge(batch, batchId)
        val mustHeal = !healed.getAndSet(true) && !merged && {
          val root = new org.apache.hadoop.fs.Path(rollupDir)
          val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
          fs.exists(root) && fs.listStatus(root).nonEmpty
        }
        val now = System.currentTimeMillis()
        val due = minPublishIntervalS <= 0 ||
          now - lastPubMs.get() >= minPublishIntervalS * 1000
        if (mustHeal || (merged && due)) {
          publish(spark, rollupDir, servedDir, keep)
          lastPubMs.set(now)
        }
        ()
      }
      .start()
  }

  /** Maintain the rollup from a streaming points DataFrame
    * (series, ts, value). `granularity`: "day" (partition `p_date`) or
    * "hour" (partition `p_hour`) — run two streams for both tables.
    */
  def start(spark: SparkSession, points: DataFrame, rollupDir: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("1 second"),
            granularity: String = "day"): StreamingQuery = {
    val merge: (DataFrame, Long) => Boolean = granularity match {
      case "day" => mergeBatch(spark, _, _, rollupDir)
      case "hour" => mergeBatchHourly(spark, _, _, rollupDir)
      case g => throw new IllegalArgumentException(
        s"granularity must be 'day' or 'hour', got '$g'")
    }
    points.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        merge(batch, batchId); ()
      }
      .start()
  }
}
