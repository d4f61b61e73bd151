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
