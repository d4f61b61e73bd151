package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incrementally-maintained rollup table — the serving-layer complement
  * of the raw point sink: per (series, day) count/sum/min/max kept
  * up-to-date per micro-batch, so dashboard reads (q48's downsample
  * shape) hit a table whose size is days × series instead of scanning
  * raw points. At 100 TB of points the rollup is the difference between
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

  /** One merge step — factored out of the stream so replay semantics are
    * directly testable. Returns true if any partition merged, false if
    * the batch was empty or fully recognized as a replay.
    */
  private[streaming] def mergeBatch(spark: SparkSession, batch: DataFrame,
                                    batchId: Long, rollupDir: String): Boolean = {
    // null ts has no partition; null value would poison total (NULL) and
    // the Grafana read's getDouble — same validity discipline as
    // Collector.transform and Grafana.slice
    val partial = batch
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .withColumn("p_date", to_date(col("ts")))
      .groupBy(col("series"), col("p_date"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total"),
        min(col("value")).as("vmin"), max(col("value")).as("vmax"))
      .persist()
    try {
      val touched = partial.select("p_date").distinct()
        .collect().map(_.getDate(0)).toSeq
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

      val todo: Seq[java.sql.Date] =
        if (!hasData) touched
        else {
          val lastByDate = spark.read.parquet(rollupDir)
            .filter(col("p_date").isin(touched: _*))
            .groupBy("p_date").agg(max("last_batch").as("lb"))
            .collect().map(r => r.getDate(0) -> r.getLong(1)).toMap
          val ahead = lastByDate.filter(_._2 > batchId)
          if (ahead.nonEmpty) throw new IllegalStateException(
            s"rollup at $rollupDir is ahead of batch $batchId for partitions " +
              s"${ahead.keys.toSeq.sorted.mkString(",")} — the stream's " +
              "checkpoint was reset against an existing table; refusing to " +
              "merge (data would be silently dropped). Point the stream at a " +
              "fresh rollupDir or restore the matching checkpoint.")
          // == batchId: that partition's data is already in (crash landed
          // between its commit and the checkpoint's) — skip just it
          touched.filterNot(d => lastByDate.get(d).contains(batchId))
        }
      if (todo.isEmpty) return false

      val partialTodo = partial.filter(col("p_date").isin(todo: _*))
      val merged0 =
        if (hasData)
          spark.read.parquet(rollupDir)
            .filter(col("p_date").isin(todo: _*))
            .select("series", "p_date", "cnt", "total", "vmin", "vmax")
            .unionByName(partialTodo)
        else partialTodo
      merged0
        .groupBy(col("series"), col("p_date"))
        .agg(sum(col("cnt")).as("cnt"), sum(col("total")).as("total"),
          min(col("vmin")).as("vmin"), max(col("vmax")).as("vmax"))
        .withColumn("last_batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("p_date")
        .parquet(rollupDir)
      true
    } finally partial.unpersist()
  }

  /** Maintain the rollup from a streaming points DataFrame
    * (series, ts, value).
    */
  def start(spark: SparkSession, points: DataFrame, rollupDir: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    points.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(spark, batch, batchId, rollupDir); ()
      }
      .start()
}
