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
  * Replay safety: a micro-batch replayed after a failure between sink
  * write and checkpoint commit must not double-merge. Every rollup row
  * carries `last_batch` = the highest batch id merged into its
  * partition; a replay (batchId <= stored last_batch for every touched
  * partition) is skipped wholesale. This is the same
  * offsets-plus-idempotent-sink contract the collector's
  * `batch_id=<id>` subpartitions implement, adapted to merged state.
  */
object Rollup {

  /** One merge step — factored out of the stream so replay semantics are
    * directly testable. Returns true if the merge ran, false if it was
    * recognized as a replay and skipped.
    */
  private[streaming] def mergeBatch(spark: SparkSession, batch: DataFrame,
                                    batchId: Long, rollupDir: String): Boolean = {
    val partial = batch
      .withColumn("p_date", to_date(col("ts")))
      .groupBy(col("series"), col("p_date"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total"),
        min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    if (partial.isEmpty) return false
    val touched = partial.select("p_date").distinct()

    // explicit existence probe (not exception matching — the missing-path
    // error type varies between the driver read and schema inference)
    val path = new org.apache.hadoop.fs.Path(rollupDir)
    val hasExisting = path.getFileSystem(
      spark.sessionState.newHadoopConf()).exists(path)
    val existing =
      if (hasExisting)
        spark.read.parquet(rollupDir)
          .join(broadcast(touched), Seq("p_date"), "left_semi")
      else spark.emptyDataFrame

    if (hasExisting && !existing.isEmpty) {
      // replay detection: every touched partition already merged this id
      val maxMerged = existing.agg(min(col("last_batch"))).head.getLong(0)
      if (maxMerged >= batchId) return false
    }

    val merged0 =
      if (hasExisting)
        existing.select("series", "p_date", "cnt", "total", "vmin", "vmax")
          .unionByName(partial)
      else partial
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
