package graft.streaming

import java.sql.Timestamp
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Retention — the delete path of the reference
  * (`DELETE FROM "<m>" WHERE time < '<now - age>'`, reference
  * index.js:269-282, exclusive cutoff), re-expressed for a
  * date-partitioned table.
  *
  * On a `p_date=YYYY-MM-DD` layout:
  *  - whole days strictly before the cutoff date → **partition drop**, a
  *    filesystem metadata operation (no data read — this is what makes
  *    retention viable at 100 TB; the reference's row DELETE would be a
  *    full rewrite);
  *  - the single edge partition containing the cutoff instant → rewritten
  *    with `ts >= cutoff`, giving the reference's sub-day precision.
  */
object Retention {

  /** Enforce `keep rows with ts >= cutoff` on a p_date-partitioned
    * parquet/json table rooted at `tableDir`. Returns (droppedPartitions,
    * rewrittenPartitions).
    */
  def enforce(spark: SparkSession, tableDir: String, cutoff: Timestamp,
              format: String = "parquet"): (Int, Int) = {
    val cutoffDate = cutoff.toLocalDateTime.toLocalDate
    val fs = new Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(tableDir))) return (0, 0)
    val parts = fs.listStatus(new Path(tableDir)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith("p_date="))
    var dropped = 0
    var rewritten = 0
    parts.foreach { p =>
      val date = java.time.LocalDate.parse(p.getName.stripPrefix("p_date="))
      if (date.isBefore(cutoffDate)) {
        fs.delete(p, true) // whole-day partition drop: metadata-only
        dropped += 1
      } else if (date.isEqual(cutoffDate) &&
        cutoff.toLocalDateTime.toLocalTime != java.time.LocalTime.MIDNIGHT) {
        // edge partition: rewrite surviving rows (ts >= cutoff, the
        // complement of the reference's `time < cutoff` delete)
        val survivors = spark.read.format(format).load(p.toString)
          .filter(col("ts") >= lit(cutoff))
        val tmp = new Path(p.getParent, s".retention_tmp_${p.getName}")
        survivors.write.mode("overwrite").format(format).save(tmp.toString)
        fs.delete(p, true)
        fs.rename(tmp, p)
        rewritten += 1
      }
    }
    (dropped, rewritten)
  }
}
