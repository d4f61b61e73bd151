package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for the collector's sink table.
  *
  * A 1 s-trigger collector (reference cadence, index.js:284) appends one
  * small file per micro-batch per partition — after a day that is tens of
  * thousands of kilobyte files, and at 100 TB scale the NameNode/listing
  * cost and per-file open overhead dominate reads. Compaction rewrites
  * any `p_date=` partition whose file count exceeds a threshold into a
  * few right-sized files, partition-atomically (write temp → swap), so
  * readers never observe a partial partition.
  *
  * Run it like retention ([[Retention.enforce]]): a periodic maintenance
  * job over closed (past-day) partitions.
  */
object Compaction {

  /** Compact partitions with more than `maxFiles` data files down to
    * `targetFiles`. Returns the number of partitions rewritten.
    */
  def compact(spark: SparkSession, tableDir: String, format: String = "json",
              maxFiles: Int = 8, targetFiles: Int = 1): Int = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    var rewritten = 0
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("p_date="))
      .foreach { part =>
        val dataFiles = fs.listStatus(part.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
            && !f.getPath.getName.startsWith("."))
        if (dataFiles.length > maxFiles) {
          val df = spark.read.format(format).load(part.getPath.toString)
          val tmp = new Path(part.getPath.getParent, s".compact_tmp_${part.getPath.getName}")
          df.repartition(targetFiles)
            .write.mode("overwrite").format(format).save(tmp.toString)
          fs.delete(part.getPath, true)
          fs.rename(tmp, part.getPath)
          rewritten += 1
        }
      }
    rewritten
  }
}
