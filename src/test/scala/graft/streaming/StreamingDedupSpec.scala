package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming ingest dedup: exact dedup drops re-deliveries regardless of
  * lateness; the watermark-bounded variant drops near-in-time duplicates
  * while keeping per-key state bounded (SURVEY.md §5.2.5).
  */
class StreamingDedupSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("exact streaming dedup keeps first delivery of each content") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingDedup.dedupExact(
      input.toDS().toDF("doc_id", "ts", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "alpha beta"),
        (2L, ts("2024-01-01 10:00:01"), "gamma delta"))
      q.processAllAvailable()
      // re-delivery of doc 1's content under a new id, much later
      input.addData((3L, ts("2024-01-01 12:00:00"), "alpha beta"))
      q.processAllAvailable()
      val out = spark.table("dedup_out").select("doc_id").as[Long].collect().sorted
      assert(out.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("watermark-bounded dedup drops near duplicates, evicts old state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingDedup.dedupWithinWatermark(
      input.toDS().toDF("doc_id", "ts", "text"), delay = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_wm_out")
      .start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "alpha beta"),
        (2L, ts("2024-01-01 10:02:00"), "alpha beta"), // dup within delay
        (3L, ts("2024-01-01 10:03:00"), "gamma delta"))
      q.processAllAvailable()
      // advance the watermark far past the first keys' event times...
      input.addData((4L, ts("2024-01-01 11:00:00"), "epsilon zeta"))
      q.processAllAvailable()
      // ...then re-deliver doc 1's content: its state was evicted, so the
      // late duplicate passes (the batch dedup pass catches it instead)
      input.addData((5L, ts("2024-01-01 11:01:00"), "alpha beta"))
      q.processAllAvailable()
      val out = spark.table("dedup_wm_out").select("doc_id").as[Long].collect().sorted
      assert(out.toSeq == Seq(1L, 3L, 4L, 5L))
    } finally q.stop()
  }
}
