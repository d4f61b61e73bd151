package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import graft.streaming.Sessionizer._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream


/** flatMapGroupsWithState sessionizer: closes sessions on in-stream gaps
  * and keeps O(1) state per key (SURVEY.md §5.2.5).
  */
class SessionizerSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("closes a session when the event-time gap is exceeded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sample]
    val q = sessionize(input.toDS(), gapMs = 10 * 60 * 1000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .start()
    try {
      // session 1: two samples 5 min apart; then a 30-min gap opens s2
      input.addData(
        Sample("cpu", ts("2024-01-01 10:00:00"), 1.0),
        Sample("cpu", ts("2024-01-01 10:05:00"), 2.0))
      q.processAllAvailable()
      input.addData(Sample("cpu", ts("2024-01-01 10:35:00"), 3.0))
      q.processAllAvailable()
      val out = spark.table("sess_out").as[SessionOut].collect()
      assert(out.length == 1)
      val s = out.head
      assert(s.series == "cpu")
      assert(s.count == 2 && s.sum == 3.0)
      assert(s.startMs == ts("2024-01-01 10:00:00").getTime)
      assert(s.endMs == ts("2024-01-01 10:05:00").getTime + 10 * 60 * 1000L)
    } finally q.stop()
  }

  test("separate keys keep separate state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sample]
    val q = sessionize(input.toDS(), gapMs = 10 * 60 * 1000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out2")
      .start()
    try {
      input.addData(
        Sample("cpu", ts("2024-01-01 10:00:00"), 1.0),
        Sample("mem", ts("2024-01-01 10:00:00"), 5.0))
      q.processAllAvailable()
      // close only cpu's session via a later cpu event
      input.addData(Sample("cpu", ts("2024-01-01 11:00:00"), 1.0))
      q.processAllAvailable()
      val out = spark.table("sess_out2").as[SessionOut].collect()
      assert(out.length == 1 && out.head.series == "cpu")
    } finally q.stop()
  }
}
