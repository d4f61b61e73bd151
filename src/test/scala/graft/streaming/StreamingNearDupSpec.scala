package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming LSH near-dup: scalar simhash64 must agree bit-for-bit with
  * q86's simhash_agg on the real corpus; the stateful flagger must flag
  * exact re-deliveries in all 4 bands, pass unrelated docs, and evict
  * under the state cap.
  */
class StreamingNearDupSpec extends SparkSpec {

  test("simhash64 parity with q86 simhash_agg on sf0.001") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val q86 = graft.SparkEntry.queries("q86_simhash")(spark, sf())
      .as[(Long, String)].collect()
    assert(q86.nonEmpty)
    val texts = graft.model.Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    q86.foreach { case (id, hex) =>
      assert(java.lang.Long.parseUnsignedLong(hex, 16) ==
        StreamingNearDup.simhash64(texts(id)),
        s"simhash mismatch for doc $id")
    }
  }

  test("stream flags exact re-delivery in all 4 bands, passes unrelated docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingNearDup.flagNearDups(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_out")
      .start()
    try {
      input.addData((1L, "alpha beta gamma delta"), (2L, "wholly different words here"))
      q.processAllAvailable()
      input.addData((3L, "alpha beta gamma delta")) // re-delivery of doc 1
      q.processAllAvailable()
      val flags = spark.table("neardup_out")
        .as[StreamingNearDup.NearDupFlag].collect()
      assert(flags.forall(f => f.doc_id == 3L && f.dup_of == 1L && f.hamming == 0))
      assert(flags.map(_.band).sorted.toSeq == Seq(0, 1, 2, 3))
    } finally q.stop()
  }

  test("flags are a subset of batch q78 pairs on the real corpus") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    // batch-mode flagNearDups with an uncapped-ish state: every flag
    // (doc, dup_of) means dup_of was admitted earlier (lower doc_id) at
    // hamming <= 3 in a shared band — exactly a q78 pair (dup_of, doc).
    // The converse need not hold (a doc flagged once never enters state,
    // so later members of its cluster flag against the cluster root).
    val docs = graft.model.Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
    val flags = StreamingNearDup.flagNearDups(docs, stateCap = 100000)
      .collect()
    val pairs = graft.SparkEntry.queries("q78_simhash_neardup")(spark, sf())
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(flags.nonEmpty)
    val orphans = flags.filterNot(f => pairs.contains((f.dup_of, f.doc_id)))
    assert(orphans.isEmpty, s"flags without a batch pair: ${orphans.take(5).toSeq}")
  }

  test("no-word docs are excluded, matching batch q78 semantics") {
    import spark.implicits._
    // without the exclusion every empty doc would get sig 0 and flag the
    // others as hamming-0 dups; batch nearDupPairs filters them, so the
    // streaming flagger must too
    val flags = StreamingNearDup
      .flagNearDups(Seq((1L, ""), (2L, "   "), (3L, "")).toDS())
      .collect()
    assert(flags.isEmpty)
  }

  test("dedupFlags collapses multi-band collisions to one deterministic flag per doc") {
    import spark.implicits._
    // doc 1 admits; docs 2 and 3 are exact re-deliveries of its text —
    // each collides in ALL 4 bands (4 flags apiece, against doc 1: a
    // flagged doc never enters state, so 3 cannot flag against 2)
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma delta"),
      (4L, "totally unrelated words here")).toDS()
    val flags = StreamingNearDup.flagNearDups(docs)
    val raw = flags.collect()
    assert(raw.count(_.doc_id == 2L) == 4) // one per band pre-dedup
    val deduped = StreamingNearDup.dedupFlags(flags).collect()
      .sortBy(_.doc_id)
    assert(deduped.map(_.doc_id).toSeq == Seq(2L, 3L))
    // deterministic min rule: earliest original (doc 1), hamming 0, band 0
    assert(deduped.forall(f => f.dup_of == 1L && f.hamming == 0 && f.band == 0))
  }

  test("bucket state transition: flag vs admit, FIFO cap eviction, doc order") {
    import StreamingNearDup.{BandDoc, processBucket}
    def bd(id: Long, sig: Long) = BandDoc(0, 0, id, sig)
    // empty state: distinct sigs admit in docId order, newest first
    val (s1, f1) = processBucket(Seq.empty,
      Seq(bd(2, 0xff00L), bd(1, 0x00ffL)), maxHam = 3, stateCap = 64)
    assert(f1.isEmpty && s1 == Seq((2L, 0xff00L), (1L, 0x00ffL)))
    // within maxHam of the EARLIEST matching entry → flagged, NOT admitted
    val (s2, f2) = processBucket(s1, Seq(bd(3, 0x00feL)), 3, 64)
    assert(s2 == s1)
    assert(f2 == Seq(StreamingNearDup.NearDupFlag(3L, 1L, 0, 1)))
    // cap 2: a third distinct sig evicts the OLDEST admitted entry (doc 1)
    val (s3, f3) = processBucket(s1, Seq(bd(4, 0xf0f0L)), 3, 2)
    assert(f3.isEmpty && s3 == Seq((4L, 0xf0f0L), (2L, 0xff00L)))
    // after eviction, doc 1's near-neighbor is admitted, not flagged
    val (s4, f4) = processBucket(s3, Seq(bd(5, 0x00feL)), 3, 2)
    assert(f4.isEmpty && s4.map(_._1) == Seq(5L, 4L))
  }
}
