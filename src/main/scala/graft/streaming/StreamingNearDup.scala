package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ingest NEAR-duplicate flagging — the streaming form of the
  * q78/q86 SimHash pipeline, for catching re-crawls with trivial edits
  * (timestamps, counters, boilerplate) AT THE FRONT DOOR, where
  * [[StreamingDedup]]'s exact content hash misses them.
  *
  * Shape (mirrors the batch q78 exactly):
  *  - per incoming doc, the 64-bit SimHash ([[StreamingNearDup.simhash64]]
  *    — bit-identical to q86's `simhash_agg`, pinned by spec);
  *  - the doc keys into 4 LSH band buckets (16 bits each — pigeonhole:
  *    any pair within hamming 3 collides in ≥ 1 band, full recall);
  *  - per-bucket state (`flatMapGroupsWithState`) holds the signatures of
  *    previously ADMITTED docs; a new doc within `maxHam` of any state
  *    entry is flagged against the earliest such doc and does NOT enter
  *    state (a dup cluster costs ONE state entry, not one per member).
  *
  * State discipline at 100 TB: state per bucket is a FIFO capped at
  * `stateCap` entries of 16 bytes — total state is bounded by
  * 4 × #distinct-buckets × stateCap × 16 B regardless of stream length,
  * and band buckets shard by hash across executors. Like
  * [[StreamingDedup.dedupWithinWatermark]], eviction is a recall
  * trade-off, not a correctness one: duplicates whose original aged out
  * are left for the batch pass (q78/q85) to catch.
  *
  * Output is one flag per (doc, colliding band) — a doc is a near-dup iff
  * ANY band flags it (the 4 band groups are independent state machines;
  * emit-once coordination would need a second stateful stage for no
  * recall gain). Downstream dedups flags per doc via [[dedupFlags]]
  * (deterministic min-(dup_of, hamming, band) rule), typically in the
  * sink's `foreachBatch`.
  */
object StreamingNearDup {

  /** One band-bucket membership of one incoming doc. */
  case class BandDoc(band: Int, bucket: Int, docId: Long, sig: Long)

  /** `docId` collided with earlier `dupOf` in `band` at `hamming` ≤ maxHam. */
  case class NearDupFlag(doc_id: Long, dup_of: Long, band: Int, hamming: Int)

  /** Admitted (docId, sig) entries of one bucket, newest first. */
  case class BucketState(entries: Seq[(Long, Long)])

  /** q86's SimHash as a scalar: distinct words → md5 → per-bit ±1 votes →
    * sign. The 16-hex string `simhash_agg` emits, parsed as an unsigned
    * 64-bit value, equals this function's result on the same text
    * (StreamingNearDupSpec pins the parity on the real corpus) — so
    * streaming flags and batch near-dup pairs agree on what "near" means.
    */
  def simhash64(text: String): Long = {
    val votes = new Array[Int](64)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val md = java.security.MessageDigest.getInstance("MD5")
    text.split(" ").foreach { w =>
      if (w.nonEmpty && seen.add(w)) {
        md.reset()
        val d = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 8 digest bytes = the 16 hex chars q86 votes over
        var i = 0
        while (i < 64) {
          if (((d(i >> 3) >> (7 - (i & 7))) & 1) == 1) votes(i) += 1
          else votes(i) -= 1
          i += 1
        }
      }
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= 1L << (63 - i)
      i += 1
    }
    sig
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** One bucket's state transition for one micro-batch — pure, so the
    * admit/flag/evict semantics are unit-testable without constructing
    * hash-colliding texts. Docs process in docId order (deterministic
    * under any partition-internal arrival order); flagged docs do NOT
    * enter state; admissions prepend and the cap drops the oldest.
    */
  private[streaming] def processBucket(
      entries0: Seq[(Long, Long)], docs: Seq[BandDoc],
      maxHam: Int, stateCap: Int): (Seq[(Long, Long)], Seq[NearDupFlag]) = {
    var entries = entries0
    val out = Seq.newBuilder[NearDupFlag]
    docs.sortBy(_.docId).foreach { d =>
      val hits = entries.filter(e => hamming(e._2, d.sig) <= maxHam)
      if (hits.nonEmpty) {
        val earliest = hits.minBy(_._1)
        out += NearDupFlag(d.docId, earliest._1, d.band,
          hamming(earliest._2, d.sig))
      } else {
        entries = ((d.docId, d.sig) +: entries).take(stateCap)
      }
    }
    (entries, out.result())
  }

  /** Sink-side per-doc flag dedup — the documented companion of
    * [[flagNearDups]]'s one-flag-per-(doc, band) output: a doc colliding
    * in several bands (an exact duplicate collides in all 4) reduces to
    * ONE deterministic flag, the minimum under (dup_of, hamming, band) —
    * earliest original first, then strongest evidence. Runs in the
    * sink's `foreachBatch` (or on any batch of flags): one narrow
    * shuffle of flag rows, whose volume is the dup rate, not the stream.
    */
  def dedupFlags(flags: Dataset[NearDupFlag]): Dataset[NearDupFlag] = {
    import flags.sparkSession.implicits._
    val ord = Ordering.Tuple3[Long, Int, Int]
    flags.groupByKey(_.doc_id)
      .reduceGroups { (a: NearDupFlag, b: NearDupFlag) =>
        if (ord.lteq((a.dup_of, a.hamming, a.band),
          (b.dup_of, b.hamming, b.band))) a else b
      }
      .map(_._2)
  }

  /** Flag near-duplicate arrivals on a stream (or batch Dataset — the
    * operator degrades to a one-pass group scan) of (docId, text).
    */
  def flagNearDups(docs: Dataset[(Long, String)], maxHam: Int = 3,
                   stateCap: Int = 64): Dataset[NearDupFlag] = {
    import docs.sparkSession.implicits._
    val banded = docs.flatMap { case (id, text) =>
      // no-word docs are EXCLUDED, matching batch q78 (Dedup.nearDupPairs
      // filters them out): their vote vector is empty, so they'd all get
      // sig 0 and flag each other as hamming-0 dups of content-free rows
      if (!text.split(" ").exists(_.nonEmpty)) Seq.empty
      else {
        val sig = simhash64(text)
        (0 until 4).map(b =>
          BandDoc(b, ((sig >>> (48 - 16 * b)) & 0xffffL).toInt, id, sig))
      }
    }
    banded.groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Int), it: Iterator[BandDoc], state: GroupState[BucketState]) => {
          val (entries, flags) = processBucket(
            state.getOption.map(_.entries).getOrElse(Seq.empty),
            it.toSeq, maxHam, stateCap)
          state.update(BucketState(entries))
          flags.iterator
        })
  }
}
