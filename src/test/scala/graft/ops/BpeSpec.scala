package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge learning + application laws (q114, SURVEY.md §2.2):
  * hand-computed merges on a constructed corpus (including the greedy
  * left-to-right pairing of `aaa` and the frequency-weighted counts),
  * the monotone-frequency law, and the segmentation round-trip of
  * [[TextAnalysis.applyBpeMerges]].
  */
class BpeSpec extends SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("learns the hand-computed merge sequence, greedy + lexical tiebreak") {
    // corpus: aaab ×2, aab ×1 (one doc; weighting via occurrence count)
    // round 1: (a,a) counts 2·2+1=5 (OVERLAPPING positions in aaa both
    //   count), (a,b) 2+1=3 → merge aa
    // round 2: seqs ' aa  a  b '×2 (GREEDY: aaa → (aa, a), never
    //   (a, aa)), ' aa  b '×1; pairs (aa,a) 2, (a,b) 2, (aa,b) 1 →
    //   tie on count, lexical a < aa → merge ab
    // round 3: ' aa  ab '×2, ' aa  b '×1 → (aa,ab) 2 beats (aa,b) 1 →
    //   merge aaab
    val merges = TextAnalysis.learnBpeMerges(docs("aaab aaab aab"), 3)
    assert(merges == Seq(
      (1L, "a", "a", "aa", 5L),
      (2L, "a", "b", "ab", 2L),
      (3L, "aa", "ab", "aaab", 2L)))
  }

  test("pair counts weight by word frequency across docs, and merge freqs never increase") {
    // word freqs: xy ×4 (across three docs), yzyz ×1; q9 is non-alpha →
    // excluded. Round 1: (x,y) = 4 (frequency-weighted) beats
    // (y,z) = 2 and (z,y) = 1 from yzyz. Rounds 2-3 consume yzyz:
    // (y,z) → yz (cnt 2), then (yz,yz) → yzyz (cnt 1).
    val m = TextAnalysis.learnBpeMerges(
      docs("xy xy", "xy yzyz", "q9 xy"), 3)
    assert(m == Seq(
      (1L, "x", "y", "xy", 4L),
      (2L, "y", "z", "yz", 2L),
      (3L, "yz", "yz", "yzyz", 1L)), m.toString)
    // every new pair's count is bounded by the pair it derives from —
    // the merge frequency sequence is monotone non-increasing
    assert(m.map(_._5) == m.map(_._5).sorted.reverse)
  }

  test("q114 on the real table: ranks contiguous, merged = a||b, freqs monotone") {
    val rows = graft.SparkEntry.queries("q114_bpe_merges")(spark, sf())
      .orderBy("merge_rank").collect()
    assert(rows.length == TextAnalysis.BpeMerges)
    assert(rows.map(_.getLong(0)).toSeq == (1L to TextAnalysis.BpeMerges).toSeq)
    rows.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0L)
    }
    val freqs = rows.map(_.getLong(4)).toSeq
    assert(freqs == freqs.sorted.reverse,
      s"merge freqs must be non-increasing: $freqs")
  }

  test("applyBpeMerges segments with learned merges; concatenation reconstructs the words") {
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val d = docs("aaab aab xyz9 b")
    val seg = d.select(col("doc_id"),
      TextAnalysis.applyBpeMerges(col("text"),
        merges.map { case (a, b) => (a, b) }).as("toks"))
    val toks = seg.head().getSeq[String](1)
    // aaab → fully merged; aab → ' aa  b ' ((a,b) cannot fire inside —
    // the wrapping invariant blocks partial-token matches); xyz9 is
    // non-alphabetic → passes through whole; b → single symbol
    assert(toks == Seq("aaab", "aa", "b", "xyz9", "b"), toks.toString)
  }

  test("exhausting mergeable pairs fails LOUDLY, never silently diverging from the oracle") {
    // all-non-alpha corpus: no seedable words at all
    val e1 = intercept[IllegalArgumentException] {
      TextAnalysis.learnBpeMerges(docs("123 456 7a8"), 1)
    }
    assert(e1.getMessage.contains("no mergeable pairs"))
    // single-char vocab collapses after its only merges are spent
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.learnBpeMerges(docs("ab ab"), 3) // merge 1 = ab, then dry
    }
    assert(e2.getMessage.contains("round 2 of 3"))
  }

  test("learned merges are partitioning-independent (§7.5 determinism law)") {
    val base = graft.model.Tables(spark, sf(), "documents")
      .select("doc_id", "text")
    val a = TextAnalysis.learnBpeMerges(base.repartition(7), 10)
    val b = TextAnalysis.learnBpeMerges(base.repartition(3), 10)
    assert(a == b, s"partitioning changed the learned merges:\n$a\n$b")
  }

  test("q116 law: subword count is bounded by words below and characters above") {
    val out = graft.SparkEntry.queries("q116_bpe_encode")(spark, sf())
    val counts = graft.model.Tables(spark, sf(), "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), w => w =!= "")).cast("long")
          .as("n_words"),
        length(col("text")).cast("long").as("n_chars"))
    val j = out.join(counts, "doc_id")
    // each word maps to >= 1 subword; merging can never produce more
    // subwords than the word has characters
    assert(j.filter(col("n_subwords") < col("n_words")).isEmpty)
    assert(j.filter(col("n_subwords") > col("n_chars") + 1).isEmpty)
    spark.catalog.clearCache()
  }

  // ───────────────────── batched learner (q119/q120) ─────────────────────

  test("batched learner at k = 1 IS the sequential learner, bit for bit") {
    // the fixture from the hand-computed test AND the real table: the
    // k = 1 specialization must reproduce learnBpeMerges exactly (one
    // candidate per round, always kept)
    val d = docs("aaab aaab aab")
    assert(TextAnalysis.learnBpeMergesBatched(d, 3, 1) ==
      TextAnalysis.learnBpeMerges(d, 3))
    val base = graft.model.Tables(spark, sf(), "documents")
    assert(TextAnalysis.learnBpeMergesBatched(base, 10, 1) ==
      TextAnalysis.learnBpeMerges(base, 10))
  }

  test("one batched round of k mutually-disjoint pairs equals k sequential merges") {
    // 2-char words complete on their first merge, so no merge creates
    // new pairs — the disjointness precondition of the equivalence law
    // holds for the whole window: (a,b)=9, (c,d)=6, (e,f)=3
    val d = docs(("ab " * 9 + "cd " * 6 + "ef " * 3).trim)
    val batched = TextAnalysis.learnBpeMergesBatched(d, 1, 3)
    val sequential = TextAnalysis.learnBpeMerges(d, 3)
    assert(batched == sequential, s"$batched\nvs\n$sequential")
    assert(batched == Seq(
      (1L, "a", "b", "ab", 9L),
      (2L, "c", "d", "cd", 6L),
      (3L, "e", "f", "ef", 3L)))
  }

  test("interacting candidates defer to later rounds (all-higher-ranks rule)") {
    // Round 1: (a,b)=9 kept; (b,c)=6 shares b with rank 1 → dropped;
    // (c,d)=3 is disjoint from rank 1 but shares c with the DROPPED
    // rank 2 — the all-higher-ranks rule (decidable without sequential
    // state, the oracle's NOT EXISTS) drops it too. Round 2: (b,c)
    // kept, (c,d) STILL shares c with it → deferred again. Round 3:
    // (c,d) alone, kept. Three rounds to drain a 3-chain — the
    // conservative rule's worst case, by design.
    val d = docs(("ab " * 9 + "bc " * 6 + "cd " * 3).trim)
    val m = TextAnalysis.learnBpeMergesBatched(d, 3, 3)
    assert(m == Seq(
      (1L, "a", "b", "ab", 9L),
      (2L, "b", "c", "bc", 6L),
      (3L, "c", "d", "cd", 3L)), m.toString)
  }

  test("q119 on the real table: ranks contiguous, merged = a||b, within-round freqs sane") {
    val rows = graft.SparkEntry.queries("q119_bpe_merges_batched")(spark, sf())
      .orderBy("merge_rank").collect()
    assert(rows.nonEmpty &&
      rows.length <= TextAnalysis.BpeBatchRounds * TextAnalysis.BpeBatchK)
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    rows.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0L)
    }
    // deeper than q114's 20 merges: the batched run must actually reach
    // a higher merge count (the whole point of the dial)
    assert(rows.length > TextAnalysis.BpeMerges,
      s"batched run learned only ${rows.length} merges")
  }

  test("batched merges are partitioning-independent (§7.5 determinism law)") {
    val base = graft.model.Tables(spark, sf(), "documents")
      .select("doc_id", "text")
    val a = TextAnalysis.learnBpeMergesBatched(base.repartition(7), 5, 4)
    val b = TextAnalysis.learnBpeMergesBatched(base.repartition(3), 5, 4)
    assert(a == b, s"partitioning changed the batched merges:\n$a\n$b")
  }

  // ───────────────────── end-of-word marker variant ─────────────────────

  test("</w> marker learns final-position units the markerless form cannot") {
    // type freqs: ab ×3, abc ×2. Markerless: (a,b)=5 then (ab,c)=2.
    // With the marker, round 2's top pair is (ab, </w>)=3 — the
    // FINAL-position 'ab' unit, distinct from the word-internal one.
    val d = docs("ab ab ab abc abc")
    assert(TextAnalysis.learnBpeMerges(d, 2) == Seq(
      (1L, "a", "b", "ab", 5L),
      (2L, "ab", "c", "abc", 2L)))
    assert(TextAnalysis.learnBpeMerges(d, 2, eowMarker = true) == Seq(
      (1L, "a", "b", "ab", 5L),
      (2L, "ab", "</w>", "ab</w>", 3L)))
  }

  test("marker mode recovers word boundaries on mixed content, pass-through included") {
    import spark.implicits._
    // alpha words carry </w> from the seed; the r16 extension gives
    // pass-through types (xyz9, 42) the SAME marker, so splitting the
    // token concatenation on the marker IS word-boundary recovery —
    // uniformly, with no side table of which words were alpha
    val d = docs("ab ab ab abc abc xyz9 ab 42")
    val merges = TextAnalysis.learnBpeMerges(d, 2, eowMarker = true)
    val (enc, seg) = TextAnalysis.bpeEncodeTokens(d, merges, eowMarker = true)
    val seqStr = enc.orderBy("doc_id").select("seq").as[String].head()
    val words = seqStr.split(" ").mkString("").split("</w>", -1).toSeq
      .filter(_.nonEmpty)
    assert(words == Seq("ab", "ab", "ab", "abc", "abc", "xyz9", "ab", "42"),
      s"recovered: $words from '$seqStr'")
    seg.unpersist()
  }

  test("marker-mode encoding round-trips once markers are stripped") {
    val d = docs("ab ab ab abc abc", "xyz9 ab")
    val merges = TextAnalysis.learnBpeMerges(d, 2, eowMarker = true)
    val (enc, seg) = TextAnalysis.bpeEncodeTokens(d, merges, eowMarker = true)
    val bad = enc.join(d, "doc_id")
      .select(
        concat_ws("", filter(split(col("text"), " "), w => w =!= "")).as("orig"),
        regexp_replace(concat_ws("", split(col("seq"), " ")), "</w>", "")
          .as("rt"))
      .filter(col("orig") =!= col("rt"))
    assert(bad.isEmpty, s"${bad.count()} docs fail the marker round-trip")
    seg.unpersist()
  }

  // ───────────────────── fold-depth guard (segmentTypes) ─────────────────────

  test("chunked segmentTypes equals the single-fold path beyond SegFoldChunk merges") {
    import spark.implicits._
    // 25 chained merges building the full alphabet + 10 inert ones —
    // 35 > SegFoldChunk(32), so segmentTypes runs TWO stages with a
    // checkpoint between, and the chain's later merges (ranks 26-35)
    // apply in the second chunk over the first chunk's output.
    assert(TextAnalysis.SegFoldChunk == 32)
    val chain = (1 until 26).map(i =>
      ("abcdefghijklmnopqrstuvwxyz".take(i), ('a' + i).toChar.toString))
    val inert = Seq(("q", "q"), ("zz", "z"), ("xx", "x"), ("pp", "p"),
      ("mm", "m"), ("tt", "t"), ("rr", "r"), ("ss", "s"), ("uu", "u"),
      ("vv", "v"))
    val merges = chain ++ inert
    val words = Seq("abcdefghijklmnopqrstuvwxyz", "abc", "abcd", "zzz",
      "hello", "q9x", "qqqq", "a")
    val types = words.toDF("w")
    val chunked = TextAnalysis.segmentTypes(types, merges)
      .select("w", "sws").as[(String, String)].collect().toMap
    // reference path: applyBpeMerges folds ALL merges into ONE
    // expression (fine at 35; the chunking exists for 30k)
    val single = types
      .select(col("w"), array_join(
        TextAnalysis.applyBpeMerges(col("w"), merges), " ").as("sws"))
      .as[(String, String)].collect().toMap
    assert(chunked == single, s"$chunked\nvs\n$single")
    // sanity: the full-alphabet word actually merged down to one symbol
    assert(chunked("abcdefghijklmnopqrstuvwxyz") ==
      "abcdefghijklmnopqrstuvwxyz")
    assert(chunked("abcd") == "abcd")
    assert(chunked("q9x") == "q9x") // non-alpha passes through whole
  }

  test("round-trip on real docs: subword concatenation equals the original words (q113-chain acceptance)") {
    val learned = TextAnalysis.learnBpeMerges(
      graft.model.Tables(spark, sf(), "documents"), TextAnalysis.BpeMerges)
    val merges = learned.map(m => (m._2, m._3))
    val d = graft.model.Tables(spark, sf(), "documents").limit(200)
    val bad = d.select(
        concat_ws("", filter(split(col("text"), " "), w => w =!= "")).as("orig"),
        concat_ws("", TextAnalysis.applyBpeMerges(col("text"), merges)).as("rt"))
      .filter(col("orig") =!= col("rt"))
    assert(bad.isEmpty, s"${bad.count()} docs fail the BPE round-trip")
  }
}
