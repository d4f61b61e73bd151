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
