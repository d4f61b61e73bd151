package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Drives q111's line-granular Gopher rules on constructed multi-line
  * docs — the paths the single-line word-soup corpus leaves at 0 —
  * plus the metric laws the oracle can't see per-rule.
  */
class GopherRulesSpec extends SparkSpec {

  private def metrics(texts: String*) = {
    val s = spark
    import s.implicits._
    TextAnalysis.gopherRules(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
  }

  test("a clean prose doc passes every rule") {
    val r = metrics(
      "the quick brown fox jumps over and over with that lazy dog " +
        "because the day is long and the work must be done of course").head
    assert(r.getLong(r.fieldIndex("n_rules_failed")) == 0,
      s"expected clean pass, got $r")
    assert(r.getLong(r.fieldIndex("gopher_pass")) == 1L)
  }

  test("bullet-dominated doc fails the bullet rule only via frac_bullet") {
    val bullets = (1 to 19).map(i => s"- item with the number $i").mkString("\n")
    val r = metrics(bullets + "\nthe closing line of that list").head
    val fb = r.getDouble(r.fieldIndex("frac_bullet"))
    assert(fb == 0.95, s"19/20 bullet lines, got $fb")
    assert(r.getLong(r.fieldIndex("n_rules_failed")) >= 1)
  }

  test("ellipsis-ending lines counted per line") {
    val r = metrics(
      "the first line trails off...\nand the second is fine\nso is that third one").head
    assert(r.getDouble(r.fieldIndex("frac_ellipsis")) == 0.3333)
    // 1/3 > 0.3 → the ellipsis rule fails
    assert(r.getLong(r.fieldIndex("n_rules_failed")) >= 1)
  }

  test("duplicate lines and duplicate 2-grams measure repetition") {
    val line = "the same line of text again and again"
    val r = metrics(Seq(line, line, line, "and one that differs").mkString("\n")).head
    // 4 lines, 2 distinct → 2/4 duplicated
    assert(r.getDouble(r.fieldIndex("dup_line_frac")) == 0.5)
    assert(r.getDouble(r.fieldIndex("dup_2gram_frac")) > 0.2)
    assert(r.getLong(r.fieldIndex("gopher_pass")) == 0L)
  }

  test("symbol ratio counts # and ... against words") {
    val r = metrics("the tag # and the pause ... with # again of that").head
    // 3 symbols (two '#', one '...') over 12 whitespace words
    assert(r.getDouble(r.fieldIndex("symbol_ratio")) == 0.25)
    assert(r.getLong(r.fieldIndex("n_rules_failed")) >= 1)
  }

  test("stopword rule needs two DISTINCT stopwords") {
    val one = metrics("the word the word the word the word repeated endlessly here").head
    assert(one.getLong(one.fieldIndex("n_stop")) == 1L)
    val two = metrics("the word and word the word and word repeated endlessly here").head
    assert(two.getLong(two.fieldIndex("n_stop")) == 2L)
  }

  test("generative laws: words match a Scala reference, ratios bounded, pass iff zero failures") {
    // deterministic ScalaCheck sampling (the GenerativePropertiesSpec
    // plumbing inlined — the scalatest bridge isn't in the offline cache)
    import org.scalacheck.{Gen, rng}
    val params = Gen.Parameters.default.withSize(60)
    val textGen: Gen[String] = Gen.chooseNum(0, 150).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 't', 'h', 'e', ' ', '\n', '-',
        '*', '.', '#', '9')).map(_.mkString))
    val texts = (0 until 12)
      .flatMap(i => textGen.apply(params, rng.Seed(i.toLong)))
    val rows = metrics(texts: _*)
    rows.zipWithIndex.foreach { case (r, i) =>
      val t = texts(i)
      val refWords = t.split(" ", -1).count(_.nonEmpty)
      assert(r.getLong(r.fieldIndex("n_words")) == refWords,
        s"n_words vs reference on ${t.take(40)}...")
      for (c <- Seq("frac_alpha", "symbol_ratio", "frac_bullet",
          "frac_ellipsis", "dup_line_frac", "dup_2gram_frac")) {
        val v = r.getDouble(r.fieldIndex(c))
        assert(v >= 0.0 && (c == "symbol_ratio" || v <= 1.0),
          s"$c = $v out of range on ${t.take(40)}...")
      }
      assert((r.getLong(r.fieldIndex("gopher_pass")) == 1L) ==
        (r.getLong(r.fieldIndex("n_rules_failed")) == 0L))
    }
  }

  test("degenerate inputs: empty and single-word docs don't divide by zero") {
    val rs = metrics("", "word")
    assert(rs(0).getLong(rs(0).fieldIndex("n_words")) == 0L)
    assert(rs(0).getDouble(rs(0).fieldIndex("mean_word_len")) == 0.0)
    assert(rs(1).getDouble(rs(1).fieldIndex("dup_2gram_frac")) == 0.0)
    // both fail word-count (< 3) and stopword rules
    assert(rs.forall(_.getLong(rs(0).fieldIndex("gopher_pass")) == 0L))
  }
}
