package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** text_shingles must agree EXACTLY with the declarative split/transform/
  * concat_ws formulation the oracle SQL mirrors (including empty-word
  * behavior around consecutive/leading/trailing spaces), in both codegen
  * and interpreted execution.
  */
class TextExpressionsSpec extends SparkSpec {

  private val hofForm = expr(
    """CASE WHEN text <> '' AND size(split(text, ' ')) >= 3
      |THEN transform(sequence(0, size(split(text, ' ')) - 3),
      |     i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1], split(text, ' ')[i+2]))
      |ELSE array() END""".stripMargin)

  test("text_shingles matches the HOF form on edge cases") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    val docs = Seq(
      "a b c d e",
      "one two three",
      "two words",
      "one",
      "",
      "a  b c",      // consecutive spaces → empty word, kept
      " a b c",      // leading space → leading empty word
      "a b c ",      // trailing space → trailing empty word
      "héllo wörld ünïcode ça va",
      "x y z x y z x y z"
    ).toDF("text")
    val out = docs.select(
      expr("text_shingles(text)").as("native"), hofForm.as("hof")).collect()
    out.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
    }
  }

  test("text_shingles matches the HOF form corpus-wide (sf0.001)") {
    VectorExpressions.ensureRegistered(spark)
    val docs = graft.model.Tables(spark, sf(), "documents")
    val diff = docs.select(col("text"),
        expr("text_shingles(text)").as("native"), hofForm.as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("char_ngrams matches the substring HOF form on edge cases") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    val hof = expr(
      """CASE WHEN length(text) >= 4
        |THEN transform(sequence(1, length(text) - 3), i -> substring(text, i, 4))
        |ELSE array() END""".stripMargin)
    val docs = Seq("abcdef", "abcd", "abc", "", "a b c d", "aaaa aaaa").toDF("text")
    docs.select(expr("char_ngrams(text, 4)").as("native"), hof.as("hof"))
      .collect().foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
      }
  }

  test("char_ngrams corpus-wide parity (sf0.001)") {
    VectorExpressions.ensureRegistered(spark)
    val docs = graft.model.Tables(spark, sf(), "documents")
    val hof = expr(
      """CASE WHEN length(text) >= 8
        |THEN transform(sequence(1, length(text) - 7), i -> substring(text, i, 8))
        |ELSE array() END""".stripMargin)
    val diff = docs.select(
        expr("char_ngrams(text, 8)").as("native"), hof.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("winnow_fps matches the declarative window-min formulation") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    val docs = graft.model.Tables(spark, sf(), "documents").limit(50)
    // the shuffle-free native set must equal the explode → md5 → per-doc
    // ROWS-window min → distinct form the oracle SQL mirrors
    val declarative = docs
      .select(col("doc_id"),
        posexplode(expr("char_ngrams(text, 8)")).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"), md5(col("g")).as("h"))
      .withColumn("fp", min(col("h")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos")
          .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, 3)))
      .groupBy("doc_id").agg(sort_array(collect_set(col("fp"))).as("fps"))
    val native = docs.select(col("doc_id"),
      sort_array(expr("winnow_fps(text, 8, 4)")).as("fps"))
    val joined = native.as[(Long, Seq[String])].collect().toMap
    declarative.as[(Long, Seq[String])].collect().foreach { case (id, fps) =>
      assert(joined(id) == fps, s"doc $id")
    }
  }

  test("winnowing guarantees a shared fingerprint for long shared substrings") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    // any shared substring of length >= k + w - 1 = 11 must yield at
    // least one common window-min fingerprint (the MOSS guarantee)
    val a = "completely different prefix THE SHARED SEGMENT here"
    val b = "other text entirely THE SHARED SEGMENT and a tail"
    val out = Seq(a, b).toDF("text")
      .select(expr("winnow_fps(text, 8, 4)").as("fps")).collect()
    val fa = out(0).getSeq[String](0).toSet
    val fb = out(1).getSeq[String](0).toSet
    assert(fa.intersect(fb).nonEmpty)
  }

  test("char_ngrams slices at code points on supplementary-plane text") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    // emoji are supplementary-plane (2 UTF-16 units, 4 UTF-8 bytes): a
    // UTF-16-unit slicer would split surrogate pairs and fork the gram
    // set from DuckDB's substr(). Gram count must equal codepoints-n+1
    // and every gram must hold exactly n code points.
    val texts = Seq("😀😁😂🤣😃", "a😀b😁c", "héllo😀wörld", "🎉", "😀😀😀😀😀😀😀😀")
    val out = texts.toDF("text")
      .select(col("text"), expr("char_ngrams(text, 3)").as("grams")).collect()
    out.foreach { r =>
      val t = r.getString(0)
      val cp = t.codePointCount(0, t.length)
      val grams = r.getSeq[String](1)
      assert(grams.length == math.max(0, cp - 3 + 1), s"count for '$t'")
      grams.foreach { g =>
        assert(g.codePointCount(0, g.length) == 3, s"gram '$g' of '$t'")
      }
    }
    // sliding windows over the same text: adjacent grams overlap by n-1
    // code points — only true if slicing happened at code-point bounds
    val g0 = out.head.getSeq[String](1)
    assert(g0 == Seq("😀😁😂", "😁😂🤣", "😂🤣😃"))
  }

  test("char_ngrams matches Spark's code-point substring HOF on emoji text") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    // Spark's length()/substring() are code-point-based like DuckDB's
    // len()/substr() — the HOF form is the cross-engine semantic spec
    val hof = expr(
      """CASE WHEN length(text) >= 4
        |THEN transform(sequence(1, length(text) - 3), i -> substring(text, i, 4))
        |ELSE array() END""".stripMargin)
    val docs = Seq("😀😁😂🤣😃😄", "a😀b😁c🤣d", "ça va 😀 bien", "𝕳𝖊𝖑𝖑𝖔 𝖜𝖔𝖗𝖑𝖉")
      .toDF("text")
    docs.select(expr("char_ngrams(text, 4)").as("native"), hof.as("hof"))
      .collect().foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
      }
  }

  test("winnow_fps matches the declarative form on supplementary-plane text") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    val docs = Seq(
      (1L, "😀😁😂🤣😃😄😅😆😇😈😉😊 some ascii tail to winnow over"),
      (2L, "mixed a😀b😁c🤣d ascii and emoji mixed through the text 😀😀"),
      (3L, "𝕳𝖊𝖑𝖑𝖔 𝖜𝖔𝖗𝖑𝖉 mathematical alphanumerics are supplementary too")
    ).toDF("doc_id", "text")
    val declarative = docs
      .select(col("doc_id"),
        posexplode(expr("char_ngrams(text, 8)")).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"), md5(col("g")).as("h"))
      .withColumn("fp", min(col("h")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos")
          .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, 3)))
      .groupBy("doc_id").agg(sort_array(collect_set(col("fp"))).as("fps"))
    val native = docs.select(col("doc_id"),
      sort_array(expr("winnow_fps(text, 8, 4)")).as("fps"))
    val nm = native.as[(Long, Seq[String])].collect().toMap
    declarative.as[(Long, Seq[String])].collect().foreach { case (id, fps) =>
      assert(nm(id) == fps, s"doc $id")
    }
  }

  test("codegen and interpreted paths agree") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq("a b c d").toDF("text")
    val withCg = df.select(expr("text_shingles(text)")).head().getSeq[String](0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val noCg = df.select(expr("text_shingles(text)")).head().getSeq[String](0)
      assert(withCg == noCg && withCg == Seq("a b c", "b c d"))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null text yields null, not a crash") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(Some("a b c"), None).toDF("text")
    val out = df.select(expr("text_shingles(text)")).collect()
    assert(out(0).getSeq[String](0) == Seq("a b c"))
    assert(out(1).isNullAt(0))
  }
}
