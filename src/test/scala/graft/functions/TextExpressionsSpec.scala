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
