package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The sketch-capped Jaccard path's contract (Extensions.
  * capJaccardPairsSketch): the Count-Min bound is one-sided, so the cap
  * can only OVER-drop — no truly-hot gram ever survives (the expansion
  * bound holds), and the kept-gram set is a subset of the exact path's.
  */
class CapSketchSpec extends SparkSpec {

  private def corpusShingles = {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    // per-doc distinct, the capJaccardPairs* input contract since r10
    graft.model.Tables(spark, sf(), "documents")
      .select(col("doc_id"),
        explode(array_distinct(expr("text_shingles(text)"))).as("sh"))
  }

  test("cms_estimate expression matches driver-side estimateCount") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val words = (1 to 400).map(i => s"w${i % 57}")
    val df = words.toDF("w")
    val cms = Sketches.gramFrequencySketch(df, "w", eps = 0.001)
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    val got = df.distinct()
      .select(col("w"), call_function("cms_estimate",
        lit(bos.toByteArray), col("w")).as("est"))
      .as[(String, Long)].collect()
    got.foreach { case (w, est) =>
      assert(est == cms.estimateCount(w), s"expression vs driver for $w")
    }
  }

  test("cms_estimate rejects a null constant sketch at analysis") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    // codegen forces the sketch eagerly; without the analysis-time check
    // this would NPE inside an executor with no hint of the cause
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("w").toDF("w")
        .select(expr("cms_estimate(CAST(NULL AS BINARY), w)")).collect()
    }
    assert(e.getMessage.contains("non-null constant sketch"))
  }

  test("CM document-frequency estimates never undercount (one-sided, corpus)") {
    import spark.implicits._
    val sh = corpusShingles.distinct()
    val cms = Sketches.gramFrequencySketch(sh, "sh", eps = 0.01, confidence = 0.9)
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    val under = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .select(col("df"), call_function("cms_estimate",
        lit(bos.toByteArray), col("sh")).as("est"))
      .filter(col("est") < col("df"))
      .count()
    assert(under == 0, "an estimate below the true df breaks the CM bound")
  }

  test("sketch-capped kept-gram set is a subset of the exact kept set") {
    import spark.implicits._
    val sh = corpusShingles.distinct().persist()
    try {
      val exactKept = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 50).select("sh")
        .as[String].collect().toSet
      // deliberately coarse sketch (narrow width vs the gram domain) so
      // over-drops actually occur — the subset property must hold even
      // when the sketch is sloppy, while eps stays fine enough that the
      // cold majority still lands under the cap (non-vacuous test)
      val cms = Sketches.gramFrequencySketch(sh, "sh", eps = 0.001, confidence = 0.9)
      val bos = new java.io.ByteArrayOutputStream()
      cms.writeTo(bos)
      val sketchKept = sh.filter(call_function("cms_estimate",
          lit(bos.toByteArray), col("sh")) <= 50)
        .select("sh").distinct().as[String].collect().toSet
      assert(sketchKept.subsetOf(exactKept),
        s"${(sketchKept -- exactKept).size} hot grams survived the sketch cap")
      assert(sketchKept.nonEmpty)
    } finally sh.unpersist()
  }

  test("tight-eps sketch path reproduces the exact capJaccardPairs output") {
    val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaDouble)
    val exact = Extensions.capJaccardPairs(corpusShingles, "sh", 50, 0.3)
      .as[(Long, Long, Long, Double)](enc).collect().toSet
    // eps small enough that no estimate crosses the cap on this corpus:
    // the sketch path degenerates to the exact result
    val sketched = Extensions.capJaccardPairsSketch(
        corpusShingles, "sh", 50, 0.3, eps = 1e-4, confidence = 0.999)
      .as[(Long, Long, Long, Double)](enc).collect().toSet
    spark.catalog.clearCache()
    assert(sketched == exact && exact.nonEmpty)
  }
}
