package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** minhash_agg must produce exactly the 16 `min(md5('<i>|' || sh))`
  * values the oracle SQL computes column-by-column — same seeds, same
  * hex, same string order — for every doc in the real testdata.
  */
class MinHashAggSpec extends SparkSpec {

  test("single-pass signature equals the 16-column min(md5) form") {
    VectorExpressions.ensureRegistered(spark)
    val sh = graft.model.Tables(spark, sf(), "documents")
      .select(col("doc_id"), explode(expr("text_shingles(text)")).as("sh"))
      .distinct()
    val native = sh.groupBy(col("doc_id"))
      .agg(expr("minhash_agg(sh)").as("sig"))
    val aggs: Seq[Column] =
      (0 until MinHashAgg.K).map(i => min(md5(concat(lit(s"$i|"), col("sh")))).as(s"h$i"))
    val columnar = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val joined = native.join(columnar, "doc_id")
    val mismatches = (0 until MinHashAgg.K).map(i =>
      joined.filter(element_at(col("sig"), i + 1) =!= col(s"h$i")).count()).sum
    assert(mismatches == 0)
  }

  test("empty input group evaluates to null, not a crash") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    val out = Seq.empty[String].toDF("sh")
      .agg(expr("minhash_agg(sh)")).collect()
    assert(out.length == 1 && out.head.isNullAt(0))
  }
}
