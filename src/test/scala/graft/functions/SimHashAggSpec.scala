package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** simhash_agg must agree bit-for-bit with the declarative per-position
  * vote formulation the oracle SQL uses, regardless of partitioning
  * (merge order independence).
  */
class SimHashAggSpec extends SparkSpec {

  private def declarative(words: org.apache.spark.sql.DataFrame) =
    words
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, 16), p -> named_struct(
          |  'pos', p,
          |  'v', instr('0123456789abcdef', substr(h, p, 1)) - 1))""".stripMargin)).as("e"))
      .select(col("doc_id"), col("e.pos").as("pos"), col("e.v").as("v"))
      .groupBy(col("doc_id"), col("pos"))
      .agg(
        sum(expr("2 * ((v div 8) % 2) - 1")).as("s3"),
        sum(expr("2 * ((v div 4) % 2) - 1")).as("s2"),
        sum(expr("2 * ((v div 2) % 2) - 1")).as("s1"),
        sum(expr("2 * (v % 2) - 1")).as("s0"))
      .withColumn("ch", expr(
        "substr('0123456789abcdef', 8 * CAST(s3 > 0 AS INT) + 4 * CAST(s2 > 0 AS INT) + 2 * CAST(s1 > 0 AS INT) + CAST(s0 > 0 AS INT) + 1, 1)"))
      .groupBy(col("doc_id"))
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(pos, ch))), x -> x.ch)"), "")
        .as("simhash"))

  test("simhash_agg matches the declarative vote formulation (sf0.001)") {
    VectorExpressions.ensureRegistered(spark)
    val words = graft.model.Tables(spark, sf(), "documents")
      .filter(col("text") =!= "")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
      .withColumn("h", md5(col("w")))
    val native = words.groupBy(col("doc_id"))
      .agg(expr("simhash_agg(h)").as("simhash"))
    val diff = native.as("n")
      .join(declarative(words).as("d"), Seq("doc_id"))
      .filter(col("n.simhash") =!= col("d.simhash"))
      .count()
    assert(diff == 0)
  }

  test("simhash_agg is partitioning-independent (merge correctness)") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    val words = (1 to 200).map(i => (i % 3L, s"word$i")).toDF("doc_id", "w")
      .withColumn("h", md5(col("w")))
    def fp(parts: Int) =
      words.repartition(parts).groupBy(col("doc_id"))
        .agg(expr("simhash_agg(h)").as("s"))
        .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(fp(1) == fp(13))
    assert(fp(1).forall(_._2.matches("[0-9a-f]{16}")))
  }
}
