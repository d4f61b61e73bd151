package graft.ops

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The IVF storage claim behind q57 (SURVEY.md §2.2): at scale the cell
  * id is the PARTITION KEY of the stored inverted lists, so a probe
  * reads only its nprobe cells. This spec materializes that layout on
  * the real testdata and proves (a) the probe-side scan partition-prunes
  * and (b) the pruned read returns exactly the unpruned filter's rows.
  */
class SimilarityStoreSpec extends SparkSpec {

  test("cell-partitioned inverted lists prune the probe scan") {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val emb = graft.model.Tables(spark, sf(), "embeddings")
    val cent = emb
      .withColumn("crk", md5(col("vec_id").cast("string")))
      .orderBy(col("crk"), col("vec_id")).limit(8)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("csim").desc, col("c_id"))
    val assigned = emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("c_id"),
        round(expr("vec_cosine(embedding, c_emb)"), 3).as("csim"))
      .withColumn("crn", row_number().over(wA))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("embedding"), col("c_id").as("cell"))

    val store = Files.createTempDirectory("ivf_store").toString
    assigned.write.mode("overwrite").partitionBy("cell").parquet(store)

    val probedCell = assigned.select("cell").head().getLong(0)
    val pruned = spark.read.parquet(store).filter(col("cell") === probedCell)
    // (a) the filter reaches the scan as a partition filter, not a data
    // filter — the physical plan proves only one cell directory is read
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition pruning in plan:\n$plan")
    // (b) pruned read ≡ full-store filter
    val expected = assigned.filter(col("cell") === probedCell)
      .select("vec_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq
    val got = pruned.select("vec_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq
    assert(got == expected && got.nonEmpty)
  }
}
