package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bloom surface behind q75 (`bloom_agg64` / `bloom_contains64` —
  * Spark's runtime-filter expressions made callable): a bloom pre-pass
  * is only sound if it NEVER false-negatives, and q75 is only correct if
  * the bloom+confirm pipeline equals the exact q76 pipeline row for row.
  */
class BloomFunctionsSpec extends SparkSpec {

  test("bloom_contains64 has no false negatives over inserted set") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    val items = (0 until 5000).map(i => s"item_$i")
    val df = items.toDF("g")
    val bloom = df
      .agg(call_function("bloom_agg64", col("g"), lit(10000L), lit(81920L)))
      .head.getAs[Array[Byte]](0)
    assert(bloom != null && bloom.nonEmpty)
    val hits = df.filter(
      call_function("bloom_contains64", lit(bloom), col("g"))).count()
    assert(hits == items.length) // every inserted item must hit
  }

  test("bloom false-positive rate is bounded at the sized fpp") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    val df = (0 until 5000).map(i => s"item_$i").toDF("g")
    val bloom = df
      .agg(call_function("bloom_agg64", col("g"), lit(10000L), lit(81920L)))
      .head.getAs[Array[Byte]](0)
    // 81920 bits / 10000 est items sizes for ~1% fpp at est; at half
    // occupancy it's far lower — 20000 absent probes should see well
    // under 2% positives (generous bound; the point is "a prune, not
    // a pass-through")
    val fp = (0 until 20000).map(i => s"absent_$i").toDF("g")
      .filter(call_function("bloom_contains64", lit(bloom), col("g"))).count()
    assert(fp < 400, s"fp=$fp of 20000")
  }

  test("bloom_contains64 rejects a non-constant sketch argument") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    // the sketch must be a broadcast constant — Spark's analysis rejects
    // a per-row bloom column, and that rejection is part of the contract
    // (a row-varying sketch would silently stop being a broadcast prune)
    val df = Seq(("a", Array[Byte](1, 2)), ("b", Array[Byte](3, 4)))
      .toDF("g", "sketch")
    val e = intercept[Exception] {
      df.filter(call_function("bloom_contains64", col("sketch"), col("g")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("constant") ||
      e.getMessage.toLowerCase.contains("scalar"))
  }

  test("q75 bloom decontamination equals exact q76 on sf0.001") {
    VectorExpressions.ensureRegistered(spark)
    val q75 = graft.SparkEntry.queries("q75_decontaminate_bloom")(spark, sf())
    val q76 = graft.SparkEntry.queries("q76_decontaminate")(spark, sf())
    try assert(q75.exceptAll(q76).isEmpty && q76.exceptAll(q75).isEmpty)
    finally spark.catalog.clearCache() // q75 persists its train gram set
  }
}
