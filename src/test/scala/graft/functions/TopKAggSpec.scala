package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** topk_min_agg claims: identical rows to the row_number-window top-k
  * under the (rk, id) total order, with a buffer that never exceeds k —
  * so the q98 rewrite is a pure plan change, not a semantics change.
  */
class TopKAggSpec extends SparkSpec {

  private val enc = org.apache.spark.sql.Encoders.tuple(
    org.apache.spark.sql.Encoders.STRING,
    org.apache.spark.sql.Encoders.scalaLong,
    org.apache.spark.sql.Encoders.scalaLong)

  test("q98 aggregate form == window form on the corpus, plan has no Window") {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val dir = sf()
    val agg = graft.SparkEntry.queries("q98_stratified_sample")(spark, dir)
    val windows = agg.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, "q98 must not sort full groups in a window")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("rk"), col("doc_id"))
    val windowed = graft.model.Tables(spark, dir, "documents")
      .withColumn("rk",
        md5(concat(col("doc_id").cast("string"), lit("|"), col("lang"))))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 20)
      .select(col("lang"), col("doc_id"), col("rn"))
    assert(agg.as[(String, Long, Long)](enc).collect().toSet ==
      windowed.as[(String, Long, Long)](enc).collect().toSet)
    assert(agg.count() > 0)
  }

  test("topk_min_agg equals scala per-group sort-take under shuffled partitions (property)") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val rnd = new scala.util.Random(13)
    // groups of size 0<n<40 around k=5: exercises under-full buffers,
    // exact-k, overflow, and cross-partition merge in one dataset
    val rows = (1 to 8).flatMap { g =>
      (1 to rnd.nextInt(40) + 1).map(i =>
        (s"g$g", f"${rnd.nextInt(1000)}%04d", rnd.nextLong().abs % 100000))
    }
    // NO distinct: duplicated (rk, id) rows each occupy a rank, exactly
    // as row_number() would rank them
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(r => (r._2, r._3)).sorted.take(5)
        .zipWithIndex.map { case ((rk, id), i) => (g, rk, id, i + 1L) }
    }.toSet
    val got = rows.toDF("g", "rk", "id").repartition(7)
      .groupBy("g").agg(expr("topk_min_agg(rk, id, 5)").as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.rk"), col("col.id"), (col("pos") + 1).cast("long"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("topk_min_agg orders keys by UTF8 bytes (window parity past the BMP)") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    // U+FFFF (EF BF BF) < U+1F600 (F0 9F 98 80) in UTF-8 bytes — the
    // engine's string order; UTF-16 code units would invert it
    // (0xFFFF > 0xD83D surrogate), keeping the wrong row
    val rows = Seq(("g", "￿", 1L), ("g", "😀", 2L))
    val agg = rows.toDF("g", "rk", "id")
      .groupBy("g").agg(expr("topk_min_agg(rk, id, 1)").as("top"))
      .select(explode(col("top")).as("e")).select("e.id")
      .as[Long].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("rk"), col("id"))
    val windowed = rows.toDF("g", "rk", "id")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 1)
      .select("id").as[Long].collect().toSeq
    assert(agg == windowed && agg == Seq(1L))
  }

  test("topk_min_agg ignores null keys (SQL aggregate convention)") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val got = Seq(("g", Option("b"), 1L), ("g", None, 2L), ("g", Option("a"), 3L))
      .toDF("g", "rk", "id")
      .groupBy("g").agg(expr("topk_min_agg(rk, id, 2)").as("top"))
      .select(explode(col("top")).as("e")).select("e.rk", "e.id")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 3L), ("b", 1L)))
  }

  test("topk_min_agg returns k entries on duplicated (rk, id) rows (window parity)") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    // the whole group is duplicate pairs: a dedup-ing buffer would
    // return 2 entries; row_number returns k — the aggregate must too
    val rows = Seq.fill(4)(("g", "a", 1L)) ++ Seq.fill(4)(("g", "b", 2L))
    val got = rows.toDF("g", "rk", "id").repartition(5)
      .groupBy("g").agg(expr("topk_min_agg(rk, id, 5)").as("top"))
      .select(posexplode(col("top")))
      .select(col("col.rk"), col("col.id"), (col("pos") + 1).cast("long"))
      .as[(String, Long, Long)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("rk"), col("id"))
    val windowed = rows.toDF("g", "rk", "id")
      .withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= 5)
      .select("rk", "id", "rn").as[(String, Long, Long)].collect().toSeq
    assert(got == windowed)
    assert(got == Seq(("a", 1L, 1L), ("a", 1L, 2L), ("a", 1L, 3L),
      ("a", 1L, 4L), ("b", 2L, 5L)))
  }

  test("topk_min_agg survives partial-buffer serialization round trips") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    // many partitions of one group force serialize/deserialize/merge of
    // partial buffers through the exchange
    val got = (1L to 500L).map(i => ("g", f"${(i * 37) % 500}%03d", i))
      .toDF("g", "rk", "id").repartition(16)
      .groupBy("g").agg(expr("topk_min_agg(rk, id, 3)").as("top"))
      .select(explode(col("top")).as("e"))
      .select("e.rk", "e.id")
      .as[(String, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong))
      .collect().toSeq
    val expected = (1L to 500L).map(i => (f"${(i * 37) % 500}%03d", i))
      .sorted.take(3)
    assert(got == expected)
  }

  test("earliest_k_agg equals scala per-group sort-take through partial merges") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val rnd = new scala.util.Random(29)
    // duplicate (t, v) pairs included (multiplicity path), groups around
    // and below k, many partitions to force serialize+merge
    val rows = (1 to 6).flatMap { g =>
      (1 to rnd.nextInt(60) + 1).map { _ =>
        (s"s$g", rnd.nextInt(20).toLong * 10L, rnd.nextInt(5).toDouble)
      }
    }
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(r => (r._2, r._3)).sortBy(p => (p._1, p._2)).take(7)
        .map { case (t, v) => (g, t, v) }
    }.toSet
    // count multiplicities exactly, not as a set — group to (row, count)
    def counted(s: Seq[(String, Long, Double)]) =
      s.groupBy(identity).view.mapValues(_.size).toMap
    val expectedSeq = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.map(r => (r._2, r._3)).sortBy(p => (p._1, p._2)).take(7)
        .map { case (t, v) => (g, t, v) }
    }
    val got = rows.toDF("series", "t", "v").repartition(13)
      .groupBy("series").agg(expr("earliest_k_agg(t, v, 7)").as("pts"))
      .select(col("series"), explode(col("pts")).as("p"))
      .select(col("series"), col("p.t_ms"), col("p.value"))
      .as[(String, Long, Double)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaDouble))
      .collect().toSeq
    assert(counted(got) == counted(expectedSeq))
    assert(got.toSet == expected && got.nonEmpty)
  }

  test("earliest_k_agg ignores null inputs and caps at k") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val got = Seq[(String, Option[Long], Option[Double])](
      ("g", Some(3L), Some(1.0)), ("g", None, Some(2.0)),
      ("g", Some(1L), None), ("g", Some(2L), Some(4.0)),
      ("g", Some(5L), Some(0.5)))
      .toDF("g", "t", "v")
      .groupBy("g").agg(expr("earliest_k_agg(t, v, 2)").as("pts"))
      .select(explode(col("pts")).as("p")).select("p.t_ms", "p.value")
      .as[(Long, Double)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaDouble))
      .collect().toSeq
    assert(got == Seq((2L, 4.0), (3L, 1.0)))
  }
}
