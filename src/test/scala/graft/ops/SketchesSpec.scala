package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Approximate aggregates hold their error contracts against the exact
  * answers on real testdata (the oracle-gate analog for sketches, whose
  * results can't hash-match across engines).
  */
class SketchesSpec extends SparkSpec {

  test("HLL distinct counts land within the rsd bound of exact (3 sigma)") {
    import spark.implicits._
    val approx = Sketches.approxDistinct(spark, sf(), rsd = 0.05)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    val exact = graft.model.Tables(spark, sf(), "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .select("event_type", "u").as[(String, Long)].collect().toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex <= 3 * 0.05,
        s"$k: approx $ap vs exact $ex")
    }
  }

  test("GK quantiles are within rank epsilon of exact quartiles") {
    import spark.implicits._
    val approx = Sketches.approxQuantiles(spark, sf())
      .select("l_returnflag", "p25", "p50", "p75")
      .as[(String, Double, Double, Double)].collect()
      .map { case (k, a, b, c) => k -> Seq(a, b, c) }.toMap
    val li = graft.model.Tables(spark, sf(), "lineitem")
    // GK contract: the returned value's RANK is within eps*n of the
    // target rank — check rank displacement, not value distance
    approx.foreach { case (flag, qs) =>
      val grp = li.filter(col("l_returnflag") === flag)
      val n = grp.count().toDouble
      Seq(0.25, 0.5, 0.75).zip(qs).foreach { case (q, v) =>
        val below = grp.filter(col("l_extendedprice") <= v).count().toDouble
        assert(math.abs(below / n - q) <= 1.0 / 10000 + 1 / n + 0.01,
          s"$flag p$q: value $v has rank ${below / n}")
      }
    }
  }

  test("Count-Min word frequencies: never under, over by at most eps*N") {
    import spark.implicits._
    val eps = 0.001
    val cms = Sketches.wordFrequencySketch(spark, sf(), eps = eps)
    val words = graft.model.Tables(spark, sf(), "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val n = words.count()
    // exact counts of the top-50 heavy hitters + a tail sample
    val exact = words.groupBy("w").count()
      .orderBy(col("count").desc, col("w")).limit(50)
      .as[(String, Long)].collect()
    exact.foreach { case (w, ex) =>
      val est = cms.estimateCount(w)
      assert(est >= ex, s"'$w': CM under-estimated $est < $ex")
      assert(est <= ex + (eps * n).toLong + 1,
        s"'$w': CM over-estimated $est vs $ex + ${(eps * n).toLong}")
    }
    // a word never inserted estimates at most eps*N (one-sided bound)
    assert(cms.estimateCount("zzz_never_in_corpus") <= (eps * n).toLong + 1)
  }
}
