package graft.ops

import org.apache.spark.sql.functions._

/** One-off measurement (r15 ADVICE #1's second half): the BATCHED BPE
  * learner at realistic parameters on a RICH vocabulary — the testdata
  * corpus has 31 word types and exhausts around ~100 merges, so q119's
  * declared run cannot show learner cost at depth. Here: 100k
  * synthetic alphabetic types (deterministic base-26 encodings with
  * heavy shared prefixes — real material for merges), 1000 docs of 100
  * words each, learner driven to 125 rounds x k=8 (up to 1000 merges).
  * Reports wall time, merges learned, and s/round — the number that
  * decides whether 30k merges (3750 rounds at k=8) is a lunch break or
  * a week.
  *
  * Run: sbt "Test/runMain graft.ops.BpeLearnProbe"
  */
object BpeLearnProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.range(100000)
      .selectExpr("CAST(id / 100 AS LONG) AS doc_id", SynthTypes.Expr)
      .groupBy("doc_id").agg(concat_ws(" ", collect_list(col("w"))).as("text"))
      .localCheckpoint(true)
    println(s"[bpelearn] docs=${docs.count()} (100k types, 8-14 chars)")
    for ((rounds, k) <- Seq((25, 8), (125, 8))) {
      val t0 = System.nanoTime()
      val merges = TextAnalysis.learnBpeMergesBatched(docs, rounds, k)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[bpelearn] allhigher rounds=$rounds%4d k=$k merges=${merges.size}%5d " +
        f"wall=${dt}%.1fs s/round=${dt / rounds}%.3f m/round=${merges.size.toDouble / rounds}%.2f")
    }
    // r16: the hot-partitioned rule at the SAME dials (the ≥2×
    // merges/round claim on this 100k prefix-heavy vocabulary) and at
    // the deriveBatchK-derived window (what TrainingPipeline would run)
    val kd = TextAnalysis.deriveBatchK(100000)
    for ((rounds, k, cap) <- Seq((25, 8, 8), (125, 8, 8), (25, kd, kd))) {
      val t0 = System.nanoTime()
      val merges = TextAnalysis.learnBpeMergesHotPart(docs, rounds, k, cap)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[bpelearn] hotpart   rounds=$rounds%4d k=$k merges=${merges.size}%5d " +
        f"wall=${dt}%.1fs s/round=${dt / rounds}%.3f m/round=${merges.size.toDouble / rounds}%.2f")
    }
    spark.stop()
  }
}
