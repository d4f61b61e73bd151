package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Exact-Jaccard path A/B probe (test-scoped main) — measures the
  * production inverted-index expansion (capJaccardPairs) against the
  * PPJoin prefix-filtered variant (capJaccardPairsPrefix) at any corpus
  * scale, checks the outputs are identical, and prints candidate-pair
  * cardinalities. The r10 verdict this probe produced: at t = 0.5 the
  * prefix filter cuts candidates only 3.9× (124M → 31.9M at 100×) while
  * its verify stage carries full gram arrays — net SLOWER at 100×.
  * PROVENANCE: the r10 headline (113.6 s vs 50.5 s, 2.2×) came from
  * the in-JVM interleaved A/B below, whose same-mode variance reached
  * 2.7× — r11 re-ran the clean arrangement (tools/run_jac_probe.sh:
  * fresh JVM per sample, modes alternated) and CONFIRMED the
  * refutation at 1.6-1.9×: expand 42.5/44.8/54.7/61.1 s vs prefix
  * 69.5/77.0/105.8 s (+ one 236 s stall-carrying sample) at 100×.
  * Re-run at higher SPARK_GRAFT_JAC_T to see the prefix filter's
  * regime.
  *
  * Usage: sbt "Test/runMain graft.ops.JaccardStageProbe <sfDir> [...]"
  * Env: SPARK_GRAFT_JAC_T (0.5), SPARK_GRAFT_JAC_N (8 — char-ngram width),
  * SPARK_GRAFT_JAC_MODE (all | expand | prefix — single-mode runs let a
  * wrapper interleave FRESH JVMs per sample, the only arrangement that
  * dodges both host stalls and heap-state carryover; the in-JVM 2×2 A/B
  * below measured expand at 50.5 s then 136.8 s back-to-back at 100×),
  * SPARK_GRAFT_JAC_CHECKS (1 to include cardinality + equality passes).
  */
object JaccardStageProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JaccardStageProbe <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val t = sys.env.getOrElse("SPARK_GRAFT_JAC_T", "0.5").toDouble
    val n = sys.env.getOrElse("SPARK_GRAFT_JAC_N", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def grams(dir: String) = graft.model.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(expr(s"char_ngrams(text, $n)"))).as("g"))
    def clear(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
    }
    val modeSel = sys.env.getOrElse("SPARK_GRAFT_JAC_MODE", "all")
    val withChecks = modeSel == "all" ||
      sys.env.get("SPARK_GRAFT_JAC_CHECKS").contains("1")
    val modes = modeSel match {
      case "all" => Seq("expand", "prefix")
      case m     => Seq(m)
    }
    for (dir <- args) {
      if (withChecks) {
      // candidate-volume attribution (cardinality, not timing)
      clear()
      val exCand = grams(dir).groupBy("g").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 50).select("g")
        .join(grams(dir), Seq("g"))
        .groupBy("g").agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .select(explode(expr("array_pairs(ds)")).as("p"))
        .select(col("p.a"), col("p.b")).distinct().count()
      clear()
      val prefCand = {
        val gd = grams(dir).groupBy("g")
          .agg(count(lit(1)).as("df"),
            expr("transform(topk_min_agg('', doc_id, 51), x -> x.id)").as("ds"))
          .filter(col("df") <= 50)
        val docArr = gd.select(col("df"), col("g").as("gv"),
            explode(col("ds")).as("doc_id"))
          .groupBy("doc_id")
          .agg(sort_array(collect_list(struct(col("df"), col("gv")))).as("gs"),
            count(lit(1)).as("n"))
        val prefLen = greatest(lit(1L), col("n") + 1L -
          ceil(col("n").cast("double") * lit(t) - lit(1e-9)).cast("long"))
        docArr.select(col("doc_id"),
            explode(transform(slice(col("gs"), lit(1), prefLen.cast("int")),
              x => x.getField("gv"))).as("pg"))
          .groupBy("pg").agg(sort_array(collect_list(col("doc_id"))).as("ds"))
          .select(explode(expr("array_pairs(ds)")).as("p"))
          .select(col("p.a"), col("p.b")).distinct().count()
      }
      println(s"[jac-probe] $dir t=$t candidates expand=$exCand prefix=$prefCand " +
        f"cut=${exCand.toDouble / prefCand.max(1L)}%.1fx")
      }
      // timed A/B, interleaved to spread host-stall windows (single-mode
      // runs rely on the JVM-interleaving wrapper instead)
      for (rep <- 1 to 2; mode <- modes) {
        clear()
        val t0 = System.nanoTime()
        val df =
          if (mode == "expand") Extensions.capJaccardPairs(grams(dir), "g", 50, t)
          else Extensions.capJaccardPairsPrefix(grams(dir), "g", 50, t)
        val rows = df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[jac-probe] $dir $mode rep$rep rows=$rows sec=$sec%.2f")
      }
      if (withChecks) {
      // byte-identical outputs (the switch's precondition)
      clear()
      val a = Extensions.capJaccardPairs(grams(dir), "g", 50, t).collect().toSeq
      val b = Extensions.capJaccardPairsPrefix(grams(dir), "g", 50, t).collect().toSeq
      println(s"[jac-probe] $dir outputs_equal=${a == b} rows=${a.size}")
      }
    }
    spark.stop()
  }
}
