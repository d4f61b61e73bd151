package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF recall probe (test-scoped main) — measures recall@k of the
  * TRAINED coarse quantizer (IvfIndex.build: seeded cosine k-means)
  * against the md5-SAMPLED stand-in centroids (q57's oracle-replayable
  * form) at EQUAL k and nprobe, on any corpus decade. Both candidates
  * run through the identical assignment + probe + exact-rerank pipeline
  * below; ONLY the centroid set differs, so the delta is purely
  * quantizer quality. Ground truth is full brute-force cosine top-k
  * per probe.
  *
  * Usage: sbt "Test/runMain graft.ops.IvfRecallProbe <sfDir> [...]"
  * A dir argument of the form `clustered:<srcSfDir>:<N>` materializes a
  * CLUSTERED N× synthetic corpus first (temp dir) and probes that: the
  * soak decades' orthogonal-replica construction (ScaleCorpus) spreads
  * the cloud near-isotropically — correct for the row-count laws, but
  * it erases the cluster structure a coarse quantizer exists to
  * exploit, so trained-vs-sampled converges on it (r11 measurement,
  * deltas ≤ 0.03 at 10×). Here each replica r is pulled toward its own
  * deterministic unit center: v' = α·v + (1−α)·center_r (cosine is
  * scale-invariant, so no renormalization) — N genuine clusters whose
  * within-replica neighbor structure still comes from the organic base.
  * Env: SPARK_GRAFT_IVF_K (32), SPARK_GRAFT_IVF_NPROBE (csv, "1,2,4"),
  * SPARK_GRAFT_IVF_TOPK (3), SPARK_GRAFT_IVF_PROBES (200),
  * SPARK_GRAFT_IVF_ALPHA (0.5), SPARK_GRAFT_CPUS (16).
  */
object IvfRecallProbe {

  /** N-cluster corpus from an organic base: replica r's vectors are
    * blended toward a per-replica seeded gaussian unit center. Returns
    * a dir laid out like a testdata sfDir (embeddings.parquet only).
    */
  private def buildClustered(spark: SparkSession, srcDir: String, n: Int,
                             alpha: Double): String = {
    import spark.implicits._
    val src = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val dim = src.select(size(col("embedding"))).head.getInt(0)
    val out = Files.createTempDirectory(s"ivf_clustered_${n}x").toString
    val replicas = (0 until n).map { r =>
      val rnd = new scala.util.Random(7_000_000L + r)
      val raw = Array.fill(dim)(rnd.nextGaussian())
      val norm = math.sqrt(raw.map(x => x * x).sum)
      val center = array(raw.map(x => lit((x / norm).toFloat)): _*)
      src.select(
        (col("vec_id") + lit(r * 10_000_000L)).as("vec_id"),
        zip_with(col("embedding"), center,
          (x, c) => (x * lit(alpha) + c * lit(1 - alpha)).cast("float"))
          .as("embedding"),
        col("label"))
    }
    replicas.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"[ivf-recall] built clustered corpus: $srcDir x$n alpha=$alpha -> $out")
    out
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IvfRecallProbe <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val k = sys.env.getOrElse("SPARK_GRAFT_IVF_K", "32").toInt
    val nprobes = sys.env.getOrElse("SPARK_GRAFT_IVF_NPROBE", "1,2,4")
      .split(",").map(_.trim.toInt).toSeq
    val topK = sys.env.getOrElse("SPARK_GRAFT_IVF_TOPK", "3").toInt
    val nProbes = sys.env.getOrElse("SPARK_GRAFT_IVF_PROBES", "200").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.ensureRegistered(spark)
    import spark.implicits._

    val alpha = sys.env.getOrElse("SPARK_GRAFT_IVF_ALPHA", "0.5").toDouble
    val dirs = args.toSeq.map {
      case a if a.startsWith("clustered:") =>
        val Array(_, src, nStr) = a.split(":", 3)
        buildClustered(spark, src, nStr.toInt, alpha)
      case a => a
    }
    for (dir <- dirs) {
      val emb = graft.model.Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = emb.count()
      // deterministic probe set: md5-ordered head (salted differently
      // from the sampled-centroid order so probes ≠ centroids)
      val probes = emb
        .withColumn("prk", md5(concat(col("vec_id").cast("string"), lit("|probe"))))
        .orderBy(col("prk"), col("vec_id")).limit(nProbes)
        .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      probes.count()

      // ground truth: brute-force exact cosine top-k per probe
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy("probe_id").orderBy(col("sim").desc, col("vec_id"))
      val truth = emb.crossJoin(broadcast(probes))
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          expr("vec_cosine(embedding, p_emb)").as("sim"))
        .withColumn("rn", row_number().over(wAll))
        .filter(col("rn") <= topK)
        .select("probe_id", "vec_id")
        .as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

      // candidate centroid sets, identical downstream machinery
      val store = Files.createTempDirectory("ivf_recall").toString
      val t0 = System.nanoTime()
      val model = IvfIndex.build(emb, k, store, seed = 42L)
      val trainSec = (System.nanoTime() - t0) / 1e9
      val trained = model.clusterCenters.zipWithIndex.toSeq
        .map { case (v, i) => (i, v.toArray.map(_.toFloat)) }
      val sampled = emb
        .withColumn("crk", md5(col("vec_id").cast("string")))
        .orderBy(col("crk"), col("vec_id")).limit(k)
        .select(col("embedding")).as[Array[Float]].collect()
        .zipWithIndex.map { case (v, i) => (i, v) }.toSeq

      def recall(cents: Seq[(Int, Array[Float])], nprobe: Int): Double = {
        val cdf = cents.toDF("cell", "c_emb")
        // map-side argmax assignment: per-vector max cosine over the
        // broadcast centroids (deterministic c_id tiebreak)
        val assigned = emb.crossJoin(broadcast(cdf))
          .select(col("vec_id"), col("embedding"), col("cell"),
            expr("vec_cosine(embedding, c_emb)").as("csim"))
          .groupBy(col("vec_id"))
          .agg(expr("max_by(cell, struct(csim, -cell))").as("cell"),
            first(col("embedding")).as("embedding"))
        val wCell = org.apache.spark.sql.expressions.Window
          .partitionBy("probe_id").orderBy(col("csim").desc, col("cell"))
        val probeCells = probes.crossJoin(broadcast(cdf))
          .select(col("probe_id"), col("p_emb"), col("cell"),
            expr("vec_cosine(p_emb, c_emb)").as("csim"))
          .withColumn("crn", row_number().over(wCell))
          .filter(col("crn") <= nprobe)
          .select(col("probe_id"), col("p_emb"), col("cell"))
        val wRank = org.apache.spark.sql.expressions.Window
          .partitionBy("probe_id").orderBy(col("sim").desc, col("vec_id"))
        val got = assigned.join(broadcast(probeCells), Seq("cell"))
          .filter(col("vec_id") =!= col("probe_id"))
          .select(col("probe_id"), col("vec_id"),
            expr("vec_cosine(embedding, p_emb)").as("sim"))
          .withColumn("rn", row_number().over(wRank))
          .filter(col("rn") <= topK)
          .select("probe_id", "vec_id")
          .as[(Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        truth.map { case (p, t) =>
          got.getOrElse(p, Set.empty).intersect(t).size.toDouble / t.size
        }.sum / truth.size
      }

      println(f"[ivf-recall] $dir n=$n k=$k topK=$topK probes=${truth.size} " +
        f"train_sec=$trainSec%.1f")
      for (np <- nprobes) {
        val rt = recall(trained, np)
        val rs = recall(sampled, np)
        println(f"[ivf-recall] $dir nprobe=$np trained=$rt%.4f sampled=$rs%.4f " +
          f"delta=${rt - rs}%+.4f")
      }
      // the production dial over the same store: calibrate persists the
      // measured curve into the store meta (v4) and nprobeFor resolves a
      // recall target through it. Same probe salt and count as above, so
      // the curve measures the same probe set; small deltas vs the
      // `trained` rows come from assignment machinery (store rows were
      // assigned by the MLlib transform at build; the rows above re-assign
      // by argmax cosine — semantically equal, not bit-pinned).
      val calib = IvfIndex.calibrate(spark, store, model,
        nprobes = nprobes, topK = topK, sampleProbes = nProbes)
      println(s"[ivf-recall] $dir calibrated curve (recall@$topK): " +
        calib.curve.map { case (np, r) => f"$np:$r%.4f" }.mkString(" "))
      for (t <- Seq(0.8, 0.9, 0.95, 0.99))
        println(f"[ivf-recall] $dir recallTarget=$t%.2f -> " +
          s"nprobe=${IvfIndex.nprobeFor(spark, store, t)}")
      emb.unpersist(); probes.unpersist()
    }
    spark.stop()
  }
}
