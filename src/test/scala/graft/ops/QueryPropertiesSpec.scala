package graft.ops

import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Algebraic properties over the declared queries (SURVEY.md §5.2.3) run
  * against the real sf0.001 tables — invariants that hold for ANY input,
  * complementing the value-exact oracle gate.
  */
class QueryPropertiesSpec extends SparkSpec {

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf())

  test("dedup keep-first is idempotent and key-unique (q73)") {
    val once = q("q73_dedup_keep_first")
    assert(once.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).isEmpty)
    // keeps the earliest: every kept ts must be the group min
    val events = graft.model.Tables(spark, sf(), "events")
    val mins = events.groupBy("user_id", "event_type")
      .agg(min(graft.model.Tables.epochMs(col("ts"))).as("min_ms"))
    val joined = once.join(mins, Seq("user_id", "event_type"))
    assert(joined.filter(col("ts_ms") =!= col("min_ms")).isEmpty)
  }

  test("analytic windows preserve cardinality (q42 vs events)") {
    val events = graft.model.Tables(spark, sf(), "events")
    assert(q("q42_lag_lead").count() == events.count())
  }

  test("set-op algebra: |A ∪ B| = |A ∩ B| + |A Δ B| parts (q51-q53)") {
    val events = graft.model.Tables(spark, sf(), "customer")
    val inter = q("q52_intersect").count()
    val exceptAB = q("q53_except").count()
    val cNations = graft.model.Tables(spark, sf(), "customer")
      .select("c_nationkey").distinct().count()
    // |C \ S| + |C ∩ S| = |C|
    assert(exceptAB + inter == cNations)
  }

  test("time buckets conserve totals (q70 vs global count)") {
    val events = graft.model.Tables(spark, sf(), "events")
    val bucketSum = q("q70_tumbling_window").agg(sum("cnt")).head().getLong(0)
    assert(bucketSum == events.count())
  }

  test("session windows partition rows exactly (q72)") {
    val events = graft.model.Tables(spark, sf(), "events")
    val sessSum = q("q72_session_window").agg(sum("cnt")).head().getLong(0)
    assert(sessSum == events.count())
    // sessions never overlap per user: start >= previous end is too strong
    // (end = last+gap can exceed next start only if they'd have merged);
    // assert starts strictly increase per user instead
    val s = q("q72_session_window")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("start_ms")
    val bad = s.withColumn("prev_end", lag("end_ms", 1).over(w))
      .filter(col("prev_end").isNotNull && col("start_ms") < col("prev_end"))
    assert(bad.isEmpty)
  }

  test("retention filter keeps a subset (q05 bounds within range)") {
    val row = q("q05_retention_filter").head()
    val cutoffMs = java.sql.Timestamp.valueOf("2024-01-15 00:00:00").getTime
    assert(row.getAs[Long]("min_ms") >= cutoffMs)
    assert(row.getAs[Long]("max_ms") >= row.getAs[Long]("min_ms"))
  }

  test("LSH candidates contain all high-similarity exact pairs (q85 ⊇ q81)") {
    import spark.implicits._
    val exact = q("q81_shingle_jaccard").filter(col("jac") >= 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val cand = q("q85_minhash_lsh")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(cand),
      s"missing ${(exact -- cand).size} of ${exact.size} high-sim pairs")
  }

  test("brute-force and bucketed ANN agree on self-bucket neighbors (q82/q91)") {
    // q91's probe 0 top-3 must be a subset of probe 0's brute-force
    // ranking restricted to its bucket — sanity that bucketing only
    // filters, never reorders
    import spark.implicits._
    val ann = q("q91_ann_bucketed").filter(col("probe_id") === 0)
      .select("vec_id", "sim").as[(Long, Double)].collect().toMap
    val brute = q("q82_cosine_topk")
      .select("vec_id", "sim").as[(Long, Double)].collect().toMap
    ann.keySet.intersect(brute.keySet).foreach { id =>
      assert(math.abs(ann(id) - brute(id)) < 1e-9)
    }
  }

  test("salted two-stage agg equals the plain groupBy (q55)") {
    import spark.implicits._
    val salted = q("q55_salted_agg")
      .select("l_returnflag", "sum_qty", "sum_rev", "cnt")
      .as[(String, Double, Double, Long)].collect().toSet
    val plain = graft.model.Tables(spark, sf(), "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("sum_rev"),
        count(lit(1)).as("cnt"))
      .select("l_returnflag", "sum_qty", "sum_rev", "cnt")
      .as[(String, Double, Double, Long)].collect().toSet
    assert(salted == plain)
  }

  test("normalization output is idempotent (q56 fixpoint)") {
    // normalizing an already-normalized text must be the identity: no
    // uppercase, no punctuation, no double spaces survive the first pass
    val docs = graft.model.Tables(spark, sf(), "documents")
      .select(col("doc_id"),
        trim(regexp_replace(regexp_replace(lower(col("text")),
          "[^a-z0-9 ]", " "), " +", " ")).as("norm"))
    val renorm = docs.select(col("doc_id"),
      trim(regexp_replace(regexp_replace(lower(col("norm")),
        "[^a-z0-9 ]", " "), " +", " ")).as("norm2"),
      col("norm"))
    assert(renorm.filter(col("norm") =!= col("norm2")).isEmpty)
  }

  test("IVF candidates rank consistently with brute force (q57 vs q82)") {
    // probe 0's IVF hits must carry the same cosine the brute-force
    // ranking computed — cells only filter candidates, never change sims
    import spark.implicits._
    val ivf = q("q57_ivf_ann").filter(col("probe_id") === 0)
      .select("vec_id", "sim").as[(Long, Double)].collect().toMap
    val brute = q("q82_cosine_topk")
      .select("vec_id", "sim").as[(Long, Double)].collect().toMap
    ivf.keySet.intersect(brute.keySet).foreach { id =>
      assert(math.abs(ivf(id) - brute(id)) < 1e-9)
    }
  }

  test("packing conserves chunks and respects bin bounds (q58 vs q97)") {
    // every chunk lands in exactly one bin...
    val chunks = q("q97_doc_chunks")
    val packed = q("q58_pack_sequences")
    val total = packed.agg(sum("n_chunks")).head().getLong(0)
    assert(total == chunks.count())
    // ...and a bin only ever EXCEEDS 512 tokens by its last chunk (a bin
    // closes once the cumulative count crosses the boundary, so overflow
    // is < the 50-token max chunk: tok_total < 512 + 50 always)
    assert(packed.filter(col("tok_total") >= 512 + 50).isEmpty)
  }

  test("flagship entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry (driver contract)") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("results are partitioning-independent (§7.5 determinism rule)") {
    // the core determinism claim behind the oracle gate: the SAME rows
    // in the SAME order no matter how exchanges shard. Re-run a sample
    // of shuffle-heavy queries (aggs, windows, LSH pairing, estimator
    // ratios, salted agg, distributed ntile) under a different
    // shuffle-partition count and compare collected output exactly.
    val sample = Seq("q30_groupby_agg", "q38_percentiles", "q45_ntile_first_last",
      "q55_salted_agg", "q69_tfidf", "q78_simhash_neardup",
      "q79_minhash_jaccard_est", "q90_fingerprint")
    val conf = spark.conf
    val saved = conf.get("spark.sql.shuffle.partitions")
    def run(name: String): Seq[String] = {
      val out = q(name).collect().map(_.toString).toSeq
      spark.catalog.clearCache() // q79 persists its signature subplan
      out
    }
    sample.foreach { name =>
      val a = run(name)
      try {
        conf.set("spark.sql.shuffle.partitions", "13")
        val b = run(name)
        assert(a == b, s"$name diverges across partitionings")
      } finally conf.set("spark.sql.shuffle.partitions", saved)
    }
  }

  test("dup spans are long enough, stride-aligned, disjoint per doc (q102)") {
    val spans = q("q102_dup_spans")
    assert(spans.count() > 0) // fixtures contain near-dup docs
    // every span covers at least one full 30-char window, and its
    // extent is window-aligned (start/last-hit positions are 1 mod 10)
    assert(spans.filter(col("span_end") - col("span_start") < 29).isEmpty)
    assert(spans.filter((col("span_end") - col("span_start") - 29) % 10 =!= 0).isEmpty)
    assert(spans.filter(col("n_windows") < 1).isEmpty)
    // maximality: successive spans of one doc never touch (a gap <= 30
    // between hit positions would have merged them)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("span_start")
    val overlapping = spans
      .withColumn("prev_end", lag("span_end", 1).over(w))
      .filter(col("prev_end").isNotNull && col("span_start") <= col("prev_end"))
    assert(overlapping.isEmpty)
  }

  test("domain sampling never exceeds the incoming mass (q103)") {
    val mix = q("q103_domain_sample")
    val docs = graft.model.Tables(spark, sf(), "documents")
    assert(mix.count() == docs.select("source").distinct().count())
    assert(mix.filter(col("docs_kept") > col("docs_in")).isEmpty)
    assert(mix.filter(col("tokens_kept") > col("tokens_in")).isEmpty)
    assert(mix.filter(col("rate") <= 0 || col("rate") > 1.0).isEmpty)
  }

  test("quality-keep selects each cluster's max-quality member (q104)") {
    val kept = q("q104_cluster_keep_quality")
    val labels = q("q100_dup_clusters")
    // one row per q100 cluster, members fully accounted for
    assert(kept.count() == labels.select("cluster").distinct().count())
    assert(kept.agg(sum("n_members")).head().getLong(0) == labels.count())
    // best_quality matches the max q88 quality within the cluster
    val clusterMax = labels
      .join(q("q88_quality_score").select("doc_id", "quality"), "doc_id")
      .groupBy("cluster").agg(max("quality").as("max_q"))
    assert(kept.join(clusterMax, "cluster")
      .filter(col("best_quality") =!= col("max_q")).isEmpty)
    // the kept doc belongs to the cluster it represents
    val member = kept.join(
      labels.select(col("doc_id").as("kept_doc"), col("cluster").as("lc")),
      "kept_doc")
    assert(member.filter(col("cluster") =!= col("lc")).isEmpty)
  }

  test("semantic dedup drops only non-canonical pair members (q105)") {
    val dropped = q("q105_semantic_dedup")
    // labels are component minima: kept < dropped always, and a kept
    // survivor is never itself dropped
    assert(dropped.filter(col("kept") >= col("vec_id")).isEmpty)
    assert(dropped.select(col("vec_id"))
      .join(dropped.select(col("kept").as("vec_id")), Seq("vec_id"), "left_semi")
      .isEmpty)
    // every dropped vector appears in at least one q94 near-dup pair
    val pairIds = q("q94_embedding_neardup")
      .select(col("id_a").as("vec_id"))
      .union(q("q94_embedding_neardup").select(col("id_b").as("vec_id")))
      .distinct()
    assert(dropped.select("vec_id")
      .join(pairIds, Seq("vec_id"), "left_anti").isEmpty)
  }

  test("train order is a permutation with contiguous shard positions (q106)") {
    val ord = q("q106_train_order")
    val docs = graft.model.Tables(spark, sf(), "documents")
    assert(ord.count() == docs.count())
    assert(ord.select("doc_id").distinct().count() == docs.count())
    assert(ord.filter(col("shard") < 0 || col("shard") > 7).isEmpty)
    // positions within each shard are 1..n with no gaps
    val perShard = ord.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
    assert(perShard.filter(col("lo") =!= 1 || col("hi") =!= col("n")).isEmpty)
  }

  test("trigram scoring covers every >= 3-token doc at exactly n-2 positions (q115)") {
    val out = q("q115_trigram_logprob").persist()
    val docs = graft.model.Tables(spark, sf(), "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), w => w =!= "")).as("n"))
      .filter(col("n") >= 3)
    // one row per eligible doc; trigram positions are 3..n
    assert(out.count() == docs.count())
    val j = out.join(docs, "doc_id")
    assert(j.filter(col("n_trigrams") =!= col("n") - 2).isEmpty,
      "n_trigrams must equal token count - 2")
    // scores are probabilities damped by backoff: every per-position
    // sc is in (0, 1], so the mean log score is never positive
    assert(out.filter(col("logprob") > 0.0).isEmpty)
    out.unpersist()
    spark.catalog.clearCache()
  }

  test("ccnet buckets cover every scored doc in three near-balanced classes (q117)") {
    val out = q("q117_ccnet_buckets").persist()
    val n = out.count()
    val byBucket = out.groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"), byBucket.toString)
    assert(byBucket.values.sum == n)
    // terciles are near-balanced when scores are mostly distinct (the
    // word-soup corpus's are); allow a loose band for boundary ties
    for ((b, c) <- byBucket)
      assert(c >= n / 6 && c <= n / 2, s"bucket $b skewed: $c of $n")
    // head scores dominate tail scores: min(head) >= max(tail)
    val minHead = out.filter(col("bucket") === "head")
      .agg(min("logprob")).head().getDouble(0)
    val maxTail = out.filter(col("bucket") === "tail")
      .agg(max("logprob")).head().getDouble(0)
    assert(minHead >= maxTail, s"bucket order violated: $minHead < $maxTail")
    out.unpersist()
    spark.catalog.clearCache()
  }

  test("no declared query outputs array/map/struct columns (harness rule)") {
    // the driver's correctness harness sorts and hashes every output
    // cell with pandas, which cannot handle nested cells — the round-1
    // q38/q64/q66 failures. Schema-only check: no job execution.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      fn(spark, sf()).schema.fields.foreach { f =>
        val nested = f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] || f.dataType.isInstanceOf[StructType]
        assert(!nested, s"$name.${f.name} is ${f.dataType.simpleString}")
      }
    }
  }
}
