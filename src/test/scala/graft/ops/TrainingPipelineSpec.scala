package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end composition contract of the training-data flow on the real
  * corpus: monotone audit counts, no exact-dup or near-dup pair among
  * survivors, contamination bounded, and token conservation through
  * chunk+pack.
  */
class TrainingPipelineSpec extends SparkSpec {

  test("pipeline invariants hold on sf0.001 (parity eval split)") {
    val docs = graft.model.Tables(spark, sf(), "documents")
    val train = docs.filter(col("doc_id") % 2 === 0)
    val eval_ = docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text")
    val cfg = TrainingPipeline.Config()
    val res = TrainingPipeline.prepare(train, eval_, cfg)
    try {
      // audit trail: every stage only drops rows, nothing is empty
      val counts = res.audit.map(_._2)
      assert(res.audit.map(_._1) ==
        Seq("input", "quality", "exact_dedup", "near_dedup", "decontaminated"))
      assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
      assert(counts.last > 0)

      val survivors = res.survivors.persist()
      // no exact dups among survivors
      assert(survivors.select("content_md5").distinct().count() == survivors.count())
      // no near-dup pair among survivors (greedy drop-doc_b guarantee)
      assert(Dedup.nearDupPairs(survivors, cfg.maxHam).isEmpty)
      // no survivor over the contamination threshold vs the eval grams
      val evalGrams = eval_
        .select(explode(expr("char_ngrams(text, 8)")).as("g")).distinct()
      val sGrams = survivors
        .select(col("doc_id"), explode(expr("char_ngrams(text, 8)")).as("g"))
        .distinct()
      val over = sGrams.groupBy("doc_id").agg(count(lit(1)).as("total"))
        .join(sGrams.join(evalGrams, Seq("g"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("hit")), Seq("doc_id"), "left")
        .filter(coalesce(col("hit"), lit(0L)).cast("double") / col("total")
          > cfg.maxContamRatio)
      assert(over.isEmpty)

      // token conservation: packed bins hold exactly the survivors'
      // chunk tokens (q97 geometry: ceil(n/40) chunks, windows of <= 50)
      val chunkTokens = survivors
        .select(size(filter(split(col("text"), " "), w => w =!= "")).cast("long").as("n"))
        .filter(col("n") > 0)
        .select(sum(expr(
          // Σ over chunks i of min(50, n - 40i) for i in 0..ceil(n/40)-1
          """aggregate(sequence(0, CAST(ceil(n / 40.0) AS INT) - 1), 0L,
            |  (acc, i) -> acc + least(50L, n - CAST(i AS BIGINT) * 40))""".stripMargin)))
        .head.getLong(0)
      val packedTokens = res.packed.agg(sum("tok_total")).head.getLong(0)
      assert(packedTokens == chunkTokens,
        s"packed $packedTokens != chunked $chunkTokens")
      // no bin except possibly each shard's last exceeds... every bin is
      // CLOSED at >= binTokens cumulative; bins may overshoot by one
      // chunk (standard greedy packing) but never start beyond it
      assert(res.packed.filter(col("tok_total") > cfg.binTokens + 50).isEmpty)
    } finally spark.catalog.clearCache()
  }

  test("audit=false yields identical survivors and bins with an empty audit trail") {
    val docs = graft.model.Tables(spark, sf(), "documents")
    val train = docs.filter(col("doc_id") % 2 === 0)
    val eval_ = docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text")
    try {
      val audited = TrainingPipeline.prepare(train, eval_,
        TrainingPipeline.Config())
      val silent = TrainingPipeline.prepare(train, eval_,
        TrainingPipeline.Config(audit = false))
      assert(silent.audit.isEmpty)
      assert(audited.audit.nonEmpty)
      // identical outputs, both directions
      val aIds = audited.survivors.select("doc_id")
      val sIds = silent.survivors.select("doc_id")
      assert(aIds.exceptAll(sIds).isEmpty && sIds.exceptAll(aIds).isEmpty)
      val aP = audited.packed.select("shard", "bin", "n_chunks", "tok_total")
      val sP = silent.packed.select("shard", "bin", "n_chunks", "tok_total")
      assert(aP.exceptAll(sP).isEmpty && sP.exceptAll(aP).isEmpty)
      assert(silent.survivors.count() == audited.audit.last._2)
    } finally spark.catalog.clearCache()
  }

  test("keepBestQuality keeps exactly each near-dup cluster's best member") {
    val docs = graft.model.Tables(spark, sf(), "documents")
    // arrange the input so the pipeline's first two stages are identity:
    // non-empty docs, exact dups pre-collapsed keep-first — then the
    // near-dup stage's input IS `train` and the expectation is directly
    // computable from the library primitives it composes
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val train = docs
      .filter(size(filter(split(col("text"), " "), x => x =!= "")) > 0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val evalEmpty = docs.filter(lit(false)).select("doc_id", "text")
    val cfg = TrainingPipeline.Config(minQuality = 0.0, keepBestQuality = true)
    val res = TrainingPipeline.prepare(train, evalEmpty, cfg)
    try {
      val survivors = res.survivors.persist()
      // pairwise non-near-dup, same guarantee as the greedy mode
      assert(Dedup.nearDupPairs(survivors, cfg.maxHam).isEmpty)
      // expected drop set: per component, everything but the
      // max-quality (min doc_id tie-break) member
      val pairs = Dedup.nearDupPairs(train, cfg.maxHam)
      val labels = Dedup.connectedComponents(
        pairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
      val qual = graft.SparkEntry.queries("q88_quality_score")(spark, sf())
        .select("doc_id", "quality")
      val keepPerCluster = labels.join(qual, "doc_id")
        .withColumn("k", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("cluster")
            .orderBy(col("quality").desc, col("doc_id"))))
        .filter(col("k") === 1).select("doc_id")
      val expectedDrops = labels.select("doc_id")
        .exceptAll(keepPerCluster)
      val actualDrops = train.select("doc_id")
        .exceptAll(survivors.select("doc_id"))
      assert(actualDrops.exceptAll(expectedDrops).isEmpty &&
        expectedDrops.exceptAll(actualDrops).isEmpty)
      // cluster mode dedups at least as hard as greedy (one survivor
      // per component vs one per doc_b-cover)
      val greedy = TrainingPipeline.prepare(train, evalEmpty,
        TrainingPipeline.Config(minQuality = 0.0))
      assert(survivors.count() <= greedy.survivors.count())
    } finally spark.catalog.clearCache()
  }

  test("domain mixing samples deterministically within per-source budgets") {
    val docs = graft.model.Tables(spark, sf(), "documents")
    val train = docs.filter(col("doc_id") % 2 === 0)
    val eval_ = docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text")
    val cfg = TrainingPipeline.Config(mixTokenBudgetFrac = Some(0.5))
    val res = TrainingPipeline.prepare(train, eval_, cfg)
    try {
      // the mixing stage ran and audited — looked up by KEY (r12,
      // ADVICE): position-based `.last` would fail if a later audit
      // stage is ever appended, for reasons unrelated to sampling
      val auditMap = res.audit.toMap
      assert(auditMap.contains("mixed"))
      val mixedN = auditMap("mixed")
      val cleanN = auditMap("decontaminated")
      assert(mixedN > 0 && mixedN <= cleanN)
      // strict shrinkage is only warranted when some source actually
      // clamps below rate 1.0 — assert that PRECONDITION separately
      // (from the unmixed pipeline's survivors, i.e. the mixing
      // stage's true input) so a fixture where every source fits the
      // budget fails here with a clear message, not inside the
      // sampling logic's assertion
      val unmixed = TrainingPipeline.prepare(train, eval_,
        TrainingPipeline.Config(audit = false)).survivors
      val st = unmixed.select(col("source"),
          size(filter(split(col("text"), " "), x => x =!= ""))
            .cast("long").as("n")).groupBy("source").agg(sum("n").as("tok"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val budgetPerSrc = st.values.sum * 0.5 / st.size
      assert(st.values.exists(_ > budgetPerSrc),
        s"fixture precondition: no source exceeds the per-source budget " +
          s"($budgetPerSrc) — strict shrinkage below is meaningless: $st")
      assert(mixedN < cleanN)
      // deterministic: a second run keeps the identical doc set
      val res2 = TrainingPipeline.prepare(train, eval_, cfg)
      val a = res.survivors.select("doc_id")
      val b = res2.survivors.select("doc_id")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
      // packing conserves the MIXED set's chunk tokens
      val chunkTokens = res.survivors
        .select(size(filter(split(col("text"), " "), x => x =!= ""))
          .cast("long").as("n"))
        .filter(col("n") > 0)
        .select(sum(expr(
          """aggregate(sequence(0, CAST(ceil(n / 40.0) AS INT) - 1), 0L,
            |  (acc, i) -> acc + least(50L, n - CAST(i AS BIGINT) * 40))""".stripMargin)))
        .head.getLong(0)
      assert(res.packed.agg(sum("tok_total")).head.getLong(0) == chunkTokens)
    } finally spark.catalog.clearCache()
  }

  test("export-order stage carries exactly the survivor set in a " +
      "deterministic per-shard order") {
    import spark.implicits._
    val docs = graft.model.Tables(spark, sf(), "documents")
    val train = docs.filter(col("doc_id") % 2 === 0)
    val eval_ = docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text")
    val cfg = TrainingPipeline.Config(audit = false,
      exportOrderSeed = Some("run-1"), exportShards = 16)
    val res = TrainingPipeline.prepare(train, eval_, cfg)
    try {
      val order = res.order.getOrElse(fail("exportOrderSeed set but no order"))
      // membership: exactly the survivors, each exactly once
      val a = res.survivors.select("doc_id").as[Long].collect().sorted.toSeq
      val b = order.select("doc_id").as[Long].collect().sorted.toSeq
      assert(a == b && a.nonEmpty)
      // per-shard contiguity (the TrainOrderSpec law, on pipeline output)
      assert(order.groupBy("shard")
        .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
        .filter(col("lo") =!= 1L || col("hi") =!= col("n")).isEmpty)
      // deterministic across independent prepares
      val res2 = TrainingPipeline.prepare(train, eval_, cfg)
      try {
        val o1 = order.as[(Long, Long, Long)].collect().sorted.toSeq
        val o2 = res2.order.get.as[(Long, Long, Long)].collect().sorted.toSeq
        assert(o1 == o2)
      } finally res2.cleanup()
      // absent unless requested
      assert(TrainingPipeline.prepare(train, eval_,
        TrainingPipeline.Config(audit = false)).order.isEmpty)
    } finally { res.cleanup(); spark.catalog.clearCache() }
  }

  test("bpeEncode stage: every survivor encoded, round-trip exact, cleanup releases the type map") {
    val docs = graft.model.Tables(spark, sf(), "documents")
    val train = docs.filter(col("doc_id") % 2 === 0)
    val eval_ = docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text")
    val res = TrainingPipeline.prepare(train, eval_,
      TrainingPipeline.Config(audit = false, bpeEncode = true, bpeMerges = 8))
    try {
      val bpe = res.bpe.getOrElse(fail("bpe export missing"))
      // one encoding row per survivor with >= 1 token; subword
      // concatenation reconstructs the original words exactly (the
      // tokenizer learned on and applied to the SAME surviving text)
      val sv = res.survivors.select(col("doc_id"),
        concat_ws("", filter(split(col("text"), " "), w => w =!= ""))
          .as("orig"))
        .filter(length(col("orig")) > 0)
      val joined = sv.join(bpe, Seq("doc_id"), "left")
      assert(joined.filter(col("seq").isNull).isEmpty,
        "a tokenized survivor is missing from the bpe export")
      assert(joined.filter(
        regexp_replace(col("seq"), " ", "") =!= col("orig")).isEmpty,
        "bpe round-trip must reconstruct the survivor text's words")
      // absent unless requested
      assert(TrainingPipeline.prepare(train, eval_,
        TrainingPipeline.Config(audit = false)).bpe.isEmpty)
    } finally { res.cleanup(); spark.catalog.clearCache() }
  }

  test("bpeEncode dials: batched learner + </w> marker round-trip after stripping") {
    val docs = graft.model.Tables(spark, sf(), "documents")
    val train = docs.filter(col("doc_id") % 2 === 0)
    val eval_ = docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text")
    val res = TrainingPipeline.prepare(train, eval_,
      TrainingPipeline.Config(audit = false, bpeEncode = true,
        bpeBatched = Some((3, 4)), bpeEowMarker = true))
    try {
      val bpe = res.bpe.getOrElse(fail("bpe export missing"))
      val sv = res.survivors.select(col("doc_id"),
        concat_ws("", filter(split(col("text"), " "), w => w =!= ""))
          .as("orig"))
        .filter(length(col("orig")) > 0)
      val joined = sv.join(bpe, Seq("doc_id"), "left")
      assert(joined.filter(col("seq").isNull).isEmpty,
        "a tokenized survivor is missing from the batched bpe export")
      // marker-mode law: concatenation reconstructs the words only
      // after the `</w>` markers strip (BpeSpec's law, composed here)
      assert(joined.filter(
        regexp_replace(regexp_replace(col("seq"), " ", ""), "</w>", "")
          =!= col("orig")).isEmpty,
        "batched+marker bpe round-trip must reconstruct the words")
      // every alphabetic-token doc's seq actually carries markers
      // (non-alpha tokens pass through whole and carry none)
      assert(joined.filter(col("seq").contains("</w>")).count() > 0,
        "marker mode produced no </w> symbols at all")
    } finally { res.cleanup(); spark.catalog.clearCache() }
  }

  test("bpeEncode dials: hot-partitioned learner with derived k round-trips and out-learns batched") {
    val docs = graft.model.Tables(spark, sf(), "documents")
    val train = docs.filter(col("doc_id") % 2 === 0)
    val eval_ = docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text")
    val res = TrainingPipeline.prepare(train, eval_,
      TrainingPipeline.Config(audit = false, bpeEncode = true,
        bpeHotPart = Some(6)))
    try {
      val bpe = res.bpe.getOrElse(fail("bpe export missing"))
      val sv = res.survivors.select(col("doc_id"),
        concat_ws("", filter(split(col("text"), " "), w => w =!= ""))
          .as("orig"))
        .filter(length(col("orig")) > 0)
      val joined = sv.join(bpe, Seq("doc_id"), "left")
      assert(joined.filter(col("seq").isNull).isEmpty,
        "a tokenized survivor is missing from the hot-part bpe export")
      assert(joined.filter(
        regexp_replace(col("seq"), " ", "") =!= col("orig")).isEmpty,
        "hot-part bpe round-trip must reconstruct the survivor words")
      // the derived-k hot rule must learn at least as much per round as
      // the same-rounds batched rule at its k = 8 declared dial — the
      // yield law, composed through the pipeline entry point
      val corpus = res.survivors.select("doc_id", "text")
      val hot = TextAnalysis.learnBpeMergesHotPart(corpus, 6, 8, 8)
      val bat = TextAnalysis.learnBpeMergesBatched(corpus, 6, 8)
      assert(hot.size >= bat.size, s"${hot.size} < ${bat.size}")
    } finally { res.cleanup(); spark.catalog.clearCache() }
  }

  test("cleanup() releases the caches prepare() created, in non-audit mode too") {
    val docs = graft.model.Tables(spark, sf(), "documents")
    val train = docs.filter(col("doc_id") % 2 === 0)
    val eval_ = docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text")
    try {
      spark.catalog.clearCache()
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val res = TrainingPipeline.prepare(train, eval_,
        TrainingPipeline.Config(audit = false))
      res.packed.count() // first action populates the lazy persists
      val afterMat = spark.sparkContext.getPersistentRDDs.keySet -- before
      // non-audit, no optional stages: exact + nearDeduped + evalGrams
      // (r18: the decontamination dispatcher's estimate input) + clean
      // caches, plus the survivors lineage-truncation checkpoint (r14)
      assert(afterMat.size == 5,
        s"expected 4 pipeline caches + 1 checkpoint, got ${afterMat.size}")
      // the truncation contract: survivors' analyzed plan is a flat
      // LogicalRDD — downstream actions never re-traverse the composed
      // lineage (the measured 8-9 s/action driver overhead)
      assert(res.survivors.queryExecution.analyzed.isInstanceOf[
        org.apache.spark.sql.execution.LogicalRDD],
        "survivors must be lineage-truncated")
      res.cleanup()
      val afterClean = spark.sparkContext.getPersistentRDDs.keySet -- before
      // the three named caches released; only the checkpoint's backing
      // RDD remains (freed by the ContextCleaner with the Result's GC)
      assert(afterClean.size == 1,
        s"cleanup must release the named caches, left: ${afterClean.size}")
      // survivors stay fully usable after cleanup — the checkpoint IS
      // the serving copy
      assert(res.survivors.count() > 0)
      res.cleanup() // idempotent
      // r19 (r18 ADVICE): release() is the last-rites escape hatch —
      // drops the checkpoint blocks without waiting for the Result's
      // GC. After it, NO pipeline-created persistent RDD remains.
      res.release()
      val afterRelease = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(afterRelease.isEmpty,
        s"release must drop the checkpoint RDD, left: ${afterRelease.size}")
      res.release() // idempotent, like cleanup
    } finally spark.catalog.clearCache()
  }

  test("the declared pipeline configs stay inside the oracle-expressible stage subset (drift tripwire)") {
    // pipelineChainSql models the mandatory chain plus one-pass md5
    // scrub, staged PII redaction, q103 mixing, and (r19, VERDICT #1)
    // q104's keep-best-quality selection — but NOT fixpoint/contiguous
    // scrub variants or gear boundaries; the BPE tail (r19, VERDICT #2)
    // models only the sequential no-marker learner at the declared
    // depth. A future default flip (or a Declared*Cfg edit enabling an
    // unmodeled stage) must extend the generator, not silently run a
    // stage the SQL doesn't express. The generators' own require()s
    // guard the same envelope at construction; this pins the DECLARED
    // configs' wiring.
    // (name, cfg, expected keepBestQuality, expected bpeEncode) — the
    // heavyweight optional stages are pinned EXACTLY per config: a
    // future default flip turning the 20-round eager learner (or the
    // recursive-closure keep policy) on for the other seven queries
    // must trip here, not silently run at every verify/bench
    // construction (r19 self-review #2 — the widened loop had dropped
    // the one-way !bpeEncode assert entirely)
    for ((name, c, wantBest, wantBpe) <- Seq(
        ("q126", TrainingPipeline.DeclaredCfg, false, false),
        ("q127", TrainingPipeline.DeclaredScrubCfg, false, false),
        ("q128", TrainingPipeline.DeclaredMixCfg, false, false),
        ("q129", TrainingPipeline.DeclaredFullCfg, false, false),
        ("q130", TrainingPipeline.DeclaredOrderCfg, false, false),
        ("q131", TrainingPipeline.DeclaredBestCfg, true, false),
        ("q132", TrainingPipeline.DeclaredBpeCfg, false, true),
        ("q133", TrainingPipeline.DeclaredOrderFullCfg, false, false))) {
      assert(!c.audit, s"$name must not pay the audit counts")
      assert(c.keepBestQuality == wantBest && c.bpeEncode == wantBpe,
        s"$name keep-policy/BPE wiring drifted from its declaration: $c")
      assert(!c.scrubFixpoint &&
        !c.scrubContiguousOnly && c.scrubBoundary == "md5" &&
        c.bpeHotPart.isEmpty && c.bpeBatched.isEmpty && !c.bpeEowMarker &&
        c.bpeMerges == graft.ops.TextAnalysis.BpeMerges,
        s"$name config enables a stage its oracle does not express: $c")
    }
    // the stage wiring each declared config exists to prove
    val c126 = TrainingPipeline.DeclaredCfg
    assert(!c126.scrubDupSpans && !c126.redactPii &&
      c126.mixTokenBudgetFrac.isEmpty && !c126.keepBestQuality)
    val c127 = TrainingPipeline.DeclaredScrubCfg
    assert(c127.scrubDupSpans && c127.redactPii &&
      c127.mixTokenBudgetFrac.isEmpty)
    val c128 = TrainingPipeline.DeclaredMixCfg
    assert(!c128.scrubDupSpans && !c128.redactPii &&
      c128.mixTokenBudgetFrac.contains(TrainingPipeline.DeclaredMixFrac))
    val c129 = TrainingPipeline.DeclaredFullCfg
    assert(c129.scrubDupSpans && c129.redactPii &&
      c129.mixTokenBudgetFrac.contains(TrainingPipeline.DeclaredMixFrac))
    val c130 = TrainingPipeline.DeclaredOrderCfg
    assert(c130.exportOrderSeed.contains(TrainingPipeline.DeclaredOrderSeed) &&
      c130.exportShards == 8 && !c130.scrubDupSpans && !c130.redactPii &&
      c130.mixTokenBudgetFrac.isEmpty)
    val c131 = TrainingPipeline.DeclaredBestCfg
    assert(c131.keepBestQuality && !c131.scrubDupSpans && !c131.redactPii &&
      c131.mixTokenBudgetFrac.isEmpty && !c131.bpeEncode)
    val c132 = TrainingPipeline.DeclaredBpeCfg
    assert(c132.bpeEncode && c132.scrubDupSpans && c132.redactPii &&
      c132.mixTokenBudgetFrac.isEmpty && !c132.keepBestQuality)
    val c133 = TrainingPipeline.DeclaredOrderFullCfg
    assert(c133.exportOrderSeed.contains(TrainingPipeline.DeclaredOrderSeed) &&
      c133.exportShards == 8 && c133.scrubDupSpans && c133.redactPii &&
      c133.mixTokenBudgetFrac.contains(TrainingPipeline.DeclaredMixFrac))
  }

  test("the oracle generators refuse configs outside their envelopes") {
    // chain-moving stages the SQL cannot express; additive stages
    // (exportOrderSeed, bpeEncode) deliberately pass the CHAIN check —
    // they never move the chain, and the order/bpe tails consume them
    for (bad <- Seq(
        TrainingPipeline.DeclaredCfg.copy(scrubDupSpans = true,
          scrubFixpoint = true),
        TrainingPipeline.DeclaredCfg.copy(scrubDupSpans = true,
          scrubBoundary = "gear")))
      intercept[IllegalArgumentException] {
        TrainingPipeline.pipelineOracleSql(bad)
      }
    // the order tail additionally needs the seed
    intercept[IllegalArgumentException] {
      TrainingPipeline.pipelineOrderOracleSql(TrainingPipeline.DeclaredCfg)
    }
    // the bpe tail models exactly the sequential no-marker learner at
    // the declared merge depth — every other learner/dial refuses
    for (bad <- Seq(
        TrainingPipeline.DeclaredCfg, // bpeEncode off
        TrainingPipeline.DeclaredBpeCfg.copy(bpeHotPart = Some(3)),
        TrainingPipeline.DeclaredBpeCfg.copy(bpeBatched = Some((3, 4))),
        TrainingPipeline.DeclaredBpeCfg.copy(bpeEowMarker = true),
        TrainingPipeline.DeclaredBpeCfg.copy(
          bpeMerges = graft.ops.TextAnalysis.BpeMerges + 1)))
      intercept[IllegalArgumentException] {
        TrainingPipeline.pipelineBpeOracleSql(bad)
      }
  }
}
