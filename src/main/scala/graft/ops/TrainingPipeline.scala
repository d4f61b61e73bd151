package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed end-to-end training-data flow — the product the operator
  * inventory exists FOR, wired as one pipeline over a raw document
  * corpus:
  *
  *   quality filter (q88 score) → exact dedup (q80/q73 keep-first) →
  *   SimHash near-dup removal (q78 pairs) → eval decontamination
  *   (q76 semantics, roles swapped: drop TRAIN docs overrun by eval
  *   grams) → chunk (q97 geometry) → pack into training bins (q58).
  *
  * Every stage is the same formulation its oracle-checked query uses, so
  * the pipeline's correctness story rides on the per-operator gates; what
  * THIS module adds is the composition contract, spec-asserted end to
  * end (TrainingPipelineSpec):
  *
  *  - survivors carry no exact-dup pair (distinct md5 == count);
  *  - survivors carry no near-dup pair (re-running q78's pairing on the
  *    output is EMPTY — the greedy drop-doc_b rule guarantees it: any
  *    surviving pair would have a surviving doc_b, contradiction);
  *  - no surviving doc exceeds the eval-gram contamination ratio;
  *  - packed bins conserve tokens: Σ bin totals == Σ chunk tokens of
  *    surviving docs (nothing lost or double-packed).
  *
  * Scale shape: every stage is a hash agg / semi join / band groupBy
  * already audited at the per-query level; nothing here introduces a new
  * shuffle pattern. Packing stays shard-local (q58's per-shard windows),
  * so the pipeline's parallelism is the cluster's, end to end.
  */
object TrainingPipeline {

  /** Thresholds for the drop stages; defaults match the declared
    * queries' constants where one exists. maxContamRatio defaults to
    * effectively-full containment: on a real corpus the eval set is tiny
    * and organic 8-gram overlap is low (0.5-0.8 thresholds are sane
    * there), but the synthetic testdata draws train and eval from one
    * generator vocabulary — measured train-doc contamination runs
    * 0.90-1.0 with median 0.96 — so only ~1.0 separates "the eval doc
    * leaked" from "same vocabulary".
    */
  /** `audit = false` skips the four eager per-stage counts (each one an
    * action re-triggering upstream stages): a production run gets the
    * identical survivors/bins lazily, with an EMPTY audit trail. In that
    * mode the intermediate persists are left in place for the caller's
    * first action to populate (diamond subplans still compute once) —
    * and `Result.cleanup()` releases them once the caller has
    * materialized what it needs (in audit mode the upstream caches are
    * already released eagerly; cleanup then frees only `survivors`).
    */
  case class Config(
      minQuality: Double = 0.05,
      maxHam: Int = 3,
      maxContamRatio: Double = 0.99,
      binTokens: Int = 512,
      shards: Int = 8,
      audit: Boolean = true)

  /** Stage outputs: the surviving corpus and the packed bins, plus
    * per-stage survivor counts for the audit trail. `cleanup` unpersists
    * every cache this prepare() call created (idempotent; safe after the
    * caller's last action on `survivors`/`packed`) — the selective
    * release the non-audit mode needs, without reaching for
    * `spark.catalog.clearCache()` and dropping unrelated caches.
    */
  case class Result(survivors: DataFrame, packed: DataFrame,
                    audit: Seq[(String, Long)],
                    cleanup: () => Unit = () => ())

  private def words(c: Column): Column = filter(split(c, " "), w => w =!= "")

  /** Run the flow. `docs`: (doc_id, text, lang, ...); `evalDocs`:
    * (doc_id, text) — the held-out set whose 8-grams must not leak into
    * training data.
    */
  def prepare(docs: DataFrame, evalDocs: DataFrame,
              cfg: Config = Config()): Result = {
    val spark = docs.sparkSession
    graft.functions.VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    val audit = Seq.newBuilder[(String, Long)]
    if (cfg.audit) audit += ("input" -> docs.count())

    // 1. quality: q88's composite — including its final round(·, 4), so
    // threshold-boundary docs classify exactly as the declared score does
    val scored = docs
      .withColumn("ws", words(col("text")))
      .filter(size(col("ws")) > 0)
      .withColumn("q", round(
        round(size(array_distinct(col("ws"))).cast("double") / size(col("ws")), 4) *
          round(least(lit(1.0), size(col("ws")).cast("double") / 100), 4), 4))
      .filter(col("q") >= cfg.minQuality)
      .drop("ws", "q")
    if (cfg.audit) audit += ("quality" -> scored.count())

    // 2. exact dedup, keep-first by doc_id (q73's row_number discipline
    // on q80's md5 key — dropDuplicates would keep an arbitrary row)
    val wMd5 = Window.partitionBy(col("content_md5")).orderBy(col("doc_id"))
    val exact = scored
      .withColumn("content_md5", md5(col("text")))
      .withColumn("rn", row_number().over(wMd5))
      .filter(col("rn") === 1).drop("rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (cfg.audit) audit += ("exact_dedup" -> exact.count())

    // 3. near-dup removal: q78's banded pairs (the shared
    // Dedup.nearDupPairs), then greedily drop every doc_b — survivors
    // are pairwise non-near-dup by construction. Persisted: feeds the
    // gram explode AND the final anti-join.
    val dropIds = Dedup.nearDupPairs(exact, cfg.maxHam)
      .select(col("doc_b").as("doc_id")).distinct()
    val nearDeduped = exact.join(dropIds, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (cfg.audit) audit += ("near_dedup" -> nearDeduped.count())

    // 4. decontamination, q76's gram machinery with roles swapped: drop
    // TRAIN docs whose distinct 8-grams are mostly present in the eval
    // set (a leaked benchmark doc scores ~1.0; organic overlap stays
    // low). trainGrams NOT persisted (r11, same evidence as q75's
    // DecontamProbe verdict): the per-doc-distinct gram set carries a
    // ~53× cross-doc duplication factor, and both consumers regenerate
    // it with one doc-local codegen explode over the ALREADY-CACHED
    // nearDeduped — rebuilding beat the gram cache at every soak decade.
    // per-doc distinct via array_distinct (doc-local, no exchange);
    // evalGrams feeds only a LEFT SEMI right side, which dedups by
    // construction — neither needs the global `.distinct()` exchange the
    // pre-r10 form paid (same rewrite as q75/q76)
    val evalGrams = evalDocs
      .select(explode(array_distinct(expr("char_ngrams(text, 8)"))).as("g"))
    val trainGrams = nearDeduped
      .select(col("doc_id"),
        explode(array_distinct(expr("char_ngrams(text, 8)"))).as("g"))
    val contam = trainGrams.groupBy("doc_id").agg(count(lit(1)).as("total"))
      .join(trainGrams.join(evalGrams, Seq("g"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("hit")), Seq("doc_id"), "left")
      .filter(coalesce(col("hit"), lit(0L)).cast("double") / col("total")
        > cfg.maxContamRatio)
      .select("doc_id")
    val clean = nearDeduped.join(contam, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (cfg.audit) {
      audit += ("decontaminated" -> clean.count())
      // clean is materialized: the upstream caches served their consumers
      // and can release now. `clean` itself stays cached until the
      // caller's cleanup() (same contract as SparkEntry.queries'
      // persisted subplans). Without audit nothing has materialized yet,
      // so the upstream persists stay for the caller's first action to
      // populate once — cleanup() releases them too.
      exact.unpersist()
      nearDeduped.unpersist()
    }

    // 5+6. chunk + pack: the SAME q97 geometry / q58 packing helpers the
    // oracle-checked queries run (Extensions.docChunks / packBins)
    val chunks = Extensions.docChunks(clean)
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tokens"))
    val packed = Extensions.packBins(chunks, cfg.binTokens, cfg.shards)
      .select("shard", "bin", "n_chunks", "tok_total")

    // unpersist is idempotent, so listing the already-released audit-mode
    // caches here is harmless — one cleanup covers both modes
    val cleanup = () => Seq(exact, nearDeduped, clean)
      .foreach(_.unpersist())
    Result(clean, packed, audit.result(), cleanup)
  }

}
