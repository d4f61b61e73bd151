package graft.ops

import graft.Q
import graft.model.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LLM-data-pipeline extensions — arrays/maps, exact & near dedup,
  * similarity search, text analysis, multimodal join (SURVEY.md §2.2
  * q64-q66, q80-q84).
  *
  * Scale notes (the 100 TB view):
  *  - q80 exact dedup: hash-groupBy on md5(text) — one shuffle on the hash,
  *    map-side partial counts; at scale this is the canonical first dedup
  *    pass.
  *  - q81 shingle Jaccard: explode → DISTINCT (doc, shingle) → self-join on
  *    shingle. The distinct pass bounds candidate generation; hot shingles
  *    (stop-shingles) are the skew risk — the MinHash/LSH variant
  *    (q85, Dedup.scala) is the scale path.
  *  - q82 cosine top-k: brute force against ONE broadcast probe vector —
  *    O(n·d) map-side work, no shuffle until the final top-k. The bucketed
  *    ANN variant (q91) is the scale path for many probes.
  *  - Float math: element-wise products are cast to DECIMAL(28,12) before
  *    summing so the reduction is exact and order-independent — double
  *    addition is not associative and a parallel engine must not let
  *    reduction order leak into results (SURVEY.md §7.5.2).
  */
object Extensions {

  /** Exact dot product of two float vectors via decimal accumulation:
    * widen float→double (exact), multiply (deterministic IEEE), cast each
    * product to DECIMAL(28,12), fold exactly.
    */
  private def dotDec(a: String, b: String): org.apache.spark.sql.Column =
    expr(
      s"""aggregate(
         |  zip_with($a, $b, (x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12))),
         |  CAST(0 AS DECIMAL(28,12)),
         |  (acc, v) -> CAST(acc + v AS DECIMAL(28,12)))""".stripMargin)

  val queries: Map[String, Q] = Map(

    // ──────────────────────── arrays & maps ──────────────────────────────
    "q64_array_fns" -> ((s, dir) => {
      Tables(s, dir, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("e_first"),
        round(element_at(col("embedding"), 64).cast("double"), 4).as("e_last"),
        transform(slice(col("embedding"), 1, 3),
          x => round(x.cast("double"), 4)).as("head3"))
        .orderBy(col("vec_id"))
    }),

    "q65_explode_unnest" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(20)
    }),

    // Spark-only (no oracle): DuckDB map semantics differ (SURVEY.md §2.2).
    "q66_map_type" -> ((s, dir) => {
      Tables(s, dir, "events")
        .withColumn("m", from_json(col("props"), MapType(StringType, LongType)))
        .select(col("event_id"),
          array_sort(map_keys(col("m"))).as("ks"),
          col("m").getItem("k").as("k_val"))
        .orderBy(col("event_id"))
    }),

    // ─────────────────────────── dedup ───────────────────────────────────
    // Exact duplicate groups by content hash (md5 in both engines).
    "q80_exact_dedup_docs" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("min_id"))
        .filter(col("cnt") > 1)
        .orderBy(col("h"))
    }),

    // 3-word shingle Jaccard near-dup: distinct (doc, shingle) → self-join
    // on shingle (doc_a < doc_b) → integer intersection/union → one rounded
    // division. Candidate pairs are bounded by shared-shingle pairs only.
    "q81_shingle_jaccard" -> ((s, dir) => {
      val ws = Tables(s, dir, "documents")
        .filter(col("text") =!= "")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
      // The shingle set feeds three consumers (sizes + both self-join
      // branches) — Spark has no automatic CTE reuse for DataFrame plans,
      // so materialize it once instead of re-scanning the corpus per
      // branch. (At 100 TB this intermediate is written to storage; the
      // plan shape is the same.)
      val sh = ws.select(col("doc_id"),
          explode(expr(
            "transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))
            .as("sh"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val pairs = sh.as("a")
        .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      val jac = col("inter").cast("double") /
        (col("sa.n") + col("sb.n") - col("inter")).cast("double")
      pairs
        .join(sz.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sz.as("sb"), col("doc_b") === col("sb.doc_id"))
        .filter(jac >= 0.3)
        .select(col("doc_a"), col("doc_b"), col("inter"), round(jac, 4).as("jac"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // ─────────────────────── similarity search ───────────────────────────
    // Brute-force cosine top-k against probe vec_id=0 (broadcast), exact
    // decimal dot products (see dotDec).
    "q82_cosine_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val probe = emb.filter(col("vec_id") === 0).select(col("embedding").as("p"))
      emb.crossJoin(broadcast(probe))
        .select(col("vec_id"),
          dotDec("embedding", "p").cast("double").as("dp"),
          dotDec("embedding", "embedding").cast("double").as("na"),
          dotDec("p", "p").cast("double").as("np"))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          round(col("dp") / (sqrt(col("na")) * sqrt(col("np"))), 3).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(5)
    }),

    // ─────────────────────── text analysis ───────────────────────────────
    "q83_text_stats" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("docs"),
          round(sum(col("n_chars").cast("decimal(18,2)")).cast("double")
            / count(lit(1)), 4).as("avg_chars"),
          countDistinct(col("source")).as("srcs"))
        .orderBy(col("lang"))
    }),

    // ─────────────────────── multimodal join ─────────────────────────────
    "q84_multimodal_join" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .join(Tables(s, dir, "embeddings"), col("doc_id") === col("vec_id"))
        .groupBy(col("lang"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang"), col("label"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q64_array_fns" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |       round(CAST(embedding[1] AS DOUBLE), 4) AS e_first,
        |       round(CAST(embedding[64] AS DOUBLE), 4) AS e_last,
        |       list_transform(embedding[1:3], x -> round(CAST(x AS DOUBLE), 4)) AS head3
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q65_explode_unnest" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word
        |ORDER BY cnt DESC, word LIMIT 20""".stripMargin,
    "q80_exact_dedup_docs" ->
      """SELECT md5(text) AS h, count(*) AS cnt, min(doc_id) AS min_id
        |FROM documents GROUP BY md5(text) HAVING count(*) > 1
        |ORDER BY h""".stripMargin,
    "q81_shingle_jaccard" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE text <> ''),
        |sh AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id,
        |           unnest(list_transform(range(1, len(ws) - 1),
        |                  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
        |    FROM ws WHERE len(ws) >= 3)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pr AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT doc_a, doc_b, inter,
        |       round(CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE), 4) AS jac
        |FROM pr JOIN sz sa ON pr.doc_a = sa.doc_id
        |        JOIN sz sb ON pr.doc_b = sb.doc_id
        |WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.3
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q82_cosine_topk" ->
      """WITH pe AS (
        |  SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
        |  FROM embeddings WHERE vec_id = 0),
        |ee AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
        |  FROM embeddings),
        |dots AS (
        |  SELECT ee.vec_id,
        |         CAST(sum(CAST(CAST(ee.v AS DOUBLE) * CAST(pe.v AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE) AS dp,
        |         CAST(sum(CAST(CAST(ee.v AS DOUBLE) * CAST(ee.v AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE) AS na
        |  FROM ee JOIN pe USING (i) GROUP BY ee.vec_id),
        |pn AS (
        |  SELECT CAST(sum(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE) AS np
        |  FROM pe)
        |SELECT vec_id, round(dp / (sqrt(na) * sqrt(np)), 3) AS sim
        |FROM dots, pn WHERE vec_id <> 0
        |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin,
    "q83_text_stats" ->
      """SELECT lang, count(*) AS docs,
        |       round(CAST(sum(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_chars,
        |       CAST(count(DISTINCT source) AS BIGINT) AS srcs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q84_multimodal_join" ->
      """SELECT lang, label, count(*) AS cnt
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |GROUP BY lang, label ORDER BY lang, label""".stripMargin
  )
}
