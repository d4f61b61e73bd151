package graft.ops

import graft.Q
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline — language ID,
  * quality scoring, token counting (SURVEY.md §2.2 q87-q89).
  *
  * All three are embarrassingly parallel map-side work plus one
  * aggregation; at 100 TB they pipeline inside whole-stage codegen over
  * the document scan. The language-ID model is corpus-derived (top-k
  * marker words per language from the data itself), so the query is fully
  * self-contained and oracle-checkable — the "train then classify" shape
  * without external model files.
  */
object TextAnalysis {

  val queries: Map[String, Q] = Map(

    // Language ID: build top-5 marker words per language by frequency,
    // classify each doc by marker hits, argmax language (ties → lexical).
    // Broadcast-sized model (25 rows) joined against the exploded corpus.
    "q87_lang_id" -> ((s, dir) => {
      // marker model: needs the word MULTISET (frequencies) — the
      // explode's rows are doc-local, so the groupBy's map-side partials
      // collapse to (lang, word) counts before its one exchange
      val words = Tables(s, dir, "documents")
        .filter(col("text") =!= "")
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val markers = words.groupBy(col("lang").as("m_lang"), col("w").as("m_w"))
        .agg(count(lit(1)).as("freq"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("m_lang").orderBy(col("freq").desc, col("m_w"))))
        .filter(col("rn") <= 5)
        .select("m_lang", "m_w")
      // classify: needs each doc's word SET — per-doc array_distinct
      // (doc-local, no exchange; the pre-r10 `.distinct()` here shuffled
      // every (doc, word) row). A second text scan replaces the previous
      // corpus-wide persist — cheaper than caching the exploded corpus,
      // and the broadcast-joined hits aggregate map-side per doc.
      val hits = Tables(s, dir, "documents")
        .filter(col("text") =!= "")
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("w"))
        .filter(col("w") =!= "")
        .join(broadcast(markers), col("w") === col("m_w"))
        .groupBy(col("doc_id"), col("m_lang"))
        .agg(count(lit(1)).as("score"))
      val best = hits.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("score").desc, col("m_lang"))))
        .filter(col("rn") === 1)
      best.select(col("doc_id"), col("m_lang").as("pred_lang"), col("score"))
        .orderBy(col("doc_id"))
    }),

    // Text normalization — the canonicalization pass before dedup/
    // tokenization: lowercase, strip non-alphanumerics to spaces, collapse
    // whitespace, trim. Emits the normalized form's md5 (the dedup key a
    // normalized-exact dedup would group on), its length, and word count.
    // Pure map-side codegen work; the simple character classes used here
    // behave identically under Java regex (Spark) and RE2 (DuckDB).
    "q56_normalize_text" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          trim(regexp_replace(regexp_replace(lower(col("text")),
            "[^a-z0-9 ]", " "), " +", " ")).as("norm"))
        .select(col("doc_id"),
          md5(col("norm")).as("norm_md5"),
          length(col("norm")).cast("long").as("norm_len"),
          size(filter(split(col("norm"), " "), w => w =!= "")).cast("long")
            .as("n_words"))
        .orderBy(col("doc_id"))
    }),

    // Quality scoring: length/uniqueness heuristics — the cheap filters a
    // pretraining pipeline runs before anything expensive.
    "q88_quality_score" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          filter(split(col("text"), " "), w => w =!= "").as("ws"))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          size(array_distinct(col("ws"))).cast("long").as("n_uniq"),
          col("n_chars"))
        .withColumn("uniq_ratio",
          when(col("n_words") > 0,
            round(col("n_uniq").cast("double") / col("n_words"), 4)).otherwise(lit(0.0)))
        .withColumn("len_score",
          round(least(lit(1.0), col("n_words").cast("double") / 100), 4))
        .withColumn("quality", round(col("uniq_ratio") * col("len_score"), 4))
        .orderBy(col("doc_id"))
    }),

    // Corpus length histogram — the distribution telemetry every
    // pipeline dashboard tracks: 500-char buckets per language. Integer
    // bucket arithmetic with floor (not cast-truncate — §7.5 lesson),
    // one map-side projection + hash agg.
    "q67_length_histogram" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("lang"), floor(col("n_chars") / 500).cast("long").as("bucket"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang"), col("bucket"))
    }),

    // Repetition detection — the degenerate-text filter: the share of a
    // document's 3-word shingle occurrences taken by its single most
    // repeated shingle (1.0 ⇒ the document is one phrase looping; natural
    // text stays low). Counts are NOT de-duplicated — repetition is the
    // signal. Two skew-free shuffles on (doc, shingle) then doc; ratio
    // ships unrounded (identical integer operands both engines).
    "q77_repetition" -> ((s, dir) => {
      graft.functions.VectorExpressions.ensureRegistered(s)
      Tables(s, dir, "documents")
        .select(col("doc_id"), explode(expr("text_shingles(text)")).as("sh"))
        .groupBy(col("doc_id"), col("sh")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("total"), max(col("c")).as("max_rep"))
        .select(col("doc_id"), col("total"), col("max_rep"),
          (col("max_rep").cast("double") / col("total")).as("rep_ratio"))
        .orderBy(col("doc_id"))
    }),

    // TF-IDF top terms — the keyword extractor every corpus-exploration
    // pipeline runs: per doc, the 3 terms maximizing tf × ln(N/df).
    // Plan: two hash aggs (term frequency per doc; document frequency =
    // count over the already-distinct tf rows — no second corpus pass),
    // broadcast 1-row N, per-doc ranking window on a UNIQUE key. Engine
    // determinism: tf/df/N are integers, ln may differ in the last ulp
    // between libms — rank on round(tfidf, 4) with a term tiebreak (the
    // q82 pattern), so ordering never depends on sub-1e-4 float noise.
    "q69_tfidf" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term").asc)
      val words = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
      val tf = words.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
      val n = Tables(s, dir, "documents")
        .agg(count_distinct(col("doc_id")).as("n"))
      tf.join(dfreq, "term")
        .crossJoin(broadcast(n))
        .withColumn("tfidf",
          round(col("tf") * log(col("n").cast("double") / col("dfreq")), 4))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("tfidf"))
        .orderBy(col("doc_id"), col("rk"))
    }),

    // Token counting: whitespace tokens + a BPE-ish regex token count
    // ([a-z]+ runs / digit runs / other non-space) + the chars/4 rule of
    // thumb — the three estimators a data pipeline actually compares.
    "q89_token_count" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(filter(split(col("text"), " "), w => w =!= "")).cast("long")
            .as("ws_tokens"),
          expr("CAST(size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS BIGINT)")
            .as("re_tokens"),
          ceil(col("n_chars").cast("double") / 4).cast("long").as("approx_bpe"))
        .orderBy(col("doc_id"))
    }),

    // Unigram-LM log-probability scoring — the CCNet/Wikipedia-LM
    // perplexity filter's shape with the n-gram order at 1: train the LM
    // on the corpus itself (token → corpus frequency), score each doc by
    // its mean token log-probability, low scores = gibberish/outlier
    // docs. Self-contained (model trained in-query), so fully
    // oracle-checkable — the "train then score" discipline of q87.
    // Scale shape: ONE (lang-free) token agg builds the model; the model
    // is VOCAB-sized (corpus-sublinear by Heaps' law — exactly why CCNet
    // ships its LM to every worker), so scoring is a BROADCAST join that
    // pipelines map-side inside the token-explode scan; one per-doc agg
    // ends it. The corpus is never shuffled — the only exchanges carry
    // (token, count) partials and per-doc partials.
    "q108_unigram_logprob" -> ((s, dir) => {
      val tok = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      // persisted (CACHE CONTRACT, SparkEntry scaladoc): freq feeds both
      // its own grand total and the scoring join; uncached, the corpus
      // token agg would run once per consumer. Vocab-sized — bytes.
      val freq = tok.groupBy(col("w")).agg(count(lit(1)).as("c")).persist()
      val tot = freq.agg(sum(col("c")).as("t"))
      tok.join(broadcast(freq), "w")
        .crossJoin(broadcast(tot))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(log(col("c").cast("double") / col("t").cast("double"))), 4)
            .as("logprob"))
        .orderBy(col("doc_id"))
    }),

    // Vocabulary construction — the top-k corpus token table (counts +
    // corpus share) that seeds a tokenizer build or a stopword list.
    // The rank window is GLOBAL but over the VOCAB aggregate, not the
    // corpus (the q67-histogram class, not the q45 global-sort class):
    // its input is one (token, count) row per distinct token, already
    // reduced map-side by the groupBy, and vocab is corpus-sublinear.
    "q109_vocab_topk" -> ((s, dir) => {
      val tok = Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      // persisted (CACHE CONTRACT): feeds the total and the ranking
      val freq = tok.groupBy(col("w")).agg(count(lit(1)).as("c")).persist()
      val tot = freq.agg(sum(col("c")).as("t"))
      val wnd = org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc, col("w"))
      freq.withColumn("rank", row_number().over(wnd).cast("long"))
        .filter(col("rank") <= 50)
        .crossJoin(broadcast(tot))
        .select(col("rank"), col("w"), col("c"),
          round(col("c").cast("double") / col("t").cast("double"), 6)
            .as("share"))
        .orderBy(col("rank"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q108_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> ''),
        |freq AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        |tot AS (SELECT sum(c) AS t FROM freq)
        |SELECT doc_id, count(*) AS n_tokens,
        |       round(avg(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))), 4) AS logprob
        |FROM tok JOIN freq USING (w) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q109_vocab_topk" ->
      """WITH tok AS (
        |  SELECT w FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> ''),
        |freq AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        |tot AS (SELECT sum(c) AS t FROM freq),
        |ranked AS (
        |  SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rank
        |  FROM freq)
        |SELECT rank, w, c,
        |       round(CAST(c AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share
        |FROM ranked CROSS JOIN tot WHERE rank <= 50 ORDER BY rank""".stripMargin,
    "q69_tfidf" ->
      """WITH words AS (
        |  SELECT doc_id, w AS term FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> ''),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM words GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY term),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |         round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.dfreq), 4) AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, tf, tfidf,
        |         row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY tfidf DESC, term ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, rk, term, tf, tfidf FROM ranked
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "q56_normalize_text" ->
      """WITH n AS (
        |  SELECT doc_id,
        |         trim(regexp_replace(regexp_replace(lower(text),
        |              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS norm_md5,
        |       CAST(length(norm) AS BIGINT) AS norm_len,
        |       CAST(len(list_filter(string_split(norm, ' '), w -> w <> '')) AS BIGINT) AS n_words
        |FROM n ORDER BY doc_id""".stripMargin,
    "q87_lang_id" ->
      """WITH words AS (
        |  SELECT doc_id, lang, w FROM (
        |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE text <> '')
        |  WHERE w <> ''),
        |markers AS (
        |  SELECT m_lang, m_w FROM (
        |    SELECT lang AS m_lang, w AS m_w, count(*) AS freq,
        |           row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, w) AS rn
        |    FROM words GROUP BY lang, w)
        |  WHERE rn <= 5),
        |hits AS (
        |  SELECT d.doc_id, m.m_lang, count(*) AS score
        |  FROM (SELECT DISTINCT doc_id, w FROM words) d
        |  JOIN markers m ON d.w = m.m_w
        |  GROUP BY d.doc_id, m.m_lang)
        |SELECT doc_id, m_lang AS pred_lang, score FROM (
        |  SELECT doc_id, m_lang, score,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, m_lang) AS rn
        |  FROM hits)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q88_quality_score" ->
      """WITH base AS (
        |  SELECT doc_id, n_chars,
        |         list_filter(string_split(text, ' '), w -> w <> '') AS ws
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, n_chars,
        |         CAST(len(ws) AS BIGINT) AS n_words,
        |         CAST(len(list_distinct(ws)) AS BIGINT) AS n_uniq
        |  FROM base)
        |SELECT doc_id, n_words, n_uniq, n_chars,
        |       CASE WHEN n_words > 0
        |            THEN round(CAST(n_uniq AS DOUBLE) / n_words, 4) ELSE 0.0 END AS uniq_ratio,
        |       round(least(1.0, CAST(n_words AS DOUBLE) / 100), 4) AS len_score,
        |       round(CASE WHEN n_words > 0
        |                  THEN round(CAST(n_uniq AS DOUBLE) / n_words, 4) ELSE 0.0 END
        |             * round(least(1.0, CAST(n_words AS DOUBLE) / 100), 4), 4) AS quality
        |FROM m ORDER BY doc_id""".stripMargin,
    "q67_length_histogram" ->
      """SELECT lang, CAST(floor(n_chars / 500.0) AS BIGINT) AS bucket,
        |       count(*) AS cnt
        |FROM documents GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,
    "q77_repetition" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(ws) - 1),
        |                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |  WHERE len(ws) >= 3),
        |cnt AS (
        |  SELECT doc_id, sh, count(*) AS c FROM sh GROUP BY doc_id, sh)
        |SELECT doc_id,
        |       CAST(sum(c) AS BIGINT) AS total,
        |       CAST(max(c) AS BIGINT) AS max_rep,
        |       CAST(max(c) AS DOUBLE) / sum(c) AS rep_ratio
        |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q89_token_count" ->
      """SELECT doc_id,
        |       CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens,
        |       CAST(ceil(CAST(n_chars AS DOUBLE) / 4) AS BIGINT) AS approx_bpe
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
