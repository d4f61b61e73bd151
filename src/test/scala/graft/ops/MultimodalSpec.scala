package graft.ops

import graft.SparkSpec
import graft.ops.Multimodal.GzipCodec
import org.apache.spark.sql.functions._

/** Multimodal decode path (q92): the codec is REAL gzip — assert genuine
  * header/trailer structure (magic bytes, RFC 1952 ISIZE), a full
  * round-trip, and the distributed plumbing end-to-end on testdata.
  */
class MultimodalSpec extends SparkSpec {

  test("gzip codec round-trips and parses real header/trailer fields") {
    val text = "the quick brown fox jumps over the lazy dog " * 20
    val bytes = text.getBytes("UTF-8")
    val enc = GzipCodec.encode(bytes)
    // real gzip stream: RFC 1952 magic
    assert((enc(0) & 0xff) == 0x1f && (enc(1) & 0xff) == 0x8b)
    assert(enc.length < bytes.length) // repetitive text actually compresses
    val meta = GzipCodec.decode(7L, enc)
    assert(meta.doc_id == 7L)
    assert(meta.format == "gzip")
    assert(meta.enc_len == enc.length.toLong)
    assert(meta.dec_len == bytes.length.toLong)
    // ISIZE trailer parsed from the last 4 bytes matches the true length
    assert(meta.isize == bytes.length.toLong && meta.isize_ok)
  }

  test("non-gzip payload is classified raw, not crashed on") {
    val meta = GzipCodec.decode(1L, "plainly not gzip".getBytes("UTF-8"))
    assert(meta.format == "raw" && meta.dec_len == -1L && !meta.isize_ok)
  }

  test("corrupt payload past the magic check is classified, not thrown") {
    val enc = GzipCodec.encode(("corpus text " * 50).getBytes("UTF-8"))
    // truncation: valid magic/header, stream ends mid-deflate
    val truncated = java.util.Arrays.copyOf(enc, enc.length / 2)
    val m1 = GzipCodec.decode(2L, truncated)
    assert(m1.format == "corrupt" && !m1.isize_ok)
    // bit flips in the deflate body: CRC/stream error instead of a crash
    val flipped = enc.clone()
    for (i <- 12 until math.min(flipped.length - 8, 40))
      flipped(i) = (flipped(i) ^ 0x5a).toByte
    // must classify (corrupt via deflate/CRC error, or gzip if the flip
    // happened to survive decoding) — never propagate an exception
    val m2 = GzipCodec.decode(3L, flipped)
    assert(m2.format == "corrupt" || m2.format == "gzip")
  }

  test("q92 decodes every document and conserves byte counts (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val out = Multimodal.queries("q92_multimodal_decode")(spark, sf).collect()
    assert(out.nonEmpty)
    // every group decoded as genuine gzip with a verified ISIZE
    assert(out.forall(_.getAs[String]("format") == "gzip"))
    assert(out.forall(_.getAs[Boolean]("all_isize_ok")))
    // decompressed bytes must equal the corpus' UTF-8 text bytes
    val decTotal = out.map(_.getAs[Long]("dec_bytes")).sum
    val expected = graft.model.Tables(spark, sf, "documents")
      .selectExpr("CAST(sum(octet_length(CAST(text AS BINARY))) AS BIGINT)")
      .head().getLong(0)
    assert(decTotal == expected)
  }

  test("feature histograms conserve counts and are deterministic across passes") {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val sf = "/root/testdata/sf0.001"
    val feats = Multimodal.features(spark, sf).toDF()
    // histogram mass equals the decoded byte count, for every doc
    val broken = feats.filter(col("dec_len") >= 0)
      .filter(expr("CAST(aggregate(features, 0D, (a, x) -> a + x) AS BIGINT)")
        =!= col("dec_len"))
    assert(broken.isEmpty)

    // two INDEPENDENT encode→decode→featurize passes must agree vector-
    // for-vector (round-trip determinism — same content, same features),
    // and the features column joins into vec_cosine exactly like the
    // embeddings table: cosine of the matched pair is exactly 1.0
    val feats2 = Multimodal.features(spark, sf).toDF()
    val matched = feats.as("fa")
      .join(feats2.as("fb"), col("fa.doc_id") === col("fb.doc_id"))
      .filter(col("fa.dec_len") >= 0)
    // determinism: bit-identical vectors across the two passes
    assert(matched.filter(col("fa.features") =!= col("fb.features")).isEmpty)
    // plumbing: the features column rides vec_cosine like the embeddings
    // table (identical vectors land within float rounding of 1.0 —
    // sqrt(n)² ≠ n exactly in IEEE, so exact 1.0 is NOT the contract)
    val sims = matched
      .select(expr("vec_cosine(fa.features, fb.features)").as("sim"))
    assert(sims.filter(abs(col("sim") - 1.0) > 1e-9).isEmpty && !sims.isEmpty)
  }
}
