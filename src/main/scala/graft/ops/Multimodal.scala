package graft.ops

import graft.Q
import graft.model.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.2 q92): treat media payloads
  * as opaque `BINARY` columns with typed metadata, and run decode /
  * feature-extraction as partition-local batch work.
  *
  * The decode step is a STUB — no image/audio codec ships in this
  * environment — but everything Spark-side is real: the binary schema, the
  * per-partition batching (`mapPartitions` over a typed Dataset, the Scala
  * analog of `mapInPandas` batches), the metadata struct that comes back,
  * and the downstream join/aggregation. Swapping [[MultimodalStub.decode]]
  * for a real codec changes no plan shape.
  *
  * Scale: decode is the expensive map stage — it pipelines over the scan
  * with no shuffle; the only shuffle is the final small aggregation.
  */
object Multimodal {

  /** Decoded-media metadata (what a real image decode would yield). */
  final case class MediaMeta(doc_id: Long, byte_len: Long, width: Int,
                             height: Int, format: String)

  object MultimodalStub {
    /** Deterministic FAKE decode: derives pseudo-metadata from payload
      * bytes alone. Replace with a real codec (e.g. javax.imageio) at the
      * same signature — callers only see [[MediaMeta]].
      */
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val len = payload.length
      val b0 = if (len > 0) payload(0) & 0xff else 0
      val b1 = if (len > 1) payload(1) & 0xff else 0
      MediaMeta(docId, len.toLong, 16 + b0 % 64, 16 + b1 % 64,
        if (len % 2 == 0) "png" else "jpeg")
    }
  }

  /** documents.text re-cast as an opaque binary payload column — the
    * stand-in for a real media blob (the testdata has no binary table).
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        col("text").cast("binary").as("payload"))

  /** Partition-local decode: binary rows in, typed metadata out. */
  def decoded(s: SparkSession, dir: String): Dataset[MediaMeta] = {
    import s.implicits._
    mediaTable(s, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => MultimodalStub.decode(id, bytes) })
  }

  val queries: Map[String, Q] = Map(
    // Decode → per-format/size-bucket distribution, joined back to lang.
    // Declared rows-only (no oracle): the stub decode is not SQL.
    "q92_multimodal_decode" -> ((s, dir) => {
      val meta = decoded(s, dir).toDF()
      meta.join(mediaTable(s, dir).select("doc_id", "lang"), Seq("doc_id"))
        .groupBy(col("lang"), col("format"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("byte_len")).as("total_bytes"),
          max(col("width")).cast("long").as("max_w"),
          max(col("height")).cast("long").as("max_h"))
        .orderBy(col("lang"), col("format"))
    })
  )

  val oracle: Map[String, String] = Map.empty
}
