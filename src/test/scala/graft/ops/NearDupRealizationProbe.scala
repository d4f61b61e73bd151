package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Near-dup pair-realization probe (r19, self-set ADVICE close) — the
  * measurement behind SURVEY §8.0's q130/q131 top-decade attribution.
  *
  * Two questions about the scale-decade corpora (ScaleCorpus):
  *
  *  1. Do replicas interact through the simhash band join — i.e. does
  *     any confirmed d<=maxHam pair CROSS replica boundaries? (If yes,
  *     cluster volume densifies with the decade and the soak exponents
  *     partly measure corpus construction.) Measured answer: NO —
  *     cross=0 of 166,267 / 2,514,108 / 27,915,300 confirmed pairs at
  *     sf0.1 / 10x / 100x. The disjoint-alphabet isolation holds
  *     exactly, as ScaleCorpus's scaladoc claims.
  *  2. Is the confirmed-pair count stable across hash realizations of
  *     the SAME similarity structure? Measured answer: NO — the letter
  *     bijections preserve word-set structure exactly (sizes, overlaps,
  *     within-doc duplicates) yet redraw every word hash, and single
  *     rotations of sf0.1 alone confirm 166,267 (r=0) / 209,512 (r=1) /
  *     502,972 (r=5) / 178,691 (r=26, CJK) pairs at d<=3: borderline
  *     near-cliques tip in or out wholesale with the realization (one
  *     m-member clique moves ~m^2/2 pairs). The decade corpora average
  *     ~260-280k pairs per replica vs the identity replica's 166k, so
  *     per-doc pair volume at 10x/100x runs ~1.6x the 1x point — the
  *     decades do genuinely MORE closure/keep-rank work per doc than
  *     sf0.1, and q131's top-decade soak exponent carries that
  *     realization artifact on top of plan scaling.
  *
  * Usage: java -cp <test classpath> (tools/jvm_opts.sh) \
  *   graft.ops.NearDupRealizationProbe [sfDir scaleDirs...]
  */
object NearDupRealizationProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/scale10", "/tmp/scale100")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorExpressions.ensureRegistered(spark)

    // Q1: cross-replica confirmed pairs at each decade (replica id =
    // doc_id / ScaleCorpus.IdOff)
    for (dir <- dirs) {
      val docs = graft.model.Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val off = ScaleCorpus.IdOff
      val agg = Dedup.nearDupPairs(docs, 3)
        .agg(count(lit(1)).as("pairs"),
          sum(when(floor(col("doc_a") / off) =!= floor(col("doc_b") / off),
            1L).otherwise(0L)).as("cross"))
        .head()
      println(s"[neardup-real] $dir pairs=${agg.getLong(0)} cross=${agg.getLong(1)}")
      spark.catalog.clearCache()
    }

    // Q2: single-replica realizations — ScaleCorpus's exact bijections
    // applied to the base corpus alone
    val base = graft.model.Tables(spark, dirs.head, "documents")
      .select(col("doc_id"), col("text"))
    val lower = ('a' to 'z').mkString; val upper = ('A' to 'Z').mkString
    for (r <- Seq(0, 1, 5, 26)) {
      val (from, to) =
        if (r < 26) {
          def rot(s: String) = s.drop(r % 26) + s.take(r % 26)
          (lower + upper, rot(lower) + rot(upper))
        } else {
          val b = 0x4E00 + (r - 26) * 52
          (lower + upper, (0 until 52).map(i => (b + i).toChar).mkString)
        }
      val d = base.select(col("doc_id"), translate(col("text"), from, to).as("text"))
      println(s"[neardup-real] rotation r=$r pairs=${Dedup.nearDupPairs(d, 3).count()}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
