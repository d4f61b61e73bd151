package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-soak corpus builder (test-scoped main) — materializes the N×
  * corpus behind SURVEY §8's measured scaling decades, so the soak is
  * reproducible from the repo instead of from a session-local script.
  *
  * Usage: `sbt "Test/runMain graft.ops.ScaleCorpus <srcSfDir> <outDir> <N>"`
  * (e.g. `/root/testdata/sf0.1 /tmp/scale10 10`).
  *
  * Construction: N isomorphic replicas of the source, replica 0 the
  * identity, built so that per-replica structure is EXACTLY the
  * source's while replicas never interact:
  *
  *  - `documents`: ids offset by 10M per replica; text Caesar-rotated
  *    by r (`translate` over both cases) — word lengths, gram document
  *    frequencies, and within-replica duplicate structure are
  *    preserved verbatim, while cross-replica letter-gram overlap is
  *    zero. Rotation wraps at 26, so N > 26 would re-collide grams:
  *    refused loudly below rather than silently contaminating.
  *  - `embeddings`: ids offset by 10M; vectors circularly shifted by r
  *    (rotation preserves all within-replica inner products; shifted
  *    copies decorrelate across replicas).
  *  - `lineitem`/`orders`: order keys offset by 100M per replica —
  *    facts scale N×, the order⋈lineitem key structure stays
  *    within-replica — while every dimension key (custkey, partkey,
  *    suppkey) is left untouched: dims stay FIXED, the 100 TB shape
  *    (big facts, small dims) rather than a uniform blow-up.
  *  - `events`: event AND user ids offset by 10M — each replica is its
  *    own user population, so per-user series/session/window structure
  *    replicates instead of stacking duplicate timestamps per user.
  *  - dims (`customer supplier part nation region`): copied as-is.
  *
  * The construction is validated downstream by [[ScaleProbe]] row
  * counts: fact-proportional outputs must scale exactly N×,
  * fixed-cardinality groupings must not move — any cross-replica
  * contamination breaks those laws loudly.
  */
object ScaleCorpus {
  private val IdOff  = 10000000L
  private val KeyOff = 100000000L

  private def rotated(r: Int): (String, String) = {
    val lower = ('a' to 'z').mkString
    val upper = ('A' to 'Z').mkString
    def rot(s: String) = s.drop(r % 26) + s.take(r % 26)
    (lower + upper, rot(lower) + rot(upper))
  }

  private def replicate(src: DataFrame, n: Int)(one: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until n).map(one(src, _)).reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleCorpus <srcSfDir> <outDir> <N>")
    val Array(srcDir, outDir, nStr) = args
    val n = nStr.toInt
    require(n >= 1 && n <= 26,
      s"N=$n out of range: Caesar rotation wraps at 26 — more replicas would re-collide grams")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def read(t: String)  = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scale-corpus] wrote $t: ${spark.read.parquet(s"$outDir/$t.parquet").count()} rows")
    }

    write(replicate(read("documents"), n) { (d, r) =>
      val (from, to) = rotated(r)
      d.select(
        (col("doc_id") + lit(r * IdOff)).as("doc_id"),
        translate(col("text"), from, to).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }, "documents")

    write(replicate(read("embeddings"), n) { (e, r) =>
      // circular left-shift by r: tail ++ head (slice len 0 = empty)
      e.select(
        (col("vec_id") + lit(r * IdOff)).as("vec_id"),
        concat(
          slice(col("embedding"), lit(r + 1), size(col("embedding")) - lit(r)),
          slice(col("embedding"), lit(1), lit(r))).as("embedding"),
        col("label"))
    }, "embeddings")

    write(replicate(read("lineitem"), n) { (l, r) =>
      l.withColumn("l_orderkey", col("l_orderkey") + lit(r * KeyOff))
    }, "lineitem")

    write(replicate(read("orders"), n) { (o, r) =>
      o.withColumn("o_orderkey", col("o_orderkey") + lit(r * KeyOff))
    }, "orders")

    // events' time encoding varies by testdata generation (ns BIGINT via
    // nanosAsLong, or µs TIMESTAMP_NTZ — see graft.model.Tables); read
    // RAW here so the time column round-trips byte-identical and the
    // replica reads exactly like the source through Tables' adaptive
    // loader
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    write(replicate(read("events"), n) { (e, r) =>
      e.withColumn("event_id", col("event_id") + lit(r * IdOff))
        .withColumn("user_id", col("user_id") + lit(r * IdOff))
    }, "events")

    for (t <- Seq("customer", "supplier", "part", "nation", "region"))
      write(read(t), t)

    spark.stop()
  }
}
