package graft.ops

import java.nio.file.Files
import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** Laws of the parameterized training-order export (Extensions.trainOrder /
  * writeTrainOrder) — the engine surface behind the pinned q106 query:
  *
  *  1. membership: for ANY shard count, the output carries exactly the
  *     input doc set once (sharding partitions the order, never the set);
  *  2. contiguity: per shard, pos is exactly 1..n_shard with no gaps;
  *  3. determinism: repeated invocation is bit-identical;
  *  4. q106 compatibility: trainOrder(seed="42", shards=8, keyHexDigits=1)
  *     reproduces the declared query byte-for-byte;
  *  5. writer round-trip: writeTrainOrder lays out one directory per
  *     shard, read-back reproduces the full (shard, pos, doc_id) set, and
  *     every FILE is pos-ascending in file order — the property that lets
  *     a training loader stream shards sequentially without a sort.
  */
class TrainOrderSpec extends SparkSpec {

  private def docs = graft.model.Tables(spark, sf(), "documents")
    .select(col("doc_id"))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    df.select(col("shard").cast("long"), col("pos").cast("long"),
        col("doc_id").cast("long"))
      .as[(Long, Long, Long)].collect().sortBy(identity).toSeq
  }

  test("membership law: any shard count yields the same global doc set") {
    import spark.implicits._
    val base = docs.select("doc_id").as[Long].collect().sorted.toSeq
    for (shards <- Seq(1, 5, 64)) {
      val out = Extensions.trainOrder(docs, seed = "s12", shards = shards)
      val got = out.select("doc_id").as[Long].collect().sorted.toSeq
      assert(got == base, s"shards=$shards changed the doc set")
      // and the shard column actually uses the requested range
      val maxShard = out.agg(max("shard")).head().getLong(0)
      assert(maxShard < shards)
      if (shards == 64) // 500 docs over 64 shards: spread, not collapsed
        assert(out.select("shard").distinct().count() > 32)
    }
  }

  test("contiguity law: per shard, pos is exactly 1..n with no gaps") {
    val out = Extensions.trainOrder(docs, seed = "s12", shards = 5)
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("nd"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n") || col("nd") =!= col("n"))
    assert(bad.isEmpty)
  }

  test("determinism: repeated invocation is bit-identical") {
    val a = canon(Extensions.trainOrder(docs, seed = "s12", shards = 7))
    val b = canon(Extensions.trainOrder(docs, seed = "s12", shards = 7))
    assert(a == b)
    // different seed ⇒ different order (sanity that the seed is live)
    val c = canon(Extensions.trainOrder(docs, seed = "other", shards = 7))
    assert(a != c)
  }

  test("q106 compatibility: pinned parameters reproduce the declared query") {
    val declared = canon(SparkEntry.queries("q106_train_order")(spark, sf()))
    val api = canon(Extensions.trainOrder(docs, seed = "42", shards = 8,
      keyHexDigits = 1))
    assert(api == declared)
  }

  test("writer round-trip: per-shard dirs, files pos-ascending, set preserved") {
    import spark.implicits._
    val shards = 16
    val out = Files.createTempDirectory("train_order").toString
    Extensions.writeTrainOrder(docs, seed = "w12", shards = shards, outDir = out)
    // read-back set equality against the logical order
    val expect = canon(Extensions.trainOrder(docs, seed = "w12", shards = shards))
    val got = canon(spark.read.parquet(out))
    assert(got == expect)
    // layout: one shard=N directory per non-empty shard
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.nonEmpty && dirs.forall(_.matches("shard=\\d+")))
    // every parquet FILE is pos-ascending in file order: read each file
    // alone (single small file ⇒ single input partition ⇒ collect order
    // is file order for a parquet scan)
    for (d <- dirs) {
      val files = new java.io.File(s"$out/$d").listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      assert(files.nonEmpty, s"no parquet files under $d")
      for (f <- files) {
        val pos = spark.read.parquet(f.getAbsolutePath)
          .select("pos").as[Long].collect().toSeq
        assert(pos == pos.sorted, s"file ${f.getName} under $d not pos-ascending")
      }
    }
  }
}
