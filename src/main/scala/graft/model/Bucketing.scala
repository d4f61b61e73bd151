package graft.model

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the co-located-join tool for the 100 TB case.
  *
  * A join or aggregation on a bucketed column reads data ALREADY
  * hash-partitioned on that key: Catalyst's EnsureRequirements sees the
  * scan's HashPartitioning satisfies the operator's distribution
  * requirement and plans NO Exchange. At cluster scale this removes the
  * dominant cost of fact⋈fact joins (a full shuffle of both sides, twice
  * the dataset over the network) for every query that joins or groups on
  * the bucket key — paid once at write time instead of per query.
  *
  * When to bucket (the design rule this module encodes):
  *  - fact tables joined repeatedly on the same high-cardinality key
  *    (orders⋈lineitem on orderkey; events co-bucketed by series);
  *  - bucket counts MUST match on both sides (Spark requires equal
  *    numBuckets for exchange-free joins) — fix them per key domain,
  *    sized so one bucket of the biggest table fits an executor core
  *    (~128-256 MB target at rest);
  *  - sortBy the join key inside buckets: with one file per bucket the
  *    scan yields sorted partitions and SortMergeJoin drops its Sort too.
  *
  * Bucket pruning: equality predicates on the bucket column prune to one
  * bucket at scan time (`SelectedBucketsCount: 1 out of N` in the plan) —
  * point lookups on a bucketed fact table touch 1/N of the files. Caveat:
  * when NO downstream operator needs the bucket distribution (a bare
  * filter), the planner's autoBucketedScan disables the bucketed read for
  * scan parallelism and pruning with it — pin
  * `spark.sql.sources.bucketing.autoBucketedScan.enabled=false` for
  * point-lookup workloads on bucketed tables.
  *
  * The driver's declared queries read the raw testdata parquet, so this
  * is a library capability (like Sketches / StreamingDedup), exercised by
  * BucketingSpec: it writes co-bucketed copies and asserts the joined /
  * aggregated plans contain zero shuffle exchanges and that bucket
  * pruning engages.
  */
object Bucketing {

  /** Write `df` as a bucketed external parquet table registered as
    * `name`, hash-bucketed on `key` into `numBuckets`, bucket-sorted on
    * `key`. One output task per bucket keeps one file per bucket (the
    * precondition for sorted-scan reuse); callers repartition first if
    * the source is huge and the write itself needs more parallelism.
    */
  def writeBucketed(df: DataFrame, name: String, key: String,
                    numBuckets: Int, path: String): Unit =
    // repartition on the bucket key first: bucketBy writes one file per
    // bucket PER TASK, so a P-partition source would yield P files per
    // bucket and FileSourceScanExec would stop reporting sorted output
    // (the one-file-per-bucket precondition for SortMergeJoin dropping
    // its Sort). One shuffle at write time, paid once.
    df.repartition(numBuckets, df(key))
      .write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)

  /** Number of shuffle exchanges in the query's physical plan (AQE
    * initial plan included — collect descends into AdaptiveSparkPlan).
    * 0 on a co-bucketed join/agg is the whole point of bucketing.
    */
  def numShuffles(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // QueryStageExec: after AQE materializes a stage, the exchange hides
    // inside a LEAF stage node — collect never reaches it via children,
    // so descend explicitly or an executed plan reports zero shuffles
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect {
        case _: ShuffleExchangeLike => 1
        case a: AdaptiveSparkPlanExec => count(a.executedPlan)
        case q: QueryStageExec => count(q.plan)
      }.sum
    count(df.queryExecution.executedPlan)
  }

  /** True if the plan's bucketed scan pruned to `selected` of `total`
    * buckets — the point-lookup fast path.
    */
  def prunedTo(df: DataFrame, selected: Int, total: Int): Boolean =
    df.queryExecution.executedPlan.toString
      .contains(s"SelectedBucketsCount: $selected out of $total")

  /** Drop the table registrations (external data stays on disk). */
  def drop(spark: SparkSession, names: String*): Unit =
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
}
