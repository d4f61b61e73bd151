package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared rich synthetic vocabulary for the BPE probes (r15): 100k
  * deterministic alphabetic types, 8-14 chars, heavy shared prefixes
  * (base-26 encodings of 0..99999) — one generator so SegDepthProbe
  * phase 2 and BpeLearnProbe measure the SAME vocabulary regime.
  */
object SynthTypes {
  val Expr: String =
    """concat('w', translate(lpad(CAST(id AS STRING), 7, '0'),
      |'0123456789', 'abcdefghij'),
      |substring('abcdefghijklmnopqrstuvwxyz', 1 + CAST(id % 7 AS INT),
      |CAST(id % 7 AS INT))) AS w""".stripMargin

  /** 100k distinct word types, eagerly checkpointed. */
  def types(spark: SparkSession): DataFrame =
    spark.range(100000).selectExpr(Expr).localCheckpoint(true)
}
