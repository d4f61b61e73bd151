package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The full MinHash signature as ONE aggregate: `minhash_agg(shingle)` →
  * `array<string>` of K=16 hex digests, element i being
  * `min(md5('<i>|' || shingle))` over the group — exactly the
  * engine-portable signature q85's oracle SQL computes with 16 separate
  * `min(md5(concat(...)))` aggregate columns.
  *
  * WHY one aggregate: the 16-column form evaluates 16 concat+md5
  * expression trees per input row (16 UTF8String allocations each) and
  * carries 16 independent string-min slots through the aggregation. Here
  * each row takes one compiled pass — a reused MessageDigest fed the
  * seed prefix bytes then the shingle bytes, K digests folded into a
  * 16×16-byte buffer by unsigned comparison (identical to the engines'
  * hex VARCHAR order; hex materializes only at eval). Partial buffers
  * merge by elementwise min — order-independent, exact under any
  * partitioning — and the shuffle carries 257-byte buffers instead of 16
  * strings. MinHash signatures are THE heavy pass of LSH dedup at
  * 100 TB; this keeps it map-side-combinable at minimum constant cost.
  */
case class MinHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Array[Byte]]] with UnaryLike[Expression] {

  import MinHashAgg.K

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string (shingle), got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Array[Byte]] =
    new Array[Array[Byte]](K) // all null = no rows seen yet

  override def update(buf: Array[Array[Byte]], input: InternalRow): Array[Array[Byte]] = {
    val v = child.eval(input)
    if (v != null) {
      val sh = v.asInstanceOf[UTF8String].getBytes
      val md = Md5Pool.get() // per-task-thread reuse — see Md5Pool
      var i = 0
      while (i < K) {
        md.update(MinHashAgg.seedPrefix(i))
        md.update(sh)
        val d = md.digest() // also resets for the next seed
        if (buf(i) == null || java.util.Arrays.compareUnsigned(d, buf(i)) < 0)
          buf(i) = d
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Array[Byte]], b: Array[Array[Byte]]): Array[Array[Byte]] = {
    var i = 0
    while (i < K) {
      if (a(i) == null ||
        (b(i) != null && java.util.Arrays.compareUnsigned(b(i), a(i)) < 0))
        a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Array[Byte]]): Any = {
    if (buf(0) == null) return null // no input rows
    val out = new Array[Any](K)
    var i = 0
    while (i < K) {
      out(i) = UTF8String.fromString(HexBytes.lower(buf(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Array[Byte]]): Array[Byte] = {
    if (buf(0) == null) return Array(0.toByte)
    val out = new Array[Byte](1 + K * 16)
    out(0) = 1
    var i = 0
    while (i < K) { System.arraycopy(buf(i), 0, out, 1 + i * 16, 16); i += 1 }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Array[Byte]] = {
    val buf = new Array[Array[Byte]](K)
    if (bytes.nonEmpty && bytes(0) == 1) {
      var i = 0
      while (i < K) {
        buf(i) = java.util.Arrays.copyOfRange(bytes, 1 + i * 16, 17 + i * 16)
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** Signature width — 4 LSH bands × 4 rows (q85's contract). */
  val K = 16

  /** Seed prefixes "0|".."15|" as UTF-8 bytes, matching the oracle's
    * `md5('<i>|' || shingle)`.
    */
  private[functions] val seedPrefix: Array[Array[Byte]] =
    Array.tabulate(K)(i => s"$i|".getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
