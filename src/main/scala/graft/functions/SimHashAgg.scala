package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SimHash as a single aggregate: `simhash_agg(md5_hex)` folds each
  * 32-char md5 hex string's FIRST 16 nibbles into a 64-slot ±1 vote
  * buffer and emits the 16-hex-char majority fingerprint.
  *
  * WHY an aggregate, not a row pipeline: the declarative formulation
  * (q86's original shape) explodes every token row into 16 (position,
  * nibble) rows before grouping — a 16× shuffle amplification of the
  * token stream, which is exactly the kind of constant-factor blow-up
  * that matters at 100 TB. This aggregate keeps the token stream at 1×:
  * map-side partial buffers (64 ints per group), merge by elementwise
  * add (order-independent — exact under any partitioning), one shuffle
  * of 256-byte buffers.
  *
  * Vote semantics match the oracle SQL bit-for-bit: per hex position
  * p∈[1,16], per bit b, vote +1 if the nibble has bit b set else -1;
  * final bit = (vote sum > 0).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string (md5 hex), got $t")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[UTF8String]
      val n = math.min(16, h.numChars())
      var p = 0
      while (p < n) {
        val c = h.getByte(p) // hex is ASCII; byte == char
        val nib =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else -1
        if (nib >= 0) {
          var b = 0
          while (b < 4) {
            buf(p * 4 + b) += (if (((nib >> b) & 1) == 1) 1 else -1)
            b += 1
          }
        }
        p += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    val out = new Array[Byte](16)
    var p = 0
    while (p < 16) {
      var nib = 0
      var b = 0
      while (b < 4) {
        if (buf(p * 4 + b) > 0) nib |= (1 << b)
        b += 1
      }
      out(p) = "0123456789abcdef".charAt(nib).toByte
      p += 1
    }
    UTF8String.fromBytes(out)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(256)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}
