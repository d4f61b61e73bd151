package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded per-group top-k as ONE aggregate: `topk_min_agg(rk, id, k)` →
  * `array<struct<rk:string, id:bigint>>` of the k smallest (rk, id)
  * pairs of the group, ascending — the rows
  * `row_number() OVER (PARTITION BY g ORDER BY rk, id) <= k` keeps
  * (for non-null keys; see semantics notes below).
  *
  * WHY an aggregate (q98): the window form SORTS every group's full
  * membership inside WindowExec just to keep k rows — at 100 TB a
  * stratified sampler would sort the whole corpus per language for a
  * 20-row sample. This buffer holds AT MOST k entries: map-side partials
  * discard non-qualifying rows before the shuffle (each task contributes
  * ≤ k entries per group it saw), partials merge by ordered union
  * trimmed to k (associative, order-independent), and nothing is ever
  * sorted but k-element buffers. Same count-window-vs-agg lesson as the
  * q81 rewrite, applied to ranking.
  *
  * Semantics:
  *  - keys order by UTF8String BINARY comparison — exactly the window's
  *    `ORDER BY rk` (Spark sorts strings by UTF-8 bytes); a
  *    java.lang.String ordering would diverge on supplementary-plane
  *    characters (UTF-16 surrogates invert the code-point order).
  *  - rows with a null rk or id are IGNORED, the SQL aggregate
  *    convention — a raw ASC window would instead rank NULLs first;
  *    coalesce the key upstream if those rows must participate.
  *  - ties are exact duplicates of the FULL (rk, id) pair, which a
  *    row_number formulation would rank arbitrarily — callers key id on
  *    a unique column (q98: doc_id), making the order total and the
  *    result identical to the window form.
  */
case class TopKMinAgg(
    first: Expression, second: Expression, third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.TreeSet[(UTF8String, Long)]]
  with TernaryLike[Expression] {

  import TopKMinAgg.entryOrd

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, LongType, IntegerType) if third.foldable =>
        if (k > 0) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0, got $k")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, bigint, literal int), got ($a, $b, $c)")
    }

  private lazy val k: Int = third.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("rk", StringType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_min_agg"

  override def createAggregationBuffer(): scala.collection.mutable.TreeSet[(UTF8String, Long)] =
    scala.collection.mutable.TreeSet.empty[(UTF8String, Long)](entryOrd)

  override def update(buf: scala.collection.mutable.TreeSet[(UTF8String, Long)],
                      input: InternalRow): scala.collection.mutable.TreeSet[(UTF8String, Long)] = {
    val rk = first.eval(input)
    val id = second.eval(input)
    if (rk != null && id != null) {
      val u = rk.asInstanceOf[UTF8String]
      val idv = id.asInstanceOf[Long]
      // clone() only on insertion: an UnsafeRow-backed UTF8String is a
      // view over a buffer the next row overwrites — stored keys must
      // own their bytes. The reject path (full buffer, key ≥ max)
      // compares against the view without allocating. add()'s boolean
      // guards the evict: a duplicate entry must not shrink the set.
      if (buf.size < k) buf.add((u.clone(), idv))
      else if (entryOrd.lt((u, idv), buf.last) && buf.add((u.clone(), idv)))
        buf.remove(buf.last)
    }
    buf
  }

  override def merge(a: scala.collection.mutable.TreeSet[(UTF8String, Long)],
                     b: scala.collection.mutable.TreeSet[(UTF8String, Long)]): scala.collection.mutable.TreeSet[(UTF8String, Long)] = {
    // entries in partials already own their bytes (cloned at update or
    // materialized by deserialize) — no re-copy here
    b.foreach { e =>
      if (a.size < k) a.add(e)
      else if (entryOrd.lt(e, a.last) && a.add(e)) a.remove(a.last)
    }
    a
  }

  override def eval(buf: scala.collection.mutable.TreeSet[(UTF8String, Long)]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    buf.foreach { case (rk, id) =>
      out(i) = InternalRow(rk, id)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: scala.collection.mutable.TreeSet[(UTF8String, Long)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (rk, id) =>
      val bytes = rk.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(id)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.TreeSet[(UTF8String, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val sb = new Array[Byte](len)
      in.readFully(sb)
      val id = in.readLong()
      buf += ((UTF8String.fromBytes(sb), id))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKMinAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TopKMinAgg {
  /** (key, id) order with UTF8String BINARY key comparison — identical
    * to the engine's `ORDER BY rk, id` on strings; java.lang.String's
    * UTF-16 order diverges past the basic multilingual plane.
    */
  private[functions] val entryOrd: Ordering[(UTF8String, Long)] =
    new Ordering[(UTF8String, Long)] {
      override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val c = a._1.compareTo(b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
}
