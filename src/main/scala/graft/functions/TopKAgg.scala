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
  *  - exact duplicates of the FULL (rk, id) pair carry a multiplicity
  *    count in the buffer, so a group containing duplicated input rows
  *    still returns k entries — identical rows to the row_number form,
  *    which ranks equal pairs arbitrarily but keeps the same multiset.
  *    (The first formulation deduped ties in a set, silently returning
  *    < k for duplicated inputs; q98 never hit it — doc_id is unique —
  *    but the aggregate must not depend on that.)
  */
case class TopKMinAgg(
    first: Expression, second: Expression, third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKMinAgg.Buf]
  with TernaryLike[Expression] {

  import TopKMinAgg.{Buf, entryOrd}

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

  override def createAggregationBuffer(): Buf = new Buf()

  /** Insert one occurrence of (u, id), keeping the buffer's total
    * multiplicity ≤ k. `owned = false` marks an UnsafeRow-backed
    * UTF8String — a view over a buffer the next row overwrites — which
    * is cloned ONLY if it becomes a new map key (the reject path and
    * the increment-existing path never allocate). TreeMap.put retains
    * the original key object on value replacement, so incrementing an
    * existing key's count never stores the view.
    */
  private def insert(buf: Buf, u: UTF8String, id: Long, owned: Boolean): Unit = {
    val key = (u, id)
    if (buf.total < k) {
      bump(buf, key, u, id, owned)
      buf.total += 1
    } else if (entryOrd.lt(key, buf.m.lastKey())) {
      bump(buf, key, u, id, owned)
      // evict ONE occurrence of the current maximum (which may be the
      // key just inserted's old last — never the inserted occurrence,
      // since key < lastKey held before the bump)
      val lk = buf.m.lastKey()
      val c = buf.m.get(lk)
      if (c == 1) buf.m.remove(lk) else buf.m.put(lk, c - 1)
    }
  }

  private def bump(buf: Buf, key: (UTF8String, Long), u: UTF8String,
                   id: Long, owned: Boolean): Unit = {
    val existing = buf.m.get(key)
    if (existing == null)
      buf.m.put((if (owned) u else u.clone(), id), 1)
    else buf.m.put(key, existing + 1)
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val rk = first.eval(input)
    val id = second.eval(input)
    if (rk != null && id != null)
      insert(buf, rk.asInstanceOf[UTF8String], id.asInstanceOf[Long], owned = false)
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    // entries in partials already own their bytes (cloned at update or
    // materialized by deserialize) — no re-copy here
    val it = b.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      var c = e.getValue.intValue()
      while (c > 0) {
        insert(a, e.getKey._1, e.getKey._2, owned = true)
        c -= 1
      }
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Any](buf.total)
    var i = 0
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      var c = e.getValue.intValue()
      while (c > 0) {
        out(i) = InternalRow(e.getKey._1, e.getKey._2)
        i += 1
        c -= 1
      }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.m.size)
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey._1.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getKey._2)
      out.writeInt(e.getValue.intValue())
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val sb = new Array[Byte](len)
      in.readFully(sb)
      val id = in.readLong()
      val c = in.readInt()
      buf.m.put((UTF8String.fromBytes(sb), id), c)
      buf.total += c
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

/** Bounded per-group "first k points by time" as ONE aggregate:
  * `earliest_k_agg(t, v, k)` → `array<struct<t_ms:bigint, value:double>>`
  * of the group's k smallest (t, v) pairs, ascending.
  *
  * WHY (serving layer, Grafana `/query` with a truncation limit): the
  * row_number window form shuffles EVERY matched row of the requested
  * range into one per-series sort just to keep maxDataPoints of them —
  * for a wide dashboard range over a dense series that is the whole
  * range's volume through one exchange. This buffer holds at most k
  * entries; map-side partials discard non-qualifying points before the
  * shuffle, so the exchange carries ≤ k points per series per task
  * regardless of the range width. Same window-to-bounded-agg lesson as
  * [[TopKMinAgg]] (q98), applied to time.
  *
  * Ties on t break by java.lang.Double.compare on v — a deterministic
  * total order (the window form's tiebreak was arbitrary), with -0.0 <
  * 0.0 and NaN greatest. Null t or v rows are ignored (the serving
  * layer filters null values upstream; the aggregate must not NPE if a
  * caller doesn't). Duplicate (t, v) pairs carry multiplicities so
  * duplicated input still yields exactly min(group size, k) points.
  */
case class EarliestKAgg(
    first: Expression, second: Expression, third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[EarliestKAgg.Buf]
  with TernaryLike[Expression] {

  import EarliestKAgg.Buf

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, DoubleType, IntegerType) if third.foldable =>
        if (k > 0) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0, got $k")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, double, literal int), got ($a, $b, $c)")
    }

  private lazy val k: Int = third.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("t_ms", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "earliest_k_agg"

  override def createAggregationBuffer(): Buf = new Buf()

  private def insert(buf: Buf, t: Long, v: Double): Unit = {
    val key = (t, v)
    if (buf.total < k) {
      bump(buf, key)
      buf.total += 1
    } else if (EarliestKAgg.entryOrd.lt(key, buf.m.lastKey())) {
      bump(buf, key)
      val lk = buf.m.lastKey()
      val c = buf.m.get(lk)
      if (c == 1) buf.m.remove(lk) else buf.m.put(lk, c - 1)
    }
  }

  private def bump(buf: Buf, key: (Long, Double)): Unit = {
    val existing = buf.m.get(key)
    if (existing == null) buf.m.put(key, 1) else buf.m.put(key, existing + 1)
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val t = first.eval(input)
    val v = second.eval(input)
    if (t != null && v != null)
      insert(buf, t.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val it = b.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      var c = e.getValue.intValue()
      while (c > 0) { insert(a, e.getKey._1, e.getKey._2); c -= 1 }
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Any](buf.total)
    var i = 0
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      var c = e.getValue.intValue()
      while (c > 0) { out(i) = InternalRow(e.getKey._1, e.getKey._2); i += 1; c -= 1 }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.m.size)
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey._1)
      out.writeDouble(e.getKey._2)
      out.writeInt(e.getValue.intValue())
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val t = in.readLong()
      val v = in.readDouble()
      val c = in.readInt()
      buf.m.put((t, v), c)
      buf.total += c
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): EarliestKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): EarliestKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): EarliestKAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object EarliestKAgg {
  /** (t, v) with Double.compare on the payload — total and deterministic
    * (the only asymmetries doubles have, -0.0/0.0 and NaN, are ordered).
    */
  private[functions] val entryOrd: Ordering[(Long, Double)] =
    new Ordering[(Long, Double)] {
      override def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else java.lang.Double.compare(a._2, b._2)
      }
    }

  final class Buf {
    val m = new java.util.TreeMap[(Long, Double), Integer](
      new java.util.Comparator[(Long, Double)] {
        override def compare(a: (Long, Double), b: (Long, Double)): Int =
          entryOrd.compare(a, b)
      })
    var total: Int = 0
  }
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

  /** Sorted (rk, id) → multiplicity map with the total count tracked
    * alongside (`total` = Σ counts ≤ k). Multiplicities are what make
    * duplicated input rows return exactly the window form's k rows
    * instead of a deduped short set.
    */
  final class Buf {
    val m = new java.util.TreeMap[(UTF8String, Long), Integer](
      new java.util.Comparator[(UTF8String, Long)] {
        override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int =
          entryOrd.compare(a, b)
      })
    var total: Int = 0
  }
}
