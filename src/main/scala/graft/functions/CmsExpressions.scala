package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min point query as an expression: `cms_estimate(sketch, item)` →
  * the sketch's frequency estimate (bigint) for a string item. The
  * sketch argument must be a CONSTANT (foldable binary — the serialized
  * `org.apache.spark.util.sketch.CountMinSketch`), mirroring the
  * broadcast-bloom pattern of `bloom_contains64`: build the KB-sized
  * sketch in one narrow-shuffle aggregation pass, collect it driver-side
  * like a broadcast dim, then prune MAP-SIDE with this predicate — the
  * data being filtered never reshuffles to learn its own frequencies.
  *
  * The estimate carries the one-sided CM guarantee (never below the true
  * count, above by ≤ eps·N with probability ≥ confidence), so
  * `cms_estimate(s, g) <= maxDf` keeps ONLY items truly at or under
  * maxDf — the safe direction for stop-gram caps, where a hot gram
  * slipping through would blow up pair expansion but an over-dropped
  * cold gram only costs a sliver of recall
  * (see [[graft.ops.Extensions.capJaccardPairsSketch]]).
  *
  * Item hashing: CountMinSketch hashes a String and its UTF-8 bytes
  * identically (both Murmur3 over the bytes), so querying with the
  * UTF8String's bytes matches items added via either add(String) or
  * addBinary — no per-row String materialization.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) if left.foldable =>
        // reject a null constant at ANALYSIS: codegen forces the lazy
        // sketch (addReferenceObj), which would otherwise NPE inside an
        // executor with no hint of the cause
        if (left.eval() == null) TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a non-null constant sketch")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (constant binary sketch, string), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  // deserialized ONCE per task from the folded literal, not per row
  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(
      left.eval().asInstanceOf[Array[Byte]]))

  override def nullSafeEval(s: Any, item: Any): Any =
    sketch.estimateCount(item.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsSketch", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (_, item) =>
      s"${ev.value} = $ref.estimateCount($item.getBytes());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
