package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 3-word shingle generator: `text_shingles(text)` →
  * `array<string>` of all consecutive 3-word windows, words delimited by
  * single spaces (exactly `split(text, ' ')` semantics — consecutive
  * spaces yield empty words, matching DuckDB's `string_split`).
  *
  * WHY a custom expression: the declarative form —
  * `transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], …))` —
  * is a higher-order function, which Spark always evaluates INTERPRETED
  * (HOF lambdas have no codegen). That puts per-word interpreted `eval`
  * calls on the hottest path of every dedup query, and in a long-lived
  * JVM the megamorphic dispatch degrades further. This expression runs
  * the whole scan-and-slice in one compiled pass: one byte scan to find
  * the space positions, then each shingle is a zero-copy byte-range
  * slice of the original string (joining space-split words with spaces
  * reconstructs the original substring — no concatenation needed).
  */
case class TextShingles(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "text_shingles"

  override def nullSafeEval(input: Any): Any =
    TextShingles.shingles3(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextShingles.shingles3($c);")

  override protected def withNewChildInternal(newChild: Expression): TextShingles =
    copy(child = newChild)
}

/** Native unordered-pair expansion: `array_pairs(xs)` over a SORTED
  * `array<bigint>` → `array<struct<a:bigint, b:bigint>>` of all a<b
  * element pairs — the candidate-pair generator after a groupBy-collect
  * (q81). The declarative nested-transform/slice/flatten form is a
  * higher-order function (always interpreted); this runs the k(k-1)/2
  * expansion compiled. Callers bound k (stop-shingle DF cap) — the
  * expansion is quadratic by definition and MUST be capped upstream.
  */
case class ArrayPairs(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "array_pairs"

  override def nullSafeEval(input: Any): Any =
    ArrayPairs.pairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ArrayPairs.pairs($c);")

  override protected def withNewChildInternal(newChild: Expression): ArrayPairs =
    copy(child = newChild)
}

object ArrayPairs {
  def pairs(xs: ArrayData): ArrayData = {
    val k = xs.numElements()
    val out = new Array[Any](k * (k - 1) / 2)
    var idx = 0
    var i = 0
    while (i < k) {
      val a = xs.getLong(i)
      var j = i + 1
      while (j < k) {
        out(idx) = org.apache.spark.sql.catalyst.InternalRow(a, xs.getLong(j))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

object TextShingles {
  /** One compiled pass: space positions → shingle byte ranges. Safe on
    * UTF-8 bytes (0x20 never occurs inside a multi-byte sequence).
    */
  def shingles3(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var spaces = 0
    var i = 0
    while (i < n) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val words = spaces + 1
    if (words < 3) return new GenericArrayData(Array.empty[Any])
    // starts(k) = byte offset where word k begins
    val starts = new Array[Int](words)
    starts(0) = 0
    var w = 1
    i = 0
    while (i < n) { if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }; i += 1 }
    val out = new Array[Any](words - 2)
    var k = 0
    while (k < words - 2) {
      val from = starts(k)
      val until = if (k + 3 < words) starts(k + 3) - 1 else n
      out(k) = UTF8String.fromBytes(bytes, from, until - from)
      k += 1
    }
    new GenericArrayData(out)
  }
}
