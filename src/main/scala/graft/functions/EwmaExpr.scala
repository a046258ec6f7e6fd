package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Sequential integer EWMA over an hour series, as ONE linear JVM pass.
  *
  * Semantics (identical to the recursive-CTE oracle and to the former
  * `aggregate`/`array_append` HOF form):
  *   ew₀ = cnt₀·1000, prev₀ = ew₀;
  *   ewᵢ = (7·ewᵢ₋₁ + cntᵢ·1000) div 8, prevᵢ = ewᵢ₋₁
  * — all-integer milli-units, truncating division (counts are non-negative,
  * so Java `/`, Spark `div` and DuckDB `//` agree).
  *
  * Why native: the HOF accumulator `aggregate(xs, …, array_append(acc, …))`
  * copies the accumulated array on EVERY step — Θ(H²) element copies over a
  * spine of H hours. Hours grow with the corpus span, so the sf10 whale
  * measured the HOF form at 72.7× per data decade (w28 2.4 s → 175.5 s);
  * an EWMA is sequential by definition but LINEAR — one pass, one output
  * array. The series itself (hourly counts) is aggregate-bounded, so a
  * single-task fold is the right plan shape; only the fold's internal
  * quadratic was wrong.
  */
object EwmaSeq {
  /** (h, cnt) pairs (sorted by h) → (h, cnt, ew, prev) rows. */
  def ewmaF(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    val out = new Array[Any](n)
    var prevEw = 0L
    var i = 0
    while (i < n) {
      val row = xs.getStruct(i, 2)
      val h = row.getLong(0)
      val cnt = row.getLong(1)
      val scaled = cnt * 1000L
      val ew = if (i == 0) scaled else (7L * prevEw + scaled) / 8L
      val prev = if (i == 0) scaled else prevEw
      out(i) = new GenericInternalRow(Array[Any](h, cnt, ew, prev))
      prevEw = ew
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `ewma_seq(xs)` over array<struct<h,cnt>> → array<struct<h,cnt,ew,prev>>
  * (see [[EwmaSeq.ewmaF]]). */
case class EwmaSeqExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("ew", LongType, nullable = false),
    StructField("prev", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(xs: Any): Any =
    EwmaSeq.ewmaF(xs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xsT =>
      s"${ev.value} = graft.functions.EwmaSeq.ewmaF($xsT);")

  override protected def withNewChildInternal(newChild: Expression): EwmaSeqExpr =
    copy(child = newChild)
}

object EwmaExpr {
  def ewmaSeq(xs: Column): Column =
    ColumnBridge.column(EwmaSeqExpr(ColumnBridge.expression(xs)))
}
