package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Vector math over `array<float>` embedding columns as plain JVM loops,
  * shared by interpreted eval and generated code (same pattern as UtmMath).
  *
  * Why not SQL HOFs or unrolled expressions: `aggregate`/`zip_with`/
  * `transform` evaluate an interpreted lambda per element per row (measured
  * as the bulk of the ANN queries' scan time), while unrolled multiply-add
  * chains fused into a join pipeline overflow Janino's 64 KB method ceiling
  * and drop the whole stage to interpreted. A static method call keeps the
  * generated code one line and the loop JIT-compiled.
  *
  * FP contract (oracle determinism): accumulate left-to-right in double
  * starting from +0.0 — bit-identical to `aggregate(…, 0.0, _+_)` and to
  * DuckDB's `list_sum` over the same comprehension. Elements must be
  * non-null (the embeddings contract); float→double widening is exact.
  */
object VectorMath {

  /** Sequential Σ a(i)·b(i) in double precision over float arrays. */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def cosineF(a: ArrayData, b: ArrayData): Double =
    dotF(a, b) / (math.sqrt(dotF(a, a)) * math.sqrt(dotF(b, b)))

  /** Sequential left-to-right Σ over an array<double>, from +0.0 — bit-
    * identical to `aggregate(arr, 0.0, _+_)` and DuckDB `list_sum`, without
    * the interpreted per-element lambda (measured dominant in the LISA
    * permutation pass: one fold per (point, permutation) group). */
  def seqSumD(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i); i += 1 }
    acc
  }

  /** All `planes` deterministic-hyperplane projections of an embedding.
    * Coefficient for (plane j, dim i): integer-exact modular arithmetic,
    * then the same /1000.0 − 0.5 IEEE ops as the SQL oracle formula. */
  def hyperplaneDotsF(emb: ArrayData, planes: Int): Array[Double] = {
    val dim = emb.numElements()
    val out = new Array[Double](planes)
    var j = 0
    while (j < planes) {
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val c = ((j * 64L + i) * 2654435761L % 1000L) / 1000.0 - 0.5
        acc += emb.getFloat(i).toDouble * c
        i += 1
      }
      out(j) = acc
      j += 1
    }
    out
  }
}

/** `vec_cosine(a, b)` over two `array<float>` columns → double. */
case class VecCosine(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (aT, bT) =>
      s"${ev.value} = graft.functions.VectorMath.cosineF($aT, $bT);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}

/** `vec_hyperplane_dots(emb)` → array<double> of `planes` projections. */
case class VecHyperplaneDots(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(emb: Any): Any =
    new GenericArrayData(
      VectorMath.hyperplaneDotsF(emb.asInstanceOf[ArrayData], planes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, embT =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.VectorMath.hyperplaneDotsF($embT, $planes));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): VecHyperplaneDots =
    copy(child = newChild)
}

/** `vec_seq_sum(a)` over an `array<double>` column → double. */
case class VecSeqSumD(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    VectorMath.seqSumD(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, aT =>
      s"${ev.value} = graft.functions.VectorMath.seqSumD($aT);")

  override protected def withNewChildInternal(newChild: Expression): VecSeqSumD =
    copy(child = newChild)
}

object VectorExpr {
  /** Column API: codegen'd cosine over two float-array columns. */
  def vecCosine(a: Column, b: Column): Column =
    ColumnBridge.column(VecCosine(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vecHyperplaneDots(emb: Column, planes: Int): Column =
    ColumnBridge.column(VecHyperplaneDots(ColumnBridge.expression(emb), planes))

  /** Sequential sum of an array<double> column (see VectorMath.seqSumD). */
  def vecSeqSumD(a: Column): Column =
    ColumnBridge.column(VecSeqSumD(ColumnBridge.expression(a)))
}
