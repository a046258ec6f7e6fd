package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
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

  /** Sorted-fold squared L2 distance between an embedding slice and a
    * centroid: tᵢ = (emb[start+i] − center[i])², the tᵢ sorted ascending,
    * then summed left-to-right from +0.0 — bit-identical to the row-layout
    * `ssum((v−cv)²)` group fold (collect_list → sort_array → vecSeqSumD)
    * and to DuckDB `list_sum(list_sort(list((r.v−c.cv)*(r.v−c.cv))))`:
    * same multiset of IEEE doubles, same ascending order (squares are
    * non-negative, so the −0.0/NaN ordering corners never arise), same
    * sequential sum. `start` slices a PQ subspace out of the full vector
    * (0 for whole-vector distance).
    *
    * Why this exists: the relational (vec,dim,v)⋈(cid,dim,cv) group-fold
    * evaluates rows×k intermediate rows through a boxed TypedImperative
    * Collect — measured 46–62× per data decade on the sf10 whale (v5
    * 25 s → 1556 s). One native call per (vector, centroid) does the same
    * arithmetic at k×dim fewer aggregate updates and keeps whole-stage
    * codegen intact. */
  def sortedSqDiffSumF(emb: ArrayData, center: ArrayData, start: Int): Double = {
    val n = center.numElements()
    val t = new Array[Double](n)
    var i = 0
    while (i < n) {
      val d = emb.getFloat(start + i).toDouble - center.getDouble(i)
      t(i) = d * d
      i += 1
    }
    java.util.Arrays.sort(t)
    var acc = 0.0
    var j = 0
    while (j < n) { acc += t(j); j += 1 }
    acc
  }

  /** Multi-table LSH band keys ("t:bucket" strings) in ONE pass: the
    * [[hyperplaneDotsF]] projections and the per-table sign-bit packing of
    * VectorFunctions.lshBandKeysVec, fused. Why a single call instead of the
    * dots-column + derived-keys composition: CollapseProject re-inlines the
    * dots array into every one of the tables×width element_at references,
    * the fused expression overflows Janino's 64 KB ceiling, and the
    * interpreted fallback has no subexpression elimination — at the sf10
    * whale corpus (200k × 165 planes) that recomputed the projection array
    * ~165× per row per consumer (one task measured at 858 s of pure
    * hyperplaneDotsF). Identical arithmetic and string shape: sign test
    * `> 0.0` on the same left-to-right double dots, bucket = Σ 1<<p, key
    * "t:bucket" — MultiTableLshSpec pins equality against the HOF form. */
  def lshBandKeysF(emb: ArrayData, tables: Int, planesPerTable: Int): ArrayData = {
    val dots = hyperplaneDotsF(emb, tables * planesPerTable)
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var p = 0
      while (p < planesPerTable) {
        if (dots(t * planesPerTable + p) > 0.0) bucket |= (1 << p)
        p += 1
      }
      out(t) = org.apache.spark.unsafe.types.UTF8String.fromString(
        t.toString + ":" + bucket.toString)
      t += 1
    }
    new GenericArrayData(out)
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

/** `vec_sorted_sqdiff_sum(emb, center, start)` → double: sorted-fold
  * squared L2 between emb[start, start+len(center)) and center (see
  * VectorMath.sortedSqDiffSumF). */
case class VecSortedSqDiffSum(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(emb: Any, center: Any, start: Any): Any =
    VectorMath.sortedSqDiffSumF(emb.asInstanceOf[ArrayData],
      center.asInstanceOf[ArrayData], start.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (embT, cT, sT) =>
      s"${ev.value} = graft.functions.VectorMath.sortedSqDiffSumF($embT, $cT, $sT);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): VecSortedSqDiffSum =
    copy(first = f, second = s, third = t)
}

/** `vec_lsh_band_keys(emb)` → array<string> of "t:bucket" LSH band keys
  * (see VectorMath.lshBandKeysF for why this is one fused expression). */
case class VecLshBandKeys(child: Expression, tables: Int, planesPerTable: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(emb: Any): Any =
    VectorMath.lshBandKeysF(emb.asInstanceOf[ArrayData], tables, planesPerTable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, embT =>
      s"""${ev.value} = graft.functions.VectorMath.lshBandKeysF(
         |  $embT, $tables, $planesPerTable);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): VecLshBandKeys =
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

  /** Fused multi-table LSH band keys (projections + sign packing in one
    * codegen'd call — see VectorMath.lshBandKeysF). */
  def vecLshBandKeys(emb: Column, tables: Int, planesPerTable: Int): Column =
    ColumnBridge.column(
      VecLshBandKeys(ColumnBridge.expression(emb), tables, planesPerTable))

  /** Sorted-fold squared L2 of emb[start ..) vs a centroid array (see
    * VectorMath.sortedSqDiffSumF). */
  def vecSortedSqDiffSum(emb: Column, center: Column, start: Column): Column =
    ColumnBridge.column(VecSortedSqDiffSum(ColumnBridge.expression(emb),
      ColumnBridge.expression(center), ColumnBridge.expression(start)))

  /** Sequential sum of an array<double> column (see VectorMath.seqSumD). */
  def vecSeqSumD(a: Column): Column =
    ColumnBridge.column(VecSeqSumD(ColumnBridge.expression(a)))
}
