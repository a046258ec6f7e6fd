package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{array, coalesce}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingling as one JVM loop (same rationale as VectorMath: the
  * HOF form `transform(sequence(...), i => concat_ws(...))` evaluates an
  * interpreted lambda per shingle per row — measured as the dominant cost of
  * every shingle-family query's scan stage, which on a single input split
  * runs on one thread).
  *
  * Contract (bit-identical to `TextFunctions.shingles`): fewer than n tokens
  * → empty array; otherwise size−n+1 strings, each the n consecutive tokens
  * joined by single spaces with nulls skipped (concat_ws semantics). The
  * oracle SQL's list comprehension produces the same strings.
  */
object ShingleMath {

  private val Sep = UTF8String.fromString(" ")

  def wordShingles(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](sz - n + 1)
    var i = 0
    while (i <= sz - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `word_shingles(toks, n)` over an `array<string>` column → array<string>. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(toks: Any): Any =
    ShingleMath.wordShingles(toks.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toksT =>
      s"${ev.value} = graft.functions.ShingleMath.wordShingles($toksT, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object ShingleExpr {
  /** Column API, null-in → empty-out like the HOF form (whose `when` guard
    * turns a null token array into the empty-array branch). */
  def shinglesNative(toks: Column, n: Int): Column =
    coalesce(
      ColumnBridge.column(WordShingles(ColumnBridge.expression(toks), n)),
      array().cast("array<string>"))
}
