package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DataType
import org.apache.spark.util.LongAccumulator

/** Identity pass-through that bumps `acc` once per evaluated row — the
  * row-presence probe behind GraphOps.connectedComponents' fused
  * contraction-emptiness test (round-15).
  *
  * Why an Expression and not a Scala UDF: the probe rides the contraction
  * projection, and d13's round-1 contraction is the largest frame in the
  * suite — a Scala UDF there breaks whole-stage codegen and pays the
  * boxed-serialization boundary per row (measured: d13 +5-8% in the
  * round-15 A/B). This expression keeps codegen intact: the generated code
  * is the child's plus one `acc.add(1)` call on the referenced accumulator.
  *
  * Declared NON-deterministic so the optimizer can neither collapse,
  * duplicate, nor prune the call — the bump count only needs to be
  * nonzero-iff-rows-exist (recompute/retry inflation is fine), but an
  * optimizer-elided bump would misread a live frame as empty. */
case class RowTouch(child: Expression, acc: LongAccumulator)
    extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "row_touch"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    acc.add(1L)
    child.eval(input)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val accRef = ctx.addReferenceObj("rowTouchAcc", acc,
      classOf[LongAccumulator].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = childGen.code + code"\n$accRef.add(1L);",
      isNull = childGen.isNull,
      value = childGen.value)
  }

  override protected def withNewChildInternal(newChild: Expression): RowTouch =
    copy(child = newChild)
}

object RowTouch {
  /** Column API: `c`, unchanged, bumping `acc` once per evaluated row. */
  def touch(c: Column, acc: LongAccumulator): Column =
    ColumnBridge.column(RowTouch(ColumnBridge.expression(c), acc))
}
