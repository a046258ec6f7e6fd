package graft.spatial

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve over grid cells: interleaving the bits of the two
  * cell coordinates gives a 1-D sort key under which spatially-near cells
  * are usually file-near — the layout key for writing 100 TB of geo data so
  * bbox queries prune most files (range predicates on the z-key map to few
  * key ranges). Pure bit arithmetic, identical in any engine.
  */
object ZOrder {

  /** Interleave two `bits`-bit non-negative ints: x in even positions,
    * y in odd. Plan-time unrolled — codegen'd shifts/masks, no UDF. */
  def zIndex(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { b =>
      (shiftright(x, b) % 2) * lit(1L << (2 * b)) +
        (shiftright(y, b) % 2) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)

  /** The identical arithmetic as SQL text for DuckDB oracles. */
  def zIndexSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { b =>
      s"((($x) >> $b) & 1) * ${1L << (2 * b)} + ((($y) >> $b) & 1) * ${1L << (2 * b + 1)}"
    }.mkString("(", " + ", ")")
}
