package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Data-layout operators: Z-order (Morton) interleaving for multi-dimensional
 * clustering — the OPTIMIZE ZORDER BY primitive of lakehouse table formats.
 *
 * Why it matters at 100 TB: min/max file statistics prune scans only when
 * values are clustered. Sorting by one column clusters that column alone; a
 * Z-order key interleaves the bits of several columns so files stay
 * range-bounded in ALL of them, and a predicate on any participating column
 * skips most files. The operator itself is a pure projection (no shuffle —
 * the engine's existing repartition/sort-within-partitions does the actual
 * placement), so it composes with any write path.
 */
object Layout {

  /**
   * Morton interleave of the low `bits` bits of `a` and `b` (both
   * non-negative longs; higher bits are ignored — callers mask or scale
   * into range). Bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
   * Pure bit arithmetic — whole-stage codegen, engine-reproducible.
   */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }
}
