package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: one linear sort key that preserves
  * locality in TWO dimensions at once, so a 2-D box predicate prunes
  * partition directories AND parquet row groups on both columns
  * simultaneously — the multi-column data-skipping layout every lakehouse
  * table format ships (Delta/Iceberg `OPTIMIZE ZORDER BY`), built here
  * from Spark built-ins only.
  *
  * Mechanics: each dimension is binned into a 4-bit cell (16 buckets, via
  * layout-time max stats), the two cell ids are bit-interleaved into an
  * 8-bit z value (x bits at even positions, y at odd), and the table is
  * written hive-partitioned by `z >> 4` (16 directories, each a 4×4 block
  * of cells) and sorted by `z` within files. Query-side, a box becomes a
  * small set of z-prefixes enumerated on the driver ([[zPrefixesForBox]] —
  * O(cells-in-box), trivial at this granularity) -> `IN` partition filter,
  * with the exact box predicate left as the residual filter.
  *
  * Why a linear-scan engine can't do this: sorting by (x, y) clusters x
  * but scatters y; the Morton curve bounds the scatter of BOTH to the
  * block diagonal. At 100 TB the bucket count rises (more bits per dim),
  * the mechanics are identical, and the prefix enumeration stays driver-
  * cheap because it is logarithmic in the curve resolution per box edge.
  *
  * All bit math is codegen'd built-ins (shiftleft/and/or) — no UDF.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` so bit i lands at bit 2i (the classic
    * mask-shift chain, Hacker's Delight §7-2 "bit interleaving"). */
  def spreadBits(v: Column): Column = {
    val a = v.cast("long").bitwiseAND(lit(0xFFFFL))
    val b = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00FF00FFL))
    val c = (b.bitwiseOR(shiftleft(b, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val d = (c.bitwiseOR(shiftleft(c, 2))).bitwiseAND(lit(0x33333333L))
    (d.bitwiseOR(shiftleft(d, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton z-value of two non-negative cell ids (x even bits, y odd). */
  def zvalue(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** Driver-side mirror of [[spreadBits]] for planning and tests. */
  def spreadBitsScala(v: Int): Long = {
    var a = v.toLong & 0xFFFFL
    a = (a | (a << 8)) & 0x00FF00FFL
    a = (a | (a << 4)) & 0x0F0F0F0FL
    a = (a | (a << 2)) & 0x33333333L
    (a | (a << 1)) & 0x55555555L
  }

  def zvalueScala(x: Int, y: Int): Long =
    spreadBitsScala(x) | (spreadBitsScala(y) << 1)

  /** The distinct `z >> prefixShift` values covering the inclusive cell
    * box — the partition directories a box query must read. Enumerates
    * cells (fine at layout granularity; a production range-decomposer
    * walks the curve instead, same output). */
  def zPrefixesForBox(xMin: Int, xMax: Int, yMin: Int, yMax: Int,
                      prefixShift: Int = 4): Seq[Long] =
    (for { x <- xMin to xMax; y <- yMin to yMax }
      yield zvalueScala(x, y) >> prefixShift).distinct.sorted

  /** Write `df` z-ordered on the two int cell columns `cx`/`cy` (already
    * binned 0..15): adds `z`, hive-partitions by `z_prefix = z >> 4`,
    * sorts files by `z`. The source cell columns stay in the data for the
    * residual predicate. */
  def writeZOrdered(df: DataFrame, outDir: String,
                    cx: Column, cy: Column): Unit =
    DataLayout.writePartitionedSorted(
      df.withColumn("z", zvalue(cx, cy))
        .withColumn("z_prefix", shiftright(col("z"), 4)),
      outDir, Seq("z_prefix"), Seq("z"))
}
