package graft.layout

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Morton-curve layout: bit-interleave correctness (Column math vs the
  * driver-side mirror), box -> z-prefix planning, and the end-to-end
  * pruning claim — a 2-D box reads only the covering partition dirs. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("Column zvalue matches the driver-side mirror over the full 8-bit domain") {
    val cells = for { x <- 0 until 16; y <- 0 until 16 } yield (x, y)
    val got = cells.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    cells.foreach { case (x, y) =>
      assert(got((x, y)) === ZOrder.zvalueScala(x, y))
    }
    // interleave structure: z of (x,0) spreads x's bits to even positions
    assert(ZOrder.zvalueScala(0xF, 0) === 0x55L)
    assert(ZOrder.zvalueScala(0, 0xF) === 0xAAL)
    // distinct and dense over the domain
    assert(got.values.toSeq.distinct.size === 256)
    assert(got.values.max === 255L)
  }

  test("a box maps to the expected z-prefix blocks") {
    // x in [4,7] pins the x-high-quarter to 1; y in [2,9] spans y-high
    // quarters 0..2 -> exactly 3 of the 16 prefixes survive
    val p = ZOrder.zPrefixesForBox(4, 7, 2, 9)
    assert(p.size === 3)
    assert(p === p.sorted)
    // full-domain box needs every prefix
    assert(ZOrder.zPrefixesForBox(0, 15, 0, 15).size === 16)
    // a single cell needs exactly one
    assert(ZOrder.zPrefixesForBox(3, 3, 5, 5).size === 1)
  }

  test("box query over the z-layout prunes to the covering dirs and is exact") {
    val dir = Files.createTempDirectory("zorder").toString + "/z"
    // a 64x64 grid of points, one per (x,y) in a 16x16 cell space scaled 4x
    val pts = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y, x * 64 + y)))
    val df = pts.toDF("px", "py", "v")
      .withColumn("cx", expr("int(px div 4)"))
      .withColumn("cy", expr("int(py div 4)"))
    ZOrder.writeZOrdered(df, dir, col("cx"), col("cy"))
    val prefixes = ZOrder.zPrefixesForBox(4, 7, 2, 9)
    val q = spark.read.parquet(dir)
      .filter(col("z_prefix").isin(prefixes: _*))
      .filter(col("cx").between(4, 7) && col("cy").between(2, 9))
    val rows = q.collect()
    // exactness: the layout + prefix filter loses nothing vs the raw box
    assert(rows.length === pts.count { case (x, y, _) =>
      x / 4 >= 4 && x / 4 <= 7 && y / 4 >= 2 && y / 4 <= 9 })
    // pruning: the scan carries a PartitionFilters on z_prefix and reads
    // only the 3 covering dirs' files
    val plan = q.queryExecution.executedPlan
    val scan = (plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).collectLeaves().collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "z_prefix")))
    val coveringFiles = prefixes.map(p =>
      DataLayout.fileStats(spark, s"$dir/z_prefix=$p")._1).sum
    val allFiles = DataLayout.fileStats(spark, dir)._1
    assert(scan.metrics("numFiles").value === coveringFiles)
    assert(coveringFiles < allFiles)
  }
}
