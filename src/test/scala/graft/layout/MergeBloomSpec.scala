package graft.layout

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parquet bloom filters on designated columns (r16 file-level
  * point-lookup skipping): `alterSetParquetBloom` is a metadata commit;
  * every data rewrite then writes per-column blooms, which the
  * vectorized reader's pushed equality prunes row groups on — no
  * read-side engine code at all. This spec pins the footer-level claim
  * (blooms actually present after OPTIMIZE, absent before), answer
  * invariance, and the alter-op maintenance of the column list. */
class MergeBloomSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    graft.util.Cleanup.registerTempDir(
      Files.createTempDirectory(s"mbloom_$tag")).toString + "/t"

  /** Column paths with a bloom-filter offset recorded in any row group of
    * any data file under `dir` (recursive). */
  private def bloomedColumns(dir: String): Set[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(files)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    files(new java.io.File(dir)).flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala
        .filter(_.getBloomFilterOffset >= 0)
        .map(_.getPath.toDotString))
      finally r.close()
    }.toSet
  }

  private def table(tag: String): String = {
    val dir = freshDir(tag)
    val rows = (1L to 64L).map(id => (id, s"u$id", id * 2, "create"))
    MergeTable.merge(spark, dir,
      rows.toDF("id", "u", "v", "op_flag"), "id", numBuckets = 4)
    dir
  }

  test("OPTIMIZE after alterSetParquetBloom writes blooms for exactly the designated columns; answers unchanged") {
    val dir = table("basic")
    assert(bloomedColumns(dir) === Set.empty[String])
    MergeTable.alterSetParquetBloom(dir, Seq("u"), expectedNdv = 1000L)
    // metadata-only: nothing rewritten yet
    assert(bloomedColumns(dir) === Set.empty[String])
    MergeTable.compact(spark, dir)
    assert(bloomedColumns(dir) === Set("u"))
    // point lookup answers are the plain filter's
    assert(MergeTable.readWhere(spark, dir, col("u") === "u7")
      .select("id").as[Long].collect().toSeq === Seq(7L))
    assert(MergeTable.readWhere(spark, dir, col("u") === "nope").count() === 0L)
  }

  test("later merges keep writing blooms; disabling stops") {
    val dir = table("merge")
    MergeTable.alterSetParquetBloom(dir, Seq("u"))
    val v = MergeTable.merge(spark, dir,
      Seq((100L, "u100", 200L, "create")).toDF("id", "u", "v", "op_flag"),
      "id").get
    // the merge's own version dir carries blooms
    assert(bloomedColumns(s"$dir/v$v") === Set("u"))
    // ...and the designation SURVIVES that merge's manifest (r18 fix: the
    // merge commit used to rebuild the manifest without pqBloomCols, so
    // only the first merge after the alter wrote blooms)
    val vB = MergeTable.merge(spark, dir,
      Seq((102L, "u102", 204L, "create")).toDF("id", "u", "v", "op_flag"),
      "id").get
    assert(bloomedColumns(s"$dir/v$vB") === Set("u"))
    MergeTable.alterSetParquetBloom(dir, Nil)
    val v2 = MergeTable.merge(spark, dir,
      Seq((101L, "u101", 202L, "create")).toDF("id", "u", "v", "op_flag"),
      "id").get
    assert(bloomedColumns(s"$dir/v$v2") === Set.empty[String])
  }

  test("rename re-keys the bloom column; drop removes it; '#' names are rejected") {
    val dir = table("alter")
    MergeTable.alterSetParquetBloom(dir, Seq("u"))
    MergeTable.alterRenameColumn(dir, "u", "uid")
    MergeTable.compact(spark, dir)
    assert(bloomedColumns(dir).contains("uid"))
    intercept[IllegalArgumentException] {
      MergeTable.alterRenameColumn(dir, "uid", "u#x")
    }
    MergeTable.alterDropColumn(dir, "uid")
    val cv = MergeTable.compact(spark, dir)
    // older version dirs keep their historical blooms; the NEW rewrite
    // carries none for the dropped column
    assert(bloomedColumns(s"$dir/v$cv")
      .intersect(Set("u", "uid")) === Set.empty[String])
    intercept[IllegalArgumentException] {
      MergeTable.alterSetParquetBloom(dir, Seq("nope"))
    }
  }
}
