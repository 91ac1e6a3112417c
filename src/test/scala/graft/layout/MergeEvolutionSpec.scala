package graft.layout

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}
import graft.SparkSpec

/** Metadata-only schema evolution: drop / rename / widen commits move NO
  * data — asserted at the FILE level (no vN data dir appears, old bucket
  * files bit-for-bit untouched) and at the semantic level (reads,
  * merges-after-evolution, time travel, and the no-resurrection rule on
  * re-added names). */
class MergeEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(tag: String): String = {
    val dir = Files.createTempDirectory(s"evo_$tag").toString + "/t"
    MergeTable.merge(spark, dir,
      Seq((1L, 10, "a", BigDecimal("1.50")), (2L, 20, "b", BigDecimal("2.50")))
        .toDF("k", "n", "s", "d")
        .select(col("k"), col("n").cast("int"), col("s"),
          col("d").cast(DecimalType(4, 2)))
        .withColumn("op_flag", lit("create")),
      "k", numBuckets = 4)
    dir
  }

  private def dataFiles(dir: String): Seq[(String, java.nio.file.attribute.FileTime)] =
    Files.walk(java.nio.file.Paths.get(dir)).toArray.toSeq
      .map(_.toString).filter(_.endsWith(".parquet")).sorted
      .map(p => p -> Files.getLastModifiedTime(java.nio.file.Paths.get(p)))

  test("drop is metadata-only; the dropped column is gone from reads but time travel keeps it") {
    val dir = newTable("drop")
    val before = dataFiles(dir)
    val v = MergeTable.alterDropColumn(dir, "s")
    assert(v === 1L)
    assert(dataFiles(dir) === before, "an evolution commit must move no data")
    assert(MergeTable.read(spark, dir).columns.toSeq === Seq("k", "n", "d"))
    // pre-drop snapshot still carries the column with its values
    assert(MergeTable.readAt(spark, dir, 0).select("k", "s")
      .as[(Long, String)].collect().toSet === Set(1L -> "a", 2L -> "b"))
    // the key cannot be dropped
    intercept[IllegalArgumentException] { MergeTable.alterDropColumn(dir, "k") }
  }

  test("re-adding a dropped name null-fills history — dropped values never resurrect") {
    val dir = newTable("readd")
    MergeTable.alterDropColumn(dir, "s")
    // a later batch re-introduces 's' for key 1 only (add-column evolution)
    MergeTable.merge(spark, dir,
      Seq((1L, 11, BigDecimal("1.50"), "NEW")).toDF("k", "n", "d", "s")
        .select(col("k"), col("n").cast("int"),
          col("d").cast(DecimalType(4, 2)), col("s"))
        .withColumn("op_flag", lit("update")),
      "k")
    val got = MergeTable.read(spark, dir).select("k", "s")
      .as[(Long, Option[String])].collect().toMap
    assert(got === Map(1L -> Some("NEW"), 2L -> None),
      "key 2's pre-drop 'b' must NOT come back under the re-added name")
  }

  test("rename is metadata-only; reads, merges, and the key itself survive a rename") {
    val dir = newTable("rename")
    val before = dataFiles(dir)
    MergeTable.alterRenameColumn(dir, "n", "amount")
    assert(dataFiles(dir) === before)
    assert(MergeTable.read(spark, dir).columns.toSeq === Seq("k", "amount", "s", "d"))
    assert(MergeTable.read(spark, dir).select("k", "amount")
      .as[(Long, Int)].collect().toSet === Set(1L -> 10, 2L -> 20))
    // merge after the rename uses the NEW name; old buckets still read
    MergeTable.merge(spark, dir,
      Seq((3L, 30, "c", BigDecimal("3.50"))).toDF("k", "amount", "s", "d")
        .select(col("k"), col("amount").cast("int"), col("s"),
          col("d").cast(DecimalType(4, 2)))
        .withColumn("op_flag", lit("create")),
      "k")
    assert(MergeTable.read(spark, dir).select("k", "amount")
      .as[(Long, Int)].collect().toSet ===
      Set(1L -> 10, 2L -> 20, 3L -> 30))
    // renaming the KEY: allowed, values unchanged, merges use the new name
    MergeTable.alterRenameColumn(dir, "k", "id")
    MergeTable.merge(spark, dir,
      Seq((4L, 40, "e", BigDecimal("4.50"))).toDF("id", "amount", "s", "d")
        .select(col("id"), col("amount").cast("int"), col("s"),
          col("d").cast(DecimalType(4, 2)))
        .withColumn("op_flag", lit("create")),
      "id")
    assert(MergeTable.read(spark, dir).select("id").as[Long].collect().toSet
      === Set(1L, 2L, 3L, 4L))
    // rename onto an existing name is rejected
    intercept[IllegalArgumentException] {
      MergeTable.alterRenameColumn(dir, "s", "amount")
    }
  }

  test("widen int->long and decimal precision are metadata-only; mixed-schema buckets read consistently") {
    val dir = newTable("widen")
    val before = dataFiles(dir)
    MergeTable.alterWidenColumn(dir, "n", LongType)
    MergeTable.alterWidenColumn(dir, "d", DecimalType(10, 2))
    assert(dataFiles(dir) === before, "widening must move no data")
    // reads up-cast old buckets in the plan
    val r = MergeTable.read(spark, dir)
    assert(r.schema("n").dataType === LongType)
    assert(r.schema("d").dataType === DecimalType(10, 2))
    // a post-widen merge writes values only the wide type can hold, into a
    // NEW bucket file; both physical shapes then union under one schema
    MergeTable.merge(spark, dir,
      Seq((9L, 5000000000L, "w", BigDecimal("12345678.25")))
        .toDF("k", "n", "s", "d")
        .select(col("k"), col("n"), col("s"), col("d").cast(DecimalType(10, 2)))
        .withColumn("op_flag", lit("create")),
      "k")
    assert(MergeTable.read(spark, dir).select("k", "n")
      .as[(Long, Long)].collect().toSet ===
      Set(1L -> 10L, 2L -> 20L, 9L -> 5000000000L))
    assert(MergeTable.read(spark, dir).filter(col("k") === 9L)
      .select(col("d").cast(StringType)).as[String].head() === "12345678.25")
    // narrowing and key-widening are rejected
    intercept[IllegalArgumentException] {
      MergeTable.alterWidenColumn(dir, "n", org.apache.spark.sql.types.IntegerType)
    }
    intercept[IllegalArgumentException] {
      MergeTable.alterWidenColumn(dir, "k", DoubleType)
    }
  }

  test("evolution composes with compact and CDC; compact folds the physical schemas back to one") {
    val dir = newTable("compose")
    MergeTable.alterRenameColumn(dir, "n", "amount")
    MergeTable.alterWidenColumn(dir, "amount", LongType)
    MergeTable.alterDropColumn(dir, "d")
    MergeTable.merge(spark, dir,
      Seq((2L, 21L, "B"), (3L, 30L, "c")).toDF("k", "amount", "s")
        .withColumn("op_flag", lit("update")), "k")
    val afterOps = MergeTable.read(spark, dir)
      .select("k", "amount", "s").as[(Long, Long, String)].collect().toSet
    assert(afterOps === Set((1L, 10L, "a"), (2L, 21L, "B"), (3L, 30L, "c")))
    // CDC across the evolution boundary classifies by the NEW schema
    val cdc = MergeTable.changesBetween(spark, dir, 0, 4)
      .select(col("op_flag"), col("k"), col("amount"))
      .as[(String, Long, Long)].collect().toSet
    assert(cdc === Set(("update", 2L, 21L), ("insert", 3L, 30L)))
    // compact rewrites everything under the current schema and keeps results
    MergeTable.compact(spark, dir)
    assert(MergeTable.read(spark, dir)
      .select("k", "amount", "s").as[(Long, Long, String)].collect().toSet
      === afterOps)
    MergeTable.merge(spark, dir,
      Seq((4L, 40L, "d")).toDF("k", "amount", "s")
        .withColumn("op_flag", lit("create")), "k")
    assert(MergeTable.read(spark, dir).count() === 4)
  }
}
