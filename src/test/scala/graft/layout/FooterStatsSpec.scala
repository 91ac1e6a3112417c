package graft.layout

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.SparkSpec

/** Pins that [[MergeTable.footerBucketStats]] — the r20 footer-derived
  * stage stats — is BYTE-IDENTICAL to the r15 Spark-job
  * [[MergeTable.collectBucketStats]] across the eligible type matrix and
  * its edge values, and FALLS BACK (None) on every shape it cannot prove:
  * NaN float/double chunks, unsupported eligible types (decimal). The
  * manifest min/max strings are what bucket pruning trusts — a single
  * byte of drift here is wrong results, not slow results. */
class FooterStatsSpec extends SparkSpec {

  private val bc = MergeTable.BucketCol

  private def writeStage(df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("footer_stats").toString + "/stage"
    df.write.partitionBy(bc).parquet(dir)
    dir
  }

  private def assertIdentical(df: org.apache.spark.sql.DataFrame,
                              schema: StructType): Unit = {
    val dir = writeStage(df)
    val foot = MergeTable.footerBucketStats(spark, dir, schema)
    assert(foot.isDefined, "footer path must support this stage")
    val job = MergeTable.collectBucketStats(spark, dir, schema)
    assert(foot.get.counts === job.counts, "row counts")
    assert(foot.get.nulls === job.nulls, "null counts")
    assert(foot.get.stats === job.stats, "min/max strings (byte-identical)")
  }

  test("numeric + string + date edge matrix: footer == job, byte for byte") {
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("s", ShortType), StructField("b", ByteType),
      StructField("f", FloatType), StructField("d", DoubleType),
      StructField("str", StringType), StructField("dt", DateType)))
    val rows = Seq(
      Row(Int.MinValue, Long.MinValue, Short.MinValue, Byte.MinValue,
        Float.MinPositiveValue, -123.5d, "",
        java.sql.Date.valueOf("1969-12-31")),
      Row(Int.MaxValue, Long.MaxValue, Short.MaxValue, Byte.MaxValue,
        Float.NegativeInfinity, Double.PositiveInfinity, "Zебra é中",
        java.sql.Date.valueOf("2999-01-02")),
      Row(0, 0L, 0.toShort, 0.toByte, -1.5f, 1e-7d, "a" * 120,
        java.sql.Date.valueOf("2020-02-29")),
      Row(null, null, null, null, null, null, null, null),
      Row(7, -7L, 7.toShort, (-7).toByte, 2.25f, 12345.6789d, "mixed case",
        java.sql.Date.valueOf("2020-03-01")))
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .withColumn(bc, pmod(coalesce(col("i"), lit(3)), lit(4)).cast("int"))
    assertIdentical(df, schema)
  }

  test("timestamps: INT96 files (the session default) fall back; TIMESTAMP_MICROS files decode byte-identically") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("ts", TimestampType)))
    val rows = Seq(
      Row(1L, java.sql.Timestamp.valueOf("1970-01-01 00:00:00")),
      Row(2L, java.sql.Timestamp.valueOf("2031-03-01 23:59:59.000001")),
      Row(3L, java.sql.Timestamp.valueOf("2020-02-29 12:00:00.5")),
      Row(4L, null))
    def df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .withColumn(bc, pmod(col("k"), lit(2)).cast("int"))
    // default writer (INT96): no trustworthy footer stats -> None
    assert(MergeTable.footerBucketStats(spark, writeStage(df), schema).isEmpty,
      "INT96 timestamps must fall back to the job")
    // micros writer: decode + session-zone Cast == the job, byte for byte
    val key = "spark.sql.parquet.outputTimestampType"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try assertIdentical(df, schema)
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("a ±0.0 float/double BOUND falls back (parquet normalizes zero bounds outward, PARQUET-1222)") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("d", DoubleType)))
    val rows = Seq(Row(1L, 0.0d), Row(2L, 5.5d))
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .withColumn(bc, lit(0))
    assert(MergeTable.footerBucketStats(spark, writeStage(df), schema).isEmpty,
      "a zero min bound is ambiguous (-0.0 normalization) and must refuse")
  }

  test("all-null column and all-null-in-one-bucket carry no min/max, exact null counts") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("allnull", StringType)))
    val rows = (0L until 40L).map { i =>
      Row(i, if (i % 2 == 0 || i < 10) null else s"v$i",
        null.asInstanceOf[String])
    }
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .withColumn(bc, pmod(col("k"), lit(4)).cast("int"))
    assertIdentical(df, schema)
  }

  test("NaN in a float/double chunk forces the job fallback (parquet's NaN fold disagrees with Spark's NaN-is-greatest)") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("d", DoubleType)))
    val rows = Seq(Row(1L, 1.0), Row(2L, Double.NaN), Row(3L, 99.0))
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .withColumn(bc, lit(0))
    val dir = writeStage(df)
    val foot = MergeTable.footerBucketStats(spark, dir, schema)
    // either parquet dropped the stats or we detected the NaN — both must
    // refuse; stageStats then serves the job's answer
    assert(foot.isEmpty, s"NaN chunk must fall back, got $foot")
  }

  test("an unsupported eligible type (decimal) refuses the footer path whole") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("m", DecimalType(10, 2))))
    val rows = Seq(Row(1L, BigDecimal("12.34").bigDecimal),
      Row(2L, BigDecimal("-0.01").bigDecimal))
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .withColumn(bc, lit(0))
    val dir = writeStage(df)
    assert(MergeTable.footerBucketStats(spark, dir, schema).isEmpty)
  }

  test("multi-file buckets fold min/max across footers with the writer's order") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("d", DoubleType)))
    val dir = Files.createTempDirectory("footer_stats_mf").toString + "/stage"
    // two separate writes into the same bucket dirs = two files per bucket
    def part(rows: Seq[Row]): Unit = {
      val df = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), schema)
        .withColumn(bc, pmod(col("k"), lit(2)).cast("int"))
      df.write.partitionBy(bc).mode("append").parquet(dir)
    }
    part(Seq(Row(0L, "mmm", 1.0), Row(1L, "zzz", -5.0)))
    part(Seq(Row(2L, "aaa", 0.25), Row(3L, "yyy", 7.25)))
    val foot = MergeTable.footerBucketStats(spark, dir, schema)
    assert(foot.isDefined)
    val job = MergeTable.collectBucketStats(spark, dir, schema)
    assert(foot.get.stats === job.stats)
    assert(foot.get.counts === job.counts)
    assert(foot.get.nulls === job.nulls)
  }
}
