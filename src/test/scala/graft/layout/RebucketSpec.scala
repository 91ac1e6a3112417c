package graft.layout

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `OPTIMIZE t REBUCKET n` (r18, VERDICT r17 task 2): re-hash a grown
  * table to a new bucket count through the same CAS commit. Pinned:
  * read equality across grow/shrink, readForKeys under the NEW hash,
  * stats/counts/dicts re-derived, DVs and delta runs materialized,
  * time travel under each version's own bucket count, merges composing
  * after the resize, and the SQL verb. */
class RebucketSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    graft.util.Cleanup.registerTempDir(
      Files.createTempDirectory(s"rebkt_$tag")).toString + "/t"

  private def batch(rows: (Long, Long, String, String)*) =
    rows.toDF("id", "v", "tag", "op_flag")

  private val base = (1L to 200L).map(id => (id, id * 2, s"g${id % 4}", "create"))

  private def seeded(tag: String, buckets: Int = 4): String = {
    val dir = freshDir(tag)
    MergeTable.merge(spark, dir, base.toDF("id", "v", "tag", "op_flag"),
      "id", numBuckets = buckets)
    dir
  }

  private def rowsOf(dir: String): Set[(Long, Long, String)] =
    MergeTable.read(spark, dir).select("id", "v", "tag")
      .as[(Long, Long, String)].collect().toSet

  test("grow and shrink preserve content; counts/stats re-derive; new hash prunes") {
    val dir = seeded("grow", buckets = 4)
    val before = rowsOf(dir)
    MergeTable.rebucket(spark, dir, 16)
    assert(rowsOf(dir) === before)
    assert(MergeTable.tableNumBuckets(dir) === 16)
    assert(MergeTable.countRows(dir) === Some(200L))
    assert(MergeTable.scanGroups(dir) === 1)
    // readForKeys must prune under the NEW hash and still find every key
    // (it returns the keys' whole buckets by contract; callers filter)
    val pruned = MergeTable.readForKeys(spark, dir, Seq(7L, 42L).toDF("id"))
    assert(pruned.filter(col("id").isin(7L, 42L))
      .select("id").as[Long].collect().toSet === Set(7L, 42L))
    assert(pruned.count() < 200L, "pruned read must not scan the table")
    MergeTable.rebucket(spark, dir, 2)
    assert(rowsOf(dir) === before)
    assert(MergeTable.tableNumBuckets(dir) === 2)
    // stats re-derived at the new granularity: a selective readWhere is
    // still CORRECT (pruning is advisory, the filter answers)
    assert(MergeTable.readWhere(spark, dir, col("v") === 84L)
      .select("id").as[Long].collect().toSeq === Seq(42L))
  }

  test("deletion vectors and delta runs materialize through REBUCKET") {
    val dir = seeded("mor", buckets = 4)
    MergeTable.softDelete(spark, dir, col("id") === 5L)
    MergeTable.mergeSmall(spark, dir,
      batch((1L, 111L, "mor", "update"), (300L, 1L, "new", "create")), "id")
    val before = rowsOf(dir)
    assert(before.contains((1L, 111L, "mor")) && !before.exists(_._1 == 5L))
    MergeTable.rebucket(spark, dir, 8)
    assert(rowsOf(dir) === before)
    assert(MergeTable.countRows(dir) === Some(before.size.toLong),
      "runs must be materialized (exact counts return)")
    assert(MergeTable.scanGroups(dir) === 1)
  }

  test("time travel reads old versions under their own bucket count; merges compose after") {
    val dir = seeded("tt", buckets = 4)
    val v0 = MergeTable.currentVersion(dir).get
    val v1 = MergeTable.rebucket(spark, dir, 16)
    assert(MergeTable.readAt(spark, dir, v0).count() === 200L)
    assert(MergeTable.readAt(spark, dir, v1).count() === 200L)
    // a merge after the resize hashes into the NEW count
    MergeTable.merge(spark, dir, batch((1L, 999L, "post", "update")), "id")
    assert(rowsOf(dir).contains((1L, 999L, "post")))
    val bucketDirs = Option(new java.io.File(dir).listFiles()).get
      .filter(f => f.getName.matches("v\\d+")).flatMap(_.listFiles())
      .map(_.getName).filter(_.startsWith("__pk_bucket="))
      .map(_.stripPrefix("__pk_bucket=").toInt)
    assert(bucketDirs.forall(_ < 16))
  }

  test("SQL verb: OPTIMIZE t REBUCKET n") {
    val dir = seeded("sql", buckets = 4)
    graft.plans.MergeTableSql.register("rebkt_sql_t", dir)
    val v = spark.sql("OPTIMIZE rebkt_sql_t REBUCKET 32")
      .select("version").as[Long].head()
    assert(v === 1L)
    assert(MergeTable.tableNumBuckets(dir) === 32)
    assert(spark.sql("SELECT count(*) AS n FROM rebkt_sql_t")
      .as[Long].head() === 200L)
  }

  test("bucket count must be >= 1; empty table resizes as metadata only") {
    val dir = seeded("guard")
    intercept[IllegalArgumentException] {
      MergeTable.rebucket(spark, dir, 0)
    }
    val empty = freshDir("empty")
    MergeTable.create(spark, empty,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))),
      Seq("id"), numBuckets = 4)
    MergeTable.rebucket(spark, empty, 64)
    assert(MergeTable.tableNumBuckets(empty) === 64)
    assert(MergeTable.read(spark, empty).count() === 0L)
  }
}
