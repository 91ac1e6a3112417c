package graft.layout

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Merge-on-read soft delete (r16 deletion vectors): `softDelete`
  * tombstones victim KEYS in per-bucket vector files instead of rewriting
  * the buckets they live in — the commit writes kilobytes where the
  * copy-on-write delete rewrites gigabytes. The contract pinned here:
  * every read path applies the vectors (read / readWhere / time travel /
  * CDC / counts), NO data bucket is rewritten by the delete itself,
  * consecutive deletes compose into one vector per bucket, the next
  * rewrite of a bucket (merge or compact) materializes its tombstones and
  * clears the vector, and vacuum never reclaims a version that only a
  * vector references. */
class MergeDvSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    graft.util.Cleanup.registerTempDir(
      Files.createTempDirectory(s"mdv_$tag")).toString + "/t"

  /** 64 rows over 4 buckets: (id, v = id, tag). */
  private def table(tag: String): String = {
    val dir = freshDir(tag)
    val rows = (1L to 64L).map(id => (id, id, s"g${id % 4}", "create"))
    MergeTable.merge(spark, dir,
      rows.toDF("id", "v", "tag", "op_flag"), "id", numBuckets = 4)
    dir
  }

  private def bucketDirs(dir: String, v: Long): Seq[String] =
    Option(new java.io.File(s"$dir/v$v").listFiles()).getOrElse(Array.empty)
      .toSeq.map(_.getName).filter(_.startsWith(s"${MergeTable.BucketCol}="))

  test("softDelete hides matching rows without rewriting any data bucket") {
    val dir = table("basic")
    val Some(v1) = MergeTable.softDelete(spark, dir, col("v") <= 10L)
    assert(v1 === 1L)
    val ids = MergeTable.read(spark, dir).select("id")
      .as[Long].collect().toSet
    assert(ids === (11L to 64L).toSet)
    // the delete's own version dir carries ONLY vector files — zero data
    // buckets rewritten (the merge-on-read promise)
    assert(bucketDirs(dir, v1).isEmpty)
    assert(Files.isDirectory(Paths.get(s"$dir/v$v1/_dv")))
    // time travel: the pre-delete snapshot still shows everything
    assert(MergeTable.readAt(spark, dir, 0L).count() === 64L)
    // readWhere composes with the vectors (pruning never resurrects)
    assert(MergeTable.readWhere(spark, dir, col("v") <= 12L)
      .select("id").as[Long].collect().toSet === Set(11L, 12L))
    // exact O(1) counts follow the tombstones
    assert(MergeTable.countRows(dir) === Some(54L))
    assert(MergeTable.bucketRowCounts(spark, dir)
      .agg(sum("rows")).head().getLong(0) === 54L)
    // history records the delete and its victim count
    val h = MergeTable.history(spark, dir)
      .filter(col("version") === v1).head()
    assert(h.getAs[String]("operation") === "delete")
    assert(h.getAs[Long]("batch_rows") === 10L)
  }

  test("no-match softDelete is a no-op: None, version unchanged") {
    val dir = table("noop")
    assert(MergeTable.softDelete(spark, dir, col("v") > 1000L).isEmpty)
    assert(MergeTable.currentVersion(dir) === Some(0L))
    assert(MergeTable.read(spark, dir).count() === 64L)
  }

  test("consecutive soft deletes compose; each snapshot sees its own vectors") {
    val dir = table("compose")
    MergeTable.softDelete(spark, dir, col("v") <= 5L)
    MergeTable.softDelete(spark, dir, col("v").between(6L, 12L))
    val ids = MergeTable.read(spark, dir).select("id").as[Long].collect().toSet
    assert(ids === (13L to 64L).toSet)
    assert(MergeTable.readAt(spark, dir, 1L).select("id")
      .as[Long].collect().toSet === (6L to 64L).toSet)
    assert(MergeTable.readAt(spark, dir, 0L).count() === 64L)
    assert(MergeTable.countRows(dir) === Some(52L))
  }

  test("CDC emits the soft-deleted keys as delete ops") {
    val dir = table("cdc")
    MergeTable.softDelete(spark, dir, col("v") <= 7L)
    val ch = MergeTable.changesBetween(spark, dir, 0L, 1L)
    assert(ch.select("op_flag").distinct().as[String].collect().toSeq ===
      Seq("delete"))
    assert(ch.select("id").as[Long].collect().toSet === (1L to 7L).toSet)
    // delete rows carry the fromVersion values
    assert(ch.filter(col("id") === 3L).select("tag").as[String].head() === "g3")
  }

  test("a merge rewriting a bucket materializes its tombstones; untouched vectors survive") {
    val dir = table("merge")
    MergeTable.softDelete(spark, dir, col("id") <= 16L) // touches all 4 buckets
    // re-insert one deleted key and update one live key
    MergeTable.merge(spark, dir, Seq(
        (3L, 300L, "re", "create"), (40L, 400L, "up", "update"))
      .toDF("id", "v", "tag", "op_flag"), "id", numBuckets = 4)
    val got = MergeTable.read(spark, dir).select("id", "v")
      .as[(Long, Long)].collect().toMap
    assert(got(3L) === 300L && got(40L) === 400L)
    // other deleted keys stay deleted — in the rewritten buckets (now
    // materialized) AND the untouched ones (vector still applied)
    assert(!got.contains(1L) && !got.contains(16L))
    assert(got.keySet.size === 49) // 64 - 16 deleted + 1 re-inserted
    // CDC across the merge shows exactly the re-insert + update
    val ch = MergeTable.changesBetween(spark, dir, 1L, 2L)
    assert(ch.select("op_flag", "id").as[(String, Long)].collect().toSet ===
      Set(("insert", 3L), ("update", 40L)))
  }

  test("compact materializes every vector; expire+vacuum reclaims the DV version") {
    val dir = table("compact")
    val Some(dvV) = MergeTable.softDelete(spark, dir, col("v") % 2L === 0L)
    val before = MergeTable.read(spark, dir).select("id")
      .as[Long].collect().toSet
    val cv = MergeTable.compact(spark, dir)
    assert(MergeTable.read(spark, dir).select("id")
      .as[Long].collect().toSet === before)
    // post-compact, the bucket FILES no longer contain the deleted keys:
    // a raw scan of the new version's bucket dirs (no vector applied)
    // agrees with the logical read
    val raw = spark.read.parquet(
      bucketDirs(dir, cv).map(d => s"$dir/v$cv/$d"): _*)
    assert(raw.select("id").as[Long].collect().toSet === before)
    // the vector-only version is reclaimable once history expires
    MergeTable.expireVersions(dir, keepLast = 1)
    val reclaimed = MergeTable.vacuum(dir, stageGraceMs = 0L)
    assert(reclaimed.contains(s"v$dvV"))
    assert(MergeTable.read(spark, dir).select("id")
      .as[Long].collect().toSet === before)
  }

  test("vacuum never reclaims a version only a live vector references") {
    val dir = table("vacuum")
    val Some(dvV) = MergeTable.softDelete(spark, dir, col("v") <= 10L)
    // expire everything but the newest manifest: the DV version is still
    // referenced by the CURRENT manifest's vector entries
    MergeTable.expireVersions(dir, keepLast = 1)
    val reclaimed = MergeTable.vacuum(dir, stageGraceMs = 0L)
    assert(!reclaimed.contains(s"v$dvV"))
    assert(MergeTable.read(spark, dir).count() === 54L)
  }

  test("IS NOT NULL pruning stays correct after deleting the non-null rows") {
    val dir = freshDir("nulls")
    // one bucket where SOME rows are null-tagged; delete all non-null ones
    val rows = (1L to 32L).map(id =>
      (id, id, if (id % 2L == 0L) null else s"t$id", "create"))
    MergeTable.merge(spark, dir,
      rows.toDF("id", "v", "tag", "op_flag"), "id", numBuckets = 2)
    MergeTable.softDelete(spark, dir, col("tag").isNotNull)
    // a stale null count equal to the reduced row count would wrongly
    // prune IS NOT NULL; the delete drops non-zero counts, so the pruned
    // read must agree with the unpruned filter (here: empty)
    val got = MergeTable.readWhere(spark, dir, col("tag").isNotNull)
    assert(got.count() === 0L)
    val gotNull = MergeTable.readWhere(spark, dir, col("tag").isNull)
    assert(gotNull.select("id").as[Long].collect().toSet ===
      (1L to 32L).filter(_ % 2L == 0L).toSet)
  }

  test("vectors survive a key rename (positional storage)") {
    val dir = table("rename")
    MergeTable.softDelete(spark, dir, col("v") <= 10L)
    MergeTable.alterRenameColumn(dir, "id", "doc_id")
    assert(MergeTable.read(spark, dir).select("doc_id")
      .as[Long].collect().toSet === (11L to 64L).toSet)
    // and a soft delete AFTER the rename composes with the old vector
    MergeTable.softDelete(spark, dir, col("doc_id") > 60L)
    assert(MergeTable.read(spark, dir).select("doc_id")
      .as[Long].collect().toSet === (11L to 60L).toSet)
  }

  test("composite-key tables soft-delete on the key tuple") {
    val dir = freshDir("ck")
    val rows = for (i <- 1L to 10L; d <- Seq("a", "b"))
      yield (i, d, i * 10L, "create")
    MergeTable.mergeKeys(spark, dir,
      rows.toDF("id", "part", "v", "op_flag"), Seq("id", "part"),
      numBuckets = 4)
    MergeTable.softDelete(spark, dir, col("part") === "a" && col("id") <= 5L)
    val left = MergeTable.read(spark, dir).select("id", "part")
      .as[(Long, String)].collect().toSet
    assert(left.size === 15 && !left.contains((3L, "a")) &&
      left.contains((3L, "b")))
    assert(MergeTable.countRows(dir) === Some(15L))
  }
}
