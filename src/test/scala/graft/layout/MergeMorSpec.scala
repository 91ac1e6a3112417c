package graft.layout

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Merge-on-read upserts (r18, VERDICT r17 task 1): [[MergeTable.mergeSmall]]
  * appends per-bucket delta runs instead of rewriting whole buckets; the
  * read side resolves newest-run-wins per key. Pinned here: MOR ≡ COW on
  * identical batch sequences (the semantics contract), run stacking,
  * compaction materialization, soft-delete composition (tombstone runs on
  * delta-carrying buckets — never a vector that a run could resurrect
  * through), COW-merge materialization of touched buckets, schema
  * evolution through a run, time travel / CDC across MOR commits, honest
  * countRows, batchId replay, and vacuum safety of run-owning versions. */
class MergeMorSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    graft.util.Cleanup.registerTempDir(
      Files.createTempDirectory(s"mmor_$tag")).toString + "/t"

  private def rowsOf(dir: String): Set[(Long, Long, String)] =
    MergeTable.read(spark, dir).select("id", "v", "tag")
      .as[(Long, Long, String)].collect().toSet

  private def batch(rows: (Long, Long, String, String)*) =
    rows.toDF("id", "v", "tag", "op_flag")

  private val base = (1L to 64L).map(id => (id, id * 2, s"g${id % 4}", "create"))

  private def seeded(tag: String, buckets: Int = 4): String = {
    val dir = freshDir(tag)
    MergeTable.merge(spark, dir, base.toDF("id", "v", "tag", "op_flag"),
      "id", numBuckets = buckets)
    dir
  }

  test("MOR merge sequence ≡ COW merge sequence (upserts, inserts, deletes)") {
    val cow = seeded("eq_cow"); val mor = seeded("eq_mor")
    val batches = Seq(
      batch((1L, 100L, "up", "update"), (65L, 130L, "new", "create"),
        (2L, 0L, "", "delete")),
      batch((1L, 200L, "up2", "update"), (66L, 132L, "new", "create"),
        (65L, 0L, "", "delete")),
      batch((3L, 300L, "up3", "update"), (66L, 999L, "re", "update")))
    batches.foreach { b =>
      MergeTable.merge(spark, cow, b, "id")
      MergeTable.mergeSmall(spark, mor, b, "id")
    }
    assert(rowsOf(mor) === rowsOf(cow))
    // and the MOR table really did NOT rewrite its base: v0 still owns
    // every bucket (the three commits were delta runs)
    val det = MergeTable.detail(spark, mor).head()
    assert(det.getAs[Int]("scan_groups") > 1, "expected delta-run groups")
  }

  test("newest run wins per key across stacked runs; delete then re-insert") {
    val dir = seeded("stack")
    MergeTable.mergeSmall(spark, dir, batch((5L, 500L, "a", "update")), "id")
    MergeTable.mergeSmall(spark, dir, batch((5L, 0L, "", "delete")), "id")
    assert(rowsOf(dir).forall(_._1 != 5L), "deleted key resurfaced")
    MergeTable.mergeSmall(spark, dir, batch((5L, 777L, "b", "create")), "id")
    assert(rowsOf(dir).contains((5L, 777L, "b")))
    // a key only ever touched by runs (never in base)
    MergeTable.mergeSmall(spark, dir, batch((90L, 1L, "x", "create")), "id")
    MergeTable.mergeSmall(spark, dir, batch((90L, 2L, "y", "update")), "id")
    assert(rowsOf(dir).contains((90L, 2L, "y")))
  }

  test("compact materializes runs: content unchanged, deltas cleared, counts exact again") {
    val dir = seeded("compact")
    MergeTable.mergeSmall(spark, dir,
      batch((1L, 11L, "m", "update"), (70L, 70L, "n", "create"),
        (2L, 0L, "", "delete")), "id")
    assert(MergeTable.countRows(dir).isEmpty,
      "countRows must be honest-None under unresolved runs")
    val before = rowsOf(dir)
    MergeTable.compact(spark, dir)
    assert(rowsOf(dir) === before)
    assert(MergeTable.scanGroups(dir) === 1)
    assert(MergeTable.countRows(dir) === Some(before.size.toLong))
  }

  test("a COW merge of a delta-carrying bucket reads THROUGH the runs and clears them") {
    val dir = seeded("cowtouch", buckets = 1) // one bucket: every key collides
    MergeTable.mergeSmall(spark, dir, batch((1L, 111L, "mor", "update")), "id")
    // COW-merge a DIFFERENT key in the same bucket: the rewrite must
    // carry key 1's run value into the new base, not lose it
    MergeTable.merge(spark, dir, batch((2L, 222L, "cow", "update")), "id")
    assert(rowsOf(dir).contains((1L, 111L, "mor")))
    assert(rowsOf(dir).contains((2L, 222L, "cow")))
    assert(MergeTable.scanGroups(dir) === 1, "runs must clear on rewrite")
  }

  test("softDelete on a delta-carrying bucket writes a tombstone RUN (no resurrection)") {
    val dir = seeded("softdel", buckets = 1)
    MergeTable.mergeSmall(spark, dir, batch((80L, 800L, "zz", "create")), "id")
    // victim 80 lives ONLY in a run; a deletion vector would not reach it
    val v = MergeTable.softDelete(spark, dir, col("id") === 80L)
    assert(v.nonEmpty)
    assert(rowsOf(dir).forall(_._1 != 80L), "run-resident key survived delete")
    // and a base-resident victim through the same path
    MergeTable.softDelete(spark, dir, col("id") === 7L)
    assert(rowsOf(dir).forall(_._1 != 7L))
    // on a bucket with NO runs the classic vector path still engages
    val plain = seeded("softdel_plain", buckets = 1)
    MergeTable.softDelete(spark, plain, col("id") === 7L)
    assert(rowsOf(plain).forall(_._1 != 7L))
  }

  test("a pre-existing deletion vector composes with later runs (re-insert wins)") {
    val dir = seeded("dvmix", buckets = 1)
    MergeTable.softDelete(spark, dir, col("id") === 9L) // vector, no runs yet
    assert(rowsOf(dir).forall(_._1 != 9L))
    MergeTable.mergeSmall(spark, dir, batch((9L, 900L, "back", "create")), "id")
    assert(rowsOf(dir).contains((9L, 900L, "back")),
      "run re-insert must win over the older vector")
  }

  test("additive schema evolution through a MOR run") {
    val dir = seeded("evolve")
    val widened = Seq((1L, 10L, "w", "extra", "update"))
      .toDF("id", "v", "tag", "note", "op_flag")
    MergeTable.mergeSmall(spark, dir, widened, "id")
    val out = MergeTable.read(spark, dir)
    assert(out.columns.contains("note"))
    assert(out.filter(col("id") === 1L).select("note").as[String].head() === "extra")
    assert(out.filter(col("id") === 2L).select("note").as[String].head() === null)
  }

  test("time travel and CDC see each version's own runs") {
    val dir = seeded("tt")
    val v0 = MergeTable.currentVersion(dir).get
    val v1 = MergeTable.mergeSmall(spark, dir,
      batch((1L, 111L, "a", "update"), (2L, 0L, "", "delete")), "id").get
    val v2 = MergeTable.mergeSmall(spark, dir,
      batch((1L, 222L, "b", "update")), "id").get
    assert(MergeTable.readAt(spark, dir, v0)
      .filter(col("id") === 1L).select("v").as[Long].head() === 2L)
    assert(MergeTable.readAt(spark, dir, v1)
      .filter(col("id") === 1L).select("v").as[Long].head() === 111L)
    val ch = MergeTable.changesBetween(spark, dir, v0, v2)
      .select("op_flag", "id", "v").as[(String, Long, Long)].collect().toSet
    assert(ch === Set(("update", 1L, 222L), ("delete", 2L, 4L)))
  }

  test("batchId replay is idempotent; replays of the same id commit nothing") {
    val dir = seeded("replay")
    val v1 = MergeTable.mergeSmall(spark, dir,
      batch((1L, 50L, "x", "update")), "id", batchId = 7L)
    assert(v1.nonEmpty)
    val again = MergeTable.mergeSmall(spark, dir,
      batch((1L, 50L, "x", "update")), "id", batchId = 7L)
    assert(again.isEmpty)
    assert(MergeTable.lastBatchId(dir) === 7L)
  }

  test("mergeSmall against an empty table (or fresh buckets only) writes BASE data") {
    val dir = freshDir("fresh")
    MergeTable.mergeSmall(spark, dir,
      base.toDF("id", "v", "tag", "op_flag"), "id", numBuckets = 4)
    assert(MergeTable.scanGroups(dir) === 1, "initial load must be a base, not runs")
    assert(MergeTable.countRows(dir) === Some(64L))
  }

  test("compactStale(maxDeltaRuns) folds only run-heavy buckets, delta-shaped") {
    val dir = seeded("stale", buckets = 4)
    // pile runs onto key 1's bucket only
    (1 to 3).foreach { i =>
      MergeTable.mergeSmall(spark, dir,
        batch((1L, 1000L + i, s"r$i", "update")), "id")
    }
    assert(MergeTable.compactStale(spark, dir,
      maxGroups = 100, maxDeltaRuns = 4).isEmpty, "3 runs < 4: no-op")
    MergeTable.mergeSmall(spark, dir, batch((1L, 2000L, "r4", "update")), "id")
    val before = rowsOf(dir)
    assert(MergeTable.compactStale(spark, dir,
      maxGroups = 100, maxDeltaRuns = 4).nonEmpty)
    assert(rowsOf(dir) === before)
    assert(MergeTable.scanGroups(dir) === 2,
      "the run-heavy bucket folds into one new group beside the base group")
  }

  test("vacuum never deletes a version dir that only delta runs reference") {
    val dir = seeded("vac")
    val v1 = MergeTable.mergeSmall(spark, dir,
      batch((1L, 999L, "keep", "update")), "id").get
    // an unrelated COW commit supersedes nothing the run needs
    MergeTable.merge(spark, dir, batch((33L, 66L, "x", "update")), "id")
    MergeTable.expireVersions(dir, keepLast = 1)
    MergeTable.vacuum(dir, stageGraceMs = 0L)
    assert(Files.isDirectory(Paths.get(dir, s"v$v1")),
      "vacuum deleted a run-owning version dir")
    assert(rowsOf(dir).contains((1L, 999L, "keep")))
  }

  test("readForKeys prunes by key hash and still resolves runs") {
    val dir = seeded("rfk")
    MergeTable.mergeSmall(spark, dir, batch((1L, 123L, "r", "update")), "id")
    val got = MergeTable.readForKeys(spark, dir, Seq(1L).toDF("id"))
      .filter(col("id") === 1L).select("v").as[Long].collect().toSeq
    assert(got === Seq(123L))
  }
}
