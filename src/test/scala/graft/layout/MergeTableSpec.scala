package graft.layout

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Relational

/** The transactional upsert table (VERDICT r3 stretch): snapshot-isolated
  * copy-on-write merges, delta-proportional rewrites, idempotent batch
  * replay, and SURVEY §5's end-to-end roundtrip property — a second run of
  * the same load produces only updates and changes nothing. */
class MergeTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("merge_table").toString + "/t"

  private def people(rows: (Long, String, Double)*): DataFrame =
    rows.toDF("id", "name", "score")

  private def changes(rows: (Long, String, Double, String)*): DataFrame =
    rows.toDF("id", "name", "score", "op_flag")

  private def contents(dir: String): Set[(Long, String, Double)] =
    MergeTable.read(spark, dir).as[(Long, String, Double)].collect().toSet

  test("create/update/delete merge semantics over two commits") {
    val dir = freshDir()
    MergeTable.merge(spark, dir,
      changes((1L, "a", 1.0, "create"), (2L, "b", 2.0, "create"),
        (3L, "c", 3.0, "create")), "id")
    assert(contents(dir) === Set((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    MergeTable.merge(spark, dir,
      changes((2L, "b2", 2.5, "update"), (3L, "c", 3.0, "delete"),
        (4L, "d", 4.0, "create"), (9L, "ghost", 0.0, "delete")), "id")
    assert(contents(dir) ===
      Set((1L, "a", 1.0), (2L, "b2", 2.5), (4L, "d", 4.0)))
  }

  test("an 'update' of an unmatched key inserts (pure upsert, no op bookkeeping)") {
    val dir = freshDir()
    MergeTable.merge(spark, dir, changes((7L, "x", 7.0, "update")), "id")
    assert(contents(dir) === Set((7L, "x", 7.0)))
  }

  test("SURVEY §5 roundtrip: rerunning the same load yields only updates and is a no-op") {
    val dir = freshDir()
    val source = people((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
    def plan(target: DataFrame) =
      Relational.mergePlan(source, target.withColumn("tid", col("id")),
          srcKey = "name", tgtKey = "name", tgtId = "tid")
        .select(col("id"), col("name"), col("score"), col("op_flag"))
    // run 1 against an empty target: all creates
    val empty = people().filter(lit(false))
    val p1 = plan(empty)
    assert(p1.select("op_flag").distinct().as[String].collect().toSeq === Seq("create"))
    MergeTable.merge(spark, dir, p1, "id")
    // run 2 against the loaded table: only updates, and merging them changes nothing
    val p2 = plan(MergeTable.read(spark, dir))
    assert(p2.select("op_flag").distinct().as[String].collect().toSeq === Seq("update"))
    val before = contents(dir)
    MergeTable.merge(spark, dir, p2, "id")
    assert(contents(dir) === before)
  }

  test("merge rewrites ONLY the buckets its keys hash into") {
    val dir = freshDir()
    MergeTable.merge(spark, dir,
      changes((1L, "a", 1.0, "create"), (2L, "b", 2.0, "create"),
        (3L, "c", 3.0, "create"), (4L, "d", 4.0, "create")),
      "id", numBuckets = 16)
    // touch one key: exactly the buckets of {2} move to v1, rest stay v0
    MergeTable.merge(spark, dir, changes((2L, "b2", 2.2, "update")), "id")
    val back = spark.read.option("basePath", s"$dir/v1")
      .parquet(s"$dir/v1").select("id").as[Long].collect().toSet
    assert(back === Set(2L), s"v1 should hold only key 2's bucket, got $back")
    assert(contents(dir) ===
      Set((1L, "a", 1.0), (2L, "b2", 2.2), (3L, "c", 3.0), (4L, "d", 4.0)))
  }

  test("compactStale folds only the SMALLEST bucket groups; reads equal full compaction (r15)") {
    val dir = freshDir()
    // initial load spreads 32 keys over 8 buckets (one big group), then
    // three single-key merges leave three one-bucket groups beside it
    MergeTable.merge(spark, dir,
      (1L to 32L).map(i => (i, s"n$i", i.toDouble, "create"))
        .toDF("id", "name", "score", "op_flag"), "id", numBuckets = 8)
    Seq(1L, 2L, 3L).foreach(k =>
      MergeTable.merge(spark, dir, changes((k, s"u$k", k + 0.5, "update")), "id"))
    val before = contents(dir)
    val groups0 = MergeTable.scanGroups(dir)
    assert(groups0 >= 3, s"expected fragmented table, got $groups0 groups")
    val v = MergeTable.compactStale(spark, dir, maxGroups = 2)
    assert(v.contains(4L))
    assert(MergeTable.scanGroups(dir) <= 2)
    // subset compaction is invisible to reads
    assert(contents(dir) === before)
    // the BIG group (initial load) was kept in place: the compacted
    // version's directory holds only the folded little groups' buckets,
    // a strict subset of the table
    val compacted = spark.read.option("basePath", s"$dir/v4")
      .parquet(s"$dir/v4").select("id").as[Long].collect().toSet
    assert(compacted.size < 32 && Set(1L, 2L, 3L).subsetOf(compacted),
      s"compacted dir should hold the folded buckets only, got $compacted")
    // at-or-under the bound: a no-op (nothing rewritten, no new version)
    assert(MergeTable.compactStale(spark, dir, maxGroups = 2).isEmpty)
    assert(MergeTable.currentVersion(dir).contains(4L))
    // and a later FULL compact still reads identically (subset ≡ full)
    MergeTable.compact(spark, dir)
    assert(MergeTable.scanGroups(dir) === 1)
    assert(contents(dir) === before)
  }

  test("batchId replay is skipped (foreachBatch exactly-once)") {
    val dir = freshDir()
    assert(MergeTable.merge(spark, dir, changes((1L, "a", 1.0, "create")), "id",
      batchId = 0L).contains(0L))
    assert(MergeTable.lastBatchId(dir) === 0L)
    // a retry of batch 0 must not apply
    assert(MergeTable.merge(spark, dir, changes((1L, "a", 99.0, "update")), "id",
      batchId = 0L).isEmpty)
    assert(contents(dir) === Set((1L, "a", 1.0)))
    assert(MergeTable.merge(spark, dir, changes((1L, "a", 2.0, "update")), "id",
      batchId = 1L).isDefined)
    assert(contents(dir) === Set((1L, "a", 2.0)))
  }

  test("crash mid-stream + restart from checkpoint lands on the uninterrupted final state (K8 exactly-once proof)") {
    // the claim a production user actually relies on: a streaming upsert
    // killed AFTER a micro-batch's MERGE committed but BEFORE the
    // checkpoint recorded it must, on restart, replay that batch with the
    // same batchId, SKIP the double-commit, and finish with a table
    // identical to a run that never crashed. The harness itself asserts
    // one committed version per batch; here we additionally diff the
    // final contents against an uninterrupted run.
    import graft.streaming.EventStreams
    val crashedDir = freshDir()
    val cleanDir = freshDir()
    val crashed = EventStreams.streamUpsertCrashResume(spark, sfDir, crashedDir)
      .select("user_id", "event_id", "event_type", "value")
      .collect().map(_.toSeq).toSet
    val clean = EventStreams.streamUpsert(spark, sfDir, cleanDir)
      .select("user_id", "event_id", "event_type", "value")
      .collect().map(_.toSeq).toSet
    assert(crashed === clean)
    assert(crashed.nonEmpty)
  }

  test("updateWhen: a stale update leaves the target row in place") {
    val dir = freshDir()
    val newerWins = Some((src: String => org.apache.spark.sql.Column,
                          tgt: String => org.apache.spark.sql.Column) =>
      src("score") > tgt("score"))
    MergeTable.merge(spark, dir, changes((1L, "a", 5.0, "create")), "id")
    MergeTable.merge(spark, dir, changes((1L, "stale", 3.0, "update")), "id",
      updateWhen = newerWins)
    assert(contents(dir) === Set((1L, "a", 5.0)))
    MergeTable.merge(spark, dir, changes((1L, "fresh", 9.0, "update")), "id",
      updateWhen = newerWins)
    assert(contents(dir) === Set((1L, "fresh", 9.0)))
  }

  test("duplicate source keys are rejected like ANSI MERGE") {
    val dir = freshDir()
    val e = intercept[IllegalArgumentException] {
      MergeTable.merge(spark, dir,
        changes((1L, "a", 1.0, "create"), (1L, "a2", 2.0, "update")), "id")
    }
    assert(e.getMessage.contains("duplicate keys"))
  }

  test("unknown op is rejected, table untouched") {
    val dir = freshDir()
    MergeTable.merge(spark, dir, changes((1L, "a", 1.0, "create")), "id")
    intercept[IllegalArgumentException] {
      MergeTable.merge(spark, dir, changes((2L, "b", 2.0, "upsert")), "id")
    }
    assert(contents(dir) === Set((1L, "a", 1.0)))
  }

  test("a laggard finisher cannot regress _latest past a newer commit") {
    // The overtake race: writer A claims v1 but stalls before its _latest
    // swap; a recoverer finishes v1 FOR it and commits v2. When A finally
    // resumes its finishCommit(v1), the version guard must leave _latest
    // at v2 — an unconditional swap would regress reads to v1 until the
    // next writer entry.
    val dir = freshDir()
    MergeTable.merge(spark, dir, changes((1L, "a", 1.0, "create")), "id")  // v0
    MergeTable.merge(spark, dir, changes((2L, "b", 2.0, "create")), "id")  // v1
    MergeTable.merge(spark, dir, changes((3L, "c", 3.0, "create")), "id")  // v2
    val after = contents(dir)
    // replay v1's recorded protocol step exactly as the stalled writer would
    val pr = new java.util.Properties()
    val in = java.nio.file.Files.newInputStream(
      java.nio.file.Paths.get(dir, "_manifest_v1"))
    try pr.load(in) finally in.close()
    MergeTable.finishCommit(dir, pr)
    assert(contents(dir) === after,
      "a replayed v1 finishCommit must not regress the table")
    val latest = new java.util.Properties()
    val in2 = java.nio.file.Files.newInputStream(
      java.nio.file.Paths.get(dir, "_latest"))
    try latest.load(in2) finally in2.close()
    assert(latest.getProperty("version") === "2")
  }

  test("deleting every row of a bucket leaves a readable table; compact+vacuum fold versions") {
    val dir = freshDir()
    MergeTable.merge(spark, dir,
      changes((1L, "a", 1.0, "create"), (2L, "b", 2.0, "create")), "id",
      numBuckets = 4)
    MergeTable.merge(spark, dir, changes((1L, "a", 1.0, "delete")), "id")
    assert(contents(dir) === Set((2L, "b", 2.0)))
    MergeTable.merge(spark, dir, changes((3L, "c", 3.0, "create")), "id")
    val before = contents(dir)
    MergeTable.compact(spark, dir)
    // vacuum reclaims nothing while history manifests still reference old
    // versions (time travel keeps them alive), everything after expiry
    assert(MergeTable.vacuum(dir).isEmpty)
    MergeTable.expireVersions(dir, keepLast = 1)
    val removed = MergeTable.vacuum(dir)
    assert(contents(dir) === before)
    assert(removed.nonEmpty, "vacuum should reclaim superseded versions")
    val versionDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v\\d+")).map(_.getName)
    assert(versionDirs.length === 1, s"expected one live version, got ${versionDirs.toSeq}")
  }

  test("schema evolution: a batch adding a column widens the table, old rows read null") {
    val dir = freshDir()
    MergeTable.merge(spark, dir,
      changes((1L, "a", 1.0, "create"), (2L, "b", 2.0, "create")), "id")
    // second batch carries a NEW nullable column `tag`
    MergeTable.merge(spark, dir,
      Seq((2L, "b2", 2.5, "x", "update"), (3L, "c", 3.0, "y", "create"))
        .toDF("id", "name", "score", "tag", "op_flag"), "id")
    val out = MergeTable.read(spark, dir)
      .as[(Long, String, Double, Option[String])].collect().toSet
    assert(out === Set((1L, "a", 1.0, None),
      (2L, "b2", 2.5, Some("x")), (3L, "c", 3.0, Some("y"))))
    // time travel keeps the pre-evolution schema
    assert(MergeTable.readAt(spark, dir, 0).columns.toSeq ===
      Seq("id", "name", "score"))
    // CDC across the evolution aligns the old snapshot with typed nulls
    val cdc = MergeTable.changesBetween(spark, dir, 0, 1)
      .as[(String, Long, String, Double, Option[String])].collect().toSet
    assert(cdc === Set(("update", 2L, "b2", 2.5, Some("x")),
      ("insert", 3L, "c", 3.0, Some("y"))))
  }

  test("schema evolution rejects type changes and dropped columns") {
    val dir = freshDir()
    MergeTable.merge(spark, dir, changes((1L, "a", 1.0, "create")), "id")
    val typeChange = Seq((1L, "a", 2, "update")).toDF("id", "name", "score", "op_flag")
    val e1 = intercept[IllegalArgumentException] {
      MergeTable.merge(spark, dir, typeChange, "id")
    }
    assert(e1.getMessage.contains("would change type"))
    val dropped = Seq((1L, "a", "update")).toDF("id", "name", "op_flag")
    val e2 = intercept[IllegalArgumentException] {
      MergeTable.merge(spark, dir, dropped, "id")
    }
    assert(e2.getMessage.contains("missing existing column"))
    // table untouched by the rejected batches
    assert(contents(dir) === Set((1L, "a", 1.0)))
  }

  test("snapshot isolation: a reader resolved before a merge keeps seeing its snapshot") {
    val dir = freshDir()
    MergeTable.merge(spark, dir,
      changes((1L, "a", 1.0, "create"), (2L, "b", 2.0, "create")), "id")
    // resolve the manifest NOW; the plan pins the immutable v0 directories
    val reader = MergeTable.read(spark, dir)
    MergeTable.merge(spark, dir,
      changes((1L, "a9", 9.0, "update"), (3L, "c", 3.0, "create")), "id")
    // collected AFTER the concurrent merge committed: still the old snapshot
    assert(reader.as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.0), (2L, "b", 2.0)))
    assert(contents(dir) ===
      Set((1L, "a9", 9.0), (2L, "b", 2.0), (3L, "c", 3.0)))
  }

  test("time travel: readAt returns each committed snapshot") {
    val dir = freshDir()
    MergeTable.merge(spark, dir,
      changes((1L, "a", 1.0, "create"), (2L, "b", 2.0, "create")), "id")
    MergeTable.merge(spark, dir,
      changes((1L, "a2", 1.5, "update"), (2L, "b", 2.0, "delete"),
        (3L, "c", 3.0, "create")), "id")
    assert(MergeTable.versions(dir) === Seq(0L, 1L))
    assert(MergeTable.readAt(spark, dir, 0).as[(Long, String, Double)].collect().toSet
      === Set((1L, "a", 1.0), (2L, "b", 2.0)))
    assert(MergeTable.readAt(spark, dir, 1).as[(Long, String, Double)].collect().toSet
      === contents(dir))
  }

  test("CDC reads ONLY buckets whose owning version changed between the manifests") {
    val dir = freshDir()
    MergeTable.merge(spark, dir,
      changes((1L, "a", 1.0, "create"), (2L, "b", 2.0, "create"),
        (3L, "c", 3.0, "create"), (4L, "d", 4.0, "create")), "id",
      numBuckets = 16)
    MergeTable.merge(spark, dir, changes((2L, "b2", 2.2, "update")), "id")
    val diff = MergeTable.changesBetween(spark, dir, 0, 1)
    assert(diff.as[(String, Long, String, Double)].collect().toSet ===
      Set(("update", 2L, "b2", 2.2)))
    diff.collect()
    // the scans under the diff plan list only key 2's bucket directory
    // (recursive: AQE nests scans inside materialized query stages)
    def findScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => findScans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => findScans(r.child)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(findScans)
    }
    val locations = findScans(diff.queryExecution.executedPlan)
      .map(_.metadata.getOrElse("Location", ""))
    val bucketDirs = locations.flatMap(
      s"""$BucketColPattern=(\\d+)""".r.findAllMatchIn(_).map(_.group(1))).toSet
    val expected = spark.range(1).select(
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(org.apache.spark.sql.functions.lit(2L)),
        org.apache.spark.sql.functions.lit(16))).head().getInt(0)
    assert(bucketDirs === Set(expected.toString),
      s"CDC scanned buckets $bucketDirs, expected only $expected from $locations")
  }

  private val BucketColPattern = java.util.regex.Pattern.quote(MergeTable.BucketCol)

  test("CDC diff classifies insert/update/delete and drops no-op rewrites") {
    val dir = freshDir()
    MergeTable.merge(spark, dir,
      changes((1L, "a", 1.0, "create"), (2L, "b", 2.0, "create"),
        (4L, "d", 4.0, "create")), "id")
    // 1 really changes, 2 is rewritten to the identical value (no CDC row),
    // 4 is deleted, 5 is new
    MergeTable.merge(spark, dir,
      changes((1L, "a2", 1.5, "update"), (2L, "b", 2.0, "update"),
        (4L, "d", 4.0, "delete"), (5L, "e", 5.0, "create")), "id")
    val diff = MergeTable.changesBetween(spark, dir, 0, 1)
      .as[(String, Long, String, Double)].collect().toSet
    assert(diff === Set(
      ("update", 1L, "a2", 1.5),
      ("delete", 4L, "d", 4.0),
      ("insert", 5L, "e", 5.0)))
  }

  test("optimistic concurrency: of two interleaved writers one commits, one fails loud, retry lands") {
    val dir = freshDir()
    MergeTable.merge(spark, dir,
      changes((1L, "a", 1.0, "create"), (2L, "b", 2.0, "create")), "id")
    // Writer B enters merge() and reads parent v0, then BLOCKS inside its
    // updateWhen builder (driver-side, evaluated between the manifest read
    // and the commit). While B is parked, writer A commits v1 on the main
    // thread. Released, B proceeds to its CAS claim of v1 — and must get
    // ConflictException, not a silent last-write-wins.
    val bEntered = new java.util.concurrent.CountDownLatch(1)
    val aCommitted = new java.util.concurrent.CountDownLatch(1)
    val bResult = new java.util.concurrent.atomic.AtomicReference[Either[Throwable, Option[Long]]]()
    val b = new Thread(() => {
      try bResult.set(Right(MergeTable.merge(spark, dir,
        changes((2L, "b-from-B", 2.9, "update")), "id",
        updateWhen = Some((_, _) => {
          bEntered.countDown()
          aCommitted.await()
          lit(true)
        }))))
      catch { case t: Throwable => bResult.set(Left(t)) }
    })
    b.start()
    bEntered.await()
    val aVersion = MergeTable.merge(spark, dir,
      changes((1L, "a-from-A", 1.5, "update"), (3L, "c", 3.0, "create")), "id")
    assert(aVersion === Some(1L))
    aCommitted.countDown()
    b.join(120000)
    assert(bResult.get() != null, "writer B never finished")
    bResult.get() match {
      case Left(e) => assert(e.isInstanceOf[MergeTable.ConflictException],
        s"expected ConflictException, got $e")
      case Right(v) => fail(s"writer B silently committed $v over writer A")
    }
    // the loser corrupted nothing: A's commit is intact
    assert(contents(dir) ===
      Set((1L, "a-from-A", 1.5), (2L, "b", 2.0), (3L, "c", 3.0)))
    // retry is caller policy: B's re-run sees the new parent and commits v2
    assert(MergeTable.merge(spark, dir,
      changes((2L, "b-from-B", 2.9, "update")), "id") === Some(2L))
    assert(contents(dir) ===
      Set((1L, "a-from-A", 1.5), (2L, "b-from-B", 2.9), (3L, "c", 3.0)))
    // the loser's staged data dir was removed at conflict time
    val stages = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("_stage_v"))
    assert(stages.isEmpty, s"orphaned stage dirs: ${stages.map(_.getName).mkString(",")}")
  }

  test("crash between CAS claim and _latest swap is rolled forward by the next writer") {
    val dir = freshDir()
    MergeTable.merge(spark, dir,
      changes((1L, "a", 1.0, "create"), (2L, "b", 2.0, "create")), "id")
    MergeTable.merge(spark, dir, changes((2L, "b2", 2.5, "update")), "id")
    // simulate the crash window: v1's commit claimed _manifest_v1 and
    // renamed its stage, but died before swapping _latest — reconstruct by
    // rewinding _latest to the v0 manifest
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(dir, "_manifest_v0"),
      java.nio.file.Paths.get(dir, "_latest"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assert(MergeTable.read(spark, dir).count() === 2) // readers see v0
    // the next writer rolls v1 forward, then commits v2 on top of it
    assert(MergeTable.merge(spark, dir,
      changes((3L, "c", 3.0, "create")), "id") === Some(2L))
    assert(contents(dir) ===
      Set((1L, "a", 1.0), (2L, "b2", 2.5), (3L, "c", 3.0)))
  }

  /** Re-fabricate the claim-without-data-rename crash window: _manifest_v1
    * published (the CAS claim) but the stage dir never renamed to v1 and
    * _latest still at v0 — exactly the state a writer killed between
    * commit() step 1 and step 2 leaves behind. */
  private def fabricateClaimedUnswapped(dir: String): String = {
    val pr = new java.util.Properties()
    val in = java.nio.file.Files.newInputStream(
      java.nio.file.Paths.get(dir, "_manifest_v1"))
    try pr.load(in) finally in.close()
    val stage = pr.getProperty("stage")
    assert(stage != null && stage.nonEmpty)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(dir, "v1"),
      java.nio.file.Paths.get(dir, stage))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(dir, "_manifest_v0"),
      java.nio.file.Paths.get(dir, "_latest"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    stage
  }

  test("claimed-but-unswapped commit: versions() excludes it; readAt rolls it forward") {
    val dir = freshDir()
    MergeTable.merge(spark, dir,
      changes((1L, "a", 1.0, "create"), (2L, "b", 2.0, "create")), "id")
    MergeTable.merge(spark, dir, changes((2L, "b2", 2.5, "update")), "id")
    fabricateClaimedUnswapped(dir)
    // the in-flight claim is NOT listed as a readable snapshot (ADVICE r11:
    // listing it invited a readAt on absent bucket dirs, which readBuckets
    // silently treated as all-deleted — silently wrong time travel)
    assert(MergeTable.versions(dir) === Seq(0L))
    // but an explicit readAt(1) rolls the commit forward instead of
    // reading through it
    assert(MergeTable.readAt(spark, dir, 1L).as[(Long, String, Double)]
      .collect().toSet === Set((1L, "a", 1.0), (2L, "b2", 2.5)))
    assert(MergeTable.versions(dir) === Seq(0L, 1L))
    // roll-forward ran the full idempotent finishCommit, so the table is
    // simply healthy afterwards: the next writer commits v2 on top
    assert(MergeTable.merge(spark, dir,
      changes((3L, "c", 3.0, "create")), "id") === Some(2L))
    assert(contents(dir) ===
      Set((1L, "a", 1.0), (2L, "b2", 2.5), (3L, "c", 3.0)))
  }

  test("vacuum grace period protects a live writer's in-flight stage") {
    val dir = freshDir()
    MergeTable.merge(spark, dir, changes((1L, "a", 1.0, "create")), "id")
    // an UNCLAIMED stage a concurrent writer is still filling (fresh mtime)
    val live = java.nio.file.Paths.get(dir, "_stage_v1_testlive")
    java.nio.file.Files.createDirectories(live)
    java.nio.file.Files.writeString(live.resolve("part-0"), "in-flight")
    assert(!MergeTable.vacuum(dir).contains("_stage_v1_testlive"),
      "default-grace vacuum must not reap a fresh in-flight stage")
    assert(java.nio.file.Files.exists(live))
    // zero grace = the explicit no-concurrent-writers cleanup shape
    assert(MergeTable.vacuum(dir, stageGraceMs = 0L)
      .contains("_stage_v1_testlive"))
    assert(!java.nio.file.Files.exists(live))
  }

  test("a claim whose stage and v-dir are both gone fails loudly once, then heals") {
    val dir = freshDir()
    MergeTable.merge(spark, dir,
      changes((1L, "a", 1.0, "create"), (2L, "b", 2.0, "create")), "id")
    MergeTable.merge(spark, dir, changes((2L, "b2", 2.5, "update")), "id")
    val stage = fabricateClaimedUnswapped(dir)
    // the vacuum-races-writer shape: the staged data disappears before the
    // rename lands — the commit's data is gone from the universe
    val stagePath = java.nio.file.Paths.get(dir, stage)
    Option(stagePath.toFile.listFiles()).getOrElse(Array.empty)
      .foreach(f => { def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty).foreach(rm); x.delete(); () }
        rm(f) })
    java.nio.file.Files.delete(stagePath)
    // first entrant reports the lost commit LOUDLY (not silently-empty
    // time travel, not a permanent NoSuchFileException wedge)
    val e = intercept[MergeTable.LostCommitException] {
      MergeTable.merge(spark, dir, changes((3L, "c", 3.0, "create")), "id")
    }
    assert(e.getMessage.contains("v1"))
    // ...and WITHDRAWS the claim: the table is healed, the next merge
    // re-claims version 1 cleanly
    assert(MergeTable.merge(spark, dir,
      changes((3L, "c", 3.0, "create")), "id") === Some(1L))
    assert(contents(dir) ===
      Set((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
  }
}
