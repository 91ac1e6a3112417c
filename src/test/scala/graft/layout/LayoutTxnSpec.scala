package graft.layout

import java.nio.file.{Files, Paths}
import java.util.Properties

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Commit-protocol contract of [[LayoutTxn]] — the stage/CAS-claim/swap
  * discipline the index layers (IVF cells, inverted-index term buckets)
  * commit through. Mirrors MergeTableSpec's crash/claim fabrication: the
  * protocol's failure states are fabricated on disk exactly as a crashed
  * or racing writer would leave them, then the recovery/conflict behavior
  * is asserted. IvfUpsertSpec / IndexLayoutSpec cover the wired call
  * sites; THIS spec pins the protocol itself. */
class LayoutTxnSpec extends SparkSpec {
  import spark.implicits._

  private def newDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/layout"

  private def rows(kv: (Int, Long)*) = kv.toDF("p", "id")

  private def group(df: org.apache.spark.sql.DataFrame, parts: Seq[Int]) =
    LayoutTxn.Group("", df, "p", Seq("id"), parts.map(i => s"p=$i"))

  private def readIds(dir: String): Seq[(Int, Long)] =
    spark.read.parquet(dir).select(col("p").cast("int"), col("id"))
      .as[(Int, Long)].collect().toSeq.sorted

  /** Fabricate a CLAIMED-but-unswapped commit: stage the replacement and
    * publish the claim file exactly as commit() would, then stop — the
    * crash-between-claim-and-swap state. Returns the stage dir name. */
  private def fabricateClaimedCommit(dir: String, version: Long,
                                     df: org.apache.spark.sql.DataFrame,
                                     parts: Seq[Int]): String = {
    val stage = s"_lstage_v${version}_fabricated"
    DataLayout.writePartitionedSorted(df, s"$dir/$stage", Seq("p"), Seq("id"))
    val present = Option(new java.io.File(s"$dir/$stage").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("p="))
      .map(_.getName).toSet
    // real commits stamp each staged partition with the swap marker
    present.foreach(p => Files.createFile(
      Paths.get(s"$dir/$stage", p, LayoutTxn.markerName(version))))
    val touched = parts.map(i => s"p=$i")
    val pr = new Properties()
    pr.setProperty("version", version.toString)
    pr.setProperty("stage", stage)
    pr.setProperty("groups", "1")
    pr.setProperty("group.0.sub", "")
    pr.setProperty("group.0.moves", touched.filter(present.contains).mkString(","))
    pr.setProperty("group.0.dels", touched.filterNot(present.contains).mkString(","))
    val out = Files.newOutputStream(Paths.get(dir, s"_layout_commit_v$version"))
    try pr.store(out, "fabricated claim") finally out.close()
    stage
  }

  test("commit advances the version, swaps touched partitions, deletes emptied ones, leaves the rest bit-for-bit") {
    val dir = newDir("ltxn_basic")
    val p0 = LayoutTxn.begin(dir)
    assert(p0 === 0L)
    LayoutTxn.commit(spark, dir, p0,
      Seq(group(rows(0 -> 1L, 1 -> 2L, 2 -> 3L), Seq(0, 1, 2))))
    assert(LayoutTxn.currentVersion(dir) === 1L)
    // r14: the commit stamps its wall-clock into the version file
    val (_, ts1) = LayoutTxn.currentVersionInfo(dir)
    assert(ts1 > 0L && ts1 <= System.currentTimeMillis())
    val p2Before = Files.list(Paths.get(s"$dir/p=2")).toArray.toSeq
      .map(_.toString).sorted
      .map(p => p -> Files.getLastModifiedTime(Paths.get(p)))
    // v2: rewrite p=0 (new contents), empty p=1 (deletion); p=2 untouched
    LayoutTxn.commit(spark, dir, LayoutTxn.begin(dir),
      Seq(group(rows(0 -> 9L), Seq(0, 1))))
    assert(LayoutTxn.currentVersion(dir) === 2L)
    assert(!Files.exists(Paths.get(s"$dir/p=1")), "emptied partition dropped")
    val p2After = Files.list(Paths.get(s"$dir/p=2")).toArray.toSeq
      .map(_.toString).sorted
      .map(p => p -> Files.getLastModifiedTime(Paths.get(p)))
    assert(p2After === p2Before, "untouched partition must be bit-for-bit intact")
    assert(readIds(dir) === Seq(0 -> 9L, 2 -> 3L))
    // no stage or claim residue beyond the immutable history files
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!names.exists(_.startsWith("_lstage_")), s"stage residue in $names")
  }

  test("racing writers against one parent: exactly one wins the CAS, the loser conflicts with its stage cleaned") {
    val dir = newDir("ltxn_race")
    LayoutTxn.commit(spark, dir, LayoutTxn.begin(dir),
      Seq(group(rows(0 -> 1L), Seq(0))))
    val parent = LayoutTxn.begin(dir) // both writers read parent = 1
    LayoutTxn.commit(spark, dir, parent,
      Seq(group(rows(1 -> 10L), Seq(1)))) // writer A wins v2
    val e = intercept[LayoutTxn.ConflictException] {
      LayoutTxn.commit(spark, dir, parent,
        Seq(group(rows(2 -> 20L), Seq(2)))) // writer B loses the CAS
    }
    assert(e.getMessage.contains("version 2"))
    // winner's commit intact, loser left NO trace: no partition, no stage
    assert(LayoutTxn.currentVersion(dir) === 2L)
    assert(readIds(dir) === Seq(0 -> 1L, 1 -> 10L))
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!names.exists(_.startsWith("_lstage_")), s"loser stage residue: $names")
    assert(!Files.exists(Paths.get(s"$dir/p=2")))
    // the loser's documented retry: re-begin against the new version
    LayoutTxn.commit(spark, dir, LayoutTxn.begin(dir),
      Seq(group(rows(2 -> 20L), Seq(2))))
    assert(readIds(dir) === Seq(0 -> 1L, 1 -> 10L, 2 -> 20L))
  }

  test("a commit crashed between claim and swap is rolled FORWARD by the next begin()") {
    val dir = newDir("ltxn_rollfwd")
    LayoutTxn.commit(spark, dir, LayoutTxn.begin(dir),
      Seq(group(rows(0 -> 1L, 1 -> 2L), Seq(0, 1))))
    // dead writer: staged v2 replacing p=0 and emptying p=1, claimed, crashed
    fabricateClaimedCommit(dir, 2L, rows(0 -> 99L), Seq(0, 1))
    assert(LayoutTxn.currentVersion(dir) === 1L, "claim alone must not advance")
    // graceMs=0: the claim is immediately treated as a dead writer's
    val parent = LayoutTxn.begin(dir, graceMs = 0L)
    assert(parent === 2L, "begin must roll the claimed commit forward")
    assert(readIds(dir) === Seq(0 -> 99L))
    assert(!Files.exists(Paths.get(s"$dir/p=1")), "claimed deletion applied")
    assert(!Files.exists(Paths.get(s"$dir/_lstage_v2_fabricated")))
  }

  test("a FRESH claim means a live writer mid-swap: begin() conflicts instead of racing its renames") {
    val dir = newDir("ltxn_live")
    LayoutTxn.commit(spark, dir, LayoutTxn.begin(dir),
      Seq(group(rows(0 -> 1L), Seq(0))))
    fabricateClaimedCommit(dir, 2L, rows(0 -> 99L), Seq(0))
    val e = intercept[LayoutTxn.ConflictException] {
      LayoutTxn.begin(dir) // default grace: the fabricated claim is seconds old
    }
    assert(e.getMessage.contains("live writer"))
    // nothing was touched: v1 contents intact
    assert(readIds(dir) === Seq(0 -> 1L))
  }

  test("an orphaned stage (writer died before its claim) is swept once idle past grace") {
    val dir = newDir("ltxn_sweep")
    LayoutTxn.commit(spark, dir, LayoutTxn.begin(dir),
      Seq(group(rows(0 -> 1L), Seq(0))))
    val orphan = Paths.get(dir, "_lstage_v9_orphan")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-x.parquet"), "junk")
    // fresh: protected by grace
    LayoutTxn.begin(dir)
    assert(Files.exists(orphan), "a fresh stage may be a live writer's")
    // idle past grace: swept
    LayoutTxn.begin(dir, graceMs = 0L)
    assert(!Files.exists(orphan))
    assert(readIds(dir) === Seq(0 -> 1L))
  }

  test("claimed commit whose staged data is LOST fails loudly and withdraws the claim — the layout heals") {
    val dir = newDir("ltxn_lost")
    LayoutTxn.commit(spark, dir, LayoutTxn.begin(dir),
      Seq(group(rows(0 -> 1L), Seq(0))))
    // claim for v2 moving p=1 in — then the stage vanishes (swept under a
    // stalled writer) and p=1 never existed: source AND destination absent
    val stage = fabricateClaimedCommit(dir, 2L, rows(1 -> 10L), Seq(1))
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete(); ()
    }
    deleteRec(new java.io.File(dir, stage))
    val e = intercept[LayoutTxn.LostLayoutCommitException] {
      LayoutTxn.begin(dir, graceMs = 0L)
    }
    assert(e.getMessage.contains("unrecoverable"))
    assert(!Files.exists(Paths.get(dir, "_layout_commit_v2")),
      "the claim must be withdrawn so the next writer re-claims cleanly")
    // healed: the next begin() sees a clean v1 and a new commit lands as v2
    val parent = LayoutTxn.begin(dir, graceMs = 0L)
    assert(parent === 1L)
    LayoutTxn.commit(spark, dir, parent, Seq(group(rows(1 -> 10L), Seq(1))))
    assert(LayoutTxn.currentVersion(dir) === 2L)
    assert(readIds(dir) === Seq(0 -> 1L, 1 -> 10L))
  }

  test("stage swept under a stalled writer with the REPLACED partition still at the destination: fails loudly instead of committing stale contents") {
    val dir = newDir("ltxn_staledest")
    LayoutTxn.commit(spark, dir, LayoutTxn.begin(dir),
      Seq(group(rows(0 -> 1L), Seq(0))))
    // claim for v2 REPLACING p=0 — then the stage is swept while the
    // writer stalls. The destination p=0 still exists with v1's contents;
    // a bare existence check would accept it as 'already moved' and
    // advance the version over stale data (the r13 advisory's exact gap).
    // The swap marker distinguishes the cases: p=0 carries _lcommit_v1,
    // not _lcommit_v2.
    val stage = fabricateClaimedCommit(dir, 2L, rows(0 -> 99L), Seq(0))
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete(); ()
    }
    deleteRec(new java.io.File(dir, stage))
    val e = intercept[LayoutTxn.LostLayoutCommitException] {
      LayoutTxn.begin(dir, graceMs = 0L)
    }
    assert(e.getMessage.contains("not written by"))
    assert(!Files.exists(Paths.get(dir, "_layout_commit_v2")),
      "the claim must be withdrawn")
    // v1 contents are intact and the table heals: a re-run lands as v2
    assert(readIds(dir) === Seq(0 -> 1L))
    val parent = LayoutTxn.begin(dir, graceMs = 0L)
    assert(parent === 1L)
    LayoutTxn.commit(spark, dir, parent, Seq(group(rows(0 -> 99L), Seq(0))))
    assert(LayoutTxn.currentVersion(dir) === 2L)
    assert(readIds(dir) === Seq(0 -> 99L))
  }

  test("TWO-group commit (the index + _docmap shape): both subtrees swap atomically and roll forward together") {
    val dir = newDir("ltxn_2group")
    def docGroup(df: org.apache.spark.sql.DataFrame, parts: Seq[Int]) =
      LayoutTxn.Group("_docmap", df, "p", Seq("id"), parts.map(i => s"p=$i"))
    // v1: postings p=0, docmap p=0
    LayoutTxn.commit(spark, dir, LayoutTxn.begin(dir), Seq(
      group(rows(0 -> 1L), Seq(0)),
      docGroup(rows(0 -> 100L), Seq(0))))
    assert(readIds(dir) === Seq(0 -> 1L))
    assert(spark.read.parquet(s"$dir/_docmap").count() === 1)
    // fabricate a CLAIMED 2-group v2 (replace postings p=0, empty docmap
    // p=0, add docmap p=1) crashed before its swap
    val stage = "_lstage_v2_fab2"
    DataLayout.writePartitionedSorted(rows(0 -> 9L),
      s"$dir/$stage", Seq("p"), Seq("id"))
    DataLayout.writePartitionedSorted(rows(1 -> 101L),
      s"$dir/$stage/_docmap", Seq("p"), Seq("id"))
    val pr = new java.util.Properties()
    pr.setProperty("version", "2")
    pr.setProperty("stage", stage)
    pr.setProperty("groups", "2")
    pr.setProperty("group.0.sub", "")
    pr.setProperty("group.0.moves", "p=0")
    pr.setProperty("group.0.dels", "")
    pr.setProperty("group.1.sub", "_docmap")
    pr.setProperty("group.1.moves", "p=1")
    pr.setProperty("group.1.dels", "p=0")
    val out = java.nio.file.Files.newOutputStream(
      Paths.get(dir, "_layout_commit_v2"))
    try pr.store(out, "fabricated 2-group claim") finally out.close()
    // roll forward: BOTH subtrees land from the one claim
    assert(LayoutTxn.begin(dir, graceMs = 0L) === 2L)
    assert(readIds(dir) === Seq(0 -> 9L))
    assert(!Files.exists(Paths.get(s"$dir/_docmap/p=0")),
      "the docmap deletion rides the same commit")
    assert(spark.read.parquet(s"$dir/_docmap")
      .select(col("p").cast("int"), col("id")).as[(Int, Long)]
      .collect().toSeq === Seq(1 -> 101L))
    assert(!Files.exists(Paths.get(s"$dir/$stage")))
  }

  test("a commit declaring partitions outside its touched set is rejected before any claim") {
    val dir = newDir("ltxn_declared")
    val parent = LayoutTxn.begin(dir)
    val e = intercept[IllegalArgumentException] {
      LayoutTxn.commit(spark, dir, parent,
        Seq(group(rows(0 -> 1L, 5 -> 2L), Seq(0)))) // writes p=5, declares only p=0
    }
    assert(e.getMessage.contains("outside its declared"))
    // nothing published: no version, no claim; stage residue is swept by
    // the next begin() after grace like any pre-claim death
    assert(LayoutTxn.currentVersion(dir) === 0L)
    assert(!Files.exists(Paths.get(dir, "_layout_commit_v1")))
  }
}
