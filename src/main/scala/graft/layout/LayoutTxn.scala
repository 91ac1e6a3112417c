package graft.layout

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Optimistic-concurrency commit protocol for MAINTAINED hive layouts —
  * the r11 MergeTable CAS discipline extended to the at-rest index layers
  * (VERDICT r11 task 2). [[graft.sim.Similarity.ivfUpsertLayout]] and
  * [[graft.text.TextAnalysis.indexUpsertLayout]] previously mutated their
  * `cell=` / `tb=` directories with bare dynamic-partition overwrites: two
  * concurrent upserts interleaved file-by-file and corrupted a partition
  * dir silently. Every maintenance commit now goes through this protocol:
  *
  *  1. **STAGE.** The replacement contents of every touched partition are
  *     written to an attempt-unique `_lstage_v<n>_<uuid>/` dir (hive
  *     discovery skips `_`-prefixed dirs, so readers never see it). The
  *     layout itself is untouched — a writer that dies here leaves only an
  *     orphan stage, swept by the next [[begin]] after a grace period.
  *  2. **CLAIM (the CAS).** The commit manifest — stage name, per-group
  *     touched partitions and deletions — is published as the immutable
  *     `_layout_commit_v<n>` file via `Files.createLink`: atomic
  *     fail-if-exists, exactly one writer per parent version wins. The
  *     loser deletes its stage and throws [[LayoutTxn.ConflictException]]
  *     (retry = re-run the upsert against the new current version; the
  *     re-run re-reads the committed layout, so its delta composes).
  *  3. **SWAP.** Touched partition dirs are renamed in from the stage
  *     (delete-old + atomic per-dir move), emptied partitions deleted,
  *     then `_layout_version` advances by tmp-write + ATOMIC_MOVE.
  *
  * A writer that crashes AFTER its claim is rolled FORWARD by the next
  * writer's [[begin]] — the claim records everything the swap needs, and
  * every swap step is idempotent. Because the swap mutates shared
  * partition dirs (unlike MergeTable, whose data rename is one atomic
  * whole-version move), roll-forward of a claim is fenced by freshness: a
  * claim younger than the grace window means a LIVE writer is mid-swap,
  * and [[begin]] throws [[ConflictException]] rather than racing its
  * renames destructively. A stalled-past-grace writer racing its own
  * recoverer is the same residual window MergeTable documents.
  *
  * What this protocol gives the index layers is WRITER-writer atomicity —
  * one linear history of maintenance commits, no interleaved overwrites,
  * loud conflicts. Reader-vs-writer SNAPSHOT isolation is deliberately out
  * of scope: a reader overlapping a swap can see partition dirs from two
  * commits (exactly as it could under the old dynamic overwrite, which
  * additionally tore single files); the snapshot-isolated table surface in
  * this engine is [[MergeTable]].
  */
object LayoutTxn {

  /** Another writer holds or won the commit for the version this writer
    * targeted. The layout is intact; re-run the upsert against the new
    * current version (caller policy, same as [[MergeTable]]). */
  final class ConflictException(dir: String, version: Long, why: String)
    extends RuntimeException(
      s"concurrent layout commit at $dir: version $version $why; " +
        "re-read the layout and retry the upsert")

  /** A claimed layout commit whose staged partition is gone AND whose
    * destination was not written by THIS commit (absent, or carrying a
    * prior version's contents without this commit's swap marker) — the
    * staged data no longer exists anywhere (e.g. the stage was swept while
    * the writer stalled past grace between staging and claiming, or was
    * partially deleted). The claim is withdrawn before this is thrown so
    * the layout heals: the next writer re-claims the version cleanly
    * instead of silently committing stale partition contents — the
    * [[MergeTable.LostCommitException]] discipline at the layout layer.
    *
    * TORN-STATE RESIDUE: the throw can land mid-swap — earlier groups'
    * deletions and moves of the SAME commit may already be applied, so
    * until the interrupted upsert is re-run the layout can mix this
    * commit's partitions with the parent version's (the same exposure a
    * reader overlapping any swap has — see the object scaladoc; the
    * version file still names the parent, and the re-run upsert reclaims
    * the version and re-stages every touched partition). */
  final class LostLayoutCommitException(dir: String, version: Long,
                                        stage: String, part: String)
    extends RuntimeException(
      s"layout commit v$version at $dir is unrecoverable: staged partition " +
        s"'$stage/$part' is missing and its destination was not written by " +
        "this commit (the stage was likely swept while the writer " +
        "stalled); the claim was withdrawn — the interrupted upsert must " +
        "be re-run (earlier partitions of this commit may already be " +
        "swapped in; the re-run restores a single version)")

  /** One partitioned subtree participating in a commit. `sub` is the
    * subtree below the layout root ("" = the root itself, e.g. the
    * `_docmap` doc store rides the same commit as its postings).
    * `touched` are partition DIR names ("cell=3"); partitions in
    * `touched` with no rows in `replacement` are deleted at swap. */
  case class Group(sub: String, replacement: DataFrame, partCol: String,
                   sortCols: Seq[String], touched: Seq[String])

  /** Per-commit swap marker, written INSIDE every staged partition dir
    * before the claim and carried along by the dir move: at roll-forward,
    * 'destination exists' alone cannot distinguish 'a prior pass already
    * moved this partition' from 'the stage was swept and the destination
    * still holds the REPLACED version's contents' — the marker can. Hive
    * partition discovery ignores `_`-prefixed files, and each move
    * replaces the whole dest dir, so a partition carries exactly the
    * marker of the commit that last wrote it. */
  private[layout] def markerName(version: Long): String = s"_lcommit_v$version"

  private val VersionFile = "_layout_version"
  private def versionPath(dir: String): Path = Paths.get(dir, VersionFile)
  private def claimPath(dir: String, v: Long): Path =
    Paths.get(dir, s"_layout_commit_v$v")
  private def subRoot(dir: String, sub: String): Path =
    if (sub.isEmpty) Paths.get(dir) else Paths.get(dir, sub)

  /** Current committed version; 0 for a layout that predates the protocol
    * (or was just [re]built whole — full builds wipe the dir, version
    * state included, and restart history). */
  def currentVersion(dir: String): Long = currentVersionInfo(dir)._1

  /** (version, commit wall-clock millis) of the current layout commit —
    * the MergeTable manifest-timestamp discipline at the layout layer
    * (r14): the claim stamps its creation instant and finish() carries it
    * into the version file, so an operator can tell WHEN an index layout
    * last changed without external bookkeeping. ts = 0 for pre-r14 or
    * freshly rebuilt layouts. */
  def currentVersionInfo(dir: String): (Long, Long) = {
    val p = versionPath(dir)
    if (!Files.exists(p)) (0L, 0L)
    else {
      val pr = new Properties()
      val in = Files.newInputStream(p)
      try pr.load(in) finally in.close()
      (pr.getProperty("version").toLong,
        Option(pr.getProperty("ts")).map(_.toLong).getOrElse(0L))
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }

  private def writeAtomic(dir: String, pr: Properties, target: Path): Unit = {
    val tmp = Files.createTempFile(Paths.get(dir), "_ltxn_tmp_", "")
    val out = Files.newOutputStream(tmp)
    try pr.store(out, "graft layout commit") finally out.close()
    Files.move(tmp, target,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Swap a claimed commit in; every step idempotent so a crashed swap
    * re-runs to completion. */
  private def finish(dir: String, pr: Properties): Unit = {
    val version = pr.getProperty("version").toLong
    val stage = pr.getProperty("stage")
    val nGroups = pr.getProperty("groups").toInt
    (0 until nGroups).foreach { i =>
      val sub = pr.getProperty(s"group.$i.sub")
      val dest = subRoot(dir, sub)
      Files.createDirectories(dest)
      def parts(kind: String): Seq[String] =
        pr.getProperty(s"group.$i.$kind", "") match {
          case "" => Seq.empty; case s => s.split(",").toSeq
        }
      parts("dels").foreach(p => deleteRecursively(dest.resolve(p).toFile))
      parts("moves").foreach { p =>
        val from = subRoot(s"$dir/$stage", sub).resolve(p)
        val to = dest.resolve(p)
        if (Files.exists(from)) {
          deleteRecursively(to.toFile)
          Files.move(from, to, StandardCopyOption.ATOMIC_MOVE)
        } else if (!Files.exists(to.resolve(markerName(version)))) {
          // 'absent from stage' normally means a prior (crashed) pass
          // already moved it — in which case the DESTINATION carries THIS
          // commit's swap marker (staged alongside the data, moved with
          // the dir). No marker means the staged data is LOST: dest
          // absent entirely, OR dest still holding the PARENT version's
          // contents because the stage was swept under a stalled writer —
          // the replaced-partition case a bare existence check would
          // silently accept as 'already moved'. Withdraw the claim so the
          // layout heals, and fail loudly instead of advancing the
          // version over stale/absent partition contents.
          Files.deleteIfExists(claimPath(dir, version))
          throw new LostLayoutCommitException(dir, version, stage,
            if (sub.isEmpty) p else s"$sub/$p")
        }
      }
    }
    deleteRecursively(new java.io.File(dir, stage))
    if (currentVersion(dir) < version) {
      val vp = new Properties()
      vp.setProperty("version", version.toString)
      vp.setProperty("ts", pr.getProperty("ts", "0"))
      writeAtomic(dir, vp, versionPath(dir))
    }
  }

  /** Entry point for every maintenance writer: roll forward a crashed
    * commit (or conflict loudly on a LIVE one), sweep orphaned stages idle
    * past the grace window, and return the version the caller's commit
    * must name as parent. */
  def begin(dir: String, graceMs: Long = 600000L): Long = {
    if (!Files.isDirectory(Paths.get(dir))) return 0L
    var v = currentVersion(dir)
    var pending = claimPath(dir, v + 1)
    while (Files.exists(pending)) {
      val age = System.currentTimeMillis() -
        Files.getLastModifiedTime(pending).toMillis
      if (age < graceMs)
        throw new ConflictException(dir, v + 1,
          "is being committed by a live writer (fresh claim)")
      val pr = new Properties()
      val in = Files.newInputStream(pending)
      try pr.load(in) finally in.close()
      finish(dir, pr) // roll the dead writer's claimed commit forward
      v = currentVersion(dir)
      pending = claimPath(dir, v + 1)
    }
    // sweep crash-orphaned stages (died before their CAS claim): any
    // _lstage_* not referenced by a pending claim, idle past grace — the
    // same mtime discipline as MergeTable.vacuum
    val now = System.currentTimeMillis()
    def newest(x: java.io.File): Long =
      (x.lastModified() +: Option(x.listFiles()).getOrElse(Array.empty)
        .map(newest).toSeq).max
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("_lstage_") &&
        now - newest(f) >= graceMs)
      .foreach(deleteRecursively)
    v
  }

  /** Stage + CAS-claim + swap one commit of `groups` against `parent`
    * (from [[begin]]). Returns the committed version. Throws
    * [[ConflictException]] (stage cleaned up) if another writer claimed
    * `parent + 1` first. */
  def commit(spark: SparkSession, dir: String, parent: Long,
             groups: Seq[Group]): Long = {
    val newV = parent + 1
    val stage = s"_lstage_v${newV}_${java.util.UUID.randomUUID().toString.take(8)}"
    Files.createDirectories(Paths.get(dir))
    val pr = new Properties()
    pr.setProperty("version", newV.toString)
    pr.setProperty("stage", stage)
    pr.setProperty("ts", System.currentTimeMillis().toString)
    pr.setProperty("groups", groups.size.toString)
    groups.zipWithIndex.foreach { case (g, i) =>
      val stageSub = subRoot(s"$dir/$stage", g.sub)
      DataLayout.writePartitionedSorted(
        g.replacement, stageSub.toString, Seq(g.partCol), g.sortCols)
      // partitions the replacement actually produced; a touched partition
      // with no surviving rows becomes a deletion
      val present = Option(stageSub.toFile.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith(s"${g.partCol}="))
        .map(_.getName).toSet
      // the swap marker rides in the staged dir and moves with it
      present.foreach(p =>
        Files.createFile(stageSub.resolve(p).resolve(markerName(newV))))
      val unexpected = present -- g.touched.toSet
      require(unexpected.isEmpty,
        s"replacement for '${g.sub}' wrote partitions outside its declared " +
          s"touched set: ${unexpected.mkString(",")}")
      pr.setProperty(s"group.$i.sub", g.sub)
      pr.setProperty(s"group.$i.moves",
        g.touched.filter(present.contains).mkString(","))
      pr.setProperty(s"group.$i.dels",
        g.touched.filterNot(present.contains).mkString(","))
    }
    // the CAS: publish the immutable claim, exactly one winner per parent
    val tmp = Files.createTempFile(Paths.get(dir), "_ltxn_tmp_", "")
    val out = Files.newOutputStream(tmp)
    try pr.store(out, "graft layout commit") finally out.close()
    try Files.createLink(claimPath(dir, newV), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        deleteRecursively(new java.io.File(dir, stage))
        throw new ConflictException(dir, newV,
          s"was committed by another writer (expected parent $parent)")
    } finally Files.deleteIfExists(tmp)
    finish(dir, pr)
    newV
  }
}
