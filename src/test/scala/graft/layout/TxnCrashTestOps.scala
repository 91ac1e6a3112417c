package graft.layout

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.Properties

/** Test-only surgery: revert the NEWEST published [[LayoutTxn]] commit at
  * `dir` to the claimed-but-unpublished state — the exact crash window
  * between the claim CAS and the publish (stage rename + version-file
  * swap). Both publish artifacts are undone from the claim's own record:
  * `_lv<v>` moves back to the claim's stage name and `_layout_version`
  * reverts to the bytes the caller saved before the commit (absent prior
  * file = delete). The claim's mtime is backdated past any grace window
  * so the next writer's begin() ROLLS IT FORWARD instead of conflicting —
  * which is precisely the replay scenario the exactly-once guard must
  * survive (ADVICE r16 high). */
object TxnCrashTestOps {

  /** Snapshot `_layout_version` (None if the layout predates the
    * protocol) — take it BEFORE the commit to be crashed. */
  def saveVersionFile(dir: String): Option[Array[Byte]] = {
    val p = Paths.get(dir, "_layout_version")
    if (Files.exists(p)) Some(Files.readAllBytes(p)) else None
  }

  def unpublishLast(dir: String, prior: Option[Array[Byte]]): Unit = {
    val v = LayoutTxn.currentVersion(dir)
    require(v > 0, s"nothing published at $dir to unpublish")
    val claim = Paths.get(dir, s"_layout_commit_v$v")
    require(Files.exists(claim), s"no claim for v$v at $dir")
    val pr = new Properties()
    val in = Files.newInputStream(claim)
    try pr.load(in) finally in.close()
    val stage = pr.getProperty("stage")
    Files.move(Paths.get(dir, s"_lv$v"), Paths.get(dir, stage),
      StandardCopyOption.ATOMIC_MOVE)
    prior match {
      case Some(bytes) =>
        Files.write(Paths.get(dir, "_layout_version"), bytes); ()
      case None =>
        Files.deleteIfExists(Paths.get(dir, "_layout_version")); ()
    }
    // backdate the claim AND the restored stage so begin() treats the
    // writer as dead (past grace) rather than live (conflict)
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 24L * 3600 * 1000)
    Files.setLastModifiedTime(claim, old)
    def backdate(f: java.io.File): Unit = {
      Files.setLastModifiedTime(f.toPath, old)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(backdate)
    }
    backdate(new java.io.File(dir, stage))
  }
}
