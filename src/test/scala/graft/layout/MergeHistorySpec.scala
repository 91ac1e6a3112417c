package graft.layout

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Commit timestamps + history (r14): every commit stamps its immutable
  * manifest with a monotone wall-clock, operation kind, and batch rows;
  * `history` surfaces them and `versionForTimestamp`/`readAtTimestamp`
  * resolve TIMESTAMP AS OF semantics — newest version at-or-before the
  * instant, loud error before the first commit. */
class MergeHistorySpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    graft.util.Cleanup.registerTempDir(
      java.nio.file.Files.createTempDirectory(s"hist_$tag")).toString + "/t"

  test("history records version/ts/op/rows across merge, alter, and compact") {
    val dir = freshDir("ops")
    val t0 = System.currentTimeMillis()
    MergeTable.merge(spark, dir,
      Seq((1L, 1.0, "create"), (2L, 2.0, "create")).toDF("k", "v", "op_flag"),
      "k", numBuckets = 2)
    MergeTable.alterRenameColumn(dir, "v", "w")
    MergeTable.merge(spark, dir,
      Seq((2L, 9.0, "update")).toDF("k", "w", "op_flag"), "k")
    MergeTable.compact(spark, dir)
    val t1 = System.currentTimeMillis()

    val h = MergeTable.history(spark, dir)
      .select("version", "operation", "batch_rows")
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(h === Seq((0L, "merge", 2L), (1L, "alter-rename", 0L),
      (2L, "merge", 1L), (3L, "compact", 0L)))
    val stamps = MergeTable.history(spark, dir)
      .select(col("committed_at").cast("long") * 1000).as[Long].collect().toSeq
    // wall-clock within the test window and monotone non-decreasing
    assert(stamps.forall(ts => ts >= t0 - 1000 && ts <= t1 + 1000))
    assert(stamps === stamps.sorted)
  }

  test("versionForTimestamp: newest at-or-before; between commits resolves backwards; before-first errors") {
    val dir = freshDir("asof")
    MergeTable.merge(spark, dir,
      Seq((1L, 1.0, "create")).toDF("k", "v", "op_flag"), "k", numBuckets = 2)
    val ts0 = MergeTable.history(spark, dir)
      .select(col("committed_at").cast("double") * 1000).as[Double]
      .collect().head.toLong
    Thread.sleep(15) // distinct wall-clock for the second commit
    MergeTable.merge(spark, dir,
      Seq((1L, 2.0, "update")).toDF("k", "v", "op_flag"), "k")
    val ts1 = MergeTable.history(spark, dir)
      .select(col("committed_at").cast("double") * 1000).as[Double]
      .collect().toSeq.max.toLong
    assert(ts1 > ts0)

    assert(MergeTable.versionForTimestamp(dir, ts0) === 0L)
    // BETWEEN the two commits: resolves to the older snapshot
    assert(MergeTable.versionForTimestamp(dir, (ts0 + ts1) / 2) === 0L)
    assert(MergeTable.versionForTimestamp(dir, ts1) === 1L)
    assert(MergeTable.versionForTimestamp(dir, ts1 + 3600000) === 1L)
    assert(MergeTable.readAtTimestamp(spark, dir, ts0)
      .select("v").as[Double].collect().toSeq === Seq(1.0))
    // before the first commit: loud, not an empty snapshot
    val e = intercept[IllegalArgumentException](
      MergeTable.versionForTimestamp(dir, ts0 - 10000))
    assert(e.getMessage.contains("at or before"))
  }

  test("un-stamped (pre-history) manifests cannot satisfy TIMESTAMP AS OF") {
    val dir = freshDir("nots")
    MergeTable.merge(spark, dir,
      Seq((1L, 1.0, "create")).toDF("k", "v", "op_flag"), "k", numBuckets = 2)
    // strip the ts property from every manifest, simulating a table whose
    // retained history predates commit timestamps (the pre-history
    // format parses as ts = 0)
    java.nio.file.Files.list(java.nio.file.Paths.get(dir)).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => p.getFileName.toString.startsWith("_manifest_v") ||
        p.getFileName.toString == "_latest")
      .foreach { p =>
        val lines = java.nio.file.Files.readAllLines(p)
        val kept = new java.util.ArrayList[String]()
        lines.forEach(l => if (!l.startsWith("ts=")) { kept.add(l); () })
        java.nio.file.Files.write(p, kept)
      }
    // any instant >= epoch previously resolved to the newest version —
    // silently reading the latest snapshot; now it fails loudly
    val e = intercept[IllegalArgumentException](
      MergeTable.versionForTimestamp(dir, System.currentTimeMillis()))
    assert(e.getMessage.contains("commit timestamp"))
    // VERSION AS OF still works — only point-in-time reads need stamps
    assert(MergeTable.readAt(spark, dir, 0L).count() === 1L)
  }

  test("expired versions leave the timestamp resolution (vacuum retention composes)") {
    val dir = freshDir("expire")
    MergeTable.merge(spark, dir,
      Seq((1L, 1.0, "create")).toDF("k", "v", "op_flag"), "k", numBuckets = 2)
    Thread.sleep(15)
    MergeTable.merge(spark, dir,
      Seq((1L, 2.0, "update")).toDF("k", "v", "op_flag"), "k")
    val ts0 = MergeTable.history(spark, dir)
      .select(col("committed_at").cast("double") * 1000).as[Double]
      .collect().toSeq.min.toLong
    MergeTable.expireVersions(dir, keepLast = 1)
    // v0's manifest is gone: its instant now precedes every RETAINED commit
    val e = intercept[IllegalArgumentException](
      MergeTable.versionForTimestamp(dir, ts0))
    assert(e.getMessage.contains("at or before"))
    assert(MergeTable.history(spark, dir).count() === 1L)
  }
}
