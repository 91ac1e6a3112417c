package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.layout.MergeTable

/** The exactly-once CDC follower ([[EventStreams.cdcFollow]]): a
  * rate-ticker Structured Streaming job that appends each newly committed
  * window's net changes to a sink MergeTable, with the delivered-version
  * watermark carried by the SINK's own transactional batchId (nothing
  * depends on the streaming checkpoint — q191 oracle-checks the delivered
  * rows end-to-end). */
class WindowedCdcSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    graft.util.Cleanup.registerTempDir(
      java.nio.file.Files.createTempDirectory(s"cdcf_$tag")).toString + "/t"

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long, Long)] =
    df.select(col("__v"), col("change_op"), col("k"), col("v"))
      .as[(Long, String, Long, Long)].collect().toSet

  test("each commit window delivers exactly once, tagged by its end version; a commit landing between follows is picked up; re-follow is a no-op") {
    val src = freshDir("src")
    val sink = freshDir("sink")
    MergeTable.merge(spark, src,
      (1L to 6L).map(k => (k, k * 10, "create")).toDF("k", "v", "op_flag"),
      "k", numBuckets = 2)
    MergeTable.merge(spark, src,
      Seq((2L, 99L, "update"), (4L, 98L, "update"),
        (5L, 0L, "delete"), (9L, 90L, "create")).toDF("k", "v", "op_flag"),
      "k")
    // first follow: the sink starts empty, delivered = 0 → window (0, 1]
    val w1 = canon(EventStreams.cdcFollow(spark, src, sink))
    val expect1 = MergeTable.changesBetween(spark, src, 0, 1)
      .select(lit(1L), col("op_flag"), col("k"), col("v"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(w1 === expect1 && w1.nonEmpty)
    // v2 lands AFTER the first follow completed: the next follow must
    // deliver ONLY (1, 2] — earlier windows are never re-emitted
    MergeTable.merge(spark, src,
      Seq((9L, 91L, "update")).toDF("k", "v", "op_flag"), "k")
    val w2 = canon(EventStreams.cdcFollow(spark, src, sink))
    assert(w2 === expect1 + ((2L, "update", 9L, 91L)))
    // re-follow with nothing new (fresh checkpoint, fresh query): the
    // sink watermark makes it a no-op — exactly-once under restart
    val w3 = canon(EventStreams.cdcFollow(spark, src, sink))
    assert(w3 === w2)
    assert(MergeTable.lastBatchId(sink) === 2L)
  }

  test("a follower racing live commits converges: every version delivered once, windows partition the version range") {
    val src = freshDir("racesrc")
    val sink = freshDir("racesink")
    MergeTable.merge(spark, src,
      (1L to 4L).map(k => (k, 0L, "create")).toDF("k", "v", "op_flag"),
      "k", numBuckets = 2)
    // writer thread: 4 more commits while the follower runs
    val writer = new Thread(() => (1L to 4L).foreach { i =>
      MergeTable.merge(spark, src,
        Seq((i, i * 100, "update")).toDF("k", "v", "op_flag"), "k")
      Thread.sleep(150)
    })
    writer.start()
    try {
      // initial load = v0, the writer's four commits = v1..v4
      val out = EventStreams.cdcFollow(spark, src, sink,
        untilVersion = Some(4L), timeoutMs = 120000L)
      writer.join(60000)
      // windows may batch several versions, but each update row appears
      // EXACTLY once across all windows, and the final delivered
      // watermark is the last version
      val updates = out.filter(col("change_op") === "update")
        .select(col("k"), col("v")).as[(Long, Long)].collect().toSeq
      assert(updates.sorted === (1L to 4L).map(i => (i, i * 100)).sorted,
        s"updates delivered: $updates")
      assert(MergeTable.lastBatchId(sink) === 4L)
    } finally writer.join(60000)
  }
}
