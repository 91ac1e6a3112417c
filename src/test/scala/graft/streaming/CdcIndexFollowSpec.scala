package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.layout.{LayoutTxn, MergeTable}
import graft.text.TextAnalysis

/** CDC-driven index maintenance (r17 — VERDICT r16 task 3):
  * [[EventStreams.cdcIndexFollow]] follows a document MergeTable and
  * applies each commit window (upserts AND deletes, one
  * [[TextAnalysis.indexApplyLayout]] commit per window) to an at-rest
  * inverted-index layout, with the delivered-version watermark carried by
  * the INDEX's own transactional batchId. Pinned here: followed index ≡
  * rebuild from the table's final state (postings + doc store), a
  * follower racing live commits converges, and a restart from scratch
  * (fresh checkpoint) re-delivers nothing. */
class CdcIndexFollowSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    graft.util.Cleanup.registerTempDir(
      java.nio.file.Files.createTempDirectory(s"cdcidx_$tag")).toString

  private def docsOf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def postings(dir: String) = LayoutTxn
    .readLayout(spark, dir, "", "tb")
    .select(col("term"), col("df"), explode(col("postings")).as("p"))
    .select(col("term"), col("df"), col("p.doc_id"), col("p.tf"))
    .as[(String, Long, Long, Long)].collect().toSet

  private def dmRows(dir: String) = LayoutTxn
    .readLayout(spark, dir, "_docmap", "dm")
    .select(col("doc_id"), col("tb"), col("len"))
    .as[(Long, Long, Long)].collect().toSet

  test("merges + soft delete follow into the index; followed == rebuilt from the final table state") {
    val base = freshDir("basic")
    val tdir = s"$base/t"; val idx = s"$base/idx"
    val docs = docsOf(
      1L -> "spark rows spark table",
      2L -> "spark rows",
      3L -> "disk only here",
      4L -> "rare word appears once spark")
    MergeTable.merge(spark, tdir,
      docs.withColumn("op_flag", lit("create")), "doc_id", numBuckets = 2)
    TextAnalysis.writeIndexLayout(docs, "doc_id", col("text"), idx, 4)
    // v1: update doc 2; v2: soft-delete doc 3; v3: insert doc 9
    MergeTable.merge(spark, tdir,
      docsOf(2L -> "totally new words now")
        .withColumn("op_flag", lit("update")), "doc_id")
    MergeTable.softDelete(spark, tdir, col("doc_id") === 3L)
    MergeTable.merge(spark, tdir,
      docsOf(9L -> "spark appears late")
        .withColumn("op_flag", lit("create")), "doc_id")
    EventStreams.cdcIndexFollow(spark, tdir, idx, buckets = 4)
    assert(LayoutTxn.lastBatchId(idx) === 3L)
    // the followed index equals a scratch rebuild over the FINAL state
    val fin = MergeTable.read(spark, tdir).select("doc_id", "text")
    val idx2 = s"$base/idx2"
    TextAnalysis.writeIndexLayout(fin, "doc_id", col("text"), idx2, 4)
    assert(postings(idx) === postings(idx2))
    assert(dmRows(idx) === dmRows(idx2))
    // a re-follow from scratch (fresh checkpoint) re-delivers nothing:
    // same version, same content — exactly-once under restart
    val v = LayoutTxn.currentVersion(idx)
    EventStreams.cdcIndexFollow(spark, tdir, idx, buckets = 4)
    assert(LayoutTxn.currentVersion(idx) === v)
    assert(postings(idx) === postings(idx2))
  }

  test("a follower racing live commits converges to the final state, each window applied exactly once") {
    val base = freshDir("race")
    val tdir = s"$base/t"; val idx = s"$base/idx"
    val docs = docsOf(
      1L -> "alpha beta gamma",
      2L -> "delta epsilon zeta",
      3L -> "eta theta iota",
      4L -> "kappa lambda mu")
    MergeTable.merge(spark, tdir,
      docs.withColumn("op_flag", lit("create")), "doc_id", numBuckets = 2)
    TextAnalysis.writeIndexLayout(docs, "doc_id", col("text"), idx, 4)
    // writer thread: 4 live commits (2 updates, 1 delete, 1 insert)
    // while the follower runs
    val writer = new Thread(() => {
      MergeTable.merge(spark, tdir,
        docsOf(1L -> "alpha rewritten entirely")
          .withColumn("op_flag", lit("update")), "doc_id")
      Thread.sleep(150)
      MergeTable.softDelete(spark, tdir, col("doc_id") === 2L)
      Thread.sleep(150)
      MergeTable.merge(spark, tdir,
        docsOf(5L -> "nu xi omicron")
          .withColumn("op_flag", lit("create")), "doc_id")
      Thread.sleep(150)
      MergeTable.merge(spark, tdir,
        docsOf(3L -> "eta theta iota extended")
          .withColumn("op_flag", lit("update")), "doc_id")
      ()
    })
    writer.start()
    try {
      EventStreams.cdcIndexFollow(spark, tdir, idx, buckets = 4,
        untilVersion = Some(4L), timeoutMs = 120000L)
      writer.join(60000)
    } finally writer.join(60000)
    assert(LayoutTxn.lastBatchId(idx) === 4L)
    val fin = MergeTable.read(spark, tdir).select("doc_id", "text")
    val idx2 = s"$base/idx2"
    TextAnalysis.writeIndexLayout(fin, "doc_id", col("text"), idx2, 4)
    assert(postings(idx) === postings(idx2))
    assert(dmRows(idx) === dmRows(idx2))
  }

  test("an empty-on-text window (no changed rows) still advances the index batchId") {
    val base = freshDir("noop")
    val tdir = s"$base/t"; val idx = s"$base/idx"
    val docs = docsOf(1L -> "alpha beta", 2L -> "gamma delta")
    MergeTable.merge(spark, tdir,
      docs.withColumn("op_flag", lit("create")), "doc_id", numBuckets = 2)
    TextAnalysis.writeIndexLayout(docs, "doc_id", col("text"), idx, 4)
    // v1 re-merges an IDENTICAL row: changesBetween emits nothing
    MergeTable.merge(spark, tdir,
      docsOf(1L -> "alpha beta").withColumn("op_flag", lit("update")),
      "doc_id")
    val before = postings(idx)
    EventStreams.cdcIndexFollow(spark, tdir, idx, buckets = 4)
    assert(LayoutTxn.lastBatchId(idx) === 1L,
      "the watermark must advance past a content-empty window")
    assert(postings(idx) === before)
  }

  test("readers racing the follower each see ONE committed index version, never a mix (r18 — VERDICT r17 task 8)") {
    val base = freshDir("iso")
    val tdir = s"$base/t"; val idx = s"$base/idx"
    val docs = docsOf(
      1L -> "spark alpha beta",
      2L -> "spark gamma delta",
      3L -> "epsilon zeta spark",
      4L -> "eta theta iota")
    MergeTable.merge(spark, tdir,
      docs.withColumn("op_flag", lit("create")), "doc_id", numBuckets = 2)
    TextAnalysis.writeIndexLayout(docs, "doc_id", col("text"), idx, 4)
    // each table version CHANGES the 'spark' result set, so a mixed-
    // version read would produce a result no single version can
    MergeTable.merge(spark, tdir,
      docsOf(1L -> "alpha beta only now")
        .withColumn("op_flag", lit("update")), "doc_id")
    MergeTable.softDelete(spark, tdir, col("doc_id") === 2L)
    MergeTable.merge(spark, tdir,
      docsOf(9L -> "spark spark arrives late")
        .withColumn("op_flag", lit("create")), "doc_id")
    // expected: the 'spark' search over EVERY committed table version —
    // a racing reader must observe exactly one of these
    val legal = (0L to 3L).map { v =>
      TextAnalysis.searchAll(
          TextAnalysis.invertedIndex(
            MergeTable.readAt(spark, tdir, v).select("doc_id", "text"),
            "doc_id", col("text")),
          Seq("spark"))
        .as[(Long, Long)].collect().toSet
    }.toSet
    val observed =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Set[(Long, Long)]]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readers = (0 until 2).map(_ => new Thread(() => {
      while (!stop.get()) {
        observed.add(TextAnalysis.searchIndexLayout(spark, idx, Seq("spark"))
          .as[(Long, Long)].collect().toSet)
        ()
      }
    }))
    readers.foreach(_.start())
    try EventStreams.cdcIndexFollow(spark, tdir, idx, buckets = 4,
      untilVersion = Some(3L), timeoutMs = 120000L)
    finally { stop.set(true); readers.foreach(_.join(60000)) }
    assert(LayoutTxn.lastBatchId(idx) === 3L)
    import scala.jdk.CollectionConverters._
    val obs = observed.asScala.toSet
    assert(obs.nonEmpty)
    val illegal = obs -- legal
    assert(illegal.isEmpty,
      s"reader observed a result NO committed version produces: $illegal " +
        s"(legal: $legal)")
  }
}
