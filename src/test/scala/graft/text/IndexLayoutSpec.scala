package graft.text

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** The inverted-index-at-rest layout (the IVF-layout precedent applied to
  * text search): index hive-partitioned by md5 term bucket, searches
  * pruned to the query terms' bucket directories. */
class IndexLayoutSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val index =
    TextAnalysis.invertedIndex(docs, "doc_id", col("text"))
  private lazy val layoutDir = {
    val d = Files.createTempDirectory("idx_layout").toString + "/idx"
    TextAnalysis.writeIndexLayout(index, d, buckets = 16)
    d
  }

  private def findScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
    p match {
      case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => findScans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => findScans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(findScans)
    }

  test("layout write is lossless: every (term, df) row survives partitioning") {
    val back = spark.read.parquet(layoutDir)
    assert(back.count() === index.count())
    // JVM-side bucket derivation matches the Spark column used at write
    val sample = back.select("term", "tb").as[(String, Long)].take(50)
    sample.foreach { case (term, tb) =>
      assert(TextAnalysis.termBucketJvm(term, 16) === tb, s"bucket mismatch for $term")
    }
  }

  test("pruned search reads ONLY the query terms' bucket directories") {
    val terms = Seq("scan", "batch")
    val out = TextAnalysis.searchIndexLayout(spark, layoutDir, terms, buckets = 16)
    assert(out.collect().nonEmpty)
    val scans = findScans(out.queryExecution.executedPlan)
    val scan = scans.find(_.metadata.get("Location").exists(_.contains("idx_layout")))
      .getOrElse(fail(s"no layout scan among ${scans.map(_.metadata.get("Location"))}"))
    // r15: readLayout prunes the DIRECTORY LIST driver-side before Spark
    // ever lists a file — stronger than a PartitionFilter (no non-matching
    // dir is even enumerated). The observable: every input file of the
    // layout scan sits under one of the query terms' tb= dirs.
    val expected = terms.map(TextAnalysis.termBucketJvm(_, 16)).distinct.toSet
    val readBuckets = scan.relation.location.inputFiles.toSeq
      .flatMap(_.split("/").find(_.startsWith("tb=")))
      .map(_.stripPrefix("tb=").toLong).toSet
    assert(readBuckets.nonEmpty && readBuckets.subsetOf(expected),
      s"scan read buckets $readBuckets outside the query's $expected")
    val allBuckets = new java.io.File(layoutDir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("tb="))
    assert(expected.size < allBuckets, "fixture degenerate: nothing to prune")
  }

  test("indexUpsertLayout: maintained layout equals a full rebuild, including removed terms") {
    import org.apache.spark.sql.Row
    val d = Files.createTempDirectory("idx_upsert").toString + "/idx"
    val isDelta = col("doc_id") % 7 === 0
    val stale = docs.withColumn("text",
      when(isDelta, reverse(col("text"))).otherwise(col("text")))
    TextAnalysis.writeIndexLayout(
      TextAnalysis.invertedIndex(stale, "doc_id", col("text")), d)
    TextAnalysis.indexUpsertLayout(spark, d, docs.filter(isDelta),
      "doc_id", col("text"))
    def canon(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Seq[Row])] =
      df.select("term", "df", "postings")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getSeq[Row](2))).toSet
    // the maintained layout's committed snapshot (touched tb= dirs live in
    // _lv1, which a plain hive read would skip)
    val maintained = canon(
      graft.layout.LayoutTxn.readLayout(spark, d, "", "tb"))
    val rebuilt = canon(TextAnalysis.invertedIndex(docs, "doc_id", col("text")))
    assert(maintained === rebuilt)
    // the stale reversed-word terms must be GONE, not just shadowed
    val reversedWord = stale.filter(isDelta)
      .select(explode(TextAnalysis.words(col("text"))).as("w"))
      .filter(length(col("w")) > 3).head().getString(0)
    assert(!maintained.exists(_._1 == reversedWord) ||
      rebuilt.exists(_._1 == reversedWord))
  }

  test("indexUpsertLayout: an emptied sole-occupant dm= doc-map partition leaves the snapshot and is physically reclaimed by the sweep") {
    val d = Files.createTempDirectory("idx_dm_clean").toString + "/idx"
    // buckets=4: doc 5 is the SOLE occupant of dm=1 (5 mod 4; 1 and 9 absent)
    val base = Seq((4L, "alpha beta"), (5L, "gamma delta"), (8L, "alpha epsilon"))
      .toDF("doc_id", "text")
    TextAnalysis.writeIndexLayout(
      TextAnalysis.invertedIndex(base, "doc_id", col("text")), d, buckets = 4)
    assert(new java.io.File(s"$d/_docmap/dm=1").isDirectory)
    // upsert doc 5 to empty text: no surviving terms — the commit records
    // dm=1 as a deletion, so it leaves the version map immediately (the
    // root dir stays on disk, immutable, until the two-phase sweep)
    TextAnalysis.indexUpsertLayout(spark, d,
      Seq((5L, "")).toDF("doc_id", "text"), "doc_id", col("text"), buckets = 4)
    assert(!graft.layout.LayoutTxn.resolve(d, "_docmap", "dm")
      .exists(_._1 == "dm=1"),
      "emptied dm= partition must leave the committed snapshot")
    // and the committed doc map carries no rows for the vanished doc
    assert(graft.layout.LayoutTxn.readLayout(spark, d, "_docmap", "dm")
      .filter(col("doc_id") === 5L).count() === 0)
    // two begins past grace reclaim the emptied root dir physically
    graft.layout.LayoutTxn.begin(d, graceMs = 0L)
    graft.layout.LayoutTxn.begin(d, graceMs = 0L)
    assert(!new java.io.File(s"$d/_docmap/dm=1").exists(),
      "swept dm= partition must be deleted, not left with stale rows")
  }

  test("a live concurrent committer makes indexUpsertLayout CONFLICT loudly — postings AND doc map untouched") {
    val d = Files.createTempDirectory("idx_conflict").toString + "/idx"
    val base = Seq((4L, "alpha beta"), (5L, "gamma delta"))
      .toDF("doc_id", "text")
    TextAnalysis.writeIndexLayout(
      TextAnalysis.invertedIndex(base, "doc_id", col("text")), d, buckets = 4)
    // another writer's FRESH claim for the next layout version
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(d, "_layout_commit_v1"), "version=1\n")
    def snap(path: String): Set[(String, Long)] =
      graft.layout.LayoutTxn.readLayout(spark, path, "", "tb")
        .select("term", "df").as[(String, Long)].collect().toSet
    def dmSnap(path: String): Set[(Long, Long)] =
      graft.layout.LayoutTxn.readLayout(spark, path, "_docmap", "dm")
        .select("doc_id", "tb").as[(Long, Long)].collect().toSet
    val before = snap(d)
    val dmBefore = dmSnap(d)
    intercept[graft.layout.LayoutTxn.ConflictException] {
      TextAnalysis.indexUpsertLayout(spark, d,
        Seq((9L, "epsilon zeta")).toDF("doc_id", "text"),
        "doc_id", col("text"), buckets = 4)
    }
    assert(snap(d) === before, "conflicted upsert must not touch postings")
    assert(dmSnap(d) === dmBefore,
      "conflicted upsert must not touch the doc map")
    assert(!new java.io.File(d).listFiles()
      .exists(_.getName.startsWith("_lstage_")), "no stage residue")
    // withdraw the fabricated claim: the upsert then lands cleanly as v1
    java.nio.file.Files.delete(java.nio.file.Paths.get(d, "_layout_commit_v1"))
    TextAnalysis.indexUpsertLayout(spark, d,
      Seq((9L, "epsilon zeta")).toDF("doc_id", "text"),
      "doc_id", col("text"), buckets = 4)
    assert(graft.layout.LayoutTxn.currentVersion(d) === 1L)
    assert(snap(d).map(_._1).contains("epsilon"))
  }

  test("layout search is semantically identical to searching the fresh index") {
    val terms = Seq("scan", "batch")
    val viaLayout = TextAnalysis.searchIndexLayout(spark, layoutDir, terms)
      .as[(Long, Long)].collect().toSet
    val fresh = TextAnalysis.searchAll(index, terms)
      .as[(Long, Long)].collect().toSet
    assert(viaLayout === fresh && fresh.nonEmpty)
  }

  test("bm25SearchLayout equals bm25 over the corpus — before AND after maintenance") {
    val d = java.nio.file.Files.createTempDirectory("idx_bm25").toString + "/idx"
    val base = Seq(
      (1L, "spark rows spark spark table"),
      (2L, "spark rows"),
      (3L, "disk only here"),
      (4L, "rare word appears once spark"))
      .toDF("doc_id", "text")
    TextAnalysis.writeIndexLayout(
      TextAnalysis.invertedIndex(base, "doc_id", col("text")), d, buckets = 4)
    val terms = Seq("spark", "rare")
    def viaLayout: Map[Long, Double] =
      TextAnalysis.bm25SearchLayout(spark, d, terms, buckets = 4)
        .as[(Long, Double)].collect().toMap
    def direct(corpus: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      TextAnalysis.bm25(corpus, "doc_id", col("text"), terms)
        .as[(Long, Double)].collect().toMap
    val a = viaLayout
    val b = direct(base)
    assert(a.keySet === b.keySet && a.keySet === Set(1L, 2L, 4L))
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12, s"doc $k") }
    // REPLACE doc 2 with a longer text (length, tf, and df all move) —
    // the maintained index must keep scoring exactly like a fresh corpus
    val repl = Seq((2L, "spark spark rare rare rare words words words"))
      .toDF("doc_id", "text")
    TextAnalysis.indexUpsertLayout(spark, d, repl, "doc_id", col("text"),
      buckets = 4)
    val after = viaLayout
    val want = direct(base.filter(col("doc_id") =!= 2L).unionByName(repl))
    assert(after.keySet === want.keySet)
    after.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-12, s"doc $k after upsert") }
  }
}
