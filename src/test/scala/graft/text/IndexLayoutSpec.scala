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
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "tb")),
      s"no partition filter on tb: ${scan.partitionFilters}")
    val expected = terms.map(TextAnalysis.termBucketJvm(_, 16)).distinct.toSet
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
    val maintained = canon(spark.read.parquet(d))
    val rebuilt = canon(TextAnalysis.invertedIndex(docs, "doc_id", col("text")))
    assert(maintained === rebuilt)
    // the stale reversed-word terms must be GONE, not just shadowed
    val reversedWord = stale.filter(isDelta)
      .select(explode(TextAnalysis.words(col("text"))).as("w"))
      .filter(length(col("w")) > 3).head().getString(0)
    assert(!maintained.exists(_._1 == reversedWord) ||
      rebuilt.exists(_._1 == reversedWord))
  }

  test("indexUpsertLayout: an emptied sole-occupant dm= doc-map partition is deleted") {
    val d = Files.createTempDirectory("idx_dm_clean").toString + "/idx"
    // buckets=4: doc 5 is the SOLE occupant of dm=1 (5 mod 4; 1 and 9 absent)
    val base = Seq((4L, "alpha beta"), (5L, "gamma delta"), (8L, "alpha epsilon"))
      .toDF("doc_id", "text")
    TextAnalysis.writeIndexLayout(
      TextAnalysis.invertedIndex(base, "doc_id", col("text")), d, buckets = 4)
    assert(new java.io.File(s"$d/_docmap/dm=1").isDirectory)
    // upsert doc 5 to empty text: no surviving terms, so dynamic overwrite
    // never rewrites dm=1 — the explicit cleanup must remove it
    TextAnalysis.indexUpsertLayout(spark, d,
      Seq((5L, "")).toDF("doc_id", "text"), "doc_id", col("text"), buckets = 4)
    assert(!new java.io.File(s"$d/_docmap/dm=1").exists(),
      "emptied dm= partition must be deleted, not left with stale rows")
    // and the doc map carries no rows for the vanished doc
    assert(spark.read.parquet(s"$d/_docmap")
      .filter(col("doc_id") === 5L).count() === 0)
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
      spark.read.parquet(path).select("term", "df")
        .as[(String, Long)].collect().toSet
    val before = snap(d)
    val dmBefore = spark.read.parquet(s"$d/_docmap")
      .select("doc_id", "tb").as[(Long, Long)].collect().toSet
    intercept[graft.layout.LayoutTxn.ConflictException] {
      TextAnalysis.indexUpsertLayout(spark, d,
        Seq((9L, "epsilon zeta")).toDF("doc_id", "text"),
        "doc_id", col("text"), buckets = 4)
    }
    assert(snap(d) === before, "conflicted upsert must not touch postings")
    assert(spark.read.parquet(s"$d/_docmap")
      .select("doc_id", "tb").as[(Long, Long)].collect().toSet === dmBefore,
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
}
