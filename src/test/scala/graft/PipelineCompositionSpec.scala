package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec
import graft.dedup.Dedup
import graft.model.Tables
import graft.ops.Relational
import graft.text.TextAnalysis

/** The full training-data pipeline composed end-to-end — quality filter →
  * exact dedup → near-dup clustering → canonical selection → stratified
  * sample → token shards — every stage a lazy DataFrame transform, one
  * action at the end. This is the composition story the individual
  * operators exist for. */
class PipelineCompositionSpec extends SparkSpec {

  test("filter → dedup → cluster → sample → shard composes lazily and monotonically") {
    val docs = Tables.documents(spark, sfDir)
    val n0 = docs.count()

    // 1. quality filter (auditable reasons)
    val kept = TextAnalysis.qualityFilter(docs, col("text"), minWords = 3)
      .filter(col("keep")).drop("n_words_f", "reasons", "keep")
    val n1 = kept.count()
    assert(n1 <= n0 && n1 > 0)

    // 2. exact dedup (fingerprint keep-first)
    val exact = Dedup.exact(kept, col("text"), Seq(col("doc_id"))).drop("fp")
    val n2 = exact.count()
    assert(n2 <= n1 && n2 > 0)

    // 3. near-dup clusters → keep the canonical (min doc_id) per component
    val clustered = Dedup.nearDupClusters(exact, "doc_id", col("text"))
    val canonical = exact.join(
      clustered.filter(col("doc_id") === col("component")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val n3 = canonical.count()
    assert(n3 <= n2 && n3 > 0)

    // 4. deterministic stratified sample: 50% per language
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    val counts = canonical.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val sampled = canonical.withColumn("rn", row_number().over(w))
      .join(broadcast(counts), Seq("lang"))
      .filter(col("rn") <= ceil(col("n_lang") * 0.5))
    val n4 = sampled.count()
    assert(n4 <= n3 && n4 > 0)

    // 5. token shards: every shard except a language's last stays under
    // budget + one-doc overflow
    val budget = 2000L
    val ws = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val shards = TextAnalysis.tokenCounts(sampled, col("text"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens_ws")).over(ws), lit(0L)))
      .withColumn("shard", floor(col("cum_before") / budget).cast("long"))
      .groupBy("lang", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens_ws").as("tokens"),
        max("n_tokens_ws").as("max_doc"))
    val rows = shards.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tokens = r.getAs[Long]("tokens")
      val maxDoc = r.getAs[Long]("max_doc")
      assert(tokens <= budget + maxDoc,
        s"shard ${r.getAs[Long]("shard")} of ${r.getAs[String]("lang")} " +
          s"overflows: $tokens > $budget + $maxDoc")
    }

    // deterministic end-to-end: a second run yields identical shard stats
    val again = TextAnalysis.tokenCounts(sampled, col("text"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens_ws")).over(ws), lit(0L)))
      .withColumn("shard", floor(col("cum_before") / budget).cast("long"))
      .groupBy("lang", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens_ws").as("tokens"),
        max("n_tokens_ws").as("max_doc"))
      .collect()
    assert(rows.map(_.toSeq).toSet === again.map(_.toSeq).toSet)
  }
}
