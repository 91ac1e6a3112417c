package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** The reference's end-to-end job (SURVEY.md §3 Traces 1-3) as one
  * composable pipeline over the S1/S2 sources: resolve → extract →
  * transform → merge-diff → sink.
  */
object HubEtl {

  /** S3 (main.py:32-48): keyed single-row lookup with the reference's
    * hard failure on a missing/empty result. */
  def resolveAssemblyId(assemblies: DataFrame, slug: String): String = {
    val hit = assemblies.filter(col("slug") === lit(slug)).select("id").limit(1).collect()
    require(hit.nonEmpty && hit(0).getString(0) != null && hit(0).getString(0).nonEmpty,
      s"Assembly not found for slug '$slug'") // main.py:43-48
    hit(0).getString(0)
  }

  /** Target events via the paginated DSv2 source (S2). */
  def targetEvents(spark: SparkSession, pagesDir: String): DataFrame =
    spark.read.format("graft.sources.PaginatedJsonSource")
      .option("path", pagesDir).load()

  /** Trace 2 (main.py:105-165): the merge plan. Join key is source `code`
    * vs target `tags[0]`, both lowered (main.py:135,137,152,155);
    * `try_element_at(...,1)` is null on empty tags (ANSI-mode `element_at` throws) where the reference would
    * IndexError (SURVEY.md §2.3 guard). */
  def mergePlan(events: DataFrame, target: DataFrame): DataFrame = {
    val tgt = target.withColumn("tag0", try_element_at(col("tags"), lit(1)))
    Relational.mergePlan(events, tgt, srcKey = "code", tgtKey = "tag0", tgtId = "id")
      .withColumnRenamed("target_id", "hub_id")
  }

  /** Trace 3 / K1-K4 (main.py:171-260): the load step as an idempotent
    * partitioned parquet MERGE sink. The reference's per-row form-submit
    * error scrape (K4, main.py:234-247) becomes a status column: a sink
    * "message" containing `invalid` flags the row. The reference's
    * `.find("invalid") > 0` misses a match at index 0 (SURVEY.md §2.1 K4);
    * we implement the intended `>= 0` (instr > 0 in 1-based SQL terms). */
  def validate(plan: DataFrame, messageCol: String = "sink_message"): DataFrame = {
    val msg = if (plan.columns.contains(messageCol)) col(messageCol) else lit("")
    plan.withColumn("valid", !(instr(lower(coalesce(msg, lit(""))), "invalid") > 0))
  }

  def writePlan(plan: DataFrame, outDir: String): Unit =
    validate(plan).write.mode("overwrite").partitionBy("op_flag").parquet(outDir)

  /** The whole job: schedule.json + hub pages → op-flagged merge plan. */
  def run(spark: SparkSession, schedulePath: String, pagesDir: String,
          rooms: Map[Int, String] = Pretalx.defaultRooms): DataFrame = {
    val schedule = Pretalx.readSchedule(spark, schedulePath)
    val events = Pretalx.talksToEvents(
      Pretalx.talks(schedule), Pretalx.speakerMapOf(schedule), rooms)
    mergePlan(events, targetEvents(spark, pagesDir))
  }
}
