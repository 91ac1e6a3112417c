package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.Relational

/** The reference's end-to-end workload (SURVEY.md §3, Traces 1-3) recast
  * Spark-first on the driver testdata:
  *
  *   Extract  — parquet scans (the reference's HTTP/paginated-REST scans,
  *              main.py:96-100, become sources; see graft.sources).
  *   Transform— broadcast lookup enrichment (J1/J2, main.py:107-123),
  *              projection + constants + null-coalescing (P1-P3,
  *              main.py:114-132), then the merge diff (J3+J4,
  *              main.py:134-163) as ONE full-outer join emitting
  *              op_flag ∈ {create, update, delete}.
  *   Load     — idempotent parquet MERGE sink partitioned by op_flag
  *              (replaces the row-at-a-time Selenium sink, main.py:171-260).
  *
  * Scale: dims (nation/region) broadcast; the diff shuffles each side once
  * on the lowered natural key. At 100 TB both sides are sort-merge joined;
  * pre-bucketing source and target on the key removes even that shuffle.
  */
object MergePipeline {

  /** Source extract+transform: active customers enriched with nation/region
    * names — the talks→events projection (main.py:114-132) shape:
    * rename, constant columns, coalesce, lookup joins. */
  def sourceEvents(spark: SparkSession, dir: String): DataFrame = {
    val cust   = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir)
    val enriched = Relational.lookupEnrich(
      Relational.lookupEnrich(cust, nation, col("c_nationkey"), col("n_nationkey")),
      region, col("n_regionkey"), col("r_regionkey"))
    enriched
      .filter(col("c_acctbal") > 0) // "active" source rows
      .select(
        col("c_name").as("name"),                       // P1 rename
        coalesce(col("n_name"), lit("")).as("location"), // P3 coalesce
        coalesce(col("r_name"), lit("")).as("region_name"),
        lit("en").as("language"),                        // P2 constant
        col("c_mktsegment").as("segment"),
        col("c_acctbal").as("balance"))
  }

  /** Target extract: the "already loaded" side (Hub events analogue,
    * main.py:60-90): one segment's customers, id + name + tag key. */
  def targetEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("id"), col("c_name").as("tag"))

  /** The merge plan (Trace 2): full-outer diff on lower(name)==lower(tag).
    * Row counts printed by the reference (main.py:146,165) are derivable by
    * grouping on op_flag. */
  def mergePlan(spark: SparkSession, dir: String): DataFrame =
    Relational.mergePlan(
      sourceEvents(spark, dir), targetEvents(spark, dir),
      srcKey = "name", tgtKey = "tag", tgtId = "id")

  /** Load (Trace 3): idempotent MERGE-style sink. Partitioning by op_flag
    * lets a downstream applier scan only the slice it needs; re-running the
    * pipeline reproduces the reference's rerun-to-refresh semantics. */
  def writeMergePlan(plan: DataFrame, outDir: String): Unit =
    plan.write.mode("overwrite").partitionBy("op_flag").parquet(outDir)
}
