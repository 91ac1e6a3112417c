package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** End-to-end merge-plan invariants (SURVEY.md §5.3) on the sf0.001 tier. */
class MergePipelineSpec extends SparkSpec {

  test("op_flag partitions: create+update = |source|, delete = target-only keys") {
    val plan = MergePipeline.mergePlan(spark, sfDir).cache()
    val byFlag = plan.groupBy("op_flag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nSrc = MergePipeline.sourceEvents(spark, sfDir).count()
    assert(byFlag.getOrElse("create", 0L) + byFlag.getOrElse("update", 0L) === nSrc)
    // target side: distinct lowered keys not present in source
    val tgt = MergePipeline.targetEvents(spark, sfDir)
      .select(lower(col("tag")).as("k")).distinct()
    val src = MergePipeline.sourceEvents(spark, sfDir)
      .select(lower(col("name")).as("k")).distinct()
    val expectedDeletes = tgt.join(src, Seq("k"), "left_anti").count()
    assert(byFlag.getOrElse("delete", 0L) === expectedDeletes)
    plan.unpersist()
  }

  test("every update row carries a target id; creates never do") {
    val plan = MergePipeline.mergePlan(spark, sfDir)
    assert(plan.filter(col("op_flag") === "update" && col("target_id").isNull).count() === 0)
    assert(plan.filter(col("op_flag") === "create" && col("target_id").isNotNull).count() === 0)
  }

  test("merge plan is deterministic across runs (same rows, same flags)") {
    val a = MergePipeline.mergePlan(spark, sfDir)
      .select("name", "op_flag", "target_id").collect().toSet
    val b = MergePipeline.mergePlan(spark, sfDir)
      .select("name", "op_flag", "target_id").collect().toSet
    assert(a === b)
  }

  test("writeMergePlan partitions the sink by op_flag (idempotent overwrite)") {
    val out = java.nio.file.Files.createTempDirectory("merge_sink").toString
    val plan = MergePipeline.mergePlan(spark, sfDir)
    MergePipeline.writeMergePlan(plan, out)
    MergePipeline.writeMergePlan(plan, out) // re-run: overwrite, not append
    val back = spark.read.parquet(out)
    assert(back.count() === plan.count())
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("op_flag=")))
  }
}
