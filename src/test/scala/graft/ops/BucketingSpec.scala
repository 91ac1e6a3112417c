package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

/** Bucketing = the 100 TB co-located-join path (SURVEY.md §1.3, README):
  * both sides written bucketed+sorted on the join key join WITHOUT a
  * shuffle — the sort-merge join reads matching buckets directly. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans no shuffle exchange") {
    // external table paths: the static warehouse dir stays untouched
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    Tables.orders(spark, sfDir).write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    Tables.lineitem(spark, sfDir).write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

    // hint("merge"): at this tier the tables are small enough to broadcast,
    // which would hide the bucketing; force the SMJ the 100 TB plan uses
    val joined = spark.table("lineitem_b").hint("merge")
      .join(spark.table("orders_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // bucketed SMJ: no ShuffleExchange below the join (only the final agg
    // may exchange on its own key)
    val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"),
      s"unexpected shuffle on join key in:\n$plan")
    assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"unexpected shuffle on join key in:\n$plan")

    // correctness: same result as the unbucketed join
    val expected = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
