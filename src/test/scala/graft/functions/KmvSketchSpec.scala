package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmv_distinct is exact below k and within ~10% above") {
    KmvFunctions.ensureRegistered(spark)
    // exact regime: 100 distinct values, k=256
    val small = spark.range(100).select((col("id") % 100).as("v"))
    val exactSmall = small.selectExpr("kmv_distinct(v, 256)").head().getLong(0)
    assert(exactSmall === 100L)
    // sketch regime: 10k distinct, k=256 → ±10% expected (σ ≈ 1/√k)
    val big = spark.range(10000).select(col("id").as("v")).repartition(8)
    val est = big.selectExpr("kmv_distinct(v, 256)").head().getLong(0)
    assert(math.abs(est - 10000.0) / 10000.0 < 0.15, s"estimate $est too far from 10000")
  }

  test("kmv_distinct merges across partitions (partial+final aggregation)") {
    KmvFunctions.ensureRegistered(spark)
    val ev = Tables.events(spark, sfDir)
    val plan = ev.groupBy("event_type").agg(expr("kmv_distinct(user_id, 256)").as("u"))
    val phys = plan.queryExecution.executedPlan.toString
    assert(phys.contains("partial_kmv_distinct"), phys)
    val got = plan.as[(String, Long)].collect().toMap
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").cast("long").as("u"))
      .as[(String, Long)].collect().toMap
    // ≤ ~150 distinct users per type: below k, estimates are exact
    assert(got === exact)
  }

  test("string inputs hash consistently regardless of partitioning") {
    KmvFunctions.ensureRegistered(spark)
    val d = Tables.documents(spark, sfDir)
    val a = d.repartition(1).selectExpr("kmv_distinct(lang, 64)").head().getLong(0)
    val b = d.repartition(7).selectExpr("kmv_distinct(lang, 64)").head().getLong(0)
    assert(a === b)
    assert(a === d.select(countDistinct("lang")).head().getLong(0))
  }
}
