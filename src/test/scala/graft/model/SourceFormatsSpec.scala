package graft.model

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Source-format breadth: the engine round-trips its tables through CSV and
  * JSON-lines with explicit schemas (no inference pass — at scale inference
  * is a full extra read). */
class SourceFormatsSpec extends SparkSpec {

  test("events round-trip parquet → json-lines → DataFrame with explicit schema") {
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "event_type", "value")
    val dir = Files.createTempDirectory("src_json").toString
    ev.write.mode("overwrite").json(dir)
    val back = spark.read.schema(ev.schema).json(dir)
    assert(back.count() === ev.count())
    val a = ev.agg(sum("value")).head().getDouble(0)
    val b = back.agg(sum("value")).head().getDouble(0)
    assert(math.abs(a - b) < 1e-6)
  }

  test("orders round-trip parquet → orc → DataFrame") {
    val o = Tables.orders(spark, sfDir)
    val dir = Files.createTempDirectory("src_orc").toString
    o.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === o.count())
    assert(back.schema === o.schema)
  }

  test("sort-on-write enables row-group skipping for selective scans (zone maps)") {
    val li = Tables.lineitem(spark, sfDir)
    val dir = Files.createTempDirectory("src_sorted").toString
    // the 100 TB layout pattern: range-partition + sort on the hot filter
    // column so parquet min/max stats prune row groups
    li.repartitionByRange(4, col("l_shipdate"))
      .sortWithinPartitions("l_shipdate")
      .write.mode("overwrite").parquet(dir)
    val filtered = spark.read.parquet(dir)
      .filter(col("l_shipdate") < lit("1993-01-01").cast("timestamp"))
    val expected = li.filter(col("l_shipdate") < lit("1993-01-01").cast("timestamp")).count()
    assert(filtered.count() === expected)
    // pushdown reaches the scan
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), plan)
  }

  test("customer round-trips parquet → csv (header) → DataFrame with explicit schema") {
    val c = Tables.customer(spark, sfDir)
    val dir = Files.createTempDirectory("src_csv").toString
    c.write.mode("overwrite").option("header", true).csv(dir)
    val back = spark.read.schema(c.schema).option("header", true).csv(dir)
    assert(back.count() === c.count())
    assert(back.select(sum("c_acctbal")).head().getDouble(0)
      === c.select(sum("c_acctbal")).head().getDouble(0))
    assert(back.schema === c.schema)
  }
}
