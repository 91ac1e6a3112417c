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
