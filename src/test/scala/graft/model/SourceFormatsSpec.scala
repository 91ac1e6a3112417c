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

  test("events.ts encodings (INT64 nanos / timestamp NTZ / timestamp) all normalize identically") {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    // the three encodings a producer may hand us, written from one sample
    val sample = Tables.events(spark, sfDir).limit(2000).cache()
    val asMicros = unix_micros(col("ts"))
    val fixtures = Seq(
      // legacy TIMESTAMP(NANOS): nanosAsLong surfaces it as a raw long
      "nanos" -> sample.withColumn("ts", asMicros * 1000L),
      // parquet timestamp[us] isAdjustedToUTC=false → Spark TIMESTAMP_NTZ
      "ntz"   -> sample.withColumn("ts", col("ts").cast(TimestampNTZType)),
      "tz"    -> sample.withColumn("ts", col("ts").cast(TimestampType)))
    val results = fixtures.map { case (name, df) =>
      val dir = Files.createTempDirectory(s"src_ts_$name").toString
      df.write.mode("overwrite").parquet(s"$dir/events.parquet")
      val loaded = Tables.events(spark, dir)
      assert(loaded.schema("ts").dataType === TimestampType, name)
      name -> loaded.select("event_id", "ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    }.toMap
    assert(results("nanos") === results("tz"))
    assert(results("ntz") === results("tz"))
    sample.unpersist()
  }

  test("streaming source accepts both ts encodings and matches the batch window counts") {
    import org.apache.spark.sql.types.TimestampNTZType
    val sample = Tables.events(spark, sfDir).limit(2000).cache()
    val batch = graft.streaming.EventStreams.tumblingCounts(sample)
      .collect().map(_.toSeq).toSet
    for ((name, df) <- Seq(
        "nanos" -> sample.withColumn("ts", unix_micros(col("ts")) * 1000L),
        "ntz"   -> sample.withColumn("ts", col("ts").cast(TimestampNTZType)))) {
      val dir = Files.createTempDirectory(s"src_stream_$name").toString
      df.write.mode("overwrite").parquet(dir)
      val streamed = graft.streaming.EventStreams.spoolRun(spark, dir)(
          graft.streaming.EventStreams.tumblingCounts(_))
        .collect().map(_.toSeq).toSet
      assert(streamed === batch, name)
    }
    sample.unpersist()
  }

  test("ingestion-contract preflight is clean on the testdata and names each drift") {
    assert(Contracts.diffs(spark, sfDir).isEmpty)
    Contracts.preflight(spark, sfDir) // must not throw
    // a drifted copy: events.ts re-encoded as string, documents.n_chars dropped
    val dir = Files.createTempDirectory("contract_drift").toString
    Tables.events(spark, sfDir).limit(10)
      .withColumn("ts", date_format(col("ts"), "yyyy-MM-dd"))
      .write.parquet(s"$dir/events.parquet")
    Tables.documents(spark, sfDir).limit(10).drop("n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val ds = Contracts.diffs(spark, dir)
    assert(ds.exists(d => d.startsWith("events.ts: got string")), ds)
    assert(ds.exists(d => d.startsWith("documents.n_chars: MISSING")), ds)
    val e = intercept[IllegalStateException](Contracts.preflight(spark, dir))
    assert(e.getMessage.contains("events.ts"))
  }

  test("unknown ts encoding fails loud instead of leaking a mis-scaled column") {
    val dir = Files.createTempDirectory("src_ts_bad").toString
    Tables.events(spark, sfDir).limit(10)
      .withColumn("ts", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    intercept[IllegalArgumentException](Tables.events(spark, dir))
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
