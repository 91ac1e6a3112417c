package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** r19: [[EventStreams.spoolRun]] memoizes each source path's schema (it
  * was re-read from parquet footers on every run). Pin that the cached
  * path is invisible semantically: two runs over the same fresh source
  * dir — the second one served entirely from the cache — both match the
  * batch result exactly, including a non-trivial `ts` encoding that must
  * round-trip through the memoized schema into normalizeTs. */
class StreamSchemaCacheSpec extends SparkSpec {

  test("repeat spoolRun over one source dir (schema served from cache) matches batch") {
    val src = java.nio.file.Files.createTempDirectory("schema_cache_src").toString
    spark.range(1000).select(
        col("id").as("event_id"),
        (col("id") % 7).as("user_id"),
        concat(lit("t"), (col("id") % 3).cast("string")).as("event_type"),
        (col("id") * 1.5).as("value"),
        timestamp_micros(lit(1700000000000000L) + col("id") * 60000000L).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(src)

    def run() = EventStreams.spoolRun(spark, src)(
        _.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("v")))
      .collect().toSet
    val first = run()
    val second = run() // schema now memoized — no footer read on this path
    val batch = spark.read.parquet(src)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .collect().toSet
    assert(first.nonEmpty)
    assert(first === batch)
    assert(second === batch)
  }
}
