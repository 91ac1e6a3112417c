package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

class EventStreamsSpec extends SparkSpec {

  test("tumblingCounts over AvailableNow equals the batch windowed aggregation") {
    val streamed = EventStreams.runToCompletion(spark, sfDir)(EventStreams.tumblingCounts(_))
      .select("win_start", "event_type", "n", "total").collect().toSet
    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total"))
      .collect().toSet
    assert(streamed === batch)
  }

  test("stream-stream interval join equals the batch self-join") {
    val streamed = EventStreams.runToCompletion(spark, sfDir, "append")(
        EventStreams.intervalJoin(_, "view", "click"))
      .collect().toSet
    val ev = Tables.events(spark, sfDir)
    val l = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("l_id"), col("user_id"), col("ts").as("l_ts"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("r_id"), col("user_id").as("ru"),
        col("ts").as("r_ts"))
    val batch = l.join(r, col("user_id") === col("ru") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 30 minutes"))
      .select(col("user_id"), col("l_id"), col("r_id"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts"))).as("lag_us"))
      .collect().toSet
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("stream-static broadcast join equals the batch join+aggregate") {
    val dim = EventStreams.typeDim(spark)
    val streamed = EventStreams.runToCompletion(spark, sfDir)(
        EventStreams.streamStaticEnrich(_, dim))
      .collect().toSet
    val batch = Tables.events(spark, sfDir).join(dim, Seq("event_type"))
      .groupBy(window(col("ts"), "15 minutes"), col("category"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          * col("weight")).cast("double").as("wtotal"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("category"), col("n"), col("wtotal"))
      .collect().toSet
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("foreachBatch parquet sink lands every row exactly once, keyed by batch id") {
    val out = java.nio.file.Files.createTempDirectory("stream_sink_out").toString
    EventStreams.streamToParquet(spark, sfDir, out)
    val back = spark.read.parquet(out)
    val batch = Tables.events(spark, sfDir)
    assert(back.count() === batch.count())
    assert(back.select("event_id").distinct().count() === batch.count())
  }

  test("update-mode spool is latest-wins when a key re-emits across micro-batches") {
    // two files → two micro-batches (maxFilesPerTrigger=1); the same users
    // appear in both, so update mode re-emits their keys and the
    // reconstruction must keep only the later (complete) count per key
    val ev = Tables.events(spark, sfDir).filter(col("user_id") < 20)
    val dir = java.nio.file.Files.createTempDirectory("upd_reemit").toString
    ev.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$dir/f0")
    ev.filter(col("event_id") % 2 === 1).coalesce(1).write.parquet(s"$dir/f1")
    // flatten into one dir of two files
    val merged = java.nio.file.Files.createTempDirectory("upd_reemit_src").toString
    spark.read.parquet(s"$dir/f0").coalesce(1).write.mode("append").parquet(merged)
    spark.read.parquet(s"$dir/f1").coalesce(1).write.mode("append").parquet(merged)
    val streamed = EventStreams.spoolRun(spark, merged, outputMode = "update",
        updateKeys = Seq("user_id"), maxFilesPerTrigger = Some(1))(
        _.groupBy("user_id").agg(count(lit(1)).as("n")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }

  test("streaming dedup emits each event_id at most once") {
    val out = EventStreams.runToCompletion(spark, sfDir, outputMode = "append")(
      EventStreams.dedupedEvents(_).select("event_id"))
    val ids = out.collect().map(_.getLong(0))
    assert(ids.length === ids.distinct.length)
    assert(ids.nonEmpty)
  }

  test("streamingDedupRun collapses a doubled delivery to exactly the original table") {
    val deduped = EventStreams.streamingDedupRun(spark, sfDir)
      .select("event_id", "event_type", "user_id").collect().toSet
    val original = Tables.events(spark, sfDir)
      .select("event_id", "event_type", "user_id").collect().toSet
    assert(deduped === original)
  }

  test("stateful dedup survives a post-sink crash: state-store replay keeps exactly-once") {
    val resumed = EventStreams.streamingDedupCrashResume(spark, sfDir)
      .select("event_id", "event_type", "user_id").collect().toSet
    val original = Tables.events(spark, sfDir)
      .select("event_id", "event_type", "user_id").collect().toSet
    assert(resumed === original)
  }

  test("streamOuterJoinRun equals the batch left-join rollup and emits real null-side rows") {
    val streamed = EventStreams.streamOuterJoinRun(spark, sfDir, "purchase", "click")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = Tables.events(spark, sfDir)
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("l_id"), col("user_id"), col("ts").as("l_ts"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("r_id"), col("user_id").as("ru"),
        col("ts").as("r_ts"))
    val mt = ev.agg(max(col("ts")).as("mt"))
    val batch = l.join(r, col("user_id") === col("ru") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr("INTERVAL 30 minutes"), "leftOuter")
      .groupBy(col("l_id"), col("user_id"), col("l_ts"))
      .agg(count(col("r_id")).as("n_matches"))
      .crossJoin(mt)
      .filter(col("l_ts") < col("mt") - expr("INTERVAL 5 days"))
      .select(col("l_id"), col("user_id"), col("n_matches"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(streamed === batch)
    // the point of the OUTER form: unmatched purchases are present with 0
    assert(streamed.exists(_._3 == 0L), "expected at least one null-side emission")
    assert(streamed.exists(_._3 > 0L))
  }

  test("stream-stream outer join survives a post-sink crash: symmetric join state replays exactly-once") {
    // crash after batch 2's sink write but before its checkpoint commit,
    // resume, and require the settled rollup to equal the uninterrupted
    // run bit for bit — including null-side rows emitted AFTER the crash
    // point off the rebuilt watermark state
    val resumed = EventStreams.streamOuterJoinCrashResume(
        spark, sfDir, "purchase", "click")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val clean = EventStreams.streamOuterJoinRun(spark, sfDir, "purchase", "click")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(resumed === clean)
    assert(resumed.exists(_._3 == 0L), "expected null-side rows post-resume")
  }
}
