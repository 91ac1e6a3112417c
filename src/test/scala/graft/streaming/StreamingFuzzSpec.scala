package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** Randomized streaming↔batch differential: the fixed specs prove
  * equivalence for ONE window geometry each; here seeded random
  * width/slide/gap choices drive the same streaming plans through
  * AvailableNow and diff them against the batch computation of the
  * identical expression. Catches watermark/window-assignment edge cases a
  * pinned geometry can't (e.g. widths that don't divide the hour, slides
  * producing overlapping assignment counts, gaps at session boundaries). */
class StreamingFuzzSpec extends SparkSpec {

  private def dec(c: org.apache.spark.sql.Column) =
    c.cast(org.apache.spark.sql.types.DecimalType(18, 2))

  test("tumbling counts match batch for random non-round widths") {
    val rnd = new scala.util.Random(7)
    val widths = (1 to 3).map(_ => s"${3 + rnd.nextInt(50)} minutes")
    for (w <- widths) {
      val streamed = EventStreams.runToCompletion(spark, sfDir)(
          EventStreams.tumblingCounts(_, w))
        .select("win_start", "event_type", "n", "total").collect().toSet
      val batch = Tables.events(spark, sfDir)
        .groupBy(window(col("ts"), w), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("total"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"), col("total"))
        .collect().toSet
      assert(streamed === batch, s"tumbling width=$w")
    }
  }

  test("sliding counts match batch for random width/slide pairs (slide divides width)") {
    val rnd = new scala.util.Random(11)
    // Spark requires... nothing, but non-divisible pairs produce windows
    // starting at slide-aligned offsets — same rule in both plans; test
    // both a divisible and a non-divisible pair
    val pairs = (1 to 2).map { _ =>
      val slide = 2 + rnd.nextInt(9)
      val width = slide * (2 + rnd.nextInt(3)) + (if (rnd.nextBoolean()) 1 else 0)
      (s"$width minutes", s"$slide minutes")
    }
    for ((w, s) <- pairs) {
      val streamed = EventStreams.runToCompletion(spark, sfDir)(
          EventStreams.slidingCounts(_, w, s))
        .select("win_start", "event_type", "n").collect().toSet
      val batch = Tables.events(spark, sfDir)
        .groupBy(window(col("ts"), w, s), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"))
        .collect().toSet
      assert(streamed === batch, s"sliding width=$w slide=$s")
    }
  }

  test("session windows match batch for random gaps") {
    val rnd = new scala.util.Random(13)
    val gaps = (1 to 2).map(_ => s"${5 + rnd.nextInt(80)} minutes")
    for (g <- gaps) {
      val streamed = EventStreams.runToCompletion(spark, sfDir)(
          EventStreams.sessionAgg(_, g, watermark = Some("30 minutes")))
        .collect().toSet
      val batch = EventStreams.sessionAgg(Tables.events(spark, sfDir), g)
        .collect().toSet
      assert(streamed === batch, s"session gap=$g")
    }
  }
}
