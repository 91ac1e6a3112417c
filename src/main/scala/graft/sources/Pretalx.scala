package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** S1 (main.py:96-97): the pretalx `schedule.json` scan and the reference's
  * Transform phase (main.py:105-144) re-expressed as declarative Spark.
  *
  * The reference GETs one URL and walks `list[dict]`s in Python; here the
  * document lands as a file (driver-side fetch at the edge — the engine
  * never does network I/O inside a task) and every per-talk loop becomes a
  * Column expression over the exploded talks array:
  *  - speaker-code→name mapping (J1, main.py:107-110,123) keeps array order
  *    via `transform` over a broadcast-built map literal — no explode/
  *    re-collect round trip, no shuffle;
  *  - room lookup (J2, main.py:120) is `element_at` on a map literal with
  *    `coalesce` replacing the reference's KeyError;
  *  - timestamps (F4, main.py:128) parse with an offset-aware pattern;
  *  - null guards (P3, main.py:116,120,122,132) become `coalesce`.
  */
object Pretalx {

  /** MAP_ROOMS (settings.py.template:7-11). */
  val defaultRooms: Map[Int, String] =
    Map(1 -> "CDC Triangle", 2 -> "CDC Circle", 3 -> "Room 3")

  /** Read one schedule.json document with the explicit schema (no inference
    * job — at scale schema inference is a full extra pass over the data). */
  def readSchedule(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true)
      .schema(Tables.pretalxScheduleSchema).json(path)

  /** talks array exploded to one row per talk. */
  def talks(schedule: DataFrame): DataFrame =
    schedule.select(explode(col("talks")).as("t")).select("t.*")

  /** speakers array exploded to the (code, name) dimension. */
  def speakersDim(schedule: DataFrame): DataFrame =
    schedule.select(explode(col("speakers")).as("s"))
      .select(col("s.code").as("code"), col("s.name").as("name"))

  /** The talk→event projection (main.py:114-132). `speakerMap` and `rooms`
    * are small dimensions collected once on the driver and shipped as map
    * literals — the Spark form of the reference's prebuilt dict (a
    * hand-rolled broadcast hash join, main.py:107-110). Array order of
    * `speakers` is preserved for free by `transform`. */
  def talksToEvents(talks: DataFrame, speakerMap: Map[String, String],
                    rooms: Map[Int, String] = defaultRooms): DataFrame = {
    val roomMap = typedLit(rooms)
    val spkMap = typedLit(speakerMap)
    val spk = transform(coalesce(col("speakers"), array()),
      c => coalesce(element_at(spkMap, c), c))
    talks.select(
      coalesce(col("title"), lit("")).as("name"),            // P3 main.py:116
      lit("CDC").as("location"),                             // P2 main.py:118
      coalesce(element_at(roomMap, col("room")), lit("")).as("room_name"), // J2
      lit("en").as("language"),                              // P2 main.py:121
      coalesce(col("abstract"), lit("")).as("abstract"),     // P3 main.py:122
      spk.as("speakers"),                                    // J1 main.py:123
      lit("").as("description_de"),                          // P2 main.py:124
      concat(                                                // F2/F3 main.py:125-127
        lit("Speaker"),
        when(size(spk) === 1, lit("")).otherwise(lit("s")),
        lit(": "), array_join(spk, ", ")).as("description_en"),
      to_timestamp(col("start"), "yyyy-MM-dd'T'HH:mm:ssXXX").as("schedule_start"), // F4
      col("duration"),
      coalesce(col("code"), lit("")).as("code"))             // P3 main.py:132
  }

  /** Driver-side collect of the speakers dimension into the map literal —
    * the build side is tiny (conference speakers); the *probe* side (talks,
    * or at 100 TB any fact table) never leaves executors. Deterministic
    * min-name pick per code: a raw `.toMap` would keep whichever duplicate
    * arrived last (partition-order dependent), and the q93 oracle's
    * DuckDB `map()` would *error* outright on a duplicate key — both
    * sides dedupe the same way instead. */
  def speakerMapOf(schedule: DataFrame): Map[String, String] =
    speakersDim(schedule).groupBy(col("code"))
      .agg(org.apache.spark.sql.functions.min(col("name")).as("name"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
}
