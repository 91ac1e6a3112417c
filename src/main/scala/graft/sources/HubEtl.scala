package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StringType}

import graft.ops.Relational

/** The reference's end-to-end job (SURVEY.md §3 Traces 1-3) as one
  * composable pipeline over the S1/S2 sources: resolve → extract →
  * transform → merge-diff → sink.
  */
object HubEtl {

  /** S3 (main.py:32-48): keyed single-row lookup with the reference's
    * hard failure on a missing/empty result. */
  def resolveAssemblyId(assemblies: DataFrame, slug: String): String = {
    val hit = assemblies.filter(col("slug") === lit(slug)).select("id").limit(1).collect()
    require(hit.nonEmpty && hit(0).getString(0) != null && hit(0).getString(0).nonEmpty,
      s"Assembly not found for slug '$slug'") // main.py:43-48
    hit(0).getString(0)
  }

  /** Target events via the paginated DSv2 source (S2). */
  def targetEvents(spark: SparkSession, pagesDir: String): DataFrame =
    spark.read.format("graft.sources.PaginatedJsonSource")
      .option("path", pagesDir).load()

  /** Trace 2 (main.py:105-165): the merge plan. Join key is source `code`
    * vs target `tags[0]`, both lowered (main.py:135,137,152,155);
    * `try_element_at(...,1)` is null on empty tags (ANSI-mode `element_at` throws) where the reference would
    * IndexError (SURVEY.md §2.3 guard). */
  def mergePlan(events: DataFrame, target: DataFrame): DataFrame = {
    val tgt = target.withColumn("tag0", try_element_at(col("tags"), lit(1)))
    Relational.mergePlan(events, tgt, srcKey = "code", tgtKey = "tag0", tgtId = "id")
      .withColumnRenamed("target_id", "hub_id")
  }

  /** Trace 3 / K1-K4 (main.py:171-260): the load step as an idempotent
    * partitioned parquet MERGE sink. The reference's per-row form-submit
    * error scrape (K4, main.py:234-247) becomes a status column: a sink
    * "message" containing `invalid` flags the row. The reference's
    * `.find("invalid") > 0` misses a match at index 0 (SURVEY.md §2.1 K4);
    * we implement the intended `>= 0` (instr > 0 in 1-based SQL terms). */
  def validate(plan: DataFrame, messageCol: String = "sink_message"): DataFrame = {
    val msg = if (plan.columns.contains(messageCol)) col(messageCol) else lit("")
    plan.withColumn("valid", !(instr(lower(coalesce(msg, lit(""))), "invalid") > 0))
  }

  def writePlan(plan: DataFrame, outDir: String): Unit =
    validate(plan).write.mode("overwrite").partitionBy("op_flag").parquet(outDir)

  /** Trace 1 (main.py:32-48): edge fetch → spool. The reference resolves
    * its inputs over live HTTP on the driver; the engine analogue fetches
    * once, spools to a local file, and lets the S1/S2 scans read the spool
    * — the fetch is driver-side BY DESIGN (one small control-plane request,
    * not data-plane work; the data-parallel part is the scan of the spool).
    * Accepts any java.net.URL scheme: http(s) in production, file: in
    * tests (this container has no egress). */
  def fetchToSpool(url: String, spoolDir: Path, fileName: String): Path = {
    Files.createDirectories(spoolDir)
    val target = spoolDir.resolve(fileName)
    val in = new java.net.URI(url).toURL.openStream()
    try Files.copy(in, target, StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    target
  }

  /** Pluggable row-at-a-time sink (K1): the engine analogue of the
    * reference's per-event Selenium form submit (main.py:192-247).
    * Implementations must be Serializable (shipped to executors) and are
    * constructed once per partition — amortized connection setup, exactly
    * like a JDBC/REST sink template. */
  trait RowSink extends Serializable {
    /** Submit one row; returns the sink's message text ("" = clean). The
      * reference scrapes the form's `messages` element after each submit
      * (main.py:234-240); a message containing "invalid" marks the row
      * failed (K4). Exceptions are caught per row. */
    def submit(op: String, row: Row): String
    /** Publish one successfully-submitted row (K3, main.py:251-256). */
    def publish(row: Row): Unit = ()
  }

  /** K1/K3/K4 faithful load step: row-at-a-time submit with per-row error
    * capture, unknown-op-flag abort, and a publish gate. Returns the input
    * rows annotated with (sink_message, valid, published, load_status) —
    * the distributed analogue of the reference's per-event scrape loop:
    *
    *  - per-row try/catch → status column, not a job failure: one bad row
    *    must not kill a 100 TB load (status = "error");
    *  - `valid` uses the INTENDED `indexOf >= 0` containment (the
    *    reference's `.find("invalid") > 0` misses a match at index 0 —
    *    SURVEY.md §2.1 K4);
    *  - an unknown op_flag stops the remaining rows of its PARTITION
    *    (status "unknown_op", then "skipped_after_unknown_op") — the
    *    single-threaded reference `break`s out of the whole loop
    *    (main.py:201-204); per-partition abort is the data-parallel
    *    equivalent (each task is the unit of sequential work);
    *  - "delete" is a first-class op (main.py:182-188: the reference runs
    *    the delete loop through the same browser session before the
    *    create/update loop), gated by `autoDelete` (AUTO_DELETE_EVENTS,
    *    settings.py.template:22): gate off ⇒ delete rows pass through
    *    untouched as "delete_skipped" — skipped, not unknown;
    *  - publish runs only when `autoPublish` AND the row was valid
    *    (main.py:251 `if AUTO_PUBLISH and not is_invalid`), and never for
    *    deletes (the reference publishes after the create/update form
    *    submit only, main.py:251-256).
    *
    *  - `maxRowsPerSecond` (K6, main.py:179,188,232,255: the reference
    *    sleeps 1-2 s around every sink operation to pace a fragile
    *    endpoint): when > 0, each PARTITION paces its submits to that
    *    rate — before a submit, the task sleeps until elapsed time covers
    *    ops_done/rate. The pacing unit is the task because the task is
    *    the sequential unit (the reference's single browser session ≙ one
    *    partition); for a GLOBAL budget against an API, `coalesce(n)` the
    *    plan so total throughput is n × maxRowsPerSecond. Skipped rows
    *    (delete_skipped, post-abort) are not paced — only real sink ops,
    *    matching where the reference sleeps. 0 = unlimited (default).
    *
    * mapPartitions (not foreachPartition) so the per-row statuses come BACK
    * as a DataFrame — auditable, joinable, and writable to a status table. */
  def loadRows(plan: DataFrame, sink: RowSink, opCol: String = "op_flag",
               knownOps: Seq[String] = Seq("create", "update", "delete"),
               autoPublish: Boolean = true,
               autoDelete: Boolean = true,
               maxRowsPerSecond: Double = 0.0): DataFrame = {
    val spark = plan.sparkSession
    val outSchema = plan.schema
      .add("sink_message", StringType, nullable = true)
      .add("valid", BooleanType, nullable = true)
      .add("published", BooleanType, nullable = false)
      .add("load_status", StringType, nullable = false)
    val opIdx = plan.schema.fieldIndex(opCol)
    val known = knownOps.toSet
    val rate = maxRowsPerSecond
    val rdd = plan.rdd.mapPartitions { rows =>
      var aborted = false
      var interruptAbort = false
      var opsDone = 0L
      var t0 = 0L // first-op time; pacing starts at the first real sink op
      rows.map { r =>
        val op = Option(r.get(opIdx)).map(_.toString).getOrElse("")
        if (interruptAbort) {
          Row.fromSeq(r.toSeq ++ Seq(null, null, false, "skipped_interrupt"))
        } else if (aborted) {
          Row.fromSeq(r.toSeq ++ Seq(null, null, false, "skipped_after_unknown_op"))
        } else if (!known.contains(op)) {
          aborted = true
          Row.fromSeq(r.toSeq ++ Seq(null, null, false, "unknown_op"))
        } else if (op == "delete" && !autoDelete) {
          Row.fromSeq(r.toSeq ++ Seq(null, null, false, "delete_skipped"))
        } else {
          var interrupted = false
          if (rate > 0) {
            if (t0 == 0L) t0 = System.nanoTime()
            // token-bucket with no burst: op k may start at t0 + k/rate
            val earliest = t0 + (opsDone / rate * 1e9).toLong
            val wait = earliest - System.nanoTime()
            // a task interrupt (kill / speculation) during the pacing
            // sleep must not surface as a bare InterruptedException task
            // failure with no per-row status: restore the interrupt flag
            // and abort the rest of the partition with an explicit status
            if (wait > 0) {
              try Thread.sleep(wait / 1000000L, (wait % 1000000L).toInt)
              catch { case _: InterruptedException =>
                Thread.currentThread().interrupt()
                interrupted = true
                interruptAbort = true
              }
            }
            if (!interrupted) opsDone += 1
          }
          if (interrupted) {
            Row.fromSeq(r.toSeq ++ Seq(null, null, false, "skipped_interrupt"))
          } else {
            val (msg, status) =
              try (sink.submit(op, r), "submitted")
              catch { case e: Exception =>
                (s"error: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}", "error")
              }
            val valid = status == "submitted" &&
              !(msg.toLowerCase.indexOf("invalid") >= 0)
            val published = autoPublish && valid && op != "delete" &&
              (try { sink.publish(r); true } catch { case _: Exception => false })
            Row.fromSeq(r.toSeq ++
              Seq(msg, valid, published, if (valid) status else if (status == "error") "error" else "invalid"))
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** The whole job: schedule.json + hub pages → op-flagged merge plan. */
  def run(spark: SparkSession, schedulePath: String, pagesDir: String,
          rooms: Map[Int, String] = Pretalx.defaultRooms): DataFrame = {
    val schedule = Pretalx.readSchedule(spark, schedulePath)
    val events = Pretalx.talksToEvents(
      Pretalx.talks(schedule), Pretalx.speakerMapOf(schedule), rooms)
    mergePlan(events, targetEvents(spark, pagesDir))
  }
}
