package graft.layout

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Composite (multi-column) MERGE keys — `MergeTable.mergeKeys`: bucket
  * placement, the ANSI duplicate-source check, the classification join,
  * `readForKeys` pruning, CDC, and evolution guards all over the key
  * TUPLE. Single-key behavior is pinned unchanged by every pre-existing
  * suite (merge() delegates to mergeKeys(Seq(key))). */
class MergeCompositeKeySpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    graft.util.Cleanup.registerTempDir(
      java.nio.file.Files.createTempDirectory(s"ck_$tag")).toString + "/t"

  test("create/update/delete over a (id, date) composite key; read/readAt/changesBetween agree with a model") {
    val dir = freshDir("basic")
    // two rows share id=1 but differ in date — a single-column key would
    // collapse them; the composite keeps them distinct
    val base = Seq(
      (1L, "2026-01-01", 10.0, "create"),
      (1L, "2026-01-02", 11.0, "create"),
      (2L, "2026-01-01", 20.0, "create"))
      .toDF("id", "date", "v", "op_flag")
    MergeTable.mergeKeys(spark, dir, base, Seq("id", "date"), numBuckets = 4)
    assert(MergeTable.tableKeys(dir) === Seq("id", "date"))
    intercept[UnsupportedOperationException](MergeTable.tableKey(dir))

    val delta = Seq(
      (1L, "2026-01-01", 15.0, "update"),  // touches ONE of id=1's rows
      (1L, "2026-01-02", 0.0, "delete"),
      (3L, "2026-01-01", 30.0, "create"))
      .toDF("id", "date", "v", "op_flag")
    MergeTable.mergeKeys(spark, dir, delta, Seq("id", "date"))
    val got = MergeTable.read(spark, dir).select("id", "date", "v")
      .as[(Long, String, Double)].collect().toSet
    assert(got === Set((1L, "2026-01-01", 15.0), (2L, "2026-01-01", 20.0),
      (3L, "2026-01-01", 30.0)))

    // time travel sees the pre-delta tuple states
    val v0 = MergeTable.readAt(spark, dir, 0).select("id", "date", "v")
      .as[(Long, String, Double)].collect().toSet
    assert(v0 === Set((1L, "2026-01-01", 10.0), (1L, "2026-01-02", 11.0),
      (2L, "2026-01-01", 20.0)))

    // CDC classifies per TUPLE: update, delete, insert — id=2 untouched
    val cdc = MergeTable.changesBetween(spark, dir, 0, 1)
      .select(col("op_flag"), col("id"), col("date"), col("v"))
      .as[(String, Long, String, Double)].collect().toSet
    assert(cdc === Set(("update", 1L, "2026-01-01", 15.0),
      ("delete", 1L, "2026-01-02", 11.0), ("insert", 3L, "2026-01-01", 30.0)))
  }

  test("duplicate TUPLE in one batch rejected; same first column with distinct second accepted") {
    val dir = freshDir("dup")
    val ok = Seq((1L, "a", 1.0, "create"), (1L, "b", 2.0, "create"))
      .toDF("id", "date", "v", "op_flag")
    MergeTable.mergeKeys(spark, dir, ok, Seq("id", "date"), numBuckets = 2)
    val dup = Seq((1L, "a", 3.0, "update"), (1L, "a", 4.0, "update"))
      .toDF("id", "date", "v", "op_flag")
    val e = intercept[IllegalArgumentException](
      MergeTable.mergeKeys(spark, dir, dup, Seq("id", "date")))
    assert(e.getMessage.contains("duplicate keys"))
    // null in ANY key part rejected
    val nulls = Seq((Some(1L), None: Option[String], 5.0, "update"))
      .toDF("id", "date", "v", "op_flag")
    val e2 = intercept[IllegalArgumentException](
      MergeTable.mergeKeys(spark, dir, nulls, Seq("id", "date")))
    assert(e2.getMessage.contains("non-null"))
  }

  test("readForKeys prunes to the TUPLE-hash buckets (tuple hash != head-column hash)") {
    val dir = freshDir("prune")
    val n = 64
    val base = (0 until n).map(i => (i.toLong, s"d${i % 4}", i * 1.0, "create"))
      .toDF("id", "date", "v", "op_flag")
    MergeTable.mergeKeys(spark, dir, base, Seq("id", "date"), numBuckets = 8)
    val probe = Seq((7L, "d3"), (12L, "d0")).toDF("a", "b")
    val got = MergeTable.readForKeys(spark, dir, probe)
      .select("id", "date").as[(Long, String)].collect().toSet
    assert(got.contains((7L, "d3")) && got.contains((12L, "d0")))
    // pruned: strictly fewer rows than the table (some bucket untouched)
    assert(got.size < n)
    // arity mismatch fails loudly, not silently mis-hashing
    val e = intercept[IllegalArgumentException](
      MergeTable.readForKeys(spark, dir, Seq(7L).toDF("a")))
    assert(e.getMessage.contains("readForKeys"))
  }

  test("evolution guards cover every key part; rename of one key part re-keys the manifest") {
    val dir = freshDir("evo")
    val base = Seq((1L, "a", 1.0, "create")).toDF("id", "date", "v", "op_flag")
    MergeTable.mergeKeys(spark, dir, base, Seq("id", "date"), numBuckets = 2)
    intercept[IllegalArgumentException](MergeTable.alterDropColumn(dir, "date"))
    intercept[IllegalArgumentException](
      MergeTable.alterWidenColumn(dir, "id",
        org.apache.spark.sql.types.DecimalType(20, 0)))
    MergeTable.alterRenameColumn(dir, "date", "day")
    assert(MergeTable.tableKeys(dir) === Seq("id", "day"))
    // merges address the renamed key; data placement is untouched
    val delta = Seq((1L, "a", 9.0, "update")).toDF("id", "day", "v", "op_flag")
    MergeTable.mergeKeys(spark, dir, delta, Seq("id", "day"))
    assert(MergeTable.read(spark, dir).select("v").as[Double].collect().toSeq
      === Seq(9.0))
  }

  test("random composite-key op sequences match a tuple-keyed collections model") {
    val rnd = new scala.util.Random(31)
    for (t <- 1 to 2) {
      val dir = freshDir(s"fuzz$t")
      var model = Map.empty[(Long, String), Double]
      var history = Vector.empty[Map[(Long, String), Double]]
      val nCommits = 3 + rnd.nextInt(3)
      for (c <- 0 until nCommits) {
        val tuples = rnd.shuffle(
          (for (i <- 0L to 8L; d <- Seq("x", "y", "z")) yield (i, d)).toList)
          .take(1 + rnd.nextInt(10))
        val ops = tuples.map { case (i, d) =>
          (i, d, (i * 100 + c).toDouble,
            Seq("create", "update", "delete")(rnd.nextInt(3)))
        }
        MergeTable.mergeKeys(spark, dir,
          ops.toDF("id", "date", "v", "op_flag"), Seq("id", "date"),
          numBuckets = 4)
        ops.foreach { case (i, d, v, op) =>
          if (op == "delete") model -= ((i, d)) else model += (i, d) -> v
        }
        history :+= model
        val got = MergeTable.read(spark, dir).select("id", "date", "v")
          .as[(Long, String, Double)].collect()
          .map { case (i, d, v) => (i, d) -> v }.toMap
        assert(got === model, s"table $t after commit $c")
      }
      history.zipWithIndex.foreach { case (m, v) =>
        val got = MergeTable.readAt(spark, dir, v.toLong)
          .select("id", "date", "v").as[(Long, String, Double)].collect()
          .map { case (i, d, x) => (i, d) -> x }.toMap
        assert(got === m, s"table $t readAt v$v")
      }
    }
  }

  test("upsertBatchKeys: composite-key streaming sink skips replayed batchIds (exactly-once recipe)") {
    val dir = freshDir("batch")
    val sink = MergeTable.upsertBatchKeys(dir, Seq("id", "date"), numBuckets = 2)
    sink(Seq((1L, "a", 1.0, "create"), (1L, "b", 2.0, "create"))
      .toDF("id", "date", "v", "op_flag"), 0L)
    sink(Seq((1L, "a", 9.0, "update")).toDF("id", "date", "v", "op_flag"), 1L)
    // a RETRIED micro-batch (same id, different payload) must be ignored
    sink(Seq((1L, "a", 777.0, "update")).toDF("id", "date", "v", "op_flag"), 1L)
    val got = MergeTable.read(spark, dir).select("id", "date", "v")
      .as[(Long, String, Double)].collect().toSet
    assert(got === Set((1L, "a", 9.0), (1L, "b", 2.0)))
    assert(MergeTable.lastBatchId(dir) === 1L)
  }

  test("composite-key streaming upsert survives a post-commit crash (q141 proof on a tuple key)") {
    // the q141 worst-case window — sink committed, checkpoint didn't —
    // replayed onto a (user_id, event_type) TUPLE-keyed table: the
    // harness inside streamUpsertCrashResume asserts one committed
    // version per applied batch (the replayed batch is SKIPPED), and the
    // final state must equal an uninterrupted run's
    val sfDir = "/root/testdata/sf0.001"
    val crashed = freshDir("ckcrash")
    val clean = freshDir("ckclean")
    val keys = Seq("user_id", "event_type")
    val a = graft.streaming.EventStreams
      .streamUpsertCrashResume(spark, sfDir, crashed, keys = keys)
      .select("user_id", "event_type", "event_id", "value")
      .as[(Long, String, Long, Double)].collect().toSet
    val b = graft.streaming.EventStreams
      .streamUpsert(spark, sfDir, clean, keys = keys)
      .select("user_id", "event_type", "event_id", "value")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(a === b && a.nonEmpty)
    assert(MergeTable.tableKeys(crashed) === keys)
  }

  test("key-shape mismatch on an existing table fails loudly") {
    val dir = freshDir("shape")
    MergeTable.mergeKeys(spark, dir,
      Seq((1L, "a", 1.0, "create")).toDF("id", "date", "v", "op_flag"),
      Seq("id", "date"), numBuckets = 2)
    val e = intercept[IllegalArgumentException](
      MergeTable.merge(spark, dir,
        Seq((1L, "a", 2.0, "update")).toDF("id", "date", "v", "op_flag"),
        "id"))
    assert(e.getMessage.contains("keyed by"))
  }
}
