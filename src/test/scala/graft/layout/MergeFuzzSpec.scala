package graft.layout

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized differential for the transactional MERGE table — the most
  * stateful component in the engine. Random create/update/delete batch
  * sequences run against a plain collections model of upsert semantics
  * (create/update = upsert; delete-of-absent = no-op; one row per key per
  * batch, the ANSI MERGE precondition the operator itself enforces).
  * After EVERY commit: read() ≡ model; afterwards readAt(v) ≡ the model's
  * historical state at v, and changesBetween(v1, v2) ≡ the model diff —
  * insert/update/delete per key whose value actually changed. */
class MergeFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("random op sequences: read / readAt / changesBetween match a collections model") {
    val rnd = new scala.util.Random(21)
    for (t <- 1 to 3) {
      val dir = graft.util.Cleanup.registerTempDir(
        java.nio.file.Files.createTempDirectory(s"merge_fuzz_$t")).toString + "/tbl"
      var model = Map.empty[Long, Double]
      var history = Vector.empty[Map[Long, Double]]
      val nCommits = 4 + rnd.nextInt(3)
      for (c <- 0 until nCommits) {
        val keys = rnd.shuffle((0L to 30L).toList).take(1 + rnd.nextInt(12))
        val ops = keys.map { k =>
          (k, (k * 100 + c).toDouble, // exact in binary, distinct per commit
            Seq("create", "update", "delete")(rnd.nextInt(3)))
        }
        val batch = ops.toDF("k", "v", "op_flag")
        MergeTable.merge(spark, dir, batch, "k", numBuckets = 4)
        ops.foreach { case (k, v, op) =>
          if (op == "delete") model -= k else model += k -> v
        }
        history :+= model
        val got = MergeTable.read(spark, dir).select("k", "v")
          .as[(Long, Double)].collect().toMap
        assert(got === model, s"table $t after commit $c")
      }
      // time travel at every version
      history.zipWithIndex.foreach { case (m, v) =>
        val got = MergeTable.readAt(spark, dir, v).select("k", "v")
          .as[(Long, Double)].collect().toMap
        assert(got === m, s"table $t readAt v$v")
      }
      // CDC between random ordered version pairs
      for (_ <- 1 to 4) {
        val a = rnd.nextInt(nCommits)
        val b = rnd.nextInt(nCommits)
        val (v1, v2) = (math.min(a, b), math.max(a, b))
        if (v1 < v2) {
          val (m1, m2) = (history(v1), history(v2))
          val exp = (m1.keySet ++ m2.keySet).flatMap { k =>
            (m1.get(k), m2.get(k)) match {
              case (None, Some(v))              => Some((k, v, "insert"))
              case (Some(v), None)              => Some((k, v, "delete"))
              case (Some(x), Some(y)) if x != y => Some((k, y, "update"))
              case _                            => None
            }
          }
          val got = MergeTable.changesBetween(spark, dir, v1, v2)
            .select(col("k"), col("v"), col("op_flag"))
            .as[(Long, Double, String)].collect().toSet
          assert(got === exp, s"table $t changes v$v1 -> v$v2")
        }
      }
    }
  }

  test("random MOR/COW mixes: read / readAt / changesBetween match the model (r18)") {
    // the r18 merge-on-read tier drawn against the SAME collections model:
    // each commit randomly picks COW merge, MOR mergeSmall, softDelete of
    // a random live key, or a compaction (full / compactStale) — MOR and
    // COW must be observationally identical at every version
    val rnd = new scala.util.Random(1803)
    for (t <- 1 to 3) {
      val dir = graft.util.Cleanup.registerTempDir(
        java.nio.file.Files.createTempDirectory(s"merge_mor_fuzz_$t"))
        .toString + "/tbl"
      var model = Map.empty[Long, Double]
      var history = Vector.empty[Map[Long, Double]]
      val nCommits = 6 + rnd.nextInt(4)
      var c = 0
      while (c < nCommits) {
        val action = rnd.nextInt(10)
        val committed: Boolean =
          if (action < 4 || model.isEmpty) { // COW or MOR batch
            val keys = rnd.shuffle((0L to 30L).toList).take(1 + rnd.nextInt(12))
            val ops = keys.map { k =>
              (k, (k * 100 + c).toDouble,
                Seq("create", "update", "delete")(rnd.nextInt(3)))
            }
            val batch = ops.toDF("k", "v", "op_flag")
            if (action % 2 == 0)
              MergeTable.merge(spark, dir, batch, "k", numBuckets = 4)
            else
              MergeTable.mergeSmall(spark, dir, batch, "k", numBuckets = 4)
            ops.foreach { case (k, v, op) =>
              if (op == "delete") model -= k else model += k -> v
            }
            true
          } else if (action < 7) { // soft delete of 1-3 live keys
            val victims = rnd.shuffle(model.keySet.toList)
              .take(1 + rnd.nextInt(3))
            val v = MergeTable.softDelete(spark, dir,
              col("k").isin(victims: _*))
            if (v.nonEmpty) { victims.foreach(model -= _); true } else false
          } else if (action < 8) { // delta-shaped maintenance
            MergeTable.compactStale(spark, dir,
              maxGroups = 2, maxDeltaRuns = 2).nonEmpty
          } else if (action < 9) { // full rewrite
            MergeTable.compact(spark, dir); true
          } else { // bucket-count resize (r18 REBUCKET)
            MergeTable.rebucket(spark, dir, Seq(2, 4, 8)(rnd.nextInt(3)))
            true
          }
        if (committed) {
          history :+= model
          val got = MergeTable.read(spark, dir).select("k", "v")
            .as[(Long, Double)].collect().toMap
          assert(got === model, s"mor table $t after commit $c")
          c += 1
        }
      }
      history.zipWithIndex.foreach { case (m, v) =>
        val got = MergeTable.readAt(spark, dir, v.toLong).select("k", "v")
          .as[(Long, Double)].collect().toMap
        assert(got === m, s"mor table $t readAt v$v")
      }
      for (_ <- 1 to 4) {
        val a = rnd.nextInt(nCommits)
        val b = rnd.nextInt(nCommits)
        val (v1, v2) = (math.min(a, b), math.max(a, b))
        if (v1 < v2) {
          val (m1, m2) = (history(v1), history(v2))
          val exp = (m1.keySet ++ m2.keySet).flatMap { k =>
            (m1.get(k), m2.get(k)) match {
              case (None, Some(v))              => Some((k, v, "insert"))
              case (Some(v), None)              => Some((k, v, "delete"))
              case (Some(x), Some(y)) if x != y => Some((k, y, "update"))
              case _                            => None
            }
          }
          val got = MergeTable.changesBetween(spark, dir, v1, v2)
            .select(col("k"), col("v"), col("op_flag"))
            .as[(Long, Double, String)].collect().toSet
          assert(got === exp, s"mor table $t changes v$v1 -> v$v2")
        }
      }
    }
  }

  test("interleaved-writer fuzz: racing random batches never lose a committed write") {
    val rnd = new scala.util.Random(22)
    for (t <- 1 to 3) {
      val dir = graft.util.Cleanup.registerTempDir(
        java.nio.file.Files.createTempDirectory(s"merge_race_$t")).toString + "/tbl"
      // seed so both racers' updateWhen (matched-row) paths are exercised
      MergeTable.merge(spark, dir,
        (0L to 30L).map(k => (k, -1.0, "create")).toDF("k", "v", "op_flag"),
        "k", numBuckets = 4)
      var model = Map.empty[Long, Double] ++ (0L to 30L).map(_ -> -1.0)
      for (round <- 1 to 3) {
        // two writers with DISJOINT key sets race from the same parent;
        // conflict losers retry (caller policy) until committed, so the
        // final state must contain BOTH batches regardless of who won
        val keysA = rnd.shuffle((0L to 30L).toList).take(1 + rnd.nextInt(8))
        val keysB = rnd.shuffle((0L to 30L).toList.filterNot(keysA.contains))
          .take(1 + rnd.nextInt(8))
        def batchOf(keys: Seq[Long], tag: Int) = keys.map { k =>
          (k, (k * 1000 + round * 10 + tag).toDouble,
            Seq("update", "delete")(rnd.nextInt(2)))
        }
        val opsA = batchOf(keysA, 1)
        val opsB = batchOf(keysB, 2)
        var conflicts = 0
        def writer(ops: Seq[(Long, Double, String)]) = new Thread(() => {
          var done = false
          while (!done) {
            try {
              MergeTable.merge(spark, dir, ops.toDF("k", "v", "op_flag"),
                "k", numBuckets = 4)
              done = true
            } catch {
              case _: MergeTable.ConflictException =>
                conflicts += 1 // benign: retry against the new parent
            }
          }
        })
        val (wa, wb) = (writer(opsA), writer(opsB))
        wa.start(); wb.start(); wa.join(180000); wb.join(180000)
        (opsA ++ opsB).foreach { case (k, v, op) =>
          if (op == "delete") model -= k else model += k -> v
        }
        val got = MergeTable.read(spark, dir).select("k", "v")
          .as[(Long, Double)].collect().toMap
        assert(got === model, s"table $t round $round (conflicts=$conflicts)")
      }
    }
  }

  test("compact racing merge: the CAS loser retries against the NEW manifest — no committed write is ever lost") {
    val rnd = new scala.util.Random(24)
    for (t <- 1 to 2) {
      val dir = graft.util.Cleanup.registerTempDir(
        java.nio.file.Files.createTempDirectory(s"merge_compact_race_$t")).toString + "/tbl"
      MergeTable.merge(spark, dir,
        (0L to 30L).map(k => (k, -1.0, "create")).toDF("k", "v", "op_flag"),
        "k", numBuckets = 4)
      var model = Map.empty[Long, Double] ++ (0L to 30L).map(_ -> -1.0)
      var conflicts = 0
      for (round <- 1 to 3) {
        val keys = rnd.shuffle((0L to 30L).toList).take(3 + rnd.nextInt(8))
        val ops = keys.map(k =>
          (k, (k * 1000 + round).toDouble, Seq("update", "delete")(rnd.nextInt(2))))
        // merger and compactor race from the same parent; each retries on
        // ConflictException by RE-RUNNING (compact re-reads the manifest on
        // every call — a loser that resubmitted its stale precomputed stage
        // would erase the merge's committed rows, which the model catches)
        val merger = new Thread(() => {
          var done = false
          while (!done) {
            try {
              MergeTable.merge(spark, dir, ops.toDF("k", "v", "op_flag"),
                "k", numBuckets = 4)
              done = true
            } catch {
              case _: MergeTable.ConflictException => conflicts += 1
            }
          }
        })
        val compactor = new Thread(() => {
          var done = false
          while (!done) {
            try { MergeTable.compact(spark, dir); done = true }
            catch { case _: MergeTable.ConflictException => conflicts += 1 }
          }
        })
        merger.start(); compactor.start()
        merger.join(180000); compactor.join(180000)
        ops.foreach { case (k, v, op) =>
          if (op == "delete") model -= k else model += k -> v
        }
        val got = MergeTable.read(spark, dir).select("k", "v")
          .as[(Long, Double)].collect().toMap
        assert(got === model, s"table $t round $round (conflicts=$conflicts)")
      }
      // housekeeping after the dust settles must keep the same state
      MergeTable.expireVersions(dir, keepLast = 1)
      MergeTable.vacuum(dir, stageGraceMs = 0L)
      val got = MergeTable.read(spark, dir).select("k", "v")
        .as[(Long, Double)].collect().toMap
      assert(got === model, s"table $t after expire+vacuum")
    }
  }

  test("random evolution ops (drop/rename/widen/add) interleaved with merges: read and readAt match the model at every version") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(25)
    def typeOf(tag: String): DataType = tag match {
      case "int" => IntegerType
      case "long" => LongType
      case "str" => StringType
    }
    for (t <- 1 to 2) {
      val dir = graft.util.Cleanup.registerTempDir(
        java.nio.file.Files.createTempDirectory(s"merge_evo_fuzz_$t")).toString + "/tbl"
      var cols = Vector("a" -> "int", "b" -> "str")
      var fresh = 0
      // model values normalized: numbers as Long, strings as String;
      // a row simply lacks a column it never received (reads as null)
      var model = Map.empty[Long, Map[String, Any]]
      var history = Vector.empty[(Vector[(String, String)], Map[Long, Map[String, Any]])]

      def mkBatch(rows: Seq[(Long, Map[String, Any], String)]) = {
        val schema = StructType(StructField("k", LongType, nullable = false) +:
          cols.map { case (n, tg) => StructField(n, typeOf(tg)) } :+
          StructField("op_flag", StringType, nullable = false))
        val data: Seq[Row] = rows.map { case (k, vals, op) =>
          Row.fromSeq(k +: cols.map { case (n, tg) =>
            vals.get(n).map {
              case v: Long if tg == "int" => v.toInt
              case v => v
            }.orNull
          } :+ op)
        }
        spark.createDataFrame(data.asJava, schema)
      }
      def freshVals(k: Long, step: Int): Map[String, Any] =
        cols.map { case (n, tg) =>
          n -> (if (tg == "str") s"s$step-$k" else (k * 100 + step): Any)
        }.toMap
      def snapshotOf(df: org.apache.spark.sql.DataFrame,
                     atCols: Vector[(String, String)]): Map[Long, Map[String, Any]] =
        df.collect().map { r =>
          val k = r.getLong(r.fieldIndex("k"))
          k -> atCols.flatMap { case (n, tg) =>
            val i = r.fieldIndex(n)
            if (r.isNullAt(i)) None
            else Some(n -> (tg match {
              case "int" => r.getInt(i).toLong
              case "long" => r.getLong(i)
              case "str" => r.getString(i)
            }))
          }.toMap
        }.toMap

      // seed commit
      val seedKeys = (0L to 15L)
      MergeTable.merge(spark, dir,
        mkBatch(seedKeys.map(k => (k, freshVals(k, 0), "create"))),
        "k", numBuckets = 4)
      model = seedKeys.map(k => k -> freshVals(k, 0)).toMap
      history :+= ((cols, model))

      for (step <- 1 to 8) {
        rnd.nextInt(10) match {
          case d if d <= 4 => // merge, occasionally carrying a NEW column
            if (rnd.nextInt(4) == 0) { fresh += 1; cols :+= (s"c$fresh" -> "str") }
            val keys = rnd.shuffle((0L to 20L).toList).take(1 + rnd.nextInt(8))
            val rows = keys.map { k =>
              (k, freshVals(k, step),
                Seq("create", "update", "delete")(rnd.nextInt(3)))
            }
            MergeTable.merge(spark, dir, mkBatch(rows), "k", numBuckets = 4)
            rows.foreach { case (k, vals, op) =>
              if (op == "delete") model -= k else model += k -> vals
            }
          case 5 | 6 if cols.size > 1 => // drop a random payload column
            val victim = cols(rnd.nextInt(cols.size))._1
            MergeTable.alterDropColumn(dir, victim)
            cols = cols.filterNot(_._1 == victim)
            model = model.view.mapValues(_ - victim).toMap
          case 7 | 8 => // rename a random payload column
            fresh += 1
            val from = cols(rnd.nextInt(cols.size))._1
            val to = s"r$fresh"
            MergeTable.alterRenameColumn(dir, from, to)
            cols = cols.map { case (n, tg) => (if (n == from) to else n, tg) }
            model = model.view.mapValues(vs =>
              vs.get(from).map(v => vs - from + (to -> v)).getOrElse(vs)).toMap
          case _ if cols.exists(_._2 == "int") => // widen an int column
            val ints = cols.filter(_._2 == "int")
            val victim = ints(rnd.nextInt(ints.size))._1
            MergeTable.alterWidenColumn(dir, victim, LongType)
            cols = cols.map { case (n, tg) => (n, if (n == victim) "long" else tg) }
          case _ => () // widen drawn with no int column left: no commit
        }
        val committed = MergeTable.currentVersion(dir).get
        if (committed == history.size) history :+= ((cols, model))
        val got = snapshotOf(MergeTable.read(spark, dir), cols)
        assert(got === model, s"table $t after step $step (cols=$cols)")
      }
      // time travel: every version replays with ITS OWN schema and values
      history.zipWithIndex.foreach { case ((hCols, hModel), v) =>
        val df = MergeTable.readAt(spark, dir, v.toLong)
        assert(df.columns.toSeq === ("k" +: hCols.map(_._1)),
          s"table $t readAt v$v schema")
        assert(snapshotOf(df, hCols) === hModel, s"table $t readAt v$v")
      }
    }
  }
}
