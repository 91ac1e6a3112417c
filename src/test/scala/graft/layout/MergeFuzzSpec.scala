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
}
