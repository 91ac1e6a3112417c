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
}
