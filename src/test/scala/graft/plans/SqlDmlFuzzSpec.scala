package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.layout.MergeTable

/** Randomized differential for the SQL DML front door (r14): random
  * MERGE / UPDATE / DELETE statement sequences rendered as SQL TEXT and
  * executed through [[MergeTableSqlResolution]], diffed after every
  * statement against BOTH
  *
  *  1. a plain collections model of the ANSI semantics (ground truth), and
  *  2. a SHADOW MergeTable driven through the Scala `merge()` API with
  *     the op batch the model's classification implies —
  *
  * so the SQL path's clause-order/condition/store-assignment machinery
  * (MergeTableSql classification) and the Scala path can never drift from
  * each other or from the spec. The example-based suites pin shapes; this
  * lane sweeps their compositions: conditions over both sides, clause
  * permutations, NOT MATCHED BY SOURCE, null-filling column-list inserts,
  * zero-match statements. */
class SqlDmlFuzzSpec extends SparkSpec {
  import spark.implicits._

  // model state: key -> (v, tag); tag is Option because INSERT (k, v)
  // null-fills it. EVEN seeds run the same sequences against a
  // COMPOSITE-keyed table (k, g) with g = k % 3 — the tuple is what the
  // bucket hash, ON conjunction, and shadow mergeKeys see; the model
  // stays keyed by k (g is functionally dependent, so the semantics are
  // identical — any divergence is a composite-key bug).
  private type State = Map[Long, (Double, Option[String])]

  private def g(k: Long): Long = k % 3

  private def schema(composite: Boolean) = StructType(
    StructField("k", LongType, nullable = false) +:
      (if (composite) Seq(StructField("g", LongType, nullable = false))
       else Nil) :+
      StructField("v", DoubleType, nullable = false) :+
      StructField("tag", StringType, nullable = true))

  private def opBatch(composite: Boolean,
                      rows: Seq[(Long, Double, Option[String], String)]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (k, v, tag, op) =>
        if (composite) Row(k, g(k), v, tag.orNull, op)
        else Row(k, v, tag.orNull, op) }: _*),
      schema(composite).add("op_flag", StringType, nullable = false))

  private def readState(dir: String): State =
    MergeTable.read(spark, dir).select("k", "v", "tag")
      .as[(Long, Double, Option[String])].collect()
      .map { case (k, v, t) => k -> (v, t) }.toMap

  test("random SQL MERGE/UPDATE/DELETE sequences: SQL path == Scala merge path == collections model") {
    for (seed <- 1 to 16) {
      val rnd = new scala.util.Random(1000 + seed)
      val name = s"fz_dml_$seed"
      val dir = graft.util.Cleanup.registerTempDir(
        java.nio.file.Files.createTempDirectory(s"sqlfz_$seed")).toString + "/t"
      val shadow = graft.util.Cleanup.registerTempDir(
        java.nio.file.Files.createTempDirectory(s"sqlfz_sh_$seed")).toString + "/t"
      MergeTableSql.register(name, dir, numBuckets = 2)
      val composite = seed % 2 == 0
      val keys = if (composite) Seq("k", "g") else Seq("k")
      val on = if (composite) "t.k = s.k AND t.g = s.g" else "t.k = s.k"
      try {
        // seed state: 6-14 keys with exact-in-binary values
        val keys0 = rnd.shuffle((0L to 20L).toList).take(6 + rnd.nextInt(9))
        val init = keys0.map(k => (k, (k * 8 + seed).toDouble,
          Some(s"t${k % 3}"): Option[String], "create"))
        MergeTable.mergeKeys(spark, dir, opBatch(composite, init), keys,
          numBuckets = 2)
        MergeTable.mergeKeys(spark, shadow, opBatch(composite, init), keys,
          numBuckets = 2)
        var model: State = init.map { case (k, v, t, _) => k -> (v, t) }.toMap

        for (step <- 1 to 3 + rnd.nextInt(3)) {
          rnd.nextInt(5) match {
            case 0 => // UPDATE arithmetic on a key-class
              val (m, r, c) = (2 + rnd.nextInt(3), rnd.nextInt(2), rnd.nextInt(9))
              spark.sql(
                s"UPDATE $name SET v = v + $c WHERE k % $m = $r")
              val hit = model.filter { case (k, _) => k % m == r }
              model = model ++ hit.map { case (k, (v, t)) => k -> (v + c, t) }
              MergeTable.mergeKeys(spark, shadow, opBatch(composite,
                hit.toSeq.map { case (k, (v, t)) => (k, v + c, t, "update") }),
                keys)
            case 1 => // UPDATE on a value predicate, two assignments
              val c = 40 + rnd.nextInt(100)
              spark.sql(
                s"UPDATE $name SET v = v * 2, tag = 'u$step' WHERE v > $c")
              val hit = model.filter { case (_, (v, _)) => v > c }
              model = model ++ hit.map { case (k, (v, _)) =>
                k -> (v * 2, Some(s"u$step"): Option[String]) }
              MergeTable.mergeKeys(spark, shadow, opBatch(composite,
                hit.toSeq.map { case (k, (v, _)) =>
                  (k, v * 2, Some(s"u$step"), "update") }), keys)
            case 2 => // DELETE on a key-class (sometimes zero-match)
              val (m, r) = (2 + rnd.nextInt(4), rnd.nextInt(4))
              spark.sql(s"DELETE FROM $name WHERE k % $m = $r")
              val hit = model.filter { case (k, _) => k % m == r }
              model = model -- hit.keys
              MergeTable.mergeKeys(spark, shadow, opBatch(composite,
                hit.toSeq.map { case (k, (v, t)) => (k, v, t, "delete") }),
                keys)
            case 3 => // MERGE: cond update-both-sides + star insert
              val srcRows = rnd.shuffle((0L to 25L).toList)
                .take(2 + rnd.nextInt(8))
                .map(k => (k, (k * 16 + step * 3 + seed).toDouble, s"m$step"))
              if (composite)
                srcRows.map { case (k, v, t) => (k, g(k), v, t) }
                  .toDF("k", "g", "v", "tag").createOrReplaceTempView("fz_src")
              else srcRows.toDF("k", "v", "tag")
                .createOrReplaceTempView("fz_src")
              spark.sql(
                s"""MERGE INTO $name t USING fz_src s ON $on
                   |WHEN MATCHED AND s.v > t.v THEN UPDATE SET *
                   |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
              val batch = srcRows.flatMap { case (k, sv, st) =>
                model.get(k) match {
                  case Some((tv, _)) if sv > tv =>
                    Some((k, sv, Some(st): Option[String], "update"))
                  case Some(_) => None // condition false: row untouched
                  case None => Some((k, sv, Some(st): Option[String], "create"))
                }
              }
              model = model ++ batch.filter(_._4 != "delete")
                .map { case (k, v, t, _) => k -> (v, t) }
              MergeTable.mergeKeys(spark, shadow, opBatch(composite, batch),
                keys)
            case _ => // MERGE: clause ORDER + both-side conds + NMBS +
              // column-list insert (tag null-fills)
              val c = 60 + rnd.nextInt(120)
              val srcRows = rnd.shuffle((0L to 25L).toList)
                .take(2 + rnd.nextInt(8))
                .map(k => (k, (k * 16 + step * 5 + seed).toDouble, s"n$step"))
              if (composite)
                srcRows.map { case (k, v, t) => (k, g(k), v, t) }
                  .toDF("k", "g", "v", "tag").createOrReplaceTempView("fz_src")
              else srcRows.toDF("k", "v", "tag")
                .createOrReplaceTempView("fz_src")
              // a composite table's column-list INSERT must carry EVERY
              // key part (a null key part is the merge-layer error)
              val insCols =
                if (composite) "(k, g, v) VALUES (s.k, s.g, s.v)"
                else "(k, v) VALUES (s.k, s.v)"
              spark.sql(
                s"""MERGE INTO $name t USING fz_src s ON $on
                   |WHEN MATCHED AND t.k % 2 = 0 THEN DELETE
                   |WHEN MATCHED THEN UPDATE SET v = t.v + s.v
                   |WHEN NOT MATCHED AND s.k % 2 = 1
                   |  THEN INSERT $insCols
                   |WHEN NOT MATCHED BY SOURCE AND t.v < $c THEN DELETE""".stripMargin)
              val srcKeys = srcRows.map(_._1).toSet
              val fromSrc = srcRows.flatMap { case (k, sv, _) =>
                model.get(k) match {
                  case Some(_) if k % 2 == 0 =>
                    Some((k, 0.0, None: Option[String], "delete"))
                  case Some((tv, tt)) => Some((k, tv + sv, tt, "update"))
                  case None if k % 2 == 1 =>
                    Some((k, sv, None: Option[String], "create"))
                  case None => None
                }
              }
              val nmbs = model.toSeq.collect {
                case (k, (tv, tt)) if !srcKeys.contains(k) && tv < c =>
                  (k, tv, tt, "delete")
              }
              val batch = fromSrc ++ nmbs
              model = model -- batch.filter(_._4 == "delete").map(_._1)
              model = model ++ batch.filter(_._4 != "delete")
                .map { case (k, v, t, _) => k -> (v, t) }
              MergeTable.mergeKeys(spark, shadow, opBatch(composite,
                batch.map {
                  case (k, v, t, "delete") =>
                    (k, model.get(k).map(_._1).getOrElse(v), t, "delete")
                  case other => other }), keys)
          }
          val sqlState = readState(dir)
          assert(sqlState === model, s"seed $seed step $step: SQL vs model")
          val shadowState = readState(shadow)
          assert(shadowState === model, s"seed $seed step $step: Scala vs model")
        }
      } finally MergeTableSql.unregister(name)
    }
  }
}
