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
            case 2 => // DELETE on a key-class (sometimes zero-match),
              // randomly routed merge-on-read (r16 deletion vectors): the
              // model and the CoW shadow don't change, so soft ≡ rewrite
              // must hold under every LATER op the sequence draws
              val (m, r) = (2 + rnd.nextInt(4), rnd.nextInt(4))
              if (rnd.nextBoolean())
                spark.conf.set("spark.graft.delete.mode", "soft")
              try spark.sql(s"DELETE FROM $name WHERE k % $m = $r")
              finally spark.conf.unset("spark.graft.delete.mode")
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

  test("random LIFECYCLE sequences: CREATE/INSERT/OVERWRITE/OPTIMIZE/VACUUM/ALTER interleaved with DML == collections model") {
    // the r14-assigned adversarial lane the directed SqlLifecycleSpec
    // tests don't cover: the FULL SQL verb set drawn randomly against one
    // collections model — maintenance verbs (OPTIMIZE / compactStale /
    // VACUUM) must never change answers, evolution verbs (RENAME / widen)
    // must carry the model across the schema change, and the data verbs
    // (INSERT / INSERT OVERWRITE / UPDATE / DELETE / MERGE) compose with
    // all of them in any order.
    var opsRun = 0
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(7000 + seed)
      val name = s"fz_lc_$seed"
      val dir = graft.util.Cleanup.registerTempDir(
        java.nio.file.Files.createTempDirectory(s"sqlfz_lc_$seed")).toString + "/t"
      // SQL-only bootstrap (no Scala create)
      spark.sql(s"""CREATE TABLE $name (k BIGINT, v DOUBLE, tag STRING, n INT)
        USING graft LOCATION '$dir'
        TBLPROPERTIES ('graft.key'='k', 'graft.buckets'='2')""")
      try {
        // model: k -> (v, tag, n); n stays k*2 (value-stable across the
        // widen, so only the TYPE changes mid-stream)
        var model = Map.empty[Long, (Double, Option[String], Long)]
        var tagCol = "tag"
        var widened = false
        // (dir, model snapshot, tag column name at clone time): every
        // clone must still equal its snapshot at sequence end no matter
        // what later ops did to the source (r16 CLONE independence)
        var clones = List.empty[(String,
          Map[Long, (Double, Option[String], Long)], String)]
        def srcView(rows: Seq[(Long, Double, String)]): Unit = {
          // column names/types must match the table's CURRENT schema
          if (widened)
            rows.map { case (k, v, t) => (k, v, t, k * 2) }
              .toDF("k", "v", tagCol, "n").createOrReplaceTempView("fz_lc_src")
          else
            rows.map { case (k, v, t) => (k, v, t, (k * 2).toInt) }
              .toDF("k", "v", tagCol, "n").createOrReplaceTempView("fz_lc_src")
        }
        def state(): Map[Long, (Double, Option[String], Long)] =
          MergeTable.read(spark, dir)
            .selectExpr("k", "v", s"$tagCol AS tag", "CAST(n AS BIGINT) AS n")
            .as[(Long, Double, Option[String], Long)].collect()
            .map { case (k, v, t, n) => k -> (v, t, n) }.toMap
        def rndRows(step: Int): Seq[(Long, Double, String)] =
          rnd.shuffle((0L to 17L).toList).take(2 + rnd.nextInt(6))
            .map(k => (k, (k * 8 + step * 3 + seed).toDouble, s"s$step"))
        for (step <- 1 to 6 + rnd.nextInt(4)) {
          opsRun += 1
          rnd.nextInt(12) match {
            case 0 => // INSERT INTO: upsert, existing keys last-write-wins
              val rows = rndRows(step)
              srcView(rows)
              spark.sql(s"INSERT INTO $name SELECT * FROM fz_lc_src")
              model = model ++ rows.map { case (k, v, t) =>
                k -> (v, Some(t): Option[String], k * 2) }
            case 1 => // INSERT OVERWRITE: absent keys delete
              val rows = rndRows(step)
              srcView(rows)
              spark.sql(s"INSERT OVERWRITE $name SELECT * FROM fz_lc_src")
              model = rows.map { case (k, v, t) =>
                k -> (v, Some(t): Option[String], k * 2) }.toMap
            case 2 => // UPDATE arithmetic on a key-class
              val (m0, r, c) = (2 + rnd.nextInt(3), rnd.nextInt(2), rnd.nextInt(9))
              spark.sql(s"UPDATE $name SET v = v + $c WHERE k % $m0 = $r")
              model = model ++ model.filter { case (k, _) => k % m0 == r }
                .map { case (k, (v, t, n)) => k -> (v + c, t, n) }
            case 3 => // DELETE on a key-class (sometimes zero-match),
              // randomly merge-on-read — deletion vectors must compose
              // with OPTIMIZE/VACUUM/OVERWRITE/ALTER later in the sequence
              val (m0, r) = (2 + rnd.nextInt(4), rnd.nextInt(4))
              if (rnd.nextBoolean())
                spark.conf.set("spark.graft.delete.mode", "soft")
              try spark.sql(s"DELETE FROM $name WHERE k % $m0 = $r")
              finally spark.conf.unset("spark.graft.delete.mode")
              model = model.filter { case (k, _) => k % m0 != r }
            case 4 => // MERGE: star update + star insert
              val rows = rndRows(step)
              srcView(rows)
              spark.sql(s"""MERGE INTO $name t USING fz_lc_src s ON t.k = s.k
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *""")
              model = model ++ rows.map { case (k, v, t) =>
                k -> (v, Some(t): Option[String], k * 2) }
            case 5 => // OPTIMIZE: version advances, answers must not
              val before = MergeTable.currentVersion(dir).get
              val v = spark.sql(s"OPTIMIZE $name").head().getLong(0)
              assert(v > before, s"seed $seed step $step: OPTIMIZE no-op'd")
            case 6 => // bucket-subset compaction (the OPTIMIZE policy path)
              MergeTable.compactStale(spark, dir, maxGroups = 1 + rnd.nextInt(3))
            case 7 => // VACUUM [RETAIN n VERSIONS]: reclamation only
              if (rnd.nextBoolean())
                spark.sql(s"VACUUM $name RETAIN ${1 + rnd.nextInt(3)} VERSIONS")
              else spark.sql(s"VACUUM $name")
            case 8 => // ALTER: rename the tag column (repeatable) or widen n
              if (!widened && rnd.nextBoolean()) {
                spark.sql(s"ALTER TABLE $name ALTER COLUMN n TYPE BIGINT")
                widened = true
              } else {
                val next = s"tag_$step"
                spark.sql(s"ALTER TABLE $name RENAME COLUMN $tagCol TO $next")
                tagCol = next
              }
            case 9 if clones.size < 3 => // CLONE (r16): fork pinned to
              // THIS instant's model — later source ops must never leak
              val cdir = graft.util.Cleanup.registerTempDir(
                java.nio.file.Files.createTempDirectory(
                  s"sqlfz_clone_${seed}_$step")).toString + "/t"
              spark.sql(s"CLONE $name AS ${name}_c$step LOCATION '$cdir'")
              MergeTableSql.unregister(s"${name}_c$step")
              clones ::= ((cdir, model, tagCol))
            case 10 => // skipping-tier designation (r16): dictionaries and
              // parquet blooms only ever SHRINK scans — answers must not
              // move under any interleaving with the other verbs
              rnd.nextInt(3) match {
                case 0 => spark.sql(s"ALTER TABLE $name SET DICTIONARY " +
                  s"($tagCol) MAX ${1 + rnd.nextInt(8)}")
                case 1 => spark.sql(s"ALTER TABLE $name SET BLOOM (v) NDV 100")
                case _ => spark.sql(s"ALTER TABLE $name UNSET DICTIONARY")
              }
            case _ => // CREATE IF NOT EXISTS with the CURRENT DDL: idempotent
              spark.sql(s"""CREATE TABLE IF NOT EXISTS $name
                (k BIGINT, v DOUBLE, $tagCol STRING,
                 n ${if (widened) "BIGINT" else "INT"})
                USING graft LOCATION '$dir'
                TBLPROPERTIES ('graft.key'='k', 'graft.buckets'='2')""")
          }
          assert(state() === model, s"seed $seed step $step diverged")
        }
        // every clone still equals the model AT ITS FORK INSTANT — no
        // later source mutation, compaction, vacuum, or evolution leaked
        clones.foreach { case (cdir, snap, tc) =>
          val got = MergeTable.read(spark, cdir)
            .selectExpr("k", "v", s"$tc AS tag", "CAST(n AS BIGINT) AS n")
            .as[(Long, Double, Option[String], Long)].collect()
            .map { case (k, v, t, nn) => k -> (v, t, nn) }.toMap
          assert(got === snap, s"seed $seed: clone at $cdir diverged")
        }
      } finally MergeTableSql.unregister(name)
    }
    info(s"$opsRun lifecycle ops swept")
    assert(opsRun >= 100, s"only $opsRun ops — widen the sweep")
  }
}
