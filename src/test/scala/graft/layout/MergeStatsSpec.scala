package graft.layout

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Non-key data skipping (r15 verdict task 4): every merge/compact
  * records per-bucket min/max for the stats-eligible columns in the
  * manifest, and `readWhere` prunes buckets whose recorded range proves a
  * predicate can match no row — driver-side, before any file is listed or
  * opened. Pruning only ever SHRINKS the scan; the predicate still runs
  * on what is read, so a stats bug can cost rows, which is why every test
  * here diffs readWhere against the unpruned filter. */
class MergeStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    graft.util.Cleanup.registerTempDir(
      Files.createTempDirectory(s"mstats_$tag")).toString + "/t"

  /** Bucket of `id` under the table layout's own hash. */
  private def bucketOf(id: Long, nb: Int): Int =
    spark.range(1).select(pmod(hash(lit(id)), lit(nb))).head().getInt(0)

  /** A 4-bucket table whose `v` values are LOCALIZED per bucket
    * (v = bucket*100 + id%10): the shape where per-bucket min/max can
    * prune — batch-loaded locality made deterministic for the test. */
  private def localizedTable(tag: String): String = {
    val dir = freshDir(tag)
    val rows = (1L to 64L).map { id =>
      val b = bucketOf(id, 4)
      (id, b * 100L + id % 10, s"tag_$b", "create")
    }
    MergeTable.merge(spark, dir,
      rows.toDF("id", "v", "tag", "op_flag"), "id", numBuckets = 4)
    dir
  }

  test("readWhere prunes buckets by recorded min/max; result equals the unpruned filter") {
    val dir = localizedTable("prune")
    val pred = col("v") >= 200L && col("v") < 300L
    // exactly bucket 2 survives the range
    assert(MergeTable.prunableBuckets(dir, pred) === Some(Set(2)))
    val got = MergeTable.readWhere(spark, dir, pred)
      .as[(Long, Long, String)].collect().toSet
    val want = MergeTable.read(spark, dir).filter(pred)
      .as[(Long, Long, String)].collect().toSet
    assert(got === want && got.nonEmpty)
    // equality on the localized string column prunes to one bucket too
    assert(MergeTable.prunableBuckets(dir, col("tag") === "tag_3") ===
      Some(Set(3)))
    // literal-on-the-left flips correctly
    assert(MergeTable.prunableBuckets(dir, lit(200L) <= col("v") &&
      lit(300L) > col("v")) === Some(Set(2)))
    // an impossible range prunes EVERYTHING
    assert(MergeTable.prunableBuckets(dir, col("v") > 10000L) ===
      Some(Set.empty[Int]))
    assert(MergeTable.readWhere(spark, dir, col("v") > 10000L).count() === 0L)
  }

  test("the pruned scan lists ONLY surviving bucket directories") {
    val dir = localizedTable("scan")
    val pruned = MergeTable.readWhere(spark, dir, col("v") >= 300L)
    pruned.collect()
    def findScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findScans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        findScans(r.child)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(findScans)
    }
    val locations = findScans(pruned.queryExecution.executedPlan)
      .map(_.metadata.getOrElse("Location", ""))
    val bucketDirs = locations.flatMap(
      s"""${MergeTable.BucketCol}=(\\d+)""".r
        .findAllMatchIn(_).map(_.group(1))).toSet
    assert(bucketDirs === Set("3"),
      s"scan should list only bucket 3's directory, got $bucketDirs")
  }

  test("unprunable predicates scan everything and still answer correctly") {
    val dir = localizedTable("nop")
    // non-comparison shape: no pruner extracted
    assert(MergeTable.prunableBuckets(dir, col("v") % 2 === 0L).isEmpty)
    assert(MergeTable.readWhere(spark, dir, col("v") % 2 === 0L).count() ===
      MergeTable.read(spark, dir).filter(col("v") % 2 === 0L).count())
    // unknown column: no pruner, loud analysis error only at execution
    assert(MergeTable.prunableBuckets(dir, col("nope") === 1L).isEmpty)
  }

  test("merge updates the rewritten bucket's stats; untouched buckets keep theirs") {
    val dir = localizedTable("upd")
    // move bucket 2's values out of the 200-range entirely
    val b2keys = (1L to 64L).filter(bucketOf(_, 4) == 2)
    MergeTable.merge(spark, dir,
      b2keys.map(id => (id, 9000L + id, "moved", "update"))
        .toDF("id", "v", "tag", "op_flag"), "id")
    // the old range now proves empty; the new one holds bucket 2 alone
    assert(MergeTable.prunableBuckets(dir, col("v") >= 200L && col("v") < 300L)
      === Some(Set.empty[Int]))
    assert(MergeTable.prunableBuckets(dir, col("v") >= 9000L) === Some(Set(2)))
    // untouched bucket 1 still prunes on its original range
    assert(MergeTable.prunableBuckets(dir, col("v") >= 100L && col("v") < 200L)
      === Some(Set(1)))
  }

  test("stats survive compact, follow renames, and drop with their column") {
    val dir = localizedTable("evo")
    MergeTable.compact(spark, dir)
    assert(MergeTable.prunableBuckets(dir, col("v") >= 300L) === Some(Set(3)))
    MergeTable.alterRenameColumn(dir, "v", "w")
    assert(MergeTable.prunableBuckets(dir, col("w") >= 300L) === Some(Set(3)))
    MergeTable.alterDropColumn(dir, "tag")
    // dropped column: no pruner (schema lookup fails), no stale stats
    assert(MergeTable.prunableBuckets(dir, col("tag") === "tag_3").isEmpty)
    // widen keeps stats readable under the new type
    MergeTable.alterWidenColumn(dir, "w",
      org.apache.spark.sql.types.DecimalType(20, 0))
    assert(MergeTable.prunableBuckets(dir,
      col("w") >= lit(BigDecimal(300))) === Some(Set(3)))
  }

  test("all-deleted buckets lose their stats; all-null columns record none") {
    val dir = freshDir("nulls")
    MergeTable.merge(spark, dir,
      Seq((1L, Option.empty[Long], "create"), (2L, Option.empty[Long], "create"))
        .toDF("id", "v", "op_flag"), "id", numBuckets = 2)
    // v is all null: it records no stats, so nothing may prune on it
    // (other columns' stats exist, hence Some(all live buckets))
    val pb = MergeTable.prunableBuckets(dir, col("v") > 0L)
    assert(pb.forall(_.size == 2), s"all-null column must not prune: $pb")
    assert(MergeTable.readWhere(spark, dir, col("v") > 0L).count() === 0L)
    // delete every row of key 1's bucket: its stats entry must go
    MergeTable.merge(spark, dir,
      Seq((1L, Option.empty[Long], "delete")).toDF("id", "v", "op_flag"), "id")
    assert(MergeTable.readWhere(spark, dir, col("id") >= 0L)
      .select("id").as[Long].collect().toSeq === Seq(2L))
  }

  test("casts that reorder the stats domain prune NOTHING — and drop no rows") {
    // string column whose values sort differently as numbers: {"5","30"}
    // records lexical lo="30", hi="5"; evaluating those bounds in a cast's
    // numeric domain would 'prove' 5 outside [30,5] and silently drop the
    // matching row — the r15 advisory's exact scenario
    val dir = freshDir("castprune")
    MergeTable.merge(spark, dir,
      Seq((1L, "5", "create"), (2L, "30", "create"))
        .toDF("id", "s", "op_flag"), "id", numBuckets = 1)
    // numeric comparison over the string column: analyzer inserts a cast
    // involving StringType → no pruner may engage
    assert(MergeTable.prunableBuckets(dir, col("s").cast("double") === 5.0)
      .isEmpty)
    assert(MergeTable.readWhere(spark, dir, col("s").cast("double") === 5.0)
      .select("id").as[Long].collect().toSeq === Seq(1L))
    // numeric column cast to string in the predicate: same rule, other
    // direction (numeric-rendered stats must not be compared lexically)
    val dir2 = freshDir("cast2s")
    MergeTable.merge(spark, dir2,
      Seq((1L, 5L, "create"), (2L, 30L, "create"))
        .toDF("id", "v", "op_flag"), "id", numBuckets = 1)
    assert(MergeTable.prunableBuckets(dir2,
      col("v").cast("string") === "30").isEmpty)
    assert(MergeTable.readWhere(spark, dir2, col("v").cast("string") === "30")
      .select("id").as[Long].collect().toSeq === Seq(2L))
    // an ORDER-PRESERVING up-cast still prunes: int column vs long literal
    val dir3 = freshDir("upcast")
    MergeTable.merge(spark, dir3,
      Seq((1L, 5, "create"), (2L, 30, "create"))
        .toDF("id", "n", "op_flag"), "id", numBuckets = 1)
    assert(MergeTable.prunableBuckets(dir3, col("n") > lit(100L)) ===
      Some(Set.empty[Int]))
    // float→double is NOT order-preserving through the string stats
    // (shortest-render re-parse shifts bounds): conservative no-prune
    val dir4 = freshDir("f2d")
    MergeTable.merge(spark, dir4,
      Seq((1L, 0.1f, "create"), (2L, 0.3f, "create"))
        .toDF("id", "f", "op_flag"), "id", numBuckets = 1)
    assert(MergeTable.prunableBuckets(dir4, col("f") > lit(0.5d)).isEmpty)
    assert(MergeTable.readWhere(spark, dir4, col("f") > lit(0.05d)).count() === 2L)
  }

  test("widening to a reordering type drops the column's stats instead of pruning with stale bounds") {
    val dir = freshDir("widen2s")
    MergeTable.merge(spark, dir,
      Seq((1L, 5L, "create"), (2L, 30L, "create"))
        .toDF("id", "v", "op_flag"), "id", numBuckets = 1)
    // before the widen the numeric stats prune fine
    assert(MergeTable.prunableBuckets(dir, col("v") > 100L) ===
      Some(Set.empty[Int]))
    MergeTable.alterWidenColumn(dir, "v", org.apache.spark.sql.types.StringType)
    // stats recorded lo="5", hi="30" NUMERICALLY; a plain string equality
    // (no cast anywhere — v IS a string now) compares lexically, where
    // "30" < "5" would wrongly prune the bucket holding 30. The widen must
    // have dropped the stats: nothing prunes, every row still answers.
    val survivors = MergeTable.prunableBuckets(dir, col("v") === "30")
    assert(survivors.forall(_.nonEmpty), s"stale stats pruned: $survivors")
    assert(MergeTable.readWhere(spark, dir, col("v") === "30")
      .select("id").as[Long].collect().toSeq === Seq(2L))
    // a rewrite re-derives stats under the NEW type: pruning comes back
    MergeTable.compact(spark, dir)
    assert(MergeTable.readWhere(spark, dir, col("v") === "30")
      .select("id").as[Long].collect().toSeq === Seq(2L))
  }

  test("separator-bearing column names: ':' is stats-ineligible but works; ',' and '=' are rejected loudly") {
    // ':' survives the stats encoding (the '=' split comes first and
    // base64 values carry no ':'), but the column is conservatively
    // stats-ineligible — it never prunes, the table stays fully readable
    val dir = freshDir("badname")
    MergeTable.merge(spark, dir,
      Seq((1L, 10L, 7L, "create"), (2L, 20L, 8L, "create"))
        .toDF("id", "a:b", "v", "op_flag"), "id", numBuckets = 1)
    assert(MergeTable.read(spark, dir).count() === 2L)
    assert(MergeTable.prunableBuckets(dir, col("`a:b`") > 100L).isEmpty)
    assert(MergeTable.prunableBuckets(dir, col("v") > 100L) ===
      Some(Set.empty[Int]))
    assert(MergeTable.readWhere(spark, dir, col("`a:b`") === 20L)
      .select("id").as[Long].collect().toSeq === Seq(2L))
    // ',' and '=' would corrupt the manifest's raw-name proj encoding at
    // this very commit (table unreadable forever after): loud rejection
    Seq("a,b", "a=b").foreach { bad =>
      val e = intercept[IllegalArgumentException] {
        MergeTable.merge(spark, freshDir("rej"),
          Seq((1L, 10L, "create")).toDF("id", bad, "op_flag"),
          "id", numBuckets = 1)
      }
      assert(e.getMessage.contains("reserves"), s"for '$bad': ${e.getMessage}")
    }
    val e2 = intercept[IllegalArgumentException] {
      MergeTable.alterRenameColumn(dir, "v", "x=y")
    }
    assert(e2.getMessage.contains("reserves"))
  }

  test("IN lists and LIKE-prefix predicates prune on recorded stats; results equal the unpruned filter") {
    val dir = localizedTable("inlike")
    // IN: every value inside bucket 2's [200,209] range → only bucket 2
    assert(MergeTable.prunableBuckets(dir, col("v").isin(205L, 207L)) ===
      Some(Set(2)))
    assert(MergeTable.readWhere(spark, dir, col("v").isin(205L, 207L))
      .as[(Long, Long, String)].collect().toSet ===
      MergeTable.read(spark, dir).filter(col("v").isin(205L, 207L))
        .as[(Long, Long, String)].collect().toSet)
    // IN spanning two buckets keeps exactly those two
    assert(MergeTable.prunableBuckets(dir, col("v").isin(105L, 301L)) ===
      Some(Set(1, 3)))
    // IN with every value outside the table prunes everything
    assert(MergeTable.prunableBuckets(dir, col("v").isin(9999L, 8888L)) ===
      Some(Set.empty[Int]))
    assert(MergeTable.readWhere(spark, dir, col("v").isin(9999L)).count() === 0L)
    // LIKE 'tag_3%': each bucket's tag is the constant "tag_<b>" → only 3
    assert(MergeTable.prunableBuckets(dir, col("tag").startsWith("tag_3")) ===
      Some(Set(3)))
    assert(MergeTable.readWhere(spark, dir, col("tag").startsWith("tag_3"))
      .as[(Long, Long, String)].collect().toSet ===
      MergeTable.read(spark, dir).filter(col("tag").startsWith("tag_3"))
        .as[(Long, Long, String)].collect().toSet)
    // a prefix matching nothing prunes everything; empty prefix prunes nothing
    assert(MergeTable.prunableBuckets(dir, col("tag").startsWith("zzz")) ===
      Some(Set.empty[Int]))
    assert(MergeTable.prunableBuckets(dir, col("tag").startsWith(""))
      .forall(_.size == 4))
  }

  test("readWhereAt prunes with the HISTORICAL version's own stats; SQL VERSION AS OF ... WHERE routes through it") {
    val dir = localizedTable("ttprune")
    val pred = col("v") >= 200L && col("v") < 300L
    // v1 moves bucket 2's values out of the 200-range
    val b2keys = (1L to 64L).filter(bucketOf(_, 4) == 2)
    MergeTable.merge(spark, dir,
      b2keys.map(id => (id, 9000L + id, "moved", "update"))
        .toDF("id", "v", "tag", "op_flag"), "id")
    // current snapshot: nothing in range; historical v0: bucket 2's rows
    assert(MergeTable.readWhere(spark, dir, pred).count() === 0L)
    val histGot = MergeTable.readWhereAt(spark, dir, 0L, pred)
      .as[(Long, Long, String)].collect().toSet
    val histWant = MergeTable.readAt(spark, dir, 0L).filter(pred)
      .as[(Long, Long, String)].collect().toSet
    assert(histGot === histWant && histGot.nonEmpty)
    // the SQL door's time-travel WHERE reads the same pruned snapshot and
    // its scan lists ONLY bucket 2's directory
    graft.plans.MergeTableSql.register("mstats_tt_t", dir)
    try {
      val out = spark.sql(
        "SELECT id, v, tag FROM mstats_tt_t VERSION AS OF 0 " +
          "WHERE v >= 200 AND v < 300 ORDER BY id")
      assert(out.as[(Long, Long, String)].collect().toSet === histWant)
      val p = out.queryExecution.executedPlan.toString
      val buckets = s"""${MergeTable.BucketCol}=(\\d+)""".r
        .findAllMatchIn(p).map(_.group(1)).toSet
      assert(buckets === Set("2"), s"expected only bucket 2, got $buckets")
    } finally graft.plans.MergeTableSql.unregister("mstats_tt_t")
  }

  test("IS NULL / IS NOT NULL prune on recorded per-bucket null counts; results equal the unpruned filter") {
    val dir = freshDir("nullskip")
    // nullness localized by bucket: bucket 0's v is ALL null, bucket 1's
    // has none — the shape min/max stats can never describe (an all-null
    // column records no min/max at all)
    val rows = (1L to 40L).map { id =>
      val b = bucketOf(id, 2)
      (id, if (b == 0) Option.empty[Long] else Some(id * 3), "create")
    }
    MergeTable.merge(spark, dir, rows.toDF("id", "v", "op_flag"), "id",
      numBuckets = 2)
    assert(MergeTable.prunableBuckets(dir, col("v").isNotNull) === Some(Set(1)))
    assert(MergeTable.prunableBuckets(dir, col("v").isNull) === Some(Set(0)))
    assert(MergeTable.readWhere(spark, dir, col("v").isNotNull)
      .as[(Long, Option[Long])].collect().toSet ===
      MergeTable.read(spark, dir).filter(col("v").isNotNull)
        .as[(Long, Option[Long])].collect().toSet)
    assert(MergeTable.readWhere(spark, dir, col("v").isNull).count() ===
      rows.count(_._2.isEmpty).toLong)
    // one null lands in bucket 1: it becomes mixed and must be KEPT by
    // both predicates
    val k1 = (1L to 40L).find(id => bucketOf(id, 2) == 1).get
    MergeTable.merge(spark, dir,
      Seq((k1, Option.empty[Long], "update")).toDF("id", "v", "op_flag"), "id")
    assert(MergeTable.prunableBuckets(dir, col("v").isNull) ===
      Some(Set(0, 1)))
    assert(MergeTable.prunableBuckets(dir, col("v").isNotNull) === Some(Set(1)))
    assert(MergeTable.readWhere(spark, dir, col("v").isNull).count() ===
      rows.count(_._2.isEmpty).toLong + 1)
  }

  test("manifest row counts: countRows is exact across merge/delete/compact; graft_rows answers with ZERO file I/O") {
    val dir = localizedTable("counts") // 64 rows over 4 buckets
    assert(MergeTable.countRows(dir) === Some(64L))
    // delete one key: the rewritten bucket's count follows
    MergeTable.merge(spark, dir,
      Seq((1L, 0L, "x", "delete")).toDF("id", "v", "tag", "op_flag"), "id")
    assert(MergeTable.countRows(dir) === Some(63L))
    MergeTable.compact(spark, dir)
    assert(MergeTable.countRows(dir) === Some(63L))
    // the SQL surface: sum(rows) over graft_rows = count(*), and the plan
    // reads NO files — the manifest is the whole input
    graft.plans.MergeTableSql.register("mstats_rc_t", dir)
    try {
      val out = spark.sql("SELECT sum(rows) AS n FROM graft_rows('mstats_rc_t')")
      assert(out.as[Long].head() === 63L)
      val p = out.queryExecution.executedPlan.toString
      assert(!p.contains("FileScan"), s"graft_rows must not scan files:\n$p")
    } finally graft.plans.MergeTableSql.unregister("mstats_rc_t")
    // per-bucket counts agree with the real table
    val got = MergeTable.bucketRowCounts(spark, dir)
      .as[(Int, Long)].collect().toMap
    assert(got.values.sum === MergeTable.read(spark, dir).count())
    // a bucket emptied by deletes counts 0 (it stays mapped until a
    // compact drops it — then its count entry goes too)
    val b1keys = (1L to 64L).filter(bucketOf(_, 4) == 1)
    MergeTable.merge(spark, dir,
      b1keys.map(id => (id, 0L, "x", "delete")).toDF("id", "v", "tag", "op_flag"),
      "id")
    assert(MergeTable.countRows(dir) === Some(63L - b1keys.count(_ != 1L)))
    assert(MergeTable.bucketRowCounts(spark, dir)
      .as[(Int, Long)].collect().toMap.get(1).contains(0L))
    MergeTable.compact(spark, dir)
    assert(MergeTable.countRows(dir) === Some(63L - b1keys.count(_ != 1L)))
    assert(!MergeTable.bucketRowCounts(spark, dir)
      .as[(Int, Long)].collect().toMap.contains(1))
  }

  test("SQL DELETE/UPDATE classification reads through the pruned scan and still answers exactly") {
    val dir = localizedTable("dmlprune")
    val b3 = MergeTable.read(spark, dir).filter(col("v") >= 300L).count()
    val b2 = MergeTable.read(spark, dir)
      .filter(col("v") >= 200L && col("v") < 300L).count()
    graft.plans.MergeTableSql.register("mstats_dml_t", dir)
    try {
      // UPDATE with a stats-prunable range: only bucket 3 is touched
      spark.sql("UPDATE mstats_dml_t SET tag = 'hot' WHERE v >= 300")
      assert(MergeTable.read(spark, dir)
        .filter(col("tag") === "hot").count() === b3 && b3 > 0)
      // DELETE with an ALIAS-qualified prunable range
      spark.sql(
        "DELETE FROM mstats_dml_t t WHERE t.v >= 200 AND t.v < 300")
      assert(MergeTable.read(spark, dir).count() === 64L - b2 && b2 > 0)
      assert(MergeTable.read(spark, dir)
        .filter(col("v") >= 200L && col("v") < 300L).count() === 0L)
      // zero-match prunable DELETE: a no-op commit, nothing lost
      spark.sql("DELETE FROM mstats_dml_t WHERE v > 100000")
      assert(MergeTable.read(spark, dir).count() === 64L - b2)
    } finally graft.plans.MergeTableSql.unregister("mstats_dml_t")
  }

  test("graft_stats exposes per-bucket min/max/nulls/rows from the manifest alone — no file I/O") {
    val dir = localizedTable("statstvf")
    graft.plans.MergeTableSql.register("mstats_st_t", dir)
    try {
      val out = spark.sql(
        "SELECT * FROM graft_stats('mstats_st_t') WHERE column = 'v' ORDER BY bucket")
      val got = out
        .as[(Int, String, Option[String], Option[String], Option[Long], Option[Long])]
        .collect().toSeq
      assert(got.map(_._1) === Seq(0, 1, 2, 3))
      got.foreach { case (b, _, lo, hi, nulls, rows) =>
        // v = bucket*100 + id%10: bounds sit inside the bucket's century
        assert(lo.get.toLong >= b * 100L && hi.get.toLong <= b * 100L + 9L,
          s"bucket $b bounds [$lo,$hi]")
        assert(nulls.contains(0L))
        assert(rows.exists(_ > 0L))
      }
      assert(got.map(_._6.get).sum === 64L)
      val p = out.queryExecution.executedPlan.toString
      assert(!p.contains("FileScan"), s"graft_stats must not scan files:\n$p")
    } finally graft.plans.MergeTableSql.unregister("mstats_st_t")
  }

  test("OPTIMIZE t CLUSTER BY (v) sorts every bucket's files by v; answers and bucket placement unchanged") {
    val dir = freshDir("cluster")
    // v deliberately UNSORTED within buckets and uncorrelated with the key
    val rows = (1L to 256L).map(id => (id, (id * 37) % 101, "create"))
    MergeTable.merge(spark, dir, rows.toDF("id", "v", "op_flag"), "id",
      numBuckets = 2)
    val before = MergeTable.read(spark, dir)
      .as[(Long, Long)].collect().toSet
    graft.plans.MergeTableSql.register("mstats_cluster_t", dir)
    try spark.sql("OPTIMIZE mstats_cluster_t CLUSTER BY (v)")
    finally graft.plans.MergeTableSql.unregister("mstats_cluster_t")
    val after = MergeTable.read(spark, dir)
    assert(after.as[(Long, Long)].collect().toSet === before)
    // physical claim: within every rewritten file, rows are v-ascending —
    // that in-file order is what parquet row-group stats prune on
    after.inputFiles.foreach { f =>
      val vs = spark.read.parquet(f).select("v").as[Long].collect().toSeq
      assert(vs === vs.sorted, s"file $f not clustered by v")
    }
    // an unknown cluster column fails loudly
    val e = intercept[IllegalArgumentException] {
      MergeTable.compact(spark, dir, clusterBy = Some(Seq("nope")))
    }
    assert(e.getMessage.contains("CLUSTER BY"))
  }

  test("OPTIMIZE t ZORDER BY (a, b) sorts every file by the Morton curve of both columns; answers unchanged") {
    val dir = freshDir("zorder")
    val rows = (1L to 512L).map(id =>
      (id, (id * 37) % 257, (id * 91) % 263, "create"))
    MergeTable.merge(spark, dir, rows.toDF("id", "a", "b", "op_flag"), "id",
      numBuckets = 2)
    val before = MergeTable.read(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    graft.plans.MergeTableSql.register("mstats_z_t", dir)
    try spark.sql("OPTIMIZE mstats_z_t ZORDER BY (a, b)")
    finally graft.plans.MergeTableSql.unregister("mstats_z_t")
    val after = MergeTable.read(spark, dir)
    assert(after.as[(Long, Long, Long)].collect().toSet === before)
    // replicate the compaction's binning (16 cells over the data's min/max)
    // and assert per-file z-monotonicity — the in-file order parquet
    // row-group stats tighten on, for BOTH columns at once
    val (loA, hiA) = (rows.map(_._2).min.toDouble, rows.map(_._2).max.toDouble)
    val (loB, hiB) = (rows.map(_._3).min.toDouble, rows.map(_._3).max.toDouble)
    def cell(v: Double, lo: Double, hi: Double): Int = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      math.min(15, math.max(0, ((v - lo) / span * 16).toInt))
    }
    after.inputFiles.foreach { f =>
      val zs = spark.read.parquet(f).select("a", "b")
        .as[(Long, Long)].collect().toSeq
        .map { case (a, b) => ZOrder.zvalueScala(
          cell(a.toDouble, loA, hiA), cell(b.toDouble, loB, hiB)) }
      assert(zs === zs.sorted, s"file $f not z-ordered")
    }
    // a non-numeric or unknown column fails loudly
    val e = intercept[IllegalArgumentException] {
      MergeTable.compact(spark, dir, zorderBy = Some(("id", "nope")))
    }
    assert(e.getMessage.contains("ZORDER BY"))
  }

  test("timestamp stats prune under the pinned session timezone") {
    val dir = freshDir("ts")
    val rows = (1L to 32L).map { id =>
      val b = bucketOf(id, 4)
      // each bucket gets its own hour
      (id, java.sql.Timestamp.valueOf(f"2026-03-01 0$b%d:00:00")
        .toInstant.plusSeconds(id % 10), "create")
    }
    MergeTable.merge(spark, dir,
      rows.toDF("id", "ts", "op_flag"), "id", numBuckets = 4)
    val pred = col("ts") >= lit(java.sql.Timestamp.valueOf("2026-03-01 02:00:00")) &&
      col("ts") < lit(java.sql.Timestamp.valueOf("2026-03-01 03:00:00"))
    assert(MergeTable.prunableBuckets(dir, pred) === Some(Set(2)))
    assert(MergeTable.readWhere(spark, dir, pred).count() ===
      MergeTable.read(spark, dir).filter(pred).count())
  }

  test("key equality prunes to the layout's own bucket (point lookups read ONE bucket)") {
    val dir = localizedTable("keyeq")
    val b5 = bucketOf(5L, 4)
    assert(MergeTable.prunableBuckets(dir, col("id") === 5L) === Some(Set(b5)))
    // int literal coerces to the long key and still engages
    assert(MergeTable.prunableBuckets(dir, col("id") === 5) === Some(Set(b5)))
    // extra conjuncts compose; literal-on-the-left flips
    assert(MergeTable.prunableBuckets(dir,
      lit(5L) === col("id") && col("v") >= 0L) === Some(Set(b5)))
    val got = MergeTable.readWhere(spark, dir, col("id") === 5L)
      .as[(Long, Long, String)].collect().toSeq
    assert(got === MergeTable.read(spark, dir).filter(col("id") === 5L)
      .as[(Long, Long, String)].collect().toSeq && got.nonEmpty)
    // IN-lists union the values' buckets
    val want = Set(5L, 6L, 7L).map(bucketOf(_, 4))
    assert(MergeTable.prunableBuckets(dir,
      col("id").isin(5L, 6L, 7L)) === Some(want))
    assert(MergeTable.readWhere(spark, dir, col("id").isin(5L, 6L, 7L))
      .count() === 3L)
    // a conflicting conjunction keeps one bucket; the filter answers empty
    assert(MergeTable.readWhere(spark, dir,
      col("id") === 5L && col("id") === 6L).count() === 0L)
  }

  test("composite keys prune only when EVERY part is pinned") {
    val dir = freshDir("keyeq_ck")
    val rows = for (i <- 1L to 8L; p <- Seq("a", "b"))
      yield (i, p, i * 10L, "create")
    MergeTable.mergeKeys(spark, dir,
      rows.toDF("id", "part", "v", "op_flag"), Seq("id", "part"),
      numBuckets = 4)
    val expect = spark.range(1)
      .select(pmod(hash(lit(3L), lit("a")), lit(4))).head().getInt(0)
    assert(MergeTable.prunableBuckets(dir,
      col("id") === 3L && col("part") === "a") === Some(Set(expect)))
    val got = MergeTable.readWhere(spark, dir,
        col("id") === 3L && col("part") === "a")
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((3L, "a", 30L)))
    // one part alone must NOT engage the key pruner (the tuple hash needs
    // every part); stats may or may not prune — answers decide
    assert(MergeTable.readWhere(spark, dir, col("id") === 3L).count() === 2L)
  }
}
