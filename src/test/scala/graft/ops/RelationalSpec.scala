package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("mergePlan: matched→update carrying target id, source-only→create, target-only→delete") {
    val src = Seq(("Alice", 10), ("Bob", 20), ("Carol", 30)).toDF("name", "v")
    val tgt = Seq((101L, "ALICE"), (102L, "bob"), (103L, "Zed")).toDF("id", "tag")
    val plan = Relational.mergePlan(src, tgt, "name", "tag", "id")
      .select("name", "op_flag", "target_id").as[(String, String, Option[Long])]
      .collect().toSet
    assert(plan === Set(
      ("Alice", "update", Some(101L)),
      ("Bob", "update", Some(102L)),
      ("Carol", "create", None),
      (null, "delete", Some(103L))))
  }

  test("mergePlan: duplicate target keys deduplicate deterministically (smallest id wins)") {
    val src = Seq(("a", 1)).toDF("name", "v")
    val tgt = Seq((9L, "A"), (2L, "a"), (5L, "A")).toDF("id", "tag")
    val plan = Relational.mergePlan(src, tgt, "name", "tag", "id")
    val row = plan.select("op_flag", "target_id").as[(String, Long)].collect()
    assert(row.toSeq === Seq(("update", 2L)))
  }

  test("dedupKeepFirst keeps exactly one row per key, by the given order") {
    val df = Seq(("k1", 3), ("k1", 1), ("k1", 2), ("k2", 9)).toDF("k", "v")
    val out = Relational.dedupKeepFirst(df, Seq("k"), Seq(col("v"))).as[(String, Int)]
      .collect().toSet
    assert(out === Set(("k1", 1), ("k2", 9)))
  }

  test("anti and semi joins partition the left side") {
    val l = Seq(1, 2, 3, 4).toDF("k")
    val r = Seq(2, 4, 6).toDF("rk")
    val anti = Relational.antiJoin(l, r, col("k") === col("rk")).as[Int].collect().toSet
    val semi = Relational.semiJoin(l, r, col("k") === col("rk")).as[Int].collect().toSet
    assert(anti === Set(1, 3))
    assert(semi === Set(2, 4))
    assert((anti ++ semi) === Set(1, 2, 3, 4))
  }

  test("topK returns k rows in total order; plan is TakeOrderedAndProject (no full sort)") {
    val df = (1 to 100).toDF("v")
    val top = Relational.topK(df, 5, col("v").desc)
    assert(top.as[Int].collect().toSeq === Seq(100, 99, 98, 97, 96))
    val phys = top.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject in:\n$phys")
  }

  test("topKPerGroup bounds each group independently") {
    val df = Seq(("g1", 1), ("g1", 2), ("g1", 3), ("g2", 7)).toDF("g", "v")
    val out = Relational.topKPerGroup(df, 2, Seq(col("g")), Seq(col("v").desc))
      .select("g", "v").as[(String, Int)].collect().toSet
    assert(out === Set(("g1", 3), ("g1", 2), ("g2", 7)))
  }

  test("saltedJoin matches the plain equi-join result") {
    val big = Seq(("k", 1), ("k", 2), ("k", 3), ("j", 4)).toDF("key", "v")
    val dim = Seq(("k", "hot"), ("j", "cold")).toDF("key", "name")
    val salted = Relational.saltedJoin(big, dim, "key", buckets = 4)
      .select("key", "v", "name").as[(String, Int, String)].collect().toSet
    val plain = big.join(dim, "key")
      .select("key", "v", "name").as[(String, Int, String)].collect().toSet
    assert(salted === plain)
  }

  test("mergePlan: a NULL source key classifies as create, never delete") {
    val src = Seq((Some("a"), 1), (None, 2)).toDF("name", "v")
    val tgt = Seq((101L, "A")).toDF("id", "tag")
    val plan = Relational.mergePlan(src, tgt, "name", "tag", "id")
      .select("v", "op_flag").as[(Option[Int], String)].collect().toSet
    assert(plan === Set((Some(1), "update"), (Some(2), "create")))
  }

  test("asofJoin: ties on (key, ts) resolve deterministically (max carry wins)") {
    val left = Seq((1L, "u", 100L)).toDF("id", "k", "t")
    // three right rows at the exact same (key, ts) — without a tiebreak the
    // carried value is shuffle-arrival order
    val right = Seq(("u", 100L, "a"), ("u", 100L, "c"), ("u", 100L, "b"))
      .toDF("k", "t", "tag")
    val got = (1 to 5).map { _ =>
      Relational.asofJoin(left, right.repartition(4), "k", "t", "t", Seq("tag"))
        .select("tag").as[String].head()
    }
    assert(got.toSet === Set("c")) // greatest by the carry column, every run
  }

  test("saltedJoin salts only hot keys; cold keys are not replicated") {
    // key "h" has 6 rows (hot at threshold 3); "c" has 1 (cold)
    val big = ((1 to 6).map(i => ("h", i)) :+ (("c", 99))).toDF("key", "v")
    val dim = Seq(("h", "x"), ("c", "y")).toDF("key", "name")
    val hot = Relational.hotKeys(big, "key", 3).as[String].collect().toSeq
    assert(hot === Seq("h")) // only the hot key is salted/replicated
    val salted = Relational.saltedJoin(big, dim, "key", buckets = 4, hotThreshold = 3)
      .select("key", "v", "name").as[(String, Int, String)].collect().toSet
    val plain = big.join(dim, "key")
      .select("key", "v", "name").as[(String, Int, String)].collect().toSet
    assert(salted === plain)
    // no hot keys at a high threshold → degenerates to the plain join result
    val nohot = Relational.saltedJoin(big, dim, "key", buckets = 4, hotThreshold = 100)
      .select("key", "v", "name").as[(String, Int, String)].collect().toSet
    assert(nohot === plain)
  }

  test("lookupEnrich broadcasts the dimension side") {
    val facts = (1 to 50).map(i => (i, i % 3)).toDF("id", "dk")
    val dim = Seq((0, "a"), (1, "b"), (2, "c")).toDF("k", "name")
    val out = Relational.lookupEnrich(facts, dim, col("dk"), col("k"))
    assert(out.count() === 50)
    val phys = out.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin in:\n$phys")
  }

  test("bucketed tables sort-merge join with no exchange and no sort") {
    val a = (1 to 1000).map(i => (i.toLong, i * 2)).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 3)).toDF("k", "vb")
    Relational.writeBucketed(a, "bkt_a", "k", 4)
    Relational.writeBucketed(b, "bkt_b", "k", 4)
    try {
      val j = spark.table("bkt_a").hint("merge")
        .join(spark.table("bkt_b"), Seq("k"))
      val phys = j.queryExecution.executedPlan.toString
      assert(phys.contains("SortMergeJoin"), phys)
      // the whole point of the bucketed layout: ZERO exchanges — the join
      // reads co-located buckets directly. (The in-partition Sort remains
      // unless the legacy bucketed-scan-ordering conf is on; it is a local
      // pass over one already-sorted file, not a shuffle.)
      assert(!phys.contains("Exchange"), s"bucketed join still shuffles:\n$phys")
      assert(phys.contains("Bucketed: true"), phys)
      assert(j.count() === 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("rangeJoinBinned equals the naive interval join and plans a hash join") {
    val width = 3600L // 1-hour intervals
    // facts every 10 minutes over 3 days; intervals at uneven offsets so
    // matches straddle bin boundaries both ways
    val facts = (0 until 3 * 24 * 6).map(i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 600000L))).toDF("fid", "ts")
    val intervals = Seq(0L, 1L, 2L, 3L).map(j =>
      (j, new java.sql.Timestamp(1700000000000L + j * 7130000L))).toDF("iid", "start")
    val binned = Relational.rangeJoinBinned(facts, intervals, "ts", "start", width)
      .select("fid", "iid").as[(Long, Long)].collect().toSet
    val naive = facts.join(intervals,
        col("ts") >= col("start") &&
          col("ts") < col("start") + expr(s"INTERVAL $width SECONDS"))
      .select("fid", "iid").as[(Long, Long)].collect().toSet
    assert(binned === naive)
    assert(naive.nonEmpty)
    val phys = Relational.rangeJoinBinned(facts, intervals, "ts", "start", width)
      .queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), s"expected hash join, got:\n$phys")
    assert(!phys.contains("BroadcastNestedLoopJoin"), phys)
  }

  test("scd2FromLog collapses runs into validity intervals that tile the key's timeline") {
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    // user 1: A A B A (runs A, B, A); user 2: single X; attr null handled
    val log = Seq(
      (1L, 10L, Some("A"), ts(0)), (1L, 11L, Some("A"), ts(1)),
      (1L, 12L, Some("B"), ts(2)), (1L, 13L, Some("A"), ts(3)),
      (2L, 20L, Some("X"), ts(0)),
      (3L, 30L, None: Option[String], ts(0)), (3L, 31L, None, ts(1)),
      (3L, 32L, Some("Y"), ts(2))
    ).toDF("user_id", "event_id", "attr", "ts")
    val h = Relational.scd2FromLog(log, "user_id", "attr", "ts", "event_id")
      .select(col("user_id"), col("event_id"), col("attr"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .as[(Long, Long, Option[String], java.sql.Timestamp, Option[java.sql.Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._4.getTime))
    assert(h.map(r => (r._1, r._2, r._3, r._6)).toSeq === Seq(
      (1L, 10L, Some("A"), false), (1L, 12L, Some("B"), false),
      (1L, 13L, Some("A"), true),
      (2L, 20L, Some("X"), true),
      (3L, 30L, None, false), (3L, 32L, Some("Y"), true)))
    // each closed interval's valid_to equals the next interval's valid_from
    h.groupBy(_._1).values.foreach { rows =>
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a._5.contains(b._4))
        case _ => ()
      }
    }
    // exactly one current row per key
    assert(h.filter(_._6).map(_._1).toSeq.sorted === Seq(1L, 2L, 3L))
  }

  test("gapFillCounts: dense grid over the global range, missing buckets zero-filled") {
    val df = Seq(
      ("a", "2024-01-01 00:00:10"), ("a", "2024-01-01 00:00:50"),
      ("a", "2024-01-01 00:02:05"), // a skips minute 1
      ("b", "2024-01-01 00:01:30")  // b exists only in minute 1
    ).toDF("k", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val got = Relational.gapFillCounts(df, "k", "ts", 60)
      .select(col("k"), date_format(col("bucket"), "HH:mm").as("b"), col("n"))
      .as[(String, String, Long)].collect().toSet
    // 3 minutes x 2 keys = 6 rows, gaps present with n=0
    assert(got === Set(
      ("a", "00:00", 2L), ("a", "00:01", 0L), ("a", "00:02", 1L),
      ("b", "00:00", 0L), ("b", "00:01", 1L), ("b", "00:02", 0L)))
  }

  test("madOutliers: median immune to the spike, spike flagged") {
    val df = ((1 to 99).map(_ => 10.0) :+ 10000.0).map(("k", _)).toDF("k", "v")
    val out = Relational.madOutliers(df, "k", "v", 3.0)
      .select("n", "med", "mad", "n_outliers")
      .as[(Long, Double, Double, Long)].head()
    assert(out === ((100L, 10.0, 0.0, 1L))) // med/mad robust; only the spike flagged
  }

  test("trendForecast: exact OLS over an integer series predicts the next bucket") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // key a: counts 1,2,3 at hourly buckets -> slope 1, next = 4
    val series = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1L),
      ("a", ts("2024-01-01 01:00:00"), 2L),
      ("a", ts("2024-01-01 02:00:00"), 3L),
      ("b", ts("2024-01-01 00:00:00"), 7L) // single bucket -> flat forecast
    ).toDF("k", "bucket", "n")
    val out = Relational.trendForecast(series, "k", "bucket", "n", 3600)
      .select("k", "slope", "intercept", "forecast_next")
      .as[(String, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("a") === (("a", 1.0, 1.0, 4.0)))
    assert(out("b") === (("b", 0.0, 7.0, 7.0)))
  }

  test("histogram: equi-width bins, max lands in last bin, constant group in bin 0") {
    val df = (Seq(0.0, 1.0, 5.0, 9.9, 10.0).map(("a", _)) ++
      Seq(("b", 7.0), ("b", 7.0))).toDF("k", "v")
    val out = Relational.histogram(df, "k", "v", 10)
      .select("k", "bin", "lo_edge", "n")
      .as[(String, Long, Double, Long)].collect().toSet
    // group a: range [0,10], width 1: 0->bin0, 1->bin1, 5->bin5, 9.9->bin9, 10->bin9 (clamped)
    assert(out.filter(_._1 == "a").map(r => (r._2, r._4)) ===
      Set((0L, 1L), (1L, 1L), (5L, 1L), (9L, 2L)))
    assert(out.filter(_._1 == "a").find(_._2 == 5L).get._3 === 5.0)
    // group b: constant -> single bin 0 with both rows
    assert(out.filter(_._1 == "b") === Set(("b", 0L, 7.0, 2L)))
  }

  test("group profilers keep the null-key stratum (fuzz-caught) and still broadcast") {
    // GROUP BY makes null a group; the join-back must not drop it. Before
    // the null-safe join fix, every null-key row vanished at this seam.
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0), (None, 5.0), (None, 7.0))
      .toDF("k", "v")
    val hist = Relational.histogram(df, "k", "v", 2)
    val nullBins = hist.filter(col("k").isNull)
      .select("bin", "n").as[(Long, Long)].collect().toSet
    assert(nullBins === Set((0L, 1L), (1L, 1L))) // 5.0 -> bin0, 7.0 -> bin1
    val win = Relational.winsorizedStats(df, "k", "v", 0.05, 0.95)
    assert(win.filter(col("k").isNull).count() === 1L)
    val mad = Relational.madOutliers(df, "k", "v", 3.0)
    val madNull = mad.filter(col("k").isNull)
      .select("n", "med").as[(Long, Double)].collect()
    assert(madNull.toSeq === Seq((2L, 6.0)))
    // the null-safe `<=>` key is still a hash-joinable equi key: the
    // profile join-back must stay a broadcast hash join, not degrade to BNLJ
    val phys = hist.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"),
      s"expected BroadcastHashJoin in:\n$phys")
  }

  test("funnel: steps must occur in order; out-of-order steps don't count") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val e = Seq(
      // user 1: full ordered funnel
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // user 2: click BEFORE view -> no step 2
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 09:30:00")),
      // user 3: view+click, purchase before click -> no step 3
      (3L, "view", ts("2024-01-01 08:00:00")),
      (3L, "purchase", ts("2024-01-01 08:10:00")),
      (3L, "click", ts("2024-01-01 08:20:00")),
      // user 4: never viewed -> absent from output
      (4L, "purchase", ts("2024-01-01 07:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Relational.funnel(e, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .select(col("user_id"), col("t2").isNotNull, col("t3").isNotNull)
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L) === ((true, true)))
    assert(out(2L) === ((false, false)))
    assert(out(3L) === ((true, false)))
  }

  test("funnel generalizes to k steps (2 and 4), columns t1..tk") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val e = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (1L, "b", ts("2024-01-01 10:01:00")),
      (1L, "c", ts("2024-01-01 10:02:00")),
      (1L, "d", ts("2024-01-01 10:03:00")),
      // user 2 stops after step 2; step-4 event BEFORE step 3 must not count
      (2L, "a", ts("2024-01-01 09:00:00")),
      (2L, "b", ts("2024-01-01 09:01:00")),
      (2L, "d", ts("2024-01-01 09:02:00"))
    ).toDF("user_id", "event_type", "ts")
    val four = Relational.funnel(e, "user_id", "event_type", "ts",
      Seq("a", "b", "c", "d"))
    assert(four.columns.toSeq === Seq("user_id", "t1", "t2", "t3", "t4"))
    val m = four.select(col("user_id"), col("t2").isNotNull, col("t4").isNotNull)
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(m === Map(1L -> ((true, true)), 2L -> ((true, false))))
    val two = Relational.funnel(e, "user_id", "event_type", "ts", Seq("a", "b"))
    assert(two.columns.toSeq === Seq("user_id", "t1", "t2"))
    assert(two.count() === 2)
  }

  test("retentionCohorts: week offsets count from each user's first week") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00")), // Mon wk0
      (1L, ts("2024-01-10 10:00:00")), // wk1
      (2L, ts("2024-01-09 10:00:00"))  // first seen wk1
    ).toDF("user_id", "ts")
    val out = Relational.retentionCohorts(e, "user_id", "ts")
      .select(date_format(col("cohort_week"), "MM-dd").as("c"),
        col("week_n"), col("n_users"))
      .as[(String, Long, Long)].collect().toSet
    assert(out === Set(("01-01", 0L, 1L), ("01-01", 1L, 1L), ("01-08", 0L, 1L)))
  }

  test("winsorizedStats: outlier clipped to hi bound moves the mean") {
    val df = (Seq.fill(99)(10.0) :+ 1000.0).map(("k", _)).toDF("k", "v")
    val out = Relational.winsorizedStats(df, "k", "v", 0.05, 0.95)
      .select("n", "lo", "hi", "clipped_mean")
      .as[(Long, Double, Double, Double)].head()
    assert(out._1 === 100L && out._2 === 10.0)
    assert(out._4 < 1000.0 && out._4 >= 10.0) // outlier influence bounded by hi
    assert(out._4 === math.floor((99 * 10.0 + out._3) / 100 * 1e6) / 1e6)
  }

  test("winsorizedStatsApprox tracks the exact form (scale variant, q88 gating)") {
    val ev = graft.model.Tables.events(spark, sfDir)
    val exact = Relational.winsorizedStats(ev, "event_type", "value", 0.05, 0.95)
      .select("event_type", "n", "clipped_mean")
      .as[(String, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val approx = Relational.winsorizedStatsApprox(ev, "event_type", "value", 0.05, 0.95)
      .select("event_type", "n", "clipped_mean")
      .as[(String, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, (n, m)) <- exact) {
      assert(approx(k)._1 === n)
      // sketch bounds are data values, exact bounds interpolate: the means
      // differ only by rows between the two bound estimates
      assert(math.abs(approx(k)._2 - m) <= math.max(0.01 * math.abs(m), 0.05),
        s"$k: approx=${approx(k)._2} exact=$m")
    }
  }

  test("weightedSample: deterministic, k rows, heavy weights dominate the sample") {
    val rows = (1L to 500L).map(i => (i, if (i <= 10) 1000.0 else 1.0))
    val df = rows.toDF("id", "w")
    val s1 = Relational.weightedSample(df, col("id"), col("w"), 50)
      .select("id").as[Long].collect().toSet
    val s2 = Relational.weightedSample(df, col("id"), col("w"), 50)
      .select("id").as[Long].collect().toSet
    assert(s1 === s2 && s1.size === 50)          // reproducible, exactly k
    assert((1L to 10L).toSet.subsetOf(s1))       // heavy rows all win
    // a different seed gives a different (but still deterministic) sample
    val s3 = Relational.weightedSample(df, col("id"), col("w"), 50, seed = "other")
      .select("id").as[Long].collect().toSet
    assert(s3 !== s1)
    assert((1L to 10L).toSet.subsetOf(s3))
  }

  test("weightedSample: rows with weight <= 0 or null are excluded, never sampled") {
    val rows: Seq[(Long, java.lang.Double)] =
      (1L to 20L).map(i => (i, java.lang.Double.valueOf(1.0))) ++
        Seq((100L, java.lang.Double.valueOf(0.0)),
            (101L, java.lang.Double.valueOf(-5.0)),
            (102L, null.asInstanceOf[java.lang.Double]))
    val df = rows.toDF("id", "w")
    // k larger than the eligible population: every positive-weight row is
    // taken, the non-positive/null rows are still excluded (not padded in)
    val out = Relational.weightedSample(df, col("id"), col("w"), 50)
      .select("id").as[Long].collect().toSet
    assert(out === (1L to 20L).toSet)
    assert(!out.exists(_ >= 100L))
  }

  test("rollingAnomalies: warmup never flags, zero-variance jump flags, in-band value does not") {
    val series = Seq(
      ("k", 1, 5L), ("k", 2, 5L), ("k", 3, 5L), ("k", 4, 5L),
      ("k", 5, 9L),  // history (5,5,5): var 0, dev 4 -> anomaly
      ("k", 6, 5L)   // history (5,5,9): dev² 1.78 < z²·var 14.2 -> ok
    ).toDF("k", "bucket", "n")
    val out = Relational.rollingAnomalies(series, "k", "bucket", "n", 3, 2.0)
      .select("bucket", "mean_prev", "is_anomaly")
      .as[(Int, Option[Double], Boolean)].collect().sortBy(_._1)
    assert(out.take(3).forall(r => !r._3 && r._2.isEmpty)) // warmup: frame < 3
    assert(out(3) === ((4, Some(5.0), false)))             // steady state
    assert(out(4)._3 === true)                             // the spike
    assert(out(5)._3 === false)
    assert(out(5)._2.exists(m => math.abs(m - 6.333333) < 1e-9))
  }

  test("sessionize: splits at inactivity gaps, exact integer-µs session stats") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, ts(0), 10L), (1L, ts(10), 11L),      // session 1: 0..10s
      (1L, ts(2000), 12L), (1L, ts(2010), 13L), // gap 1990s > 1800 -> session 2
      (2L, ts(5), 20L)                          // lone event, its own session
    ).toDF("user_id", "ts", "event_id")
    val out = Relational.sessionize(ev, "user_id", "ts", "event_id", 1800)
      .select("user_id", "sess", "start_us", "end_us", "n_events", "dur_us")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, 1L, 0L, 10000000L, 2L, 10000000L),
      (1L, 2L, 2000000000L, 2010000000L, 2L, 10000000L),
      (2L, 1L, 5000000L, 5000000L, 1L, 0L)))
  }

  test("splitAssign: buckets match an independent md5 computation; thresholds carve splits") {
    def bucketOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"split0|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 100
    }
    val ids = (0L until 50L)
    val df = ids.toDF("doc_id")
    val got = Relational.splitAssign(df, col("doc_id"))
      .select("doc_id", "bucket", "split")
      .as[(Long, Long, String)].collect()
    assert(got.length === 50)
    got.foreach { case (id, b, s) =>
      assert(b === bucketOf(id), s"bucket mismatch for id $id")
      val expected = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(s === expected)
    }
    // determinism: a second evaluation assigns identically
    val again = Relational.splitAssign(df, col("doc_id"))
      .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
    assert(got.forall { case (id, b, _) => again(id) == b })
  }

  test("skewProfile: hot key ranked first, share/skew/salt computed") {
    // key "hot": 6 rows, "warm": 3, "cold": 1 -> total 10, mean 10/3
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold"))
      .toDF("k")
    val r = Relational.skewProfile(df, "k", topN = 2, targetRowsPerTask = 4L)
      .select("rank", "key_value", "cnt", "share", "skew_factor", "salt")
      .as[(Long, String, Long, Double, Double, Long)].collect().toSeq
    assert(r.map(x => (x._1, x._2, x._3)) === Seq((1L, "hot", 6L), (2L, "warm", 3L)))
    assert(math.abs(r.head._4 - 0.6) < 2e-6)   // share 6/10 (trunc6)
    assert(math.abs(r.head._5 - 1.8) < 2e-6)   // max/mean = 6/(10/3) (trunc6)
    assert(r.map(_._6) === Seq(2L, 1L))        // ceil(6/4)=2, ceil(3/4)=1
  }

  test("sampleKPerGroup: exactly k per group, stable across repartitionings") {
    val df = (1L to 40L).map(i => (i, if (i <= 30) "big" else "small"))
      .toDF("id", "g")
    val s1 = Relational.sampleKPerGroup(df, "g", "id", 5)
      .select("g", "id", "draw").as[(String, Long, Long)].collect().toSet
    assert(s1.count(_._1 == "big") === 5)
    assert(s1.count(_._1 == "small") === 5)
    assert(s1.filter(_._1 == "big").map(_._3) === Set(1L, 2L, 3L, 4L, 5L))
    // small group has 10 rows; k larger than the group caps at group size
    val all = Relational.sampleKPerGroup(df.filter($"g" === "small"), "g", "id", 99)
      .count()
    assert(all === 10)
    // partitioning must not change the winners (md5 order is data-only)
    val s2 = Relational.sampleKPerGroup(df.repartition(7), "g", "id", 5)
      .select("g", "id", "draw").as[(String, Long, Long)].collect().toSet
    assert(s1 === s2)
  }

  test("welchTTest: hand-computed t/df; degenerate arms yield NULL, not t=0") {
    // arm 0 = [1,2,3] (m=2, var=1); arm 1 = [5,7,9,11] (m=8, var=20/3)
    // se2 = 1/3 + 5/3 = 2 -> t = -6/sqrt(2) = -4.2426406...
    // df  = 4 / ((1/9)/2 + (25/9)/3) = 4.0754716...
    val rows = Seq(1.0, 2.0, 3.0).map(v => ("g", 0, v)) ++
      Seq(5.0, 7.0, 9.0, 11.0).map(v => ("g", 1, v)) ++
      Seq(("one", 0, 4.0), ("one", 1, 5.0), ("one", 1, 6.0)) ++ // arm a has n=1
      Seq(("flat", 0, 2.0), ("flat", 0, 2.0), ("flat", 1, 2.0), ("flat", 1, 2.0))
    val df = rows.toDF("grp", "variant", "value")
    val r = Relational.welchTTest(df, "grp", "variant", "value")
      .select("grp", "n_a", "n_b", "mean_a", "mean_b", "t_stat", "df_welch", "significant")
      .as[(String, Long, Long, Double, Double, Option[Double], Option[Double], Option[Boolean])]
      .collect().map(x => x._1 -> x).toMap
    val g = r("g")
    assert(g._2 === 3L && g._3 === 4L && g._4 === 2.0 && g._5 === 8.0)
    assert(g._6 === Some(-4.242641))  // floor truncation: more negative
    assert(g._7 === Some(4.075471))
    assert(g._8 === Some(true))
    assert(r("one")._6 === None && r("one")._8 === None)   // n_a < 2
    assert(r("flat")._6 === None)                          // zero variance
  }

  test("ewmaSmooth: exact integer weighting — constants pass through, a spike decays by 3/4 steps") {
    // 12 zeros then a spike of 100: first full-window row is bucket 12
    val rows = ((1 to 12).map(b => ("a", b, 0L)) :+ ("a", 13, 100L)) ++
      (1 to 13).map(b => ("c", b, 5L)) // constant series -> ewma == 5 exactly
    val df = rows.toDF("k", "bucket", "n")
    val r = Relational.ewmaSmooth(df, "k", "bucket", "n", 12)
      .select("k", "bucket", "ewma")
      .as[(String, Int, Double)].collect().map(x => (x._1, x._2) -> x._3).toMap
    // warmup rows (bucket < 12) are dropped
    assert(!r.contains(("a", 11)) && !r.contains(("c", 11)))
    assert(r(("c", 12)) === 5.0 && r(("c", 13)) === 5.0)
    assert(r(("a", 12)) === 0.0)
    // spike weight = 4^11 / (4^12 - 3^12), computed independently
    val expect = math.floor(100.0 * 4194304.0 / 16245775.0 * 1e6) / 1e6
    assert(r(("a", 13)) === expect)
  }
}
