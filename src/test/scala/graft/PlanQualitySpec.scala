package graft

import graft.SparkSpec

/** Plan-shape regressions: the properties that make these queries scale are
  * asserted here so a refactor can't silently lose them (SURVEY.md §4). */
class PlanQualitySpec extends SparkSpec {

  private def physical(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q01: filter is pushed to the parquet scan and columns are pruned") {
    val p = physical("q01_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), p)
    // projection pruning: the 11-column lineitem scan reads only the 6 needed
    assert(p.contains("FileScan parquet [l_orderkey#"), p)
    assert(!p.contains("l_quantity"), s"unpruned column in scan: $p")
  }

  test("q02: dimension joins are broadcast, not shuffled") {
    val p = physical("q02_lookup_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q06: aggregation is partial+final (map-side combine before the shuffle)") {
    val p = physical("q06_agg_pricing")
    assert(p.contains("partial_sum"), p)
  }

  test("q11: global top-k plans TakeOrderedAndProject, never a full sort") {
    val p = physical("q11_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q164: the entropy profile is EXCHANGE-FREE scan work below its output sort") {
    val p = physical("q164_entropy")
    // one fused kernel projection: no explode, no aggregation, no window
    // — the only allowed exchange is the final ORDER BY's range partition
    assert(p.contains("entropy_profile"), p)
    assert(!p.contains("Generate"), s"unexpected explode in: $p")
    assert(!p.contains("HashAggregate"), s"unexpected aggregation in: $p")
    assert(!p.contains("Window"), s"unexpected window in: $p")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"entropy plan should only exchange for its sort: $p")
  }

  test("q09: per-group top-k uses WindowGroupLimit (partial rank pruning)") {
    val p = physical("q09_window_rank")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q24: similarity kernel is the native expression inside codegen") {
    val p = physical("q24_cosine_topk")
    assert(p.contains("vec_cosine"), p)
  }

  test("q40: tf-idf carries no broadcast hint (vocabulary must not pin to driver)") {
    // a broadcast HINT would force the multi-billion-term vocabulary of a
    // web-scale corpus through the driver; the join must be left to AQE
    val opt = SparkEntry.queries("q40_tfidf")(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(!opt.toLowerCase.contains("broadcast"), s"broadcast hint survived:\n$opt")
  }

  test("q46/q28: text kernels are the native expressions, not interpreted HOF chains") {
    val p46 = physical("q46_repetition")
    assert(p46.contains("repetition_ratio"), p46)
    assert(!p46.contains("array_distinct"), s"HOF formulation leaked back in: $p46")
    val p28 = physical("q28_fingerprint")
    assert(p28.contains("simhash16"), p28)
    assert(!p28.contains("aggregate("), s"interpreted fold leaked back in: $p28")
  }

  test("q49: as-of plan keeps one exchange per side and no unconditional repartition") {
    val p = physical("q49_asof_native")
    assert(p.contains("AsofJoin"), p)
    // exactly one hash exchange per child — a regression that re-pins
    // partition counts shows up as extra exchanges here
    assert(p.split("Exchange hashpartitioning").length == 3, p)
  }

  test("q56: winnowing runs the native rolling-hash kernel, not a HOF chain") {
    val p = physical("q56_winnow_fps")
    assert(p.contains("winnow_fps"), p)
    assert(!p.contains("array_sort"), s"HOF formulation leaked back in: $p")
  }

  test("q57: df-filter window and candidate self-join share the fp partitioning") {
    // the document-frequency window and the self-join both key on `fp`;
    // the window's exchange must be reusable by the join — more than 3
    // hash exchanges means a key mismatch re-shuffled the exploded table
    val p = physical("q57_winnow_pairs")
    val n = p.split("Exchange hashpartitioning").length - 1
    assert(n <= 3, s"expected <=3 hash exchanges (fp window, join sides), got $n:\n$p")
  }

  test("q57: the exploded fingerprint shuffle is computed once, then reused") {
    // both self-join sides derive from the same kernel+explode+shuffle
    // subtree; at execution the second side must read the first side's
    // shuffle (AQE stage reuse / ReusedExchange), not recompute the scan —
    // the reason winnowingCandidates needs no materialization barrier
    val df = SparkEntry.queries("q57_winnow_pairs")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"no exchange reuse in executed plan:\n$p")
  }

  test("q71: SCD2 shuffles ONCE — both windows and the filter share the key partitioning") {
    val p = physical("q71_scd2")
    val n = p.split("Exchange hashpartitioning").length - 1
    assert(n == 1, s"expected exactly 1 hash exchange for scd2, got $n:\n$p")
  }

  test("q70: grouping sets is one Expand + one partial/final aggregate, not a union of scans") {
    val p = physical("q70_grouping_sets")
    assert(p.contains("Expand"), p)
    val n = p.split("Exchange hashpartitioning").length - 1
    assert(n == 1, s"expected 1 exchange (single agg over Expand), got $n:\n$p")
    assert(p.contains("partial_sum"), s"no map-side combine:\n$p")
    // one scan of lineitem, not one per grouping set
    assert(p.split("FileScan parquet").length - 1 == 1, p)
  }

  test("q68: simhash adjacency joins on band buckets — no cartesian, no distinct re-shuffle") {
    val p = physical("q68_simhash_adjacency")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // first-matching-band rule replaced distinct(): no HashAggregate
    // keyed on (sha, shb) pair dedup after the join
    assert(!p.contains("partial_first"), p)
    val joins = p.split("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin").length - 1
    assert(joins == 1, s"expected exactly the band self-join, got $joins joins:\n$p")
    // the fingerprint rollup is checkpointed at its 3-way fan-out: the
    // corpus parquet must not be re-scanned per consumer (r7 — it ran 3×)
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"corpus re-scanned past the rollup checkpoint ($scans):\n$p")
  }

  test("q76: the dedup subtree is checkpointed at its fan-out — corpus scanned once, not per consumer") {
    val p = physical("q76_pipeline")
    // both consumers (near-dup reps + corpus join-back) read the
    // checkpointed uniq table; no documents.parquet scan survives in the
    // final plan (the scan ran once, inside the checkpoint job)
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"dedup subtree re-scanned past the checkpoint ($scans):\n$p")
  }

  test("q112: chunking is scan-stage work — the only exchange is the final sort") {
    val p = physical("q112_chunking")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges == 1, s"expected only the orderBy range exchange, got $exchanges:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q106: boilerplate rebuild is row-local — no collect_list regroup, no join in the timed plan") {
    // the boilerplate vocabulary is a bounded driver literal (InSet), so
    // the text reconstruction must be one scan + the final sort: any
    // reappearance of the posexplode → df-join → collect_list regroup
    // (two corpus-sized shuffles) is a regression
    val p = physical("q106_boilerplate")
    assert(!p.contains("collect_list"), p)
    assert(!p.contains("Join"), p)
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges == 1, s"expected only the orderBy range exchange, got $exchanges:\n$p")
  }

  test("q101: probe side broadcasts — the corpus weight table is never shuffled for the pair join") {
    val p = physical("q101_sparse_cosine")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q105: pagerank's returned rank table is lineage-truncated (reads its checkpoint, no join tree)") {
    val p = physical("q105_pagerank")
    assert(!p.contains("Join"), s"iteration lineage leaked past the checkpoint:\n$p")
  }

  test("q107: weighted sample plans TakeOrderedAndProject (bounded heap, no global sort)") {
    val plan = SparkEntry.queries("q107_weighted_sample")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q113: histogram's bounds join is broadcast; counts aggregate partially") {
    val p = physical("q113_histogram")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_count"), p)
  }

  test("q117: correlated EXISTS/NOT EXISTS decorrelate to semi/anti joins, no per-row subqueries") {
    val p = physical("q117_exists_sql")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("InSubquery") && !p.contains("ScalarSubquery"), p)
  }

  test("q142: correlated scalar subquery (TPC-H Q2 shape) decorrelates to an aggregate+join, no per-row subquery") {
    val p = physical("q142_sql_q2")
    assert(!p.contains("ScalarSubquery"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the rewrite materializes the per-part min as a grouped aggregate
    assert(p.contains("min("), p)
  }

  test("q143: correlated scalar AVG (TPC-H Q17 shape) decorrelates, no per-row subquery") {
    val p = physical("q143_sql_q17")
    assert(!p.contains("ScalarSubquery"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("avg("), p)
  }

  test("q146: Q21's EXISTS + NOT EXISTS pair decorrelates to LeftSemi + LeftAnti, no per-row subquery") {
    val p = physical("q146_sql_q21")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("InSubquery") && !p.contains("ScalarSubquery"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q153: Q18's IN-over-grouped-HAVING decorrelates to a LeftSemi on the pre-aggregated inner") {
    val p = physical("q153_sql_q18")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("InSubquery"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q154: Q22's NOT EXISTS becomes a LeftAnti; the uncorrelated scalar avg is planned ONCE (a one-row subplan, not a per-row rescan)") {
    val p = physical("q154_sql_q22")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the uncorrelated scalar subquery legitimately survives as a
    // Subquery node — executed once and reused as a literal filter; what
    // must NOT appear is a correlated per-row form (no join under it)
    assert(!p.contains("InSubquery"), p)
  }

  test("q159: Q15's twice-consumed CTE and scalar MAX plan without nested-loop rescans") {
    val p = physical("q159_sql_q15")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("max("), p)
  }

  test("q160: Q11's HAVING-vs-global-scalar plans as two aggregates + filter, no per-row subquery") {
    val p = physical("q160_sql_q11")
    assert(!p.contains("InSubquery"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q172: Q2 on REAL partsupp decorrelates to an aggregate+join, no per-row subquery") {
    val p = physical("q172_sql_q2_partsupp")
    assert(!p.contains("ScalarSubquery"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("min("), p)
  }

  test("q173: Q11 on REAL partsupp plans as two aggregates + filter, no per-row subquery") {
    val p = physical("q173_sql_q11_partsupp")
    assert(!p.contains("InSubquery"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q165: mixture draw plans WindowGroupLimit — map-side rank pruning before the source exchange") {
    val p = physical("q165_mixture_sample")
    // the literal budget bound (quota ≤ budget by construction) is what
    // lets one dominant source avoid a whole-source single-task sort
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q109: k-step funnel is ONE user exchange — chained windows + the closing agg share it") {
    val p = physical("q109_funnel")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n == 1, s"expected exactly 1 hash exchange for the 3-step funnel, got $n\n$p")
  }

  test("q161: span removal is three key-partitioned exchanges, no nested loops") {
    val p = physical("q161_dedup_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n <= 3, s"expected <= 3 hash exchanges, got $n\n$p")
  }

  test("q163: c-TF-IDF derives everything from one count table — bounded exchanges, partial aggs") {
    val p = physical("q163_ctfidf")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n <= 5, s"expected <= 5 hash exchanges, got $n\n$p")
  }

  test("q147: gram dominance is scan-stage kernel work — only the final sort exchanges") {
    val p = physical("q147_gram_dominance")
    assert(p.contains("gram_dominance"), p)
    // the kernel keeps the top-gram argmax row-local: no hash exchange, no
    // aggregate — the single rangepartitioning exchange is the orderBy
    assert(!p.contains("hashpartitioning"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("q148: dup spans explode the native gram kernel; the dup-set join is equi on the gram") {
    val p = physical("q148_dup_spans")
    assert(p.contains("word_grams"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q94: re-rank within pinned cells is an equi-join on cell, never nested-loop") {
    // fixture build (k-means + two small spools) legitimately runs jobs at
    // build time — the contract here is the SHAPE of the rank plan: the
    // candidate join must be equi on the pinned cell id
    val df = SparkEntry.queries("q94_ann_ivf")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(df.columns.contains("rank"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q120: contamination pairs are equi-joined on the n-gram, never nested-loop") {
    val p = physical("q120_contamination")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q121: both sessionize window passes and the group-by share ONE hash exchange") {
    // window(partitionBy user) sorts once; the second window finds its
    // ordering satisfied, and groupBy(user, sess) is subsumed by the
    // user_id hash partitioning (clustering-key subset)
    val p = graft.ops.Relational.sessionize(
        graft.model.Tables.events(spark, sfDir), "user_id", "ts",
        "event_id", 1800)
      .queryExecution.executedPlan.toString
    val n = p.split("Exchange hashpartitioning").length - 1
    assert(n == 1, s"expected 1 hash exchange, got $n:\n$p")
    assert(p.split("Sort \\[").length - 1 == 1, s"expected 1 sort:\n$p")
  }

  test("q126: wedge and closure joins are equi-joins — no nested loop anywhere") {
    val p = physical("q126_triangles")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q129: skew profiler's top-k is TakeOrderedAndProject, never a global sort") {
    val p = physical("q129_skew_profile")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q128: referential checks plan as broadcast anti-joins with partial aggs") {
    val p = physical("q128_data_quality")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q61: bloom prefilter is the native expression pair — no Scala UDF in the plan") {
    val p = physical("q61_incremental_dedup")
    assert(p.contains("might_contain"), p)
    assert(!p.contains("ScalaUDF"), s"bloom probe regressed to a Scala UDF:\n$p")
  }

  test("q189: SQL WHERE over a registered MergeTable lists ONLY stats-surviving bucket directories") {
    import org.apache.spark.sql.functions._
    // bucket-LOCALIZED values (the MergeStatsSpec shape): v = bucket*100+i,
    // so per-bucket min/max ranges are disjoint and the predicate's range
    // names exactly one bucket
    val dir = graft.util.Cleanup.registerTempDir(
      java.nio.file.Files.createTempDirectory("pq_sqlskip")).toString + "/t"
    val bOf = (id: Long) => spark.range(1)
      .select(pmod(hash(lit(id)), lit(4))).head().getInt(0)
    import spark.implicits._
    graft.layout.MergeTable.merge(spark, dir,
      (1L to 64L).map(id => (id, bOf(id) * 100L + id % 10, "create"))
        .toDF("id", "v", "op_flag"), "id", numBuckets = 4)
    graft.plans.MergeTableSql.register("pq_skip_t", dir)
    try {
      val out = spark.sql("SELECT id, v FROM pq_skip_t WHERE v >= 300 ORDER BY id")
      val want = graft.layout.MergeTable.read(spark, dir)
        .filter(col("v") >= 300L).select("id", "v")
        .as[(Long, Long)].collect().toSet
      assert(out.as[(Long, Long)].collect().toSet === want && want.nonEmpty)
      // the scan's file listing covers exactly bucket 3's directory — the
      // WHERE reached readPruned, not the full read
      val p = out.queryExecution.executedPlan.toString
      val buckets = s"""${graft.layout.MergeTable.BucketCol}=(\\d+)""".r
        .findAllMatchIn(p).map(_.group(1)).toSet
      assert(buckets === Set("3"),
        s"SQL scan should list only bucket 3, got $buckets:\n$p")
    } finally graft.plans.MergeTableSql.unregister("pq_skip_t")
  }
}
