package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Runtime bloom-filter demonstration — codifies the second half of the
  * join-pruning decision rule (SkewJoinSpec holds the first):
  *
  *  - a SELECTIVE dim filter + BROADCASTABLE dim → broadcast hash join;
  *    the fact side is pruned inside the join itself, nothing to do.
  *  - a selective dim filter + broadcast-INELIGIBLE dim (too big, or
  *    broadcasting disabled by memory policy) → the join shuffles BOTH
  *    sides, including the fact rows the dim filter would discard. Here
  *    Spark's InjectRuntimeFilter builds a bloom filter over the dim's
  *    join keys and plants `bloom_filter_might_contain` on the fact side
  *    BELOW the exchange — fact rows that cannot match are dropped before
  *    they are ever shuffled. At 100 TB this is the difference between
  *    shuffling the full fact table and shuffling the matching slice.
  *
  * Rule of thumb: broadcast when the dim fits (`broadcast()` hint);
  * otherwise make sure the dim's filter is visibly selective and leave
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` on (default) — the
  * thresholds (`creationSideThreshold` 10 MB, application-side scan
  * 10 GB) are sized so the bloom build never costs more than the shuffle
  * it saves. Test-scale thresholds below only shrink the 10 GB gate to
  * local-data size; the mechanism is the production one.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private val bloomConf = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    // local tables are KB-scale; drop the 10 GB application-side gate so
    // the local fact scan qualifies (everything else is stock)
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    // broadcast-ineligible dim is the scenario: force the shuffle join
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  test("broadcast-ineligible selective dim join: bloom filter injected on the fact side, below the exchange") {
    withConf(bloomConf: _*) {
      val fact = graft.model.Tables.lineitem(spark, sfDir)
      val dim = graft.model.Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      val p = joined.queryExecution.executedPlan.toString
      // the dim side builds the bloom (bloom_filter_agg over o_orderkey),
      // the fact side probes it (might_contain) — physical plan spelling
      assert(p.contains("bloom_filter_agg"), p)
      assert(p.contains("might_contain"), p)
      // the probe must sit on the FACT side scan subtree (below its
      // exchange), not as a post-join residual: the Filter line carrying
      // the probe tests l_orderkey, the fact join key
      val probeLines = p.linesIterator
        .filter(l => l.contains("might_contain") && l.contains("Filter"))
        .mkString("\n")
      assert(probeLines.contains("l_orderkey"), p)
      // and it still returns the right answer
      assert(joined.collect().map(_.getString(0)).toSet === Set("1-URGENT"))
    }
  }

  test("broadcastable dim: no bloom filter is injected (the broadcast join already prunes)") {
    withConf(bloomConf.init :+
      ("spark.sql.autoBroadcastJoinThreshold" -> "10485760"): _*) {
      val fact = graft.model.Tables.lineitem(spark, sfDir)
      val dim = graft.model.Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val p = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
        .queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("might_contain"), p)
    }
  }
}
