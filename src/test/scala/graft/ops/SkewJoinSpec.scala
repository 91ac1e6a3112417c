package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** AQE skew-join demonstration — codifies WHEN `Relational.saltedJoin`
  * is needed at all (the decision rule `skewProfile` (q129) feeds):
  *
  *  - a skewed SORT-MERGE JOIN under AQE needs no hand salting: at
  *    runtime AQE observes the oversized post-shuffle partition, splits
  *    it into several tasks, and replicates the matching build partition
  *    (the join node carries `skew=true` in the final plan). Zero code.
  *  - salting stays necessary where AQE's split cannot apply: a same-key
  *    AGGREGATION downstream of the join (a hash aggregate needs every
  *    row of a key in one task, so the skew re-concentrates after the
  *    split), a broadcast-ineligible join the planner chose differently,
  *    or a pipeline that must reuse the exchange un-split.
  *
  * Rule of thumb codified here and in saltedJoin's doc: reach for
  * saltedJoin only when `skewProfile.salt > 1` AND the skewed key feeds
  * a same-key aggregation or an exchange-reusing stage; otherwise let
  * AQE handle the join.
  */
class SkewJoinSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // 100k fact rows, HALF of them on one hot key; 1000-key uniform tail.
  private def fact = spark.range(100000).select(
    when(col("id") % 2 === 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
    col("id").as("v"))
  private def dim = spark.range(1000).select(
    col("id").as("k"), (col("id") * 10).as("w"))

  private val skewConf = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // test-scale thresholds: the hot partition is ~hundreds of KB, not GB
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  test("AQE splits the hot key's partition at runtime: final plan marks the sort-merge join skew=true") {
    withConf(skewConf: _*) {
      val joined = fact.join(dim, "k")
      // execute THIS df's plan (count() would plan a separate aggregate
      // query and leave joined's own adaptive plan unexecuted)
      assert(joined.collect().length === 100000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("skew=true"), s"AQE did not split the skewed partition:\n$p")
    }
  }

  test("decision rule: under AQE skew handling, plain join == saltedJoin result (salting adds nothing)") {
    withConf(skewConf: _*) {
      def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)), sum(col("v") * col("w"))).head()
        (r.getLong(0), r.getLong(1))
      }
      val plain = fingerprint(fact.join(dim, "k"))
      val salted = fingerprint(Relational.saltedJoin(fact, dim, "k",
        buckets = 8, hotThreshold = 10000L))
      assert(plain === salted)
      assert(plain._1 === 100000L)
    }
  }

  test("skewProfile recommends salt>1 exactly for the hot key AQE had to split") {
    val prof = Relational.skewProfile(fact, "k", topN = 3,
        targetRowsPerTask = 10000L)
      .select("key_value", "cnt", "salt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // key 7: 50k rows itself + ~50 tail rows (id % 1000 == 7, odd ids)
    assert(prof.head._1 === "7")
    assert(prof.head._3 > 1L, s"hot key not flagged: ${prof.toSeq}")
    // every other key is far below one task's worth: salt == 1
    assert(prof.tail.forall(_._3 === 1L), prof.toSeq.toString)
  }
}
