package graft.util

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** drain() scope: it must release exactly what graft registered — a
  * library user's own cached / checkpointed DataFrames survive, because
  * releasing a user localCheckpoint destroys lineage-truncated data the
  * user can never recompute. */
class CleanupSpec extends SparkSpec {

  test("drain releases graft-registered checkpoint blocks") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val df = Cleanup.checkpoint(
      spark.range(1000).select(col("id"), (col("id") * 2).as("v")))
    assert(df.count() === 1000)
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "checkpoint registered no persisted RDD")
    Cleanup.drain()
    val remaining = sc.getPersistentRDDs.keySet.intersect(added)
    assert(remaining.isEmpty, s"graft blocks survived drain: $remaining")
  }

  test("drain leaves a USER localCheckpoint intact and usable") {
    val user = spark.range(500).select(col("id"), (col("id") % 7).as("k"))
      .localCheckpoint() // the user's own, NOT graft-registered
    assert(user.count() === 500)
    Cleanup.drain()
    // still answerable after drain: with truncated lineage this would throw
    // "Checkpoint block not found" if drain had unpersisted it
    assert(user.groupBy("k").count().count() === 7)
    user.unpersist(blocking = true)
  }

  test("drain leaves a USER cache() intact") {
    val user = spark.range(300).toDF("id").cache()
    assert(user.count() === 300)
    Cleanup.drain()
    assert(spark.sharedState.cacheManager.lookupCachedData(
      user.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]).isDefined,
      "user cache entry evicted by drain")
    user.unpersist(blocking = true)
  }
}
