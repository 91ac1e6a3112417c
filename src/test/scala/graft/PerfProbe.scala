package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage-timing probe for local perf iteration (test scope only —
  * never shipped). Edit the body to time the plan under investigation;
  * `sbt "Test/runMain graft.PerfProbe"`. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()

    // q105's exact edge derivation
    def edges(): DataFrame = {
      val li = graft.model.Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey"))
      val o = graft.model.Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    }

    def pageRankVar(edges: DataFrame, iters: Int, ckptEvery: Int): DataFrame = {
      val und = edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().repartition(col("src")).sortWithinPartitions("src").persist()
      val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
      val n1 = deg.agg(count(lit(1)).cast("double").as("__n"))
      val tele = (lit(1.0) - lit(0.85)) / col("__n")
      var p = deg.select(col("src").as("id"), col("deg")).crossJoin(n1)
        .withColumn("p", lit(1.0) / col("__n"))
      for (i <- 1 to iters) {
        val contrib = und
          .join(p.select(col("id").as("src"),
            round(col("p") / col("deg").cast("double") * lit(1e12), 0)
              .cast("long").as("__c")), Seq("src"))
          .groupBy(col("dst")).agg(sum(col("__c")).as("__s"))
        p = p.join(contrib.select(col("dst").as("id"), col("__s")), Seq("id"), "left")
          .withColumn("p",
            round(tele + lit(0.85) *
              (coalesce(col("__s"), lit(0L)).cast("double") / lit(1e12)), 12))
          .drop("__s")
        if (i % ckptEvery == 0 || i == iters)
          p = graft.util.Cleanup.checkpoint(p)
      }
      und.unpersist(false)
      p.select(col("id"), col("deg"), col("p"))
    }

    for (r <- 1 to 3) {
      val e1 = edges()
      time(s"r$r pagerank_ckpt_every_1")(
        pageRankVar(e1, 3, 1).write.format("noop").mode("overwrite").save())
      graft.util.Cleanup.drain()
      val e3 = edges()
      time(s"r$r pagerank_ckpt_final_only")(
        pageRankVar(e3, 3, 99).write.format("noop").mode("overwrite").save())
      graft.util.Cleanup.drain()
      val e2 = edges()
      time(s"r$r pagerank_ckpt_every_2")(
        pageRankVar(e2, 3, 2).write.format("noop").mode("overwrite").save())
      graft.util.Cleanup.drain()
    }
  }
}
