package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Ad-hoc stage-timing probe for local perf iteration (test scope only —
  * never shipped). Edit the body to time the plan under investigation;
  * `sbt "Test/runMain graft.PerfProbe"`. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val mult = 16
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li0 = model.Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey"))
    val o0 = model.Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
    val base = li0.join(o0, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
    val n = base.count()
    val edges = (0 until mult).map(i =>
        base.withColumn("src", col("src") + lit(i * n * 10)))
      .reduce(_ union _)
      .select(concat(lit("c"), col("src")).as("src"),
        concat(lit("s"), col("dst")).as("dst"))
      .localCheckpoint()
    println("edges: " + edges.count())
    val und = time("und_distinct_ckpt") {
      edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint()
    }
    println("und: " + und.count())
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    val n1 = deg.agg(count(lit(1)).cast("double").as("__n"))
    var p = time("p0") {
      deg.select(col("src").as("id"), col("deg")).crossJoin(n1)
        .withColumn("p", lit(1.0) / col("__n")).localCheckpoint()
    }
    for (i <- 1 to 3) {
      p = time(s"iter$i") {
        val contrib = und
          .join(p.select(col("id").as("src"),
            round(col("p") / col("deg").cast("double"), 12)
              .cast(DecimalType(38, 12)).as("__c")), Seq("src"))
          .groupBy(col("dst")).agg(sum(col("__c")).as("__s"))
        p.join(contrib.select(col("dst").as("id"), col("__s")), Seq("id"), "left")
          .withColumn("p", round((lit(1.0) - lit(0.85)) / col("__n")
            + lit(0.85) * coalesce(col("__s"),
              lit(0).cast(DecimalType(38, 12))).cast("double"), 12))
          .drop("__s")
          .localCheckpoint()
      }
    }
    spark.stop()
  }
}
