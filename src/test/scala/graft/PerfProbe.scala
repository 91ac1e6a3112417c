package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage-timing probe for local perf iteration (test scope only —
  * never shipped). Edit the body to time the plan under investigation;
  * `sbt "Test/runMain graft.PerfProbe"`. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("l_ship_epoch", col("l_shipdate").cast("timestamp").cast("double"))
    li.groupBy().count().collect() // warmup
    def q87() = graft.ops.Relational.profile(li,
      numeric = Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_ship_epoch"),
      categorical = Seq("l_returnflag", "l_linestatus"))
      .orderBy(col("col_name"))
      .write.format("noop").mode("overwrite").save()
    time("q87_warm1")(q87())
    time("q87_warm2")(q87())
    // variant: flat stats separate from the multi-distinct NDVs
    def variant() = {
      val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
        "l_ship_epoch", "l_returnflag", "l_linestatus")
      val flat = li.agg(count(lit(1)).as("n"),
        cols.flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nn"),
          min(col(c)).cast("string").as(s"${c}_mn"),
          max(col(c)).cast("string").as(s"${c}_mx"))): _*)
      val ndv = li.agg(countDistinct(col(cols.head)).as(s"${cols.head}_nd"),
        cols.tail.map(c => countDistinct(col(c)).as(s"${c}_nd")): _*)
      flat.crossJoin(ndv).write.format("noop").mode("overwrite").save()
    }
    time("split_warm1")(variant())
    time("split_warm2")(variant())
    def ndvOnly() = {
      val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
        "l_ship_epoch", "l_returnflag", "l_linestatus")
      li.agg(countDistinct(col(cols.head)).as("a"),
        cols.tail.map(c => countDistinct(col(c))): _*)
        .write.format("noop").mode("overwrite").save()
    }
    time("ndv1")(ndvOnly())
    time("ndv2")(ndvOnly())
    def flatOnly() = {
      val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
        "l_ship_epoch", "l_returnflag", "l_linestatus")
      li.agg(count(lit(1)).as("n"),
        cols.flatMap(c => Seq(sum(when(col(c).isNull, 1L).otherwise(0L)),
          min(col(c)).cast("string"), max(col(c)).cast("string"))): _*)
        .write.format("noop").mode("overwrite").save()
    }
    time("flat1")(flatOnly())
    time("flat2")(flatOnly())
    def ndvRepart() = {
      val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
        "l_ship_epoch", "l_returnflag", "l_linestatus")
      li.select(cols.map(col): _*).repartition(32)
        .agg(countDistinct(col(cols.head)).as("a"),
          cols.tail.map(c => countDistinct(col(c))): _*)
        .write.format("noop").mode("overwrite").save()
    }
    time("ndvR1")(ndvRepart())
    time("ndvR2")(ndvRepart())
    spark.stop()
  }
}
