package graft
import org.apache.spark.sql.SparkSession
object PerfCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").config("spark.sql.extensions", "graft.GraftExtensions").getOrCreate()
    graft.plans.ElementAtNullIndexGuard.ensureInjected(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq else Seq("q22_lsh_pairs", "q51_neardup_clusters", "q35_stream_tumbling", "q03_merge_diff", "q94_ann_ivf")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    for (n <- names; i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, d).count()
      println(f"$n run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
