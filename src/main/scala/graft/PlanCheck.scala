package graft
import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans of selected queries — the plan-quality
  * feedback loop (pushdown / pruning / broadcast / shuffle count). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      // default 4 as always; SPARK_GRAFT_SHUFFLE overrides so partition-
      // count plan evidence (r20 SessionTuning) can be dumped at any width
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "4"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").config("spark.sql.extensions", "graft.GraftExtensions").getOrCreate()
    graft.plans.ElementAtNullIndexGuard.ensureInjected(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_filter_project", "q02_lookup_join", "q03_merge_diff", "q06_agg_pricing")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
