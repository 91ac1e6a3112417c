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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.groupBy().count().collect() // warmup
    time("q101_warm1") {
      graft.text.TextAnalysis.tfidfCosinePairs(docs, "doc_id", col("text"),
          0.85, probe = Some(_ < 50))
        .orderBy(col("a"), col("b"))
        .write.format("noop").mode("overwrite").save()
    }
    time("q101_warm2") {
      graft.text.TextAnalysis.tfidfCosinePairs(docs, "doc_id", col("text"),
          0.85, probe = Some(_ < 50))
        .orderBy(col("a"), col("b"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
