package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary diagnostics (deleted before round end)
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = graft.model.Tables(spark, d, "documents")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warmup
    noop(docs)
    time("scan only")(noop(docs.select(col("doc_id"), col("text"))))
    time("fp only")(noop(docs.select(col("doc_id"),
      graft.text.TextAnalysis.fingerprint(col("text")).as("fp"))))
    time("sh only")(noop(docs.select(col("doc_id"),
      graft.dedup.Dedup.simhash16(col("text")).as("sh"))))
    time("fp+sh")(noop(docs.select(col("doc_id"),
      graft.text.TextAnalysis.fingerprint(col("text")).as("fp"),
      graft.dedup.Dedup.simhash16(col("text")).as("sh"))))
    time("fp+sh+orderBy")(noop(docs.select(col("doc_id"),
      graft.text.TextAnalysis.fingerprint(col("text")).as("fp"),
      graft.dedup.Dedup.simhash16(col("text")).as("sh")).orderBy(col("doc_id"))))
    time("fp+sh 2nd")(noop(docs.select(col("doc_id"),
      graft.text.TextAnalysis.fingerprint(col("text")).as("fp"),
      graft.dedup.Dedup.simhash16(col("text")).as("sh"))))
    spark.stop()
  }
}
