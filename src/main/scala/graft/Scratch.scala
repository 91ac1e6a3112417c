package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary diagnostics: measure KMV/HLL relative error and IVF recall at
// sf0.01 / sf0.1 so q90/q94 oracle bounds can be set with margin
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      println(s"==== $sf ====")
      graft.functions.KmvFunctions.ensureRegistered(spark)
      val ev = graft.model.Tables(spark, sf, "events")
      ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact"),
          approx_count_distinct(col("user_id")).as("hll"),
          expr("kmv_distinct(user_id, 256)").as("kmv"))
        .withColumn("hll_rel", abs(col("hll") - col("exact")).cast("double") / col("exact"))
        .withColumn("kmv_rel", abs(col("kmv") - col("exact")).cast("double") / col("exact"))
        .orderBy(col("event_type")).show(50, false)

      val emb = graft.model.Tables(spark, sf, "embeddings")
      val queries = emb.filter(col("vec_id") < 50)
      val ivf = graft.sim.Similarity.ivfTopK(queries, emb, 5)
      val exact = graft.sim.Similarity.bruteForceTopK(queries, emb, 5)
      val hits = ivf.join(exact.select(col("qid"), col("nid")), Seq("qid", "nid"), "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("n_hit"))
      val rec = queries.select(col("vec_id").as("qid")).join(hits, Seq("qid"), "left")
        .select(col("qid"), coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      rec.groupBy("n_hit").count().orderBy("n_hit").show()
      rec.agg(avg(col("n_hit")).as("mean_hits"), min(col("n_hit")).as("min_hits")).show()
    }
    spark.stop()
  }
}
