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
    graft.functions.KmvFunctions.ensureRegistered(spark)
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      println(s"==== $sf ====")
      val ev = graft.model.Tables(spark, sf, "events")
      ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact"),
          approx_count_distinct(col("user_id")).as("hll"),
          expr("kmv_distinct(user_id, 256)").as("kmv"))
        .withColumn("hll_rel", abs(col("hll") - col("exact")).cast("double") / col("exact"))
        .withColumn("kmv_rel", abs(col("kmv") - col("exact")).cast("double") / col("exact"))
        .orderBy(col("event_type")).show(10, false)
      val emb = graft.model.Tables(spark, sf, "embeddings")
      val probes = emb.filter(col("vec_id") < 50)
      val exact = graft.sim.Similarity.bruteForceTopK(probes, emb, 5)
      for (np <- Seq(2, 3, 4, 6)) {
        val t0 = System.nanoTime()
        val ivf = graft.sim.Similarity.ivfTopK(probes, emb, 5, nprobe = np)
        val hits = ivf.join(exact.select(col("qid"), col("nid")), Seq("qid", "nid"), "left_semi")
          .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
        val r = probes.select(col("vec_id").as("qid"))
          .join(hits, Seq("qid"), "left")
          .agg((avg(coalesce(col("n_hit"), lit(0))) / 5.0).as("mean_recall"),
            (min(coalesce(col("n_hit"), lit(0))) / 5.0).as("min_recall")).head()
        println(f"nprobe=$np mean=${r.getDouble(0)}%.3f min=${r.getDouble(1)}%.3f  ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
