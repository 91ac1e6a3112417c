package graft.model

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The scan-parallelism spool (Tables.ensureSpool) must be invisible to
  * correctness: same rows, same schema, staleness-checked against the
  * source file so a regenerated fixture is never shadowed by an old spool. */
class TableSpoolSpec extends SparkSpec {

  private def makeFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("spool_fixture")
    // a fixture dir only needs the spooled tables for this test's reads;
    // ensureSpool touches exactly the five large tables
    for (t <- Seq("orders", "lineitem", "events", "documents", "embeddings")) {
      val src = spark.read.parquet(s"$sfDir/$t.parquet")
      src.coalesce(1).write.mode("overwrite").parquet(s"$dir/tmp_$t")
      // single FILE like the driver writes (write.parquet makes a dir)
      val part = new java.io.File(s"$dir/tmp_$t").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/$t.parquet"))
    }
    dir.toString
  }

  test("spool preserves rows and schema; scan gains partitions") {
    val dir = makeFixture()
    val before = Tables.documents(spark, dir)
    val rawRows = before.orderBy(col("doc_id")).collect().toSeq
    Tables.ensureSpool(spark, dir)
    val after = Tables.documents(spark, dir)
    assert(after.schema === before.schema)
    assert(after.orderBy(col("doc_id")).collect().toSeq === rawRows)
    assert(after.rdd.getNumPartitions > 1,
      "spooled scan should have a multi-task scan stage")
    // events keeps the ts normalization through the spool path
    assert(Tables.events(spark, dir).schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  test("a regenerated source invalidates the spool (stamp mismatch)") {
    val dir = makeFixture()
    Tables.ensureSpool(spark, dir)
    val n0 = Tables.orders(spark, dir).count()
    // regenerate the source with FEWER rows and a new mtime
    val cut = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") % 2 === 0)
    cut.coalesce(1).write.mode("overwrite").parquet(s"$dir/tmp_orders2")
    val part = new java.io.File(s"$dir/tmp_orders2").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/orders.parquet"))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/orders.parquet"))
    // WITHOUT re-spooling, the stale spool must NOT be read
    val nStale = Tables.orders(spark, dir).count()
    assert(nStale < n0, "stale spool shadowed a regenerated source")
    // and re-spooling picks up the new source
    Tables.ensureSpool(spark, dir)
    assert(Tables.orders(spark, dir).count() === nStale)
    assert(Tables.orders(spark, dir).rdd.getNumPartitions > 1)
  }
}
