package graft.layout

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

class DataLayoutSpec extends SparkSpec {

  private def events = Tables.events(spark, sfDir)

  test("partitioned write prunes directories: scan reads only matching partitions") {
    val dir = Files.createTempDirectory("layout_part").toString + "/events"
    DataLayout.writePartitionedSorted(events, dir, Seq("event_type"), Seq("ts"))
    val pruned = spark.read.parquet(dir).filter(col("event_type") === "click")
    // execute THIS dataset so its own scan metrics populate (a .count()
    // would build and execute a different plan object)
    assert(pruned.collect().length ===
      events.filter(col("event_type") === "click").count())
    // the planner must turn the filter into PartitionFilters on the scan
    val plan = pruned.queryExecution.executedPlan
    val scan = (plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).collectLeaves().collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "event_type")))
    // and post-execution metrics must show ONLY the click partition's files
    val clickFiles = DataLayout.fileStats(spark, s"$dir/event_type=click")._1
    assert(scan.metrics("numFiles").value === clickFiles)
  }

  test("dim-side filter becomes a DYNAMIC partition filter on the fact scan (DPP)") {
    import spark.implicits._
    val base = Files.createTempDirectory("layout_dpp").toString
    DataLayout.writePartitionedSorted(events, s"$base/events", Seq("event_type"), Seq("ts"))
    // dim as a FILE table — a local Seq is constant-folded and DPP never fires
    Seq(("view", 1.0), ("click", 2.0), ("purchase", 5.0),
        ("signup", 3.0), ("error", 0.5)).toDF("event_type", "weight")
      .write.parquet(s"$base/dim")
    val facts = spark.read.parquet(s"$base/events")
    val dim = spark.read.parquet(s"$base/dim").filter(col("weight") >= 2.0)
    val joined = facts.join(broadcast(dim), Seq("event_type"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val rows = joined.collect()
    // only the 3 dim-surviving types appear — and the fact scan carries a
    // runtime dynamicpruning partition filter, no static predicate names them
    assert(rows.map(_.getString(0)).sorted === Array("click", "purchase", "signup"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$p")
  }

  test("files are sorted on ts within each partition directory") {
    val dir = Files.createTempDirectory("layout_sort").toString + "/events"
    DataLayout.writePartitionedSorted(events, dir, Seq("event_type"), Seq("ts"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val one = fs.listFiles(new org.apache.hadoop.fs.Path(s"$dir/event_type=click"), false)
    assert(one.hasNext)
    val f = one.next().getPath.toString
    val ts = spark.read.parquet(f).select("ts").collect().map(_.getTimestamp(0))
    assert(ts.length > 1 && ts.sliding(2).forall(p => !p(0).after(p(1))))
  }

  test("compact rewrites many small files into the byte-targeted count, losslessly") {
    val small = Files.createTempDirectory("layout_small").toString + "/events"
    events.repartition(32).write.mode("overwrite").parquet(small)
    val compacted = Files.createTempDirectory("layout_compacted").toString + "/events"
    val (before, after) = DataLayout.compact(spark, small, compacted,
      targetBytes = Long.MaxValue)
    assert(before === 32L && after === 1L)
    // decimal sum: order-independent (a double sum varies with file order)
    val dsum = sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
    val a = spark.read.parquet(small).agg(count(lit(1)), dsum).collect()(0)
    val b = spark.read.parquet(compacted).agg(count(lit(1)), dsum).collect()(0)
    assert(a === b)
  }

  test("partition-aligned compact keeps the hive layout readable and pruned") {
    val src = Files.createTempDirectory("layout_psrc").toString + "/events"
    // deliberately fragment: every task writes into every partition dir
    events.repartition(8).write.mode("overwrite").partitionBy("event_type").parquet(src)
    val out = Files.createTempDirectory("layout_pout").toString + "/events"
    val (before, after) = DataLayout.compact(spark, src, out,
      targetBytes = Long.MaxValue, partCols = Seq("event_type"))
    assert(after < before)
    assert(spark.read.parquet(out).filter(col("event_type") === "click").count() ===
      events.filter(col("event_type") === "click").count())
  }
}
