package graft.layout

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for the 100 TB tier: hive-partitioned writes with
  * in-file sort, and small-file compaction. At cluster scale the layout IS
  * the index:
  *
  *  - **partition directories** (low-cardinality cols: date, type, lang)
  *    turn `WHERE` on those cols into directory pruning — the scan never
  *    lists, let alone reads, the excluded partitions (visible as
  *    `PartitionFilters` in the plan, asserted by DataLayoutSpec);
  *  - **sortWithinPartitions** on the query-time range cols (ts, id)
  *    makes parquet row-group min/max stats selective, so predicate
  *    pushdown skips row groups inside each surviving file;
  *  - **compaction** bounds file counts: a streaming or per-executor
  *    writer emits O(batches × partitions) small files whose per-file
  *    open/footer cost eventually dominates the scan — the bane of every
  *    long-running ingest. Rewriting each partition into
  *    ceil(bytes / target) files restores scan efficiency without
  *    changing any query.
  */
object DataLayout {

  /** Write `df` hive-partitioned by `partCols`, each file sorted on
    * `sortCols`. The repartition on the partition columns forces one
    * shuffle so each output partition directory is written by as few
    * tasks as possible (without it, EVERY upstream task writes a file
    * into EVERY partition dir — tasks × partitions small files, the
    * pattern [[compact]] exists to undo). */
  def writePartitionedSorted(df: DataFrame, outDir: String,
                             partCols: Seq[String],
                             sortCols: Seq[String]): Unit =
    writePartitionedSortedBy(df, outDir, partCols, sortCols.map(col))

  /** [[writePartitionedSorted]] with arbitrary sort EXPRESSIONS — the
    * in-file order can be computed (a Morton z-value, a binned key)
    * without the expression ever entering the written schema — and
    * optional parquet writer options (r16: per-column bloom filters ride
    * through here as `parquet.bloom.filter.enabled#col`). */
  def writePartitionedSortedBy(df: DataFrame, outDir: String,
                               partCols: Seq[String],
                               sortExprs: Seq[Column],
                               options: Map[String, String] = Map.empty): Unit =
    df.repartition(partCols.map(col): _*)
      .sortWithinPartitions(partCols.map(col) ++ sortExprs: _*)
      .write.mode("overwrite").options(options)
      .partitionBy(partCols: _*)
      .parquet(outDir)

  /** (file count, total bytes) under `dir`, recursive, data files only. */
  def fileStats(spark: SparkSession, dir: String): (Long, Long) = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(dir), true)
    var n = 0L
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        n += 1; bytes += f.getLen
      }
    }
    (n, bytes)
  }

  /** Compact the parquet dataset at `dir` into `outDir`, targeting
    * `targetBytes` per file, preserving the hive partition columns in
    * `partCols`. One distributed read + one shuffle-free-per-partition
    * write; the source is left untouched (swap dirs atomically outside —
    * at scale this runs against a table format's commit protocol, but the
    * rewrite itself is identical). Returns (files before, files after). */
  def compact(spark: SparkSession, dir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              partCols: Seq[String] = Nil): (Long, Long) = {
    val (nBefore, bytes) = fileStats(spark, dir)
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(dir)
    val out =
      if (partCols.isEmpty) df.repartition(nFiles)
      // partition-dir-aligned compaction: shuffle on the partition cols so
      // each directory is rewritten by the tasks that own it
      else df.repartition(nFiles, partCols.map(col): _*)
    val w = out.write.mode("overwrite")
    (if (partCols.isEmpty) w else w.partitionBy(partCols: _*)).parquet(outDir)
    val (nAfter, _) = fileStats(spark, outDir)
    (nBefore, nAfter)
  }
}
