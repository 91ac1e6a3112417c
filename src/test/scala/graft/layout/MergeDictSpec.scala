package graft.layout

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Per-bucket value dictionaries (r16 categorical skipping):
  * `alterSetDictColumns` designates columns whose per-bucket DISTINCT
  * VALUE SETS are recorded at each rewrite, and equality / IN predicates
  * prune buckets on exact set membership — the case min/max can never
  * prune (a categorical bucket's lexical range is wide, its value set
  * tiny). Every test diffs the pruned read against the unpruned filter:
  * dictionary pruning may only SHRINK the scan, never change answers. */
class MergeDictSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    graft.util.Cleanup.registerTempDir(
      Files.createTempDirectory(s"mdict_$tag")).toString + "/t"

  private def bucketOf(id: Long, nb: Int): Int =
    spark.range(1).select(pmod(hash(lit(id)), lit(nb))).head().getInt(0)

  /** 4-bucket table: every bucket's `tag` set is {aa, cc} (lexical range
    * aa..cc — 'bb' sits INSIDE it), `loc` is bucket-localized t<b>. */
  private def table(tag: String): String = {
    val dir = freshDir(tag)
    val rows = (1L to 64L).map { id =>
      val b = bucketOf(id, 4)
      (id, if (id % 2 == 0) "aa" else "cc", s"t$b", id.toInt, "create")
    }
    MergeTable.merge(spark, dir,
      rows.toDF("id", "tag", "loc", "w", "op_flag"), "id", numBuckets = 4)
    dir
  }

  test("equality prunes on set membership where min/max cannot; answers unchanged") {
    val dir = table("basic")
    MergeTable.alterSetDictColumns(dir, Seq("tag", "loc"))
    // no sets recorded yet: nothing prunes (absence = unknown)
    assert(MergeTable.prunableBuckets(dir, col("tag") === "bb")
      .forall(_.size == 4))
    MergeTable.compact(spark, dir) // backfill
    // 'bb' is INSIDE every bucket's aa..cc lexical range — min/max keeps
    // all 4 — but outside every value SET: the dictionary prunes them all
    assert(MergeTable.prunableBuckets(dir, col("tag") === "bb") ===
      Some(Set.empty[Int]))
    assert(MergeTable.readWhere(spark, dir, col("tag") === "bb").count() === 0L)
    // a present value keeps every bucket holding it
    assert(MergeTable.prunableBuckets(dir, col("tag") === "aa") ===
      Some((0 to 3).toSet))
    // the localized column prunes to exactly its bucket
    assert(MergeTable.prunableBuckets(dir, col("loc") === "t2") === Some(Set(2)))
    val got = MergeTable.readWhere(spark, dir, col("loc") === "t2")
      .as[(Long, String, String, Int)].collect().toSet
    val want = MergeTable.read(spark, dir).filter(col("loc") === "t2")
      .as[(Long, String, String, Int)].collect().toSet
    assert(got === want && got.nonEmpty)
    // IN prunes only when EVERY value misses
    assert(MergeTable.prunableBuckets(dir,
      col("loc").isin("t1", "t3")) === Some(Set(1, 3)))
    assert(MergeTable.prunableBuckets(dir,
      col("tag").isin("bb", "dd")) === Some(Set.empty[Int]))
    assert(MergeTable.prunableBuckets(dir,
      col("tag").isin("bb", "aa")) === Some((0 to 3).toSet))
  }

  test("an over-cap column records nothing and never prunes") {
    val dir = table("cap")
    MergeTable.alterSetDictColumns(dir, Seq("loc"), maxValues = 0 max 1)
    MergeTable.compact(spark, dir)
    // loc has ONE distinct value per bucket — within cap 1, prunes
    assert(MergeTable.prunableBuckets(dir, col("loc") === "zz") ===
      Some(Set.empty[Int]))
    val dir2 = table("cap2")
    MergeTable.alterSetDictColumns(dir2, Seq("tag"), maxValues = 1)
    MergeTable.compact(spark, dir2)
    // tag has TWO distinct values per bucket — over cap: unknown, keep
    assert(MergeTable.prunableBuckets(dir2, col("tag") === "bb")
      .forall(_.size == 4))
  }

  test("merges refresh rewritten buckets' sets; untouched buckets keep theirs") {
    val dir = table("merge")
    MergeTable.alterSetDictColumns(dir, Seq("loc"))
    MergeTable.compact(spark, dir)
    // rewrite ONLY the buckets of ids 1..8: their loc becomes 'zz'
    val delta = (1L to 8L).map(id =>
      (id, "aa", "zz", id.toInt, "update"))
      .toDF("id", "tag", "loc", "w", "op_flag")
    MergeTable.merge(spark, dir, delta, "id")
    val touched = (1L to 8L).map(bucketOf(_, 4)).toSet
    assert(MergeTable.prunableBuckets(dir, col("loc") === "zz") ===
      Some(touched))
    val got = MergeTable.readWhere(spark, dir, col("loc") === "zz")
      .select("id").as[Long].collect().toSet
    assert(got === (1L to 8L).toSet)
    // untouched buckets still prune on their original localized value
    val untouched = (0 to 3).toSet -- touched
    untouched.foreach { b =>
      assert(MergeTable.prunableBuckets(dir, col("loc") === s"t$b")
        .exists(_.contains(b)))
    }
  }

  test("widen drops the column's sets (rendering may change) — no wrong prune") {
    val dir = table("widen")
    MergeTable.alterSetDictColumns(dir, Seq("w"))
    MergeTable.compact(spark, dir)
    assert(MergeTable.prunableBuckets(dir, col("w") === 9999) ===
      Some(Set.empty[Int]))
    MergeTable.alterWidenColumn(dir, "w", org.apache.spark.sql.types.LongType)
    // the recorded int renderings are gone; a matching long equality must
    // return its row (stats may still prune by range — answers decide)
    val got = MergeTable.readWhere(spark, dir, col("w") === 5L)
      .select("id").as[Long].collect().toSet
    assert(got === Set(5L))
    // the next rewrite re-records at the widened type
    MergeTable.compact(spark, dir)
    assert(MergeTable.prunableBuckets(dir, col("w") === 99999L) ===
      Some(Set.empty[Int]))
  }

  test("rename re-keys sets; drop removes the column; re-designation invalidates") {
    val dir = table("alter")
    MergeTable.alterSetDictColumns(dir, Seq("tag"))
    MergeTable.compact(spark, dir)
    assert(MergeTable.prunableBuckets(dir, col("tag") === "bb") ===
      Some(Set.empty[Int]))
    MergeTable.alterRenameColumn(dir, "tag", "cat")
    // re-keyed sets prune under the NEW name ('bb' is inside every
    // bucket's aa..cc range — only the dictionary can prune it)
    assert(MergeTable.prunableBuckets(dir, col("cat") === "bb") ===
      Some(Set.empty[Int]))
    // re-designation INVALIDATES the old sets: with the dictionary gone,
    // in-range 'bb' keeps every bucket again
    MergeTable.alterSetDictColumns(dir, Seq("loc"))
    assert(MergeTable.prunableBuckets(dir, col("cat") === "bb")
      .forall(_.size == 4), "old sets must be invalidated")
    MergeTable.compact(spark, dir)
    assert(MergeTable.prunableBuckets(dir, col("loc") === "t1") ===
      Some(Set(1)))
    MergeTable.alterDropColumn(dir, "loc")
    assert(MergeTable.read(spark, dir).columns.toSeq ===
      Seq("id", "cat", "w"))
  }

  test("soft delete keeps sets as sound supersets; all-null columns prune equality") {
    val dir = table("dv")
    MergeTable.alterSetDictColumns(dir, Seq("loc"))
    MergeTable.compact(spark, dir)
    MergeTable.softDelete(spark, dir, col("loc") === "t1")
    // bucket 1's set still contains t1 (superset — keeps, never wrong);
    // the scan-side filter answers: zero rows
    assert(MergeTable.readWhere(spark, dir, col("loc") === "t1").count() === 0L)
    assert(MergeTable.readWhere(spark, dir, col("loc") === "t2").count() > 0L)
    // all-null dictionary column: empty set recorded, equality prunes
    val dir2 = freshDir("nulls")
    val rows = (1L to 16L).map(id => (id, null: String, "create"))
    MergeTable.merge(spark, dir2, rows.toDF("id", "cat", "op_flag"), "id",
      numBuckets = 2)
    MergeTable.alterSetDictColumns(dir2, Seq("cat"))
    MergeTable.compact(spark, dir2)
    assert(MergeTable.prunableBuckets(dir2, col("cat") === "x") ===
      Some(Set.empty[Int]))
    assert(MergeTable.readWhere(spark, dir2, col("cat").isNull).count() === 16L)
  }
}
