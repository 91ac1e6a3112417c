package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checks over arbitrary tables — the
  * validation gate a pipeline runs before (and after) every expensive
  * transform, in the style a Deequ-shaped library exposes: each check is a
  * named constraint that evaluates to one row `(check, metric, passed)`,
  * and a suite is the union of checks run as ONE Spark job.
  *
  * Design for scale:
  *  - every check is a single aggregation over its table (null counts,
  *    distinct counts, range/set violation counts) or a single anti-join
  *    aggregate (referential integrity) — no collects, no per-row
  *    verification paths; a 100 TB fact table yields one shuffle-free
  *    partial-agg pass per check, and Catalyst collapses checks on the
  *    same table into shared scans where possible.
  *  - referential checks put the FACT side on the streamed side of the
  *    anti-join and let AQE broadcast the dimension's key column — the
  *    orphan scan never shuffles the fact table when the dim fits.
  *  - metrics are exact integers or floor-truncated fractions (the
  *    cross-engine tie discipline), so a validation report is
  *    bit-reproducible run to run.
  */
object DataQuality {

  private def trunc6(c: org.apache.spark.sql.Column) =
    floor(c * lit(1e6)) / lit(1e6)

  private def report(name: String, metric: org.apache.spark.sql.Column,
                     passed: org.apache.spark.sql.Column)(agg: DataFrame): DataFrame =
    agg.select(lit(name).as("check"), metric.cast("double").as("metric"),
      passed.as("passed"))

  /** Fraction of NULLs in `column`; passes when <= `maxFrac`. An empty
    * table reports 0.0 (vacuously clean). */
  def nullFraction(name: String, df: DataFrame, column: String,
                   maxFrac: Double): DataFrame = {
    val agg = df.agg(
      sum(when(col(column).isNull, 1L).otherwise(0L)).as("__nulls"),
      count(lit(1)).as("__n"))
    val frac = coalesce(
      trunc6(col("__nulls").cast("double") / col("__n").cast("double")),
      lit(0.0))
    report(name, frac, frac <= lit(maxFrac))(agg)
  }

  /** Number of excess rows beyond one per distinct key tuple; passes at 0. */
  def unique(name: String, df: DataFrame, columns: Seq[String]): DataFrame = {
    val dupes = df.groupBy(columns.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .agg(sum(col("__c") - 1L).as("__d"))
    report(name, coalesce(col("__d"), lit(0L)).cast("double"),
      coalesce(col("__d"), lit(0L)) === 0L)(dupes)
  }

  /** Orphan count: child rows whose `key` has no match in `parent.pkey`;
    * passes at 0. The child is the streamed side; the parent key column is
    * broadcast when small (AQE's call). */
  def referential(name: String, child: DataFrame, key: String,
                  parent: DataFrame, pkey: String): DataFrame =
    report(name, col("__o").cast("double"), col("__o") === 0L)(
      child.select(col(key))
        .join(parent.select(col(pkey).as(key)), Seq(key), "left_anti")
        .agg(count(lit(1)).as("__o")))

  /** Rows whose `column` value is outside the accepted set; passes at 0. */
  def acceptedValues(name: String, df: DataFrame, column: String,
                     allowed: Seq[String]): DataFrame =
    report(name, col("__v").cast("double"), col("__v") === 0L)(
      df.agg(sum(when(col(column).isin(allowed: _*), 0L).otherwise(1L))
        .as("__v")))

  /** Rows with `column` outside [lo, hi] (NULL counts as a violation);
    * passes at 0. */
  def inRange(name: String, df: DataFrame, column: String,
              lo: Double, hi: Double): DataFrame =
    report(name, col("__v").cast("double"), col("__v") === 0L)(
      df.agg(sum(when(col(column).isNotNull &&
          col(column) >= lo && col(column) <= hi, 0L).otherwise(1L))
        .as("__v")))

  /** Union a set of checks into one report, ordered by check name — one
    * job, one pass over each distinct source table. */
  def suite(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_.unionByName(_)).orderBy(col("check"))

  // ---- fused per-table checks ----------------------------------------------

  /** An aggregate-style constraint (everything except uniqueness and
    * referential integrity, which need their own shuffle/join shapes):
    * contributes agg columns to a SHARED single-pass aggregate and derives
    * its (metric, passed) report row from them. */
  sealed trait AggCheck {
    def name: String
    /** Aggregate columns this check needs, aliased `__c{i}_{j}`. */
    private[DataQuality] def aggs(i: Int): Seq[org.apache.spark.sql.Column]
    private[DataQuality] def metric(i: Int): org.apache.spark.sql.Column
    private[DataQuality] def passed(i: Int): org.apache.spark.sql.Column
  }

  /** [[nullFraction]] as a fused check. */
  final case class NullFrac(name: String, column: String,
                            maxFrac: Double) extends AggCheck {
    private[DataQuality] def aggs(i: Int) = Seq(
      sum(when(col(column).isNull, 1L).otherwise(0L)).as(s"__c${i}_0"),
      count(lit(1)).as(s"__c${i}_1"))
    private[DataQuality] def metric(i: Int) = coalesce(
      trunc6(col(s"__c${i}_0").cast("double") / col(s"__c${i}_1").cast("double")),
      lit(0.0))
    private[DataQuality] def passed(i: Int) = metric(i) <= lit(maxFrac)
  }

  /** [[acceptedValues]] as a fused check. */
  final case class Accepted(name: String, column: String,
                            allowed: Seq[String]) extends AggCheck {
    private[DataQuality] def aggs(i: Int) = Seq(
      coalesce(sum(when(col(column).isin(allowed: _*), 0L).otherwise(1L)), lit(0L))
        .as(s"__c${i}_0"))
    private[DataQuality] def metric(i: Int) = col(s"__c${i}_0").cast("double")
    private[DataQuality] def passed(i: Int) = col(s"__c${i}_0") === 0L
  }

  /** [[inRange]] as a fused check. */
  final case class Range(name: String, column: String,
                         lo: Double, hi: Double) extends AggCheck {
    private[DataQuality] def aggs(i: Int) = Seq(
      coalesce(sum(when(col(column).isNotNull &&
        col(column) >= lo && col(column) <= hi, 0L).otherwise(1L)), lit(0L))
        .as(s"__c${i}_0"))
    private[DataQuality] def metric(i: Int) = col(s"__c${i}_0").cast("double")
    private[DataQuality] def passed(i: Int) = col(s"__c${i}_0") === 0L
  }

  /** All of a table's aggregate-style constraints in ONE scan + ONE
    * partial/final aggregate: every check contributes its counters to a
    * shared single-row aggregate, which then unstacks to the standard
    * `(check, metric, passed)` rows. Equivalent to unioning the per-check
    * forms, but a 100 TB fact table is read once instead of once per
    * check — the fused form is what [[suite]] should be fed for tables
    * with more than one constraint. */
  def tableChecks(df: DataFrame, checks: Seq[AggCheck]): DataFrame = {
    require(checks.nonEmpty, "tableChecks: at least one check")
    val aggCols = checks.zipWithIndex.flatMap { case (c, i) => c.aggs(i) }
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), c.metric(i).cast("double").as("metric"),
        c.passed(i).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
