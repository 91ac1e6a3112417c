package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedFieldName, UnresolvedRelation, UnresolvedTable}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{AlterColumns, Assignment, DeleteAction, DeleteFromTable, DropColumns, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, RenameColumn, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{LongType, StringType}

import graft.layout.MergeTable

/** ANSI `MERGE INTO` and `VERSION AS OF` through the SQL front door — the
  * ⊕K7 Scala API (`MergeTable.merge`/`readAt`/`read`) reachable from
  * verbatim SQL text, completing what F10 proves for SELECT.
  *
  * Spark's parser already produces [[MergeIntoTable]] and
  * [[RelationTimeTravel]] nodes; what Spark lacks (absent a DSv2 catalog
  * with row-level-operation support) is anything to EXECUTE them against.
  * [[MergeTableSql.register]] binds a table name to a MergeTable
  * directory, and [[MergeTableSqlResolution]] (injected by
  * [[graft.GraftExtensions]]) resolves the three SQL shapes against it:
  *
  *  - `MERGE INTO t USING s ON t.k = s.k WHEN MATCHED [AND c] THEN UPDATE
  *    SET * | SET a = e, ... | DELETE, WHEN NOT MATCHED [AND c] THEN
  *    INSERT * | (cols) VALUES (...), WHEN NOT MATCHED BY SOURCE [AND c]
  *    THEN DELETE | UPDATE SET ...` → [[GraftMergeCommand]], which
  *    classifies each row against the current snapshot (first applicable
  *    clause per ANSI order; conditions may reference BOTH sides) and
  *    dispatches one op-flagged batch to [[MergeTable.merge]]. The
  *    classification read is pruned to the buckets the source keys hash
  *    into (the same buckets the merge rewrites) unless a NOT MATCHED BY
  *    SOURCE clause forces a full scan — at 100 TB the MERGE stays
  *    delta-proportional. Serializability: the snapshot version read at
  *    classification is passed as `expectedParent`, so a concurrent
  *    commit between classify and merge CAS-conflicts instead of applying
  *    a stale classification.
  *  - `SELECT ... FROM t VERSION AS OF n` → [[MergeTable.readAt]].
  *  - `SELECT ... FROM t` → [[MergeTable.read]] (current snapshot).
  *  - `DELETE FROM t [WHERE c]` / `UPDATE t SET a = e, ... [WHERE c]` →
  *    [[GraftDmlCommand]] (snapshot-classified op batch, same fence).
  *  - `ALTER TABLE t DROP COLUMN [IF EXISTS] c | RENAME COLUMN a TO b |
  *    ALTER COLUMN c TYPE dt` → [[GraftAlterCommand]] (the metadata-only
  *    evolution commits).
  *  - `DESCRIBE [TABLE] t` → the current logical schema as rows.
  *
  * `MERGE WITH SCHEMA EVOLUTION` carries new source columns into the
  * table via MergeTable's add-column evolution; plain MERGE restricts the
  * payload to the target schema, per the usual MERGE dialect rules. */
object MergeTableSql {

  private val registry = new ConcurrentHashMap[String, (String, Int)]()

  /** Bind `name` (single-part, case-insensitive) to a MergeTable
    * directory for SQL resolution. `numBuckets` applies only if a MERGE
    * CREATES the table. */
  def register(name: String, dir: String, numBuckets: Int = 16): Unit = {
    registry.put(name.toLowerCase(java.util.Locale.ROOT), (dir, numBuckets))
    ()
  }

  def unregister(name: String): Unit = {
    registry.remove(name.toLowerCase(java.util.Locale.ROOT)); ()
  }

  private[plans] def isEmpty: Boolean = registry.isEmpty

  private[plans] def lookup(nameParts: Seq[String]): Option[(String, Int)] =
    nameParts match {
      case Seq(one) =>
        Option(registry.get(one.toLowerCase(java.util.Locale.ROOT)))
      case _ => None
    }
}

/** Resolution rule: rewrites MERGE INTO / VERSION AS OF / plain reads of
  * [[MergeTableSql]]-registered names. Names that an earlier built-in
  * rule already resolved (temp views, catalog tables) never reach this
  * rule unresolved, so registration shadows nothing. */
object MergeTableSqlResolution extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MergeTableSql.isEmpty) return plan
    plan.resolveOperatorsDown {
      case m: MergeIntoTable =>
        val (alias, nameParts) = stripAlias(m.targetTable)
        MergeTableSql.lookup(nameParts) match {
          case Some((dir, nb)) =>
            GraftMergeCommand(dir, nb, alias.getOrElse(nameParts.last),
              new MergeSqlSpec(m.sourceTable, m.mergeCondition,
                m.matchedActions, m.notMatchedActions,
                m.notMatchedBySourceActions, m.withSchemaEvolution))
          case None => m
        }
      case RelationTimeTravel(u: UnresolvedRelation, ts, version)
          if MergeTableSql.lookup(u.multipartIdentifier).isDefined =>
        val (dir, _) = MergeTableSql.lookup(u.multipartIdentifier).get
        require(ts.isEmpty, "graft MergeTable time travel is by version " +
          "(VERSION AS OF n); TIMESTAMP AS OF is not supported")
        val v = version.getOrElse(throw new IllegalArgumentException(
          "VERSION AS OF requires a version literal")).toLong
        SubqueryAlias(u.multipartIdentifier.last,
          MergeTable.readAt(SparkSession.active, dir, v).queryExecution.logical)
      case u: UnresolvedRelation
          if MergeTableSql.lookup(u.multipartIdentifier).isDefined =>
        val (dir, _) = MergeTableSql.lookup(u.multipartIdentifier).get
        SubqueryAlias(u.multipartIdentifier.last,
          MergeTable.read(SparkSession.active, dir).queryExecution.logical)
      // DELETE FROM t WHERE cond / UPDATE t SET ... [WHERE cond] — the
      // remaining DML verbs, classified against the current snapshot and
      // committed as one op batch through the same expectedParent fence
      case DeleteFromTable(tgt, cond) if stripAlias(tgt)._2.nonEmpty &&
          MergeTableSql.lookup(stripAlias(tgt)._2).isDefined =>
        val (alias, nameParts) = stripAlias(tgt)
        val (dir, nb) = MergeTableSql.lookup(nameParts).get
        GraftDmlCommand(dir, nb, alias.getOrElse(nameParts.last),
          new DmlSpec(isDelete = true, Nil, Option(cond)))
      case UpdateTable(tgt, assignments, cond) if stripAlias(tgt)._2.nonEmpty &&
          MergeTableSql.lookup(stripAlias(tgt)._2).isDefined =>
        val (alias, nameParts) = stripAlias(tgt)
        val (dir, nb) = MergeTableSql.lookup(nameParts).get
        GraftDmlCommand(dir, nb, alias.getOrElse(nameParts.last),
          new DmlSpec(isDelete = false, assignments, cond))
      // DESCRIBE [TABLE] t → the current logical schema as rows, with the
      // table's key and version in the comment column
      case d: org.apache.spark.sql.catalyst.plans.logical.DescribeRelation =>
        (d.relation match {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView
              if MergeTableSql.lookup(u.multipartIdentifier).isDefined =>
            val (dir, _) = MergeTableSql.lookup(u.multipartIdentifier).get
            val m = MergeTable.read(SparkSession.active, dir).schema
            val key = MergeTable.tableKey(dir)
            val ver = MergeTable.currentVersion(dir).getOrElse(-1L)
            val rows = m.fields.toSeq.map { f =>
              org.apache.spark.sql.catalyst.InternalRow(
                org.apache.spark.unsafe.types.UTF8String.fromString(f.name),
                org.apache.spark.unsafe.types.UTF8String.fromString(
                  f.dataType.simpleString),
                org.apache.spark.unsafe.types.UTF8String.fromString(
                  (if (f.name == key) "key; " else "") + s"graft MergeTable v$ver"))
            }
            Some(org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
              d.output, rows))
          case _ => None
        }).getOrElse(d)
      // ALTER TABLE ... DROP/RENAME/ALTER COLUMN → the metadata-only
      // evolution commits. Field names must be top-level (the hash-bucketed
      // payload is flat); nested paths fail loud below.
      case DropColumns(u: UnresolvedTable, cols, ifExists)
          if MergeTableSql.lookup(u.multipartIdentifier).isDefined =>
        val (dir, _) = MergeTableSql.lookup(u.multipartIdentifier).get
        GraftAlterCommand(dir, cols.map(fieldName).map(c =>
          ("drop", c, "", None)), ifExists)
      case RenameColumn(u: UnresolvedTable, col, newName)
          if MergeTableSql.lookup(u.multipartIdentifier).isDefined =>
        val (dir, _) = MergeTableSql.lookup(u.multipartIdentifier).get
        GraftAlterCommand(dir,
          Seq(("rename", fieldName(col), newName, None)), ifExists = false)
      case AlterColumns(u: UnresolvedTable, specs)
          if MergeTableSql.lookup(u.multipartIdentifier).isDefined =>
        val (dir, _) = MergeTableSql.lookup(u.multipartIdentifier).get
        val ops = specs.map { sp =>
          val to = sp.newDataType.getOrElse(
            throw new UnsupportedOperationException(
              "graft ALTER COLUMN supports TYPE changes only (loss-free " +
                "widening); comments/positions/defaults are not table state " +
                "MergeTable keeps"))
          require(sp.newNullability.isEmpty && sp.newComment.isEmpty &&
            sp.newPosition.isEmpty && sp.newDefaultExpression.isEmpty &&
            !sp.dropDefault,
            "graft ALTER COLUMN supports TYPE changes only")
          ("widen", fieldName(sp.column), "", Some(to))
        }
        GraftAlterCommand(dir, ops, ifExists = false)
    }
  }

  private def fieldName(f: org.apache.spark.sql.catalyst.analysis.FieldName): String =
    f match {
      case UnresolvedFieldName(Seq(one)) => one
      case other => throw new UnsupportedOperationException(
        s"graft ALTER TABLE: nested field ${other.name.mkString(".")} — " +
          "MergeTable payloads are flat")
    }

  private def stripAlias(p: LogicalPlan): (Option[String], Seq[String]) =
    p match {
      case SubqueryAlias(id, child) =>
        (Some(id.name), stripAlias(child)._2)
      case u: UnresolvedRelation => (None, u.multipartIdentifier)
      case _ => (None, Nil)
    }
}

/** Opaque holder for the MERGE pieces — deliberately NOT a Product of
  * Expressions/plans, so the analyzer neither resolves nor checks them
  * (they resolve inside [[GraftMergeCommand.run]] against the live
  * snapshot). */
final class MergeSqlSpec(val source: LogicalPlan, val condition: Expression,
                         val matched: Seq[MergeAction],
                         val notMatched: Seq[MergeAction],
                         val notMatchedBySource: Seq[MergeAction],
                         val withSchemaEvolution: Boolean) {
  override def toString: String =
    s"MergeSqlSpec(matched=${matched.size}, notMatched=${notMatched.size}, " +
      s"notMatchedBySource=${notMatchedBySource.size})"
}

/** Opaque holder for a DELETE/UPDATE statement's unresolved pieces (the
  * [[MergeSqlSpec]] discipline: not a Product of expressions, so the
  * analyzer leaves them for [[GraftDmlCommand.run]]). */
final class DmlSpec(val isDelete: Boolean, val assignments: Seq[Assignment],
                    val condition: Option[Expression]) {
  override def toString: String =
    if (isDelete) "DmlSpec(DELETE)" else s"DmlSpec(UPDATE ${assignments.size})"
}

/** The eager command `DELETE FROM t WHERE ...` / `UPDATE t SET ... WHERE
  * ...` executes: classify the current snapshot rows under the WHERE
  * condition, emit one op batch (delete, or update with assignments
  * applied — unassigned columns keep their values), and commit through
  * [[MergeTable.merge]] under the same expectedParent serializability
  * fence as SQL MERGE. Only the buckets holding matching keys are
  * rewritten. Output: the committed version (-1 = empty no-op). */
case class GraftDmlCommand(dir: String, numBuckets: Int,
                           targetAlias: String, spec: DmlSpec)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  private val OpCol = "__graft_dml_op"

  override def run(spark: SparkSession): Seq[Row] = {
    val snapVer = MergeTable.currentVersion(dir)
    require(snapVer.isDefined, s"no MergeTable at $dir")
    val key = MergeTable.tableKey(dir)
    val tgt = MergeTable.read(spark, dir).alias(targetAlias)
    val hit = spec.condition
      .map(c => tgt.filter(coalesce(Bridge.columnOf(c), lit(false))))
      .getOrElse(tgt)
    val schema = MergeTable.read(spark, dir).schema
    val changes =
      if (spec.isDelete) hit.withColumn(OpCol, lit("delete"))
      else {
        val assigned = spec.assignments.map(a =>
          (a.key match {
            case u: UnresolvedAttribute => u.nameParts.last
            case a: Attribute => a.name
            case other => throw new UnsupportedOperationException(
              s"graft UPDATE: assignment target ${other.sql}")
          }) -> a.value).toMap
        require(!assigned.keys.exists(_.equalsIgnoreCase(key)),
          s"graft UPDATE: cannot assign the key column '$key' (a key " +
            "change is a delete + insert — express it as MERGE)")
        hit.select(schema.fields.toSeq.map { f =>
          assigned.find(_._1.equalsIgnoreCase(f.name))
            .map { case (_, v) => Bridge.columnOf(v).cast(f.dataType).as(f.name) }
            .getOrElse(col(f.name))
        } :+ lit("update").as(OpCol): _*)
      }
    val v = MergeTable.merge(spark, dir, changes, key, opCol = OpCol,
      numBuckets = numBuckets, expectedParent = Some(snapVer))
    Seq(Row(v.getOrElse(-1L)))
  }
}

/** The eager command an ALTER TABLE statement over a registered
  * MergeTable executes: each op is ("drop"|"rename"|"widen", column,
  * newName, newType), applied in order as metadata-only evolution
  * commits. Output: the final committed version. */
case class GraftAlterCommand(dir: String,
                             ops: Seq[(String, String, String, Option[org.apache.spark.sql.types.DataType])],
                             ifExists: Boolean)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val versions = ops.map {
      case ("drop", c, _, _) =>
        if (ifExists && !MergeTable.read(spark, dir).columns
            .exists(_.equalsIgnoreCase(c))) -1L
        else MergeTable.alterDropColumn(dir, c)
      case ("rename", from, to, _) => MergeTable.alterRenameColumn(dir, from, to)
      case ("widen", c, _, Some(to)) => MergeTable.alterWidenColumn(dir, c, to)
      case other => throw new IllegalStateException(s"bad alter op $other")
    }
    Seq(Row(versions.max))
  }
}

/** The eager command `spark.sql("MERGE INTO ...")` executes. Output is
  * one row: the committed MergeTable version. */
case class GraftMergeCommand(dir: String, numBuckets: Int,
                             targetAlias: String, spec: MergeSqlSpec)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  private val OpCol = "__graft_merge_op"
  private val SrcMark = "__graft_src_present"
  private val TgtMark = "__graft_tgt_present"

  override def run(spark: SparkSession): Seq[Row] = {
    val src = Bridge.ofRows(spark, spec.source)
    val (tKey, sKey) = keyNames(src)
    val snapVer = MergeTable.currentVersion(dir)
    val changes = snapVer match {
      case None => classifyFirstCommit(src, tKey, sKey)
      case Some(_) => classifyAgainstSnapshot(spark, src, tKey, sKey)
    }
    val v = MergeTable.merge(spark, dir, changes, tKey, opCol = OpCol,
      numBuckets = numBuckets, expectedParent = Some(snapVer))
    Seq(Row(v.getOrElse(-1L)))
  }

  // ---- ON condition: one target-key = source-key equality -----------------

  private def keyNames(src: DataFrame): (String, String) = {
    val sAlias: Option[String] = spec.source match {
      case SubqueryAlias(id, _) => Some(id.name.toLowerCase(java.util.Locale.ROOT))
      case _ => None
    }
    val tAlias = targetAlias.toLowerCase(java.util.Locale.ROOT)
    def side(a: UnresolvedAttribute): (Option[String], String) =
      a.nameParts match {
        case Seq(q, c) => (Some(q.toLowerCase(java.util.Locale.ROOT)), c)
        case Seq(c) => (None, c)
        case other => unsupported(s"qualified name ${other.mkString(".")}")
      }
    spec.condition match {
      case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute) =>
        (side(l), side(r)) match {
          case ((Some(`tAlias`), tc), (_, sc)) => (tc, sc)
          case ((_, sc), (Some(`tAlias`), tc)) => (tc, sc)
          case ((None, lc), (None, rc)) if sAlias.isEmpty || lc == rc =>
            // unqualified both sides: only the same-name shape is unambiguous
            if (lc == rc) (lc, rc)
            else unsupported(s"ambiguous unqualified ON $lc = $rc")
          case ((Some(q), lc), (None, rc)) if sAlias.contains(q) => (rc, lc)
          case ((None, lc), (Some(q), rc)) if sAlias.contains(q) => (lc, rc)
          case other => unsupported(s"ON condition sides $other")
        }
      case other => unsupported(
        s"ON condition ${other.sql}; graft MERGE requires a single " +
          "target-key = source-key equality")
    }
  }

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft MERGE INTO: unsupported $what")

  // ---- clause machinery ----------------------------------------------------

  private def condColumn(a: MergeAction): Column =
    a.condition.map(e => coalesce(Bridge.columnOf(e), lit(false)))
      .getOrElse(lit(true))

  /** First-applicable-clause index per ANSI order; -1 = no clause fires
    * (the row is left alone). */
  private def clauseIdx(actions: Seq[MergeAction]): Column =
    actions.zipWithIndex.foldRight(lit(-1)) { case ((a, i), rest) =>
      when(condColumn(a), lit(i)).otherwise(rest)
    }

  private def opFor(a: MergeAction): String = a match {
    case _: DeleteAction => "delete"
    case _: UpdateAction | _: UpdateStarAction => "update"
    case _: InsertAction | _: InsertStarAction => "create"
    case other => unsupported(s"merge action $other")
  }

  private def opChain(actions: Seq[MergeAction], idx: Column): Column =
    actions.zipWithIndex.foldRight(lit(null).cast(StringType)) {
      case ((a, i), rest) => when(idx === i, lit(opFor(a))).otherwise(rest)
    }

  private def lastName(e: Expression): String = e match {
    case a: UnresolvedAttribute => a.nameParts.last
    case a: Attribute => a.name
    case other => unsupported(s"assignment target ${other.sql}")
  }

  private def assignValue(assigns: Seq[Assignment], c: String,
                          default: Column): Column =
    assigns.find(a => lastName(a.key).equalsIgnoreCase(c))
      .map(a => Bridge.columnOf(a.value)).getOrElse(default)

  /** Payload value of column `c` under the winning clause of one section.
    * `starVal` is the SET * / INSERT * source value; `keepVal` what an
    * unassigned / deleted row carries (target value, or null for
    * inserts). */
  private def sectionValue(actions: Seq[MergeAction], idx: Column, c: String,
                           starVal: Column, keepVal: Column): Column =
    actions.zipWithIndex.foldRight(keepVal) { case ((a, i), rest) =>
      val v = a match {
        case UpdateAction(_, as, _) => assignValue(as, c, keepVal)
        case _: UpdateStarAction => starVal
        case _: DeleteAction => keepVal
        case InsertAction(_, as) => assignValue(as, c, lit(null))
        case _: InsertStarAction => starVal
        case other => unsupported(s"merge action $other")
      }
      when(idx === i, v).otherwise(rest)
    }

  // ---- classification ------------------------------------------------------

  /** No table yet: every source row is NOT MATCHED; only the insert
    * section can apply. Defines the table schema: source columns for
    * INSERT *, the assigned columns for INSERT (cols) VALUES. */
  private def classifyFirstCommit(src: DataFrame, tKey: String,
                                  sKey: String): DataFrame = {
    require(spec.notMatched.nonEmpty,
      s"MERGE INTO $dir: no table exists yet and the statement has no " +
        "WHEN NOT MATCHED THEN INSERT clause")
    val idx = clauseIdx(spec.notMatched)
    val payload: Seq[String] =
      if (spec.notMatched.exists(_.isInstanceOf[InsertStarAction]))
        src.columns.toSeq.map(c => if (c.equalsIgnoreCase(sKey)) tKey else c)
      else spec.notMatched.collect { case InsertAction(_, as) =>
        as.map(a => lastName(a.key))
      }.flatten.distinct
    val srcVal = (c: String) =>
      if (c.equalsIgnoreCase(tKey)) src(sKey)
      else if (src.columns.exists(_.equalsIgnoreCase(c))) src(c)
      else lit(null)
    src
      .select(payload.map(c =>
        sectionValue(spec.notMatched, idx, c, srcVal(c), lit(null)).as(c)) :+
        opChain(spec.notMatched, idx).as(OpCol): _*)
      .filter(col(OpCol).isNotNull)
  }

  /** Live table: join source to the snapshot on the ON condition and
    * classify each row into its ANSI section — matched, not-matched (by
    * target), not-matched-by-source — evaluating clause conditions with
    * both sides in scope. */
  private def classifyAgainstSnapshot(spark: SparkSession, src: DataFrame,
                                      tKey: String, sKey: String): DataFrame = {
    val nmbs = spec.notMatchedBySource
    val tgt0 =
      if (nmbs.nonEmpty) MergeTable.read(spark, dir) // must see EVERY target row
      else MergeTable.readForKeys(spark, dir, src.select(src(sKey)))
    val tgtCols = tgt0.columns.toSeq
    val extra =
      if (spec.withSchemaEvolution)
        src.columns.toSeq.filterNot(c => c.equalsIgnoreCase(sKey) ||
          tgtCols.exists(_.equalsIgnoreCase(c)))
      else Nil
    val payload = tgtCols ++ extra
    val srcP = src.withColumn(SrcMark, lit(true))
    val tgtP = tgt0.alias(targetAlias).withColumn(TgtMark, lit(true))
    val joinType = if (nmbs.nonEmpty) "full_outer" else "left_outer"
    val joined = srcP.join(tgtP, Bridge.columnOf(spec.condition), joinType)

    val matched = coalesce(col(SrcMark), lit(false)) &&
      coalesce(col(TgtMark), lit(false))
    val srcOnly = coalesce(col(SrcMark), lit(false)) &&
      !coalesce(col(TgtMark), lit(false))
    val mIdx = clauseIdx(spec.matched)
    val nmIdx = clauseIdx(spec.notMatched)
    val nmbsIdx = clauseIdx(nmbs)
    val op = when(matched, opChain(spec.matched, mIdx))
      .when(srcOnly, opChain(spec.notMatched, nmIdx))
      .otherwise(opChain(nmbs, nmbsIdx))

    val srcVal = (c: String) =>
      if (c.equalsIgnoreCase(tKey)) srcP(sKey)
      else if (src.columns.exists(_.equalsIgnoreCase(c))) srcP(c)
      else lit(null)
    val tgtVal = (c: String) =>
      if (tgtCols.exists(_.equalsIgnoreCase(c))) tgtP(c) else lit(null)
    val value = (c: String) => {
      val raw = when(matched,
          sectionValue(spec.matched, mIdx, c, srcVal(c), tgtVal(c)))
        .when(srcOnly,
          sectionValue(spec.notMatched, nmIdx, c, srcVal(c), lit(null)))
        .otherwise(sectionValue(nmbs, nmbsIdx, c, lit(null), tgtVal(c)))
      // store-assignment cast to the target column's type (ANSI MERGE
      // casts on write); evolution columns keep their source type
      tgt0.schema.fields.find(_.name.equalsIgnoreCase(c))
        .map(f => raw.cast(f.dataType)).getOrElse(raw)
    }
    joined
      .select(payload.map(c => value(c).as(c)) :+ op.as(OpCol): _*)
      .filter(col(OpCol).isNotNull)
  }
}
