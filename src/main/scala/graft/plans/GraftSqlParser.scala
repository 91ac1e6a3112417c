package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{ColumnDefinition, CreateTable, LogicalPlan, TableSpec}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType, TimestampType}

import graft.layout.MergeTable

/** The SQL-only table LIFECYCLE for [[MergeTableSql]]-registered (or
  * created) MergeTables — the verbs a pure-SQL session needs to
  * bootstrap and maintain a table without touching the Scala API:
  *
  *  - `CREATE TABLE t (cols) USING graft LOCATION '<dir>' TBLPROPERTIES
  *    ('graft.key'='k1[,k2...]' [, 'graft.buckets'='n'])` — Spark's own
  *    grammar parses this; the provider name `graft` marks it, and the
  *    conversion happens AT PARSE TIME (on the parsed, pre-analysis
  *    plan), so no analyzer-rule ordering can route it into the session
  *    catalog's unknown-provider error. Creates an empty v0 manifest and
  *    registers the name. `IF NOT EXISTS` re-registers idempotently.
  *  - `OPTIMIZE t` → [[MergeTable.compact]] (fold accumulated versions
  *    back to one pruned scan per read).
  *  - `VACUUM t [RETAIN n VERSIONS]` → optionally
  *    [[MergeTable.expireVersions]] to the newest n, then
  *    [[MergeTable.vacuum]] (reclaim unreferenced snapshot dirs and
  *    crash-orphaned stages past the grace window).
  *  - `DESCRIBE HISTORY t` → [[MergeTable.history]] (version, commit
  *    wall-clock, operation, batch rows — the audit surface behind
  *    `VERSION/TIMESTAMP AS OF` and vacuum retention decisions).
  *
  * These three maintenance verbs are not in Spark's grammar at all, so
  * they are matched textually BEFORE delegation (the standard injected-
  * parser pattern); every other statement — including the graft MERGE /
  * DML / SELECT shapes — parses through the delegate untouched and
  * resolves via [[MergeTableSqlResolution]]. A maintenance verb over an
  * UNREGISTERED name falls through to the delegate's parse error — the
  * parser never claims syntax for tables it does not know. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Ident = """([A-Za-z_][A-Za-z0-9_]*)"""
  private val OptimizeRe = ("""(?is)^\s*OPTIMIZE\s+""" + Ident +
    """(?:\s+(CLUSTER|ZORDER)\s+BY\s+\(\s*([A-Za-z_][A-Za-z0-9_]*(?:\s*,\s*[A-Za-z_][A-Za-z0-9_]*)*)\s*\))?\s*;?\s*$""").r
  // r18 bucket-count resize: `OPTIMIZE t REBUCKET n`
  private val RebucketRe = ("""(?is)^\s*OPTIMIZE\s+""" + Ident +
    """\s+REBUCKET\s+(\d+)\s*;?\s*$""").r
  private val VacuumRe =
    ("""(?is)^\s*VACUUM\s+""" + Ident +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS?)?\s*;?\s*$""").r
  private val HistoryRe =
    ("""(?is)^\s*DESC(?:RIBE)?\s+HISTORY\s+""" + Ident + """\s*;?\s*$""").r
  private val DetailRe =
    ("""(?is)^\s*DESC(?:RIBE)?\s+DETAIL\s+""" + Ident + """\s*;?\s*$""").r
  // r16 skipping-tier designation: `ALTER TABLE t SET DICTIONARY (c1, c2)
  // [MAX n]` / `SET BLOOM (c1) [NDV n]` / `UNSET DICTIONARY|BLOOM` —
  // pure-SQL reachability for the per-bucket value dictionaries and
  // parquet bloom filters (the Scala alterSetDictColumns /
  // alterSetParquetBloom verbs)
  private val ColList = """([A-Za-z_][A-Za-z0-9_]*(?:\s*,\s*[A-Za-z_][A-Za-z0-9_]*)*)"""
  private val SetSkipRe = ("""(?is)^\s*ALTER\s+TABLE\s+""" + Ident +
    """\s+SET\s+(DICTIONARY|BLOOM)\s*\(\s*""" + ColList +
    """\s*\)(?:\s+(?:MAX|NDV)\s+(\d+))?\s*;?\s*$""").r
  private val UnsetSkipRe = ("""(?is)^\s*ALTER\s+TABLE\s+""" + Ident +
    """\s+UNSET\s+(DICTIONARY|BLOOM)\s*;?\s*$""").r
  // r16 zero-copy fork: `CLONE src AS dst LOCATION 'path'` — hard-linked
  // snapshot clone ([[MergeTable.cloneTable]]), registered under `dst`
  private val CloneRe = ("""(?is)^\s*CLONE\s+""" + Ident + """\s+AS\s+""" +
    Ident + """\s+LOCATION\s+'([^']+)'\s*;?\s*$""").r

  private def dirOf(name: String): Option[String] =
    MergeTableSql.lookup(Seq(name)).map(_._1)

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case RebucketRe(name, n) if dirOf(name).isDefined =>
      GraftRebucketCommand(dirOf(name).get, n.toInt)
    case OptimizeRe(name, verb, cols) if dirOf(name).isDefined =>
      val colSeq = Option(cols).map(_.split(",").toSeq.map(_.trim))
      Option(verb).map(_.toUpperCase) match {
        case Some("ZORDER") =>
          val cs = colSeq.get
          require(cs.size == 2,
            s"OPTIMIZE $name ZORDER BY takes exactly 2 columns, got ${cs.size}")
          GraftOptimizeCommand(dirOf(name).get,
            zorderBy = Some((cs.head, cs(1))))
        case _ =>
          GraftOptimizeCommand(dirOf(name).get, clusterBy = colSeq)
      }
    case VacuumRe(name, retain) if dirOf(name).isDefined =>
      GraftVacuumCommand(dirOf(name).get, Option(retain).map(_.toInt))
    case HistoryRe(name) if dirOf(name).isDefined =>
      GraftHistoryCommand(dirOf(name).get)
    case DetailRe(name) if dirOf(name).isDefined =>
      GraftDetailCommand(dirOf(name).get)
    case SetSkipRe(name, kind, cols, param) if dirOf(name).isDefined =>
      GraftAlterSkipCommand(dirOf(name).get, kind.toUpperCase,
        cols.split(",").toSeq.map(_.trim), Option(param).map(_.toLong))
    case UnsetSkipRe(name, kind) if dirOf(name).isDefined =>
      GraftAlterSkipCommand(dirOf(name).get, kind.toUpperCase, Nil, None)
    case CloneRe(src, dst, loc) if dirOf(src).isDefined =>
      GraftCloneCommand(dirOf(src).get, dst, loc)
    case _ => delegate.parsePlan(sqlText) match {
      case ct: CreateTable => GraftCreateTableCommand.convert(ct)
      case other => other
    }
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

/** `CREATE TABLE ... USING graft`: an empty v0 manifest (schema, keys,
  * bucket count — [[MergeTable.create]]) plus a [[MergeTableSql]]
  * registration. Output: the created version (0), or -1 when IF NOT
  * EXISTS found an existing table (which is then just re-registered —
  * idempotent bootstrap). */
case class GraftCreateTableCommand(name: String, tableSchema: StructType,
                                   keys: Seq[String], location: String,
                                   declaredBuckets: Option[Int],
                                   ifNotExists: Boolean)
    extends LeafRunnableCommand {

  private def numBuckets: Int = declaredBuckets.getOrElse(16)

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val exists = MergeTable.currentVersion(location).isDefined
    val v =
      if (exists) {
        require(ifNotExists,
          s"a MergeTable already exists at $location — CREATE TABLE IF " +
            "NOT EXISTS re-registers it; plain CREATE TABLE refuses")
        // IF NOT EXISTS re-registration is idempotent ONLY when the DDL
        // agrees with the table it found: a statement declaring different
        // columns, keys, or bucket count would otherwise succeed silently
        // and every later read/merge would behave unlike its DDL claims —
        // mirror the strictness of the fresh-create branch.
        val have = MergeTable.read(spark, location).schema
        val declared = tableSchema
        require(declared.fields.length == have.fields.length &&
            declared.fields.zip(have.fields).forall { case (d, h) =>
              d.name.equalsIgnoreCase(h.name) && d.dataType == h.dataType },
          s"CREATE TABLE IF NOT EXISTS $name: declared columns (" +
            declared.fields.map(f => s"${f.name} ${f.dataType.simpleString}")
              .mkString(", ") +
            s") do not match the existing MergeTable at $location (" +
            have.fields.map(f => s"${f.name} ${f.dataType.simpleString}")
              .mkString(", ") + ")")
        val haveKeys = MergeTable.tableKeys(location)
        require(keys.size == haveKeys.size &&
            keys.zip(haveKeys).forall { case (d, h) => d.equalsIgnoreCase(h) },
          s"CREATE TABLE IF NOT EXISTS $name: declared graft.key (" +
            keys.mkString(",") + ") does not match the existing table's (" +
            haveKeys.mkString(",") + ")")
        // bucket count is checked only when the DDL DECLARES one — an
        // undeclared graft.buckets means "whatever the table has", not
        // "the default 16"
        val haveBuckets = MergeTable.tableNumBuckets(location)
        declaredBuckets.foreach(nb => require(nb == haveBuckets,
          s"CREATE TABLE IF NOT EXISTS $name: declared graft.buckets " +
            s"$nb does not match the existing table's $haveBuckets"))
        -1L
      } else MergeTable.create(spark, location, tableSchema, keys, numBuckets)
    MergeTableSql.register(name, location,
      if (exists) MergeTable.tableNumBuckets(location) else numBuckets)
    Seq(Row(v))
  }
}

object GraftCreateTableCommand {

  /** Convert a parsed `CreateTable` whose provider is `graft` into the
    * eager command; any other provider passes through untouched. Called
    * at PARSE time by [[GraftSqlParser]] so the session catalog's
    * provider lookup never sees the unknown name. */
  private[plans] def convert(ct: CreateTable): LogicalPlan = {
    // fresh from the parser the spec is UnresolvedTableSpec (provider,
    // location, and TBLPROPERTIES are already plain strings; only OPTIONS
    // carry unevaluated expressions); a resolved TableSpec matches too
    val (provider, location, props): (Option[String], Option[String], Map[String, String]) =
      ct.tableSpec match {
        case s: TableSpec => (s.provider, s.location, s.options ++ s.properties)
        case u: org.apache.spark.sql.catalyst.plans.logical.UnresolvedTableSpec =>
          val opts = u.optionExpression.options.collect {
            case (k, org.apache.spark.sql.catalyst.expressions.Literal(v, _))
                if v != null => k -> v.toString
          }.toMap
          (u.provider, u.location, opts ++ u.properties)
        case _ => (None, None, Map.empty)
      }
    if (!provider.exists(_.equalsIgnoreCase("graft"))) return ct
    val name = ct.name match {
      case UnresolvedIdentifier(Seq(one), _) => one
      case other => throw new UnsupportedOperationException(
        s"graft CREATE TABLE: single-part table names only, got $other")
    }
    require(ct.partitioning.isEmpty,
      "graft CREATE TABLE: PARTITIONED BY does not apply — the layout is " +
        "hash-bucketed by key ('graft.buckets' sizes it)")
    val loc = location.getOrElse(throw new IllegalArgumentException(
      "graft CREATE TABLE requires LOCATION '<dir>' (the MergeTable root)"))
    val keys = props.get("graft.key").map(_.split(",").toSeq.map(_.trim))
      .getOrElse(throw new IllegalArgumentException(
        "graft CREATE TABLE requires TBLPROPERTIES " +
          "('graft.key'='k1[,k2...]') — the MERGE key column(s)"))
    val schema = StructType(ct.columns.map(columnToField))
    keys.foreach(k => require(schema.fieldNames.contains(k),
      s"graft.key column '$k' is not in the CREATE TABLE column list"))
    GraftCreateTableCommand(name, schema, keys, loc,
      props.get("graft.buckets").map(_.toInt), ct.ignoreIfExists)
  }

  private def columnToField(c: ColumnDefinition): StructField = {
    require(c.defaultValue.isEmpty && c.generationExpression.isEmpty &&
      c.identityColumnSpec.isEmpty,
      s"graft CREATE TABLE: column '${c.name}' — defaults/generated/" +
        "identity columns are not MergeTable state")
    StructField(c.name, c.dataType, c.nullable)
  }
}

/** `OPTIMIZE t [CLUSTER BY (c1[, c2...]) | ZORDER BY (a, b)]` →
  * [[MergeTable.compact]]: every live bucket rewritten into one new
  * version (reads fold back to one pruned scan); with CLUSTER BY, each
  * bucket's files sort by the given columns so scan-side parquet
  * statistics prune on them (the data-skipping production story for
  * hash-bucketed tables); with ZORDER BY, files sort by the Morton
  * z-value of the two binned numeric columns so a 2-D box predicate
  * prunes on BOTH at once. Output: the committed version. */
case class GraftOptimizeCommand(dir: String,
                                clusterBy: Option[Seq[String]] = None,
                                zorderBy: Option[(String, String)] = None)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(MergeTable.compact(spark, dir, clusterBy = clusterBy,
      zorderBy = zorderBy)))
}

/** `OPTIMIZE t REBUCKET n` → [[MergeTable.rebucket]] (r18): re-hash the
  * grown table into n buckets through the same CAS commit — deletion
  * vectors and delta runs materialize, stats/dicts/blooms re-derive.
  * Output: the committed version. */
case class GraftRebucketCommand(dir: String, newBuckets: Int)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(MergeTable.rebucket(spark, dir, newBuckets)))
}

/** `VACUUM t [RETAIN n VERSIONS]` → optional [[MergeTable
  * .expireVersions]] + [[MergeTable.vacuum]]. Output: versions expired
  * and snapshot/stage dirs deleted. */
case class GraftVacuumCommand(dir: String, retain: Option[Int])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("expired_versions", LongType, nullable = false)(),
    AttributeReference("deleted_dirs", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val expired = retain.map(n =>
      MergeTable.expireVersions(dir, keepLast = n).size.toLong).getOrElse(0L)
    val deleted = MergeTable.vacuum(dir).size.toLong
    Seq(Row(expired, deleted))
  }
}

/** `ALTER TABLE t SET DICTIONARY (cols) [MAX n]` / `SET BLOOM (cols)
  * [NDV n]` / `UNSET DICTIONARY|BLOOM` → the r16 skipping-tier
  * designations ([[MergeTable.alterSetDictColumns]] /
  * [[MergeTable.alterSetParquetBloom]]): metadata-only commits; the next
  * rewrite of each bucket records sets / writes blooms, `OPTIMIZE t`
  * backfills the whole table. Output: the committed version. */
case class GraftAlterSkipCommand(dir: String, kind: String,
                                 columns: Seq[String], param: Option[Long])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val v = kind match {
      case "DICTIONARY" => MergeTable.alterSetDictColumns(dir, columns,
        param.map(_.toInt).getOrElse(64))
      case "BLOOM" => MergeTable.alterSetParquetBloom(dir, columns,
        param.getOrElse(1000000L))
      case other => throw new IllegalArgumentException(
        s"unknown skipping tier '$other'")
    }
    Seq(Row(v))
  }
}

/** `DESCRIBE DETAIL t` → [[MergeTable.detail]]: the one-row operational
  * summary (version, key, buckets, exact rows, scan groups, pending
  * deletion-vector tombstones, dictionary/bloom designations) — a pure
  * manifest read. */
case class GraftDetailCommand(dir: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("key", StringType, nullable = false)(),
    AttributeReference("num_buckets", IntegerType, nullable = false)(),
    AttributeReference("rows", LongType, nullable = true)(),
    AttributeReference("scan_groups", IntegerType, nullable = false)(),
    AttributeReference("dv_tombstones", LongType, nullable = false)(),
    AttributeReference("dict_cols", StringType, nullable = false)(),
    AttributeReference("bloom_cols", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    MergeTable.detail(spark, dir).collect().toSeq
}

/** `CLONE src AS dst LOCATION 'path'` → [[MergeTable.cloneTable]] (a
  * hard-linked zero-copy snapshot fork — per-file cost, never per-byte)
  * plus a [[MergeTableSql]] registration of the clone under `dst`.
  * Output: the cloned version. */
case class GraftCloneCommand(srcDir: String, dstName: String,
                             location: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val v = MergeTable.cloneTable(spark, srcDir, location)
    MergeTableSql.register(dstName, location,
      MergeTable.tableNumBuckets(location))
    Seq(Row(v))
  }
}

/** `DESCRIBE HISTORY t` → [[MergeTable.history]] rows (ascending by
  * version): the audit trail behind time travel and vacuum retention. */
case class GraftHistoryCommand(dir: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("committed_at", TimestampType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = true)(),
    AttributeReference("batch_rows", LongType, nullable = false)(),
    AttributeReference("key", StringType, nullable = false)(),
    AttributeReference("num_buckets", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    MergeTable.history(spark, dir).collect().toSeq
}
