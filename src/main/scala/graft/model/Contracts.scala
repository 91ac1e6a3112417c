package graft.model

import org.apache.spark.sql.SparkSession

/** Ingestion data contract: the expected shape of every input table,
  * validated against the actual parquet footers BEFORE a query runs.
  *
  * Round 6 lost 11 queries because the harness regenerated `events.parquet`
  * with a different `ts` encoding and nothing noticed until 133 queries had
  * run against it — five failing analysis and six silently returning
  * 1000×-compressed windows. A schema contract turns that class of drift
  * into one named, immediate error. This is the same discipline
  * [[graft.ops.DataQuality]] applies to table *contents*, applied to table
  * *shape*; it is metadata-only (parquet footer reads), so the preflight
  * costs milliseconds even at 100 TB.
  */
object Contracts {

  /** Expected column type: either an exact Catalyst type (compared by
    * `catalogString`, which ignores nullability) or an event-time column
    * that may arrive in any encoding the engine normalizes. */
  sealed trait Col { def describe: String }
  /** `catalogString` form, e.g. "bigint", "array<float>". */
  final case class Exact(tpe: String) extends Col { def describe: String = tpe }
  /** Any encoding [[Tables.normalizeTs]] accepts: INT64 nanos ("bigint"),
    * timestamp_ntz, or timestamp. */
  case object EventTime extends Col {
    val accepted = Set("bigint", "timestamp_ntz", "timestamp")
    def describe: String = accepted.mkString("one of {", ", ", "}")
  }
  /** A date-like column the relational queries compare/cast but never do
    * epoch arithmetic on: timestamp or timestamp_ntz both work. */
  case object DateTime extends Col {
    val accepted = Set("timestamp_ntz", "timestamp")
    def describe: String = accepted.mkString("one of {", ", ", "}")
  }

  private def ok(expected: Col, actual: String): Boolean = expected match {
    case Exact(t)  => t == actual
    case EventTime => EventTime.accepted(actual)
    case DateTime  => DateTime.accepted(actual)
  }

  val expected: Map[String, Seq[(String, Col)]] = Map(
    "region" -> Seq("r_regionkey" -> Exact("int"), "r_name" -> Exact("string")),
    "nation" -> Seq("n_nationkey" -> Exact("int"), "n_name" -> Exact("string"),
      "n_regionkey" -> Exact("int")),
    "customer" -> Seq("c_custkey" -> Exact("bigint"), "c_name" -> Exact("string"),
      "c_nationkey" -> Exact("int"), "c_acctbal" -> Exact("double"),
      "c_mktsegment" -> Exact("string")),
    "supplier" -> Seq("s_suppkey" -> Exact("bigint"), "s_name" -> Exact("string"),
      "s_nationkey" -> Exact("int"), "s_acctbal" -> Exact("double")),
    "part" -> Seq("p_partkey" -> Exact("bigint"), "p_name" -> Exact("string"),
      "p_brand" -> Exact("string"), "p_type" -> Exact("string"),
      "p_size" -> Exact("int"), "p_retailprice" -> Exact("double")),
    "orders" -> Seq("o_orderkey" -> Exact("bigint"), "o_custkey" -> Exact("bigint"),
      "o_orderstatus" -> Exact("string"), "o_totalprice" -> Exact("double"),
      "o_orderdate" -> DateTime, "o_orderpriority" -> Exact("string")),
    "lineitem" -> Seq("l_orderkey" -> Exact("bigint"), "l_partkey" -> Exact("bigint"),
      "l_suppkey" -> Exact("bigint"), "l_linenumber" -> Exact("int"),
      "l_quantity" -> Exact("double"), "l_extendedprice" -> Exact("double"),
      "l_discount" -> Exact("double"), "l_tax" -> Exact("double"),
      "l_returnflag" -> Exact("string"), "l_linestatus" -> Exact("string"),
      "l_shipdate" -> DateTime),
    "events" -> Seq("event_id" -> Exact("bigint"), "ts" -> EventTime,
      "user_id" -> Exact("bigint"), "event_type" -> Exact("string"),
      "value" -> Exact("double"), "props" -> Exact("string")),
    "documents" -> Seq("doc_id" -> Exact("bigint"), "text" -> Exact("string"),
      "lang" -> Exact("string"), "source" -> Exact("string"),
      "n_chars" -> Exact("bigint")),
    "embeddings" -> Seq("vec_id" -> Exact("bigint"),
      "embedding" -> Exact("array<float>"), "label" -> Exact("int")))

  /** Every contract violation in `dir`, one named line per diff
    * (`table.column: got X, expected Y`). Empty = clean. */
  def diffs(spark: SparkSession, dir: String): Seq[String] =
    expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val path = s"$dir/$table.parquet"
      (try Right(spark.read.parquet(path).schema)
       catch { case e: Exception => Left(e.getMessage) }) match {
        case Left(msg) => Seq(s"$table: unreadable at $path (${Option(msg).getOrElse("").take(80)})")
        case Right(schema) =>
          val actual = schema.fields.map(f => f.name -> f.dataType.catalogString).toMap
          cols.flatMap { case (name, exp) =>
            actual.get(name) match {
              case None => Some(s"$table.$name: MISSING, expected ${exp.describe}")
              case Some(a) if !ok(exp, a) =>
                Some(s"$table.$name: got $a, expected ${exp.describe}")
              case _ => None
            }
          }
      }
    }

  /** Assert the contract; throws with every named diff on violation. Run
    * this before a query loop so schema drift in the inputs fails loud and
    * first, not as N downstream analysis errors (or worse, silently wrong
    * windows). */
  def preflight(spark: SparkSession, dir: String): Unit = {
    val d = diffs(spark, dir)
    if (d.nonEmpty) throw new IllegalStateException(
      s"ingestion contract violated for $dir:\n  " + d.mkString("\n  "))
  }
}
