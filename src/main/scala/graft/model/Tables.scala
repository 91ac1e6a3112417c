package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet tables (TESTDATA.md) plus the
  * explicit schemas of the reference's two source documents (SURVEY.md §1.2,
  * inferred from /root/reference/main.py field accesses).
  *
  * Everything is a parquet-backed DataFrame so Catalyst gets predicate
  * pushdown, column pruning and vectorized scan for free. At 100 TB the only
  * change is the path (and optionally bucketing on the join keys); nothing
  * here collects to the driver.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** Normalize an event-time column to TimestampType regardless of how the
    * producer encoded it. Encodings this loader accepts:
    *   - INT64 nanoseconds — either a raw long column or parquet
    *     TIMESTAMP(NANOS) surfaced as LongType via
    *     spark.sql.legacy.parquet.nanosAsLong=true (set in Verify/Bench);
    *   - parquet timestamp[us/ms] with isAdjustedToUTC=false, which Spark 4
    *     reads as TIMESTAMP_NTZ;
    *   - TimestampType, passed through.
    * The session timezone is pinned to UTC everywhere we run, so the
    * NTZ→instant cast is exact. This is the ONLY place event-time decoding
    * lives: both the batch loader below and the streaming source
    * (streaming/EventStreams.scala) call it. Any unknown encoding fails loud
    * rather than leaking a mis-scaled timestamp into every downstream window. */
  def normalizeTs(df: DataFrame, c: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    df.schema(c).dataType match {
      case LongType =>
        // integer `div`, NOT `/`: Column./ is double division, and at
        // ~1.7e18 ns a double's ulp is ≈1µs — enough to shift a truncated
        // timestamp by a microsecond vs the exact value
        df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      case TimestampNTZType => df.withColumn(c, col(c).cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalArgumentException(
        s"events.'$c' has unsupported event-time encoding $other; " +
          "expected INT64 nanos, timestamp NTZ, or timestamp")
    }
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(s.read.parquet(s"$d/events.parquet"))
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** pretalx schedule.json shape — reference main.py:113-132 reads these
    * fields; nullability follows its `or ""` guards (main.py:116,120,122,132). */
  val pretalxScheduleSchema: StructType = StructType(Seq(
    StructField("talks", ArrayType(StructType(Seq(
      StructField("code", StringType, nullable = true),
      StructField("title", StringType, nullable = true),
      StructField("room", IntegerType, nullable = true),
      StructField("abstract", StringType, nullable = true),
      StructField("speakers", ArrayType(StringType), nullable = true),
      StructField("start", StringType, nullable = true),
      StructField("duration", StringType, nullable = true)))), nullable = true),
    StructField("speakers", ArrayType(StructType(Seq(
      StructField("code", StringType, nullable = false),
      StructField("name", StringType, nullable = true)))), nullable = true)))

  /** Hub REST events envelope — reference main.py:70-74. */
  val hubEventsPageSchema: StructType = StructType(Seq(
    StructField("data", ArrayType(StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("tags", ArrayType(StringType), nullable = true)))), nullable = true),
    StructField("pagination", StructType(Seq(
      StructField("total", IntegerType, nullable = false),
      StructField("page", IntegerType, nullable = false),
      StructField("page_size", IntegerType, nullable = false))), nullable = true)))
}
