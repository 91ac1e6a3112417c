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
  /** events.parquet stores ts as TIMESTAMP(NANOS); Spark reads it as a
    * nanosecond long (spark.sql.legacy.parquet.nanosAsLong=true, set in
    * Verify/Bench) and we convert to µs TimestampType here. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    val raw = s.read.parquet(s"$d/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, NOT `/`: Column./ is double division, and at
        // ~1.7e18 ns a double's ulp is ≈1µs — enough to shift a truncated
        // timestamp by a microsecond vs the exact value
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
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
