package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star ⊕): image/audio/video payloads
  * are opaque `binary` columns with a typed metadata struct alongside. The
  * Spark-side pipeline — schema, partitioning, batch shape, feature
  * columns — is real and tested; the *codec* itself is stubbed behind
  * [[Decoder]] because no image/audio libraries ship in this container.
  * Swapping in a real decoder (JavaCV, TwelveMonkeys, ffmpeg-cli via
  * mapPartitions) changes ONE class, not the pipeline.
  *
  * Scale notes: payloads stay columnar parquet binary; decode runs
  * per-partition (one decoder instance per task, amortized init);
  * `spark.sql.files.maxPartitionBytes` governs batch size, and wide binary
  * columns are pruned unless selected.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Attach a synthetic binary payload + metadata to any table (here the
    * documents table doubles as a media catalog: bytes = utf-8 text). */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("meta", struct(
        lit("application/octet-stream").as("mime"),
        (length(col("payload")) % 512 + 64).cast("int").as("width"),
        ((ascii(substring(col("text"), 1, 1)) * 7) % 512 + 64).cast("int").as("height"),
        (length(col("text")).cast("long") * 100L).as("duration_ms")))

  /** Pluggable per-partition decoder. Implementations must be Serializable
    * (shipped to executors) and cheap to construct per task. */
  trait Decoder extends Serializable {
    /** bytes -> fixed-width feature vector */
    def features(payload: Array[Byte]): Array[Double]
  }

  /** STUB: a real image/audio decode would live here (e.g. JavaCV
    * `Java2DFrameConverter` / resize / frame-sample). The container has no
    * media libs, so this derives a deterministic 8-dim feature from byte
    * statistics — same shape, same plumbing, fake content. */
  class DeterministicFakeDecoder extends Decoder {
    def features(payload: Array[Byte]): Array[Double] = {
      val n = math.max(payload.length, 1)
      val feats = new Array[Double](8)
      var i = 0
      while (i < payload.length) {
        feats(i % 8) += (payload(i) & 0xff).toDouble
        i += 1
      }
      feats.map(_ / n)
    }
  }

  /** Decode/feature-extract over binary payloads: mapPartitions so the
    * decoder is constructed once per task (the Scala analogue of a batched
    * `mapInPandas` UDF — same batch-per-partition shape). */
  def extractFeatures(withPayload: DataFrame, idCol: String,
                      decoder: Decoder = new DeterministicFakeDecoder): DataFrame = {
    val spark = withPayload.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType), nullable = false)))
    val input = withPayload.select(col(idCol).cast("long"), col("payload"))
    val rdd = input.rdd.mapPartitions { rows =>
      val dec = decoder // one instance per task
      rows.map(r => Row(r.getLong(0), dec.features(r.getAs[Array[Byte]](1)).toSeq))
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** "Resize" for the opaque-binary pipeline: stride-decimate the payload
    * (keep every `factor`-th byte) — the byte-level stand-in for an image
    * resize, keeping the columnar shape (binary in → binary out) so a real
    * resampler slots in without plan changes. Native O(n) codegen kernel
    * ([[graft.functions.BinaryStride]]); the earlier built-in formulation
    * (per-byte substr folded with concat) was O(n²) per row. */
  def resizeBytes(withPayload: DataFrame, factor: Int): DataFrame =
    withPayload.withColumn("payload_small",
      graft.functions.BinaryFunctions.binaryStride(col("payload"), lit(factor)))

  /** "Frame sampling" for a chunked binary stream: split the payload into
    * fixed-size chunks and keep every `stride`-th — pure built-ins
    * (`sequence` + `transform` + `substring` on binary via substr). */
  def sampleChunks(withPayload: DataFrame, chunkBytes: Int, stride: Int): DataFrame = {
    val nChunks = ceil(length(col("payload")).cast("double") / chunkBytes).cast("int")
    withPayload.withColumn("frames",
      transform(
        filter(sequence(lit(0), greatest(nChunks - 1, lit(0))),
          i => i % stride === 0),
        i => col("payload").substr(i * chunkBytes + 1, lit(chunkBytes))))
  }
}
