package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §7.6): image/audio/video as opaque
  * `binary` columns with a typed metadata struct, plus decode /
  * feature-extract / frame-sample operators.
  *
  * IMAGE decode is REAL: [[ImageIoDecoder]] reads PNG/BMP/GIF/JPEG through
  * the JDK's own `javax.imageio` (no external codec needed) and extracts
  * width/height/channels plus a luminance-histogram feature vector.
  * AUDIO decode is REAL for WAV/PCM: [[WavDecoder]] parses through the
  * JDK's `javax.sound.sampled` (again no external codec) and extracts
  * channels/sample-rate/duration plus an amplitude-histogram feature.
  * Only VIDEO decode stays STUBBED (no container/codec support in the
  * JDK) behind [[FakeDecoder]], a deterministic hash-based stand-in; an
  * undecodable image/audio payload also falls back to it, with null
  * metadata, so a corrupt blob degrades instead of failing the
  * batch. Everything Spark-side is real and tested either way: the asset
  * schema, the partition-wise batch shape (`mapPartitions` over iterators,
  * the Scala analog of `mapInPandas` batches: no per-row codec setup, one
  * decoder per partition), and the feature schema the pipeline carries.
  *
  * At 100 TB: assets are stored alongside (not inside) the relational
  * tables, partitioned by `modality` then bucketed by `asset_id`; decode is
  * a narrow map with no shuffle, so it scales linearly with executors.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType),                    // opaque payload
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),    // real image decode; null otherwise
    StructField("height", IntegerType),
    StructField("channels", IntegerType), // image color / audio channels
    StructField("sample_rate_hz", IntegerType), // real audio decode only
    StructField("duration_ms", LongType),       // real audio decode only
    StructField("feature", ArrayType(FloatType))))

  /** Deterministic stand-in for a real codec: "features" are derived from
    * content bytes with a rolling hash, so tests are stable and the real
    * decoder drops in behind the same signature. Stub surface: audio/video
    * modalities and undecodable image payloads. */
  object FakeDecoder {
    def features(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < content.length) {
        h = 31 * h + content(i)
        out(Math.floorMod(i, dim)) += (Math.floorMod(h, 1000L) / 1000.0f - 0.5f)
        i += 1
      }
      out
    }
  }

  /** Decoded image facts: dimensions, color channels, and a dim-bin
    * luminance histogram normalized by pixel count (resolution-invariant,
    * deterministic — the embedding-ish per-image feature a curation
    * pipeline thresholds on). */
  final case class ImageFacts(width: Int, height: Int, channels: Int,
                              feature: Array[Float])

  /** REAL image decode via the JDK's `javax.imageio` — PNG, BMP, GIF and
    * JPEG readers ship with every JRE, so no external dependency. Returns
    * None for payloads ImageIO does not recognize (the caller falls back
    * to [[FakeDecoder]] rather than failing the batch — at 100 TB some
    * blobs WILL be corrupt). */
  object ImageIoDecoder {
    def decode(content: Array[Byte], dim: Int): Option[ImageFacts] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        catch { case _: Exception => null } // corrupt payloads return None
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val out = new Array[Float](dim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y) // sRGB regardless of storage format
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000 // integer Rec.601 luma, 0..255
            out(math.min(dim - 1, lum * dim / 256)) += 1f
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        var i = 0
        while (i < dim) { out(i) /= n; i += 1 }
        Some(ImageFacts(w, h, img.getColorModel.getNumComponents, out))
      }
    }
  }

  /** Decoded audio facts: stream layout plus a dim-bin histogram of
    * absolute sample amplitude (normalized by sample count — the
    * loudness-profile feature a curation pipeline thresholds on, e.g. to
    * drop silence or clipped captures). */
  final case class AudioFacts(channels: Int, sampleRateHz: Int,
                              durationMs: Long, feature: Array[Float])

  /** REAL audio decode via the JDK's `javax.sound.sampled` — the WAV/AIFF
    * PCM readers ship with every JRE. Returns None for payloads the
    * sound API does not recognize (fallback to [[FakeDecoder]], same
    * corrupt-blob contract as images). Feature: histogram of |amplitude|
    * in [0, 1], all channels interleaved — sample-rate- and
    * length-invariant. */
  object WavDecoder {
    def decode(content: Array[Byte], dim: Int): Option[AudioFacts] = {
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        catch { case _: Exception => null }
      if (in == null) None
      else
        try {
          val fmt = in.getFormat
          val bytesPerSample = fmt.getSampleSizeInBits / 8
          if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            || (bytesPerSample != 2 && bytesPerSample != 1)) None
          else {
            val raw = in.readAllBytes()
            val n = raw.length / bytesPerSample
            val out = new Array[Float](dim)
            val full = (1 << (fmt.getSampleSizeInBits - 1)).toFloat
            var i = 0
            while (i < n) {
              val v =
                if (bytesPerSample == 1) raw(i).toInt
                else { // respect the container's declared endianness
                  val (lo, hi) =
                    if (fmt.isBigEndian) (raw(2 * i + 1), raw(2 * i))
                    else (raw(2 * i), raw(2 * i + 1))
                  (hi << 8) | (lo & 0xFF)
                }
              val amp = math.min(1.0f, math.abs(v) / full)
              out(math.min(dim - 1, (amp * dim).toInt)) += 1f
              i += 1
            }
            if (n > 0) { var j = 0; while (j < dim) { out(j) /= n; j += 1 } }
            val frames = n / fmt.getChannels
            Some(AudioFacts(fmt.getChannels, fmt.getSampleRate.toInt,
              math.round(frames * 1000.0 / fmt.getSampleRate), out))
          }
        } catch { case _: Exception => None }
        finally in.close()
    }
  }

  /** Derive a demo asset table from any binary-able column (testdata has no
    * real blobs; document texts stand in as payloads). */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("modality"),
      col("text").cast("binary").as("content"),
      struct(lit("application/octet-stream").as("mime"),
        lit(null).cast("integer").as("width"),
        lit(null).cast("integer").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** Partition-wise feature extraction: one decoder per partition, iterator
    * in / iterator out — the batch shape a real codec UDF needs. `image`
    * payloads go through the REAL [[ImageIoDecoder]] (width/height/channels
    * populated, luminance-histogram feature); `audio` payloads through the
    * REAL [[WavDecoder]] (channels/sample-rate/duration, amplitude
    * histogram); video and undecodable payloads take the [[FakeDecoder]]
    * hash path with null metadata. */
  def extractFeatures(assets: DataFrame, dim: Int = 16): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "modality", "content").rdd
      .mapPartitions { rows =>
        // codec state (ImageIO / sound reader caches) initializes per
        // partition, never per row
        rows.map { r =>
          val content = Option(r.getAs[Array[Byte]]("content")).getOrElse(Array.emptyByteArray)
          val modality = r.getAs[String]("modality")
          val id = r.getAs[Long]("asset_id")
          val nb = content.length.toLong
          val row = modality match {
            case "image" => ImageIoDecoder.decode(content, dim).map(f =>
              Row(id, modality, nb, f.width, f.height, f.channels,
                null, null, f.feature.toSeq))
            case "audio" => WavDecoder.decode(content, dim).map(f =>
              Row(id, modality, nb, null, null, f.channels,
                f.sampleRateHz, f.durationMs, f.feature.toSeq))
            case _ => None
          }
          row.getOrElse(Row(id, modality, nb, null, null, null, null, null,
            FakeDecoder.features(content, dim).toSeq))
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame sampling stub: every `stride`-th kilobyte of the payload becomes
    * a "frame" row — the explode/partition shape of real video sampling. */
  def sampleFrames(assets: DataFrame, stride: Int = 4): DataFrame =
    assets.filter(col("modality") === "video")
      .select(col("asset_id"),
        posexplode(split(base64(col("content")), s"(?<=\\G.{${stride * 1024}})")))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_payload_b64")
}
