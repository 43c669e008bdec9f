package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §7.6): image/audio/video as opaque
  * `binary` columns with a typed metadata struct, plus decode /
  * feature-extract / frame-sample operators.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * environment) behind [[FakeDecoder]], a deterministic hash-based stand-in
  * — but everything Spark-side is real and tested: the asset schema, the
  * partition-wise batch shape (`mapPartitions` over iterators, the Scala
  * analog of `mapInPandas` batches: no per-row JNI/codec setup, one decoder
  * instance per partition), and the feature schema the pipeline carries.
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
    StructField("feature", ArrayType(FloatType))))

  /** Deterministic stand-in for a real codec: "features" are derived from
    * content bytes with a rolling hash, so tests are stable and the real
    * decoder drops in behind the same signature. */
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
    * in / iterator out — the batch shape a real codec UDF needs. */
  def extractFeatures(assets: DataFrame, dim: Int = 16): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "modality", "content").rdd
      .mapPartitions { rows =>
        // real impl: initialize the codec once here, then stream the batch
        rows.map { r =>
          val content = Option(r.getAs[Array[Byte]]("content")).getOrElse(Array.emptyByteArray)
          Row(r.getAs[Long]("asset_id"), r.getAs[String]("modality"),
            content.length.toLong, FakeDecoder.features(content, dim).toSeq)
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
