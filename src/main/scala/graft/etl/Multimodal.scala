package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with
  * typed metadata, processed per-partition in batches.
  *
  * The Spark-side plumbing (schema, partition-parallel batch decode,
  * feature schema) is real; the actual codec call is stubbed behind
  * [[DecodeStub]] because media libraries are not present in this
  * environment — swap `decodeBytes` for a real decoder (JNI/FFmpeg/
  * ImageIO) without touching the pipeline.
  */
object Multimodal {

  /** A media asset row: payload + typed metadata. */
  final case class Asset(asset_id: Long, kind: String, payload: Array[Byte],
                         meta_source: String, meta_chars: Long)

  /** Extracted features; `feature` is a fixed-width embedding-like
    * vector so downstream similarity ops apply unchanged. */
  final case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Long,
                                 checksum: Long, width: Int, height: Int,
                                 feature: Array[Float])

  /** STUB decoder — deterministic fake standing in for an image/audio
    * codec. Real implementations replace only this object. */
  object DecodeStub {
    val FeatureDim = 8
    def decodeBytes(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val n = payload.length
      // fake "dimensions" and a deterministic projection as the feature
      val width = 1 + (n % 64)
      val height = 1 + (n / 64)
      val feature = Array.tabulate(FeatureDim) { d =>
        var acc = 0L
        var i = d
        while (i < n) { acc += (payload(i) & 0xff) * (1 + d); i += FeatureDim }
        (acc % 1000) / 1000.0f
      }
      (width, height, feature)
    }
  }

  /** Wrap the documents table as a media-asset table (payload = utf-8
    * bytes). In production the payload column comes from the lakehouse
    * as-is; only this adapter is test-specific. */
  def assetsFromDocuments(docs: DataFrame): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("asset_id"),
        lit("text/utf-8").as("kind"),
        col("text").cast("binary").as("payload"),
        col("source").as("meta_source"),
        col("n_chars").cast("long").as("meta_chars"))
      .as[Asset]
  }

  /** Batch decode: per-partition iterator (one codec init per partition,
    * the mapInPandas batch shape in Scala form). Narrow — no shuffle;
    * parallelism is the upstream partitioning. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      // (real codecs would initialize native resources here, once)
      it.map { a =>
        val (w, h, feat) = DecodeStub.decodeBytes(a.payload)
        var checksum = 0L
        val lim = math.min(32, a.payload.length)
        var i = 0
        while (i < lim) { checksum += (a.payload(i) & 0xff); i += 1 }
        AssetFeatures(a.asset_id, a.kind, a.payload.length, checksum, w, h, feat)
      }
    }
  }

  /** End-to-end: documents → assets → batch feature extraction. */
  def features(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(assetsFromDocuments(
        spark.read.parquet(s"$dir/documents.parquet")))
      .toDF()
      .select(col("asset_id"), col("kind"), col("n_bytes"), col("checksum"),
        col("width"), col("height"), col("feature"))
      .orderBy("asset_id")
}
