package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata
  * alongside; decode/feature-extraction runs as a partition-batched
  * function over the binary column (the Scala analogue of `mapInPandas`:
  * one iterator per partition, vectorizable per batch).
  *
  * The actual codec step is a STUB — media libraries are not available in
  * this environment — replaced by a deterministic fake that hashes bytes
  * into a fixed-size float feature vector. Everything around it (schema,
  * binary handling, partition batching, feature shape) is real and
  * tested, so swapping in a real decoder changes one function.
  */
object Multimodal {

  /** Attach a binary payload + metadata struct to a text-carrying table
    * (stand-in for reading image/audio bytes from parquet/object store). */
  def withBinaryPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        length(encode(col(textCol), "UTF-8")).as("n_bytes"),
        md5(col(textCol)).as("checksum"),
        lit("text/plain").as("mime")).as("meta"))

  final case class MediaRow(id: Long, payload: Array[Byte])
  final case class MediaFeatures(id: Long, n_bytes: Long, features: Array[Float])

  /** STUB decoder: deterministic fake features from payload bytes.
    * Real implementation would decode the image/audio batch here. */
  def decodeStub(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var j = 0
    while (j < dim) {
      val z = h ^ (h >>> 33) ^ (j.toLong * 0x9E3779B97F4A7C15L)
      out(j) = ((z % 1000L).toFloat) / 1000.0f
      j += 1
    }
    out
  }

  /** Partition-batched feature extraction over the binary column —
    * the `mapInPandas`-shaped seam where a real decoder plugs in. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
                      dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map(r => MediaFeatures(r.id, r.payload.length.toLong,
        decodeStub(r.payload, dim)))
    }
  }
}
