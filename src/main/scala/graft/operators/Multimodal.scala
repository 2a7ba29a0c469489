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

  /** Frame sampling over a binary payload: treat the payload as a
    * sequence of fixed-size `frameBytes` frames and keep every
    * `every`-th one (video keyframe-sampling shape). Pure built-ins —
    * `sequence` sized exactly per row (never a static cap), `explode`,
    * binary `substr` — so the whole thing stays in whole-stage codegen
    * and fans out only the frames actually kept. Output: (idCol,
    * frame_no, frame) with `frame_no` the 0-based frame index and the
    * final frame possibly shorter than `frameBytes`.
    */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
                  frameBytes: Int, every: Int): DataFrame = {
    require(frameBytes > 0 && every > 0, "frameBytes and every must be positive")
    df.filter(length(col(payloadCol)) > 0)
      .select(col(idCol), col(payloadCol),
        explode(sequence(lit(0L),
          floor((length(col(payloadCol)) - 1) / frameBytes).cast("long"),
          lit(every.toLong))).as("frame_no"))
      .select(col(idCol), col("frame_no"),
        col(payloadCol).substr(
          (col("frame_no") * frameBytes + 1).cast("int"),
          lit(frameBytes)).as("frame"))
  }

  /** Cross-payload duplicated-frame detection — the multimodal analog of
    * [[Dedup.duplicateSpans]]: a frame digest shared by ≥2 distinct
    * payloads marks reused footage (intros, watermarked stock clips, the
    * classic video-dedup signal). Input is [[frameSample]]'s output
    * (id, frame_no, frame); the digest groupBy is the only shuffle and
    * moves 16-byte digests, never frame bytes. Returns one row per
    * duplicated digest: (frame_md5, n_docs, n_frames, first_doc). */
  def duplicateFrames(frames: DataFrame, idCol: String): DataFrame =
    frames
      .select(col(idCol).as("id"), md5(col("frame")).as("frame_md5"))
      .groupBy("frame_md5")
      .agg(countDistinct(col("id")).as("n_docs"),
        count(lit(1)).as("n_frames"),
        min(col("id")).as("first_doc"))
      .filter(col("n_docs") >= 2)

  /** Audio↔video stream alignment: attach to each audio chunk the most
    * recent video frame at or before the chunk's presentation timestamp,
    * per media id — the point-in-time join a multimodal training pair
    * builder runs to caption frames with the audio that accompanies them
    * (video ~25 fps and audio ~43 chunks/s tick at different rates, so
    * the match is as-of, not equality). Thin composition over
    * [[graft.operators.AsofJoin]]: one shuffle on the media id, linear
    * in |frames|+|chunks|, no per-id range scan — the posture that holds
    * when one popular video carries millions of chunks.
    *
    * `frames` must carry (idCol, frame_no, frame_pts); `chunks`
    * (idCol, chunk_no, chunk_pts). Chunks that precede the first frame
    * keep null frame columns (left semantics), so A/V leaders are
    * visible to the caller rather than silently dropped. */
  def avSync(frames: DataFrame, chunks: DataFrame, idCol: String): DataFrame =
    AsofJoin.asof(
      chunks, frames.select(col(idCol), col("frame_no"), col("frame_pts")),
      keys = Seq(idCol), leftTs = "chunk_pts", rightTs = "frame_pts")

  /** STUB resize: deterministic byte-decimation of a decoded frame to
    * `targetBytes` (keeps every ceil(n/target)-th byte). A real
    * implementation would do pixel-space interpolation here; the seam —
    * binary in, smaller binary out, usable inside a select over sampled
    * frames — is what the pipeline relies on. */
  def resizeStub(frame: Array[Byte], targetBytes: Int): Array[Byte] = {
    require(targetBytes > 0)
    if (frame.length <= targetBytes) frame
    else {
      val step = math.ceil(frame.length.toDouble / targetBytes).toInt
      val out = new Array[Byte]((frame.length + step - 1) / step)
      var i = 0
      while (i < out.length) { out(i) = frame(i * step); i += 1 }
      out
    }
  }

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

  /** Interleaved multimodal sequence packing: merge a media item's text
    * chunks and sampled image frames into ONE presentation-time-ordered
    * token stream and cut it into fixed-`budget` training sequences —
    * the layout an interleaved image-text model (Flamingo/MM1-style
    * corpora, public) trains on. Each image costs a fixed `imageTokens`
    * (the vision-encoder patch count); text chunks carry their own
    * n_tokens. Sequence assignment is the same
    * running-token-count-before-item ÷ budget device as the t16 packer,
    * so items can straddle a boundary (production truncates/pads inside
    * the sequence writer; the assignment is the distributed part).
    *
    * Order within a media id is (pts, kind, item_no) — total, so packing
    * is stable across partitioning; at equal pts "image" sorts before
    * "text" (the frame is on screen when its caption starts). One
    * shuffle: the per-id window. `frames` must carry (idCol, frame_no,
    * frame_pts); `chunks` (idCol, chunk_no, chunk_pts, n_tokens).
    * Returns (idCol, kind, item_no, pts, n_tokens, seq_no). */
  def interleavedPack(frames: DataFrame, chunks: DataFrame, idCol: String,
                      imageTokens: Int, budget: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(imageTokens > 0 && budget > 0, "imageTokens and budget must be positive")
    val f = frames.select(col(idCol), lit("image").as("kind"),
      col("frame_no").cast("long").as("item_no"),
      col("frame_pts").cast("long").as("pts"),
      lit(imageTokens.toLong).as("n_tokens"))
    val c = chunks.select(col(idCol), lit("text").as("kind"),
      col("chunk_no").cast("long").as("item_no"),
      col("chunk_pts").cast("long").as("pts"),
      col("n_tokens").cast("long").as("n_tokens"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("pts"), col("kind"), col("item_no"))
      .rowsBetween(Window.unboundedPreceding, -1)
    f.unionByName(c)
      .withColumn("seq_no",
        (coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget).cast("long"))
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
