package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Multimodal-column plumbing for a training-data pipeline: media as an
  * opaque `binary` column + typed metadata, with decode / feature-extract
  * / frame-sample stages as `mapPartitions` over the binary payloads.
  *
  * The image/audio codec libraries are not in this container, so the
  * DECODE step is a clearly-marked deterministic fake (byte histogram /
  * fixed-stride chunking); everything Spark-side — schema, batch shape,
  * partitioning, the binary column path — is real and tested.
  */
object Multimodal {

  val FeatureDim = 16
  val FrameBytes = 64

  case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
      feature_dim: Int, features: Array[Float], n_frames: Int)

  /** documents → media table: text bytes stand in for the media payload;
    * kind assigned round-robin (stub for real MIME detection). */
  def asMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("media"))

  /** STUB DECODE: a real implementation would invoke the codec here
    * (JPEG decode, PCM resample, frame extraction). The deterministic
    * fake keeps the distributed plumbing testable: features = normalized
    * 16-bin byte histogram; frames = FrameBytes-sized chunks. */
  def decodeStub(bytes: Array[Byte]): (Array[Float], Int) = {
    val hist = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      hist(((bytes(i) & 0xff) * FeatureDim) / 256) += 1f
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    var j = 0
    while (j < FeatureDim) { hist(j) /= n; j += 1 }
    val frames = (bytes.length + FrameBytes - 1) / FrameBytes
    (hist, frames)
  }

  /** Distributed feature extraction over the binary column. */
  def featurize(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("kind"), col("media")).as[MediaRow]
      .mapPartitions(_.map { r =>
        val (features, frames) = decodeStub(r.media)
        MediaFeatures(r.doc_id, r.kind, r.media.length, FeatureDim,
          features, frames)
      })
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- metadata over the binary column (oracle-checked plumbing)
    "multimodal_meta" -> ((s, d) => {
      asMedia(Tables.documents(s, d))
        .select(col("doc_id"), col("kind"),
          length(col("media")).as("n_bytes"),
          md5(col("media")).as("digest"))
        .orderBy(col("doc_id"))
    }),

    // ---- stub decode + feature extraction (rows-only; shape pinned in
    // MultimodalSpec)
    "multimodal_features" -> ((s, d) => {
      featurize(asMedia(Tables.documents(s, d))).toDF()
        .select(col("doc_id"), col("kind"), col("n_bytes"),
          col("feature_dim"), col("n_frames"))
        .orderBy(col("doc_id"))
    }),

    // ---- resize planning for the image rows: the driver-side stage a
    // real pipeline runs BEFORE decode at scale — compute each image's
    // target geometry (fit into 224x224, aspect preserved) so the
    // decode stage can allocate exactly and skip no-op resizes. The
    // source dimensions come from a deterministic fake header parse
    // (real code reads the JPEG/PNG header bytes — header-only, never
    // a full decode); the arithmetic is all integer, so the oracle is
    // bit-exact. Map-side only: no shuffle, no UDF.
    "multimodal_resize_plan" -> ((s, d) => {
      val target = 224
      val media = asMedia(Tables.documents(s, d))
        .filter(col("kind") === "image")
        .withColumn("n_bytes", length(col("media")))
      val w = (col("n_bytes") % 960 + 64).cast("long")
      val h = ((col("n_bytes") * 7) % 960 + 64).cast("long")
      val longSide = greatest(w, h)
      media
        .withColumn("src_w", w).withColumn("src_h", h)
        .withColumn("out_w", // floor: `/` is true division on longs
          greatest(floor(col("src_w") * target / longSide), lit(1L))
            .cast("long"))
        .withColumn("out_h",
          greatest(floor(col("src_h") * target / longSide), lit(1L))
            .cast("long"))
        .withColumn("no_op",
          (col("src_w") <= target && col("src_h") <= target).cast("int"))
        .select(col("doc_id"), col("src_w"), col("src_h"),
          col("out_w"), col("out_h"), col("no_op"))
        .orderBy(col("doc_id"))
    }),

    // ---- frame sampling: explode every 4th FrameBytes-sized chunk of
    // the binary payload into its own row (the video-frame / audio-
    // window sampling stage). Pure codegen'd exprs — sequence + binary
    // substring — so the fan-out never materializes unsampled frames;
    // per-frame md5 digests make the byte-exactness oracle-checkable.
    "multimodal_frame_sample" -> ((s, d) => {
      val media = asMedia(Tables.documents(s, d))
        .filter(length(col("media")) > 0)
        .withColumn("n_frames",
          ceil(length(col("media")) / lit(FrameBytes.toDouble)).cast("int"))
      media
        .withColumn("frame_idx",
          explode(sequence(lit(0), col("n_frames") - 1, lit(4))))
        .withColumn("frame",
          expr(s"substring(media, frame_idx * $FrameBytes + 1, $FrameBytes)"))
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame")).as("n_bytes"), md5(col("frame")).as("digest"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }))

  def oracleSql: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             ELSE 'video' END AS kind,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           md5(text) AS digest
         FROM documents ORDER BY doc_id""",
    "multimodal_features" ->
      """SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             ELSE 'video' END AS kind,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           16 AS feature_dim,
           CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) AS n_frames
         FROM documents ORDER BY doc_id""",
    "multimodal_resize_plan" ->
      """SELECT doc_id, src_w, src_h,
           CAST(greatest(floor(src_w * 224.0 / greatest(src_w, src_h)), 1)
             AS BIGINT) AS out_w,
           CAST(greatest(floor(src_h * 224.0 / greatest(src_w, src_h)), 1)
             AS BIGINT) AS out_h,
           CAST(src_w <= 224 AND src_h <= 224 AS INT) AS no_op
         FROM (
           SELECT doc_id,
             CAST(octet_length(encode(text)) % 960 + 64 AS BIGINT) AS src_w,
             CAST((octet_length(encode(text)) * 7) % 960 + 64 AS BIGINT) AS src_h
           FROM documents WHERE doc_id % 3 = 0) t
         ORDER BY doc_id""",
    // text is ASCII (verified octet_length == length), so DuckDB's
    // character substr equals the engine's byte slice
    "multimodal_frame_sample" ->
      """SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(length(substr(text, frame_idx * 64 + 1, 64)) AS INT)
             AS n_bytes,
           md5(substr(text, frame_idx * 64 + 1, 64)) AS digest
         FROM (
           SELECT doc_id, text,
             unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT), 4))
               AS frame_idx
           FROM documents WHERE length(text) > 0) t
         ORDER BY doc_id, frame_idx""")
}
