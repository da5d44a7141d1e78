package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Multimodal-column plumbing for a training-data pipeline: media as an
  * opaque `binary` column + typed metadata, with decode / feature-extract
  * / frame-sample stages as `mapPartitions` over the binary payloads.
  *
  * The IMAGE and AUDIO paths are REAL decodes: synthetic PNGs and
  * RIFF/WAV files (deterministic functions of doc_id) are encoded and
  * decoded through the JDK's `javax.imageio` / `javax.sound.sampled`
  * inside `mapPartitions`, and the emitted statistics (dimensions,
  * band sums, frame counts, sample sums) are oracle-checked against
  * the generators' closed-form parameters. Video codecs are not in the
  * JDK, so that kind keeps a clearly-marked deterministic fake
  * (fixed-stride chunking); the Spark-side plumbing — schema, batch
  * shape, partitioning, the binary column path — is the same either
  * way.
  */
object Multimodal {

  val FeatureDim = 16
  val FrameBytes = 64

  case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
      feature_dim: Int, features: Array[Float], n_frames: Int)
  case class ImageStats(doc_id: Long, width: Int, height: Int,
      channels: Int, sum_r: Long, sum_g: Long, sum_b: Long)
  case class AudioStats(doc_id: Long, n_samples: Int, sample_rate: Int,
      channels: Int, sum_samples: Long)

  /** Deterministic synthetic WAV for `docId`: PCM signed 16-bit LE,
    * mono, 8 kHz, n = id%50+20 samples, sample i =
    * (id*7 + i*13) % 65536 − 32768. The RIFF container is written
    * byte-for-byte (44-byte canonical header) so the DECODER — the
    * JDK's `javax.sound.sampled` — is the only audio library in the
    * loop, and every decoded statistic is a closed-form function of
    * docId the oracle recomputes without one. */
  def syntheticWav(docId: Long): Array[Byte] = {
    val n = (docId % 50 + 20).toInt
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(8000).putInt(8000 * 2) // sample rate, byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort((((docId * 7 + i * 13) % 65536) - 32768).toShort)
      i += 1
    }
    bb.array()
  }

  /** REAL audio decode over the binary column: `javax.sound.sampled`
    * parses the RIFF/WAV container back into an AudioInputStream —
    * format fields come from the decoder, not the generator — and the
    * sample sum is computed from the decoded PCM frames. Distributed
    * via mapPartitions, one decode per row, nothing driver-side. */
  def decodeAudio(media: DataFrame): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = in.getFormat
        val frames = in.getFrameLength.toInt
        val buf = new Array[Byte](frames * fmt.getFrameSize)
        var off = 0
        while (off < buf.length) {
          val r = in.read(buf, off, buf.length - off)
          require(r > 0, s"short WAV read for doc $id")
          off += r
        }
        var sum = 0L
        var i = 0
        while (i < frames) {
          // PCM signed 16-bit little-endian mono
          sum += ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort
          i += 1
        }
        AudioStats(id, frames, fmt.getSampleRate.toInt, fmt.getChannels, sum)
      })
  }

  /** Deterministic synthetic PNG for `docId`: width = id%13+4,
    * height = id%7+3, red = id%256 (constant), green = (id+y)%256
    * (row gradient), blue = (id*31)%256 (constant). Every decoded
    * statistic below is a closed-form function of these, so the DuckDB
    * oracle recomputes them without any image library. */
  def syntheticPng(docId: Long): Array[Byte] = {
    val w = (docId % 13 + 4).toInt
    val h = (docId % 7 + 3).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val r = (docId % 256).toInt
    val b = ((docId * 31) % 256).toInt
    var y = 0
    while (y < h) {
      val g = ((docId + y) % 256).toInt
      var x = 0
      while (x < w) { img.setRGB(x, y, (r << 16) | (g << 8) | b); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode over the binary column: `javax.imageio` parses
    * the PNG bytes back into a raster and the per-band sums come from
    * the decoded pixels — if the codec, the byte plumbing, or the
    * raster indexing were wrong, the sums would not match the oracle's
    * closed-form recomputation. Distributed via mapPartitions, one
    * decode per row, nothing driver-side. */
  def decodeImages(media: DataFrame): Dataset[ImageStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // ImageIO defaults to a DISK-backed stream cache — a temp file
        // per decode call. In-memory streams don't need it, and at one
        // decode per row the file churn dominates the codec cost.
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        val raster = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
        val sums = new Array[Long](bands)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < bands) { sums(c) += raster.getSample(x, y, c); c += 1 }
            x += 1
          }
          y += 1
        }
        ImageStats(id, w, h, bands, sums(0), sums(1), sums(2))
        }
      }
  }

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

    // ---- REAL image decode (round 8): the image-kind rows carry
    // actual PNG bytes (deterministic synthetic images), decoded back
    // through javax.imageio in mapPartitions; width/height/channels and
    // the per-band pixel sums are emitted from the DECODED raster and
    // the oracle recomputes each from the generator's closed form — a
    // hash-exact check on decoded features, not byte statistics.
    "multimodal_image_decode" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 0) // the image-kind rows of asMedia
        .select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false) // see decodeImages
          it.map(id => (id, syntheticPng(id)))
        }
        .toDF("doc_id", "media")
      decodeImages(media).toDF().orderBy(col("doc_id"))
    }),

    // ---- PERCEPTUAL near-dup over the DECODED images: an 8-block
    // row-profile average hash (aHash family) — block b covers rows
    // {y : y*8/h = b}, bit b set iff the block's mean gray (band sum)
    // exceeds the image mean, compared in exact integer cross-products
    // (sum_blk * n_total > sum_total * n_blk — no division, no fp).
    // Same-hash images are near-dup candidates; the grouping is a plain
    // hash groupBy, so at corpus scale this is exact-dedup cost, not
    // pairwise. The hash is computed from the ImageIO-decoded raster
    // (real decode path) and the oracle recomputes it from the
    // generator's closed form — codec, raster indexing, and block
    // arithmetic all land in the hash-exact check.
    "multimodal_phash_neardup" -> ((s, d) => {
      import s.implicits._
      val hashes = Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 0)
        .select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false) // see decodeImages
          it.map { id =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(syntheticPng(id)))
            val raster = img.getRaster
            val (w, h, bands) = (img.getWidth, img.getHeight,
              raster.getNumBands)
            val blkSum = new Array[Long](8)
            val blkN = new Array[Long](8)
            var tot = 0L
            var y = 0
            while (y < h) {
              val blk = y * 8 / h
              var x = 0
              while (x < w) {
                var g = 0L
                var c = 0
                while (c < bands) { g += raster.getSample(x, y, c); c += 1 }
                blkSum(blk) += g; blkN(blk) += 1; tot += g
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            // bits 0-7: row-profile shape; bits 8+: quantized global
            // mean (gray/16 buckets) — shape alone is too coarse on
            // low-texture images, brightness alone on gradients; the
            // concatenation is the discriminating key
            var phash = (tot / n / 16L) << 8
            var b = 0
            while (b < 8) {
              if (blkSum(b) * n > tot * blkN(b)) phash |= (1L << b)
              b += 1
            }
            (id, phash)
          }
        }
        .toDF("doc_id", "phash")
      val groups = hashes.groupBy(col("phash"))
        .agg(count(lit(1)).as("n"))
      hashes.join(broadcast(groups), "phash")
        .select(col("doc_id"), col("phash"),
          (col("n") > 1).cast("int").as("dup"))
        .orderBy(col("doc_id"))
    }),

    // ---- REAL audio decode: the audio-kind rows carry actual RIFF/WAV
    // bytes (deterministic synthetic PCM), parsed back through
    // javax.sound.sampled in mapPartitions; frame count, rate, channel
    // count and the decoded-sample sum all come from the DECODER and
    // the oracle recomputes each from the generator's closed form.
    "multimodal_audio_decode" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 1) // the audio-kind rows of asMedia
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, syntheticWav(id))))
        .toDF("doc_id", "media")
      decodeAudio(media).toDF().orderBy(col("doc_id"))
    }),

    // ---- resize planning for the image rows: the driver-side stage a
    // real pipeline runs BEFORE decode at scale — compute each image's
    // target geometry (fit into 224x224, aspect preserved) so the
    // decode stage can allocate exactly and skip no-op resizes. The
    // source dimensions come from a deterministic fake header parse
    // (real code reads the JPEG/PNG header bytes — header-only, never
    // a full decode); the arithmetic is all integer, so the oracle is
    // bit-exact. Map-side only: no shuffle, no UDF.
    // ---- acoustic fingerprint near-dup over the DECODED samples —
    // the audio twin of multimodal_phash_neardup, completing
    // cross-modality dedup (text: minhash/simhash; embeddings:
    // semdedup; images: phash; audio: this). 8 energy-envelope bits
    // (block mean |sample| vs track mean, exact integer
    // cross-products) concatenated with quantized-mean-energy bits;
    // same-fingerprint tracks group by a plain hash groupBy. Decoded
    // through javax.sound.sampled; the oracle recomputes the
    // fingerprint from the generator's closed form.
    "multimodal_audio_fingerprint" -> ((s, d) => {
      import s.implicits._
      val prints = Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 1) // the audio-kind rows of asMedia
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val bytes = syntheticWav(id)
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = in.getFormat
          val frames = in.getFrameLength.toInt
          val buf = new Array[Byte](frames * fmt.getFrameSize)
          var off = 0
          while (off < buf.length) {
            val r = in.read(buf, off, buf.length - off)
            require(r > 0, s"short WAV read for doc $id")
            off += r
          }
          val blkSum = new Array[Long](8)
          val blkN = new Array[Long](8)
          var tot = 0L
          var i = 0
          while (i < frames) {
            val v = ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort
            val a = math.abs(v.toLong)
            val blk = i * 8 / frames
            blkSum(blk) += a; blkN(blk) += 1; tot += a
            i += 1
          }
          // duration is part of every practical audio fingerprint
          // (two tracks of different length are never dups); the
          // envelope of this synthetic corpus is near-flat, so without
          // the length bits the print degenerates to ~16 buckets
          var fp = (frames.toLong << 24) | ((tot / frames / 256L) << 8)
          var b = 0
          while (b < 8) {
            if (blkSum(b) * frames > tot * blkN(b)) fp |= (1L << b)
            b += 1
          }
          (id, fp)
        })
        .toDF("doc_id", "fingerprint")
      val groups = prints.groupBy(col("fingerprint"))
        .agg(count(lit(1)).as("n"))
      prints.join(broadcast(groups), "fingerprint")
        .select(col("doc_id"), col("fingerprint"),
          (col("n") > 1).cast("int").as("dup"))
        .orderBy(col("doc_id"))
    }),

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
    // every decoded statistic recomputed from the PNG generator's
    // closed form: dims from the modulus, red/blue constant per image,
    // green a row gradient summed over height
    "multimodal_image_decode" ->
      """SELECT doc_id,
           CAST(doc_id % 13 + 4 AS INT) AS width,
           CAST(doc_id % 7 + 3 AS INT) AS height,
           3 AS channels,
           CAST((doc_id % 13 + 4) * (doc_id % 7 + 3) * (doc_id % 256)
             AS BIGINT) AS sum_r,
           CAST((doc_id % 13 + 4) * list_sum(list_transform(
             range(0, doc_id % 7 + 3), y -> (doc_id + y) % 256))
             AS BIGINT) AS sum_g,
           CAST((doc_id % 13 + 4) * (doc_id % 7 + 3) * ((doc_id * 31) % 256)
             AS BIGINT) AS sum_b
         FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id""",
    // w cancels from both sides of every bit inequality (each row
    // contributes w equal-gray pixels), so the SQL works per-row
    "multimodal_phash_neardup" ->
      """WITH imgs AS (
           SELECT doc_id, doc_id % 7 + 3 AS h, doc_id % 256 AS r,
             (doc_id * 31) % 256 AS bb
           FROM documents WHERE doc_id % 3 = 0),
          rws AS (SELECT doc_id, h, r, bb, unnest(range(0, h)) AS y
                  FROM imgs),
          gr AS (SELECT doc_id, CAST(y * 8 // h AS INT) AS blk,
                   r + bb + (doc_id + y) % 256 AS gray
                 FROM rws),
          tot AS (SELECT doc_id, sum(gray) AS sg, count(*) AS n
                  FROM gr GROUP BY doc_id),
          blks AS (SELECT doc_id, blk, sum(gray) AS sb, count(*) AS nb
                   FROM gr GROUP BY doc_id, blk),
          bits AS (SELECT b.doc_id, b.blk
                   FROM blks b JOIN tot t USING (doc_id)
                   WHERE b.sb * t.n > t.sg * b.nb),
          ph AS (SELECT i.doc_id,
                   COALESCE(sum(CAST(1 AS BIGINT) << bits.blk), 0)
                     + ((t.sg // t.n // 16) << 8) AS phash
                 FROM imgs i JOIN tot t USING (doc_id)
                 LEFT JOIN bits ON bits.doc_id = i.doc_id
                 GROUP BY i.doc_id, t.sg, t.n)
         SELECT doc_id, CAST(phash AS BIGINT) AS phash,
           CASE WHEN count(*) OVER (PARTITION BY phash) > 1
             THEN 1 ELSE 0 END AS dup
         FROM ph ORDER BY doc_id""",
    "multimodal_audio_decode" ->
      """SELECT doc_id,
           CAST(doc_id % 50 + 20 AS INT) AS n_samples,
           8000 AS sample_rate,
           1 AS channels,
           CAST(list_sum(list_transform(range(0, doc_id % 50 + 20),
             i -> (doc_id * 7 + i * 13) % 65536 - 32768))
             AS BIGINT) AS sum_samples
         FROM documents WHERE doc_id % 3 = 1 ORDER BY doc_id""",
    // sample i = (id*7 + i*13) % 65536 - 32768; 8 abs-energy blocks
    // via i*8//n, quantized mean energy in the high bits
    "multimodal_audio_fingerprint" ->
      """WITH trk AS (
           SELECT doc_id, CAST(doc_id % 50 + 20 AS BIGINT) AS n
           FROM documents WHERE doc_id % 3 = 1),
          smp AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM trk),
          en AS (SELECT doc_id, n, CAST(i * 8 // n AS INT) AS blk,
                   abs((doc_id * 7 + i * 13) % 65536 - 32768) AS a
                 FROM smp),
          tot AS (SELECT doc_id, sum(a) AS sa, count(*) AS cnt
                  FROM en GROUP BY doc_id),
          blks AS (SELECT doc_id, blk, sum(a) AS sb, count(*) AS nb
                   FROM en GROUP BY doc_id, blk),
          bits AS (SELECT b.doc_id, b.blk
                   FROM blks b JOIN tot t USING (doc_id)
                   WHERE b.sb * t.cnt > t.sa * b.nb),
          fp AS (SELECT k.doc_id,
                   COALESCE(sum(CAST(1 AS BIGINT) << bits.blk), 0)
                     + ((t.sa // t.cnt // 256) << 8)
                     + (k.n << 24) AS fingerprint
                 FROM trk k JOIN tot t USING (doc_id)
                 LEFT JOIN bits ON bits.doc_id = k.doc_id
                 GROUP BY k.doc_id, t.sa, t.cnt, k.n)
         SELECT doc_id, CAST(fingerprint AS BIGINT) AS fingerprint,
           CASE WHEN count(*) OVER (PARTITION BY fingerprint) > 1
             THEN 1 ELSE 0 END AS dup
         FROM fp ORDER BY doc_id""",
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
