package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Q

/** Multimodal-column plumbing: media (image/audio/video) modeled as
  * opaque `binary` columns with typed metadata structs, plus
  * decode / feature-extract / frame-sample stages.
  *
  * The decode step is a REAL image decode: deterministic grayscale
  * PNGs are synthesized per document with `java.awt.image.
  * BufferedImage` + `javax.imageio.ImageIO` (JDK-only — no external
  * codecs needed), carried as opaque `binary` columns, and decoded
  * back with `ImageIO.read` inside `mapPartitions` — the real Spark
  * shape of a 100 TB media pipeline: binary columns through parquet,
  * per-partition batching so a codec/model initializes once per task
  * (the Scala analog of `mapInPandas` batching), bounded memory per
  * task, and schema'd struct outputs. Because the pixel generator is
  * closed-form in `doc_id`, the DuckDB oracle recomputes every decoded
  * feature independently — the decode path is verified end-to-end
  * through real PNG bytes.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache: every read/write
  // routes through a created-then-deleted temp file, which serializes
  // 32 decode threads behind filesystem latency (measured: same-code
  // image-dedup runs varied 8-24 s run to run). Memory-backed streams
  // take the filesystem out of the decode hot path entirely. Loaded
  // with the object, so executors referencing any kernel get it too.
  javax.imageio.ImageIO.setUseCache(false)

  /** typed per-row media features (what the decoder emits). */
  final case class MediaFeatures(
      doc_id: Long, width: Int, height: Int, channels: Int, mean_byte: Double)

  /** FIXTURE side: a deterministic grayscale PNG for a document.
    * Dimensions and pixels are closed-form in `doc_id` (so an oracle
    * can recompute them without decoding): w = 8 + id%16,
    * h = 8 + (id·7)%16, pixel(x,y) = (id·31 + x·7 + y·13) % 256 in all
    * three RGB channels. PNG is lossless, so the decode side recovers
    * these values exactly. */
  private[multimodal] def pngFor(docId: Long): Array[Byte] = {
    val w = 8 + (docId % 16).toInt
    val h = 8 + ((docId * 7) % 16).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((docId * 31 + x * 7 + y * 13) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL decoder: `ImageIO.read` over the PNG bytes; emits the
    * decoded dimensions, channel count from the decoded color model,
    * and the exact mean gray value (integer pixel sum / pixel count —
    * the channels are equal by construction, so the gray mean IS the
    * per-sample mean). */
  private[multimodal] def decodeImage(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    // ImageIO.read returns null (no exception) for undecodable bytes —
    // extractFeatures accepts ANY (doc_id, blob) frame, so fail with
    // the doc id instead of an opaque executor-side NPE
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null,
      s"undecodable image payload for doc $docId (${bytes.length} bytes)")
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        sum += (img.getRGB(x, y) & 0xff)
        x += 1
      }
      y += 1
    }
    MediaFeatures(docId, w, h, img.getColorModel.getNumComponents,
      sum.toDouble / (w.toLong * h))
  }

  /** documents with an attached opaque binary payload + metadata struct
    * (mime/byte size) — the canonical multimodal column layout. */
  def withBlob(df: DataFrame): DataFrame =
    df.withColumn("blob", encode(col("text"), "UTF-8"))
      .withColumn("media_meta", struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col("blob")).as("n_bytes")))

  /** documents with an attached REAL image payload: the deterministic
    * per-doc PNG, encoded in a mapPartitions stage (codec init once per
    * partition — here ImageIO's writer registry lookup). */
  def withImageBlob(spark: SparkSession, df: DataFrame,
      spread: Boolean = true): DataFrame = {
    import spark.implicits._
    // repartition the 8-byte ids BEFORE generating blobs (guide §2.5,
    // input skew): the single-row-group parquet fixture is ONE input
    // split, which would fuse PNG encode + every downstream decode
    // into a single task — the dominant CPU kernel of the multimodal
    // family serialized on one core. Shuffling ids costs nothing; on
    // a real multi-split corpus the exchange is a no-op cost.
    // width pinned (cores-derived): an unpinned repartition(col) is an
    // AQE-coalescible exchange that folds back to one partition at
    // fixture scale — see GraftSession.spreadWidth.
    // `spread = false` opts out (round-19 ADVICE): STREAMING consumers
    // decode small per-micro-batch arrival slices where a 32-wide
    // exchange + 32-task scheduling per batch was never priced; the
    // A/B evidence for the pin is batch/fixture-scale only.
    val ids = df.select(col("doc_id"))
    val src =
      if (spread) ids.repartition(graft.GraftSession.spreadWidth(spark), col("doc_id"))
      else ids
    src.as[Long]
      .mapPartitions(it => it.map(id => (id, pngFor(id))))
      .toDF("doc_id", "blob")
  }

  /** decode/feature-extract over the binary column, one decoder init
    * per partition. */
  def extractFeatures(spark: SparkSession, df: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real pipeline: initialize codec/model ONCE here, then stream
        it.map { case (id, bytes) => decodeImage(id, bytes) }
      }
  }

  /** Metadata projection over the binary column — fully SQL-expressible
    * (byte length + sha256 content address), so it gets a real oracle. */
  val meta: Q = Q(
    "multimodal_meta",
    (s, dir) => {
      import s.implicits._
      withBlob(Tables.load(s, dir, "documents"))
        .select(
          $"doc_id",
          $"media_meta.mime".as("mime"),
          $"media_meta.n_bytes".as("n_bytes"),
          sha2($"blob", 256).as("content_sha256")
        )
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             'application/octet-stream' AS mime,
             CAST(OCTET_LENGTH(encode(text)) AS INT) AS n_bytes,
             sha256(text) AS content_sha256
      FROM documents
      ORDER BY doc_id
    """)
  )

  /** REAL image decode + feature extraction: per-doc deterministic PNG
    * bytes → `ImageIO.read` in per-partition mapPartitions → typed
    * features. The pixel generator is closed-form in doc_id, so the
    * oracle recomputes width/height/mean-gray WITHOUT decoding — a
    * value match proves the encode→binary-column→decode path is
    * lossless and the decoder reads what was written. The mean is an
    * exact integer pixel sum divided once by the pixel count; both
    * engines perform the identical IEEE division. */
  val features: Q = Q(
    "multimodal_features",
    (s, dir) => {
      import s.implicits._
      extractFeatures(s, withImageBlob(s, Tables.load(s, dir, "documents")))
        .toDF()
        .orderBy($"doc_id")
    },
    Some("""
      WITH dims AS (
        SELECT doc_id,
               CAST(8 + doc_id % 16 AS INT) AS width,
               CAST(8 + (doc_id * 7) % 16 AS INT) AS height
        FROM documents
      )
      SELECT doc_id, width, height, CAST(3 AS INT) AS channels,
             CAST(list_aggregate(
                    list_transform(range(0, width * height),
                      i -> (doc_id * 31 + (i % width) * 7 + (i // width) * 13) % 256),
                    'sum') AS DOUBLE) / (width * height) AS mean_byte
      FROM dims
      ORDER BY doc_id
    """)
  )

  /** Frame sampling: fixed-stride byte windows standing in for video
    * frame extraction — the explode/stride shape of a frame pipeline.
    * ASCII fixture ⇒ the byte windows equal char windows, so frame
    * hashes get a REAL DuckDB oracle. */
  val frames: Q = Q(
    "multimodal_frames",
    (s, dir) => {
      import s.implicits._
      withBlob(Tables.load(s, dir, "documents"))
        .select($"doc_id", $"blob",
          explode(expr("sequence(0, 3)")).as("frame_idx"))
        .filter($"frame_idx" * 32 + 32 <= octet_length($"blob"))
        .select($"doc_id", $"frame_idx",
          md5(expr("substring(blob, frame_idx * 32 + 1, 32)")).as("frame_md5"))
        .orderBy($"doc_id", $"frame_idx")
    },
    Some("""
      WITH f AS (SELECT doc_id, text, unnest(range(0, 4)) AS frame_idx FROM documents)
      SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
             md5(substring(text, CAST(frame_idx*32 + 1 AS INT), 32)) AS frame_md5
      FROM f
      WHERE frame_idx*32 + 32 <= octet_length(encode(text))
      ORDER BY doc_id, frame_idx
    """)
  )

  final case class ResizedThumb(
      doc_id: Long, width: Int, height: Int, thumb: Seq[Int])

  /** REAL image resize: decode the PNG with ImageIO, then 4×4
    * integer block-average downscale over the decoded gray channel
    * (output pixel (i,j) averages the source block
    * [⌊i·w/4⌋, ⌊(i+1)·w/4⌋) × [⌊j·h/4⌋, ⌊(j+1)·h/4⌋), floor-div mean).
    * Deliberately NOT Graphics2D scaling — its filter kernels are
    * implementation-defined, while block averaging is exact integer
    * arithmetic, which is what lets the decode+resize PATH get a full
    * DuckDB oracle via the fixture's pixel formula (the
    * [[features]] discipline: the operator decodes real bytes; the
    * oracle recomputes from the generator; equality proves the real
    * path end-to-end). One codec init per partition, same as decode. */
  private[multimodal] def resizeThumb(docId: Long, bytes: Array[Byte]): ResizedThumb = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null,
      s"undecodable image payload for doc $docId (${bytes.length} bytes)")
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](16)
    var j = 0
    while (j < 4) {
      val y0 = j * h / 4; val y1 = (j + 1) * h / 4
      var i = 0
      while (i < 4) {
        val x0 = i * w / 4; val x1 = (i + 1) * w / 4
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += (img.getRGB(x, y) & 0xff); x += 1 }
          y += 1
        }
        out(j * 4 + i) = (sum / ((y1 - y0).toLong * (x1 - x0))).toInt
        i += 1
      }
      j += 1
    }
    ResizedThumb(docId, w, h, out.toSeq)
  }

  val resize: Q = Q(
    "multimodal_resize",
    (s, dir) => {
      import s.implicits._
      withImageBlob(s, Tables.load(s, dir, "documents"))
        .select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
        .mapPartitions(it => it.map { case (id, bytes) => resizeThumb(id, bytes) })
        .toDF()
        // q20_array_agg convention: ship the raster as a comma-joined
        // string — the driver's pandas compare cannot sort/hash raw
        // ARRAY cells. Order is the fixed 16-element row-major raster,
        // already deterministic, so stringify loses nothing.
        .withColumn("thumb", expr("array_join(cast(thumb AS array<string>), ',')"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH dims AS (
        SELECT doc_id,
               CAST(8 + doc_id % 16 AS INT) AS width,
               CAST(8 + (doc_id * 7) % 16 AS INT) AS height
        FROM documents
      )
      SELECT doc_id, width, height,
             array_to_string(list_transform(range(0, 16), k ->
               CAST(list_aggregate(
                      flatten(list_transform(
                        range((k // 4) * height // 4, ((k // 4) + 1) * height // 4),
                        y -> list_transform(
                          range((k % 4) * width // 4, ((k % 4) + 1) * width // 4),
                          x -> (doc_id * 31 + x * 7 + y * 13) % 256))),
                      'sum')
                    // ((((k // 4) + 1) * height // 4 - (k // 4) * height // 4)
                       * (((k % 4) + 1) * width // 4 - (k % 4) * width // 4))
                 AS INT)), ',') AS thumb
      FROM dims
      ORDER BY doc_id
    """)
  )

  /** 24-bit dHash over the 4×4 block-average raster: 12 horizontal
    * bits (block < right neighbor, row-major, MSB first) then 12
    * vertical bits (block < below neighbor). Pure integer compares on
    * the exact block means — deterministic, oracle-recomputable. */
  private[multimodal] def phashOf(t: Seq[Int]): Long = {
    var h = 0L
    var k = 0
    while (k < 12) {
      val (j, i) = (k / 3, k % 3)
      if (t(j * 4 + i) < t(j * 4 + i + 1)) h |= 1L << (23 - k)
      k += 1
    }
    k = 0
    while (k < 12) {
      val (j, i) = (k / 4, k % 4)
      if (t(j * 4 + i) < t((j + 1) * 4 + i)) h |= 1L << (11 - k)
      k += 1
    }
    h
  }

  /** PERCEPTUAL image hash — the image-dedup primitive: decode the
    * real PNG, block-average to the 4×4 raster ([[resizeThumb]]'s
    * exact integer path), then a 24-bit difference hash (gradient
    * signs, [[phashOf]]). Two re-encodes/resizes of the same image
    * agree on gradient signs long after byte-level hashes diverge, so
    * image near-dup at corpus scale is a HAMMING-ball join on this
    * column — the [[graft.operators.Dedup]] simhash machinery
    * (pigeonhole band buckets, XOR + bit_count verify) applies to it
    * verbatim; this op materializes the hash column that index feeds
    * on. One codec init per partition, same as decode/resize.
    *
    * Oracle: the generator is closed-form in doc_id, so DuckDB
    * recomputes block means AND both bit planes independently and the
    * decode→resize→hash path is verified end-to-end through real PNG
    * bytes. */
  /** decode → 4×4 block means → 24-bit dHash over any frame carrying a
    * doc_id (images attach deterministically); works on BATCH and
    * STREAMING frames alike (stateless mapPartitions kernel, codec
    * init once per partition). Returns (doc_id, width, height, phash). */
  def phashFrame(spark: SparkSession, df: DataFrame,
      spread: Boolean = true): DataFrame = {
    import spark.implicits._
    withImageBlob(spark, df, spread)
      .select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val r = resizeThumb(id, bytes)
        (r.doc_id, r.width, r.height, phashOf(r.thumb))
      })
      .toDF("doc_id", "width", "height", "phash")
  }

  val phash: Q = Q(
    "multimodal_phash",
    (s, dir) => {
      import s.implicits._
      phashFrame(s, Tables.load(s, dir, "documents"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH dims AS (
        SELECT doc_id,
               CAST(8 + doc_id % 16 AS INT) AS width,
               CAST(8 + (doc_id * 7) % 16 AS INT) AS height
        FROM documents
      ),
      t AS (
        SELECT doc_id, width, height,
               list_transform(range(0, 16), k ->
                 CAST(list_aggregate(
                        flatten(list_transform(
                          range((k // 4) * height // 4, ((k // 4) + 1) * height // 4),
                          y -> list_transform(
                            range((k % 4) * width // 4, ((k % 4) + 1) * width // 4),
                            x -> (doc_id * 31 + x * 7 + y * 13) % 256))),
                        'sum')
                      // ((((k // 4) + 1) * height // 4 - (k // 4) * height // 4)
                         * (((k % 4) + 1) * width // 4 - (k % 4) * width // 4))
                   AS INT)) AS thumb
        FROM dims
      )
      SELECT doc_id, width, height,
             CAST(list_aggregate(list_transform(range(0, 12), k ->
                    CASE WHEN thumb[CAST((k // 3) * 4 + (k % 3) AS INT) + 1]
                            < thumb[CAST((k // 3) * 4 + (k % 3) AS INT) + 2]
                         THEN CAST(1 AS BIGINT) << CAST(23 - k AS INT)
                         ELSE CAST(0 AS BIGINT) END), 'sum')
                + list_aggregate(list_transform(range(0, 12), k ->
                    CASE WHEN thumb[CAST((k // 4) * 4 + (k % 4) AS INT) + 1]
                            < thumb[CAST((k // 4) * 4 + (k % 4) AS INT) + 5]
                         THEN CAST(1 AS BIGINT) << CAST(11 - k AS INT)
                         ELSE CAST(0 AS BIGINT) END), 'sum')
               AS BIGINT) AS phash
      FROM t
      ORDER BY doc_id
    """)
  )

  /** FIXTURE side, audio: deterministic 16-bit little-endian PCM for a
    * document — the payload body of a WAV. Sample count and values are
    * closed-form in `doc_id` (n = 256 + id%512,
    * s(i) = (id·2654435761 + i·40503) mod 2¹⁶ − 2¹⁵) so the oracle
    * recomputes every decoded feature without touching bytes. */
  private[multimodal] def pcmFor(docId: Long): Array[Byte] = {
    val n = (256 + docId % 512).toInt
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (((docId * 2654435761L + i.toLong * 40503L) % 65536L) - 32768L).toShort
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** typed per-row audio features (what the decoder emits). */
  final case class AudioFeatures(
      doc_id: Long, n_samples: Long, energy: Long, zero_crossings: Long)

  /** AUDIO feature extraction over opaque PCM binary columns: sample
    * count, exact energy (Σ s²), RMS in micro-units, and the
    * zero-crossing count — the standard cheap audio-quality /
    * silence-detection features, computed by a REAL byte-level decode
    * (LE16 parse) in a `mapPartitions` kernel with one buffer reused
    * per task. For compressed codecs (MP3/FLAC/Opus, not in this
    * container) the parse step swaps for a codec call behind the same
    * kernel — the Spark plumbing (binary through parquet, batched
    * per-partition decode, schema'd struct out) is the part that
    * carries to 100 TB and is what this op exercises end-to-end;
    * rms_micro's sqrt/divide are IEEE correctly-rounded, so the oracle
    * is exact with integer everything-else. */
  val audioFeatures: Q = Q(
    "multimodal_audio_features",
    (s, dir) => {
      import s.implicits._
      val pcm = Tables.load(s, dir, "documents")
        .select($"doc_id").as[Long]
        .mapPartitions(_.map(id => (id, pcmFor(id))))
        .toDF("doc_id", "pcm")
      pcm.as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val n = bytes.length / 2
          var energy = 0L
          var zc = 0L
          var prev = 0
          var i = 0
          while (i < n) {
            val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
            energy += v.toLong * v.toLong
            if (i > 0 && ((v < 0) != (prev < 0))) zc += 1
            prev = v
            i += 1
          }
          AudioFeatures(id, n.toLong, energy, zc)
        })
        .toDF()
        .withColumn("rms_micro",
          round(sqrt($"energy".cast("double") / $"n_samples".cast("double")) * 1e6)
            .cast("long"))
        .select($"doc_id", $"n_samples", $"energy", $"rms_micro", $"zero_crossings")
        .orderBy($"doc_id")
    },
    Some("""
      WITH d AS (
        SELECT doc_id, 256 + doc_id % 512 AS n FROM documents
      ),
      s AS (
        SELECT doc_id, i,
               ((doc_id * 2654435761 + i * 40503) % 65536) - 32768 AS v
        FROM (SELECT doc_id, unnest(range(n)) AS i FROM d)
      ),
      w AS (
        SELECT doc_id, v,
               LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM s
      ),
      f AS (
        SELECT doc_id, COUNT(*) AS n_samples, SUM(v * v) AS energy,
               SUM(CASE WHEN prev IS NOT NULL AND ((v < 0) <> (prev < 0))
                        THEN 1 ELSE 0 END) AS zero_crossings
        FROM w GROUP BY doc_id
      )
      SELECT doc_id, CAST(n_samples AS BIGINT) AS n_samples,
             CAST(energy AS BIGINT) AS energy,
             CAST(ROUND(sqrt(CAST(energy AS DOUBLE) / CAST(n_samples AS DOUBLE)) * 1e6) AS BIGINT) AS rms_micro,
             CAST(zero_crossings AS BIGINT) AS zero_crossings
      FROM f
      ORDER BY doc_id
    """)
  )

  /** FIXTURE side: the clip VIEW for audio dedup — every document's PCM
    * twice, clip 2·id as recorded and clip 2·id+1 re-encoded at half
    * volume (each sample floor(v/2) — an arithmetic right-shift at the
    * sample level, the cheapest honest stand-in for "same audio,
    * different mastering"). */
  private[multimodal] def pcmVariant(docId: Long, halved: Boolean): Array[Byte] = {
    val base = pcmFor(docId)
    if (!halved) base
    else {
      val out = new Array[Byte](base.length)
      var i = 0
      while (i < base.length / 2) {
        val v = ((base(2 * i) & 0xff) | (base(2 * i + 1) << 8)).toShort.toInt
        val h = v >> 1
        out(2 * i) = (h & 0xff).toByte
        out(2 * i + 1) = ((h >> 8) & 0xff).toByte
        i += 1
      }
      out
    }
  }

  final case class AudioFp(
      clip_id: Long, doc_id: Long, signs: String, n_samples: Long, energy: Long)

  /** AUDIO FINGERPRINT DEDUP: volume-invariant content identity over
    * the audio modality — the [[graft.operators.Dedup]] family's
    * missing third modality beside text hashes and the image dHash.
    * The fingerprint is the SIGN SEQUENCE of the decoded samples
    * (md5'd): amplitude scaling by any positive factor — including the
    * re-encode's floor(v/2), since v<0 ⇔ floor(v/2)<0 — preserves
    * every sign, so a clip and its re-mastered copy fingerprint
    * identically while their RMS differ (the emitted min/max rms audit
    * shows exactly that). Real codec features (chromaprint-style) swap
    * in behind the same kernel; the sign sequence is the deterministic
    * stand-in that keeps the operator fully oracle-able.
    *
    * Scale shape: decode + fingerprint is one stateless byte pass per
    * clip inside `mapPartitions` (codec state per task, the
    * [[audioFeatures]] kernel discipline); the ONLY exchange is the
    * hash aggregation on the 16-byte fingerprint — [[graft.operators.Dedup]]
    * `dedup_exact`'s shape applied to a derived modality column. No
    * pairwise anything: identical-content groups form in one shuffle
    * at any corpus size. */
  val audioFpDedup: Q = Q(
    "dedup_audio_fp",
    (s, dir) => {
      import s.implicits._
      val fps = Tables.load(s, dir, "documents")
        .select($"doc_id").as[Long]
        .mapPartitions(_.flatMap(id => Iterator((2 * id, id, false), (2 * id + 1, id, true))))
        .mapPartitions(_.map { case (cid, id, halved) =>
          val bytes = pcmVariant(id, halved)
          val n = bytes.length / 2
          val sb = new java.lang.StringBuilder(n)
          var energy = 0L
          var i = 0
          while (i < n) {
            val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
            energy += v.toLong * v.toLong
            sb.append(if (v < 0) '1' else '0')
            i += 1
          }
          AudioFp(cid, id, sb.toString, n.toLong, energy)
        })
        .toDF()
      fps
        .withColumn("fp", md5($"signs"))
        .withColumn("rms_micro",
          round(sqrt($"energy".cast("double") / $"n_samples".cast("double")) * 1e6)
            .cast("long"))
        .groupBy($"fp")
        .agg(count(lit(1)).as("n_clips"),
          min($"clip_id").as("canon_clip"),
          array_sort(collect_list($"clip_id")).as("cl"),
          min($"rms_micro").as("rms_micro_min"),
          max($"rms_micro").as("rms_micro_max"))
        .select($"fp", $"n_clips", $"canon_clip",
          expr("array_join(transform(cl, x -> cast(x as string)), ',')").as("clip_ids"),
          $"rms_micro_min", $"rms_micro_max")
        .orderBy($"canon_clip")
    },
    Some("""
      WITH d AS (
        SELECT doc_id, 256 + doc_id % 512 AS n FROM documents
      ),
      c AS (
        SELECT doc_id, 2 * doc_id + g AS clip_id, g, n
        FROM d, range(2) t(g)
      ),
      s AS (
        SELECT clip_id, i,
               CASE WHEN g = 1
                    THEN CAST(floor((((doc_id * 2654435761 + i * 40503) % 65536) - 32768) / 2.0) AS BIGINT)
                    ELSE ((doc_id * 2654435761 + i * 40503) % 65536) - 32768
               END AS v
        FROM (SELECT clip_id, doc_id, g, unnest(range(n)) AS i FROM c)
      ),
      f AS (
        SELECT clip_id,
               md5(string_agg(CASE WHEN v < 0 THEN '1' ELSE '0' END, '' ORDER BY i)) AS fp,
               COUNT(*) AS n_samples, SUM(v * v) AS energy
        FROM s GROUP BY clip_id
      ),
      r AS (
        SELECT clip_id, fp,
               CAST(ROUND(sqrt(CAST(energy AS DOUBLE) / CAST(n_samples AS DOUBLE)) * 1e6) AS BIGINT) AS rms
        FROM f
      )
      SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_clips,
             MIN(clip_id) AS canon_clip,
             string_agg(CAST(clip_id AS VARCHAR), ',' ORDER BY clip_id) AS clip_ids,
             MIN(rms) AS rms_micro_min, MAX(rms) AS rms_micro_max
      FROM r GROUP BY fp
      ORDER BY canon_clip
    """)
  )

  def queries: Seq[Q] =
    Seq(meta, features, frames, resize, phash, audioFeatures, audioFpDedup)
}
