package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Q

/** Multimodal-column plumbing: media (image/audio/video) modeled as
  * opaque `binary` columns with typed metadata structs, plus
  * decode / feature-extract / frame-sample stages.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * STUB — `fakeDecode` derives deterministic pseudo-features from the
  * bytes. Everything around it is the real Spark shape a 100 TB media
  * pipeline needs: binary columns carried through parquet, per-batch
  * `mapPartitions` so a real decoder would amortize model/codec init
  * per partition (the Scala analog of `mapInPandas` batching), bounded
  * memory per task, and schema'd struct outputs.
  */
object Multimodal {

  /** typed per-row media features (what a real decoder would emit). */
  final case class MediaFeatures(
      doc_id: Long, width: Int, height: Int, channels: Int, mean_byte: Double)

  /** STUB decoder: deterministic fake "image decode" from raw bytes.
    * A real implementation would hand `bytes` to a codec; the Spark
    * plumbing (signature, batching, schema) is what's load-bearing. */
  private[multimodal] def fakeDecode(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    val w = 64 + (math.abs(bytes.length) % 512)
    val h = 64 + (math.abs(if (bytes.isEmpty) 0 else bytes(0) & 0xff) % 512)
    val mean = if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
    MediaFeatures(docId, w, h, 3, mean)
  }

  /** documents with an attached opaque binary payload + metadata struct
    * (mime/byte size) — the canonical multimodal column layout. */
  def withBlob(df: DataFrame): DataFrame =
    df.withColumn("blob", encode(col("text"), "UTF-8"))
      .withColumn("media_meta", struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col("blob")).as("n_bytes")))

  /** decode/feature-extract over the binary column, one decoder init
    * per partition. */
  def extractFeatures(spark: SparkSession, df: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real pipeline: initialize codec/model ONCE here, then stream
        it.map { case (id, bytes) => fakeDecode(id, bytes) }
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

  /** Stubbed decode + feature extraction (deterministic fake): binary →
    * typed features via per-partition mapPartitions. The stub is
    * arithmetic over the bytes, and the fixture text is pure ASCII, so
    * the whole distributed decode path gets a REAL DuckDB oracle
    * (byte = ord(char)); MultimodalSpec additionally pins schema and
    * determinism. */
  val features: Q = Q(
    "multimodal_features",
    (s, dir) => {
      import s.implicits._
      extractFeatures(s, withBlob(Tables.load(s, dir, "documents")))
        .toDF()
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(64 + octet_length(encode(text)) % 512 AS INT) AS width,
             CAST(CASE WHEN length(text) = 0 THEN 64
                       ELSE 64 + ord(text[1]) % 512 END AS INT) AS height,
             CAST(3 AS INT) AS channels,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE CAST(list_aggregate(
                         list_transform(range(1, length(text)+1), i -> ord(text[i])),
                         'sum') AS DOUBLE) / length(text)
             END AS mean_byte
      FROM documents
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

  def queries: Seq[Q] = Seq(meta, features, frames)
}
