package graft.multimodal

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque binary + typed metadata
  * (builder prompt: "multimodal columns").
  *
  * Model: a media asset is a `BINARY` column travelling WITH its typed
  * metadata struct `(format, width, height, n_frames)` — the schema a
  * 100 TB training-data pipeline uses so that planning (filter by format,
  * partition by size class, sample frames) never touches the bytes, and the
  * bytes are only deserialized inside batched executor-side functions.
  *
  * DECODE IS A STUB: this container has no image/audio codecs, so
  * [[MediaCodec.decodeStub]] derives deterministic fake metadata from the
  * byte stream (clearly marked; swap in a real codec on a real cluster).
  * Everything around it — binary schema, metadata pushdown, frame-sampling
  * explode, fixed-size batch shape for the feature extractor — is real and
  * oracle-/test-verified.
  *
  * The synthetic corpus: `documents.text` bytes stand in for encoded media.
  */
object Multimodal {

  /** Typed metadata for one media blob. */
  case class MediaMeta(format: String, width: Int, height: Int, nFrames: Int)

  object MediaCodec {
    /** STUB decoder — replace with a real codec (e.g. javax.imageio / ffmpeg
      * bindings) in production. Deterministic in the bytes so tests and the
      * SQL oracle can reproduce it: everything derives from the byte length. */
    def decodeStub(bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length
      MediaMeta(
        format = Seq("jpeg", "png", "webp").apply(n % 3),
        width = 64 + n % 512,
        height = 64 + (n * 7) % 512,
        nFrames = 1 + n % 30)
    }

    /** STUB feature extractor: 8-dim embedding from the bytes. Real version:
      * a vision/audio encoder running per batch on the executor. Deterministic
      * (xxhash-based) so the pipeline is testable. */
    def featuresStub(bytes: Array[Byte]): Array[Float] = {
      val h = java.util.Arrays.hashCode(bytes)
      Array.tabulate(8)(i => (((h * (i * 2654435761L + 1)) >>> 16) % 1000L) / 1000.0f)
    }
  }

  val all: Seq[QDef] = Seq(
    // Decode-metadata extraction: bytes → typed struct. The oracle replays
    // the stub's arithmetic in SQL (possible exactly because the stub is
    // deterministic in octet length).
    QDef(
      "q_mm_decode_meta",
      """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS byte_len,
        |  ['jpeg','png','webp'][octet_length(CAST(text AS BLOB)) % 3 + 1] AS format,
        |  CAST(64 + octet_length(CAST(text AS BLOB)) % 512 AS INTEGER) AS width,
        |  CAST(64 + (octet_length(CAST(text AS BLOB)) * 7) % 512 AS INTEGER) AS height,
        |  CAST(1 + octet_length(CAST(text AS BLOB)) % 30 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val media = Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("media"))
      val len = octet_length(col("media"))
      media.select(col("doc_id"), len.cast("int").as("byte_len"),
          element_at(array(lit("jpeg"), lit("png"), lit("webp")), (len % 3 + 1).cast("int")).as("format"),
          (lit(64) + len % 512).cast("int").as("width"),
          (lit(64) + (len * 7) % 512).cast("int").as("height"),
          (lit(1) + len % 30).cast("int").as("n_frames"))
        .orderBy("doc_id")
    },

    // Frame sampling: every 5th frame index per asset, exploded to one row
    // per sampled frame with its presentation timestamp — pure metadata
    // planning, the bytes are never opened.
    QDef(
      "q_mm_frame_sample",
      """WITH m AS (SELECT doc_id,
        |    1 + octet_length(CAST(text AS BLOB)) % 30 AS n_frames FROM documents)
        |SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
        |  CAST(f * 40 AS INTEGER) AS pts_ms
        |FROM (SELECT doc_id, unnest(range(0, n_frames, 5)) AS f FROM m) t
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          (lit(1) + octet_length(col("text").cast("binary")) % 30).cast("int").as("n_frames"))
        .select(col("doc_id"),
          explode(expr("sequence(0, n_frames - 1, 5)")).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          (col("frame_idx") * 40).cast("int").as("pts_ms"))
        .orderBy("doc_id", "frame_idx")
    },

    // Batched feature extraction: the Scala analog of mapInPandas — the
    // executor iterates fixed-size batches of (id, bytes) and runs the
    // encoder per batch (real encoders amortize model setup per batch, and
    // the batch size caps executor memory for large blobs). No SQL oracle
    // (mapPartitions is the point); MultimodalSpec pins shape + determinism.
    QDef.noOracle("q_mm_batch_features") { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("media"))
        .as[(Long, Array[Byte])]
      media.mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          // per-batch setup would load the model here (once per 64 blobs)
          batch.map { case (id, bytes) => (id, MediaCodec.featuresStub(bytes)) }
        }
      }.toDF("doc_id", "features")
        // dump scalar views of the vector (driver's comparator cannot sort
        // array cells); the full array shape is pinned in MultimodalSpec
        .select(col("doc_id"),
          size(col("features")).as("dim"),
          element_at(col("features"), 1).as("f0"),
          element_at(col("features"), 8).as("f7"),
          expr("aggregate(features, cast(0.0 as double), (a, x) -> a + x)").as("fsum"))
        .orderBy("doc_id")
    },
  )
}
