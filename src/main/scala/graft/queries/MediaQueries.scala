package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Hashing, Media, MediaRecord}
import org.apache.spark.sql.functions._

/** Multimodal-column extension queries: binary payloads + typed metadata
  * structs, synthesized deterministically from `documents` (magic-byte prefix
  * ++ UTF-8 text) so the whole binary pipeline — construction, mime sniffing,
  * metadata extraction, content-hash dedup, and the mapPartitions decode
  * plumbing — is hash-verified against DuckDB.
  */
object MediaQueries {

  /** DuckDB CTE twin of `Media.syntheticFromDocs` over documents. */
  private val duckMediaCte: String = {
    val k = Hashing.duckHash60("('media-' || CAST(doc_id AS VARCHAR))")
    s"""media AS (
       |  SELECT doc_id AS media_id,
       |    CASE WHEN k = 0 THEN 'image/png'
       |         WHEN k = 1 THEN 'image/jpeg'
       |         ELSE 'audio/wav' END AS declared_mime,
       |    (CASE WHEN k = 0 THEN '\\x89PNG\\x0D\\x0A\\x1A\\x0A'::BLOB
       |          WHEN k = 1 THEN '\\xFF\\xD8\\xFF\\xE0'::BLOB
       |          ELSE 'RIFF'::BLOB END) || encode(text) AS payload
       |  FROM (SELECT doc_id, text, $k % 3 AS k FROM documents))""".stripMargin
  }

  /** DuckDB twin of `Media.sniffMime` (same check order as the fold). */
  private val duckSniff: String =
    """CASE WHEN substring(hex(payload), 1, 16) = '89504E470D0A1A0A' THEN 'image/png'
      |     WHEN substring(hex(payload), 1, 8) = 'FFD8FFE0' THEN 'image/jpeg'
      |     WHEN substring(hex(payload), 1, 8) = '52494646' THEN 'audio/wav'
      |     ELSE 'application/octet-stream' END""".stripMargin

  /** DuckDB CTE twin of the STUB decode (`Media.decodeAll` output). */
  private val duckDecodedCte: String =
    s"""dec AS (
       |  SELECT media_id, declared_mime,
       |    16 + (octet_length(payload) % 1024) AS width,
       |    16 + ((octet_length(payload) * 31) % 1024) AS height,
       |    CASE WHEN declared_mime = 'audio/wav'
       |         THEN 1 + (octet_length(payload) % 24) ELSE 1 END AS n_frames,
       |    CAST(16 + (octet_length(payload) % 1024) AS DOUBLE)
       |      * CAST(16 + ((octet_length(payload) * 31) % 1024) AS DOUBLE) / 1e6 AS megapixels
       |  FROM media)""".stripMargin

  /** Spark-side decoded Dataset shared by q72-q75. */
  private def decoded(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val media = Media.syntheticFromDocs(docs, col("doc_id"), col("text"))
      .select(col("media_id"), col("meta.declared_mime").as("declared_mime"),
        col("payload"))
      .as[MediaRecord]
    Media.decodeAll(media)
  }

  val defs: Seq[QueryDef] = Seq(

    // Metadata extraction over the binary column: declared vs sniffed mime,
    // byte length, cross-engine content hash.
    QueryDef(
      "q70_media_metadata",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val media = Media.syntheticFromDocs(docs, col("doc_id"), col("text"))
        Media.extractMeta(media, col("media_id"), col("payload"))
      },
      Some(s"""WITH $duckMediaCte
           |SELECT media_id, declared_mime,
           |  $duckSniff AS sniffed_mime,
           |  octet_length(payload) AS byte_len,
           |  md5(hex(payload)) AS content_hash
           |FROM media""".stripMargin)),

    // Exact dedup by payload content hash (binary twin of q50).
    QueryDef(
      "q71_media_dedup_by_content",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val media = Media.syntheticFromDocs(docs, col("doc_id"), col("text"))
        Media.dedupByContent(media, col("media_id"), col("payload"))
      },
      Some(s"""WITH $duckMediaCte
           |SELECT md5(hex(payload)) AS content_hash, min(media_id) AS rep_id,
           |  COUNT(*) AS n_dups
           |FROM media GROUP BY 1""".stripMargin)),

    // mapPartitions decode pipeline (STUB decoder — deterministic fake
    // dimensions derived from byte length; the oracle verifies the plumbing).
    QueryDef(
      "q72_media_decode_stub",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val media = Media.syntheticFromDocs(docs, col("doc_id"), col("text"))
          .select(col("media_id"), col("meta.declared_mime").as("declared_mime"),
            col("payload"))
          .as[MediaRecord]
        Media.decodeAll(media).toDF()
      },
      Some(s"""WITH $duckMediaCte
           |SELECT media_id, declared_mime,
           |  16 + (octet_length(payload) % 1024) AS width,
           |  16 + ((octet_length(payload) * 31) % 1024) AS height,
           |  CASE WHEN declared_mime = 'audio/wav'
           |       THEN 1 + (octet_length(payload) % 24) ELSE 1 END AS n_frames,
           |  CAST(16 + (octet_length(payload) % 1024) AS DOUBLE)
           |    * CAST(16 + ((octet_length(payload) * 31) % 1024) AS DOUBLE) / 1e6 AS megapixels
           |FROM media""".stripMargin)),

    // Aspect-preserving resize to a 256 bounding box (integer-exact floor
    // scaling, no-op when the asset already fits) — 1:1 mapPartitions shape.
    QueryDef(
      "q73_media_resize",
      (s, dir) => Media.resizeAll(decoded(s, dir), maxDim = 256).toDF(),
      Some(s"""WITH $duckMediaCte,
           |$duckDecodedCte
           |SELECT media_id, declared_mime, width, height,
           |  CASE WHEN greatest(width, height) <= 256 THEN width
           |       ELSE greatest(1, (width * 256) // greatest(width, height)) END AS new_width,
           |  CASE WHEN greatest(width, height) <= 256 THEN height
           |       ELSE greatest(1, (height * 256) // greatest(width, height)) END AS new_height
           |FROM dec""".stripMargin)),

    // Frame sampling: every 2nd frame per asset (frame 0 always), one row per
    // sampled frame with a deterministic fingerprint — the 1:N row-expanding
    // (UDTF-style) mapPartitions shape.
    QueryDef(
      "q74_media_frame_sample",
      (s, dir) => Media.sampleFrames(decoded(s, dir), everyK = 2).toDF(),
      Some(s"""WITH $duckMediaCte,
           |$duckDecodedCte,
           |frames AS (
           |  SELECT media_id, unnest(range(0, n_frames, 2)) AS frame_idx FROM dec)
           |SELECT media_id, frame_idx,
           |  ${Hashing.duckHash60("('frame-' || CAST(media_id AS VARCHAR) || '-' || CAST(frame_idx AS VARCHAR))")} AS frame_hash
           |FROM frames""".stripMargin)),

    // Feature extraction: fixed-width stub feature vector per asset emitted
    // as flat (media_id, feat_idx, feat_val) rows.
    QueryDef(
      "q75_media_features",
      (s, dir) => Media.extractFeatures(decoded(s, dir)).toDF(),
      Some(s"""WITH $duckMediaCte,
           |$duckDecodedCte
           |SELECT media_id, f.i AS feat_idx,
           |  CASE f.i
           |    WHEN 0 THEN CAST(width AS DOUBLE) / 1040.0
           |    WHEN 1 THEN CAST(height AS DOUBLE) / 1040.0
           |    WHEN 2 THEN CAST(n_frames AS DOUBLE) / 24.0
           |    ELSE megapixels END AS feat_val
           |FROM dec CROSS JOIN (SELECT unnest(range(0, 4)) AS i) f""".stripMargin))
  )
}
