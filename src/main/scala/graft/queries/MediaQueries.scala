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
  private[queries] val duckMediaCte: String = {
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
  private[queries] val duckSniff: String =
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

  /** DuckDB CTE chain reproducing `Media.dhash` (the 11×6 content-scaled
    * dHash grid of graft.plans.DHash60) bit for bit: cell i covers bytes
    * ⌊i·L/66⌋..⌊(i+1)·L/66⌋ of the L-byte payload, per-cell md5 of
    * "i-<region hex>", hash60 fold mod 256 as the gray value, one bit per
    * horizontally adjacent cell pair.
    */
  private val duckDhashCtes: String = {
    import graft.plans.DHash60.{Cols, Rows, Cells}
    val bits = (for (r <- 0 until Rows; c <- 0 until Cols - 1) yield
      s"CASE WHEN gs[${r * Cols + c + 1}] < gs[${r * Cols + c + 2}] " +
        s"THEN ${1L << (r * 10 + c)} ELSE 0 END").mkString(" + ")
    s"""dcells AS (
       |  SELECT media_id, t.i AS i,
       |    md5(CAST(t.i AS VARCHAR) || '-' ||
       |        substring(hex(payload),
       |          1 + 2 * ((t.i * octet_length(payload)) // $Cells),
       |          2 * ((((t.i + 1) * octet_length(payload)) // $Cells)
       |               - ((t.i * octet_length(payload)) // $Cells)))) AS m
       |  FROM media CROSS JOIN (SELECT unnest(range(0, $Cells)) AS i) t),
       |dgray AS (
       |  SELECT media_id, i, (${Hashing.duckFoldHexCol("m")} % 256) AS gray
       |  FROM dcells),
       |dcode AS (
       |  SELECT media_id, CAST($bits AS BIGINT) AS dhash
       |  FROM (SELECT media_id, list(gray ORDER BY i) AS gs FROM dgray
       |        GROUP BY media_id))""".stripMargin
  }

  /** The q135/q142 planted-near-dup corpus: all synthetic media plus, for
    * every 20th document of length >= 105, a COPY with a 4-char same-length
    * edit (same magic — kind keyed on the ORIGINAL id) under media_id + 10^7.
    */
  private def editedMediaUnion(docs: org.apache.spark.sql.DataFrame) = {
    val base = Media.syntheticFromDocs(docs, col("doc_id"), col("text"))
    // length >= 105 keeps the edit LENGTH-PRESERVING by construction: for
    // shorter texts the splice becomes an append, which shifts every
    // content-scaled dHash region and voids the "edited copy lands within
    // Hamming 3" invariant
    val edited = docs
      .where(pmod(col("doc_id"), lit(20)) === 0 && length(col("text")) >= 105)
      .select(col("doc_id"),
        concat(substring(col("text"), 1, 100), lit("XXXX"),
          substring(col("text"), 105, 1000000000)).as("text"))
    val copies = Media.syntheticFromDocs(edited, col("doc_id"), col("text"))
      .withColumn("media_id", col("media_id") + lit(10000000L))
    base.unionByName(copies)
  }

  /** DuckDB twin of [[editedMediaUnion]], ending in `media(media_id,
    * payload)`.
    */
  private val duckEditedMediaCtes: String = {
    val k = Hashing.duckHash60("('media-' || CAST(kid AS VARCHAR))")
    s"""dd AS (
       |  SELECT doc_id AS media_id, doc_id AS kid, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 10000000 AS media_id, doc_id AS kid,
       |    substring(text, 1, 100) || 'XXXX' || substring(text, 105, 1000000000) AS text
       |  FROM documents WHERE doc_id % 20 = 0 AND length(text) >= 105),
       |media AS (
       |  SELECT media_id,
       |    (CASE WHEN k = 0 THEN '\\x89PNG\\x0D\\x0A\\x1A\\x0A'::BLOB
       |          WHEN k = 1 THEN '\\xFF\\xD8\\xFF\\xE0'::BLOB
       |          ELSE 'RIFF'::BLOB END) || encode(text) AS payload
       |  FROM (SELECT media_id, text, $k % 3 AS k FROM dd))""".stripMargin
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
           |FROM dec CROSS JOIN (SELECT unnest(range(0, 4)) AS i) f""".stripMargin)),

    // Perceptual (difference) hash of every media payload: the native
    // DHash60 expression over hex(payload) — 66 content-region gray values
    // on an 11×6 grid, 60 horizontal-gradient bits. Content-hash dedup
    // (q71) only matches byte-identical assets; this code gives every asset
    // a locality-sensitive fingerprint where local edits flip ≤ ~4 bits.
    // The oracle rebuilds the full grid from md5/substring arithmetic.
    QueryDef(
      "q134_dhash_codes",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val media = Media.syntheticFromDocs(docs, col("doc_id"), col("text"))
        media.select(col("media_id"), Media.dhash(col("payload")).as("dhash"))
      },
      Some(s"""WITH $duckMediaCte,
           |$duckDhashCtes
           |SELECT media_id, dhash FROM dcode""".stripMargin)),

    // Near-duplicate media pairs within Hamming 3 of their dHash codes,
    // via the audited simhash pigeonhole blocking (4 blocks of 15 bits —
    // any pair within Hamming 3 shares a block). The corpus has no
    // byte-identical payloads at this SF, so the query plants the scenario
    // the operator exists for: every 20th document also ships a COPY with
    // a 4-char same-length edit (the "lightly edited re-upload") under
    // media_id + 10^7 — those copies must pair with their originals at
    // Hamming ≤ 3 while unrelated assets (~30 bits apart) stay out. The
    // oracle rebuilds the same copies and brute-forces bit_count(xor);
    // the engine never forms the quadratic pair space.
    QueryDef(
      "q135_dhash_neardup_pairs",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val codes = editedMediaUnion(docs).select(col("media_id"),
          Media.dhash(col("payload")).as("dhash"))
        Media.dhashNearDupPairs(codes, maxHamming = 3)
      },
      Some(s"""WITH $duckEditedMediaCtes,
           |$duckDhashCtes
           |SELECT a.media_id AS id_a, b.media_id AS id_b,
           |  bit_count(xor(a.dhash, b.dhash)) AS hamming
           |FROM dcode a JOIN dcode b ON a.media_id < b.media_id
           |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3""".stripMargin)),

    // Pairs → clusters → SURVIVORS for MEDIA: the q83/q84 dedup story on
    // binary assets — dHash near-dup pairs over the same planted edited
    // copies, hash-min connected components, min-id representative policy.
    // Every edited copy (media_id + 10^7 > its original) must drop; every
    // original and every unpaired asset survives. The oracle reruns the
    // pair brute-force and the recursive-CTE transitive closure.
    QueryDef(
      "q142_media_dedup_survivors",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val media = editedMediaUnion(docs)
        val codes = media.select(col("media_id"),
          Media.dhash(col("payload")).as("dhash"))
        val pairs = Media.dhashNearDupPairs(codes, maxHamming = 3)
        val labels = graft.ops.Dedup.connectedComponents(
          pairs.select(col("id_a"), col("id_b")), "id_a", "id_b")
        graft.ops.Dedup.keepClusterRepresentative(
          media.select(col("media_id")), col("media_id"), labels)
      },
      Some(s"""WITH RECURSIVE $duckEditedMediaCtes,
           |$duckDhashCtes,
           |jp AS (
           |  SELECT a.media_id AS id_a, b.media_id AS id_b
           |  FROM dcode a JOIN dcode b ON a.media_id < b.media_id
           |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 3),
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM jp
           |  UNION
           |  SELECT id_b, id_a FROM jp),
           |reach(id, r) AS (
           |  SELECT src, dst FROM edges
           |  UNION
           |  SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
           |labels AS (
           |  SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id)
           |SELECT m.media_id FROM media m
           |WHERE NOT EXISTS (
           |  SELECT 1 FROM labels l WHERE l.id = m.media_id AND l.id <> l.cluster_id)""".stripMargin)),

    // Frame-overlap near-dup pairs (the video-dedup analog of shingle
    // containment): payloads cut into fixed 64-byte frames, content-hash
    // fingerprints, inverted-index pair join with containment =
    // shared/min(|A|,|B|). The planted scenario is the TRUNCATED
    // re-upload: every 25th document also ships a half-length prefix copy
    // (same magic — kind keyed on the original id) under media_id + 2·10^7;
    // its complete frames all appear in the original, so it must pair at
    // containment ≈ 1 while unrelated assets share nothing. The dHash
    // (q135) misses truncation by design (content-scaled boundaries move);
    // this catches exactly that case.
    QueryDef(
      "q141_frame_overlap_pairs",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val base = Media.syntheticFromDocs(docs, col("doc_id"), col("text"))
        val truncated = docs.where(pmod(col("doc_id"), lit(25)) === 0)
          .select(col("doc_id"),
            col("text").substr(lit(1), expr("length(text) div 2")).as("text"))
        val copies = Media.syntheticFromDocs(truncated, col("doc_id"), col("text"))
          .withColumn("media_id", col("media_id") + lit(20000000L))
        val media = base.unionByName(copies)
        val frames = Media.frameContentHashes(media, col("media_id"),
          col("payload"), frameBytes = 64)
        Media.frameOverlapPairs(frames, minShared = 2, minContainment = 0.5)
      },
      Some {
        val k = Hashing.duckHash60("('media-' || CAST(kid AS VARCHAR))")
        val fold = Hashing.duckFoldHexCol("m")
        s"""WITH dd AS (
           |  SELECT doc_id AS media_id, doc_id AS kid, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 20000000 AS media_id, doc_id AS kid,
           |    substring(text, 1, length(text) // 2) AS text
           |  FROM documents WHERE doc_id % 25 = 0),
           |media AS (
           |  SELECT media_id,
           |    (CASE WHEN k = 0 THEN '\\x89PNG\\x0D\\x0A\\x1A\\x0A'::BLOB
           |          WHEN k = 1 THEN '\\xFF\\xD8\\xFF\\xE0'::BLOB
           |          ELSE 'RIFF'::BLOB END) || encode(text) AS payload
           |  FROM (SELECT media_id, text, $k % 3 AS k FROM dd)),
           |fr AS (
           |  SELECT DISTINCT media_id, $fold AS fh FROM (
           |    SELECT media_id,
           |      md5('frm-' || substring(hex(payload), 1 + t.j * 128, 128)) AS m
           |    FROM media CROSS JOIN
           |      LATERAL unnest(range(0, (octet_length(payload) * 2 + 127) // 128)) AS t(j))),
           |sizes AS (SELECT media_id, COUNT(*) AS nf FROM fr GROUP BY 1),
           |p AS (
           |  SELECT a.media_id AS id_a, b.media_id AS id_b, COUNT(*) AS n_shared
           |  FROM fr a JOIN fr b ON a.fh = b.fh AND a.media_id < b.media_id
           |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
           |SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
           |  CAST(sa.nf AS BIGINT) AS nf_a, CAST(sb.nf AS BIGINT) AS nf_b,
           |  CAST(n_shared AS DOUBLE) / CAST(least(sa.nf, sb.nf) AS DOUBLE) AS containment
           |FROM p JOIN sizes sa ON sa.media_id = p.id_a
           |JOIN sizes sb ON sb.media_id = p.id_b
           |WHERE CAST(n_shared AS DOUBLE) / CAST(least(sa.nf, sb.nf) AS DOUBLE) >= 0.5""".stripMargin
      }),

    // Audio ENERGY-ENVELOPE fingerprint (the dHash discipline on the time
    // axis): every sniffed-wav payload's PCM bytes cut into 61 content-
    // scaled windows, per-window energy sums, 60 adjacent-gradient bits with
    // CROSS-MULTIPLIED mean comparison (integer-exact, no float division).
    // The REAL javax.sound.sampled decode path computes the identical code
    // over decoded PCM (MediaSpec round-trip pins JVM == this relational
    // form); here the oracle re-derives every window sum from hex pairs.
    QueryDef(
      "q161_audio_envelope",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val media = Media.syntheticFromDocs(docs, col("doc_id"), col("text"))
        Media.audioEnvelope(media, col("media_id"), col("payload"))
      },
      Some {
        val n = Media.EnvWindows
        val bits = (0 until n - 1).map(b =>
          s"CASE WHEN ss[${b + 1}] * cs[${b + 2}] < ss[${b + 2}] * cs[${b + 1}] " +
            s"THEN ${1L << b} ELSE 0 END").mkString(" + ")
        s"""WITH $duckMediaCte,
           |wav AS (
           |  SELECT media_id, substring(hex(payload), 9) AS h,
           |    CAST(octet_length(payload) - 4 AS BIGINT) AS nb
           |  FROM media WHERE $duckSniff = 'audio/wav'),
           |bytes AS (
           |  SELECT media_id, (bi * $n - 1) // nb AS w,
           |    (strpos('0123456789ABCDEF', substring(h, CAST(2 * bi - 1 AS INTEGER), 1)) - 1) * 16
           |      + (strpos('0123456789ABCDEF', substring(h, CAST(2 * bi AS INTEGER), 1)) - 1) AS v
           |  FROM wav, unnest(range(1, nb + 1)) AS t(bi)
           |  WHERE nb > 0),
           |sums AS (
           |  SELECT media_id, w, CAST(SUM(v) AS BIGINT) AS s, COUNT(*) AS c
           |  FROM bytes GROUP BY 1, 2),
           |wins AS (
           |  SELECT media_id, nb, unnest(range(0, $n)) AS w FROM wav),
           |env AS (
           |  SELECT wins.media_id, wins.nb, wins.w,
           |    COALESCE(s.s, 0) AS s, COALESCE(CAST(s.c AS BIGINT), 0) AS c
           |  FROM wins LEFT JOIN sums s
           |    ON s.media_id = wins.media_id AND s.w = wins.w),
           |lists AS (
           |  SELECT media_id, nb, list(s ORDER BY w) AS ss, list(c ORDER BY w) AS cs
           |  FROM env GROUP BY 1, 2)
           |SELECT media_id, nb AS n_bytes, CAST($bits AS BIGINT) AS env60
           |FROM lists""".stripMargin
      }),

    // REAL MJPEG-in-AVI video dedup: every 50th document becomes a 6-frame
    // MJPEG AVI (palette frames start..start+5 mod 64, start = 37·doc_id
    // mod 64) plus a 3-frame CLIPPED re-upload under media_id + 2·10^7.
    // The engine runs the full real pipeline — RIFF container walk, per-
    // frame ImageIO JPEG decode, real-pixel dHash — and pairs assets on
    // shared frame codes (q141's machinery with REAL frames). The oracle
    // cannot decode JPEG, and does not need to: palette members keep 64
    // distinct dHashes through the lossy round-trip (VideoSpec pins this),
    // so the pair structure is fully determined by the palette-index
    // arithmetic — any container-walk or decode defect changes the counts
    // and fails the hash. Clips must pair with their originals at
    // containment 1.0 (3 of min(3, 6) frames shared).
    QueryDef(
      "q170_mjpeg_frame_pairs",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
          .where(pmod(col("doc_id"), lit(50)) === 0)
        val vids = docs.select(col("doc_id").as("id"),
          pmod(col("doc_id") * 37, lit(64)).cast("int").as("s"), lit(6).as("n"))
        val clips = docs.select((col("doc_id") + lit(20000000L)).as("id"),
          pmod(col("doc_id") * 37, lit(64)).cast("int").as("s"), lit(3).as("n"))
        val media = Media.syntheticMjpegAvi(vids.unionByName(clips),
            col("id"), col("s"), col("n"))
          .select(col("media_id"), lit("video/avi").as("declared_mime"), col("payload"))
          .as[MediaRecord]
        val frames = Media.decodeVideoFrames(media)
          .select(col("media_id"), col("dhash").as("frame_hash"))
        Media.frameOverlapPairs(frames, minShared = 2, minContainment = 0.5)
      },
      Some(s"""WITH vids AS (
           |  SELECT doc_id AS media_id, (doc_id * 37) % 64 AS s, 6 AS n
           |  FROM documents WHERE doc_id % 50 = 0
           |  UNION ALL
           |  SELECT doc_id + 20000000 AS media_id, (doc_id * 37) % 64 AS s, 3 AS n
           |  FROM documents WHERE doc_id % 50 = 0),
           |fr AS (
           |  SELECT DISTINCT media_id, (s + t.j) % 64 AS ph
           |  FROM vids, unnest(range(0, n)) AS t(j)),
           |sizes AS (SELECT media_id, COUNT(*) AS nf FROM fr GROUP BY 1),
           |p AS (
           |  SELECT a.media_id AS id_a, b.media_id AS id_b, COUNT(*) AS n_shared
           |  FROM fr a JOIN fr b ON a.ph = b.ph AND a.media_id < b.media_id
           |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
           |SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
           |  CAST(sa.nf AS BIGINT) AS nf_a, CAST(sb.nf AS BIGINT) AS nf_b,
           |  CAST(n_shared AS DOUBLE) / CAST(least(sa.nf, sb.nf) AS DOUBLE) AS containment
           |FROM p JOIN sizes sa ON sa.media_id = p.id_a
           |JOIN sizes sb ON sb.media_id = p.id_b
           |WHERE CAST(n_shared AS DOUBLE) / CAST(least(sa.nf, sb.nf) AS DOUBLE) >= 0.5""".stripMargin)),

    // DURABLE MEDIA fingerprint serve: the q213 simhash key table is
    // modality-AGNOSTIC — it stores 60-bit codes with no opinion on their
    // origin — so the same stored pigeonhole index serves media dHashes.
    // Corpus assets build the key table once; probe assets (the q135
    // length-preserving edited re-uploads under media_id + 10^7) are
    // fingerprinted per row and matched within Hamming 3 without the
    // corpus ever re-decoding. The oracle brute-forces bit_count(xor) on
    // the probe × corpus slice — pigeonhole recall must lose nothing.
    QueryDef(
      "q220_media_index_serve",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val base = Media.syntheticFromDocs(docs, col("doc_id"), col("text"))
        val hashes = base.select(col("media_id").as("doc_id"),
          Media.dhash(col("payload")).as("simhash")).localCheckpoint()
        val keys = graft.ops.SimHashIndex.keyTable(hashes,
          maxHamming = 3, numBlocks = 6)
        val edited = docs
          .where(pmod(col("doc_id"), lit(20)) === 0 && length(col("text")) >= 105)
          .select(col("doc_id"),
            concat(substring(col("text"), 1, 100), lit("XXXX"),
              substring(col("text"), 105, 1000000000)).as("text"))
        val probes = Media.syntheticFromDocs(edited, col("doc_id"), col("text"))
          .select((col("media_id") + lit(10000000L)).as("probe_id"),
            Media.dhash(col("payload")).as("psh"))
        graft.ops.SimHashIndex.matchesCodes(keys, probes,
          maxHamming = 3, numBlocks = 6)
      },
      Some(s"""WITH $duckEditedMediaCtes,
           |$duckDhashCtes
           |SELECT p.media_id AS probe_id, c.media_id AS doc_id,
           |  bit_count(xor(p.dhash, c.dhash)) AS hamming
           |FROM dcode p JOIN dcode c
           |  ON p.media_id >= 10000000 AND c.media_id < 10000000
           |  AND bit_count(xor(p.dhash, c.dhash)) <= 3""".stripMargin)),

    // REAL animated-GIF dedup: the q170 planted-clip design in a second
    // container the JDK can both WRITE and READ (ImageIO GIF codec) —
    // every 50th document becomes a 7-frame animation plus a 4-frame
    // clipped re-upload under media_id + 3·10^7. Unlike the JPEG path,
    // GIF's palette encoding is LOSSLESS on 2-level frames, so decoded
    // dHashes equal the source frame dHashes bit for bit (MediaSpec pins
    // the round trip); the oracle again predicts the pair structure from
    // palette-index arithmetic alone — any sequence-walk or decode defect
    // changes the counts and fails the hash.
    QueryDef(
      "q268_gif_frame_pairs",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
          .where(pmod(col("doc_id"), lit(50)) === 0)
        val gifs = docs.select(col("doc_id").as("id"),
          pmod(col("doc_id") * 29, lit(64)).cast("int").as("s"), lit(7).as("n"))
        val clips = docs.select((col("doc_id") + lit(30000000L)).as("id"),
          pmod(col("doc_id") * 29, lit(64)).cast("int").as("s"), lit(4).as("n"))
        val media = Media.syntheticGif(gifs.unionByName(clips),
            col("id"), col("s"), col("n"))
          .select(col("media_id"), lit("image/gif").as("declared_mime"), col("payload"))
          .as[MediaRecord]
        val frames = Media.decodeGifFrames(media)
          .select(col("media_id"), col("dhash").as("frame_hash"))
        Media.frameOverlapPairs(frames, minShared = 2, minContainment = 0.5)
      },
      Some(s"""WITH vids AS (
           |  SELECT doc_id AS media_id, (doc_id * 29) % 64 AS s, 7 AS n
           |  FROM documents WHERE doc_id % 50 = 0
           |  UNION ALL
           |  SELECT doc_id + 30000000 AS media_id, (doc_id * 29) % 64 AS s, 4 AS n
           |  FROM documents WHERE doc_id % 50 = 0),
           |fr AS (
           |  SELECT DISTINCT media_id, (s + t.j) % 64 AS ph
           |  FROM vids, unnest(range(0, n)) AS t(j)),
           |sizes AS (SELECT media_id, COUNT(*) AS nf FROM fr GROUP BY 1),
           |p AS (
           |  SELECT a.media_id AS id_a, b.media_id AS id_b, COUNT(*) AS n_shared
           |  FROM fr a JOIN fr b ON a.ph = b.ph AND a.media_id < b.media_id
           |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
           |SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
           |  CAST(sa.nf AS BIGINT) AS nf_a, CAST(sb.nf AS BIGINT) AS nf_b,
           |  CAST(n_shared AS DOUBLE) / CAST(least(sa.nf, sb.nf) AS DOUBLE) AS containment
           |FROM p JOIN sizes sa ON sa.media_id = p.id_a
           |JOIN sizes sb ON sb.media_id = p.id_b
           |WHERE CAST(n_shared AS DOUBLE) / CAST(least(sa.nf, sb.nf) AS DOUBLE) >= 0.5""".stripMargin))
  )
}
