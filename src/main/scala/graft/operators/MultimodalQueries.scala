package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{Q, QueryPack, Tables}
import graft.functions.Hashing

/** Multimodal-column plumbing: opaque binary payloads with typed metadata,
  * plus a decode/feature-extract stage. The decode itself is a
  * deterministic stand-in ([[graft.functions.ByteHistogram]] — see its doc:
  * a real image/audio codec drops into the same expression slot), but the
  * Spark-side mechanics are real: binary columns flow through parquet,
  * feature vectors come back as fixed-length arrays, and everything stays
  * inside the distributed plan (no driver-side decode loop).
  *
  * The testdata has no binary column, so payloads are synthesized from
  * `documents.text` (UTF-8 bytes — the corpus is pure ASCII, verified, so
  * byte-level oracles can be written over DuckDB's character functions).
  */
object MultimodalQueries extends QueryPack {

  def queries: Seq[Q] = Seq(
    Q("mm01_binary_meta",
      (s, dir) => {
        Tables(s, dir, "documents")
          .select(col("doc_id"),
            encode(col("text"), "UTF-8").as("payload"))
          .select(col("doc_id"),
            length(col("payload")).as("n_bytes"),
            md5(col("payload")).as("content_md5"),
            md5(substring(col("payload"), 1, 32)).as("head_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             | md5(text) AS content_md5,
             | md5(substring(text, 1, 32)) AS head_md5
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("mm02_decode_features",
      (s, dir) => {
        val hist = Hashing.byteHistogram(
          encode(col("text"), "UTF-8"), buckets = 8)
        Tables(s, dir, "documents")
          .select(col("doc_id"), hist.as("h"),
            md5(substring(encode(col("text"), "UTF-8"), 65, 64))
              .as("frame_md5"))
          .select(col("doc_id"),
            element_at(col("h"), 1).as("b0"),
            element_at(col("h"), 2).as("b1"),
            element_at(col("h"), 3).as("b2"),
            element_at(col("h"), 4).as("b3"),
            element_at(col("h"), 5).as("b4"),
            element_at(col("h"), 6).as("b5"),
            element_at(col("h"), 7).as("b6"),
            element_at(col("h"), 8).as("b7"),
            col("frame_md5"))
          .orderBy(col("doc_id"))
      },
      // ASCII corpus ⇒ byte buckets of width 32 are expressible as
      // character-class counts; buckets ≥ 128 are structurally zero.
      Some("""SELECT doc_id,
             | CAST(length(text) - length(regexp_replace(text, '[\x00-\x1f]', '', 'g')) AS BIGINT) AS b0,
             | CAST(length(text) - length(regexp_replace(text, '[\x20-\x3f]', '', 'g')) AS BIGINT) AS b1,
             | CAST(length(text) - length(regexp_replace(text, '[\x40-\x5f]', '', 'g')) AS BIGINT) AS b2,
             | CAST(length(text) - length(regexp_replace(text, '[\x60-\x7f]', '', 'g')) AS BIGINT) AS b3,
             | CAST(0 AS BIGINT) AS b4, CAST(0 AS BIGINT) AS b5,
             | CAST(0 AS BIGINT) AS b6, CAST(0 AS BIGINT) AS b7,
             | md5(substring(text, 65, 64)) AS frame_md5
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Frame sampling: fixed-size windows at a fixed stride over the
    // payload — the video/audio "sample every Nth frame" shape. Pure
    // row-local expression work: no shuffle, scales linearly, and the
    // sampled frames stay inside the plan (downstream decode/dedup
    // consumes them without a collect). Frames are fingerprinted (md5)
    // exactly as a real pipeline would key decoded frames for dedup.
    Q("mm03_frame_sample",
      (s, dir) => {
        val frameLen = 32
        val stride = 64
        val maxFrames = 8
        val t = col("text") // ASCII corpus: 1 char == 1 byte (verified)
        val nFrames = greatest(lit(0),
          least(lit(maxFrames),
            floor((length(t) - frameLen) / stride) + 1)).cast("int")
        Tables(s, dir, "documents")
          .select(col("doc_id"), t.as("text"), nFrames.as("n_frames"))
          // Frames serialize to one delimited string for the driver's
          // pandas compare (array cells are unhashable there); the array
          // form stays available inside the plan for downstream dedup.
          .select(col("doc_id"), col("n_frames"),
            when(col("n_frames") > lit(0),
              array_join(transform(sequence(lit(0), col("n_frames") - 1),
                i => md5(encode(
                  col("text").substr(i * stride + 1, lit(frameLen)),
                  "UTF-8"))), "|"))
              .otherwise(lit(""))
              .as("frames"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             | GREATEST(0, LEAST(8,
             |   CAST(floor((length(text) - 32) / 64) AS INT) + 1)) AS n_frames,
             | array_to_string(list_transform(
             |   range(0, GREATEST(0, LEAST(8,
             |     CAST(floor((length(text) - 32) / 64) AS INT) + 1))),
             |   i -> md5(substring(text, CAST(i AS INT) * 64 + 1, 32))), '|') AS frames
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Nearest-neighbor downsample ("resize") of the payload to ≤16 strided
    // sample points — the image-resize shape over an opaque byte column:
    // stride = ceil(len/16), sample byte values at positions i*stride.
    Q("mm04_resize",
      (s, dir) => {
        val target = 16
        val t = col("text")
        val len = length(t)
        val stride = floor((len + target - 1) / target).cast("int")
        val nOut = floor((len + stride - 1) / stride).cast("int")
        Tables(s, dir, "documents")
          .filter(length(trim(t)) > 0)
          .select(col("doc_id"), t.as("text"), len.as("orig_len"),
            stride.as("stride"), nOut.as("n_out"))
          // Sample values serialize to a delimited string for the driver's
          // pandas compare (array cells are unhashable there).
          .select(col("doc_id"), col("orig_len"),
            array_join(transform(sequence(lit(0), col("n_out") - 1),
              i => ascii(col("text").substr(i * col("stride") + 1, lit(1)))
                .cast("string")), "|")
              .as("resized"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, text, length(text) AS orig_len,
             |    CAST(floor((length(text) + 15) / 16) AS INT) AS stride
             |  FROM documents WHERE length(trim(text)) > 0)
             |SELECT doc_id, orig_len,
             |  array_to_string(list_transform(
             |    range(0, CAST(floor((orig_len + stride - 1) / stride) AS INT)),
             |    i -> ord(substring(text, CAST(i AS INT) * stride + 1, 1))), '|') AS resized
             |FROM d ORDER BY doc_id""".stripMargin)),

    // Audio-shaped decode: the payload interpreted as little-endian
    // int16 PCM, per-frame RMS energy over 16-sample frames — the
    // standard first feature of any audio pipeline (VAD, silence trim,
    // loudness normalization). Pure row-local higher-order functions,
    // codegen'd, no shuffle. Samples are INTEGERS, so the squared sums
    // are exact in double in any fold order and /16 is a power of two —
    // the same order-independence that makes v08 exactly oracle-able.
    Q("mm06_pcm_frame_energy",
      (s, dir) => {
        val t = col("text") // ASCII corpus: 1 char == 1 byte (verified)
        def sample(pos: org.apache.spark.sql.Column) =
          ascii(t.substr(pos + 1, lit(1))) +
            ascii(t.substr(pos + 2, lit(1))) * 256
        val nFrames = least(lit(8), floor(floor(length(t) / 2) / 16))
          .cast("int")
        Tables(s, dir, "documents")
          .select(col("doc_id"), t.as("text"), nFrames.as("n_frames"))
          .select(col("doc_id"), col("n_frames"),
            when(col("n_frames") > 0,
              array_join(transform(sequence(lit(0), col("n_frames") - 1),
                f => round(sqrt(
                  aggregate(sequence(lit(0), lit(15)), lit(0.0d),
                    (acc, i) => acc +
                      pow(sample(f * 32 + i * 2).cast("double"), 2))
                    / 16.0), 6).cast("string")), "|"))
              .otherwise(lit(""))
              .as("energies"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             | CAST(LEAST(8, (length(text) // 2) // 16) AS INT) AS n_frames,
             | array_to_string(list_transform(
             |   range(0, LEAST(8, (length(text) // 2) // 16)), f ->
             |     CAST(ROUND(sqrt(list_sum(list_transform(range(0, 16),
             |       i -> POW(ord(substring(text,
             |                CAST(f * 32 + i * 2 + 1 AS INT), 1))
             |         + 256 * ord(substring(text,
             |                CAST(f * 32 + i * 2 + 2 AS INT), 1)), 2)))
             |       / 16.0), 6) AS VARCHAR)), '|') AS energies
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Header sniffing — the NO-decode metadata path every multimodal
    // pipeline runs before deciding what to decode (resolution filters,
    // codec routing, cost estimation): width/height/bit-depth/color-type
    // read straight from the PNG IHDR bytes (fixed offsets after the
    // 8-byte signature) with substring/hex/conv column functions over
    // the binary payload. At 100 TB this is the difference between a
    // metadata scan and a full decode of every object. Payloads are the
    // REAL encoder's output (Multimodal.syntheticPng); the oracle
    // recomputes the dimensions from the synthetic formula — a header
    // parse that disagrees with what ImageIO encoded goes red.
    Q("mm07_png_header_meta",
      (s, dir) => {
        import s.implicits._
        val payloads = Tables(s, dir, "documents")
          .select(col("doc_id").cast("long")).filter(col("doc_id") < 64)
          .as[Long]
          .mapPartitions(_.map(id => (id, Multimodal.syntheticPng(id,
            w = (8 + id % 5).toInt, h = (8 + id % 3).toInt))))
          .toDF("doc_id", "payload")
        def be(pos: Int, len: Int) =
          conv(hex(substring(col("payload"), pos, len)), 16, 10).cast("long")
        payloads.select(col("doc_id"),
            be(17, 4).as("width"),   // IHDR data: bytes 16..19 (0-based)
            be(21, 4).as("height"),
            be(25, 1).as("bit_depth"),
            be(26, 1).as("color_type"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, CAST(8 + doc_id % 5 AS BIGINT) AS width,
             | CAST(8 + doc_id % 3 AS BIGINT) AS height,
             | CAST(8 AS BIGINT) AS bit_depth,
             | CAST(0 AS BIGINT) AS color_type
             |FROM documents WHERE doc_id < 64 ORDER BY doc_id""".stripMargin)),

    // The REAL codec path (javax.imageio), end to end in the plan: gray
    // PNGs are ENCODED per doc_id inside a mapPartitions stage (pixel
    // values a fixed integer formula of id/x/y — Multimodal.syntheticPng),
    // flow through a binary column, and are DECODED back by
    // Multimodal.decodeImages' batched ImageIO hook. PNG is lossless, so
    // the oracle recomputes dimensions and luma sum as pure integer
    // arithmetic — the gate proves a real image codec round-trips through
    // the distributed pipeline, not just the histogram stand-in.
    Q("mm05_decode_image",
      (s, dir) => {
        import s.implicits._
        val payloads = Tables(s, dir, "documents")
          .select(col("doc_id").cast("long")).filter(col("doc_id") < 64)
          .as[Long]
          .mapPartitions(_.map(id => (id, Multimodal.syntheticPng(id,
            w = (8 + id % 5).toInt, h = (8 + id % 3).toInt))))
          .toDF("doc_id", "payload")
        Multimodal.decodeImages(payloads, "doc_id", "payload")
          .toDF().orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, CAST(8 + doc_id % 5 AS INT) w,
             |    CAST(8 + doc_id % 3 AS INT) h
             |  FROM documents WHERE doc_id < 64),
             |xs AS (SELECT unnest(range(0, 16)) xi),
             |ys AS (SELECT unnest(range(0, 16)) yi),
             |px AS (
             |  SELECT doc_id, w, h, (31 * doc_id + 7 * xi + 13 * yi) % 256 v
             |  FROM d, xs, ys WHERE xi < w AND yi < h)
             |SELECT doc_id, MIN(w) AS width, MIN(h) AS height,
             |  COUNT(*) AS n_pixels, CAST(SUM(v) AS BIGINT) AS luma_sum
             |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Perceptual image dedup ([[Multimodal.imageDhash]] + d01's
    // canonical keep): payloads are REAL PNGs (mm05's synthesized
    // corpus, content keyed on doc_id // 4 so every 4 docs share an
    // image), decoded through the real javax.imageio codec in the
    // batched mapPartitions shape, block-dHashed, and deduped on the
    // signature — one hash shuffle, first doc per hash kept. The
    // oracle never touches a codec: PNG is lossless, so it replays the
    // pixel FORMULA through block sums, the wrap-around gradient bits,
    // and the same keep window.
    Q("mm08_image_dedup",
      (s, dir) => {
        import s.implicits._
        val payloads = Tables(s, dir, "documents")
          .select(col("doc_id").cast("long")).filter(col("doc_id") < 128)
          .as[Long]
          .mapPartitions(_.map(id =>
            (id, Multimodal.syntheticPng(id / 4, w = 16, h = 16))))
          .toDF("doc_id", "payload")
        val hashed = Multimodal.imageDhash(payloads, "doc_id", "payload")
          .toDF()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("dhash_bits")).orderBy(col("doc_id"))
        hashed.withColumn("kept", row_number().over(w) === 1)
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, doc_id // 4 AS gid FROM documents
             |  WHERE doc_id < 128),
             |b AS (SELECT unnest(range(0, 8)) i),
             |o AS (SELECT unnest(range(0, 2)) k),
             |s AS (
             |  SELECT doc_id, gid, byy.i AS yy, bxx.i AS xx,
             |    SUM((31 * gid + 7 * (2 * bxx.i + dx.k)
             |       + 13 * (2 * byy.i + dy.k)) % 256) AS bs
             |  FROM d, b byy, b bxx, o dx, o dy
             |  GROUP BY doc_id, gid, byy.i, bxx.i),
             |nxt AS (
             |  SELECT a.doc_id, a.yy, a.xx, a.bs, n.bs AS bs2
             |  FROM s a JOIN s n ON a.doc_id = n.doc_id AND a.yy = n.yy
             |    AND n.xx = (a.xx + 1) % 8),
             |bits AS (
             |  SELECT doc_id,
             |    string_agg(CASE WHEN bs > bs2 THEN '1' ELSE '0' END, ''
             |      ORDER BY yy, xx) AS dhash_bits
             |  FROM nxt GROUP BY doc_id)
             |SELECT doc_id, dhash_bits,
             |  ROW_NUMBER() OVER (PARTITION BY dhash_bits
             |    ORDER BY doc_id) = 1 AS kept
             |FROM bits ORDER BY doc_id""".stripMargin)),

    // Real-codec THUMBNAIL roundtrip ([[Multimodal.thumbnailRoundtrip]]):
    // decode 16×16 PNGs, 4×4 integer block-mean downsample, RE-ENCODE
    // through javax.imageio, decode the encoded bytes back and emit the
    // pixels read from the re-encoded artifact — the resize-and-store
    // stage with the ENCODER on the verified path (mm05/mm08 verify
    // decode; a writer bug flips this row). Block mean is floor
    // division, so the lossless roundtrip keeps exact integer
    // arithmetic and the oracle replays pixels → block means → sums
    // from the synthetic formula with no image library.
    Q("mm09_thumbnail_roundtrip",
      (s, dir) => {
        import s.implicits._
        val payloads = Tables(s, dir, "documents")
          .select(col("doc_id").cast("long")).filter(col("doc_id") < 96)
          .as[Long]
          .mapPartitions(_.map(id =>
            (id, Multimodal.syntheticPng(id, w = 16, h = 16))))
          .toDF("doc_id", "payload")
        Multimodal.thumbnailRoundtrip(payloads, "doc_id", "payload",
            block = 4)
          .toDF().orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id FROM documents WHERE doc_id < 96),
             |b AS (SELECT unnest(range(0, 4)) i),
             |o AS (SELECT unnest(range(0, 4)) k),
             |tp AS (
             |  SELECT doc_id, byy.i AS ty, bxx.i AS tx,
             |    SUM((31 * doc_id + 7 * (4 * bxx.i + dx.k)
             |       + 13 * (4 * byy.i + dy.k)) % 256) // 16 AS v
             |  FROM d, b byy, b bxx, o dx, o dy
             |  GROUP BY doc_id, byy.i, bxx.i)
             |SELECT doc_id, CAST(4 AS INT) AS thumb_w,
             |  CAST(4 AS INT) AS thumb_h,
             |  CAST(SUM(v) AS BIGINT) AS luma_sum,
             |  string_agg(CAST(v AS VARCHAR), ',' ORDER BY ty, tx)
             |    AS thumb_px
             |FROM tp GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Walsh-Hadamard band features over the PCM frames (mm06's byte →
    // 16-bit-sample convention, 8 samples per frame) — a REAL
    // orthogonal transform on the oracle-verified path, the
    // integer-butterfly workhorse of audio fingerprinting / fast
    // signatures (a Fourier transform's coefficients are irrational,
    // so no cross-engine bit-exactness; the WHT's are ±1 sums, EXACT
    // in BIGINT on both engines). The 8×8 sign matrix is unrolled at
    // GATE-BUILD time into literal ± terms — Scala generates the Spark
    // columns and the SQL text from the same popcount rule, so the two
    // engines cannot disagree on a sign — and the whole transform is a
    // row-local projection fused into the scan: at 100 TB the
    // feature-extraction pass is map-only, zero shuffle.
    Q("mm10_pcm_wht",
      (s, dir) => {
        val t = col("text") // ASCII corpus: 1 char == 1 byte (mm06)
        def sample(pos: org.apache.spark.sql.Column) =
          (ascii(t.substr(pos + 1, lit(1))) +
            ascii(t.substr(pos + 2, lit(1))) * 256).cast("long")
        val nFrames = least(lit(4), floor(floor(length(t) / 2) / 8))
          .cast("int")
        def frameCoeffs(f: org.apache.spark.sql.Column) = {
          val ss = (0 until 8).map(i => sample(f * 16 + i * 2))
          val coeffs = (0 until 8).map { k =>
            (0 until 8).map { i =>
              if (Integer.bitCount(i & k) % 2 == 0) ss(i) else -ss(i)
            }.reduce(_ + _)
          }
          concat_ws(",", coeffs.map(_.cast("string")): _*)
        }
        Tables(s, dir, "documents")
          .select(col("doc_id"), t.as("text"), nFrames.as("n_frames"))
          .select(col("doc_id"), col("n_frames"),
            when(col("n_frames") > 0,
              array_join(transform(
                sequence(lit(0), col("n_frames") - 1),
                frameCoeffs(_)),
                ";"))
              .otherwise(lit("")).as("wht"))
          .orderBy(col("doc_id"))
      },
      Some {
        def sampleSql(i: Int) =
          s"(ord(substring(text, CAST(f * 16 + ${i * 2} + 1 AS INT), 1))" +
            s" + 256 * ord(substring(text," +
            s" CAST(f * 16 + ${i * 2} + 2 AS INT), 1)))"
        val coeffsSql = (0 until 8).map { k =>
          val terms = (0 until 8).map { i =>
            val sgn = if (Integer.bitCount(i & k) % 2 == 0) "+" else "-"
            s"$sgn ${sampleSql(i)}"
          }.mkString(" ")
          s"CAST((0 $terms) AS VARCHAR)"
        }.mkString(" || ',' || ")
        s"""SELECT doc_id,
           | CAST(LEAST(4, (length(text) // 2) // 8) AS INT) AS n_frames,
           | array_to_string(list_transform(
           |   range(0, LEAST(4, (length(text) // 2) // 8)), f ->
           |     $coeffsSql), ';') AS wht
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // PCM 2:1 resample (mm06's 16-bit-sample convention) — the audio
    // downsampling pass of a multimodal ingest (48 kHz → 24 kHz):
    // each output sample is the 2-tap boxcar average of an input pair,
    // `(s[2j] + s[2j+1]) div 2`, the anti-aliasing decimator in EXACT
    // integer arithmetic (floor division of a nonnegative BIGINT sum —
    // no float path, both engines agree to the bit). Like mm10, a
    // row-local projection fused into the scan: map-only at 100 TB.
    // First 16 output samples gated per doc.
    Q("mm11_pcm_resample",
      (s, dir) => {
        val t = col("text") // ASCII corpus: 1 char == 1 byte (mm06)
        def sample(pos: org.apache.spark.sql.Column) =
          (ascii(t.substr(pos + 1, lit(1))) +
            ascii(t.substr(pos + 2, lit(1))) * 256).cast("long")
        val nOut = least(lit(16), floor(length(t) / 4)).cast("int")
        Tables(s, dir, "documents")
          .select(col("doc_id"), t.as("text"), nOut.as("n_out"))
          .select(col("doc_id"), col("n_out"),
            when(col("n_out") > 0,
              array_join(transform(sequence(lit(0), col("n_out") - 1),
                // Integer floor-div-2 as a right shift (the sum of two
                // 16-bit samples is nonnegative) — genuinely no float
                // path, matching the oracle's BIGINT `// 2`.
                j => shiftright(sample(j * 4) + sample(j * 4 + 2), 1)
                  .cast("string")),
                "|"))
              .otherwise(lit(""))
              .as("resampled"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             | CAST(LEAST(16, length(text) // 4) AS INT) AS n_out,
             | array_to_string(list_transform(
             |   range(0, LEAST(16, length(text) // 4)), j ->
             |     CAST(((ord(substring(text, CAST(j * 4 + 1 AS INT), 1))
             |        + 256 * ord(substring(text, CAST(j * 4 + 2 AS INT), 1)))
             |       + (ord(substring(text, CAST(j * 4 + 3 AS INT), 1))
             |        + 256 * ord(substring(text, CAST(j * 4 + 4 AS INT), 1))))
             |       // 2 AS VARCHAR)), '|') AS resampled
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
