package graft.queries

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` corpus: token stats,
  * quality scoring, language ID, fingerprinting, and binary-column
  * (multimodal) plumbing. All are narrow per-row transforms — at 100 TB
  * they are pure map stages fused into the parquet scan by whole-stage
  * codegen, with no shuffle at all.
  */
object TextQueries {
  import Tables.t

  private val stopList = Stopwords.map(w => s"'$w'").mkString(", ")

  /** CCNet-style unigram-LM quality score: train a unigram model on
    * the corpus (word → -log p), score each doc by its mean token
    * negative log-likelihood — the classic perplexity filter proxy for
    * training-data curation.
    *
    * Scale shape: the model is CAPPED at the top-`vocabCap` words
    * (TakeOrderedAndProject — K-bounded, never a full vocab collect);
    * every out-of-vocabulary token scores against a single OOV bucket
    * holding the remaining probability mass. An UNCAPPED vocabulary
    * broadcast grows with the corpus (open web ≈ billions of raw
    * types) and eventually OOMs every executor — the cap makes the
    * broadcast O(K) regardless of corpus size. The per-doc aggregation
    * is a map-side-combinable (doc_id) shuffle of (long, count)
    * partials. Determinism: each word's log-prob is quantized to a
    * 1e-9 integer ONCE in the model (both engines compute ln on the
    * identical exact-count ratio; top-K ties break on the word), so
    * per-doc sums are integer arithmetic — bit-exact under any
    * aggregation order. */
  def unigramLogPpl(s: SparkSession, dir: String,
      vocabCap: Int = 65536): DataFrame = {
    val w = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val freq = w.groupBy("word").agg(count("*").as("c"))
    val tot = freq.agg(sum("c").as("t"))
    val top = freq.orderBy(col("c").desc, col("word").asc).limit(vocabCap)
    val model = top.crossJoin(broadcast(tot))
      .select(col("word"),
        round(log(col("c").cast("double") / col("t")) * 1000000000)
          .cast("long").as("ql"))
    // one-row OOV bucket: ln(residual mass / t); null when the cap
    // doesn't bind (no OOV tokens exist, so it's never selected)
    val oov = top.agg(sum("c").as("ck")).crossJoin(tot)
      .select(round(log((col("t") - col("ck")).cast("double") / col("t"))
        * 1000000000).cast("long").as("qloov"))
    w.join(broadcast(model), Seq("word"), "left")
      .crossJoin(broadcast(oov))
      .select(col("doc_id"), coalesce(col("ql"), col("qloov")).as("ql"))
      .groupBy("doc_id")
      .agg(sum("ql").as("s"), count("*").cast("int").as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        (-(col("s").cast("double") / 1000000000) / col("n_tokens"))
          .as("avg_neg_logp"))
  }

  /** The REAL-zlib compression-ratio signal (deflate_len / raw_len,
    * level-6 DEFLATE via the native DeflateLen expression — one JVM
    * call per row, map-only, zero shuffle). This is the production
    * form of the t_compression_ratio registry entry; it is NOT in the
    * registry because no SQL engine can oracle DEFLATE (the registry
    * carries the integer order-0 entropy estimate instead, which IS
    * hash-checkable) — ExpressionSpec pins DeflateLen's determinism,
    * known-vector lengths, and this frame's shape. */
  def deflateCompressionRatio(s: SparkSession, dir: String): DataFrame = {
    graft.functions.expr.TextExpressions.register(s)
    val raw = length(col("text").cast("binary"))
    t(s, dir, "documents").select(
      col("doc_id"),
      raw.as("n_bytes"),
      call_function("graft_deflate_len", col("text")).as("deflate_bytes"),
      (call_function("graft_deflate_len", col("text")).cast("double") /
        raw).as("compression_ratio"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "t_token_stats",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            tokenCount(col("text")).as("n_tokens"),
            length(col("text")).as("n_chars_obs"),
            col("n_chars")),
      Some(
        """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
          |CAST(length(text) AS INT) AS n_chars_obs, n_chars FROM documents""".stripMargin),
      "Token counting (whitespace tokenizer) + char-length audit."),

    QueryDef(
      "t_token_bpe",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            size(filter(split(col("text"), "[^a-z0-9]+"), w => length(w) > 0))
              .cast("int").as("n_subword_tokens")),
      Some(
        """SELECT doc_id,
          |CAST(len(list_filter(string_split_regex(text, '[^a-z0-9]+'),
          |  w -> len(w) > 0)) AS INT) AS n_subword_tokens FROM documents""".stripMargin),
      "BPE-ish token counting: alphanumeric-run segmentation."),

    QueryDef(
      "t_quality_score",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            tokenCount(col("text")).as("n_tokens"),
            stopwordCount(col("text")).as("n_stop"),
            stopwordRatio(col("text")).as("stop_ratio"),
            isQuality(col("text")).as("is_quality")),
      Some(
        s"""SELECT doc_id,
           |CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           |CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS INT) AS n_stop,
           |CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
           |  / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
           |CAST(CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 10000
           |  AND CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
           |      / CAST(len(string_split(text, ' ')) AS DOUBLE) > 0.05
           |  THEN 1 ELSE 0 END AS INT) AS is_quality
           |FROM documents""".stripMargin),
      "Quality scoring: length bounds + stopword-mass heuristic."),

    QueryDef(
      "t_lang_id",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), langId(col("text")).as("pred_lang")),
      Some(
        """SELECT doc_id, lang,
          |CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
          |     WHEN list_contains(string_split(text, ' '), 'el') THEN 'es'
          |     WHEN list_contains(string_split(text, ' '), 'der') THEN 'de'
          |     WHEN list_contains(string_split(text, ' '), 'le') THEN 'fr'
          |     ELSE 'unk' END AS pred_lang
          |FROM documents""".stripMargin),
      "Marker-word language ID against the labeled lang column."),

    QueryDef(
      "t_lang_agreement",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("lang"), langId(col("text")).as("pred"))
          .groupBy("lang")
          .agg(
            count("*").as("n_docs"),
            count(when(col("pred") === col("lang"), 1)).as("n_match")),
      Some(
        """SELECT lang, COUNT(*) AS n_docs,
          |COUNT(CASE WHEN pred = lang THEN 1 END) AS n_match FROM (
          |SELECT lang,
          |CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
          |     WHEN list_contains(string_split(text, ' '), 'el') THEN 'es'
          |     WHEN list_contains(string_split(text, ' '), 'der') THEN 'de'
          |     WHEN list_contains(string_split(text, ' '), 'le') THEN 'fr'
          |     ELSE 'unk' END AS pred
          |FROM documents) GROUP BY lang""".stripMargin),
      "Language-ID agreement rates per labeled language."),

    QueryDef(
      "t_fingerprint",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), fingerprint(col("text")).as("fp"))
          .withColumn("fp_prefix", substring(col("fp"), 1, 8)),
      Some(
        """SELECT doc_id, md5(lower(text)) AS fp,
          |substr(md5(lower(text)), 1, 8) AS fp_prefix FROM documents""".stripMargin),
      "Document fingerprinting (normalized-content hash)."),

    QueryDef(
      "mm_binary_meta",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            length(col("text").cast("binary")).as("n_bytes"),
            md5(col("text").cast("binary")).as("checksum"),
            col("source")),
      Some(
        """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
          |md5(text) AS checksum, source FROM documents""".stripMargin),
      "Multimodal plumbing: opaque binary payload + typed metadata; the " +
        "decode/feature steps live in graft.multimodal (stubbed codecs)."),

    QueryDef(
      "mm_image_decode",
      (s, dir) => {
        // REAL bytes, REAL decoder: encode a deterministic PNG/JPEG per
        // "image" doc executor-side, then decode it back with the
        // in-JDK ImageIO codec on the partition-batched decode path.
        // The oracle predicts the decoded (format, width, height,
        // channels) from doc_id arithmetic — a wrong decoder, wrong
        // byte handling, or schema drift all hash-mismatch.
        val images = graft.multimodal.Multimodal.withImagePayload(
          t(s, dir, "documents").where(col("doc_id") % 3 === 0))
        graft.multimodal.Multimodal
          .decodeMeta(images, graft.multimodal.Multimodal.ImageIoCodec)
          .select(col("doc_id"), col("media_type").as("format"),
            col("width"), col("height"), col("n_frames").as("channels"))
      },
      Some(
        """SELECT doc_id,
          |CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
          |CAST(doc_id % 48 + 16 AS INT) AS width,
          |CAST(doc_id % 32 + 16 AS INT) AS height,
          |3 AS channels
          |FROM documents WHERE doc_id % 3 = 0""".stripMargin),
      "Real-bytes image decode: executor-encoded PNG/JPEG payloads decoded " +
        "by the in-JDK ImageIO codec (width/height/channels)."),

    QueryDef(
      "mm_resize",
      (s, dir) => {
        // REAL bytes, REAL decode → RESIZE: the thumbnail stage of a
        // multimodal ingest, oracle-checked down to the PIXELS. PNG
        // "image" docs only (doc_id % 6 = 0: image ∧ png) — PNG is
        // lossless, so the nearest-neighbor 8×8 sample of the decoded
        // payload must reproduce the encoder's arithmetic pattern
        // pixel(x,y) = (x·31 + y·17 + id) mod 2²⁴ EXACTLY, and the
        // oracle recomputes the full 64-pixel checksum from doc_id
        // arithmetic: a wrong decoder, a filtering resampler, or an
        // off-by-one in the sample grid all hash-mismatch. (JPEG docs
        // go through the same code path in MultimodalSpec, where only
        // dimensions are asserted — lossy pixels have no oracle.)
        val images = graft.multimodal.Multimodal.withImagePayload(
          t(s, dir, "documents").where(col("doc_id") % 6 === 0))
        graft.multimodal.Multimodal.resizeNearest(images, 8, 8)
      },
      Some(
        """WITH img AS (SELECT doc_id,
          |    CAST(doc_id % 48 + 16 AS INT) AS w,
          |    CAST(doc_id % 32 + 16 AS INT) AS h
          |  FROM documents WHERE doc_id % 6 = 0),
          |px AS (SELECT doc_id, w, h,
          |    ((x * w // 8) * 31 + (y * h // 8) * 17 + doc_id) % 16777216 AS rgb
          |  FROM img, unnest(range(8)) AS tx(x), unnest(range(8)) AS ty(y))
          |SELECT doc_id, w AS width, h AS height,
          |  CAST(SUM(rgb) AS BIGINT) AS px_sum
          |FROM px GROUP BY 1, 2, 3""".stripMargin),
      "Decode→resize thumbnails: nearest-neighbor 8x8 over real PNG bytes, " +
        "pixel-checksum oracle from the encoder arithmetic."),

    QueryDef(
      "mm_audio_decode",
      (s, dir) => {
        // REAL bytes, REAL decoder, audio edition: encode a
        // deterministic PCM-16 WAV per "audio" doc executor-side, then
        // parse it back with the in-JDK javax.sound.sampled codec on
        // the partition-batched decode path. The oracle predicts
        // (sample_rate, channels, n_frames, duration_ms) from doc_id
        // arithmetic — wrong byte handling or header math mismatches.
        val audio = graft.multimodal.Multimodal.withAudioPayload(
          t(s, dir, "documents").where(col("doc_id") % 3 === 1))
        graft.multimodal.Multimodal
          .decodeMeta(audio, graft.multimodal.Multimodal.AudioWavCodec)
          .select(col("doc_id"),
            col("width").as("sample_rate"),
            col("height").as("channels"),
            col("n_frames"),
            (col("n_frames") * lit(1000.0) / col("width")).as("duration_ms"))
      },
      Some(
        """SELECT doc_id,
          |CAST(doc_id % 5 * 2000 + 8000 AS INT) AS sample_rate,
          |CAST(doc_id % 2 + 1 AS INT) AS channels,
          |CAST(doc_id % 100 + 50 AS INT) AS n_frames,
          |(doc_id % 100 + 50) * 1000.0 / (doc_id % 5 * 2000 + 8000) AS duration_ms
          |FROM documents WHERE doc_id % 3 = 1""".stripMargin),
      "Real-bytes audio decode: executor-encoded WAV payloads parsed by " +
        "the in-JDK javax.sound.sampled codec (rate/channels/frames)."),

    QueryDef(
      "mm_audio_energy",
      (s, dir) => {
        // REAL bytes, REAL decode → FEATURE EXTRACTION: per-block
        // signal energy over the decoded PCM stream — the audio
        // analog of mm_resize. The fixture PCM is the arithmetic
        // pattern byte(i) = (7i + id) & 0x7f, so every little-endian
        // 16-bit sample — and therefore every block's Σ sample² — is
        // recomputable from doc_id alone: the oracle checks the
        // decoder read the sample DATA correctly (byte order, sign,
        // frame accounting), not just the header.
        val audio = graft.multimodal.Multimodal.withAudioPayload(
          t(s, dir, "documents").where(col("doc_id") % 3 === 1))
        graft.multimodal.Multimodal.audioBlockEnergy(audio, 25)
      },
      Some(
        """WITH a AS (SELECT doc_id, CAST(doc_id % 2 + 1 AS INT) AS ch,
          |    CAST(doc_id % 100 + 50 AS INT) AS frames
          |  FROM documents WHERE doc_id % 3 = 1),
          |sm AS (SELECT doc_id, CAST((i // ch) // 25 AS INT) AS block,
          |    (14 * i + doc_id) % 128 + 256 * ((14 * i + 7 + doc_id) % 128) AS v
          |  FROM a, unnest(range(ch * frames)) AS t(i))
          |SELECT doc_id, block, COUNT(*) AS n_samples,
          |  CAST(SUM(v * v) AS BIGINT) AS energy
          |FROM sm GROUP BY 1, 2""".stripMargin),
      "Decode→feature-extract audio: per-25-frame-block PCM energy from " +
        "real WAV bytes, sample-level oracle from the encoder arithmetic."),

    QueryDef(
      "mm_video_decode",
      (s, dir) => {
        // REAL bytes, REAL demuxer, video edition — the last modality
        // off the stub: encode a deterministic Y4M container per
        // "video" doc executor-side, then demux it back with the
        // pure-JVM Y4mCodec on the partition-batched decode path. The
        // oracle predicts (width, height, n_frames) AND the exact
        // container byte size from doc_id arithmetic, so wrong header
        // math, wrong plane sizing, or a miscounted FRAME walk all
        // hash-mismatch.
        val vids = graft.multimodal.Multimodal.withVideoPayload(
          t(s, dir, "documents").where(col("doc_id") % 3 === 2))
        graft.multimodal.Multimodal
          .decodeMeta(vids, graft.multimodal.Multimodal.Y4mCodec)
          .select(col("doc_id"), col("media_type").as("format"),
            col("n_bytes"), col("width"), col("height"), col("n_frames"))
      },
      Some(
        // header = "YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n"
        //        = 37 fixed chars + the digits of w and h;
        // each frame = "FRAME\n" (6) + w*h*3/2 plane bytes (4:2:0)
        """SELECT doc_id, 'y4m' AS format,
          |CAST(37 + LENGTH(CAST((doc_id % 16 + 2) * 2 AS VARCHAR))
          |        + LENGTH(CAST((doc_id % 12 + 2) * 2 AS VARCHAR))
          |  + (doc_id % 12 + 1)
          |    * (6 + ((doc_id % 16 + 2) * 2) * ((doc_id % 12 + 2) * 2) * 3 // 2)
          |  AS INT) AS n_bytes,
          |CAST((doc_id % 16 + 2) * 2 AS INT) AS width,
          |CAST((doc_id % 12 + 2) * 2 AS INT) AS height,
          |CAST(doc_id % 12 + 1 AS INT) AS n_frames
          |FROM documents WHERE doc_id % 3 = 2""".stripMargin),
      "Real-bytes video demux: executor-encoded Y4M containers parsed by " +
        "the pure-JVM Y4mCodec (dims/frame count/container size)."),

    QueryDef(
      "mm_video_frames",
      (s, dir) => {
        // Frame sampling on REAL container offsets: up to 4 evenly
        // spaced frames per video, located by the Y4M demuxer (not the
        // arithmetic byte slices of the mm_frame_sample stub). The
        // oracle recomputes each frame's exact offset and the unsigned
        // byte sum of its pixel data from doc_id arithmetic, so both
        // frame PLACEMENT and CONTENT are verified.
        val vids = graft.multimodal.Multimodal.withVideoPayload(
          t(s, dir, "documents").where(col("doc_id") % 3 === 2))
        graft.multimodal.Multimodal.sampleVideoFrames(vids, maxFrames = 4)
      },
      Some(
        // fixture frame byte k of frame f is (k*13 + f*7 + doc_id) mod
        // 256; range() can't take lateral parameters, so join a series
        // bounded above max frame size (w<=34, h<=26 -> fsz<=1326)
        """WITH v AS (SELECT doc_id, (doc_id % 16 + 2) * 2 AS w,
          |  (doc_id % 12 + 2) * 2 AS h, doc_id % 12 + 1 AS f
          |  FROM documents WHERE doc_id % 3 = 2),
          |d AS (SELECT *, w*h*3//2 AS fsz,
          |  37 + LENGTH(CAST(w AS VARCHAR)) + LENGTH(CAST(h AS VARCHAR)) AS hdr,
          |  LEAST(4, f) AS k FROM v),
          |fx AS (SELECT d.*, g.j, g.j * f // k AS idx
          |  FROM d JOIN range(0, 4) AS g(j) ON g.j < d.k)
          |SELECT doc_id, CAST(j AS INT) AS frame_no, CAST(idx AS INT) AS frame_idx,
          |  CAST(hdr + idx*(6+fsz) + 6 AS INT) AS frame_off,
          |  CAST(SUM((k2*13 + idx*7 + doc_id) % 256) AS BIGINT) AS byte_sum
          |FROM fx JOIN range(0, 1400) AS u(k2) ON u.k2 < fx.fsz
          |GROUP BY 1, 2, 3, 4""".stripMargin),
      "Real-offset video frame sampling: evenly spaced frames at true " +
        "Y4M container offsets, content-verified by byte sum."),

    QueryDef(
      "t_split_assign",
      (s, dir) =>
        // Deterministic train/val/test split — reproducible across
        // engines, runs, and cluster sizes because the bucket is pure
        // integer arithmetic on the stable doc_id (Knuth multiplicative
        // hash), not a random() or a partition-dependent sample().
        // doc_id is reduced mod a prime FIRST so the multiply never
        // overflows a 64-bit int (1000003 * 2654435761 < 2^63 — Spark
        // would silently wrap negative, DuckDB would raise).
        // Pure map: assignment costs one multiply per row at 100 TB.
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            (col("doc_id") % 1000003L * 2654435761L % 100).cast("int").as("bucket"))
          .withColumn("split",
            when(col("bucket") < 80, "train")
              .when(col("bucket") < 90, "val")
              .otherwise("test")),
      Some(
        """SELECT doc_id, source,
          |CAST(doc_id % 1000003 * 2654435761 % 100 AS INT) AS bucket,
          |CASE WHEN doc_id % 1000003 * 2654435761 % 100 < 80 THEN 'train'
          |     WHEN doc_id % 1000003 * 2654435761 % 100 < 90 THEN 'val'
          |     ELSE 'test' END AS split
          |FROM documents""".stripMargin),
      "Deterministic 80/10/10 train/val/test assignment (multiplicative hash, map-only)."),

    QueryDef(
      "t_stratified_sample",
      (s, dir) => {
        // Deterministic stratified sampling: up to 50 docs per source,
        // chosen by a multiplicative hash of doc_id — reproducible
        // across engines/runs/cluster sizes (no random(), no
        // partition-dependent sample()). The window shuffles only
        // (doc_id, source, hash); at very hot strata the two-phase
        // bounded-heap pattern (p_queue_head) swaps in without
        // changing results.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("hk"), col("doc_id"))
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            (col("doc_id") % 1000003L * 2654435761L % 1000000L).as("hk"))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 50)
          .select(col("doc_id"), col("source"), col("hk"),
            col("rk").cast("int").as("rk"))
      },
      Some(
        """SELECT doc_id, source, doc_id % 1000003 * 2654435761 % 1000000 AS hk,
          |CAST(rk AS INT) AS rk FROM (
          |  SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY source
          |    ORDER BY doc_id % 1000003 * 2654435761 % 1000000, doc_id) AS rk
          |  FROM documents) WHERE rk <= 50""".stripMargin),
      "Deterministic stratified sample: top-50 per source by multiplicative hash."),

    QueryDef(
      "t_corpus_stats",
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy("lang")
          .agg(
            count("*").as("n_docs"),
            sum("n_chars").as("total_chars"),
            sum(tokenCount(col("text")).cast("long")).as("total_tokens"),
            max("n_chars").as("max_chars")),
      Some(
        """SELECT lang, COUNT(*) AS n_docs,
          |CAST(SUM(n_chars) AS BIGINT) AS total_chars,
          |CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
          |MAX(n_chars) AS max_chars FROM documents GROUP BY lang""".stripMargin),
      "Per-language corpus statistics (integer sums — exact, map-side combinable)."),

    QueryDef(
      "t_unigram_logppl",
      // vocabCap=16 binds BELOW the synthetic corpus's 31-word
      // vocabulary on purpose: the oracle gate then exercises the OOV
      // bucket end-to-end instead of testing a cap that never fires.
      // Production corpora would pass the scale default (65536+).
      (s, dir) => unigramLogPpl(s, dir, vocabCap = 16),
      Some(
        """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
          |freq AS (SELECT word, COUNT(*) AS c FROM w GROUP BY word),
          |tot AS (SELECT SUM(c) AS t FROM freq),
          |top AS (SELECT word, c FROM freq ORDER BY c DESC, word LIMIT 16),
          |q AS (SELECT word, CAST(ROUND(ln(CAST(c AS DOUBLE) / t) * 1000000000) AS BIGINT) AS ql
          |  FROM top, tot),
          |oov AS (SELECT CAST(ROUND(ln(CAST(t - (SELECT SUM(c) FROM top) AS DOUBLE) / t)
          |    * 1000000000) AS BIGINT) AS qloov FROM tot),
          |sc AS (SELECT doc_id, CAST(SUM(COALESCE(ql, qloov)) AS BIGINT) AS s, COUNT(*) AS n
          |  FROM w LEFT JOIN q USING (word), oov GROUP BY doc_id)
          |SELECT doc_id, CAST(n AS INT) AS n_tokens,
          |  -(CAST(s AS DOUBLE) / 1000000000) / n AS avg_neg_logp
          |FROM sc""".stripMargin),
      "Unigram-LM quality score: mean token -log p against a broadcast top-K + OOV model."),

    QueryDef(
      "t_corpus_clean",
      (s, dir) => {
        // The composed training-data cleaning funnel, end to end:
        // quality gate → word-order-insensitive canonical dedup
        // (bag-of-words md5 — catches shuffled near-copies that byte
        // dedup misses) → deterministic keeper (min doc_id) → per-source
        // funnel stats. Scale shape: the keeper election is ONE shuffle
        // on the fingerprint with a map-side-combinable min(struct) — no
        // join back to the corpus — and the two stat aggs output
        // source-cardinality rows.
        val d = t(s, dir, "documents").select(
          col("doc_id"), col("source"),
          tokenCount(col("text")).as("n_tokens"),
          isQuality(col("text")).as("is_quality"),
          md5(concat_ws(" ",
            array_sort(array_distinct(split(lower(col("text")), " "))))).as("fp"))
        val surv = d.where(col("is_quality") === 1)
          .groupBy("fp")
          .agg(min(struct(col("doc_id"), col("source"), col("n_tokens"))).as("k"))
          .groupBy(col("k.source").as("source"))
          .agg(count("*").as("n_unique"),
            sum(col("k.n_tokens")).cast("long").as("total_tokens_clean"))
        d.groupBy("source")
          .agg(count("*").as("n_docs"),
            sum("is_quality").cast("long").as("n_quality"))
          .join(surv, Seq("source"), "left")
          .select(col("source"), col("n_docs"), col("n_quality"),
            coalesce(col("n_unique"), lit(0L)).as("n_unique"),
            coalesce(col("total_tokens_clean"), lit(0L)).as("total_tokens_clean"))
      },
      Some(
        s"""WITH d AS (SELECT doc_id, source,
           |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           |    CAST(CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 10000
           |      AND CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
           |          / CAST(len(string_split(text, ' ')) AS DOUBLE) > 0.05
           |      THEN 1 ELSE 0 END AS INT) AS is_quality,
           |    md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp
           |  FROM documents),
           |surv AS (SELECT source, COUNT(*) AS n_unique,
           |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens_clean FROM (
           |  SELECT source, n_tokens,
           |    ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
           |  FROM d WHERE is_quality = 1) WHERE rk = 1 GROUP BY source)
           |SELECT d.source, COUNT(*) AS n_docs,
           |  CAST(SUM(is_quality) AS BIGINT) AS n_quality,
           |  COALESCE(ANY_VALUE(n_unique), 0) AS n_unique,
           |  COALESCE(ANY_VALUE(total_tokens_clean), 0) AS total_tokens_clean
           |FROM d LEFT JOIN surv ON d.source = surv.source GROUP BY d.source""".stripMargin),
      "End-to-end cleaning funnel: quality gate, bag-of-words dedup, keeper, per-source stats."),

    QueryDef(
      "mm_frame_sample",
      (s, dir) => {
        // runs the REAL partition-batched frame sampler (byte slices at
        // arithmetic offsets stand in for a demuxer) on the "video"
        // payloads; the oracle recomputes index/offset/length from
        // octet_length, so the plumbing — including the slice length —
        // is verified end-to-end
        val videos = graft.multimodal.Multimodal
          .withPayload(t(s, dir, "documents"))
          .where(col("media_type") === "video")
        graft.multimodal.Multimodal.sampleFrames(videos)
          .select(col("doc_id"), col("frame_no"), col("frame_idx"),
            col("frame_off"), length(col("frame_bytes")).cast("int").as("frame_len"))
      },
      Some(
        """WITH p AS (SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n
          |  FROM documents WHERE doc_id % 3 = 2),
          |f AS (SELECT doc_id, n, n % 30 + 1 AS frames, LEAST(4, n % 30 + 1) AS k FROM p)
          |SELECT doc_id, CAST(j AS INT) AS frame_no,
          |  CAST(j * frames // k AS INT) AS frame_idx,
          |  CAST((j * frames // k) * n // frames AS INT) AS frame_off,
          |  CAST(LEAST((j * frames // k) * n // frames + n // frames, n)
          |    - (j * frames // k) * n // frames AS INT) AS frame_len
          |FROM f, LATERAL (SELECT unnest(range(0, k)) AS j) t""".stripMargin),
      "Video frame sampling: evenly spaced frame slices via the partition-batched stub demuxer."),

    QueryDef(
      "t_repetition",
      (s, dir) =>
        // Gopher-style repetition filter: the fraction of a doc's word
        // bigrams that are duplicates, plus the share of its single most
        // frequent bigram. Everything is ROW-LOCAL array arithmetic —
        // at 100 TB this is a pure map stage fused into the scan, no
        // shuffle, no explode. The per-distinct-gram occurrence count
        // is O(g²) in the doc's OWN bigram list (bounded by doc length,
        // not corpus size), which beats a corpus-wide explode+groupBy
        // whose (doc_id, gram) shuffle would dwarf the scan.
        {
          graft.functions.expr.TextExpressions.register(s)
          t(s, dir, "documents")
            .select(col("doc_id"),
              call_function("graft_shingles2", split(col("text"), " ")).as("gs"))
            .select(
              col("doc_id"),
              size(col("gs")).as("n_bigrams"),
              size(array_distinct(col("gs"))).as("n_distinct"),
              // native one-hash-pass max bigram frequency — the
              // interpreted array_max(transform(distinct, g ->
              // size(filter(= g)))) form was O(distinct × n) per doc
              call_function("graft_maxfreq", col("gs")).as("top_bigram_n"))
            .withColumn("dup_frac",
              lit(1.0) - col("n_distinct").cast("double") / col("n_bigrams"))
            .withColumn("is_repetitive", (col("dup_frac") > 0.2).cast("int"))
        },
      Some(
        """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          |g AS (SELECT doc_id,
          |  list_transform(range(len(ws) - 1), i -> ws[i + 1] || ' ' || ws[i + 2]) AS gs FROM d)
          |SELECT doc_id, CAST(len(gs) AS INT) AS n_bigrams,
          |  CAST(len(list_distinct(gs)) AS INT) AS n_distinct,
          |  CAST(list_max(list_transform(list_distinct(gs),
          |    g -> len(list_filter(gs, x -> x = g)))) AS INT) AS top_bigram_n,
          |  1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / len(gs) AS dup_frac,
          |  CAST(CASE WHEN 1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / len(gs) > 0.2
          |    THEN 1 ELSE 0 END AS INT) AS is_repetitive
          |FROM g""".stripMargin),
      "Repetition quality filter: duplicate-bigram fraction + top-bigram share (row-local map)."),

    QueryDef(
      "t_tfidf_topk",
      (s, dir) => {
        // TF-IDF keyword extraction: top-3 terms per doc. Scale shape:
        // the document-frequency model is VOCABULARY-sized and
        // broadcasts into the per-doc term counts (no shuffle of the
        // corpus by word); the only corpus-scale shuffles are the
        // (doc_id, word) partial-count agg (map-side combinable) and
        // the per-doc top-k window. Determinism: idf is quantized to a
        // 1e-9 integer once in the model, score = tf × idf_q is exact
        // integer arithmetic, and ties break on the word itself.
        val words = t(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        val tf = words.groupBy("doc_id", "word").agg(count("*").as("tf"))
        val df_ = tf.groupBy("word").agg(count("*").as("df"))
        val nDocs = t(s, dir, "documents").agg(count("*").as("n"))
        val model = df_.crossJoin(broadcast(nDocs))
          .select(col("word"),
            round(log(col("n").cast("double") / col("df")) * 1000000000)
              .cast("long").as("idf_q"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id")
          .orderBy(col("score_q").desc, col("word").asc)
        tf.join(broadcast(model), "word")
          .select(col("doc_id"), col("word"), col("tf").cast("int").as("tf"),
            (col("tf") * col("idf_q")).as("score_q"))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 3)
          .select(col("doc_id"), col("word"), col("tf"),
            (col("score_q").cast("double") / 1000000000).as("tfidf"),
            col("rk").cast("int").as("rk"))
      },
      Some(
        """WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
          |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY doc_id, word),
          |df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
          |nd AS (SELECT COUNT(*) AS n FROM documents),
          |model AS (SELECT word,
          |  CAST(ROUND(ln(CAST(n AS DOUBLE) / df) * 1000000000) AS BIGINT) AS idf_q
          |  FROM df, nd),
          |sc AS (SELECT doc_id, word, tf, tf * idf_q AS score_q,
          |  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf * idf_q DESC, word) AS rk
          |  FROM tf JOIN model USING (word))
          |SELECT doc_id, word, CAST(tf AS INT) AS tf,
          |  CAST(score_q AS DOUBLE) / 1000000000 AS tfidf, CAST(rk AS INT) AS rk
          |FROM sc WHERE rk <= 3""".stripMargin),
      "TF-IDF top-3 keywords per doc: broadcast vocabulary model, integer-exact scores."),

    QueryDef(
      "t_seq_pack",
      (s, dir) => {
        // Pack-and-chunk sequence packing: concatenate each source's
        // token stream in doc_id order and cut it into fixed L-token
        // training sequences (the GPT-style pack). Each doc's placement
        // is pure prefix-sum arithmetic: start offset, first/last
        // sequence id it lands in, and its offset inside the first
        // sequence. Scale shape: the prefix sum is windowed PER SOURCE,
        // so packing parallelizes across sources (at 100 TB the
        // partition key would be (source, shard) with shard-boundary
        // offsets broadcast — same math, two-phase); no global
        // single-partition window exists in the plan.
        val L = 64L
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            tokenCount(col("text")).cast("long").as("n_tok"))
          .withColumn("cum", sum("n_tok").over(w))
          .select(col("source"), col("doc_id"), col("n_tok"),
            (col("cum") - col("n_tok")).as("start_tok"),
            expr(s"(cum - n_tok) div $L").as("seq_first"),
            expr(s"(cum - 1) div $L").as("seq_last"),
            expr(s"(cum - n_tok) % $L").as("start_off"))
      },
      Some(
        """WITH c AS (SELECT source, doc_id,
          |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
          |  SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
          |    OVER (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
          |  FROM documents)
          |SELECT source, doc_id, n_tok,
          |  CAST(cum - n_tok AS BIGINT) AS start_tok,
          |  CAST((cum - n_tok) // 64 AS BIGINT) AS seq_first,
          |  CAST((cum - 1) // 64 AS BIGINT) AS seq_last,
          |  CAST((cum - n_tok) % 64 AS BIGINT) AS start_off
          |FROM c""".stripMargin),
      "Sequence packing: per-source prefix-sum placement of docs into 64-token training sequences."),

    QueryDef(
      "t_seq_pack_pieces",
      (s, dir) => {
        // The consumer view of t_seq_pack: one row per (sequence, doc
        // piece) — the shard manifest a training loader reads. Each doc
        // explodes into the 1..k sequences it spans, with the token
        // slice [piece_from, piece_from+piece_len) it contributes to
        // that sequence and the offset it lands at. Pure integer math
        // on the same per-source prefix sums; the explode fans out only
        // boundary docs (a doc spanning k sequences emits k rows), so
        // output stays O(docs + sequences), never tokens.
        val L = 64L
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            tokenCount(col("text")).cast("long").as("n_tok"))
          .withColumn("cum", sum("n_tok").over(w))
          .where(col("n_tok") > 0)
          .select(col("source"), col("doc_id"), col("n_tok"),
            (col("cum") - col("n_tok")).as("st"),
            explode(expr(s"sequence((cum - n_tok) div $L, (cum - 1) div $L)"))
              .as("seq_id"))
          .select(col("source"), col("seq_id"), col("doc_id"),
            (greatest(col("st"), col("seq_id") * L) - col("st")).as("piece_from"),
            (least((col("seq_id") + 1) * L, col("st") + col("n_tok")) -
              greatest(col("st"), col("seq_id") * L)).as("piece_len"),
            (greatest(col("st"), col("seq_id") * L) - col("seq_id") * L)
              .as("seq_off"))
      },
      Some(
        """WITH c AS (SELECT source, doc_id,
          |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
          |  SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
          |    OVER (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
          |  FROM documents),
          |p AS (SELECT source, doc_id, n_tok, CAST(cum - n_tok AS BIGINT) AS st,
          |  unnest(range(CAST((cum - n_tok) // 64 AS BIGINT),
          |    CAST((cum - 1) // 64 + 1 AS BIGINT))) AS seq_id
          |  FROM c WHERE n_tok > 0)
          |SELECT source, CAST(seq_id AS BIGINT) AS seq_id, doc_id,
          |  CAST(greatest(st, seq_id * 64) - st AS BIGINT) AS piece_from,
          |  CAST(least((seq_id + 1) * 64, st + n_tok)
          |    - greatest(st, seq_id * 64) AS BIGINT) AS piece_len,
          |  CAST(greatest(st, seq_id * 64) - seq_id * 64 AS BIGINT) AS seq_off
          |FROM p""".stripMargin),
      "Sequence-pack manifest: per-(sequence, doc) token slices a training loader consumes."),

    QueryDef(
      "t_boilerplate",
      (s, dir) => {
        // Corpus-level boilerplate filter (RefinedWeb-style): a 3-gram
        // shingle occurring in >= 10 distinct docs is boilerplate; each
        // doc reports what fraction of its distinct shingles are
        // boilerplate and a keep flag. Scale shape: the shingle→doc-
        // frequency agg is map-side combinable (shingles are distinct
        // per doc row-locally, so no doc_id reaches the shuffle); the
        // qualifying set is the head of a Zipfian distribution —
        // vocabulary-bounded, tiny next to the corpus — and BROADCASTS
        // back for a map-local left join. n_shingles is a row-local
        // array size, so no corpus-sized join-back exists.
        graft.functions.expr.TextExpressions.register(s)
        val base = t(s, dir, "documents")
          .select(col("doc_id"),
            array_distinct(
              call_function("graft_shingles3", split(col("text"), " "))).as("shs"))
        val boiler = base.select(explode(col("shs")).as("s"))
          .groupBy("s").agg(count(lit(1)).as("nd"))
          .where(col("nd") >= 10).select("s").withColumn("b", lit(1))
        base.select(col("doc_id"), size(col("shs")).as("n_shingles"),
            explode(col("shs")).as("s"))
          .join(broadcast(boiler), Seq("s"), "left_outer")
          .groupBy("doc_id", "n_shingles")
          .agg(count(col("b")).cast("int").as("n_boiler"))
          .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
            (col("n_boiler").cast("double") / col("n_shingles")).as("boiler_frac"),
            (col("n_boiler").cast("double") / col("n_shingles") <= 0.5).as("keep"))
      },
      Some(
        """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          |sh AS (SELECT DISTINCT doc_id, s FROM (
          |  SELECT doc_id, unnest(list_transform(range(1, len(ws) - 1),
          |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s FROM w)),
          |boiler AS (SELECT s FROM (SELECT s, COUNT(*) AS nd FROM sh GROUP BY s)
          |  WHERE nd >= 10),
          |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
          |per AS (SELECT sh.doc_id, COUNT(boiler.s) AS n_boiler
          |  FROM sh LEFT JOIN boiler ON sh.s = boiler.s GROUP BY 1)
          |SELECT per.doc_id, CAST(n AS INT) AS n_shingles,
          |  CAST(n_boiler AS INT) AS n_boiler,
          |  CAST(n_boiler AS DOUBLE) / n AS boiler_frac,
          |  CAST(n_boiler AS DOUBLE) / n <= 0.5 AS keep
          |FROM per JOIN cnt ON per.doc_id = cnt.doc_id""".stripMargin),
      "Boilerplate n-gram filter: corpus-frequent shingles broadcast back for per-doc ratios."),

    QueryDef(
      "t_pii_scrub",
      (s, dir) => {
        // PII detection + redaction — the scrubbing stage every
        // curation pipeline runs before training. The fixture corpus
        // is synthetic words, so deterministic PII is INJECTED first
        // (both engines build the identical string from doc_id), then
        // detected and redacted with regexes kept inside the
        // Java-regex ∩ RE2 common subset (no backrefs/lookarounds, so
        // Spark and DuckDB match identically). Counts and the md5 of
        // the redacted text are both oracle-checked — a missed match
        // or over-redaction mismatches. Pure map: detect/replace fuses
        // into the scan, zero shuffle at 100 TB.
        val injected = t(s, dir, "documents").select(col("doc_id"), expr(
          """CASE CAST(doc_id % 4 AS INT)
            | WHEN 0 THEN concat(text, ' reach me at user',
            |   CAST(doc_id AS STRING), '@mail.example.com now')
            | WHEN 1 THEN concat(text, ' call 555-',
            |   lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), ' today')
            | WHEN 2 THEN concat(text, ' see https://w',
            |   CAST(doc_id AS STRING), '.example.org/page')
            | ELSE text END""".stripMargin).as("raw"))
        injected.select(
          col("doc_id"),
          expr("regexp_count(raw, '[a-z0-9.]+@[a-z0-9.]+')")
            .cast("int").as("n_emails"),
          expr("regexp_count(raw, '555-[0-9]{4}')").cast("int").as("n_phones"),
          expr("regexp_count(raw, 'https://[a-z0-9./]+')")
            .cast("int").as("n_urls"),
          md5(expr(
            """regexp_replace(regexp_replace(regexp_replace(raw,
              | '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>'),
              | '555-[0-9]{4}', '<PHONE>'),
              | 'https://[a-z0-9./]+', '<URL>')""".stripMargin))
            .as("redacted_md5"))
      },
      Some(
        """WITH inj AS (SELECT doc_id,
          |  CASE CAST(doc_id % 4 AS INT)
          |   WHEN 0 THEN text || ' reach me at user' || CAST(doc_id AS VARCHAR) || '@mail.example.com now'
          |   WHEN 1 THEN text || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
          |   WHEN 2 THEN text || ' see https://w' || CAST(doc_id AS VARCHAR) || '.example.org/page'
          |   ELSE text END AS raw FROM documents)
          |SELECT doc_id,
          |  CAST(len(regexp_extract_all(raw, '[a-z0-9.]+@[a-z0-9.]+')) AS INT) AS n_emails,
          |  CAST(len(regexp_extract_all(raw, '555-[0-9]{4}')) AS INT) AS n_phones,
          |  CAST(len(regexp_extract_all(raw, 'https://[a-z0-9./]+')) AS INT) AS n_urls,
          |  md5(regexp_replace(regexp_replace(regexp_replace(raw,
          |    '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
          |    '555-[0-9]{4}', '<PHONE>', 'g'),
          |    'https://[a-z0-9./]+', '<URL>', 'g')) AS redacted_md5
          |FROM inj""".stripMargin),
      "PII scrub: regex detection + redaction of injected emails/phones/URLs (pure map)."),

    QueryDef(
      "t_ttr",
      (s, dir) => {
        // Type-token ratio (lexical diversity) — a standard quality
        // signal next to repetition/perplexity: low TTR means the doc
        // repeats a tiny vocabulary. Pure map stage over the scan; the
        // ratio is one double division of two exact ints, so both
        // engines agree bit-for-bit.
        //
        // ASSUMES text IS NOT NULL (a documents-fixture invariant the
        // other t_* queries share): on a NULL text Spark's
        // size(split(NULL)) yields -1/NULL depending on legacy config
        // while DuckDB's len(string_split(NULL)) yields NULL — the
        // engines would diverge before any guard could reconcile them.
        val ws = split(col("text"), " ")
        t(s, dir, "documents").select(
          col("doc_id"),
          size(ws).as("n_tokens"),
          size(array_distinct(ws)).as("n_types"),
          (size(array_distinct(ws)).cast("double") / size(ws)).as("ttr"))
      },
      Some(
        """SELECT doc_id,
          |CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
          |CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_types,
          |CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
          |  / len(string_split(text, ' ')) AS ttr
          |FROM documents""".stripMargin),
      "Type-token ratio: lexical-diversity quality score (map-only)."),

    QueryDef(
      "t_domain_cap",
      (s, dir) =>
        // Per-domain document cap — the Common-Crawl-pipeline step that
        // bounds any one domain's contribution to the corpus: keep only
        // the top-50 docs per source, ranked by length (quality proxy,
        // doc_id tiebreak). Runs on the custom TopKPerKey operator, so
        // each scan partition is heap-pruned to ≤50 rows per source
        // BEFORE the shuffle — at 100 TB the exchange carries
        // k × |domains| rows, never the corpus, and no per-partition
        // full sort exists in the plan (contrast the window-rank form
        // the oracle uses).
        graft.plans.GraftOps.topKPerKey(
          t(s, dir, "documents").select(
            col("source"), col("doc_id"), col("n_chars")),
          Seq("source"), 50, "-n_chars", "+doc_id"),
      Some(
        """SELECT source, doc_id, n_chars FROM (
          |SELECT source, doc_id, n_chars,
          |ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
          |FROM documents) WHERE rk <= 50""".stripMargin),
      "Per-domain cap: heap-pruned exact top-50 docs per source (TopKPerKey, no sort)."),

    QueryDef(
      "t_mix_weights",
      (s, dir) => {
        // Temperature-smoothed source mixing (the multilingual-training
        // p_i ∝ c_i^α rule, α=1/2): per-source token counts → smoothed
        // weight → share of a 10⁹-token training budget. Scale shape:
        // one map-side-combinable count shuffle to source cardinality,
        // then the source-sized frame crossjoins a broadcast 1-row
        // total — no global window, no single-partition stage.
        // Determinism: sqrt(exact long) is correctly rounded in IEEE
        // 754, quantized ONCE to integer 1e-6 units, so the total is an
        // integer sum (any order) and share/alloc are single exact-input
        // double ops in both engines; floor (not cast) avoids the
        // truncate-vs-round-half-even cast mismatch.
        val c = t(s, dir, "documents")
          .groupBy("source")
          .agg(sum(tokenCount(col("text")).cast("long")).as("n_tokens"))
          .select(col("source"), col("n_tokens"),
            round(sqrt(col("n_tokens").cast("double")) * 1000000)
              .cast("long").as("wq"))
        val tot = c.agg(sum("wq").as("tw"))
        c.crossJoin(broadcast(tot))
          .select(col("source"), col("n_tokens"),
            (col("wq").cast("double") / col("tw")).as("share"),
            floor(col("wq").cast("double") / col("tw") * 1000000000L)
              .cast("long").as("alloc_tokens"))
      },
      Some(
        """WITH c AS (SELECT source,
          |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
          |  FROM documents GROUP BY source),
          |w AS (SELECT source, n_tokens,
          |    CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS wq
          |  FROM c)
          |SELECT source, n_tokens,
          |  CAST(wq AS DOUBLE) / (SELECT SUM(wq) FROM w) AS share,
          |  CAST(FLOOR(CAST(wq AS DOUBLE) / (SELECT SUM(wq) FROM w)
          |    * 1000000000) AS BIGINT) AS alloc_tokens
          |FROM w""".stripMargin),
      "Temperature-smoothed (α=1/2) source mixing weights and token-budget allocation."),

    QueryDef(
      "t_dsir_weights",
      (s, dir) => {
        // DSIR-style importance weights (Xie et al., arXiv:2302.03169):
        // score each doc by sum over its tokens of
        // log p_target(w) − log p_raw(w), with the target distribution
        // estimated from the in-domain slice (lang = 'en') and the raw
        // distribution from the whole corpus. High-weight docs are the
        // ones importance resampling keeps. Scale shape: identical to
        // t_unigram_logppl — both unigram models are capped-vocab
        // broadcast maps (top-K raw words; at web scale the cap bounds
        // the broadcast regardless of corpus size), and the per-doc
        // score is a map-side-combinable (doc_id) sum. Determinism:
        // each word's log-ratio is quantized to a 1e-9 integer ONCE in
        // the model (ln of exact-count ratios, add-one smoothing on the
        // target slice so absent words stay finite), so doc sums are
        // integer arithmetic — bit-exact under any aggregation order.
        val vocabCap = 65536
        val w = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("word"))
        val raw = w.groupBy("word").agg(count("*").as("cr"))
        val top = raw.orderBy(col("cr").desc, col("word").asc).limit(vocabCap)
        val tgt = w.where(col("lang") === "en")
          .groupBy("word").agg(count("*").as("ct"))
        val totals = w.agg(
          count("*").as("tr"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tt"))
        val nv = top.agg(count("*").as("v"))
        val model = top.join(tgt, Seq("word"), "left")
          .crossJoin(broadcast(totals)).crossJoin(broadcast(nv))
          .select(col("word"),
            round((log((coalesce(col("ct"), lit(0L)) + 1L).cast("double") /
                (col("tt") + col("v")).cast("double")) -
              log(col("cr").cast("double") / col("tr").cast("double")))
              * 1000000000).cast("long").as("qlr"))
        w.join(broadcast(model), Seq("word"), "left")
          .groupBy("doc_id")
          .agg(sum(coalesce(col("qlr"), lit(0L))).as("s"),
            count("*").cast("int").as("n_tokens"))
          .select(col("doc_id"), col("n_tokens"),
            (col("s").cast("double") / 1000000000 / col("n_tokens"))
              .as("dsir_weight"))
      },
      Some(
        """WITH w AS (SELECT doc_id, lang,
          |    unnest(string_split(text, ' ')) AS word FROM documents),
          |raw AS (SELECT word, COUNT(*) AS cr FROM w GROUP BY word),
          |top AS (SELECT word, cr FROM raw ORDER BY cr DESC, word LIMIT 65536),
          |tgt AS (SELECT word, COUNT(*) AS ct FROM w WHERE lang = 'en' GROUP BY word),
          |tot AS (SELECT COUNT(*) AS tr,
          |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tt FROM w),
          |nv AS (SELECT COUNT(*) AS v FROM top),
          |model AS (SELECT top.word,
          |    CAST(ROUND((ln(CAST(COALESCE(tgt.ct, 0) + 1 AS DOUBLE)
          |        / CAST(tot.tt + nv.v AS DOUBLE))
          |      - ln(CAST(top.cr AS DOUBLE) / CAST(tot.tr AS DOUBLE)))
          |      * 1000000000) AS BIGINT) AS qlr
          |  FROM top LEFT JOIN tgt ON top.word = tgt.word, tot, nv)
          |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens,
          |  CAST(SUM(COALESCE(qlr, 0)) AS DOUBLE) / 1000000000 / COUNT(*)
          |    AS dsir_weight
          |FROM w LEFT JOIN model ON w.word = model.word
          |GROUP BY doc_id""".stripMargin),
      "DSIR importance weights: quantized log p_target/p_raw unigram ratio per doc."),

    QueryDef(
      "t_bigram_logppl",
      (s, dir) => {
        // Interpolated bigram-LM perplexity — the KenLM-shaped upgrade
        // of t_unigram_logppl's filter (CCNet scores with a 5-gram LM;
        // the 2-gram with unigram interpolation is the same machinery
        // at Spark-testable size). Token score at position i ≥ 2:
        //   ln(0.75·c(prev,w)/c(prev) + 0.25·c(w)/T)   [bigram in model]
        //   ln(0.25·c(w)/T)                            [backoff]
        // Both models are capped: top-K unigrams (OOV words score
        // against a residual-mass bucket, as in t_unigram_logppl) and
        // top-K2 bigrams whose prev is in the capped vocab — so the two
        // broadcasts stay O(K) however large the corpus, and every
        // log-prob is quantized to a 1e-9 integer ONCE in the model
        // (all inputs are exact counts, so both engines interpolate the
        // identical double and quantize identically; per-doc sums are
        // then integer arithmetic, bit-exact under any aggregation
        // order). Scale shape: one (bigram) + one (word) broadcast
        // join over the exploded positions, one map-side-combinable
        // (doc_id) sum.
        // fixture-sized caps, same policy as the registered
        // t_unigram_logppl: small enough to BIND on the ~31-word
        // synthetic vocab so the OOV/backoff paths are exercised (and
        // the residual mass stays non-zero); production sizes them to
        // executor memory
        val vocabCap = 16
        val bigramCap = 64
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .where(size(col("ws")) >= 2)
        val pos = docs.select(col("doc_id"),
          explode(expr(
            "transform(sequence(2, size(ws)), i -> " +
              "struct(element_at(ws, i - 1) AS prev, element_at(ws, i) AS w))"))
            .as("p"))
          .select(col("doc_id"), col("p.prev").as("prev"), col("p.w").as("w"))
        val uni = t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy("word").agg(count("*").as("cu"))
        val topU = uni.orderBy(col("cu").desc, col("word").asc).limit(vocabCap)
        val tot = uni.agg(sum("cu").as("t"))
        // backoff term per capped word: qu = round(ln(0.25·cu/T)·1e9)
        val uniModel = topU.crossJoin(broadcast(tot))
          .select(col("word"), col("cu"),
            round(log(lit(0.25) * (col("cu").cast("double") / col("t")))
              * 1000000000).cast("long").as("qu"))
        val oov = topU.agg(sum("cu").as("ck")).crossJoin(tot)
          .select(round(log(lit(0.25) *
            ((col("t") - col("ck")).cast("double") / col("t")))
            * 1000000000).cast("long").as("quoov"))
        val big = pos.groupBy("prev", "w").agg(count("*").as("cb"))
        val topB = big.orderBy(col("cb").desc, col("prev").asc, col("w").asc)
          .limit(bigramCap)
        // interpolated term needs c(prev) and c(w) from the CAPPED
        // vocab: bigrams whose prev or w fell out of it back off
        val bigModel = topB
          .join(uniModel.select(col("word").as("prev"), col("cu").as("cp")), "prev")
          .join(uniModel.select(col("word").as("w"), col("cu").as("cw")), "w")
          .crossJoin(broadcast(tot))
          .select(col("prev"), col("w"),
            round(log(lit(0.75) * (col("cb").cast("double") / col("cp")) +
              lit(0.25) * (col("cw").cast("double") / col("t")))
              * 1000000000).cast("long").as("qb"))
        pos
          .join(broadcast(bigModel), Seq("prev", "w"), "left")
          .join(broadcast(uniModel.select(col("word").as("w"), col("qu"))),
            Seq("w"), "left")
          .crossJoin(broadcast(oov))
          .select(col("doc_id"),
            coalesce(col("qb"), col("qu"), col("quoov")).as("q"))
          .groupBy("doc_id")
          .agg(sum("q").as("sq"), count("*").cast("int").as("n_scored"))
          .select(col("doc_id"), col("n_scored"),
            (-(col("sq").cast("double") / 1000000000) / col("n_scored"))
              .as("avg_neg_logp"))
      },
      Some(
        """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
          |    FROM documents WHERE len(string_split(text, ' ')) >= 2),
          |pos AS (SELECT doc_id, ws[i - 1] AS prev, ws[i] AS w
          |  FROM (SELECT doc_id, ws, unnest(range(2, len(ws) + 1)) AS i FROM d)),
          |uni AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
          |uc AS (SELECT word, COUNT(*) AS cu FROM uni GROUP BY word),
          |topu AS (SELECT word, cu FROM uc ORDER BY cu DESC, word LIMIT 16),
          |tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS t FROM uc),
          |um AS (SELECT word, cu,
          |    CAST(ROUND(ln(0.25 * (CAST(cu AS DOUBLE) / t)) * 1000000000)
          |      AS BIGINT) AS qu
          |  FROM topu, tot),
          |oov AS (SELECT CAST(ROUND(ln(0.25 *
          |      (CAST(t - (SELECT SUM(cu) FROM topu) AS DOUBLE) / t))
          |      * 1000000000) AS BIGINT) AS quoov FROM tot),
          |bc AS (SELECT prev, w, COUNT(*) AS cb FROM pos GROUP BY prev, w),
          |topb AS (SELECT prev, w, cb FROM bc ORDER BY cb DESC, prev, w LIMIT 64),
          |bm AS (SELECT topb.prev, topb.w,
          |    CAST(ROUND(ln(0.75 * (CAST(cb AS DOUBLE) / up.cu)
          |      + 0.25 * (CAST(uw.cu AS DOUBLE) / t)) * 1000000000)
          |      AS BIGINT) AS qb
          |  FROM topb JOIN um up ON topb.prev = up.word
          |  JOIN um uw ON topb.w = uw.word, tot)
          |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_scored,
          |  -(CAST(SUM(COALESCE(bm.qb, um.qu, (SELECT quoov FROM oov)))
          |      AS DOUBLE) / 1000000000) / COUNT(*) AS avg_neg_logp
          |FROM pos
          |LEFT JOIN bm ON pos.prev = bm.prev AND pos.w = bm.w
          |LEFT JOIN um ON pos.w = um.word
          |GROUP BY doc_id""".stripMargin),
      "Interpolated bigram-LM perplexity filter: capped broadcast models, quantized scores."),

    QueryDef(
      "t_compression_ratio",
      (s, dir) => {
        // Compression-ratio quality signal (the CCNet/RefinedWeb
        // heuristic): estimated compressed size / raw size. Boilerplate
        // and template spam compress to a small fraction of their
        // size; diverse prose does not — a one-number repetition
        // detector orthogonal to t_repetition's n-gram counts. The
        // size estimate is the ORDER-0 ENTROPY CODE in pure integer
        // arithmetic (CompressBitsQ: Σ c_w · bitlen(n/c_w) over token
        // counts — within 1 bit/token of Shannon-optimal, the same
        // ordering DEFLATE produces) precisely so the signal has an
        // EXACT DuckDB oracle — the real-zlib variant
        // (deflateCompressionRatio below, graft_deflate_len) stays
        // available for production corpora, but no SQL engine can
        // oracle DEFLATE, and every registry entry must be
        // hash-checkable. Pure map stage fused into the scan — zero
        // shuffle at any scale; ratio emitted as integer permille
        // (est_bits·1000 div raw_bits), no float division to disagree
        // on.
        graft.functions.expr.TextExpressions.register(s)
        val ws = split(col("text"), " ")
        t(s, dir, "documents").select(
          col("doc_id"),
          length(col("text").cast("binary")).cast("long").as("n_bytes"),
          size(ws).cast("long").as("n_tokens"),
          call_function("graft_compress_bits", ws).as("est_bits"))
          .withColumn("ratio_permille",
            expr("est_bits * 1000 div (n_bytes * 8)"))
      },
      Some(
        """WITH w AS (SELECT doc_id, strlen(text) AS n_bytes,
          |    string_split(text, ' ') AS ws FROM documents),
          |c AS (SELECT doc_id, n_bytes, len(ws) AS n,
          |    list_transform(list_distinct(ws),
          |      u -> len(list_filter(ws, x -> x = u))) AS cs FROM w),
          |e AS (SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
          |    CAST(n AS BIGINT) AS n_tokens,
          |    CAST(list_sum(list_transform(cs,
          |      c -> c * length(to_base(n // c, 2)))) AS BIGINT) AS est_bits
          |  FROM c)
          |SELECT doc_id, n_bytes, n_tokens, est_bits,
          |  est_bits * 1000 // (n_bytes * 8) AS ratio_permille FROM e""".stripMargin),
      "Compression-ratio quality signal: integer order-0 entropy-code size per doc (map-only)."),

    QueryDef(
      "t_rule_funnel",
      (s, dir) => {
        // Gopher-style quality-rule FUNNEL observability: apply the
        // filter cascade in order (min length → type-token ratio →
        // top-word frequency → mean word length) and report, per
        // stage, how many docs entered, failed, and survived — the
        // per-rule attrition table every corpus-cleaning run publishes
        // before anyone trusts its output size. Exactness: every
        // threshold is an INTEGER cross-ratio (ttr < 0.35 ⟺ 20·u <
        // 7·n) so both engines compare exact integers, never doubles.
        // Scale shape: all flags are row-local (top-word frequency via
        // the native one-pass MaxFreq expression — not the interpreted
        // O(words²) HOF composition), folded by ONE map-side-combinable
        // aggregation into a single row; the 4-stage unpivot is
        // driver-trivial.
        graft.functions.expr.TextExpressions.register(s)
        val ws = split(col("text"), " ")
        val flags = t(s, dir, "documents")
          .select(
            size(ws).as("n"),
            size(array_distinct(ws)).as("u"),
            (length(col("text")) - (size(ws) - 1)).as("chars"),
            call_function("graft_maxfreq", ws).as("top"))
          .select(
            (col("n") < 20).cast("int").as("f1"),
            (col("u") * 20 < col("n") * 7).cast("int").as("f2"),
            (col("top") * 25 > col("n") * 3).cast("int").as("f3"),
            (col("chars") > col("n") * 5).cast("int").as("f4"))
        val a = flags.agg(
          count(lit(1)).as("n0"),
          sum("f1").as("x1"),
          sum(when(col("f1") === 0 && col("f2") === 1, 1L)
            .otherwise(0L)).as("x2"),
          sum(when(col("f1") === 0 && col("f2") === 0 && col("f3") === 1, 1L)
            .otherwise(0L)).as("x3"),
          sum(when(col("f1") === 0 && col("f2") === 0 && col("f3") === 0 &&
            col("f4") === 1, 1L).otherwise(0L)).as("x4"))
        a.select(explode(array(
            struct(lit(1).as("stage"), lit("min_len").as("rule"),
              col("n0").as("n_in"), col("x1").as("n_fail")),
            struct(lit(2).as("stage"), lit("ttr").as("rule"),
              (col("n0") - col("x1")).as("n_in"), col("x2").as("n_fail")),
            struct(lit(3).as("stage"), lit("top_freq").as("rule"),
              (col("n0") - col("x1") - col("x2")).as("n_in"),
              col("x3").as("n_fail")),
            struct(lit(4).as("stage"), lit("mean_wlen").as("rule"),
              (col("n0") - col("x1") - col("x2") - col("x3")).as("n_in"),
              col("x4").as("n_fail")))).as("r"))
          .select(col("r.stage"), col("r.rule"), col("r.n_in"),
            col("r.n_fail"), (col("r.n_in") - col("r.n_fail")).as("n_out"))
      },
      Some(
        """WITH d AS (SELECT len(string_split(text, ' ')) AS n,
          |    len(list_distinct(string_split(text, ' '))) AS u,
          |    length(text) - (len(string_split(text, ' ')) - 1) AS chars,
          |    list_max(list_transform(list_distinct(string_split(text, ' ')),
          |      w -> len(list_filter(string_split(text, ' '), x -> x = w)))) AS top
          |  FROM documents),
          |f AS (SELECT CAST(n < 20 AS INT) AS f1, CAST(u * 20 < n * 7 AS INT) AS f2,
          |    CAST(top * 25 > n * 3 AS INT) AS f3, CAST(chars > n * 5 AS INT) AS f4 FROM d),
          |a AS (SELECT COUNT(*) AS n0, CAST(SUM(f1) AS BIGINT) AS x1,
          |    CAST(SUM(CASE WHEN f1 = 0 AND f2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS x2,
          |    CAST(SUM(CASE WHEN f1 = 0 AND f2 = 0 AND f3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS x3,
          |    CAST(SUM(CASE WHEN f1 = 0 AND f2 = 0 AND f3 = 0 AND f4 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS x4 FROM f)
          |SELECT 1 AS stage, 'min_len' AS rule, n0 AS n_in, x1 AS n_fail, n0 - x1 AS n_out FROM a
          |UNION ALL SELECT 2, 'ttr', n0 - x1, x2, n0 - x1 - x2 FROM a
          |UNION ALL SELECT 3, 'top_freq', n0 - x1 - x2, x3, n0 - x1 - x2 - x3 FROM a
          |UNION ALL SELECT 4, 'mean_wlen', n0 - x1 - x2 - x3, x4, n0 - x1 - x2 - x3 - x4 FROM a""".stripMargin),
      "Quality-rule funnel: per-stage entered/failed/survived counts for the filter cascade."),

    QueryDef(
      "t_weighted_sample",
      (s, dir) => {
        // Weight-proportional corpus sampling without replacement —
        // Efraimidis-Spirakis (2006) via the Gumbel-exponent trick:
        // priority = ln(u)/w for a per-doc deterministic uniform u,
        // global top-k by priority IS a w-proportional sample. u comes
        // from the t_split_assign integer hash recipe (identical
        // arithmetic in both engines, never a float RNG), priorities
        // are 1e-9-quantized to integers (the t_dsir_weights ln-ulp
        // policy), and the top-100 runs as TakeOrderedAndProject —
        // per-partition heaps + a k-row driver merge, no global sort,
        // the same plan shape at any corpus size. The id is pre-reduced
        // mod 1000003 before the Knuth multiply (the mm_manifest /
        // t_split_assign guard): 1000003·2654435761 < 2^63, so the
        // product can never wrap for ANY doc_id — mathematically the
        // same residue ((a·M) mod P == ((a mod P)·M) mod P), but an
        // unguarded multiply wraps (negative u → null ln) in Spark at
        // doc_id ≳ 3.5e9 while DuckDB errors on BIGINT overflow.
        val u = (col("doc_id") % 1000003L * 2654435761L % 1000003L + 1L) /
          lit(1000003.0)
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"),
            round(log(u) / col("n_chars") * 1e9).cast("long").as("pq"))
          .orderBy(col("pq").desc, col("doc_id").asc)
          .limit(100)
      },
      Some(
        """WITH d AS (SELECT doc_id, source, n_chars,
          |    (doc_id % 1000003 * 2654435761 % 1000003 + 1) / 1000003.0 AS u FROM documents)
          |SELECT doc_id, source, n_chars,
          |  CAST(ROUND(ln(u) / n_chars * 1000000000) AS BIGINT) AS pq
          |FROM d ORDER BY pq DESC, doc_id LIMIT 100""".stripMargin),
      "Weight-proportional sample (Efraimidis-Spirakis top-k, deterministic hash uniforms)."),

    QueryDef(
      "t_word_entropy",
      (s, dir) => {
        // Shannon word entropy per doc — the lexical-diversity signal
        // that, unlike TTR, weighs HOW unevenly words repeat (spam
        // with one word looping scores near 0 at any length). Zero
        // shuffle: the native WordEntropyQ expression does the count
        // map + quantized fold in one pass per row; per-TERM 1e-9
        // integer quantization makes the sum order-free, so no
        // float-sum ordering contract is needed between engines.
        graft.functions.expr.TextExpressions.register(s)
        val ws = split(col("text"), " ")
        t(s, dir, "documents")
          .select(col("doc_id"), size(ws).as("n_tokens"),
            call_function("graft_entropy_q", ws).as("q"))
          .select(col("doc_id"), col("n_tokens"),
            (-col("q").cast("double") / lit(1000000000.0)).as("entropy"))
      },
      Some(
        """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
          |SELECT doc_id, CAST(len(ws) AS INT) AS n_tokens,
          |  -CAST(CAST(list_sum(list_transform(list_distinct(ws),
          |    t -> CAST(ROUND(len(list_filter(ws, x -> x = t)) / CAST(len(ws) AS DOUBLE)
          |      * ln(len(list_filter(ws, x -> x = t)) / CAST(len(ws) AS DOUBLE))
          |      * 1000000000.0) AS BIGINT))) AS BIGINT) AS DOUBLE) / 1000000000.0 AS entropy
          |FROM w""".stripMargin),
      "Shannon word entropy per doc (native one-pass expression, quantized order-free fold)."),

    QueryDef(
      "t_bpe_merge",
      (s, dir) => {
        // One distributed BPE merge iteration — the inner loop of
        // tokenizer TRAINING (Sennrich et al. 2016), as opposed to
        // t_token_bpe which only counts with a trained-tokenizer-shaped
        // segmentation. Classic formulation: collapse the corpus to a
        // (word → frequency) table, extract every adjacent symbol pair
        // from each vocabulary entry, weight by the word's corpus
        // frequency, and rank pairs by total count; the top pair is the
        // merge the trainer would apply next (we emit the top 10 — the
        // full candidate list a batched trainer merges per round).
        //
        // Scale shape (100 TB): the ONLY corpus-scale stage is the
        // (word) count — map-side combinable, shuffling one (word,
        // partial) row per distinct word per partition. Pair extraction
        // runs on the REDUCED vocabulary (millions of rows, not
        // trillions of tokens), so the higher-order transform's
        // CodegenFallback cost is vocabulary-bounded; the pair count is
        // again map-side combinable over a ~|alphabet|² key space, and
        // the final ranking is TakeOrderedAndProject (K-bounded, no
        // global sort). Determinism: pure integer counts; ties break on
        // the pair string in both engines.
        val wf = t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .where(length(col("word")) >= 2)
          .groupBy("word").agg(count("*").as("f"))
        val pc = wf
          .select(
            explode(expr(
              "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
              .as("pair"),
            col("f"))
          .groupBy("pair").agg(sum("f").as("cnt"))
        val top = pc.orderBy(col("cnt").desc, col("pair").asc).limit(10)
        top.withColumn("rk",
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy(col("cnt").desc, col("pair").asc)).cast("int"))
      },
      Some(
        """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
          |wf AS (SELECT word, COUNT(*) AS f FROM w WHERE len(word) >= 2 GROUP BY word),
          |p AS (SELECT substr(word, CAST(i AS INT), 2) AS pair, f FROM
          |  (SELECT word, f, unnest(generate_series(1, len(word) - 1)) AS i FROM wf)),
          |pc AS (SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt FROM p GROUP BY pair),
          |r AS (SELECT pair, cnt,
          |  ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS rk FROM pc)
          |SELECT pair, cnt, CAST(rk AS INT) AS rk FROM r WHERE rk <= 10""".stripMargin),
      "One BPE merge iteration: vocabulary-weighted adjacent-pair counts, top-10 merges."),

    QueryDef(
      "t_bm25_topk",
      (s, dir) => {
        // BM25 retrieval (k1=1.2, b=0.75, Lucene idf) — the ranking
        // side of a training-data search/inspection index, vs
        // t_tfidf_topk's per-doc keyword EXTRACTION. The query is
        // self-contained: the corpus's 3 highest-document-frequency
        // words of length >= 4 (a deterministic stand-in for a user
        // query; the operator is the same for any term set).
        //
        // Scale shape (100 TB): term frequencies and doc lengths are
        // each ONE map-side-combinable shuffle of the corpus; the query
        // model (3 terms + idf) and the corpus stats (one row) are
        // broadcast, so scoring touches only the posting rows of the
        // query terms (tf ⋈ broadcast qterms), never the full matrix;
        // the doc-length join co-partitions on doc_id with the tf agg;
        // the final top-10 is TakeOrderedAndProject. Determinism: idf
        // is 1e-9-ROUND-quantized once in the model; the per-(doc,term)
        // BM25 kernel is a scalar IEEE chain with IDENTICAL
        // parenthesization in both engines (exact-rounded ops on equal
        // inputs ⇒ equal doubles) that is ROUND-quantized to a BIGINT,
        // so the per-doc sum is integer arithmetic — order-free.
        val tok = t(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        val tf = tok.groupBy("doc_id", "word").agg(count("*").as("tf"))
        val dfq = tf.groupBy("word").agg(count("*").as("df"))
        val qt = dfq.where(length(col("word")) >= 4)
          .orderBy(col("df").desc, col("word").asc).limit(3)
        val dl = tok.groupBy("doc_id").agg(count("*").as("dl"))
        val st = dl.agg(
          (sum("dl").cast("double") / count("*").cast("double")).as("avgdl"),
          count("*").as("nd"))
        val idf = qt.crossJoin(broadcast(st))
          .select(col("word"),
            round(log(lit(1.0) + (col("nd") - col("df") + lit(0.5))
              / (col("df") + lit(0.5))) * 1000000000).cast("long").as("idf_q"))
        val sc = tf.join(broadcast(idf), "word")
          .join(dl, "doc_id")
          .crossJoin(broadcast(st.select("avgdl")))
          .select(col("doc_id"),
            round(col("idf_q").cast("double") * (col("tf") * lit(2.2))
              / (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75)
                + lit(0.75) * col("dl") / col("avgdl")))).cast("long").as("cq"))
          .groupBy("doc_id")
          .agg(sum("cq").as("score_q"), count("*").as("n_terms"))
        sc.orderBy(col("score_q").desc, col("doc_id").asc).limit(10)
          .withColumn("rk",
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy(col("score_q").desc, col("doc_id").asc)).cast("int"))
          .select(col("doc_id"),
            (col("score_q").cast("double") / 1000000000).as("bm25"),
            col("n_terms").cast("int").as("n_terms"), col("rk"))
      },
      Some(
        """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
          |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word),
          |dfq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
          |qt AS (SELECT word, df FROM dfq WHERE len(word) >= 4
          |  ORDER BY df DESC, word LIMIT 3),
          |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
          |st AS (SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
          |  COUNT(*) AS nd FROM dl),
          |idf AS (SELECT word, CAST(ROUND(ln(1.0 + (nd - df + 0.5) / (df + 0.5))
          |  * 1000000000) AS BIGINT) AS idf_q FROM qt, st),
          |sc AS (SELECT tf.doc_id,
          |    SUM(CAST(ROUND(CAST(idf_q AS DOUBLE) * (tf * 2.2)
          |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))) AS BIGINT)) AS score_q,
          |    COUNT(*) AS n_terms
          |  FROM tf JOIN idf USING (word) JOIN dl ON tf.doc_id = dl.doc_id, st
          |  GROUP BY tf.doc_id),
          |r AS (SELECT doc_id, score_q, n_terms,
          |  ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id) AS rk FROM sc)
          |SELECT doc_id, CAST(score_q AS DOUBLE) / 1000000000 AS bm25,
          |  CAST(n_terms AS INT) AS n_terms, CAST(rk AS INT) AS rk
          |FROM r WHERE rk <= 10""".stripMargin),
      "BM25 top-10 retrieval: broadcast 3-term query model, quantized order-free scoring."),

    QueryDef(
      "t_ppl_buckets",
      (s, dir) => {
        // CCNet-style perplexity bucketing (Wenzek et al. 2020): split
        // the corpus into head / middle / tail THIRDS of the
        // unigram-LM quality score — the partition CCNet feeds to
        // downstream sampling (train mostly on head+middle, keep tail
        // for diversity). Scale shape: the tertile CUTOFFS come from
        // ONE percentile aggregate (a single broadcast row), and
        // assignment is a row-local comparison — deliberately NOT an
        // ntile window, whose global sort moves the whole corpus to
        // one partition. The exact `percentile` here buffers the
        // group's values in one reducer — the oracle-verifiable
        // stand-in; at 100 TB the cutoff source is the mergeable
        // `approx_percentile` t-digest (CCNet itself uses sampled
        // thresholds), with the rest of the plan unchanged.
        // Determinism: avg_neg_logp is the integer-
        // quantized unigram score (bit-exact both engines); Spark's
        // exact `percentile` and DuckDB's `quantile_cont` share the
        // same linear interpolation on identical doubles.
        val sc = unigramLogPpl(s, dir, vocabCap = 16)
        val cuts = sc.agg(
          expr("percentile(avg_neg_logp, 1.0/3)").as("p33"),
          expr("percentile(avg_neg_logp, 2.0/3)").as("p66"))
        sc.crossJoin(broadcast(cuts))
          .select(col("doc_id"), col("avg_neg_logp"),
            when(col("avg_neg_logp") <= col("p33"), "head")
              .when(col("avg_neg_logp") <= col("p66"), "middle")
              .otherwise("tail").as("bucket"))
      },
      Some(
        """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
          |freq AS (SELECT word, COUNT(*) AS c FROM w GROUP BY word),
          |tot AS (SELECT SUM(c) AS t FROM freq),
          |top AS (SELECT word, c FROM freq ORDER BY c DESC, word LIMIT 16),
          |q AS (SELECT word, CAST(ROUND(ln(CAST(c AS DOUBLE) / t) * 1000000000) AS BIGINT) AS ql
          |  FROM top, tot),
          |oov AS (SELECT CAST(ROUND(ln(CAST(t - (SELECT SUM(c) FROM top) AS DOUBLE) / t)
          |    * 1000000000) AS BIGINT) AS qloov FROM tot),
          |sc AS (SELECT doc_id, -(CAST(CAST(SUM(COALESCE(ql, qloov)) AS BIGINT) AS DOUBLE)
          |    / 1000000000) / COUNT(*) AS avg_neg_logp
          |  FROM w LEFT JOIN q USING (word), oov GROUP BY doc_id),
          |cuts AS (SELECT quantile_cont(avg_neg_logp, 1.0/3) AS p33,
          |    quantile_cont(avg_neg_logp, 2.0/3) AS p66 FROM sc)
          |SELECT doc_id, avg_neg_logp,
          |  CASE WHEN avg_neg_logp <= p33 THEN 'head'
          |       WHEN avg_neg_logp <= p66 THEN 'middle'
          |       ELSE 'tail' END AS bucket
          |FROM sc, cuts""".stripMargin),
      "CCNet perplexity thirds: one percentile aggregate broadcast, row-local assignment."),

    QueryDef(
      "mm_manifest",
      (s, dir) => {
        // Multimodal training-record assembly: the manifest join that
        // packs one training sample per document — text metadata, the
        // aligned embedding's norm, the media-presence flag, and a
        // deterministic shard assignment for the downstream writer.
        // Scale shape: ONE equi-join on the id (both sides shuffle by
        // the key once — or zero times when the lake bucketed them);
        // everything else is row-local arithmetic. Determinism: the
        // norm is the codegen'd sequential-fold dot (== DuckDB
        // list_dot_product, the verified convention); sqrt is an
        // exact-rounded IEEE op on an identical double; the shard is a
        // Knuth multiplicative hash on the id — pure integers.
        graft.functions.VectorFunctions.register(s)
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"),
            call_function("graft_dot",
              col("embedding").cast("array<double>"),
              col("embedding").cast("array<double>")).as("e2"))
        t(s, dir, "documents")
          .join(emb, col("doc_id") === col("vec_id"), "left")
          .select(col("doc_id"), col("source"), col("n_chars"),
            (col("doc_id") % 3 === 0).cast("int").as("has_image"),
            sqrt(col("e2")).as("emb_norm"),
            // pre-reduce mod 1000003 before the Knuth multiply (the
            // t_split_assign convention): 1000003·2654435761 < 2^63,
            // so the product can never wrap for ANY doc_id — an
            // unguarded multiply wraps (negative shard) in Spark while
            // DuckDB errors on BIGINT overflow, a cross-engine split
            (col("doc_id") % 1000003L * 2654435761L % 16).cast("int").as("shard"))
      },
      Some(
        """SELECT doc_id, source, n_chars,
          |CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT) AS has_image,
          |sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
          |  CAST(embedding AS DOUBLE[]))) AS emb_norm,
          |CAST(doc_id % 1000003 * 2654435761 % 16 AS INT) AS shard
          |FROM documents LEFT JOIN embeddings ON doc_id = vec_id""".stripMargin),
      "Training-manifest assembly: doc ⋈ embedding, media flag, norm, shard routing."),

    QueryDef(
      "t_pmi_colloc",
      (s, dir) => {
        // Pointwise-mutual-information collocations — the classic
        // phrase-mining signal (Church & Hanks 1990) for tokenizer
        // vocab construction and n-gram merges:
        //   pmi(w1,w2) = ln( p(w1,w2) / (p(w1)·p(w2)) )
        //             = ln( c12·T·T / (N·c1·c2) ).
        // Scale shape: bigram and unigram counts are both map-side
        // combinable word-key shuffles; the min-count filter (c12>=5)
        // runs BEFORE the two unigram joins, so only surviving
        // collocations — a vanishing fraction of the bigram space —
        // ever join; the two 1-row totals broadcast. Determinism: the
        // emitted score is the RATIO ITSELF in integer ppm (ln is
        // monotone, so the ranking is identical) computed with pure
        // integer multiply/div in a pinned operand order — no ln() at
        // all, so no ulp-of-a-quantization-boundary risk between
        // Math.log and libm (the earlier round(ln·1e9) form was exact
        // on this corpus but one boundary-straddling double away from
        // a flaky oracle). Headroom: the multiplies run in
        // DECIMAL(38,0) (oracle side: HUGEINT) — c12·T·10⁶ wraps int64
        // once c12·T > 9.2e12 (c12 ≈ 92 at T ≈ 10⁸), i.e. any frequent
        // bigram on a realistic corpus, and non-ANSI Spark wraps
        // SILENTLY where DuckDB errors; 128-bit intermediates hold to
        // c12·T ≈ 10³² — beyond any corpus. The `div` steps still
        // return bigint, so the output schema is unchanged. Consumers
        // wanting the float PMI take ln(ppm/1e6) locally from the
        // emitted counts.
        val d = t(s, dir, "documents")
        // ONE corpus scan feeds everything unigram-side: the word-count
        // table is cached (vocab-sized — orders of magnitude below the
        // corpus) and re-read for T and both collocation joins; the
        // bigram total needs NO second pass because every doc emits
        // exactly len(ws)-1 bigrams and len(ws)>=1 always (split("")
        // = [""]), so N = T - |docs| identically.
        val uc = d.select(explode(split(col("text"), " ")).as("word"))
          .groupBy("word").agg(count("*").as("c")).cache()
        uc.count() // populate BEFORE the total/u1/u2 legs race it
        val docs = d.agg(count("*").as("d"))
        val tot = uc.agg(sum("c").as("t"))
        val bc = d.where(size(split(col("text"), " ")) >= 2)
          .select(split(col("text"), " ").as("ws"))
          .select(explode(transform(
            sequence(lit(1), size(col("ws")) - 1),
            i => struct(
              element_at(col("ws"), i).as("w1"),
              element_at(col("ws"), i + 1).as("w2")))).as("p"))
          .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
          .groupBy("w1", "w2").agg(count("*").as("c12"))
          .where(col("c12") >= 5)
        val nTot = tot.crossJoin(docs).select((col("t") - col("d")).as("n"))
        bc.join(uc.withColumnRenamed("word", "w1").withColumnRenamed("c", "c1"), "w1")
          .join(uc.withColumnRenamed("word", "w2").withColumnRenamed("c", "c2"), "w2")
          .crossJoin(broadcast(tot)).crossJoin(broadcast(nTot))
          .select(col("w1"), col("w2"), col("c12").cast("int").as("c12"),
            expr("""cast(cast(c12 as decimal(38,0)) * t * 1000000 div n
                   |  as decimal(38,0)) * t
                   |  div (cast(c1 as decimal(38,0)) * c2)""".stripMargin)
              .as("pmi_ratio_ppm"))
      },
      Some(
        """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
          |uc AS (SELECT word, COUNT(*) AS c FROM toks GROUP BY 1),
          |w AS (SELECT string_split(text, ' ') AS ws FROM documents
          |      WHERE len(string_split(text, ' ')) >= 2),
          |bg AS (SELECT ws[i] AS w1, ws[i+1] AS w2
          |       FROM w, unnest(range(1, len(ws))) AS ti(i)),
          |bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2
          |       HAVING COUNT(*) >= 5)
          |SELECT w1, w2, CAST(c12 AS INT) AS c12,
          |  CAST(((CAST(c12 AS HUGEINT) * (SELECT COUNT(*) FROM toks) * 1000000)
          |      // (SELECT COUNT(*) FROM bg))
          |    * (SELECT COUNT(*) FROM toks) // (CAST(u1.c AS HUGEINT) * u2.c)
          |    AS BIGINT) AS pmi_ratio_ppm
          |FROM bc JOIN uc u1 ON bc.w1 = u1.word
          |        JOIN uc u2 ON bc.w2 = u2.word""".stripMargin),
      "PMI collocation mining: integer-ppm c12·T²/(N·c1·c2) ratio, min-count 5."),

    QueryDef(
      "t_cms_heavy",
      (s, dir) => {
        // Count-min-sketch heavy hitters: a 4×512 integer sketch built
        // from EXACT word counts (add c to cell (r, h_r(w)) for each of
        // 4 hash rows), then the top-20 exact heavy hitters re-queried
        // against it — est = min_r cell[r][h_r(w)], always >= exact
        // (the CMS one-sided error). The 4 row hashes are carved from
        // one md5 per word at hex offsets 1/9/17/25 — the same
        // k-hashes-from-one-digest trick as the MinHash bands, and the
        // cross-engine integer bridge is conv(hex,16,10) ==
        // CAST('0x'||hex AS BIGINT). Scale shape: word counts are the
        // map-side-combinable shuffle; the sketch is a CONSTANT 2048
        // cells regardless of corpus size (the entire point of CMS at
        // 100 TB — it broadcasts anywhere); top-k is
        // TakeOrderedAndProject; the final probe joins 80 rows.
        val offs = Seq(1, 9, 17, 25)
        def buckets(w: org.apache.spark.sql.Column) =
          posexplode(array(offs.map(o =>
            conv(substring(md5(w), o, 8), 16, 10).cast("long") % 512): _*))
        // cached: the vocab-sized count table feeds both the sketch
        // build and the exact top-k — one corpus scan, not two
        val wc = t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("w"))
          .groupBy("w").agg(count("*").as("c")).cache()
        wc.count() // populate BEFORE the sketch/top stages race it
        val sketch = wc
          .select(col("c"), buckets(col("w")).as(Seq("r", "bucket")))
          .groupBy("r", "bucket").agg(sum("c").as("cell"))
        val top = wc.orderBy(col("c").desc, col("w").asc).limit(20)
        top.select(col("w"), col("c"), buckets(col("w")).as(Seq("r", "bucket")))
          .join(sketch, Seq("r", "bucket"))
          .groupBy("w", "c").agg(min("cell").as("est"))
          .select(col("w"), col("c").as("c_exact"), col("est").as("cms_est"),
            (col("est") - col("c")).as("overcount"))
      },
      Some(
        """WITH wc AS (SELECT w, COUNT(*) AS c FROM
          |  (SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY 1),
          |h AS (SELECT w, c, r, CAST(concat('0x', substr(md5(w),
          |    CASE r WHEN 0 THEN 1 WHEN 1 THEN 9 WHEN 2 THEN 17 ELSE 25 END, 8))
          |    AS BIGINT) % 512 AS bucket
          |  FROM wc, unnest([0, 1, 2, 3]) AS tr(r)),
          |sk AS (SELECT r, bucket, SUM(c) AS cell FROM h GROUP BY 1, 2),
          |top AS (SELECT w, c FROM wc ORDER BY c DESC, w LIMIT 20)
          |SELECT top.w, CAST(top.c AS BIGINT) AS c_exact,
          |  CAST(MIN(cell) AS BIGINT) AS cms_est,
          |  CAST(MIN(cell) - top.c AS BIGINT) AS overcount
          |FROM top JOIN h ON top.w = h.w
          |         JOIN sk ON h.r = sk.r AND h.bucket = sk.bucket
          |GROUP BY top.w, top.c""".stripMargin),
      "Count-min-sketch (4×512) heavy hitters: exact top-20 vs sketch estimate."),

    QueryDef(
      "t_shard_shuffle",
      (s, dir) =>
        // Deterministic global shuffle for training-shard writes: a
        // seeded multiplicative hash gives every doc a pseudo-random
        // sort key, docs route to shard = key%8, and `pos` is the
        // within-shard write order. This is the relational statement of
        // `repartition(nShards).sortWithinPartitions(key)` — the
        // standard reproducible-shuffle pattern for dataset epochs
        // (reshuffle = change the seed constant). Scale shape: ONE
        // hash-partition shuffle + in-partition sort; no global sort,
        // no skew (the hash is uniform); shard count scales with the
        // corpus so each window partition is one output file's worth.
        // The pre-reduce % 1000003 before the Knuth multiply is the
        // t_split_assign overflow guard (product < 2^63 always).
        t(s, dir, "documents")
          .select(col("doc_id"),
            (col("doc_id") % 1000003L * 2654435761L % 1048573L).as("k"))
          .select(col("doc_id"), (col("k") % 8).cast("int").as("shard"),
            row_number().over(Window.partitionBy(col("k") % 8)
              .orderBy(col("k"), col("doc_id"))).as("pos")),
      Some(
        """SELECT doc_id, CAST(k % 8 AS INT) AS shard,
          |  CAST(ROW_NUMBER() OVER (PARTITION BY k % 8 ORDER BY k, doc_id) AS INT) AS pos
          |FROM (SELECT doc_id,
          |        doc_id % 1000003 * 2654435761 % 1048573 AS k
          |      FROM documents)""".stripMargin),
      "Deterministic epoch shuffle: seeded hash key → shard route + write order."),

    QueryDef(
      "t_export_manifest",
      (s, dir) => {
        // The training-export shard manifest (operators/TrainingExport
        // under the DuckDB hash gate): docs route to shards by the
        // t_shard_shuffle key, each shard reports its doc/token load,
        // the packed-sequence count at L=64 (ceil division — the
        // t_seq_pack cut), and an order-free integer checksum (an XOR
        // fold of k·n_tok — write order can't change it, and XOR is
        // CLOSED on int64: a Σ would leave ANSI Spark throwing where
        // DuckDB widens to HUGEINT once a shard passes ~2^63 summed
        // products). Scale shape: one map-side-combinable agg to
        // nShards rows; n_tok is row-local, nothing token-weight
        // shuffles (the real export moves tokens; its MANIFEST never
        // needs to). The overflow guard is t_split_assign's:
        // pre-reduce mod 1000003 before the Knuth multiply keeps the
        // per-row product < 2^51.
        val k = col("doc_id") % 1000003L * 2654435761L % 1048573L
        t(s, dir, "documents")
          .select(k.as("k"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
          .groupBy((col("k") % 8).cast("int").as("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tok").as("n_tokens"),
            bit_xor(col("k") * col("n_tok")).as("tok_checksum"))
          .select(col("shard"), col("n_docs"), col("n_tokens"),
            expr("(n_tokens + 63) div 64").as("n_seqs"),
            col("tok_checksum"))
      },
      Some(
        """WITH c AS (SELECT doc_id % 1000003 * 2654435761 % 1048573 AS k,
          |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents)
          |SELECT CAST(k % 8 AS INT) AS shard, COUNT(*) AS n_docs,
          |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
          |  CAST((SUM(n_tok) + 63) // 64 AS BIGINT) AS n_seqs,
          |  CAST(BIT_XOR(k * n_tok) AS BIGINT) AS tok_checksum
          |FROM c GROUP BY 1""".stripMargin),
      "Training-export shard manifest: per-shard doc/token/packed-sequence counts + order-free checksum."),

    QueryDef(
      "t_oov_rate",
      (s, dir) => {
        // Tokenizer-vocab coverage per source: the out-of-vocabulary
        // token rate against the corpus top-K vocabulary — the
        // first-order signal for tokenizer fit and for spotting sources
        // (code, tables, other languages) a text tokenizer will
        // shred. Scale shape: the vocab is K-CAPPED
        // (TakeOrderedAndProject, never a full-vocab collect) and
        // broadcast, so the membership probe is a map-side hash lookup
        // fused into the token scan — one corpus pass, one
        // (source)-keyed combinable agg; identical to how the
        // unigram-LM quality filter bounds its model. K=16 so the cap
        // BINDS on the 31-word synthetic fixture vocabulary (the
        // q_kmv_distinct k=8 convention); production would use the
        // tokenizer's real vocab size (2^15..2^18).
        val K = 16
        val toks = t(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("word"))
        val top = toks.groupBy("word").agg(count("*").as("c"))
          .orderBy(col("c").desc, col("word").asc).limit(K)
          .select(col("word"), lit(1).as("inv"))
        toks.join(broadcast(top), Seq("word"), "left")
          .groupBy("source")
          .agg(count("*").as("n_tokens"),
            count(when(col("inv").isNull, 1)).as("n_oov"))
          .select(col("source"), col("n_tokens"), col("n_oov"),
            (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
      },
      Some(
        """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS word
          |  FROM documents),
          |top AS (SELECT word FROM (SELECT word, COUNT(*) AS c FROM toks GROUP BY 1)
          |  ORDER BY c DESC, word LIMIT 16)
          |SELECT source, COUNT(*) AS n_tokens,
          |  COUNT(CASE WHEN top.word IS NULL THEN 1 END) AS n_oov,
          |  CAST(COUNT(CASE WHEN top.word IS NULL THEN 1 END) AS DOUBLE) / COUNT(*)
          |    AS oov_rate
          |FROM toks LEFT JOIN top ON toks.word = top.word
          |GROUP BY source""".stripMargin),
      "Out-of-vocabulary rate per source against the broadcast top-K vocab."),

    QueryDef(
      "t_hash_outlier",
      (s, dir) => {
        // Domain-outlier scoring WITHOUT any external model: embed
        // every doc as a 64-bucket hashed bag-of-words (the feature-
        // hashing trick) and score its cosine to its own source's
        // aggregate vector — a low score marks a doc lexically atypical
        // for its domain, the cheap first-pass "wrong-bucket detector"
        // of a curation run. The arithmetic is engineered to be pure
        // INTEGER until one final division: with S_b the source's total
        // bucket counts and tf_b the doc's, the n_docs denominator of
        // the source-mean centroid CANCELS in the cosine, so
        // cos = Σ tf·S / (sqrt(Σ tf²) · sqrt(Σ S²)) — three order-free
        // BIGINT sums, no quantization needed at all. Scale shape: tf
        // is a (doc, bucket) combinable count; the source vectors are
        // |sources|·64 rows broadcast into the per-doc dot; nothing
        // joins at corpus size. Long-range bound: S_b < 3e9 keeps S_b²
        // under 2^63 — beyond that (trillion-token sources) the S sums
        // move to DECIMAL(38,0), same plan shape.
        val bk = (conv(substring(md5(col("word").cast("binary")), 1, 8), 16, 10)
          .cast("long") % 64).as("bk")
        val tf = t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            explode(split(col("text"), " ")).as("word"))
          .select(col("doc_id"), col("source"), bk)
          .groupBy("doc_id", "source", "bk").agg(count(lit(1)).as("tf"))
        val sv = tf.groupBy("source", "bk").agg(sum("tf").as("sb"))
        val nrm = sv.groupBy("source")
          .agg(sum(col("sb") * col("sb")).as("c0"))
        tf.join(broadcast(sv), Seq("source", "bk"))
          .groupBy("doc_id", "source")
          .agg(sum(col("tf") * col("sb")).as("p"),
            sum(col("tf") * col("tf")).as("b2"))
          .join(broadcast(nrm), "source")
          .select(col("doc_id"), col("source"),
            (col("p") / (sqrt(col("b2")) * sqrt(col("c0")))).as("cos"))
      },
      Some(
        """WITH w AS (SELECT doc_id, source,
          |    unnest(string_split(text, ' ')) AS word FROM documents),
          |tf AS (SELECT doc_id, source,
          |    CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT) % 64 AS bk,
          |    COUNT(*) AS tf
          |  FROM w GROUP BY 1, 2, 3),
          |sv AS (SELECT source, bk, CAST(SUM(tf) AS BIGINT) AS sb
          |  FROM tf GROUP BY 1, 2),
          |nrm AS (SELECT source, CAST(SUM(sb * sb) AS BIGINT) AS c0
          |  FROM sv GROUP BY source),
          |d AS (SELECT tf.doc_id, tf.source,
          |    CAST(SUM(tf.tf * sv.sb) AS BIGINT) AS p,
          |    CAST(SUM(tf.tf * tf.tf) AS BIGINT) AS b2
          |  FROM tf JOIN sv ON tf.source = sv.source AND tf.bk = sv.bk
          |  GROUP BY 1, 2)
          |SELECT d.doc_id, d.source,
          |  p / (sqrt(b2) * sqrt(c0)) AS cos
          |FROM d JOIN nrm ON d.source = nrm.source""".stripMargin),
      "Hashed bag-of-words domain-outlier score: doc-to-source cosine " +
        "from three order-free integer sums — no model, no quantization."))
}
