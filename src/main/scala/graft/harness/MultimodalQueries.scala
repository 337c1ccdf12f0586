package graft.harness

import graft.Tables
import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Loops.LoopOps

/** Multimodal-column plumbing (north-star): media as opaque `binary`
  * columns with typed metadata. The test tables carry no real media,
  * so the blob is derived (utf-8 bytes of `text`) and the decode step
  * is a deterministic stub (see `graft.ops.Multimodal`) — the schema,
  * partitioning and batch shape are the real, tested parts.
  */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  // max witnesses per pHash candidate block: hotter blocks keep a
  // pool of the cap lowest ids on the left join side instead of going
  // quadratic (cappedSelfJoin's r17 witness semantics)
  private val PhashBlockCap = 1000

  val queries: Map[String, Q] = Map(
    // Blob metadata extraction, pure expressions (oracle-checkable):
    // byte length, first-8-bytes hex, content digest.
    "multimodal_meta" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
        .select(
          col("doc_id"),
          length(col("blob")).cast("long").as("n_bytes"),
          upper(hex(substring(col("blob"), 1, 8))).as("prefix_hex"),
          md5(col("blob")).as("content_md5"))),

    // Exact dedup over the OPAQUE binary payload: content-digest
    // groups — the first pass of any multimodal pipeline (identical
    // assets dedupe byte-exactly before any decode). The payload here
    // is the canonicalized byte stream (per-pixel-normalized image /
    // resampled audio in production; sorted token bytes for the text
    // corpus) so re-encodings of the same content collide. One hash
    // shuffle over the binary column, never the decoded content.
    "multimodal_dedup" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))
            .cast("binary").as("blob"))
        .groupBy(md5(col("blob")).as("content_md5"))
        .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n"),
          concat_ws(",", transform(sort_array(collect_list(col("doc_id"))),
            _.cast("string"))).as("ids"))
        .filter(col("n") > 1)),

    // Decode/feature-extract over the binary column via the stubbed
    // per-partition decoder: rows-only check (the kernel itself is
    // deterministic and unit-tested, but not SQL-expressible). The
    // feature vector is serialized to a string so the driver's
    // canonicalization can sort/compare rows (raw array<float> columns
    // crash its pandas sort).
    "multimodal_decode" -> ((s, d) =>
      Multimodal.decodeFeatures(
        Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("blob")))
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          concat_ws(",", transform(col("features"),
            f => f.cast("decimal(6,3)").cast("string"))).as("features_csv"))),

    // Resize: stride-downsampling stub ("8x8 thumbnail") with the
    // per-partition plumbing a real scaler would use.
    "multimodal_resize" -> ((s, d) =>
      Multimodal.resize(
        Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("blob")))),

    // Frame sampling over "video" blobs: the one-to-many fan-out
    // (doc → 4 frames) with per-frame byte spans — the flatMap shape
    // a real keyframe sampler would use; stub is deterministic byte
    // math (oracle below).
    "multimodal_frames" -> ((s, d) =>
      Multimodal.frameSample(
        Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("blob")), 4)),

    // Perceptual near-dup over the binary payload: 64-bit block-mean
    // hash per blob (the pHash family — kernel in
    // Multimodal.perceptualHash, pure integer byte math so the oracle
    // reproduces it), then the same pigeonhole block join as SimHash:
    // any pair within hamming radius 3 must agree on one of 4 16-bit
    // blocks, so a per-block equi-join finds ALL such pairs with no
    // all-pairs comparison, verified by the native hamming_bits
    // codegen expression. The payload is canonicalized FIRST (the
    // normalize-before-pHash step every image pipeline runs —
    // per-pixel normalization there, sorted token bytes here): the
    // hash is positional, so without canonicalization re-orderings of
    // the same content land far apart (measured min distance 9 on raw
    // bytes vs 0 on canonical bytes for this corpus's planted dups).
    "multimodal_phash" -> ((s, d) => {
      // localCheckpoint: the signature frame (one slim row per doc)
      // feeds the block census AND both sides of the candidate join —
      // left lazy, the canonicalize+hash pass over the whole corpus
      // runs three times (measured 17 s warm at 30x; 9 s with the
      // materialization). Swept by the bench's ephemeral cleanup.
      val sig = Multimodal.perceptualHash(
        Tables.documents(s, d)
          .select(col("doc_id"),
            concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))
              .cast("binary").as("blob"))
          .filter(length(col("blob")) > 0))
        .loopCheckpoint()
      val blocks = sig.select(col("doc_id"), explode(array(
        (0 until 4).map(b =>
          concat(lit(s"$b:"), substring(col("sig"), 1 + b * 16, 16))): _*))
        .as("bk"))
      // hot-block witness pool (same rationale as edit-distance's
      // BlockCap; r17 semantics): a block shared by thousands of docs
      // is near-uniform signature mass at corpus scale (blank pages,
      // boilerplate) whose uncapped self-join is quadratic — the pool
      // bounds it at cap·|block| while still pairing every member
      // with the block's lowest-id witnesses.
      // block, cap, spread pair join — CorpusOps.cappedSelfJoin (the
      // shared expanding-join skeleton; explicit width is load-bearing)
      val parts = scala.util.Try(s.conf
        .get("spark.sql.shuffle.partitions").toInt).getOrElse(32)
      val cand = graft.ops.CorpusOps.cappedSelfJoin(blocks, "doc_id", "bk",
          PhashBlockCap, parts)
        .select("da", "db").distinct()
      cand
        .join(sig.select(col("doc_id").as("da"), col("sig").as("siga")), Seq("da"))
        .join(sig.select(col("doc_id").as("db"), col("sig").as("sigb")), Seq("db"))
        .withColumn("dist", call_function("hamming_bits", col("siga"), col("sigb")))
        .filter(col("dist") <= 3)
        .select("da", "db", "siga", "sigb", "dist")
    }),

    // Real audio decode through the JDK's own WAV codec: blobs are
    // deterministic sawtooth PCM WAVs synthesized from doc_id
    // (Multimodal.synthWav — fully valid RIFF headers the codec
    // parses for real), decoded per partition by
    // javax.sound.sampled.AudioSystem into header metadata + 8-band
    // RMS loudness. The waveform is pure integer math, so the oracle
    // regenerates the samples with a range() comprehension and must
    // match the DECODED output exactly — a genuine byte-level codec
    // differential, not a stub. The hash-compared feature is the
    // EXACT per-band sum-of-squares (Long): a 6dp-rounded RMS double
    // can land on a decimal-rounding boundary where the two engines'
    // double-to-decimal rules split by one ulp (observed once in
    // 1.2M band values at 30x); the integer form proves the same
    // decode with zero float risk at any scale. Per-row both ways;
    // no shuffle.
    "multimodal_audio" -> ((s, d) =>
      Multimodal.decodeAudioFeatures(
        Multimodal.synthWavBlobs(Tables.documents(s, d).select(col("doc_id"))))
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("n_frames"),
          concat_ws(",", transform(col("band_sumsq"),
            x => x.cast("string"))).as("sumsq_csv"))),

    // VAD-style audio activity segmentation — the silence-trim /
    // speech-segment stage an audio training pipeline runs per clip:
    // decode PCM (REAL JDK codec), window into fixed 100-sample
    // energies (exact Long sum-of-squares, the audio family's float
    // discipline), threshold activity at energy > 0 (the gated synth
    // zeroes silent windows exactly), and condense consecutive active
    // windows into segments with the islands trick. Per-row decode +
    // one per-doc window pass; the only shuffle is the final per-doc
    // segment group.
    "multimodal_audio_segments" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wins = Multimodal.decodeAudioWindows(
        Multimodal.synthGatedWavBlobs(
          Tables.documents(s, d).select(col("doc_id"))), 100)
      wins.filter(col("sumsq") > 0)
        .withColumn("grp", col("w") - row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("w"))))
        .groupBy(col("doc_id"), col("grp"))
        .agg(min(col("w")).as("seg_start"), max(col("w")).as("seg_end"),
          count(lit(1)).as("n_windows"), sum(col("sumsq")).as("seg_sumsq"))
        .select(col("doc_id"), col("seg_start"), col("seg_end"),
          col("n_windows"), col("seg_sumsq"))
    }),

    // F11: gzip codec roundtrip through the custom GzipCompress /
    // GzipDecompress expressions (reference gzips sequences/HMM blobs,
    // interpro/oracle/proteins.py:68). The compressed bytes are
    // implementation-specific, so the oracle checks the roundtrip
    // identity plus a sanity ratio.
    "fn_gzip_roundtrip" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          call_function("gzip_compress", col("text").cast("binary")).as("gz"),
          col("text"))
        .select(col("doc_id"),
          call_function("gzip_decompress", col("gz")).cast("string").as("text"),
          (length(col("gz")) > 0 && length(col("gz")) < length(col("text")) + 64)
            .as("compressed_ok")))
  )

  val oracle: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
                octet_length(encode(text)) AS n_bytes,
                upper(hex(encode(substring(text, 1, 8)))) AS prefix_hex,
                md5(text) AS content_md5
         FROM documents""",
    "multimodal_dedup" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
                  AS content_md5,
                MIN(doc_id) AS rep, COUNT(*) AS n,
                string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS ids
         FROM documents GROUP BY 1 HAVING COUNT(*) > 1""",
    // multimodal_decode: the stub decoder is deterministic byte math,
    // so it IS SQL-expressible for the (all-ASCII) test corpus:
    // width/height from the first two bytes, feature i = sum of bytes
    // at positions ≡ i (mod 8), mod 1000, as thousandths.
    "multimodal_decode" ->
      """WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n
                    FROM documents),
          pos AS (SELECT doc_id, CAST(u.p AS INT) AS p
                  FROM b, UNNEST(range(0, n)) AS u(p)),
          f AS (SELECT pos.doc_id, p % 8 AS i,
                       SUM(ascii(substring(text, p + 1, 1))) AS s
                FROM pos JOIN b USING (doc_id) GROUP BY pos.doc_id, p % 8),
          feats AS (SELECT doc_id,
                           string_agg(CAST(CAST(CAST(s % 1000 AS DOUBLE) / 1000
                                     AS DECIMAL(6,3)) AS VARCHAR), ',' ORDER BY i)
                      AS features_csv
                    FROM f GROUP BY doc_id)
          SELECT b.doc_id, CAST(n AS INTEGER) AS n_bytes,
                 16 + ascii(substring(text, 1, 1)) % 64 AS width,
                 16 + ascii(substring(text, 2, 1)) % 64 AS height,
                 features_csv
          FROM b JOIN feats USING (doc_id)""",
    "multimodal_resize" ->
      """WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n,
                           GREATEST(1, (octet_length(encode(text)) + 63) // 64) AS k
                    FROM documents),
          pos AS (SELECT doc_id, CAST(u.p AS INT) AS p
                  FROM b, UNNEST(range(0, n, k)) AS u(p))
          SELECT pos.doc_id, 8 AS out_w, 8 AS out_h,
                 CAST(COUNT(*) AS INT) AS n_sampled,
                 CAST(SUM(ascii(substring(text, p + 1, 1))) % 1000 AS BIGINT)
                   AS checksum
          FROM pos JOIN b USING (doc_id)
          GROUP BY pos.doc_id""",
    "multimodal_frames" ->
      """WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n
                    FROM documents WHERE octet_length(encode(text)) > 0),
          pos AS (SELECT doc_id, CAST(u.p AS INT) AS p
                  FROM b, UNNEST(range(0, n)) AS u(p)),
          f AS (SELECT pos.doc_id,
                       CAST((CAST(p AS BIGINT) * 4) // n AS INT) AS frame_no,
                       ascii(substring(text, p + 1, 1)) AS byte
                FROM pos JOIN b USING (doc_id))
          SELECT doc_id, frame_no, CAST(COUNT(*) AS INT) AS n_bytes,
                 CAST(SUM(byte) % 1000 AS BIGINT) AS checksum
          FROM f GROUP BY doc_id, frame_no""",
    "fn_gzip_roundtrip" ->
      """SELECT doc_id, text, TRUE AS compressed_ok FROM documents""",
    // multimodal_audio: regenerate the synthesized sawtooth samples
    // (sample i = ((phase + i*step) mod 65536) - 32768, band =
    // (i*8)//n) and recompute the 8-band RMS the JDK codec path must
    // decode to. Sum-of-squares terms are integers < 2^53, so the
    // double SUM is order-independent-exact and sqrt is correctly
    // rounded in both engines.
    "multimodal_audio" ->
      """WITH p AS (SELECT doc_id, 800 + doc_id % 200 AS n,
                           40 + doc_id % 50 AS step,
                           (doc_id * 7) % 65536 AS phase
                    FROM documents),
          s AS (SELECT doc_id, (u.i * 8) // n AS band,
                       ((phase + u.i * step) % 65536) - 32768 AS v
                FROM p, UNNEST(range(0, n)) AS u(i)),
          b AS (SELECT doc_id, band,
                       CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS sumsq
                FROM s GROUP BY doc_id, band)
          SELECT p.doc_id, 8000 AS sample_rate, 1 AS channels,
                 CAST(n AS BIGINT) AS n_frames,
                 string_agg(CAST(sumsq AS VARCHAR), ','
                            ORDER BY band) AS sumsq_csv
          FROM b JOIN p USING (doc_id)
          GROUP BY p.doc_id, n""",
    // multimodal_audio_segments: regenerate the GATED sawtooth
    // (window w of doc silent iff (doc_id*3 + w) % 5 < 2), recompute
    // per-100-sample-window integer energies, and condense active
    // runs with the same islands arithmetic the Spark side uses.
    "multimodal_audio_segments" ->
      """WITH p AS (SELECT doc_id, 800 + doc_id % 200 AS n,
                           40 + doc_id % 50 AS step,
                           (doc_id * 7) % 65536 AS phase
                    FROM documents),
          s AS (SELECT doc_id, u.i // 100 AS w,
                       CASE WHEN (doc_id * 3 + u.i // 100) % 5 < 2 THEN 0
                            ELSE ((phase + u.i * step) % 65536) - 32768
                       END AS v
                FROM p, UNNEST(range(0, n)) AS u(i)),
          wsum AS (SELECT doc_id, w,
                          CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS sumsq
                   FROM s GROUP BY doc_id, w),
          act AS (SELECT doc_id, w, sumsq FROM wsum WHERE sumsq > 0),
          g AS (SELECT doc_id, w, sumsq,
                       w - row_number() OVER (PARTITION BY doc_id
                                              ORDER BY w) AS grp
                FROM act)
          SELECT doc_id, MIN(w) AS seg_start, MAX(w) AS seg_end,
                 COUNT(*) AS n_windows,
                 CAST(SUM(sumsq) AS BIGINT) AS seg_sumsq
          FROM g GROUP BY doc_id, grp""",
    // NOTE: like multimodal_decode's oracle, this relies on the test
    // corpus being pure ASCII — the Spark kernel iterates UTF-8 BYTES
    // while the SQL below indexes CHARACTERS (substring + ascii); the
    // two agree exactly iff every char is one byte. The kernel is the
    // byte-exact ground truth for non-ASCII payloads.
    "multimodal_phash" -> {
      val blockList = (0 until 4)
        .map(b => s"'$b:' || substr(sig, ${1 + b * 16}, 16)").mkString(", ")
      val dist = (1 to 64)
        .map(i => s"CASE WHEN substr(sa.sig,$i,1) = substr(sb.sig,$i,1) THEN 0 ELSE 1 END")
        .mkString(" + ")
      s"""WITH canon AS (SELECT doc_id,
                 array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')
                   AS text
               FROM documents),
          b AS (SELECT doc_id, text, octet_length(encode(text)) AS n
                FROM canon WHERE octet_length(encode(text)) > 0),
          -- per-ROW list ops, not a per-byte UNNEST join: the join
          -- form materialized ~450M (doc, byte) rows at 30x and
          -- OOM-killed the checker; byte values stay inside one
          -- per-doc list here (O(doc) transient memory, streamable).
          -- Bucket k spans 0-based positions [ceil(k*n/64),
          -- ceil((k+1)*n/64)) — exactly the (p*64)//n == k band.
          t AS (SELECT doc_id, n,
                       list_transform(range(0, CAST(n AS BIGINT)),
                         p -> ascii(substring(text, CAST(p AS INT) + 1, 1))) AS av
                FROM b),
          t2 AS (SELECT doc_id, n, av, list_sum(av) AS ts FROM t),
          sig AS (SELECT doc_id,
                   array_to_string(list_transform(range(0, 64), k ->
                     CASE WHEN COALESCE(list_sum(
                              av[CAST((k * n + 63) // 64 AS BIGINT) + 1 :
                                 CAST(((k + 1) * n + 63) // 64 AS BIGINT)]), 0) * n
                            > ts * (((k + 1) * n + 63) // 64 - (k * n + 63) // 64)
                          THEN '1' ELSE '0' END), '') AS sig
                  FROM t2),
          blocks AS (SELECT doc_id, unnest([$blockList]) AS bk FROM sig),
          wit AS (SELECT doc_id, bk FROM (
                    SELECT doc_id, bk,
                           ROW_NUMBER() OVER (PARTITION BY bk
                                              ORDER BY doc_id) AS rk
                    FROM blocks) z WHERE rk <= $PhashBlockCap),
          cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                   FROM wit a JOIN blocks b
                     ON a.bk = b.bk AND a.doc_id < b.doc_id)
          SELECT da, db, sa.sig AS siga, sb.sig AS sigb,
                 CAST($dist AS BIGINT) AS dist
          FROM cand JOIN sig sa ON da = sa.doc_id
                    JOIN sig sb ON db = sb.doc_id
          WHERE $dist <= 3"""
    }
  )
}
