package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication primitives for large-scale training
  * -data pipelines (north-star ops beyond the reference's own surface).
  * Everything is a Catalyst expression pipeline — codegen-friendly, no
  * UDFs — so filters/projections around them still push down and the
  * same semantics are expressible as DuckDB oracle SQL.
  */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** GPT2-style pre-tokenizer pattern, ASCII-restricted so Java regex
    * (Spark) and RE2 (DuckDB) agree: a leading space is absorbed into
    * letter/digit/punctuation runs, residual spaces form runs.
    */
  val BpeishPattern: String = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"

  /** Word n-gram shingles (distinct not applied; caller decides).
    * Caller must ensure size(tokens) >= n (empty otherwise is NOT
    * guaranteed: Spark's sequence(1,0) is descending, not empty).
    */
  def shingles(toks: Column, n: Int): Column =
    transform(sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", slice(toks, i, lit(n))))

  /** XML content escape (&, <, > — the three that break element
    * content; attribute values additionally need quote escaping at
    * the emitter if ever written unquoted). One definition for every
    * XML-emitting sink so the escapes cannot drift.
    */
  def xmlEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c, "&", "&amp;"),
      "<", "&lt;"), ">", "&gt;")

  /** Normalized document fingerprint: md5 over the sorted distinct
    * token set (the exact-dedup key after bag-of-words normalization;
    * cf. reference IDA sha1 fingerprint, interpro/xrefs/domorgs.py:61).
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Count of tokens that appear in `words`. */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => words.map(t === _).reduce(_ || _)))

  /** MinHash via ONE strong hash per shingle + a universal-hash family
    * per signature row, instead of k full md5 passes over every
    * (doc, shingle) row (k=16 → 16x the digest work, the profiled cost
    * of the signature build). x = the md5's first 13 hex chars as a
    * 52-bit int (portable: DuckDB '0x'-prefixed casts and Spark conv
    * agree); h_i = (a_i·x + b_i) mod 1e9+7 with a_i < 1024 so the
    * product stays inside checked int64 range on both engines.
    */
  val MinhashP = 1000000007L
  def minhashParams(k: Int): Seq[(Long, Long)] =
    (1 to k).map { i =>
      val a = ((i * 2654435761L) % 1021L) + 2L           // 2..1022
      val b = (i * 1140671485L + 12820163L) % MinhashP
      (a, b)
    }

  /** 52-bit integer hash of a shingle — materialize this ONCE as a
    * column before the signature groupBy (inlining it into the k aggs
    * would re-digest per (row, i)).
    */
  def minhashX(shingle: Column): Column =
    conv(substring(md5(shingle), 1, 13), 16, 10).cast("long")

  /** Signature columns h1..hk = min over the doc's shingle hashes. */
  def minhashAggs(x: Column, k: Int): Seq[Column] =
    minhashParams(k).zipWithIndex.map { case ((a, b), idx) =>
      min((lit(a) * x + lit(b)) % MinhashP).as(s"h${idx + 1}")
    }

  /** Per-row minhash signature columns from a shingle-id ARRAY column
    * — the stateless form of [[minhashAggs]] for streaming
    * projections (no groupBy, so it runs inside a streaming batch
    * with no shuffle). Semantically identical: the min over duplicate
    * ids equals the min over distinct ids. `ids` must be a
    * PRE-MATERIALIZED column of [[minhashX]] values — lambdas get no
    * CSE, so inlining the digest here would re-hash every shingle k
    * times.
    */
  def minhashRowSigs(ids: Column, k: Int): Seq[Column] =
    minhashParams(k).zipWithIndex.map { case ((a, b), idx) =>
      array_min(transform(ids, x => (lit(a) * x + lit(b)) % MinhashP))
        .as(s"h${idx + 1}")
    }

  /** LSH band keys from a minhash signature: band j hashes rows
    * (h_{rj+1}..h_{rj+r}); the band index is embedded so equal hashes
    * in different bands never collide.
    */
  def bandKeys(bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val hs = (1 to rowsPerBand)
        .map(r => col(s"h${b * rowsPerBand + r}").cast("string"))
      concat(lit(s"$b:"), md5(concat(hs: _*)))
    }: _*)

  /** SimHash bit sums over an exploded token column: bit i of the
    * signature is bit (i-1)%4 of hex digit (i-1)/4 of the token's md5
    * (4 signature bits per hex digit, so one md5 yields up to 128
    * bits); per bit the agg sums +1/-1 and the signature bit is 1 iff
    * the sum is positive. Wide signatures matter: block-based
    * candidate search needs enough values per bit block that buckets
    * stay small (16-bit blocks = 65536 buckets; the 4-bit blocks of a
    * 16-bit signature collapse to 16 buckets and a quadratic join).
    * `digest` must be a precomputed md5(token) column — hoisting the
    * hash into the pre-agg projection computes it once per token
    * instead of once per (token, bit).
    */
  /** Hex digit value columns d1..dn of a digest column: instr over the
    * hex alphabet minus 1 — one substring+scan per DIGIT, so the
    * per-bit aggs below are pure integer shift/mask arithmetic.
    */
  def hexDigitValues(digest: Column, digits: Int): Seq[Column] =
    (1 to digits).map(dd =>
      (call_function("instr", lit("0123456789abcdef"), substring(digest, dd, 1)) - 1)
        .as(s"d$dd"))

  /** First-byte value (0..255) of a hex digest column — the
    * engine-portable uniform hash for deterministic sampling (both
    * engines compute identical md5 hex and identical instr positions).
    */
  def hexByteValue(digest: Column): Column =
    (call_function("instr", lit("0123456789abcdef"), substring(digest, 1, 1)) - 1) * 16 +
      (call_function("instr", lit("0123456789abcdef"), substring(digest, 2, 1)) - 1)

  /** Requires the hexDigitValues columns d1..d((bits+3)/4) in scope. */
  def simhashBitAggs(bits: Int): Seq[Column] =
    (1 to bits).map { i =>
      val dv = col(s"d${(i - 1) / 4 + 1}")
      sum((shiftright(dv, (i - 1) % 4).bitwiseAND(1)) * 2 - 1).as(s"s$i")
    }

  def simhashSig(bits: Int): Column =
    concat((1 to bits).map(i => when(col(s"s$i") > 0, "1").otherwise("0"))
      .map(c => c.cast("string")): _*)

  /** Lane-packed simhash: ONE sum agg per hex digit instead of one
    * per bit — each digit's 4 bit-counts ride in disjoint 16-bit
    * lanes of a single int64 (bit b of digit d contributes
    * 2^(16b) per set occurrence; lanes can't carry into each other
    * while a document has < 2^15 tokens, far above any real page).
    * The per-bit ±1 sum is recovered as 2·lane − n, so the sign test
    * `2·lane > n` reproduces simhashBitAggs' `sum > 0` EXACTLY,
    * ties included — 64 aggs become 16 + a count.
    */
  def simhashPackedAggs(bits: Int): Seq[Column] = {
    val digits = (bits + 3) / 4
    (1 to digits).map { dd =>
      val dv = col(s"d$dd").cast("long")
      val packed = (0 until 4).map(b =>
        shiftright(dv, b).bitwiseAND(1L) * lit(1L << (16 * b))).reduce(_ + _)
      sum(packed).as(s"p$dd")
    } :+ count(lit(1)).as("ntok")
  }

  def simhashSigPacked(bits: Int): Column =
    concat((1 to bits).map { i =>
      val dd = (i - 1) / 4 + 1
      val b = (i - 1) % 4
      when(shiftright(col(s"p$dd"), 16 * b).bitwiseAND(65535L) * 2 > col("ntok"),
        "1").otherwise("0")
    }: _*)
}
