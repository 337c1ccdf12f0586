package graft.harness

import graft.Tables
import graft.ops.Loops.LoopOps
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting operators for training-data
  * pipelines (north-star ops). Random sampling is useless at corpus
  * scale — reruns must pick the SAME rows, adding data must not
  * reshuffle old assignments, and two engines must agree — so every
  * operator here keys off a salted content hash, never an RNG:
  *
  *  - `sample_hash`: Bernoulli-by-hash (p = threshold/256). Purely
  *    per-row — no shuffle at all; the filter pushes to the scan side
  *    and survives any scale.
  *  - `sample_stratified`: up to K docs per stratum chosen by hash
  *    order — one hash shuffle on the stratum key; per-group state is
  *    the window's top-K (or TopKPerGroupExec for huge strata).
  *  - `split_train_eval`: stable 80/10/10 train/val/test assignment
  *    by hash range, verified by per-split counts + id checksums.
  *    A doc's split never changes when the corpus grows, because the
  *    hash ignores every other row.
  */
object SampleQueries {
  type Q = (SparkSession, String) => DataFrame

  private val SampleThresh = 26   // ~10% of 256
  private val StratumK = 50       // docs kept per stratum
  private val TrainHi = 204       // 80% of 256
  private val ValHi = 230         // next 10%

  private def hv(salt: String) =
    TextOps.hexByteValue(md5(concat(lit(s"$salt:"), col("doc_id").cast("string"))))

  val queries: Map[String, Q] = Map(
    // Bernoulli-by-hash: keep ~10%, identically on every rerun and in
    // every engine. No shuffle — the predicate rides the scan.
    "sample_hash" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("hv", hv("split1"))
        .filter(col("hv") < SampleThresh)
        .select(col("doc_id"), col("lang"), col("source"), col("hv"))),

    // Up to K docs per (lang, source) stratum in hash order: the
    // deterministic replacement for per-stratum reservoir sampling.
    "sample_stratified" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("hv"), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("hv", hv("strat1"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= StratumK)
        .select(col("lang"), col("source"), col("doc_id"), col("hv"), col("rk"))
    }),

    // Temperature-weighted mixture sampling (the data-mixing step of a
    // pretraining pipeline): per-language keep probability ∝ n^(α-1)
    // with α=1/2, so over-represented languages are downsampled toward
    // the smallest one. α=1/2 is deliberate — sqrt is IEEE-exact on
    // every engine, so the per-stratum threshold (and therefore the
    // kept id set, not just its size) is bit-reproducible across
    // Spark and the DuckDB oracle; a free-form pow() would not be.
    // The per-stratum census is one tiny agg broadcast back onto the
    // scan — the document side never shuffles.
    "sample_temperature" -> ((s, d) =>
      graft.ops.CorpusOps.temperatureSample(
          Tables.documents(s, d), "lang", hv("mix1"))
        .select(col("doc_id"), col("lang"), col("hv"), col("thresh"))),

    // Stable 3-way split; emits per-split counts and an id checksum so
    // the assignment itself (not just the sizes) is hash-compared.
    "split_train_eval" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("hv", hv("split1"))
        .withColumn("split",
          when(col("hv") < TrainHi, "train")
            .when(col("hv") < ValHi, "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_checksum"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))),

    // Deterministic sequence packing (CorpusOps.packSequences): lay the
    // corpus out in stable salted-hash order and chunk into PackBudget
    // -token context windows — the concat-and-chunk step of a
    // pretraining pipeline. The global offset is a distributed prefix
    // sum (256 hash buckets + a census cumsum), never one giant
    // window; the oracle's single global window is the small-scale
    // ground truth it must equal.
    "sample_pack_sequences" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      graft.ops.CorpusOps.packSequences(docs, "doc_id", "n_tok", PackBudget)
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          sum(col("doc_id")).as("id_checksum"))
    }),

    // Weighted sampling WITHOUT replacement (Efraimidis-Spirakis,
    // IPL 2006): each row races an exponential clock -ln(u)/w — the
    // N smallest clocks are a weighted sample without replacement.
    // u derives from the salted md5 byte ((hv+1)/257 in (0,1]), w is
    // the document's token count, so the drawn set is a pure function
    // of the corpus: reruns and engines agree, and adding rows never
    // reshuffles the survivors' clocks (only the cutoff moves). The
    // clock is per-row arithmetic on the scan; selection is
    // TakeOrderedAndProject — no global sort.
    "sample_weighted" -> ((s, d) => {
      val w = size(TextOps.tokens(col("text"))).cast("double")
      val u = (hv("wrs1") + lit(1.0)) / lit(257.0)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          w.cast("long").as("n_tok"),
          round(-log(u) / w, 12).as("clock"))
        .orderBy(col("clock"), col("doc_id"))
        .limit(WeightedN)
    }),

    // Explicit-weight data mixing — the "mixture spec" step of a
    // pretraining run (40% src0, 30% src1, ...), distinct from
    // temperature sampling (which derives weights from corpus counts):
    // the target proportions are GIVEN, and each source's hash-keep
    // threshold is solved from its census so the kept set lands on
    // the spec at the configured budget. One tiny per-source census
    // broadcast back onto the scan — the document side never
    // shuffles, identical to the temperature plan shape.
    "sample_mixture" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val wExpr = MixWeights.foldLeft(lit(0.0)) {
        case (acc, (src, w)) => when(col("source") === src, w).otherwise(acc)
      }
      val census = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_tot"))))
        .select(col("source"),
          round(lit(256.0) * MixBudget * wExpr * col("n_tot") / col("n_s"), 6)
            .as("thresh"))
      docs.withColumn("hv", hv("mixw1"))
        .join(broadcast(census), Seq("source"))
        .filter(col("hv") < col("thresh"))
        .select(col("doc_id"), col("source"), col("hv"), col("thresh"))
    }),

    // Deterministic pre-training shuffle: every document gets a
    // (shard, pos) assignment that is a pure function of its id —
    // shard from the salted-hash first byte, within-shard order
    // lexicographic on the full hash (CorpusOps.shuffleShards). The
    // position comes from a distributed prefix sum over 256 hash
    // sub-buckets per shard, so no reducer sorts a whole shard; the
    // oracle's single window per shard is the small-scale ground
    // truth the bucketed layout must equal exactly.
    "sample_shuffle_shards" -> ((s, d) =>
      graft.ops.CorpusOps.shuffleShards(
        Tables.documents(s, d), "doc_id", ShuffleShards)),

    // Length-matched pair packing — the padding-waste reducer for
    // fixed-length training batches: rank docs by token count
    // descending and bin rank i with rank N+1−i, so the longest doc
    // shares a bin with the shortest and bin totals equalize (the
    // 2-per-bin zig-zag form of best-fit-decreasing, which is
    // inherently sequential; this pairing is fully distributed). The
    // global rank is the census prefix sum again — token counts have
    // a bounded domain, so no reducer sorts the corpus — and the bin
    // id is pure rank arithmetic, deterministic across engines.
    "sample_pack_pairs" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables.documents(s, d)
        .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("n_tok"))
      val census = t.groupBy(col("n_tok")).agg(count(lit(1)).as("cn"))
        .withColumn("cum0", coalesce(sum(col("cn")).over(
          Window.orderBy(col("n_tok").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("nn", sum(col("cn")).over(Window.partitionBy(lit(1))))
        .select(col("n_tok"), col("cum0"), col("nn"))
      t.join(broadcast(census), Seq("n_tok"))
        .withColumn("rnk", col("cum0") + row_number().over(
          Window.partitionBy(col("n_tok")).orderBy(col("doc_id"))))
        .withColumn("bin", least(col("rnk"), col("nn") + 1 - col("rnk")))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          concat_ws(",", array_sort(collect_list(col("doc_id"))))
            .as("ids"),
          sum(col("n_tok")).as("bin_tok"))
    }),

    // Curriculum schedule — the "easy examples first" training order
    // (Bengio et al., ICML 2009) as a deterministic layout: docs rank
    // globally by a difficulty proxy (n_chars, short = easy), the
    // rank folds to a decile, and epoch e ∈ {1,2,3} trains on deciles
    // ≤ 1+3e (4 → 7 → all 10) so the mix widens as training
    // progresses. The global rank is NEVER one giant window: a
    // distinct-length census (bounded domain) carries cumulative
    // offsets, broadcast back onto the scan, and each doc adds a
    // row_number partitioned by its own length — the shuffleShards
    // prefix-sum layout. Within an epoch the read order is a salted
    // hash: shard = hash byte mod 8, pos = offset census + per
    // -sub-bucket row_number, so no reducer sorts a whole shard and
    // reruns/engines agree exactly.
    "sample_curriculum" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      val census = docs.groupBy(col("n_chars")).agg(count(lit(1)).as("cn"))
        .withColumn("cum0", coalesce(sum(col("cn")).over(
          Window.orderBy(col("n_chars"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("total", sum(col("cn")).over(
          Window.partitionBy(lit(1))))
        .select(col("n_chars"), col("cum0"), col("total"))
      val ranked = docs.join(broadcast(census), Seq("n_chars"))
        .withColumn("rnk", col("cum0") + row_number().over(
          Window.partitionBy(col("n_chars")).orderBy(col("doc_id"))))
        .withColumn("decile",
          (lit(1L) + expr("((rnk - 1) * 10) DIV total")).cast("int"))
      val epochs = ranked
        .select(col("doc_id"), col("decile"),
          explode(array(lit(1), lit(2), lit(3))).as("epoch"))
        .filter(col("decile") <= lit(1) + lit(3) * col("epoch"))
        .withColumn("hh", md5(concat(lit("cur:"), col("epoch").cast("string"),
          lit(":"), col("doc_id").cast("string"))))
        .withColumn("hb", TextOps.hexByteValue(col("hh")))
        .withColumn("shard", (col("hb") % 8).cast("int"))
      val posCensus = epochs.groupBy(col("epoch"), col("shard"), col("hb"))
        .agg(count(lit(1)).as("bn"))
        .withColumn("boff", coalesce(sum(col("bn")).over(
          Window.partitionBy(col("epoch"), col("shard")).orderBy(col("hb"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("epoch"), col("shard"), col("hb"), col("boff"))
      epochs.join(broadcast(posCensus), Seq("epoch", "shard", "hb"))
        .withColumn("pos", col("boff") + row_number().over(
          Window.partitionBy(col("epoch"), col("shard"), col("hb"))
            .orderBy(col("hh"), col("doc_id"))))
        .select(col("epoch"), col("doc_id"), col("decile"), col("shard"),
          col("pos"))
    }),

    // Epoch-weighted UPSAMPLING — the mixture lever sample_mixture's
    // subsampling can't pull: a source with multiplier m > 1 repeats
    // each doc floor(m) times and gains one more copy with
    // probability frac(m), hash-gated per doc (deterministic across
    // reruns and engines, the family rule). The per-source multiplier
    // here derives from the source number ((n mod 7)/2 → 0..3 in half
    // steps, including a dropped source); a production run passes its
    // tuned weights. Per-row sequence explode — no shuffle, the
    // output carries (doc, copy) so a trainer can interleave epochs.
    "sample_epochs" -> ((s, d) => {
      val srcnum = regexp_extract(col("source"), "(\\d+)", 1).cast("int")
      val k = srcnum % 7
      val hv = TextOps.hexByteValue(
        md5(concat(lit("epoch1:"), col("doc_id").cast("string"))))
      val nCopies = (floor(k / 2).cast("int") +
        when(k % 2 === 1 && hv < 128, 1).otherwise(0)).as("n_copies")
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), nCopies)
        .filter(col("n_copies") > 0)
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(0), col("n_copies") - 1)).as("copy"))
    }),

    // DSIR-style importance resampling (Xie et al. 2023,
    // arXiv:2302.03169): rank raw documents by how target-like their
    // unigram distribution is — score(doc) = Σ_t [ln p̂_target(t) −
    // ln p̂_raw(t)] over the doc's token multiset, add-one smoothed,
    // target = the 'en' slice of the corpus itself. The paper hashes
    // n-grams into a fixed bucket space; the unigram census here IS
    // that bucket census (vocabulary-sized, so the weight table
    // broadcasts). Plan shape: one exploded-token shuffle for the
    // census, one keyed re-agg for doc scores with the weight table
    // broadcast between them, and TakeOrderedAndProject for the
    // top-N selection — per-partition top-N then a driver merge of
    // N-row heads, never a global sort. Per-token log-ratios round to
    // 6dp and sum as exact DECIMAL so the score is order-independent
    // and cross-engine identical.
    "sample_dsir" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      // ONE corpus explode instead of two (§2.4 — the text_tfidf
      // pattern): the per-(doc, token) counts materialize once and
      // both the n-gram importance model (a vocab-sized regroup) and
      // the scoring aggregation read them. Scores are identical:
      // Σ_occurrences w = Σ_t k·w exactly (DECIMAL × integer), the
      // model censuses are integer sums either way.
      val tf = Tables.widened(Tables.documents(s, d))
        .select(col("doc_id"), col("lang"),
          explode(TextOps.tokens(col("text"))).as("t"))
        .groupBy(col("doc_id"), col("lang"), col("t"))
        .agg(count(lit(1)).as("k"))
        .loopCheckpoint()
      val cnt = tf.groupBy(col("t")).agg(
        sum(col("k")).as("c_s"),
        sum(when(col("lang") === "en", col("k")).otherwise(0L)).as("c_t"))
      val tot = cnt.agg(sum(col("c_s")).as("tot_s"), sum(col("c_t")).as("tot_t"),
        count(lit(1)).as("v"))
      val w = cnt.crossJoin(broadcast(tot)).select(col("t"),
        round(log((col("c_t") + lit(1.0)) / (col("tot_t") + col("v"))) -
              log((col("c_s") + lit(1.0)) / (col("tot_s") + col("v"))), 6)
          .cast(DecimalType(12, 6)).as("w"))
      tf.join(broadcast(w), Seq("t"))
        .groupBy(col("doc_id"))
        .agg(first(col("lang")).as("lang"), sum(col("k")).as("n_tok"),
          sum(col("w") * col("k")).cast("double").as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(DsirN)
    })
  )

  private val PackBudget = 512L
  private val DsirN = 100 // docs kept by importance rank (sample_dsir)
  private val WeightedN = 150 // docs drawn without replacement (sample_weighted)
  private val ShuffleShards = 8 // training shards (sample_shuffle_shards)
  // target mixture proportions + global keep budget (sample_mixture)
  private val MixWeights = Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.1,
    "src3" -> 0.05, "src4" -> 0.05, "src5" -> 0.05, "src6" -> 0.05)
  private val MixBudget = 0.2

  private def hvSql(salt: String) =
    s"""(instr('0123456789abcdef',
           substr(md5('$salt:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
        (instr('0123456789abcdef',
           substr(md5('$salt:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"""

  val oracle: Map[String, String] = Map(
    "sample_pack_pairs" ->
      """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok
                    FROM documents),
          r AS (SELECT doc_id, n_tok,
                       row_number() OVER (ORDER BY n_tok DESC, doc_id)
                         AS rnk,
                       COUNT(*) OVER () AS nn
                FROM t),
          b AS (SELECT doc_id, n_tok,
                       least(rnk, nn + 1 - rnk) AS bin FROM r)
          SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 string_agg(CAST(doc_id AS VARCHAR), ','
                            ORDER BY doc_id) AS ids,
                 CAST(SUM(n_tok) AS BIGINT) AS bin_tok
          FROM b GROUP BY bin""",
    "sample_curriculum" ->
      """WITH r AS (SELECT doc_id,
                           row_number() OVER (ORDER BY n_chars, doc_id)
                             AS rnk,
                           COUNT(*) OVER () AS total
                    FROM documents),
          dd AS (SELECT doc_id,
                        CAST(1 + ((rnk - 1) * 10) // total AS INT) AS decile
                 FROM r),
          e AS (SELECT doc_id, decile, CAST(u.e AS INT) AS epoch
                FROM dd, UNNEST([1, 2, 3]) AS u(e)
                WHERE decile <= 1 + 3 * u.e),
          h AS (SELECT epoch, doc_id, decile,
                       md5('cur:' || CAST(epoch AS VARCHAR) || ':' ||
                           CAST(doc_id AS VARCHAR)) AS hh
                FROM e),
          sh AS (SELECT epoch, doc_id, decile, hh,
                        CAST(((instr('0123456789abcdef', substr(hh, 1, 1))
                                 - 1) * 16 +
                              (instr('0123456789abcdef', substr(hh, 2, 1))
                                 - 1)) % 8 AS INT) AS shard
                 FROM h)
          SELECT epoch, doc_id, decile, shard,
                 row_number() OVER (PARTITION BY epoch, shard
                                    ORDER BY hh, doc_id) AS pos
          FROM sh""",
    "sample_epochs" ->
      s"""WITH b AS (SELECT doc_id, source,
                            CAST(regexp_extract(source, '(\\d+)', 1) AS INT)
                              % 7 AS k,
                            ${hvSql("epoch1")} AS hv
                     FROM documents),
          n AS (SELECT doc_id, source,
                       k // 2 + CASE WHEN k % 2 = 1 AND hv < 128
                                     THEN 1 ELSE 0 END AS n_copies
                FROM b)
          SELECT doc_id, source, CAST(u.c AS INT) AS copy
          FROM n, UNNEST(range(0, n_copies)) AS u(c)
          WHERE n_copies > 0""",
    "sample_hash" ->
      s"""SELECT doc_id, lang, source, ${hvSql("split1")} AS hv
          FROM documents WHERE ${hvSql("split1")} < $SampleThresh""",
    "sample_stratified" ->
      s"""WITH h AS (SELECT lang, source, doc_id, ${hvSql("strat1")} AS hv
                     FROM documents)
          SELECT lang, source, doc_id, hv, rk
          FROM (SELECT *, row_number() OVER (PARTITION BY lang, source
                  ORDER BY hv, doc_id) AS rk FROM h)
          WHERE rk <= $StratumK""",
    "sample_mixture" -> {
      val values = MixWeights
        .map { case (s, w) => s"('$s', CAST($w AS DOUBLE))" }.mkString(", ")
      s"""WITH c AS (SELECT source, COUNT(*) AS n_s FROM documents
                     GROUP BY source),
          t AS (SELECT COUNT(*) AS n_tot FROM documents),
          w(source, w) AS (VALUES $values),
          th AS (SELECT c.source,
                        round(256.0 * CAST($MixBudget AS DOUBLE) * w
                              * n_tot / n_s, 6) AS thresh
                 FROM c JOIN w USING (source) CROSS JOIN t),
          h AS (SELECT doc_id, source, ${hvSql("mixw1")} AS hv
                FROM documents)
          SELECT doc_id, h.source, hv, thresh
          FROM h JOIN th USING (source) WHERE hv < thresh"""
    },
    "sample_shuffle_shards" ->
      s"""WITH h AS (SELECT doc_id,
                            md5('shuf:' || CAST(doc_id AS VARCHAR)) AS h
                     FROM documents),
          b AS (SELECT doc_id, h,
                  CAST(((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
                        (instr('0123456789abcdef', substr(h, 2, 1)) - 1))
                       % $ShuffleShards AS INT) AS shard
                FROM h)
          SELECT doc_id, shard,
                 CAST(row_number() OVER (PARTITION BY shard
                        ORDER BY h, doc_id) AS BIGINT) AS pos
          FROM b""",
    "sample_temperature" ->
      s"""WITH c AS (SELECT lang, COUNT(*) AS n_s FROM documents GROUP BY lang),
          m AS (SELECT MIN(n_s) AS n_min FROM c),
          t AS (SELECT lang,
                       round(256.0 * sqrt(CAST(n_min AS DOUBLE) / n_s), 6) AS thresh
                FROM c, m),
          h AS (SELECT doc_id, lang, ${hvSql("mix1")} AS hv FROM documents)
          SELECT doc_id, h.lang, hv, thresh
          FROM h JOIN t USING (lang) WHERE hv < thresh""",
    "split_train_eval" ->
      s"""WITH h AS (SELECT doc_id, ${hvSql("split1")} AS hv FROM documents)
          SELECT CASE WHEN hv < $TrainHi THEN 'train'
                      WHEN hv < $ValHi THEN 'val' ELSE 'test' END AS split,
                 COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
                 MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
          FROM h GROUP BY 1""",
    "sample_pack_sequences" ->
      s"""WITH base AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                   md5(CAST(doc_id AS VARCHAR) || ':pack') AS h
            FROM documents),
          c AS (SELECT doc_id, n_tok,
                       COALESCE(SUM(n_tok) OVER (ORDER BY h, doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS cum0
                FROM base)
          SELECT CAST(FLOOR(CAST(cum0 AS DOUBLE) / $PackBudget) AS BIGINT) AS bin,
                 COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
                 CAST(SUM(doc_id) AS BIGINT) AS id_checksum
          FROM c GROUP BY 1""",
    "sample_weighted" ->
      s"""SELECT doc_id, lang,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                 round(-ln((${hvSql("wrs1")} + 1.0) / 257.0)
                       / CAST(len(string_split(text, ' ')) AS DOUBLE), 12)
                   AS clock
          FROM documents
          ORDER BY clock, doc_id LIMIT $WeightedN""",
    "sample_dsir" ->
      s"""WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
                       FROM documents),
          cnt AS (SELECT t, COUNT(*) AS c_s,
                         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_t
                  FROM tok GROUP BY t),
          tot AS (SELECT SUM(c_s) AS tot_s, SUM(c_t) AS tot_t,
                         COUNT(*) AS v
                  FROM cnt),
          w AS (SELECT t,
                       CAST(round(ln((c_t + 1.0) / (tot_t + v)) -
                                  ln((c_s + 1.0) / (tot_s + v)), 6)
                            AS DECIMAL(12,6)) AS w
                FROM cnt, tot)
          SELECT doc_id, any_value(lang) AS lang,
                 COUNT(*) AS n_tok, CAST(SUM(w) AS DOUBLE) AS score
          FROM tok JOIN w USING (t)
          GROUP BY doc_id
          ORDER BY score DESC, doc_id LIMIT $DsirN"""
  )
}
