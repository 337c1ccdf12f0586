package graft.api

import graft.intervals.Intervals
import graft.kernels.{HmmLogo, MatchMerge, MatchPipeline}
import graft.ops.SignatureHierarchy
import graft.ops.{CorpusOps, Graphs, RelOps, TaxaTree, TextOps, VectorOps}
import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** The library facade: one import for a user replacing the reference
  * warehouse builder. Each method names the reference capability it
  * stands in for and delegates to the tested operator underneath —
  * the mapping the SURVEY.md §8 coverage table documents, as code.
  *
  * {{{
  * import graft.api.Graft
  * val merged  = Graft.mergeMatches(rawMatches)          // oracle/matches.py
  * val trees   = Graft.taxonomyTrees(hits, taxaDim)      // xrefs/entries.py
  * val comps   = Graft.connectedComponents(pairs, "a", "b")
  * val ranked  = Graft.topKPerGroup(df, Seq($"k"), Seq($"score".desc), 10)
  * }}}
  *
  * Session requirement: custom SQL functions (array_dot, gzip_*,
  * hamming_bits) and the top-k physical operator resolve in sessions
  * built with `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object Graft {

  // ---- match processing kernels (reference interpro/oracle/matches.py)

  /** K1-K3: merge per-protein matches — representative domain/family
    * selection, location grouping, InterPro-entry synthesis with
    * condensed locations. Differentially tested against the
    * reference's merge_uniprot_matches (80-case fixture).
    */
  def mergeMatches(raw: Dataset[MatchMerge.RawMatch]): Dataset[MatchMerge.MergedMatch] =
    MatchPipeline.mergeMatches(raw)

  /** K3 standalone: condense location spans with the 10% overlap rule
    * (condense_locations; 120-case differential).
    */
  def condenseLocations(locations: Seq[Seq[Intervals.Fragment]],
                        minRatio: Double = 0.1): Seq[(Int, Int)] =
    Intervals.condenseLocations(locations, minRatio)

  /** PANTHER/FunFam subfamily hierarchy rewrite + validation
    * (oracle/matches.py:359-364, oracle/entries.py:789-813).
    */
  def signatureHierarchy(sigs: DataFrame): DataFrame =
    SignatureHierarchy.validate(sigs)

  /** K6: HMMER3 model text → per-position logo columns, distributed. */
  def hmmLogos(models: Dataset[(String, String)]): DataFrame =
    HmmLogo.logoFrame(models)

  // ---- taxonomy (reference interpro/oracle/taxa.py, xrefs/entries.py)

  /** Root→self lineage arrays from (id, parent) rows — the
    * parent-pointer closure every rollup explodes.
    */
  def lineageClosure(nodes: DataFrame, idCol: String, parentCol: String): DataFrame =
    Graphs.lineageClosure(nodes, idCol, parentCol)

  /** K5: per-entry 8-rank distribution trees with placeholder ids and
    * species counts (24-taxonomy differential vs the reference).
    */
  def taxonomyTrees(hits: DataFrame, taxa: DataFrame): DataFrame =
    TaxaTree.entryRankTrees(hits, taxa)

  /** Counts propagated to every ancestor via an exploded lineage. */
  def lineageRollup(df: DataFrame, lineage: Column, aggs: Seq[Column]): DataFrame =
    RelOps.lineageRollup(df, lineage, aggs)

  // ---- relational operators the reference hand-rolls

  /** As-of join against a small sorted dimension (release freeze dates). */
  def asofNext(left: DataFrame, leftTs: Column, right: DataFrame,
               rightKey: Column, as: String): DataFrame =
    RelOps.asofNext(left, leftTs, right, rightKey, as)

  /** Keyed interval-overlap join. */
  def intervalJoin(left: DataFrame, right: DataFrame, equi: Column,
                   lStart: Column, lEnd: Column,
                   rStart: Column, rEnd: Column): DataFrame =
    RelOps.intervalJoin(left, right, equi, lStart, lEnd, rStart, rEnd)

  /** Gaps-and-islands grouping (the condensation sweep as a window). */
  def islands(df: DataFrame, group: Seq[Column], start: Column, end: Column,
              tiebreak: Column, islandCol: String): DataFrame =
    RelOps.islands(df, group, start, end, tiebreak, islandCol)

  /** Bounded top-k per group through the custom physical operator. */
  def topKPerGroup(df: DataFrame, part: Seq[Column], order: Seq[Column],
                   k: Int): DataFrame =
    RelOps.topKPerGroup(df, part, order, k)

  /** Skew-safe equi-join: spread a hot fact key over `salt` reducers. */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
                     salt: Int): DataFrame =
    RelOps.saltedEquiJoin(fact, dim, key, salt)

  /** Near-dup endgame: connected components by min-label propagation. */
  def connectedComponents(edges: DataFrame, src: String, dst: String): DataFrame =
    Graphs.connectedComponents(edges, src, dst)

  // ---- training-data text/vector primitives (north-star ops)

  /** Normalized bag-of-words fingerprint (exact-dedup key). */
  def fingerprint(text: Column): Column = TextOps.fingerprint(text)

  /** Word n-gram shingles over a token array. */
  def shingles(tokens: Column, n: Int): Column = TextOps.shingles(tokens, n)

  /** 52-bit portable hash (minhash input / shingle id). */
  def hash52(c: Column): Column = TextOps.minhashX(c)

  /** Brute-force cosine top-k (the ANN correctness baseline). */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, qId: String,
                 cId: String, qVec: String, cVec: String, k: Int): DataFrame =
    VectorOps.bruteForceTopK(queries, corpus, qId, cId, qVec, cVec, k)

  /** Blocked cosine near-dup pairs (label/bucket-blocked). */
  def blockedCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                         blockCol: String): DataFrame =
    VectorOps.blockedPairs(df, idCol, vecCol, blockCol)

  /** Product-quantization family — the compressed ANN index (vectors
    * → nSub codes into per-subspace codebooks; ADC search against
    * broadcast lookup tables). See VectorOps.pq* for stage contracts.
    */
  def pqSubvectors(emb: DataFrame, idCol: String, vecCol: String,
                   nSub: Int, subDim: Int): DataFrame =
    VectorOps.pqSubvectors(emb, idCol, vecCol, nSub, subDim)

  def pqTrainCodebook(sub: DataFrame, seeds: DataFrame,
                      idCol: String): DataFrame =
    VectorOps.pqTrainCodebook(sub, seeds, idCol)

  def pqEncode(sub: DataFrame, codebook: DataFrame, idCol: String): DataFrame =
    VectorOps.pqEncode(sub, codebook, idCol)

  def pqSearchTopK(encoded: DataFrame, queryTables: DataFrame,
                   idCol: String, k: Int): DataFrame =
    VectorOps.pqSearchTopK(encoded, queryTables, idCol, k)

  /** Every ordered element pair (i<j) of an array column, streamed by
    * the native ordered_pairs generator (no intermediate pair arrays);
    * above `cap` set sizes the expansion falls back to a positional
    * self-join to bound per-row work.
    */
  def orderedPairs(sets: DataFrame, keys: Seq[String], setCol: String,
                   cap: Int = 256): DataFrame =
    RelOps.orderedPairs(sets, keys, setCol, cap)

  // ---- corpus curation (north-star ops)

  /** Gopher-family repetition quality signals per document. */
  def repetitionSignals(docs: DataFrame, idCol: String, toksCol: String): DataFrame =
    CorpusOps.repetitionSignals(docs, idCol, toksCol)

  /** Maximal exact repeated-substring spans (suffix-array dedup,
    * recast as seed census + interval condensation).
    */
  def substringSpans(docs: DataFrame, idCol: String, toksCol: String,
                     w: Int): DataFrame =
    CorpusOps.substringSpans(docs, idCol, toksCol, w)

  /** Cut repeated spans (from [[substringSpans]]) out of documents —
    * the action step of exact-substring dedup.
    */
  def removeSpans(docs: DataFrame, idCol: String, toksCol: String,
                  spans: DataFrame): DataFrame =
    CorpusOps.removeSpans(docs, idCol, toksCol, spans)

  /** Train/eval n-gram decontamination (broadcast eval probe). */
  def decontaminate(train: DataFrame, evalShingles: DataFrame,
                    idCol: String, shingleCol: String): DataFrame =
    CorpusOps.decontaminate(train, evalShingles, idCol, shingleCol)

  /** Temperature (α=1/2) mixture downsampling of over-represented
    * strata; `hashByte` is a deterministic 0-255 row hash.
    */
  def temperatureSample(df: DataFrame, stratumCol: String,
                        hashByte: Column): DataFrame =
    CorpusOps.temperatureSample(df, stratumCol, hashByte)

  /** Kept corpus after near-dup clustering (anti-join against non
    * -representative component members).
    */
  def keepRepresentatives(corpus: DataFrame, idCol: String,
                          components: DataFrame): DataFrame =
    CorpusOps.keepRepresentatives(corpus, idCol, components)

  /** Exact per-group quantiles by integer rank selection — value at
    * rank ceil(a·n/b) per `(name, a, b)`; bit-identical across
    * engines and reruns where interpolation/sketches are not.
    */
  def rankQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                    qs: Seq[(String, Int, Int)]): DataFrame =
    CorpusOps.rankQuantiles(df, groupCol, valueCol, qs)

  /** 64-bit block-mean perceptual hash over a `(doc_id, blob)` frame
    * (canonicalize the payload first; pair with a pigeonhole hamming
    * join for near-dup candidates).
    */
  def perceptualHash(df: DataFrame): DataFrame =
    graft.ops.Multimodal.perceptualHash(df)

  /** BPE tokenizer training at corpus scale (Sennrich et al. 2016):
    * the corpus contributes ONE word-count groupBy; every merge round
    * runs on the vocabulary-sized frequency table. Deterministic
    * merge order (count desc, pair asc), differential-tested against
    * the classic single-machine algorithm (BpeSpec).
    */
  def bpeWordCounts(docs: DataFrame, textCol: String): DataFrame =
    graft.ops.Bpe.wordCounts(docs, textCol)

  def bpeTrain(spark: org.apache.spark.sql.SparkSession, counts: DataFrame,
               rounds: Int): (Seq[graft.ops.Bpe.Merge],
                 org.apache.spark.sql.Dataset[graft.ops.Bpe.WordSeg]) =
    graft.ops.Bpe.train(spark, counts, rounds)

  def bpeEncode(word: String, merges: Seq[graft.ops.Bpe.Merge]): Seq[String] =
    graft.ops.Bpe.encode(word, merges)

  /** Canonical text normalization: NFC compose (native codegen
    * expression), unicode lowercase, whitespace collapse, trim —
    * the cleanup every dedup/fingerprint key assumes.
    */
  def normalizeText(text: Column): Column = {
    import org.apache.spark.sql.functions._
    trim(regexp_replace(lower(call_function("nfc_normalize", text)),
      "\\s+", " "))
  }

  /** Deterministic global shuffle into `nShards` training shards:
    * (shard, pos) is a pure function of the id — bucketed prefix
    * sum, no whole-shard sort (CorpusOps.shuffleShards).
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int): DataFrame =
    CorpusOps.shuffleShards(df, idCol, nShards)

  /** SpaceSaving frequent-items summary (k counters per map task,
    * one k-entry state per partition on the shuffle); exact while a
    * summary holds <= k distinct items, and in the over-capacity
    * regime the over-estimate bracket true <= est <= true + err
    * survives every partial-aggregation merge (lossy summaries
    * min-offset absent items — kernels/HeavyHitters.scala).
    */
  def heavyHitters(k: Int) = graft.kernels.HeavyHitters.spaceSaving(k)

  /** Streaming windowed top-k: the SpaceSaving summary held as
    * flatMapGroupsWithState state — k counters per open window, never
    * the key universe (streaming/StreamTopK.scala; replay semantics
    * pinned by StreamTopKSpec).
    *
    * STATE-SCHEMA NOTE: the state row is `HeavyHitters.SsBuf(entries,
    * lossy)`. The `lossy` field was added when the Stream-Summary
    * kernel gained min-offset merges, which CHANGED the state schema —
    * a streaming checkpoint written by a build without that field
    * cannot be restored by this one. Restart such a query from a fresh
    * checkpoint directory (the sink dedupes on max n_processed per
    * (window, rank), so a replayed warm-up converges to the same
    * answers).
    */
  def streamTopK(events: Dataset[graft.streaming.StreamTopK.KeyedEvent],
                 capacity: Int, topN: Int)
      : Dataset[graft.streaming.StreamTopK.TopKOut] =
    graft.streaming.StreamTopK.topkStream(events, capacity, topN)

  /** Persisted IVF-int8 vector index (sources/VectorIndex): build a
    * cell-partitioned code layout + centroid sidecar once, append
    * O(batch), serve with partition-pruned integer-dot probes
    * (VectorIndexSpec pins persisted == in-memory search).
    */
  def vectorIndexBuild(emb: DataFrame, idCol: String, vecCol: String,
                       nCells: Int, outDir: String): Unit =
    graft.sources.VectorIndex.build(emb, idCol, vecCol, nCells, outDir)

  def vectorIndexAppend(spark: org.apache.spark.sql.SparkSession,
                        indexDir: String, emb: DataFrame,
                        idCol: String, vecCol: String): Unit =
    graft.sources.VectorIndex.append(spark, indexDir, emb, idCol, vecCol)

  def vectorIndexSearch(spark: org.apache.spark.sql.SparkSession,
                        indexDir: String, queries: DataFrame,
                        idCol: String, vecCol: String,
                        nprobe: Int, k: Int): DataFrame =
    graft.sources.VectorIndex.search(spark, indexDir, queries, idCol,
      vecCol, nprobe, k)

  /** Distributed PCA (ops/Pca): decimal-exact moment accumulation on
    * the cluster (d(d+1)/2 rows per partition at the exchange),
    * deterministic cyclic-Jacobi eigendecomposition on the collected
    * d x d, shuffle-free per-row projection (PcaSpec).
    */
  def pcaFit(emb: DataFrame, vecCol: String, d: Int): graft.ops.Pca.Model =
    graft.ops.Pca.fit(emb, vecCol, d)

  def pcaProject(emb: DataFrame, idCol: String, vecCol: String,
                 model: graft.ops.Pca.Model, k: Int): DataFrame =
    graft.ops.Pca.project(emb, idCol, vecCol, model, k)

  /** Zone-map clustered write: `files` range-clustered parquet files
    * plus a per-file [min,max] sidecar under `path/_zonemap`.
    */
  def zoneMapWrite(df: DataFrame, path: String, files: Int, key: String,
                   statCols: Seq[String]): Unit =
    graft.sources.ZoneMap.write(df, path, files, key, statCols)

  /** Range read that prunes data files by sidecar zones before the
    * scan; returns the frame plus (total, scanned) file counts.
    */
  def zoneMapRead(spark: org.apache.spark.sql.SparkSession, path: String,
                  c: String, lo: Long, hi: Long): graft.sources.ZoneMap.Pruned =
    graft.sources.ZoneMap.prunedRead(spark, path, c, lo, hi)

  /** Streaming CDC apply: latest-wins keyed upsert/delete state under
    * the (ts, event_id) total order; emits the key's current row per
    * batch with a monotone n_processed (drain: keep max per key).
    */
  def cdcApplyStream(ops: Dataset[graft.streaming.CdcApply.CdcOp])
      : Dataset[graft.streaming.CdcApply.CdcRow] =
    graft.streaming.CdcApply.applyStream(ops)

  /** Streaming CUSUM changepoint monitor: the known-target tabular
    * form with six longs of state per key (current S, alarms, events,
    * the last-folded (us, event_id) order watermark, and its
    * n_violations counter), exact integer steps; emits the key's
    * current summary per batch with a monotone n_processed (drain:
    * keep max per key). The batch form over a keyed frame is the
    * prefix identity S_t = P_t − min(0, running_min(P)) — see
    * `window_cusum`.
    *
    * STATE-SCHEMA NOTE: the state row is `Cusum.CusumBuf`. The
    * lastUs/lastEid/nViolations fields were added with the enforced
    * ordered-batches contract, which CHANGED the state schema — a
    * streaming checkpoint written by a build without those fields
    * cannot be restored by this one. Restart such a query from a
    * fresh checkpoint directory (the sink dedupes on max n_processed
    * per key, so a replayed warm-up converges to the same answers).
    *
    * Replay semantics: the ordered-batches contract is ENFORCED and
    * IDEMPOTENT — an event at-or-before the watermark bumps
    * `n_violations` and is skipped, never folded, so a replayed
    * duplicate batch from an at-least-once upstream leaves
    * S/n_processed/n_alarms bit-identical to exactly-once delivery
    * (CusumReplaySpec pins the case). The cost: a genuinely late
    * novel event is indistinguishable from a duplicate and is
    * likewise dropped from the trajectory (folding it out of order
    * would retroactively corrupt S for every later step);
    * n_violations > 0 is the signal to investigate the upstream.
    */
  def cusumStream(events: Dataset[graft.streaming.Cusum.CusumEvent],
                  target: Long, drift: Long, threshold: Long)
      : Dataset[graft.streaming.Cusum.CusumOut] =
    graft.streaming.Cusum.cusumStream(events, target, drift, threshold)
}
