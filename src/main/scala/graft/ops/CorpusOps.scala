package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: repetition
  * quality signals, exact repeated-substring spans, train/eval
  * decontamination, temperature mixture sampling, and kept-corpus
  * assembly. All are generic over the caller's frames/column names;
  * the harness queries (TextQueries/DedupQueries/SampleQueries) are
  * thin oracle-checked bindings of these onto the synthetic tables.
  *
  * Every shape is keyed — per-document aggregations, keyed joins, one
  * broadcast census — so nothing here degrades at corpus scale.
  */
object CorpusOps {

  /** Gopher-family repetition signals per document over a
    * pre-tokenized frame `(idCol, toksCol)` (docs with < 3 tokens are
    * dropped): duplicate-token fraction, the share of 2-gram
    * occurrences claimed by the most frequent 2-gram, and the share
    * of 3-gram occurrences whose gram repeats within the document.
    * Nothing leaves the document key; partial aggregation combines
    * map-side.
    */
  def repetitionSignals(docs: DataFrame, idCol: String, toksCol: String): DataFrame = {
    val id = col(idCol)
    val base = docs.select(id, col(toksCol).as("__toks"))
      .filter(size(col("__toks")) >= 3)
    def gramCounts(n: Int) = base
      .select(id, explode(TextOps.shingles(col("__toks"), n)).as("__g"))
      .groupBy(id, col("__g")).agg(count(lit(1)).as("__c"))
    val a2 = gramCounts(2).groupBy(id)
      .agg(max(col("__c")).as("__max2"), sum(col("__c")).as("__n2"))
    val a3 = gramCounts(3).groupBy(id)
      .agg(sum(when(col("__c") > 1, col("__c")).otherwise(0L)).as("__dup3"),
        sum(col("__c")).as("__n3"))
    base.select(id,
        size(col("__toks")).cast("long").as("n_tok"),
        size(array_distinct(col("__toks"))).cast("long").as("__nd"))
      .join(a2, Seq(idCol)).join(a3, Seq(idCol))
      .select(id, col("n_tok"),
        round(lit(1.0) - col("__nd").cast("double") / col("n_tok"), 6)
          .as("dup_tok_frac"),
        round(col("__max2").cast("double") / col("__n2"), 6).as("top2_frac"),
        round(col("__dup3").cast("double") / col("__n3"), 6).as("dup3_frac"))
  }

  /** Exact repeated-substring spans (the suffix-array dedup family
    * recast for a shuffle engine) over a pre-tokenized frame: every
    * `w`-token window is a seed, seeds whose window TEXT occurs more
    * than once globally mark their window as duplicated, and per
    * document the overlapping/adjacent duplicated windows condense
    * into maximal spans via the interval-islands sweep. Returns
    * `(idCol, span_start, span_end, n_seeds)` with 1-based inclusive
    * token positions.
    *
    * Duplication is decided in two passes: pass 1 finds 52-bit-hash
    * collisions (a superset of the true duplicates — at corpus scale
    * the birthday bound makes false hash collisions certain), pass 2
    * re-checks just that candidate subset by the FULL window string,
    * so a hash collision between two genuinely unique windows never
    * cuts text. removeSpans consumes this output, so the exactness
    * matters. Both passes are count-over-partition WINDOWS, not
    * census-aggregate + join-back: Spark never dedupes common
    * subplans, so the join-back shape re-tokenized the corpus once
    * per consumer (4 scans total). The seed frame itself is
    * INTS-ONLY — (id, position, 52-bit hash) via the native one-pass
    * window hasher — so the census shuffle moves 24 bytes per window
    * instead of carrying every window's string (~3x the volume, plus
    * a per-window string allocation in the scan); the window text is
    * re-derived from the tokenized docs for the CANDIDATE positions
    * only (one keyed join against the per-doc candidate-position
    * lists, then a per-row slice+join), and pass 2's exact string
    * count is bounded by that tiny subset.
    */
  def substringSpans(docs: DataFrame, idCol: String, toksCol: String,
                     w: Int): DataFrame = {
    val id = col(idCol)
    val base = docs.select(id, col(toksCol).as("__toks"))
      .filter(size(col("__toks")) >= w)
    val seeds = base
      .select(id,
        posexplode(call_function("shingle_hash52", col("__toks"), lit(w)))
          .as(Seq("__pos", "__s")))
      .select(id, (col("__pos") + 1).cast("long").as("__p"), col("__s"))
    // pass 1: candidates = windows whose 52-bit hash occurs > once
    val cand = seeds
      .withColumn("__c", count(lit(1)).over(Window.partitionBy(col("__s"))))
      .filter(col("__c") > 1)
      .select(id, col("__p"))
    // pass 2: exact string count within the candidate subset — equal
    // strings always share a hash, so no true duplicate was lost in
    // pass 1, and a false collision between unique windows dies here.
    // Window text exists only on this path: candidate positions fold
    // per doc, meet the tokens in ONE keyed join, and each position
    // slices its window out in-row (array_join over non-null tokens
    // is byte-identical to the hasher's concat_ws input).
    val candDocs = cand.groupBy(id).agg(collect_list(col("__p")).as("__ps"))
    val candG = base.join(candDocs, Seq(idCol))
      .select(id, explode(transform(col("__ps"), p =>
        struct(p.as("p"),
          array_join(slice(col("__toks"), p.cast("int"), lit(w)), " ")
            .as("g")))).as("__pg"))
      .select(id, col("__pg.p").as("__p"), col("__pg.g").as("__g"))
    val hits = candG
      .withColumn("__c2", count(lit(1)).over(Window.partitionBy(col("__g"))))
      .filter(col("__c2") > 1)
      .select(id, col("__p"))
    val win = Window.partitionBy(id).orderBy(col("__p"))
    val prevEnd = max(col("__p") + (w - 1))
      .over(win.rowsBetween(Window.unboundedPreceding, -1))
    hits
      .withColumn("__new",
        when(prevEnd.isNull || col("__p") > prevEnd + 1, 1).otherwise(0))
      .withColumn("__isl", sum(col("__new")).over(win))
      .groupBy(id, col("__isl"))
      .agg(min(col("__p")).as("span_start"),
        (max(col("__p")) + (w - 1)).as("span_end"),
        count(lit(1)).as("n_seeds"))
      .select(id, col("span_start"), col("span_end"), col("n_seeds"))
  }

  /** Distinct `(idCol, shingle-id)` rows for documents with at least
    * `n` tokens: shingles are hashed to 52-bit ints AT THE SOURCE so
    * every downstream shuffle/join moves 8-byte ints, and the minhash
    * family consumes the id directly (one digest per shingle total).
    */
  def shingleFrame(docs: DataFrame, idCol: String, toksCol: String,
                   n: Int): DataFrame =
    docs.select(col(idCol), col(toksCol).as("__toks"))
      .filter(size(col("__toks")) >= n)
      // one-pass native windows (ShingleHash52): value-identical to
      // explode(shingles) + minhashX, without the per-window lambda,
      // joined-string alloc, per-call MessageDigest, and hex/conv
      // round-trip — this is the dedup family's hottest corpus pass
      .select(col(idCol),
        explode(call_function("shingle_hash52", col("__toks"), lit(n))).as("s"))
      .distinct()

  /** MinHash signature frame `(idCol, h1..hk)` over a shingle frame —
    * one keyed agg of k multiply-add mins.
    */
  def minhashSignatures(sh: DataFrame, idCol: String, k: Int): DataFrame = {
    val aggs = TextOps.minhashAggs(col("s"), k)
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs `(da, db)` from a signature frame: explode
    * band keys, self-join per bucket — only documents sharing a band
    * bucket ever meet, which is what replaces the quadratic all-pairs
    * comparison at corpus scale.
    *
    * `bucketCap` is the hot-bucket backstop (the witness-pool posture,
    * shared with dedup_semantic's SemWitPool): the LEFT side of the
    * per-bucket self-join is restricted to each bucket's `bucketCap`
    * lowest ids (via the bounded-heap top-k operator — no window sort
    * on the hot bucket), while the right side stays the full
    * membership. Band-splitting bounds bucket sizes only while
    * signatures differ — a template shared verbatim by a slice of the
    * corpus pins every minhash row to the template's minima, so ALL
    * its members share ALL band buckets and an uncapped self-join
    * goes quadratic in the slice (measured: one 36-token template
    * over 15% of a 50k corpus = 2.4e8 candidate rows through 8
    * bands). The witness pool keeps that cost linear
    * (≤ bucketCap·|bucket| rows per bucket) WITHOUT dropping the
    * cluster: every member still pairs with the bucket's lowest-id
    * witnesses, so connected components collapse the whole template
    * cluster onto one representative downstream. For buckets at or
    * under the cap every member is a witness and the output is
    * bit-identical to the uncapped join; what the cap trades at skew
    * is only the non-witness×non-witness PAIRS inside hot buckets,
    * which `dedup_lsh_eval` gauges.
    */
  def lshCandidates(sig: DataFrame, idCol: String, bands: Int,
                    rowsPerBand: Int,
                    bucketCap: Int = Int.MaxValue): DataFrame = {
    val bs = sig.select(col(idCol),
      explode(TextOps.bandKeys(bands, rowsPerBand)).as("__bk"))
    val wit =
      if (bucketCap == Int.MaxValue) bs
      else RelOps.topKPerGroupExact(bs, Seq(col("__bk")), Seq(col(idCol)),
        bucketCap).select(col(idCol), col("__bk"))
    wit.select(col(idCol).as("da"), col("__bk"))
      .join(bs.select(col(idCol).as("db"), col("__bk").as("__bk2")),
        col("__bk") === col("__bk2") && col("da") < col("db"))
      .select("da", "db").distinct()
  }

  /** Exact-Jaccard verification of candidate pairs over the full
    * shingle frame: `(da, db, nab, na, nb, jaccard)` for pairs at or
    * above `thresh`. All joins are keyed on document ids.
    */
  /** (da, db, nab, na, nb, containment) for the candidate pairs, with
    * containment = |A∩B| / min(|A|, |B|) — the asymmetric near-dup
    * measure: a short document fully embedded in a long one scores
    * ~1.0 here while its Jaccard stays near |A|/|B| (tiny). This is
    * the doc-in-doc test every training-corpus dedup needs alongside
    * symmetric Jaccard (boilerplate pages wrapped around reused
    * bodies, quoted articles, concatenated dumps). Same exact
    * verification posture as [[jaccardVerify]]: candidates come from
    * whatever blocked generator the caller used; the measure itself
    * runs over the full shingle sets.
    */
  def containmentVerify(sh: DataFrame, cand: DataFrame, idCol: String,
                        thresh: Double): DataFrame =
    pairOverlap(sh, cand, idCol)
      .withColumn("containment",
        round(col("nab").cast("double") / least(col("na"), col("nb")), 6))
      .filter(col("containment") >= thresh)
      .select("da", "db", "nab", "na", "nb", "containment")

  /** (da, db, nab, na, nb) — exact intersection size per candidate
    * pair plus both set sizes; shared by the Jaccard and containment
    * verifiers.
    */
  private def pairOverlap(sh: DataFrame, cand: DataFrame,
                          idCol: String): DataFrame = {
    val ns = sh.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    val a = sh.select(col(idCol).as("da"), col("s"))
    // Pre-filter the probe side to candidate documents before the
    // intersection join (guide §3.2 — reduce the big side before
    // shuffling it): the candidate set is cap-bounded by every blocked
    // generator that feeds this verifier, so its distinct right-side
    // ids broadcast into a semi-join and only candidate documents'
    // shingle rows ever reach the (s, db) exchange. Without this the
    // FULL inverted index crossed that exchange to intersect against
    // a pair set that references a vanishing fraction of it.
    val b = sh.join(broadcast(cand.select(col("db").as(idCol)).distinct()),
        Seq(idCol), "left_semi")
      .select(col(idCol).as("db"), col("s").as("__sb"))
    cand.select(col("da"), col("db").as("__db"))
      .join(a, Seq("da"))
      .join(b, col("s") === col("__sb") && col("__db") === col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("nab"))
      .join(ns.select(col(idCol).as("da"), col("__n").as("na")), Seq("da"))
      .join(ns.select(col(idCol).as("db"), col("__n").as("nb")), Seq("db"))
  }

  def jaccardVerify(sh: DataFrame, cand: DataFrame, idCol: String,
                    thresh: Double): DataFrame =
    pairOverlap(sh, cand, idCol)
      .withColumn("jaccard",
        round(col("nab").cast("double") / (col("na") + col("nb") - col("nab")), 6))
      .filter(col("jaccard") >= thresh)
      .select("da", "db", "nab", "na", "nb", "jaccard")

  /** Exact per-group quantiles by rank selection: each requested
    * quantile `(name, a, b)` is the value at rank ceil(a·n/b) — no
    * interpolation and no sketch, so results are bit-identical across
    * engines and reruns (percentile()'s linear interpolation and
    * t-digest approximations are not). The ceil is integer arithmetic:
    * ceil(a·n/b) = floor((a·n + b − 1)/b).
    *
    * TWO-PASS rank selection, not a per-group row sort: pass 1 is a
    * (group, value) census with multiplicities — one hash aggregation
    * with map-side combine — and pass 2 sorts only the DISTINCT values
    * per group, walking cumulative multiplicity to find each candidate
    * rank (value at rank r = the census row with cum−m < r ≤ cum).
    * A mega-group of 10^9 rows over a bounded value domain (quality
    * scores, token counts) sorts only its distinct values instead of
    * every row; the all-distinct worst case degrades to the same sort
    * the naive window form pays.
    */
  def rankQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                    qs: Seq[(String, Int, Int)]): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val wAll = Window.partitionBy(col(groupCol))
    val census = df.select(col(groupCol), col(valueCol))
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__m"))
      .withColumn("__cum", sum(col("__m")).over(w))
      .withColumn("__n", sum(col("__m")).over(wAll))
    val qCols = qs.map { case (name, a, b) =>
      val r = floor((col("__n") * a + (b - 1)) / lit(b))
      max(when(col("__cum") - col("__m") < r && r <= col("__cum"),
        col(valueCol))).as(name)
    }
    census.groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"), qCols: _*)
  }

  /** Rewrite documents with their repeated spans cut out — the action
    * step of exact-substring dedup (keep one copy globally is the
    * caller's policy choice; this removes every marked span). `spans`
    * is [[substringSpans]] output. The span list per document is tiny
    * (a handful of intervals), so it folds back as one keyed
    * collect_list and the cut is a per-row higher-order filter over
    * token positions — no second shuffle of the corpus.
    */
  def removeSpans(docs: DataFrame, idCol: String, toksCol: String,
                  spans: DataFrame): DataFrame = {
    val spanList = spans.groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("__spans"))
    docs.join(spanList, Seq(idCol), "left_outer")
      .select(col(idCol), col(toksCol).as("__toks"), col("__spans"))
      .withColumn("__kept",
        when(col("__spans").isNull, col("__toks"))
          .otherwise(filter(col("__toks"), (t, i) =>
            !exists(col("__spans"), sp =>
              i + 1 >= sp.getField("s") && i + 1 <= sp.getField("e")))))
      .select(col(idCol),
        (size(col("__toks")) - size(col("__kept"))).cast("long")
          .as("n_removed_tok"),
        concat_ws(" ", col("__kept")).as("new_text"))
  }

  /** Train/eval decontamination over shingle frames: `train` holds
    * distinct `(idCol, shingleCol)` rows for the training corpus,
    * `evalShingles` the shingle ids of the held-out benchmark. The
    * eval side is broadcast — at corpus scale it is the tiny side and
    * the train scan must not shuffle against it. Returns per
    * contaminated train document `(idCol, n_overlap, n_shingles,
    * contamination)`.
    */
  def decontaminate(train: DataFrame, evalShingles: DataFrame,
                    idCol: String, shingleCol: String): DataFrame = {
    val id = col(idCol)
    val ns = train.groupBy(id).agg(count(lit(1)).as("n_shingles"))
    val hits = train.join(broadcast(evalShingles.select(col(shingleCol)).distinct()),
        Seq(shingleCol))
      .groupBy(id).agg(count(lit(1)).as("n_overlap"))
    hits.join(ns, Seq(idCol))
      .select(id, col("n_overlap"), col("n_shingles"),
        round(col("n_overlap").cast("double") / col("n_shingles"), 6)
          .as("contamination"))
  }

  /** Temperature mixture sampling with α = 1/2: per-stratum keep
    * probability ∝ n^(α-1) = n^(-1/2), normalized so the smallest
    * stratum keeps everything. `hashByte` must be a deterministic
    * 0-255 hash of the row id (e.g. TextOps.hexByteValue over a
    * salted md5). α = 1/2 is deliberate: sqrt is IEEE-exact on every
    * engine, so the per-stratum threshold — and therefore the kept id
    * set — is bit-reproducible. The stratum census is one tiny agg
    * broadcast back onto the scan; the data side never shuffles.
    * Returns the input rows that survive, plus `hv` and `thresh`.
    */
  def temperatureSample(df: DataFrame, stratumCol: String,
                        hashByte: Column): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n_s"))
    val weighted = counts.crossJoin(counts.agg(min(col("__n_s")).as("__n_min")))
      .select(col(stratumCol),
        round(lit(256.0) * sqrt(col("__n_min").cast("double") / col("__n_s")), 6)
          .as("thresh"))
    df.join(broadcast(weighted), Seq(stratumCol))
      .withColumn("hv", hashByte)
      .filter(col("hv") < col("thresh"))
  }

  /** Deterministic sequence packing (the concat-and-chunk step of a
    * pretraining pipeline): documents are laid out in a stable salted
    * -hash order and chunked into `budget`-token context windows; a
    * document belongs to the bin its first token lands in. Returns
    * `(idCol, n_tok, bin)`.
    *
    * The global running offset is a DISTRIBUTED prefix sum, not one
    * giant window: rows bucket by the first byte of their order hash
    * (the bucket id is an order-preserving prefix, so bucket-then-hash
    * order equals global hash order), per-bucket totals make a 256-row
    * census whose exclusive cumsum — the only single-partition window,
    * over 256 rows — broadcasts back as each bucket's base offset, and
    * each bucket then cumsums its own rows independently. One shuffle
    * on the bucket key; no partition ever sees more than ~1/256 of the
    * corpus in its window sort.
    */
  def packSequences(df: DataFrame, idCol: String, nTokCol: String,
                    budget: Long): DataFrame = {
    require(budget >= 1, s"packSequences requires budget >= 1, got $budget")
    val h = md5(concat(col(idCol).cast("string"), lit(":pack")))
    val base = df.select(col(idCol), col(nTokCol).cast("long").as("n_tok"))
      .withColumn("__h", h)
      .withColumn("__b", conv(substring(col("__h"), 1, 2), 16, 10).cast("long"))
    val census = base.groupBy(col("__b")).agg(sum(col("n_tok")).as("__bt"))
      .withColumn("__off", coalesce(sum(col("__bt")).over(
        Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    val w = Window.partitionBy(col("__b")).orderBy(col("__h"), col(idCol))
    base.join(broadcast(census), Seq("__b"))
      .withColumn("__cum0", coalesce(sum(col("n_tok")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + col("__off"))
      .select(col(idCol), col("n_tok"),
        floor(col("__cum0") / budget).as("bin"))
  }

  /** Deterministic global shuffle into `nShards` balanced training
    * shards — the "shuffle the corpus before training" stage, made a
    * pure function of the data: shard = salted-md5 byte mod nShards,
    * within-shard order = lexicographic on the full hash. Reruns and
    * engines agree; adding documents never changes the relative order
    * of existing ones within a shard.
    *
    * The within-shard position is a DISTRIBUTED prefix sum, not one
    * window per shard: rows sub-bucket on the hash's first byte (the
    * sort key's most significant digits, so bucket order IS hash
    * order), a 256-row census computes each sub-bucket's offset
    * within its shard, and a window ranks only within (shard,
    * sub-bucket) — no reducer ever sorts a whole shard, the same
    * layout `packSequences` uses for its global token offsets. At
    * 100 TB you widen the sub-bucket to more hash digits so each
    * (shard, bucket) run fits an executor; the census stays tiny and
    * broadcasts.
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"shuffleShards requires nShards >= 1, got $nShards")
    val base = df.select(col(idCol))
      .withColumn("__h", md5(concat(lit("shuf:"), col(idCol).cast("string"))))
      .withColumn("__b", conv(substring(col("__h"), 1, 2), 16, 10).cast("long"))
      .withColumn("shard", (col("__b") % nShards).cast("int"))
    val census = base.groupBy(col("shard"), col("__b"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(
        Window.partitionBy(col("shard")).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("__b"), col("__off"))
    val w = Window.partitionBy(col("shard"), col("__b"))
      .orderBy(col("__h"), col(idCol))
    base.join(broadcast(census), Seq("shard", "__b"))
      .withColumn("pos", col("__off") + row_number().over(w))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Kept-corpus assembly after near-dup clustering: drop every non
    * -representative member of a component (the representative is the
    * min-label node, i.e. the component id itself). `components` is
    * the `(node, component)` labeling from
    * [[Graphs.connectedComponents]]; one anti-join against the
    * duplicate list.
    */
  def keepRepresentatives(corpus: DataFrame, idCol: String,
                          components: DataFrame): DataFrame = {
    val dups = components.filter(col("component") =!= col("node"))
      .select(col("node").as(idCol))
    corpus.join(dups, Seq(idCol), "left_anti")
  }

  /** Candidate pair generation inside capped blocks — the shared
    * skeleton of every "block, cap, self-join" near-dup path
    * (edit-distance first-token blocks, pHash signature blocks),
    * carrying the WITNESS-POOL hot-block semantics of
    * [[lshCandidates]] (r17 — previously over-cap blocks were DROPPED
    * entirely, which silently passed >cap template clusters through
    * downstream connected components; the r16 LSH fix, applied
    * uniformly): the LEFT join side is restricted to each block's
    * `cap` LOWEST ids (via the bounded-heap top-k operator — no
    * window sort on the hot block), the RIGHT side stays the full
    * membership. Blocks at or under the cap emit every pair,
    * bit-identical to the uncapped join; an over-cap block emits each
    * member paired with the block's lowest-id witnesses — ≤
    * cap·|block| rows, linear in the block instead of quadratic — so
    * template clusters (boilerplate, blank pages) still collapse onto
    * one representative downstream, and only non-witness×non-witness
    * pairs are traded (gauged by the family's *_eval queries).
    *
    * BOTH join sides are spread with a user-specified width on the
    * block key. The explicit width is load-bearing: these block
    * frames are a few MB of skinny rows, so AQE's size-based
    * coalescing collapses the join's shuffle to ~one partition while
    * the join OUTPUT is the multi-million-pair expansion — the whole
    * per-pair kernel then runs on one core (the expanding-join rule
    * in SCALE.md). A user-specified width is never coalesced and
    * identical partitioning on both sides is reused by the sort-merge
    * join. Returns one row per unordered pair: (da, db) plus
    * `payload` columns carried from each side as <c>_a / <c>_b.
    */
  def cappedSelfJoin(df: DataFrame, idCol: String, keyCol: String,
                     cap: Int, parts: Int,
                     payload: Seq[String] = Nil): DataFrame = {
    val wit = RelOps.topKPerGroupExact(df, Seq(col(keyCol)),
      Seq(col(idCol)), cap).drop("rk")
    def side(src: DataFrame, suffix: String, id: String) = src.select(
      (col(keyCol).as(if (suffix == "a") keyCol else s"__$keyCol") +:
        col(idCol).as(id) +:
        payload.map(c => col(c).as(s"${c}_$suffix"))): _*)
      .repartition(parts,
        if (suffix == "a") col(keyCol) else col(s"__$keyCol"))
    side(wit, "a", "da").join(side(df, "b", "db"),
      col(keyCol) === col(s"__$keyCol") && col("da") < col("db"))
      .drop(s"__$keyCol")
  }
}
