package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operators the reference implements by hand and
  * Spark lacks as single built-ins, re-expressed as composable
  * DataFrame rewrites (SURVEY.md §2.3 J7/J8, §2.5 W2).
  *
  * Scale posture: every helper here avoids driver-side state and keeps
  * the heavy side of each join distributed; the only collected data are
  * genuinely tiny dimensions (release freeze dates).
  */
object RelOps {

  /** As-of join against a *small, naturally bounded* dimension (release
    * freeze dates — reference maps audit timestamps to the next release
    * freeze via bisect, interpro/oracle/entries.py:330-346).
    *
    * For each left row, attaches the smallest `rightKey >= leftTs` as
    * column `as`. Implemented as a single-row broadcast of the sorted
    * key array + a higher-order `filter(...)[0]` probe: zero shuffle of
    * the big side, no per-row join blow-up. The probe is a linear scan
    * of the broadcast array — fine by contract (the right side is
    * dozens of keys); a bisect expression would only pay off at
    * thousands. Rows with no following key get NULL.
    *
    * This is the 100 TB-safe plan when the right side is a dimension
    * (dozens of release dates); for big-big as-of, sort both sides and
    * use a range join instead.
    */
  def asofNext(left: DataFrame, leftTs: Column, right: DataFrame,
               rightKey: Column, as: String): DataFrame = {
    val keys = right.select(rightKey.as("__k")).distinct()
      .agg(sort_array(collect_list(col("__k"))).as("__asof_keys"))
    left.crossJoin(broadcast(keys))
      .withColumn(as, try_element_at(filter(col("__asof_keys"), k => k >= leftTs), lit(1)))
      .drop("__asof_keys")
  }

  /** Interval-overlap join with equi keys (reference: match locations vs
    * PDB chain segments keyed by pdb_chain, interpro/utils.py:21-40).
    * Plain equi-join + range predicate: Catalyst plans SMJ/broadcast on
    * the equi part and the overlap predicate stays a post-join filter —
    * the right plan when the equi key is selective.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, equi: Column,
                   lStart: Column, lEnd: Column,
                   rStart: Column, rEnd: Column): DataFrame =
    left.join(right, equi && lStart <= rEnd && rStart <= lEnd)

  /** Key-less (or low-selectivity-key) interval-overlap join via bin
    * bucketing: explode each interval into the W-sized bins it covers,
    * equi-join on bin, and keep each matching pair exactly once (at the
    * bin containing the overlap's left edge) — no `distinct` needed.
    * Turns a broadcast-nested-loop theta join into a shuffled hash/SMJ
    * equi-join, which is what survives at 100 TB.
    */
  def binnedIntervalJoin(left: DataFrame, right: DataFrame, binWidth: Long,
                         lStart: String, lEnd: String,
                         rStart: String, rEnd: String): DataFrame = {
    def binned(df: DataFrame, s: String, e: String) =
      df.withColumn("__bin",
        explode(sequence(floor(col(s) / binWidth), floor(col(e) / binWidth))))
    val l = binned(left, lStart, lEnd)
    val r = binned(right, rStart, rEnd)
    val lS = l(lStart); val lE = l(lEnd); val rS = r(rStart); val rE = r(rEnd)
    l.join(r, l("__bin") === r("__bin") && lS <= rE && rS <= lE &&
        l("__bin") === floor(greatest(lS, rS) / binWidth))
      .drop("__bin")
  }

  /** Gaps-and-islands: assign an island id to rows whose [start,end]
    * intervals chain together (start <= running max end) within a group
    * (reference condense sweep, interpro/oracle/matches.py:60-103).
    * Adds column `islandCol`. `tiebreak` must make the ordering total.
    */
  def islands(df: DataFrame, group: Seq[Column], start: Column, end: Column,
              tiebreak: Column, islandCol: String): DataFrame = {
    val w = Window.partitionBy(group: _*).orderBy(start, end, tiebreak)
    val prevMax = max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("__newIsland",
        when(prevMax.isNull || start > prevMax, 1).otherwise(0))
      .withColumn(islandCol,
        sum(col("__newIsland")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__newIsland")
  }

  /** Top-k rows per group with a total order (reference keeps the best
    * MAX_DOM_BY_GROUP=20 domains, interpro/oracle/matches.py:136-141).
    */
  def topKPerGroup(df: DataFrame, part: Seq[Column], order: Seq[Column],
                   k: Int, rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(part: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Same contract through the custom whole-operator
    * (graft.plans.LocalTopKPerGroup → TopKPerGroupExec): one hash
    * shuffle on the group keys, then a bounded k-row heap per group —
    * O(n log k) and O(groups·k) memory instead of the window
    * formulation's full partition sort. `order` must be a total order
    * for deterministic ranks.
    */
  def topKPerGroupExact(df: DataFrame, part: Seq[Column], order: Seq[Column],
                        k: Int, rankCol: String = "rk"): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
    val child = df.queryExecution.analyzed
    val sortOrders = order.map(c => GraftSqlBridge.resolvedExpr(c, child) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    GraftSqlBridge.ofRows(df.sparkSession,
      graft.plans.LocalTopKPerGroup(k,
        part.map(GraftSqlBridge.resolvedExpr(_, child)), sortOrders,
        rankCol, child))
  }

  /** Hierarchical rollup over a precomputed lineage array: one output
    * row per (ancestor, agg) — reference propagates per-taxon counts to
    * all ancestors by parent-pointer walking
    * (interpro/xrefs/taxa.py:195-260); here the lineage is exploded and
    * Spark's partial aggregation replaces the hand-rolled dict merge.
    */
  def lineageRollup(df: DataFrame, lineage: Column, aggs: Seq[Column],
                    nodeCol: String = "node_id"): DataFrame =
    df.select(explode(lineage).as(nodeCol), col("*"))
      .groupBy(col(nodeCol)).agg(aggs.head, aggs.tail: _*)

  /** Skew-safe equi-join for a HOT-KEY fact side: the fact salts its
    * key into `salt` sub-keys (deterministic spread via pmod(hash)),
    * the dimension replicates each row `salt` times, and the join runs
    * on (key, salt) — a hot key's rows land on `salt` different
    * reducers instead of one straggler. This is the static form of
    * what AQE's skew-join split does at runtime; use it when the skew
    * is KNOWN (taxonomy roots, boilerplate fingerprints) or when the
    * join feeds a cached/reused frame AQE won't re-plan. Result is
    * row-identical to `fact.join(dim, keys)` — the spec proves it.
    * Cost: dim inflates by `salt`; keep salt ~8-32 and the dim small
    * (it usually broadcasts anyway at that size — then salting is
    * unnecessary; this targets dims too big to broadcast).
    *
    * The salt hashes the WHOLE fact row, never a per-task counter:
    * `monotonically_increasing_id` (the tempting spreader) is marked
    * nondeterministic, which makes the map stage INDETERMINATE — on a
    * real cluster every shuffle-fetch failure in an indeterminate
    * stage rolls back the entire stage plus all consumers instead of
    * re-running one map task. A content hash spreads exactly as well
    * whenever the hot key's rows differ in any column (true for any
    * fact with a row identity); fully-identical rows share a salt,
    * which only re-creates the straggler if ONE byte-identical row
    * dominates the key — a shape AQE's runtime skew split still
    * handles downstream. Columns containing MapType anywhere in their
    * type are excluded from the hash — xxhash64 rejects them with an
    * AnalysisException (map ordering is undefined) — and the
    * remaining columns spread just as well; a frame that is ONLY
    * unhashable columns falls back to hashing the key alone
    * (degenerate spread, but correct).
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
                     salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val hashCols = fact.schema.fields
      .filterNot(f => hasMap(f.dataType)).map(f => col(f.name)).toIndexedSeq
    val salted = fact.withColumn("__salt",
      pmod(xxhash64((if (hashCols.nonEmpty) hashCols
                     else IndexedSeq(col(key))): _*), lit(salt)))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Ordered within-set pairs — every (earlier, later) element pair of
    * each row's `setCol` array, keyed by `keys` (which must identify
    * the set row uniquely) — with a skew guard. Sets of up to `cap`
    * elements expand INSIDE the array (shuffle-free, the co-occurrence
    * plan the reference's pairwise counters imply,
    * interpro/xrefs/entries.py:103-134). Sets ABOVE the cap take a
    * posexplode + self-equi-join on the set key: O(n) rows per set
    * instead of O(n^2) structs inside ONE row — a single mega-row
    * cannot be split by AQE and OOMs an executor at 100x scale (the
    * P-loop-NTPase-style hot group), while the join path shuffles the
    * same pairs across many tasks. Output columns: keys ++ (pa, pb)
    * with the array's element type.
    */
  def orderedPairs(sets: DataFrame, keys: Seq[String], setCol: String,
                   cap: Int = 256): DataFrame = {
    require(cap > 1, s"cap must exceed 1, got $cap")
    // NOTE: both branches below consume `sets`, and ReuseExchange does
    // not fire across the differing branch projections — when the set
    // build is an expensive full-fact aggregation, the CALLER should
    // hand in a localCheckpoint'd frame so it materializes once
    // (agg_similarity does; measured 2x the set-build cost at 30x
    // without it). Not checkpointed here unconditionally: for cheap
    // set builds the eager materialization costs more than the
    // recompute (agg_clan_graph regressed 0.6 -> 4.4 s at sf0.1).
    val mat = sets
    val sc = col(setCol)
    // pair expansion streams through the ordered_pairs generator
    // (graft.functions.OrderedPairsGen): the HOF formulation
    // (explode∘flatten∘transform²) materialized every inner pair array
    // plus the flattened n·(n-1)/2 copy per row before exploding, and
    // the pair census was GC-bound at 30x — the generator allocates
    // one row per pair and nothing else (A/B in SCALE.md r9)
    val small = mat.filter(size(sc) <= cap)
      .select(keys.map(col) :+ call_function("ordered_pairs", sc): _*)
    val big = mat.filter(size(sc) > cap)
    val l = big.select(keys.map(col) :+ posexplode(sc).as(Seq("__ia", "pa")): _*)
    val r = big.select(keys.map(col) :+ posexplode(sc).as(Seq("__ib", "pb")): _*)
    val bigPairs = l.join(r, keys).filter(col("__ia") < col("__ib"))
      .select(keys.map(col) :+ col("pa") :+ col("pb"): _*)
    small.unionByName(bigPairs)
  }
}
