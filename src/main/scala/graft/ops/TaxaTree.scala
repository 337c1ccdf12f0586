package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Loops.LoopOps

/** Per-entry taxonomy distribution trees over the MAIN ranks
  * (interpro7dw/interpro/xrefs/entries.py:16-25,349-466).
  *
  * The reference projects every taxon's lineage onto 8 major ranks
  * (missing clades stay None), then per entry walks each hit taxon's
  * rank slots top-down building a nested tree: a filled slot keeps the
  * taxon id as the node id, an empty slot synthesizes a placeholder id
  * `<last real id>-<slot index>` (entries.py:415-421) with a null
  * name; every node accumulates the hit's protein count, plus one
  * species hit when the lineage contains a species-ranked node; the
  * finished forest is wrapped in a root node (id "1").
  *
  * Spark formulation: lineage closure (iterative, depth-agnostic) →
  * rank-slot pivot (one conditional agg per rank) → an 8-column uid
  * fold → per-level grouped counts → bottom-up JSON assembly, one
  * join+agg per rank, children sorted by node id for determinism.
  * Everything is keyed aggregation — no driver-side tree walk.
  */
object TaxaTree {

  val MainRanks: Seq[String] = Seq(
    "domain", "kingdom", "phylum", "class", "order", "family", "genus",
    "species")

  /** JSON string literal with real escaping: the reference serializes
    * node dicts through a JSON encoder, so a taxon name containing a
    * double quote or backslash (legal in strain names) must escape —
    * naive quoting would emit an invalid document.
    */
  private def jsonStr(c: Column): Column =
    when(c.isNull, lit("null")).otherwise(concat(lit("\""),
      regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
      lit("\"")))

  private def nodeJson(uid: Column, rank: Column, name: Column,
                       proteins: Column, species: Column,
                       children: Column): Column =
    concat(lit("{\"id\":\""), uid, lit("\",\"rank\":"), jsonStr(rank),
      lit(",\"name\":"), jsonStr(name),
      lit(",\"proteins\":"), proteins.cast("string"),
      lit(",\"species\":"), species.cast("string"),
      lit(",\"children\":["), children, lit("]}"))

  /** hits: (entry, taxon_id, n) — protein counts per hit taxon.
    * taxa: (id, parent, rank, name) — parent NULL marks roots.
    * Returns (entry, tree) with tree = the nested JSON distribution.
    */
  def entryRankTrees(hits: DataFrame, taxa: DataFrame,
                     ranks: Seq[String] = MainRanks,
                     closure: Option[DataFrame] = None): DataFrame = {
    val n = ranks.length

    // (taxon id, one column per rank with the lineage node occupying
    // it, plus its name) — posexplode the closure once, pivot by rank.
    // When a lineage holds two nodes of the same rank, the reference's
    // slot loop overwrites in lineage order and keeps the LAST
    // (deepest) one (entries.py lineage[i] overwrite) — so the pivot
    // maxes a (position, node, name) struct: position dominates, and
    // node+name always come from the same lineage row.
    // callers that walk the same taxonomy from several queries pass a
    // shared (cached) closure; the iterative loop runs once per session
    val lin = closure.getOrElse(Graphs.lineageClosure(taxa, "id", "parent"))
      .select(col("id"), posexplode(col("lineage")).as(Seq("pos", "node")))
      .join(taxa.select(col("id").as("node"), col("rank"), col("name")),
        Seq("node"))
    val slotAggs = ranks.zipWithIndex.flatMap { case (r, i) =>
      val deepest = max(when(col("rank") === r,
        struct(col("pos"), col("node"), col("name"))))
      Seq(deepest.getField("node").as(s"slot_$i"),
        deepest.getField("name").as(s"name_$i"))
    }
    val slots = lin.groupBy(col("id")).agg(slotAggs.head, slotAggs.tail: _*)

    val hit = hits.join(slots, hits("taxon_id") === slots("id"))
      .withColumn("is_sp",
        col(s"slot_${ranks.indexOf("species")}").isNotNull)

    // uid fold: filled slot → taxon id; empty slot → last uid + "-i"
    // (entries.py:415-421; the index suffix keeps placeholder ids
    // unique when several consecutive ranks are missing)
    val withUids = (0 until n).foldLeft(hit.withColumn("uid_root", lit("1"))) {
      case (df, i) =>
        val prev = if (i == 0) col("uid_root") else col(s"uid_${i - 1}")
        df.withColumn(s"uid_$i",
          when(col(s"slot_$i").isNotNull, col(s"slot_$i"))
            .otherwise(concat(prev, lit(s"-$i"))))
    }
      // both the per-level counts below AND the root totals consume
      // this frame; checkpointing it runs the closure+pivot+join
      // upstream once instead of twice
      .loopCheckpoint()

    // Node identity is the FULL PATH of uids, not the uid alone: when
    // a descendant overrides a higher rank slot (real taxonomies have
    // out-of-order ranks), the same taxon id legitimately appears at
    // two different paths in one tree — the reference's nested dicts
    // key children per parent, and an id-keyed join would attach a
    // subtree to every same-id node (caught by the differential
    // fixture, case "order below genus").
    val withPaths = (0 until n).foldLeft(withUids) { case (df, i) =>
      val prev = if (i == 0) lit("1") else col(s"path_${i - 1}")
      df.withColumn(s"path_$i", concat(prev, lit("|"), col(s"uid_$i")))
    }

    // one row per (hit, rank level), then counts per (entry, path)
    val levelStructs = (0 until n).map { i =>
      val parent = if (i == 0) lit("1") else col(s"path_${i - 1}")
      struct(lit(i).as("lvl"), col(s"uid_$i").as("uid"),
        col(s"path_$i").as("pid"), parent.as("ppid"),
        lit(ranks(i)).as("rank"), col(s"name_$i").as("name"))
    }
    val levels = withPaths.select(col("entry"), col("n"), col("is_sp"),
      explode(array(levelStructs: _*)).as("l"))
    val grouped = levels.select(col("entry"), col("l.*"), col("n"), col("is_sp"))
      .groupBy(col("entry"), col("lvl"), col("uid"), col("pid"), col("ppid"),
        col("rank"), col("name"))
      .agg(sum(col("n")).as("p"),
        sum(when(col("is_sp"), 1L).otherwise(0L)).as("s"))
      // localCheckpoint, not persist: the 8 per-level filters below
      // all re-read this frame LAZILY (the assembly plan executes only
      // when the caller acts), so a session-cache entry could never be
      // unpersisted at a safe point and would leak one cached frame
      // per invocation. Checkpoint blocks are reclaimed by the context
      // cleaner once the returned plan is unreferenced.
      .loopCheckpoint()

    // bottom-up assembly in ONE shuffle: group the level rows by entry
    // and build each entry's nested JSON executor-side (the reference
    // holds exactly this per-entry dict in memory, entries.py:349-466;
    // per-group state is the entry's tree — rank-bounded depth,
    // hit-taxa-bounded width). The r16 form ran one join+agg PER RANK
    // (8 × 2 exchanges over (entry, path)-keyed frames — 16 Exchange /
    // 16 SortMergeJoin in the plan); every node row now crosses one
    // exchange once and the fold happens in memory per entry, which is
    // both the local win (plan: 16 joins → 1 HashAggregate) and the
    // 100 TB shape (8 fewer passes over the node set; parallelism =
    // entries, the same axis the join cascade bottomed out on).
    // Children sort by uid on UTF-8 BYTES — the exact order the
    // replaced array_sort(struct(uid, js)) used (UTF8String binary
    // compare), not Java's UTF-16 String order.
    val assembled = grouped
      .groupBy(col("entry"))
      .agg(assembleTree(
        collect_list(struct(col("uid"), col("pid"), col("ppid"),
          col("rank"), col("name"), col("p"), col("s")))).as("__ch"))

    val totals = withUids.groupBy(col("entry"))
      .agg(sum(col("n")).as("p"),
        sum(when(col("is_sp"), 1L).otherwise(0L)).as("s"))
    totals.join(assembled, Seq("entry"), "left_outer")
      .select(col("entry"),
        nodeJson(lit("1"), lit(null).cast("string"), lit("root"),
          col("p"), col("s"), coalesce(col("__ch"), lit(""))).as("tree"))
  }

  /** One entry's node rows → the root's children JSON (sorted, comma
    * joined). Field-for-field the same rendering as [[nodeJson]] /
    * [[jsonStr]]; recursion depth = rank count.
    */
  private case class TreeNode(uid: String, pid: String, ppid: String,
                              rank: String, name: String, p: Long, s: Long)

  private def utf8Less(a: String, b: String): Boolean = {
    // UTF8String.binaryCompare semantics: unsigned byte order over the
    // UTF-8 encoding (Java String.compareTo differs above U+FFFF and
    // for supplementary-plane mixes)
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val m = math.min(x.length, y.length)
    var i = 0
    while (i < m) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  private def escJson(s: String): String =
    if (s == null) "null"
    else "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private val assembleTree = udf((nodes: Seq[TreeNode]) => {
    val byParent = nodes.groupBy(_.ppid)
    def render(nd: TreeNode): String = {
      val ch = byParent.getOrElse(nd.pid, Seq.empty)
        .sortWith((u, v) => utf8Less(u.uid, v.uid))
        .map(render).mkString(",")
      s"""{"id":"${nd.uid}","rank":${escJson(nd.rank)},"name":${
        escJson(nd.name)},"proteins":${nd.p},"species":${nd.s},"children":[$ch]}"""
    }
    byParent.getOrElse("1", Seq.empty)
      .sortWith((u, v) => utf8Less(u.uid, v.uid))
      .map(render).mkString(",")
  })
}
