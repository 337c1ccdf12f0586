package graft

import org.apache.spark.sql.functions._

/** Brute-force differentials for the graph family — the iterative
  * queries (PageRank power iteration, BFS unrolling, synchronous label
  * propagation, k-core peeling) plus the backbone censuses (triangles,
  * Jaccard), previously gated only by the same-author DuckDB oracle
  * and two invariant checks. The truth here is a naive Scala
  * reimplementation of each trajectory over plain collections — no
  * Spark expressions, no shared query code — run against a seeded
  * micro lineitem written as a real sf-dir, so the ACTUAL harness
  * queries execute end-to-end.
  *
  * The micro graph pins the semantics a shared misunderstanding would
  * miss: a chain placing one node at distance exactly BfsHops+1 (must
  * be ABSENT under the fixed 4-hop unrolling), a component reachable
  * only from seed 2 and a seed id with no rows at all (a seed is a
  * node filter, not a row generator), label-propagation round 1 where
  * EVERY neighbour count ties (the smallest-label rule is
  * load-bearing, not a corner), k-core's both-endpoint peel with k
  * derived from the census, and Jaccard's integer-ppm floor division.
  */
class GraphDifferentialSpec extends SparkSpec {

  private val Buckets = 1000
  private val PrIters = 5
  private val PrDamp = 0.85
  private val BfsSeeds = 4L
  private val BfsHops = 4
  private val LpIters = 3
  private val KcoreRounds = 4

  private case class Li(order: Long, part: Long, supp: Long)

  private lazy val rows: Seq[Li] = {
    val rnd = new scala.util.Random(77416L)
    var oid = 0L
    // organic core: suppliers 20..39 over buckets 100..159, orders of
    // 2..6 items — dense enough for triangles and Jaccard pairs
    val organic = (1 to 150).flatMap { _ =>
      oid += 1
      val supp = 20L + rnd.nextInt(20)
      (0 until 2 + rnd.nextInt(5)).map { _ =>
        Li(oid, 100L + rnd.nextInt(60), if (rnd.nextBoolean()) supp
           else 20L + rnd.nextInt(20))
      }
    }
    // seed 1 attaches to the organic core (frontier grows hop by hop)
    val attach = Seq(Li(9001, 100, 1), Li(9001, 101, 1))
    // the chain: 0 -b1- 10 -b2- 11 -b3: node b3 sits at depth 5 and
    // must be ABSENT from the 4-hop BFS result
    val chain = Seq(Li(9002, 1, 0), Li(9003, 1, 10), Li(9003, 2, 10),
      Li(9004, 2, 11), Li(9004, 3, 11))
    // seed 2's private island (reachable from no other seed)
    val island = Seq(Li(9005, 50, 2), Li(9006, 50, 12), Li(9006, 51, 12))
    // seed id 3 has NO rows: it must not appear as a BFS node at all
    organic ++ attach ++ chain ++ island
  }

  private lazy val microDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-graph-diff").toString
    rows.map(r => (r.order, r.part, r.supp))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def run(name: String) =
    harness.GraphQueries.queries(name)(spark, microDir)

  // ---- the naive graph -------------------------------------------------

  /** Symmetric distinct edge set of the supplier <-> part-bucket
    * bipartite graph, exactly as the queries derive it.
    */
  private lazy val edges: Set[(Long, Long)] = {
    val e0 = rows.map(r => (r.supp, 1000000L + r.part % Buckets)).toSet
    e0 ++ e0.map { case (s, d) => (d, s) }
  }
  private lazy val adj: Map[Long, Set[Long]] =
    edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  private lazy val nodes: Seq[Long] = adj.keys.toSeq.sorted
  private lazy val deg: Map[Long, Long] =
    adj.view.mapValues(_.size.toLong).toMap

  private def round9(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  private def num(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue()

  // ---- differentials ----------------------------------------------------

  test("graph_pagerank matches a naive power iteration, round for round") {
    val n = nodes.size.toLong
    var rank: Map[Long, Double] = nodes.map(_ -> round9(1.0 / n)).toMap
    for (_ <- 1 to PrIters) {
      // per-edge contribution in integer picos, exactly the query's ops
      val inflow = edges.toSeq.map { case (src, dst) =>
        dst -> math.floor(rank(src) / deg(src) * 1e12 + 0.5).toLong
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum.toDouble / 1e12).toMap
      rank = nodes.map { v =>
        v -> round9((1 - PrDamp) / n + PrDamp * inflow.getOrElse(v, 0.0))
      }.toMap
    }
    val got = run("graph_pagerank").collect()
      .map(r => (num(r, 0), r.getDouble(1))).toMap
    assert(got === rank)
  }

  test("graph_bfs_depth matches a naive 4-hop frontier expansion") {
    var depth: Map[Long, Int] =
      nodes.filter(_ < BfsSeeds).map(_ -> 0).toMap
    for (i <- 1 to BfsHops) {
      val frontier = depth.collect { case (v, d) if d == i - 1 => v }
      val next = frontier.flatMap(adj(_)).toSet -- depth.keySet
      depth = depth ++ next.map(_ -> i)
    }
    val got = run("graph_bfs_depth").collect()
      .map(r => num(r, 0) -> num(r, 1).toInt).toMap
    assert(got === depth)
    // the pinned edges really pin: the chain's last bucket is at
    // distance 5 (absent), seed 3 has no rows (absent), seed 2's
    // island is reached only through seed 2
    assert(!got.contains(1000003L) && !got.contains(3L))
    assert(got(1000050L) === 1 && got(12L) === 2 && got(1000051L) === 3)
  }

  test("graph_labelprop matches a naive synchronous propagation with the smallest-label tie rule") {
    var label: Map[Long, Long] = nodes.map(v => v -> v).toMap
    for (_ <- 1 to LpIters) {
      label = nodes.map { v =>
        val counts = adj(v).toSeq.map(label).groupBy(identity).view
          .mapValues(_.size).toSeq
        // most frequent neighbour label, tie -> smallest label
        v -> counts.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val got = run("graph_labelprop").collect()
      .map(r => num(r, 0) -> num(r, 1)).toMap
    assert(got === label)
  }

  test("graph_kcore matches a naive both-endpoint peel with the census k") {
    val k = math.floor(edges.size.toDouble / nodes.size / 2).toLong + 1L
    def survivors(es: Set[(Long, Long)]): Set[Long] =
      es.groupBy(_._1).collect {
        case (v, out) if out.size >= k => v }.toSet
    def peel(alive: Set[Long]): Set[(Long, Long)] =
      edges.filter { case (s, d) => alive(s) && alive(d) }
    var alive = survivors(edges)
    for (_ <- 2 to KcoreRounds) alive = survivors(peel(alive))
    val naive = peel(alive).groupBy(_._1).view
      .mapValues(_.size.toLong).toMap
    val got = run("graph_kcore").collect()
      .map(r => num(r, 0) -> num(r, 1)).toMap
    assert(got === naive)
  }

  test("graph_triangles matches a naive ordered enumeration over the backbone") {
    val pairCounts = rows.groupBy(_.order).toSeq.flatMap { case (_, ls) =>
      val bs = ls.map(_.part % Buckets).distinct.sorted
      for (i <- bs.indices; j <- i + 1 until bs.size) yield (bs(i), bs(j))
    }.groupBy(identity).view.mapValues(_.size).toSeq
    // top-TriEdges backbone (5000 does not bind on the micro graph —
    // the census and enumeration semantics are what this pins)
    val backbone = pairCounts.sortBy { case ((a, b), n) => (-n, a, b) }
      .take(5000).map(_._1).toSet
    val bbByA = backbone.groupBy(_._1)
    val tris = for {
      (a, b) <- backbone.toSeq
      (_, c) <- bbByA.getOrElse(b, Set.empty)
      if backbone((a, c))
    } yield (a, b, c)
    val naive = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = run("graph_triangles").collect()
      .map(r => num(r, 0) -> num(r, 1)).toMap
    assert(got === naive)
    assert(naive.nonEmpty, "micro graph must actually contain triangles")
  }

  test("graph_jaccard matches a naive neighbour-set overlap in integer ppm") {
    val w = rows.groupBy(r => (r.supp, r.part % Buckets)).view
      .mapValues(_.size).toSeq
    val bb = w.sortBy { case ((sp, bk), n) => (-n, sp, bk) }
      .take(5000).map(_._1)
    val nbr = bb.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val naive = (for {
      a <- nbr.keys.toSeq; b <- nbr.keys.toSeq if a < b
      inter = (nbr(a) & nbr(b)).size.toLong if inter > 0
    } yield {
      val (da, db) = (nbr(a).size.toLong, nbr(b).size.toLong)
      (a, b, inter, da, db, inter * 1000000L / (da + db - inter))
    }).toSet
    val got = run("graph_jaccard").collect()
      .map(r => (num(r, 0), num(r, 1), num(r, 2), num(r, 3), num(r, 4),
        num(r, 5))).toSet
    assert(got === naive)
  }
}
