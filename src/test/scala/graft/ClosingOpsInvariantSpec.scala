package graft

import graft.harness.{AggQueries, DedupQueries, GraphQueries,
  SampleQueries, VectorQueries, WindowQueries}

/** Semantic invariants of the r11 closing-batch operators that the
  * value-hash oracle can't state (it pins outputs, not the properties
  * the outputs must satisfy by construction).
  */
class ClosingOpsInvariantSpec extends SparkSpec {

  test("sample_curriculum epochs nest: epoch e's docs all reappear in e+1") {
    val rows = SampleQueries.queries("sample_curriculum")(spark, sf)
      .select("epoch", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val byEpoch = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byEpoch.keySet == Set(1, 2, 3))
    assert(byEpoch(1).subsetOf(byEpoch(2)), "epoch1 ⊄ epoch2")
    assert(byEpoch(2).subsetOf(byEpoch(3)), "epoch2 ⊄ epoch3")
    // epoch 3 trains on every decile = the whole corpus
    val n = Tables.documents(spark, sf).count()
    assert(byEpoch(3).size.toLong == n, s"epoch3 ${byEpoch(3).size} != corpus $n")
  }

  test("sample_pack_pairs bins hold exactly 2 docs (1 odd middle) and cover once") {
    val rows = SampleQueries.queries("sample_pack_pairs")(spark, sf)
      .select("bin", "n_docs", "bin_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == n, "bins must cover the corpus exactly once")
    val singles = rows.count(_._2 == 1L)
    assert(rows.forall(r => r._2 == 1L || r._2 == 2L))
    assert(singles == (if (n % 2 == 1) 1 else 0), s"$singles odd bins for n=$n")
    // pairing equalizes: every 2-doc bin total is >= the global max
    // single-doc length (the longest doc's bin absorbs the shortest)
    rows.foreach { case (b, _, tok) => assert(tok > 0, s"bin $b empty") }
  }

  test("sample_diverse keeps at most K per cell and is rerun-stable") {
    val q = VectorQueries.queries("sample_diverse")
    val a = q(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = q(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sorted.sameElements(b.sorted), "reruns must pick identical sets")
    a.groupBy(_._2).foreach { case (cell, picks) =>
      assert(picks.length <= 16, s"cell $cell kept ${picks.length} > 16")
    }
  }

  test("ann_hard_negatives never returns a near-duplicate or self") {
    val rows = VectorQueries.queries("ann_hard_negatives")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getInt(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (qid, vid, simU, rk) =>
      assert(qid != vid, "self returned as negative")
      assert(simU < 950000L, s"sim $simU breaches the near-dup ceiling")
      assert(rk >= 1 && rk <= 3)
    }
  }

  test("graph_jaccard scores are valid and bounded by the degree algebra") {
    val rows = GraphQueries.queries("graph_jaccard")(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (inter, da, db, ppm) =>
      assert(inter >= 1 && inter <= math.min(da, db))
      assert(ppm >= 0 && ppm <= 1000000L)
      assert(ppm == inter * 1000000L / (da + db - inter))
    }
  }

  test("window_ema denominators follow 2^8 - 2^(8-n) and dev is exact") {
    val rows = WindowQueries.queries("window_ema")(spark, sf)
      .select("vu", "n", "num", "den", "dev").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (vu, n, num, den, dev) =>
      assert(n >= 1 && n <= 8)
      assert(den == 256L - (1L << (8 - n).toInt), s"den $den for n=$n")
      assert(dev == vu * den - num, "deviation must be the exact identity")
    }
  }

  test("agg_source_balance Gini sits in [0,1) ppm and entropy <= ln(ns)") {
    val r = AggQueries.queries("agg_source_balance")(spark, sf).collect()(0)
    val (ns, gini, ent) = (r.getLong(0), r.getLong(2), r.getDouble(3))
    assert(gini >= 0 && gini < 1000000L)
    assert(ent >= 0.0 && ent <= math.log(ns.toDouble) + 1e-4,
      s"entropy $ent above uniform bound ln($ns)")
  }

  test("dedup_lsh_eval counts obey tp <= min(truth, cand), rates <= 1e6") {
    val r = DedupQueries.queries("dedup_lsh_eval")(spark, sf).collect()(0)
    val (t, c, tp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (rec, prec) = (r.getLong(3), r.getLong(4))
    assert(tp <= math.min(t, c))
    assert(rec <= 1000000L && prec <= 1000000L)
    assert(t == 0 || rec == tp * 1000000L / t)
    assert(c == 0 || prec == tp * 1000000L / c)
  }
}
