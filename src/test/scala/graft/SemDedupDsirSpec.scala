package graft

import graft.harness.{SampleQueries, StreamQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Invariants of the round-9 additions that the value-hash oracle
  * cannot state directly:
  *
  *  - `dedup_semantic` (SemDeDup, arXiv:2303.09540): a dropped vector's
  *    witness is a LOWER id in the SAME cell at sim ≥ τ, every kept
  *    vector has none, and the kept set is a function of the corpus —
  *    not of partitioning (keep-first-wins is deterministic).
  *  - `sample_dsir` (arXiv:2302.03169): the selected documents are the
  *    top-N by score with the doc_id tiebreak — no row outside the
  *    selection may beat a selected row.
  *  - `stream_dropdup_watermark`: per-type kept counts equal the batch
  *    distinct counts of the dedup key (the single-batch ground truth
  *    of dropDuplicatesWithinWatermark's keep-first semantics).
  */
class SemDedupDsirSpec extends SparkSpec {

  test("dedup_semantic: witnesses are lower-id same-cell neighbors; keeps have none") {
    val out = VectorQueries.queries("dedup_semantic")(spark, sf)
    val rows = out.collect()
    val cellOf = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dropped = rows.filter(!_.getBoolean(2))
    assert(rows.length > 0)
    // at τ=0.4 over random 64-d vectors some but not all rows collapse
    assert(dropped.length > 0 && dropped.length < rows.length)
    dropped.foreach { r =>
      val (id, wit) = (r.getLong(0), r.getLong(3))
      assert(wit < id, s"witness $wit !< dropped $id")
      assert(cellOf(wit) === r.getLong(1), s"witness $wit in another cell")
      assert(r.getDouble(4) >= 0.4, s"dropped $id below threshold")
    }
    // kept rows carry no witness
    rows.filter(_.getBoolean(2)).foreach(r => assert(r.isNullAt(3) && r.isNullAt(4)))
  }

  test("dedup_semantic witness pool: linear backstop, exact at or under pool size") {
    import spark.implicits._
    // one "cell" of near-identical vectors (the hot-point shape) plus
    // a far singleton: ids 0..19 at cos~1 pairwise, id 99 orthogonal
    val hot = (0L until 20L).map(i => (i, Array(1.0, i * 1e-6, 0.0)))
    val far = Seq((99L, Array(0.0, 0.0, 1.0)))
    val df = (hot ++ far).toDF("vec_id", "v")
      .withColumn("cell", when(col("vec_id") < 50, 0L).otherwise(1L))
      .withColumn("nv", graft.ops.VectorOps.norm(col("v")))
    def flagged(pool: Int) = {
      val wit = graft.ops.RelOps.topKPerGroupExact(
          df.select(col("cell"), col("vec_id"), col("v"), col("nv")),
          Seq(col("cell")), Seq(col("vec_id")), pool)
        .select(col("cell"), col("vec_id").as("wit"),
          col("v").as("wv"), col("nv").as("wn"))
      val dup = df.select(col("cell"), col("vec_id").as("dup"),
        col("v").as("dv"), col("nv").as("dn"))
      wit.join(dup, Seq("cell")).filter(col("wit") < col("dup"))
        .withColumn("sim", round(graft.ops.VectorOps.dot(col("wv"), col("dv"))
          / (col("wn") * col("dn")), 6))
        .filter(col("sim") >= 0.4)
        .groupBy(col("dup")).agg(min(col("wit")).as("witness"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // pool >= cell: identical to the uncapped form — every hot member
    // except the min id drops with witness 0; the far vector keeps
    val full = flagged(64)
    assert(full === (1L until 20L).map(_ -> 0L).toMap)
    // a small pool still flags every hot member (the pool's lowest ids
    // match at sim~1) with the EXACT min witness — the hot-point cell
    // is precisely the case the pool keeps linear without recall loss
    assert(flagged(2) === full)
    // candidate volume is pool-bounded: the wit side carries at most
    // pool rows per cell
    val witRows = graft.ops.RelOps.topKPerGroupExact(
        df.select(col("cell"), col("vec_id"), col("v"), col("nv")),
        Seq(col("cell")), Seq(col("vec_id")), 2).count()
    assert(witRows === 3) // 2 from the hot cell + 1 singleton
  }

  test("sample_dsir: selection is the global top-N by (score desc, doc_id)") {
    val sel = SampleQueries.queries("sample_dsir")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(sel.length === 100)
    val worst = sel.minBy { case (id, sc) => (sc, -id) }
    // recompute every doc's score via the same pipeline minus the limit
    // (drop the limit by ranking all docs: any non-selected doc must
    // not outrank the worst selected one)
    val ids = sel.map(_._1).toSet
    val full = {
      import org.apache.spark.sql.types.DecimalType
      val tok = Tables.documents(spark, sf)
        .select(col("doc_id"), col("lang"),
          explode(graft.ops.TextOps.tokens(col("text"))).as("t"))
      val cnt = tok.groupBy(col("t")).agg(count(lit(1)).as("c_s"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c_t"))
      val tot = cnt.agg(sum(col("c_s")).as("tot_s"),
        sum(col("c_t")).as("tot_t"), count(lit(1)).as("v"))
      val w = cnt.crossJoin(broadcast(tot)).select(col("t"),
        round(log((col("c_t") + lit(1.0)) / (col("tot_t") + col("v"))) -
              log((col("c_s") + lit(1.0)) / (col("tot_s") + col("v"))), 6)
          .cast(DecimalType(12, 6)).as("w"))
      tok.join(broadcast(w), Seq("t")).groupBy(col("doc_id"))
        .agg(sum(col("w")).cast("double").as("score"))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
    }
    full.filterNot { case (id, _) => ids(id) }.foreach { case (id, sc) =>
      val better = sc > worst._2 || (sc == worst._2 && id < worst._1)
      assert(!better, s"non-selected doc $id (score $sc) outranks the cut")
    }
  }

  test("text_quality_classifier: GD lowers training log-loss below the zero model") {
    val out = graft.harness.TextQueries.queries("text_quality_classifier")(spark, sf)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(out.nonEmpty)
    out.foreach { case (_, p) => assert(p > 0.0 && p < 1.0) }
    // the zero-weight model scores p=0.5 everywhere (loss ln 2); five
    // full-batch steps must have moved the weights downhill
    val loss = out.map { case (y, p) =>
      -(y * math.log(p) + (1 - y) * math.log(1 - p))
    }.sum / out.length
    assert(loss < math.log(2.0), s"log-loss $loss not below ln2")
  }

  test("stream_dropdup_watermark: kept counts equal batch distinct keys per type") {
    val got = StreamQueries.queries("stream_dropdup_watermark")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(pmod(col("event_id"), lit(1000L))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}
