package graft

import graft.harness.MatchExportQueries
import org.apache.spark.sql.functions._

/** Property checks for the three oracle/matches.py export surfaces
  * (residues / isoforms / TOAD) beyond the value-level oracle gate:
  * the ORDER and labeling rules the reference applies inside each
  * per-protein group, which a hash compare can confirm but not
  * explain when it breaks.
  */
class MatchExportSpec extends SparkSpec {

  private def q(name: String) =
    MatchExportQueries.queries(name)(spark, sf).cache()

  test("residues: null descriptions dropped, locations sorted, nullable names") {
    val df = q("residues_sites")
    assert(df.filter(col("descr").isNull).count() === 0)
    // per-description locations ascend by (start, end): re-sorting the
    // rendered list must be a no-op (matches.py:470-476)
    val locs = split(col("locations"), ";")
    val starts = transform(locs,
      l => split(regexp_extract(l, "@(\\d+)-(\\d+)$", 1), "x")(0).cast("long"))
    assert(df.filter(
      exists(zip_with(starts, slice(starts, 2, 10000), (a, b) => b < a),
        x => x)).count() === 0)
    // METHOD.NAME nullability must survive to the output (sigkey%3==0)
    assert(df.filter(col("sig_name").isNull).count() > 0)
    assert(df.filter(col("sig_name").isNotNull).count() > 0)
    df.unpersist()
  }

  test("isoforms: inner uniparc join, no-match isoforms kept, seq fallback") {
    val df = q("isoforms_matches")
    val maxPart = Tables.part(spark, sf).agg(max("p_partkey")).head.getLong(0)
    // VARSPLIC x UNIPARC is an INNER join on CRC64 (matches.py:596-600)
    assert(df.filter(col("crc64") > maxPart).count() === 0)
    // isoforms that drew no matches still export (matches.py:638-641)
    assert(df.filter(col("n_matches") === 0).count() > 0)
    // SEQ_SHORT null -> SEQ_LONG fallback rendered with the L prefix
    assert(df.filter(col("crc64") % 5 === 0 &&
      !col("seq_prefix").startsWith("L")).count() === 0)
    // the composite accession keys the export uniquely
    assert(df.count() === df.select("variant_acc").distinct().count())
    df.unpersist()
  }

  test("toad: dc-status by fragment position within the sorted group") {
    val df = q("toad_matches")
    val frags = split(col("fragments"), ";")
    val single = df.filter(size(frags) === 1)
    assert(single.count() > 0)
    assert(single.filter(!col("fragments").endsWith(":CONTINUOUS"))
      .count() === 0)
    val multi = df.filter(size(frags) > 1).cache()
    assert(multi.count() > 0)
    // first C_TERMINAL_DISC, last N_TERMINAL_DISC, middles NC
    // (matches.py:715-723)
    assert(multi.filter(
      !element_at(frags, 1).endsWith(":C_TERMINAL_DISC") ||
      !element_at(frags, -1).endsWith(":N_TERMINAL_DISC")).count() === 0)
    assert(multi.filter(size(frags) > 2 && exists(
      slice(frags, 2, 1000000), f =>
        !f.endsWith(":NC_TERMINAL_DISC") &&
        !f.endsWith(":N_TERMINAL_DISC"))).count() === 0)
    // fragments ascend by pos_from within every group
    val starts = transform(frags,
      f => regexp_extract(f, "^(\\d+)-", 1).cast("long"))
    assert(multi.filter(
      exists(zip_with(starts, slice(starts, 2, 1000000), (a, b) => b < a),
        x => x)).count() === 0)
    multi.unpersist()
    df.unpersist()
  }
}
