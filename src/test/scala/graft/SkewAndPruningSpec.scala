package graft

import graft.ops.RelOps
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Scale-posture mechanics, proved on small data: the static salted
  * join produces row-identical results to the plain join while
  * spreading a hot key over `salt` reducers, and Hive-style partition
  * layout prunes directories at planning time (the layout every 100 TB
  * fact table relies on).
  */
class SkewAndPruningSpec extends SparkSpec {

  test("saltedEquiJoin is row-identical to the plain join on skewed data") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = spark.range(0, 20000).select(
      when(col("id") % 10 === 0, col("id") % 50).otherwise(lit(7L)).as("k"),
      col("id").as("payload"))
    val dim = spark.range(0, 50).select(
      col("id").as("k"), concat(lit("dim-"), col("id")).as("dname"))
    val plain = fact.join(dim, Seq("k"))
    val salted = RelOps.saltedEquiJoin(fact, dim, "k", salt = 8)
    assert(salted.count() === plain.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
    // the hot key's rows really spread: with 8 salts the hot key
    // occupies up to 8 distinct (k, salt) join groups
    val spread = fact.withColumn("__salt",
        pmod(xxhash64(col("k"), col("payload")), lit(8)))
      .filter(col("k") === 7).select(countDistinct(col("__salt"))).head.getLong(0)
    assert(spread > 1, s"hot key stayed on $spread salt(s)")
    // and the salted plan is fully DETERMINISTIC: a nondeterministic
    // salt (e.g. monotonically_increasing_id) marks the map stage
    // indeterminate, turning every cluster fetch failure into a whole-
    // stage + downstream rollback instead of a one-task retry
    def allDeterministic(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p.expressions.forall(_.collect { case e if !e.deterministic => e }.isEmpty) &&
        p.children.forall(allDeterministic)
    assert(allDeterministic(salted.queryExecution.optimizedPlan),
      "salted join plan carries a nondeterministic expression")
  }

  test("saltedEquiJoin tolerates unhashable (map) fact columns") {
    // xxhash64 over a MapType throws at analysis — the salt must skip
    // map-bearing columns (incl. nested ones) and still spread on the
    // hashable rest, staying row-identical to the plain join
    val fact = spark.range(0, 2000).select(
      when(col("id") % 10 === 0, col("id") % 20).otherwise(lit(3L)).as("k"),
      col("id").as("payload"),
      map(lit("a"), col("id")).as("attrs"),
      array(struct(map(lit("b"), col("id")).as("m")).as("s")).as("nested"))
    val dim = spark.range(0, 20).select(
      col("id").as("k"), concat(lit("d-"), col("id")).as("dname"))
    val plain = fact.join(dim, Seq("k"))
    val salted = RelOps.saltedEquiJoin(fact, dim, "k", salt = 8)
    assert(salted.count() === plain.count())
    val spread = fact.withColumn("__salt",
        pmod(xxhash64(col("k"), col("payload")), lit(8)))
      .filter(col("k") === 3).select(countDistinct(col("__salt")))
      .head.getLong(0)
    assert(spread > 1, "hashable columns must still spread the hot key")
  }

  test("orderedPairs: big path returns identical pairs to the in-array path") {
    // sets straddling the cap on both sides: 0,1,2 (degenerate), 5 and
    // 16 (<= cap, in-array), 17 and 40 (> cap, posexplode self-join)
    val sizes = Seq(0, 1, 2, 5, 16, 17, 40)
    val sets = spark.range(sizes.size.toLong).select(
      col("id").as("sid"),
      transform(slice(sequence(lit(1), lit(sizes.max)), lit(1),
        element_at(lit(sizes.toArray), (col("id") + 1).cast("int"))),
        i => i * (col("id") + 1)).as("vals"))
    val capped = RelOps.orderedPairs(sets, Seq("sid"), "vals", cap = 16)
    val allSmall = RelOps.orderedPairs(sets, Seq("sid"), "vals", cap = 1000)
    assert(capped.count() === sizes.map(n => n.toLong * (n - 1) / 2).sum)
    assert(capped.exceptAll(allSmall).isEmpty && allSmall.exceptAll(capped).isEmpty)
  }

  test("orderedPairs: a 10^4-member mega-group takes the join path, not one row") {
    // the P-loop-NTPase shape: one group whose in-array expansion would
    // be ~5*10^7 structs inside a single unsplittable row
    val n = 10000L
    val mega = spark.range(1).select(lit("hot").as("sid"),
      sequence(lit(1L), lit(n)).as("vals"))
    val pairs = RelOps.orderedPairs(mega, Seq("sid"), "vals", cap = 256)
    // the plan really is the self-join (no flatten/slice expansion)
    val planStr = pairs.queryExecution.optimizedPlan.toString()
    assert(planStr.contains("Join"), planStr)
    assert(pairs.count() === n * (n - 1) / 2)
    // ordering contract holds on the join path too
    assert(pairs.filter(col("pa") >= col("pb")).isEmpty)
  }

  test("AQE skew-join splits a hot shuffle partition at runtime, rows identical") {
    // the runtime half of the skew story (the static half is
    // saltedEquiJoin above): the r14 zipf rehearsal showed every
    // census join flat because absolute partition sizes stay under
    // AQE's default 256 MB trigger — this exercises the machinery
    // itself with the thresholds scaled down, so the path a 100 TB
    // hot key takes is proven, not presumed
    val sess = spark.newSession()
    sess.conf.set("spark.sql.adaptive.enabled", "true")
    sess.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    sess.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    sess.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    sess.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    sess.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // force a sort-merge join: broadcasting the dim would dodge the
    // hot key entirely (that immunity is the zipf bench's finding;
    // here the SMJ path itself is under test)
    sess.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def frames(s: org.apache.spark.sql.SparkSession) = {
      val fact = s.range(0, 60000).select(
        when(col("id") % 20 === 0, col("id") % 40).otherwise(lit(7L)).as("k"),
        concat(lit("payload-"), col("id"),
          lit("-loremipsumdolorsitamet-padding-")).as("payload"))
      val dim = s.range(0, 40).select(
        col("id").as("k"), concat(lit("dim-"), col("id")).as("dname"))
      (fact, dim)
    }
    val (fact, dim) = frames(sess)
    val joined = fact.join(dim, Seq("k"))
    // execute through the frame's OWN QueryExecution: count() plans a
    // separate one, leaving this executedPlan adaptive-but-unrun
    // (isFinalPlan=false) with no skew decision to inspect
    val got = joined.collect().length.toLong
    val plan = joined.queryExecution.executedPlan.toString()
    assert(plan.contains("skew=true"),
      s"AQE skew-join split did not fire:\n$plan")
    // split result equals the plain recompute (and the hot key's rows
    // are all there)
    assert(got === 60000L)
    // genuinely non-adaptive recompute: frames rebuilt ON sessOff —
    // fact/dim above are bound to the AQE session, so reusing them
    // here would re-run the adaptive plan, not compare against it
    val sessOff = spark.newSession()
    sessOff.conf.set("spark.sql.adaptive.enabled", "false")
    val (factOff, dimOff) = frames(sessOff)
    assert(got === factOff.join(dimOff, Seq("k")).count())
  }

  test("hive-layout partition filters prune directories at plan time") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.orders(spark, sf)
      .withColumn("prio", regexp_replace(col("o_orderpriority"), "[^0-9]", ""))
      .write.mode("overwrite").partitionBy("prio").parquet(dir)
    val all = spark.read.parquet(dir)
    val one = all.filter(col("prio") === "1")
    val planned = one.queryExecution.executedPlan.toString()
    assert(planned.contains("PartitionFilters"), planned)
    // the scan's selected partition count proves directory pruning
    val scan = one.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.isDefined)
    assert(scan.get.selectedPartitions.partitionCount === 1,
      s"expected 1 partition dir, got ${scan.get.selectedPartitions.partitionCount}")
    // and the result matches the unpartitioned predicate
    val expected = Tables.orders(spark, sf)
      .filter(regexp_replace(col("o_orderpriority"), "[^0-9]", "") === "1").count()
    assert(one.count() === expected)
  }
}
