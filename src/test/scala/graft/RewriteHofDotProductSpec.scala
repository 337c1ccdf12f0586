package graft

import org.apache.spark.sql.functions._

/** The optimizer rule must turn the portable HOF dot-product pattern
  * into the native ArrayDot expression — bit-identically.
  */
class RewriteHofDotProductSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("HOF aggregate(zip_with(*), 0.0, +) plans as array_dot") {
    import spark.implicits._
    // parquet-backed input so ConvertToLocalRelation can't pre-evaluate
    val df = Tables.embeddings(spark, sf)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
      .select(hofDot(col("v"), col("v")).as("dot"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("array_dot"),
      s"expected ArrayDot in optimized plan:\n$optimized")
    // and on a literal frame the folded result is still correct
    val folded = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(hofDot(col("a"), col("b")).as("dot"))
    assert(folded.as[Double].head() === 32.0)
  }

  test("rewrite matches HOF result on real embeddings") {
    val emb = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val a = emb.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("v").as("vb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
    val viaHof = pairs
      .select(col("ia"), col("ib"), hofDot(col("va"), col("vb")).as("d"))
    val viaNative = pairs
      .select(col("ia"), col("ib"),
        call_function("array_dot", col("va"), col("vb")).as("d"))
    assert(viaHof.exceptAll(viaNative).count() === 0)
    assert(viaNative.exceptAll(viaHof).count() === 0)
  }

  test("null elements and length mismatches yield NULL (HOF-identical)") {
    import spark.implicits._
    // null element
    val withNull = Seq((Seq(Option(1.0), None), Seq(Option(2.0), Option(3.0))))
      .toDF("a", "b")
      .select(call_function("array_dot", col("a"), col("b")).as("dot"))
    assert(withNull.collect()(0).isNullAt(0))
    // length mismatch (zip_with would pad with null -> null product)
    val mismatch = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(call_function("array_dot", col("a"), col("b")).as("dot"))
    assert(mismatch.collect()(0).isNullAt(0))
    // HOF agrees on both
    val hof = Seq((Seq(Option(1.0), None), Seq(Option(2.0), Option(3.0))))
      .toDF("a", "b").select(hofDot(col("a"), col("b")).as("dot"))
    assert(hof.collect()(0).isNullAt(0))
  }
}

/** The integer sibling (functions/ArrayDotInt): exact Long dots over
  * int8-quantized codes, bit-equal to the HOF fold it replaces in the
  * quantized-search family.
  */
class ArrayDotIntSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def hofIntDot(a: org.apache.spark.sql.Column,
                        b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")),
      lit(0L), (acc, x) => acc + x)

  test("native integer dot equals the HOF fold on quantized embeddings") {
    val q = Tables.embeddings(spark, sf).limit(80)
      .withColumn("ma", array_max(transform(col("embedding"),
        x => abs(x.cast("double")))))
      .withColumn("q", transform(col("embedding"),
        x => round(x.cast("double") * lit(127.0) / col("ma")).cast("int")))
      .select(col("vec_id"), col("q"))
    val a = q.select(col("vec_id").as("ia"), col("q").as("qa"))
    val b = q.select(col("vec_id").as("ib"), col("q").as("qb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
    val viaHof = pairs.select(col("ia"), col("ib"),
      hofIntDot(col("qa"), col("qb")).as("d"))
    val viaNative = pairs.select(col("ia"), col("ib"),
      call_function("array_dot_int", col("qa"), col("qb")).as("d"))
    assert(viaHof.exceptAll(viaNative).count() === 0)
    assert(viaNative.exceptAll(viaHof).count() === 0)
  }

  test("integer dot null semantics mirror the HOF") {
    import spark.implicits._
    val withNull = Seq((Seq(Option(1), None), Seq(Option(2), Option(3))))
      .toDF("a", "b")
      .select(call_function("array_dot_int", col("a"), col("b")).as("d"))
    assert(withNull.collect()(0).isNullAt(0))
    val mismatch = Seq((Seq(1, 2), Seq(1, 2, 3))).toDF("a", "b")
      .select(call_function("array_dot_int", col("a"), col("b")).as("d"))
    assert(mismatch.collect()(0).isNullAt(0))
    val exact = Seq((Seq(100, -127, 7), Seq(127, 127, 1))).toDF("a", "b")
      .select(call_function("array_dot_int", col("a"), col("b")).as("d"))
    assert(exact.as[Long].head() === (100L * 127 - 127L * 127 + 7L))
  }
}
