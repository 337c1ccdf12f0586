package graft

import org.apache.spark.sql.functions._

/** Edge semantics of the ordered_pairs generator
  * (graft.functions.OrderedPairsGen): i<j pairs streamed off the
  * array, explode-compatible null/empty handling, struct elements.
  */
class OrderedPairsGenSpec extends SparkSpec {

  test("ordered_pairs emits every i<j pair once, in order") {
    import spark.implicits._
    val out = Seq(Seq(1, 2, 3, 4)).toDF("a")
      .select(call_function("ordered_pairs", col("a")))
      .as[(Int, Int)].collect().toSeq
    assert(out === Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)))
  }

  test("null, empty, and singleton arrays yield no rows; null elements pair") {
    import spark.implicits._
    val df = Seq(
      (1, Some(Seq[Option[Int]](Some(7)))),          // singleton → 0 pairs
      (2, Some(Seq[Option[Int]]())),                 // empty → 0 pairs
      (3, None),                                     // null array → 0 pairs
      (4, Some(Seq[Option[Int]](Some(5), None)))     // null element pairs
    ).toDF("id", "a")
    val out = df.select(col("id"), call_function("ordered_pairs", col("a")))
      .collect().map(r => (r.getInt(0), r.get(1), r.get(2))).toSeq
    assert(out === Seq((4, 5, null)))
  }

  test("struct elements survive with their fields intact") {
    import spark.implicits._
    val out = Seq(Seq((1, "x"), (2, "y"), (3, "z"))).toDF("a")
      .select(call_function("ordered_pairs", col("a")))
      .select(col("pa._1"), col("pb._2"))
      .as[(Int, String)].collect().toSeq
    assert(out === Seq((1, "y"), (1, "z"), (2, "z")))
  }
}
