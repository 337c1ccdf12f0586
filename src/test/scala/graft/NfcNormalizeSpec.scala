package graft

import org.apache.spark.sql.functions._

/** Invariants of the native `nfc_normalize` expression that the hash
  * oracle can't state: JDK-ground-truth agreement on adversarial
  * combining sequences, identity on ASCII, null propagation, and the
  * whole-stage-codegen path actually used in queries. All non-ASCII
  * is spelled as \u escapes so the fixture cannot be corrupted by a
  * toolchain re-encoding pass.
  */
class NfcNormalizeSpec extends SparkSpec {

  private val cases = Seq(
    "plain ascii stays put",
    "Café",                 // e + combining acute -> precomposed
    "ÉLAN",                  // already NFC
    "Å",                    // A + combining ring -> Aring
    "Á̧",              // multi-combiner (acute + cedilla)
    "ṩ",                     // s with dot below + dot above (NFC)
    "ṩ",              // decomposed form of the same
    "mixed Café and é and ascii",
    "",                           // empty
    "😀 emoji pass-through" // surrogate pair (already NFC)
  )

  test("agrees with java.text.Normalizer NFC on adversarial inputs") {
    import spark.implicits._
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val got = df.select(col("id"),
        call_function("nfc_normalize", col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      val want = java.text.Normalizer.normalize(
        t, java.text.Normalizer.Form.NFC)
      assert(got(i.toLong) === want, s"case $i: ${t.toList}")
    }
    // the decomposed cases must actually change — the differential is
    // vacuous if the fixture accidentally ships precomposed
    assert(got(1L) === "Café")
    assert(got(3L) === "Å")
    assert(got(6L) === "ṩ")
  }

  test("recomposes only when needed and propagates null") {
    import spark.implicits._
    val df = Seq((1L, Some("Café")), (2L, Some("ascii")),
      (3L, Option.empty[String])).toDF("id", "t")
    val out = df.select(col("id"),
        call_function("nfc_normalize", col("t")).as("n"),
        (call_function("nfc_normalize", col("t")) =!= col("t")).as("chg"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), Option(r.get(2)))).toMap
    assert(out(1L) === ((Some("Café"), Some(true))))
    assert(out(2L) === ((Some("ascii"), Some(false))))
    assert(out(3L) === ((None, None)))
  }

  test("kernel returns the input object unchanged on normalized text (no allocation)") {
    import org.apache.spark.unsafe.types.UTF8String
    val s = UTF8String.fromString("already nfc ascii")
    assert(graft.functions.NfcNormalize.normalize(s) eq s)
    val d = UTF8String.fromString("Café")
    assert(graft.functions.NfcNormalize.normalize(d).toString === "Café")
  }
}
