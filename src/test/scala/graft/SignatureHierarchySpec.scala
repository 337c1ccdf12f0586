package graft

import graft.ops.SignatureHierarchy
import org.apache.spark.sql.functions._

/** Hierarchy rewrite semantics vs the reference's post-load walk
  * (interpro7dw/interpro/oracle/entries.py:785-813): subfamilies and
  * FunFams point at their container and go non-public; a missing
  * container is a hard error, mirroring the reference's KeyError.
  */
class SignatureHierarchySpec extends SparkSpec {

  import spark.implicits._

  private def frame(rows: (String, Option[String])*) =
    rows.toDF("acc", "integrated_in")
      .select(col("acc"), lit(null).cast("string").as("parent"),
        col("integrated_in"), lit(true).as("public"))

  test("subfamily and funfam rewrite to container, public=false") {
    val out = SignatureHierarchy.validate(frame(
      ("PTHR10000", None), ("PTHR10000:SF5", None),
      ("G3DSA:1.10.8.10", None), ("G3DSA:1.10.8.10:FF:2", None),
      ("PF00001", Some("IPR000001"))))
      .select("acc", "parent", "integrated_in", "public")
      .as[(String, Option[String], Option[String], Boolean)]
      .collect().map { case (a, p, i, pub) => a -> ((p, i, pub)) }.toMap
    assert(out("PTHR10000:SF5") ===
      ((Some("PTHR10000"), Some("PTHR10000"), false)))
    assert(out("G3DSA:1.10.8.10:FF:2") ===
      ((Some("G3DSA:1.10.8.10"), Some("G3DSA:1.10.8.10"), false)))
    assert(out("PTHR10000") === ((None, None, true)))
    assert(out("PF00001") === ((None, Some("IPR000001"), true)))
  }

  test("missing container is a hard error") {
    val ex = intercept[NoSuchElementException] {
      SignatureHierarchy.validate(frame(("PTHR99999:SF1", None)))
    }
    assert(ex.getMessage.contains("PTHR99999"))
  }

  test("near-miss accessions are not rewritten") {
    val out = SignatureHierarchy.validate(frame(
      ("PTHR1:SF", None), ("XPTHR1:SF2", None), ("G3DSA:1.2.3:FF:1", None)))
      .filter(col("parent").isNotNull).count()
    assert(out === 0)
  }
}
