package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PANTHER-subfamily / CATH-FunFam hierarchy rewrite + validation.
  *
  * The reference walks its signature dimension once after load
  * (interpro7dw/interpro/oracle/entries.py:785-813): an accession
  * shaped `PTHRnnnnn:SFnn` is a PANTHER subfamily whose parent and
  * integration target is the `PTHRnnnnn` family; `G3DSA:a.b.c.d:FF:n`
  * is a CATH FunFam under the `G3DSA:a.b.c.d` superfamily. Both are
  * rewritten to `parent = integrated_in = <container>` and
  * `public = false`, and a missing container is a hard error
  * (the reference raises KeyError).
  *
  * Spark-first: one regexp projection plus one left join against the
  * accession set — no driver-side dictionary walk — with the orphan
  * check as a single count over the joined frame.
  */
object SignatureHierarchy {

  private val PantherFam = "^(PTHR\\d+):SF\\d+$"
  private val FunFamSup = "^(G3DSA:\\d+\\.\\d+\\.\\d+\\.\\d+):FF:\\d+$"

  /** Returns `sigs` with (parent, integrated_in, public) rewritten for
    * subfamily/FunFam accessions. Input must have columns
    * (acc, parent, integrated_in, public); other columns pass through.
    * Throws when a subfamily references a container accession absent
    * from the frame.
    */
  def validate(sigs: DataFrame): DataFrame = {
    val fam = regexp_extract(col("acc"), PantherFam, 1)
    val sup = regexp_extract(col("acc"), FunFamSup, 1)
    val withTarget = sigs.withColumn("__target",
      when(fam =!= "", fam).when(sup =!= "", sup))
    val containers = sigs.select(col("acc").as("__container")).distinct()
    val joined = withTarget
      .join(containers, col("__target") === col("__container"), "left_outer")

    val orphans = joined
      .filter(col("__target").isNotNull && col("__container").isNull)
      .select(col("acc"), col("__target"))
    val sample = orphans.limit(5).collect()
    if (sample.nonEmpty)
      throw new NoSuchElementException(
        "container signature not found for: " + sample.map(r =>
          s"${r.getString(0)} -> ${r.getString(1)}").mkString(", "))

    val passthrough = sigs.columns.filterNot(
      Set("parent", "integrated_in", "public"))
    joined.select(
      passthrough.map(col).toSeq ++ Seq(
        coalesce(col("__target"), col("parent")).as("parent"),
        coalesce(col("__target"), col("integrated_in")).as("integrated_in"),
        (col("public") && col("__target").isNull).as("public")): _*)
  }
}
