package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PSI-MI TAB (MITAB 2.7) interaction parsing — the reference's IntAct
  * import (interpro7dw/intact.py:24-133) as a distributed column
  * pipeline: each text line splits into its 42 tab fields, the
  * InterPro-relevant fields go through the same regex extraction
  * precedence the reference applies row-by-row, and the per-entry
  * interaction dictionaries become a keyed distinct.
  *
  * Everything stays inside whole-stage codegen (split / element_at /
  * regexp_extract / explode); the strict 42-column contract
  * (intact.py:95-97 raises ValueError) is enforced in-plan with
  * raise_error so a malformed line fails the job exactly like the
  * reference's parser, instead of silently mis-aligning columns.
  */
object Mitab {

  private val NCOLS = 42

  /** Column accessor over the split line (0-based MITAB index). */
  private def f(i: Int) = element_at(col("mitab_cols"), i + 1)

  /** Empty-string extracts become NULL (Python's `re.search` returning
    * None); Spark's regexp_extract yields "" on no-match.
    */
  private def extract(c: org.apache.spark.sql.Column, pattern: String) =
    nullif(regexp_extract(c, pattern, 1), lit(""))

  /** The reference's find_interactor (intact.py:100-123): UniProtKB
    * accession from the id field; name prefers the PSI-MI long name
    * (uppercased) over the UniProtKB alias; the type only resolves
    * when the field carries exactly ONE value.
    */
  private def interactor(ids: org.apache.spark.sql.Column,
                         aliases: org.apache.spark.sql.Column,
                         types: org.apache.spark.sql.Column) = (
    extract(ids, "(?i)uniprotkb:([A-Z0-9]+)"),
    coalesce(
      upper(extract(aliases, """(?i)psi-mi:([^(]+)\(display_long\)""")),
      extract(aliases, """(?i)uniprotkb:([^(|]+)""")),
    when(size(split(types, """\|""")) === 1,
      extract(types, """(?i)psi-mi:"MI:\d+"\(([^)]+)\)""")))

  /** Parse a DataFrame of raw MITAB lines (one string column named
    * `value`, header already dropped) into one row per (InterPro
    * entry, interaction): the fan-out of intact.py:83-87's nested
    * dict, deduped on the interaction id.
    */
  def interproInteractions(lines: DataFrame): DataFrame = {
    val cols = split(col("value"), "\t", -1)
    // The nondeterministic `_nd` columns are optimizer fences, and the
    // parse is deliberately staged across SEVERAL small projections:
    // without the fences, CollapseProject + predicate pushdown inline
    // the split and every regex into one giant Filter condition
    // evaluated 2-3x per field; and even fenced, a single Project
    // holding all extractions generates one whole-stage doConsume
    // method beyond Janino's hard 64 KB limit (expression splitting is
    // unavailable on whole-stage local variables), so the entire stage
    // bails out of codegen and runs interpreted ~10x slower. Each
    // small projection becomes its own generated method; every
    // extraction evaluates exactly once.
    val nd = () => monotonically_increasing_id()
    val split42 = lines
      .select(when(size(cols) === NCOLS, cols)
        .otherwise(raise_error(concat(
          lit(s"Invalid format: expecting $NCOLS columns, got "),
          size(cols).cast("string")))).as("mitab_cols"),
        nd().as("_nd1"))
    // Required-field gates FIRST: entry accessions, interaction id and
    // pubmed id are cheap single extractions that the reference also
    // checks up front (intact.py:68-81 `continue`s before touching the
    // interactors), and they reject the majority of lines — the six
    // interactor regexes below then run only on survivors.
    val gated = split42.select(
      array_distinct(concat(
        regexp_extract_all(f(36), lit("""IPR\d{6}"""), lit(0)),
        regexp_extract_all(f(37), lit("""IPR\d{6}"""), lit(0))))
        .as("accessions"),
      extract(f(13), "(?i)intact:(EBI-\\d+)").as("intact_id"),
      extract(f(8), "(?i)pubmed:(\\d+)").cast("int").as("pubmed_id"),
      f(0).as("ids_a"), f(1).as("ids_b"), f(4).as("alias_a"),
      f(5).as("alias_b"), f(20).as("types_a"), f(21).as("types_b"),
      nd().as("_nd2"))
      // `_nd2 >= 0` is vacuously true but load-bearing: it keeps the
      // fence column alive through column pruning (an unreferenced
      // nondeterministic column is pruned, the projects turn
      // deterministic again, and the filter sinks to the scan with the
      // whole pipeline inlined per conjunct — the measured 64 KB
      // codegen bailout). isNotNull would constant-fold away on the
      // non-nullable id; an inequality survives optimization.
      .filter(col("_nd2") >= 0 && size(col("accessions")) > 0 &&
        col("intact_id").isNotNull && col("pubmed_id").isNotNull)
    val (acc1, name1, type1) =
      interactor(col("ids_a"), col("alias_a"), col("types_a"))
    val withA = gated.select(
      acc1.as("acc_1"), name1.as("name_1"), type1.as("type_1"),
      col("accessions"), col("intact_id"), col("pubmed_id"),
      col("ids_b"), col("alias_b"), col("types_b"), nd().as("_nd3"))
    val (acc2, name2, type2) =
      interactor(col("ids_b"), col("alias_b"), col("types_b"))
    val parsed = withA.select(
      col("accessions"), col("intact_id"), col("pubmed_id"),
      col("acc_1"), col("name_1"), col("type_1"),
      acc2.as("acc_2"), name2.as("name_2"), type2.as("type_2"),
      nd().as("_nd4"))
    parsed
      .filter(col("_nd4") >= 0 &&
        col("acc_1").isNotNull && col("name_1").isNotNull &&
        col("type_1").isNotNull && col("acc_2").isNotNull &&
        col("name_2").isNotNull && col("type_2").isNotNull)
      .select(explode(col("accessions")).as("entry_acc"),
        col("intact_id"), col("pubmed_id"),
        col("acc_1"), col("name_1"), col("type_1"),
        col("acc_2"), col("name_2"), col("type_2"))
      .distinct()
  }
}
