package graft.ops

import java.util.regex.Pattern

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** PSI-MI TAB (MITAB 2.7) interaction parsing — the reference's IntAct
  * import (interpro7dw/intact.py:24-133) as a typed per-partition parse
  * kernel: each text line splits into its 42 tab fields, the
  * InterPro-relevant fields go through the same regex extraction
  * precedence the reference applies row-by-row, and the per-entry
  * interaction dictionaries become a keyed distinct.
  *
  * Deliberately a `flatMap` kernel (the K6 HmmLogo posture), not a
  * Column pipeline: the 15-regex extraction as Catalyst expressions
  * needed nondeterministic fence columns to defeat CollapseProject and
  * stay under Janino's 64 KB whole-stage method limit — measured
  * load-bearing magic that any Spark upgrade could shatter. Here each
  * pattern is compiled once per JVM (java.util.regex.Pattern is
  * immutable and thread-safe), every field is examined exactly once
  * per line, and the reference's early-out gate order
  * (intact.py:68-81: cheap required fields first) is kept verbatim.
  * The strict 42-column contract (intact.py:95-97 raises ValueError)
  * throws with the reference's message, failing the job exactly like
  * the reference's parser instead of silently mis-aligning columns.
  */
object Mitab {

  private val NCOLS = 42

  // intact.py:31-40 — NOT case-insensitive in the reference
  private val Ipr = Pattern.compile("IPR\\d{6}")
  // find_interaction, intact.py:131-133
  private val IntactId = Pattern.compile("(?i)intact:(EBI-\\d+)")
  // find_pmid, intact.py:126-128
  private val Pubmed = Pattern.compile("(?i)pubmed:(\\d+)")
  // find_interactor, intact.py:100-123
  private val UniAcc = Pattern.compile("(?i)uniprotkb:([A-Z0-9]+)")
  private val DisplayLong = Pattern.compile("(?i)psi-mi:([^(]+)\\(display_long\\)")
  private val UniAlias = Pattern.compile("(?i)uniprotkb:([^(|]+)")
  private val MiType = Pattern.compile("(?i)psi-mi:\"MI:\\d+\"\\(([^)]+)\\)")

  /** One row per (InterPro entry, interaction) before dedup. */
  final case class Interaction(
      entry_acc: String, intact_id: String, pubmed_id: Int,
      acc_1: String, name_1: String, type_1: String,
      acc_2: String, name_2: String, type_2: String)

  /** First capture group of the first match, or null (Python
    * `re.search` returning None — all these groups are non-empty by
    * construction, so no empty-string/None ambiguity exists).
    */
  private def find(p: Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) m.group(1) else null
  }

  /** The reference's find_interactor (intact.py:100-123): UniProtKB
    * accession from the id field; name prefers the PSI-MI long name
    * (uppercased) over the UniProtKB alias; the type only resolves
    * when the field carries exactly ONE value.
    */
  private def interactor(ids: String, aliases: String, types: String)
  : (String, String, String) = {
    val acc = find(UniAcc, ids)
    val long = find(DisplayLong, aliases)
    val name =
      if (long != null) long.toUpperCase(java.util.Locale.ROOT)
      else find(UniAlias, aliases)
    val tpe =
      if (types.indexOf('|') < 0) find(MiType, types) else null
    (acc, name, tpe)
  }

  /** Parse one MITAB line into its (entry, interaction) fan-out
    * (intact.py:30-92), or nothing if any required field is missing.
    */
  private[ops] def parseLine(line: String): Iterator[Interaction] = {
    val cols = line.split("\t", -1)
    if (cols.length != NCOLS)
      throw new IllegalArgumentException(
        s"Invalid format: expecting $NCOLS columns, got ${cols.length}")
    // required-field gates in the reference's order: accessions reject
    // the majority of lines before any interactor regex runs
    val accs = scala.collection.mutable.LinkedHashSet.empty[String]
    val m36 = Ipr.matcher(cols(36))
    while (m36.find()) accs += m36.group()
    val m37 = Ipr.matcher(cols(37))
    while (m37.find()) accs += m37.group()
    if (accs.isEmpty) return Iterator.empty
    val intactId = find(IntactId, cols(13))
    if (intactId == null) return Iterator.empty
    val pmid = find(Pubmed, cols(8))
    if (pmid == null) return Iterator.empty
    val (acc1, name1, type1) = interactor(cols(0), cols(4), cols(20))
    if (acc1 == null || name1 == null || type1 == null) return Iterator.empty
    val (acc2, name2, type2) = interactor(cols(1), cols(5), cols(21))
    if (acc2 == null || name2 == null || type2 == null) return Iterator.empty
    accs.iterator.map(Interaction(_, intactId, pmid.toInt,
      acc1, name1, type1, acc2, name2, type2))
  }

  /** Parse a DataFrame of raw MITAB lines (one string column named
    * `value`, header already dropped) into one row per (InterPro
    * entry, interaction): the fan-out of intact.py:83-87's nested
    * dict, deduped on the interaction id. One narrow parse stage, then
    * a single distinct shuffle.
    */
  def interproInteractions(lines: DataFrame): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.select(col("value")).as[String]
      .flatMap(parseLine)
      .toDF()
      .distinct()
  }
}
