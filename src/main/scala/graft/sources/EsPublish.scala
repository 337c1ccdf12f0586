package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Index-store publish lifecycle (SURVEY.md §2.1 S10 tail).
  *
  * The reference hands generated document batches to Elasticsearch and
  * manages the release hand-over with three aliases per index family
  * (reference interpro/elastic/index.py):
  *
  *  - `create_indices` (index.py:84-158): delete the indices behind the
  *    `previous` alias, create fresh version-suffixed indices, point the
  *    `staging` alias at them;
  *  - `run_consumer` (index.py:262-310): bulk-index one batch file at a
  *    time; a fully-indexed file is deleted, a partially-failed file is
  *    OVERWRITTEN with only its failed documents so the next round
  *    retries just those; `index_documents` (index.py:203-251) loops
  *    rounds until a round processes zero files;
  *  - `publish` (index.py:313-337): one atomic alias update — `live`
  *    moves from the old indices to the staging ones while the old live
  *    set gains `previous`.
  *
  * This is the zero-egress analogue over a directory tree: an "index" is
  * `root/indices/<name>`, an alias is a single file `root/aliases/<name>`
  * listing its member indices. Alias updates write a temp file and
  * ATOMIC_MOVE it over the alias, so a concurrent reader sees either the
  * complete old set or the complete new set — the same all-or-nothing
  * contract as `indices.update_aliases`. The bulk operation is
  * pluggable: the production path appends JSON-lines to the index
  * directory; specs inject failures to exercise the retry contract.
  */
object EsPublish {

  final case class IndexStats(rounds: Int, filesProcessed: Int,
                              docsIndexed: Long, docsFailed: Long)

  private def indicesDir(root: Path) = root.resolve("indices")
  private def aliasesDir(root: Path) = root.resolve("aliases")
  private def aliasPath(root: Path, alias: String) =
    aliasesDir(root).resolve(alias)

  /** Member indices of an alias (empty if the alias does not exist). */
  def aliasIndices(root: String, alias: String): Seq[String] = {
    val p = aliasPath(Paths.get(root), alias)
    if (Files.exists(p))
      Files.readAllLines(p, UTF_8).asScala.toSeq.filter(_.nonEmpty)
    else Seq.empty
  }

  /** Atomically point `alias` at exactly `indices` (update_aliases'
    * all-or-nothing add+remove, index.py:52-82): temp write + atomic
    * rename means no reader ever observes a partial member list.
    */
  def setAlias(root: String, alias: String, indices: Seq[String]): Unit = {
    val dir = aliasesDir(Paths.get(root))
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, s".$alias", ".tmp")
    Files.write(tmp, indices.mkString("\n").getBytes(UTF_8))
    Files.move(tmp, dir.resolve(alias), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(Files.delete(_))
      finally s.close()
    }

  /** create_indices (index.py:84-158): retire the indices behind
    * `<family>_previous`, create a fresh empty index
    * `<base><version>`, and point `<family>_staging` at it.
    * Returns the new index's directory (the bulk-load target).
    */
  def createIndex(root: String, family: String, base: String,
                  version: String): String = {
    val r = Paths.get(root)
    for (idx <- aliasIndices(root, s"${family}_previous"))
      deleteRecursively(indicesDir(r).resolve(idx))
    setAlias(root, s"${family}_previous", Seq.empty)

    val name = base + version
    val dir = indicesDir(r).resolve(name)
    deleteRecursively(dir)
    Files.createDirectories(dir)
    setAlias(root, s"${family}_staging", Seq(name))
    dir.toString
  }

  /** publish (index.py:313-337): `live` flips to the staging indices in
    * one atomic step per alias; indices that were live but are not in
    * staging gain `previous`.
    */
  def publish(root: String, family: String): Unit = {
    val staging = aliasIndices(root, s"${family}_staging")
    val live = aliasIndices(root, s"${family}_live")
    val addPrevious = live.filterNot(staging.contains)
    if (addPrevious.nonEmpty)
      setAlias(root, s"${family}_previous", addPrevious)
    setAlias(root, s"${family}_live", staging)
  }

  /** The consumer/indexer loop (index.py:203-251 + 262-310) over the
    * JSON-lines batch parts of a [[Sinks.writeJsonDocsWithSentinel]]
    * directory. `bulk` indexes one batch and returns per-document
    * success flags (streaming_bulk with raise_on_error=False). Per
    * round, for each remaining batch file:
    *
    *  - all docs ok  → the batch file and its `.err` marker are removed;
    *  - some failed  → the file is rewritten with ONLY the failed docs
    *    and a `<file>.err` marker records the attempt count, so the next
    *    round bulk-loads just the tail.
    *
    * Rounds repeat while files remain, up to `maxRounds` (the reference
    * loops until a round indexes nothing). Returns stats; files still
    * present afterwards kept their `.err` marker for the operator.
    */
  def indexBatches(docsDir: String, bulk: Seq[String] => Seq[Boolean],
                   maxRounds: Int = 5): IndexStats = {
    val dir = Paths.get(docsDir)
    def batchFiles(): Seq[Path] = {
      val s = Files.list(dir)
      try s.iterator().asScala.toSeq
        .filter(p => p.getFileName.toString.startsWith("part-") &&
          !p.getFileName.toString.endsWith(".err") &&
          !p.getFileName.toString.endsWith(".crc"))
        .sortBy(_.getFileName.toString)
      finally s.close()
    }

    var rounds = 0
    var processed = 0
    var indexed = 0L
    var failedTotal = 0L
    var remaining = batchFiles()
    while (remaining.nonEmpty && rounds < maxRounds) {
      rounds += 1
      for (file <- remaining) {
        val docs = Files.readAllLines(file, UTF_8).asScala.toSeq
          .filter(_.nonEmpty)
        val err = file.resolveSibling(file.getFileName.toString + ".err")
        if (docs.isEmpty) {
          Files.delete(file)
          Files.deleteIfExists(err)
        } else {
          val ok = bulk(docs)
          require(ok.length == docs.length,
            s"bulk returned ${ok.length} results for ${docs.length} docs")
          val failed = docs.zip(ok).collect { case (d, false) => d }
          processed += 1
          indexed += (docs.length - failed.length)
          if (failed.isEmpty) {
            Files.delete(file)
            Files.deleteIfExists(err)
          } else {
            failedTotal += failed.length
            Files.write(file, failed.mkString("\n").getBytes(UTF_8))
            Files.write(err,
              s"attempt=$rounds failed=${failed.length}\n".getBytes(UTF_8))
          }
        }
      }
      remaining = batchFiles()
    }
    IndexStats(rounds, processed, indexed, failedTotal)
  }
}
