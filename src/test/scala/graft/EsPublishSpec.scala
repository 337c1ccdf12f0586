package graft

import graft.sources.{EsPublish, Sinks}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicBoolean
import scala.jdk.CollectionConverters._

/** Publish-lifecycle contract for the bulk-doc sink (S10 tail;
  * reference interpro/elastic/index.py:52-158,203-337): per-file bulk
  * retry keeps only failed docs, and the staging→live alias flip is
  * all-or-nothing even under a concurrent reader.
  */
class EsPublishSpec extends SparkSpec {

  private def tmpDir(name: String): String = {
    val p = Files.createTempDirectory(name)
    p.toFile.deleteOnExit()
    p.toString
  }

  private def docsFor(dir: String): Unit = {
    val docs = Tables.nation(spark, sf)
      .select(col("n_nationkey").as("id"), col("n_name").as("name"))
      .repartition(4)
    Sinks.writeJsonDocsWithSentinel(docs, dir)
  }

  test("indexBatches retries only the failed docs and clears .err on success") {
    val dir = tmpDir("esdocs")
    docsFor(dir)

    // every even-id doc fails its FIRST bulk attempt; the retry round
    // must then carry ONLY those docs, which succeed
    var calls = Vector.empty[Seq[String]]
    var failedOnce = Set.empty[String]
    val stats = EsPublish.indexBatches(dir, { docs =>
      calls :+= docs
      docs.map { d =>
        val even = d.matches(""".*"id":\d*[02468],.*""")
        if (even && !failedOnce(d)) { failedOnce += d; false } else true
      }
    })

    assert(stats.docsIndexed === 25, s"all 25 docs eventually indexed: $stats")
    assert(failedOnce.nonEmpty, "the injected failures were exercised")
    assert(stats.docsFailed === failedOnce.size)
    val (first, retries) = calls.splitAt(4)
    assert(first.map(_.length).sum === 25, "round 1 saw every doc once")
    assert(retries.nonEmpty, "a retry round ran")
    // retry batches carried strictly the failed subset, each exactly once
    assert(retries.flatten.toSet.subsetOf(failedOnce))
    assert(retries.flatten.length === failedOnce.size)
    // drained: no batch files, no .err markers left
    val left = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("part-") || n.endsWith(".err")).toSeq
    assert(left.isEmpty, s"leftover files: $left")
  }

  test("indexBatches leaves the file and an .err marker when retries exhaust") {
    val dir = tmpDir("esfail")
    docsFor(dir)
    val stats = EsPublish.indexBatches(dir,
      docs => docs.map(_ => false), maxRounds = 3)
    assert(stats.rounds === 3)
    assert(stats.docsIndexed === 0)
    val names = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(names.exists(_.endsWith(".err")), s"no .err marker in $names")
    val errFile = names.find(_.endsWith(".err")).get
    val marker = new String(
      Files.readAllBytes(Paths.get(dir, errFile)), "UTF-8")
    assert(marker.contains("attempt=3"), s"marker records attempts: $marker")
  }

  test("createIndex + publish rotate staging→live→previous and retire old indices") {
    val root = tmpDir("esroot")

    // release v98: create, publish
    val v98 = EsPublish.createIndex(root, "rel", "interpro_", "98.0")
    Files.write(Paths.get(v98, "docs.jsonl"), "d98\n".getBytes("UTF-8"))
    EsPublish.publish(root, "rel")
    assert(EsPublish.aliasIndices(root, "rel_live") === Seq("interpro_98.0"))

    // release v99: previous empty so far; after publish 98 is previous
    EsPublish.createIndex(root, "rel", "interpro_", "99.0")
    EsPublish.publish(root, "rel")
    assert(EsPublish.aliasIndices(root, "rel_live") === Seq("interpro_99.0"))
    assert(EsPublish.aliasIndices(root, "rel_previous") === Seq("interpro_98.0"))
    assert(Files.exists(Paths.get(root, "indices", "interpro_98.0")),
      "previous release data is retained, not deleted, at publish")

    // release v100: createIndex retires the 'previous' (98) indices
    EsPublish.createIndex(root, "rel", "interpro_", "100.0")
    assert(!Files.exists(Paths.get(root, "indices", "interpro_98.0")),
      "create_indices deletes the indices behind the previous alias")
    EsPublish.publish(root, "rel")
    assert(EsPublish.aliasIndices(root, "rel_live") === Seq("interpro_100.0"))
    assert(EsPublish.aliasIndices(root, "rel_previous") === Seq("interpro_99.0"))
  }

  test("alias flip is all-or-nothing under a concurrent reader") {
    val root = tmpDir("esflip")
    EsPublish.setAlias(root, "rel_live", Seq("idx_a", "idx_b"))

    val stop = new AtomicBoolean(false)
    @volatile var bad: Option[Seq[String]] = None
    val reader = new Thread(() => {
      while (!stop.get()) {
        val seen = EsPublish.aliasIndices(root, "rel_live")
        val ok = seen == Seq("idx_a", "idx_b") || seen == Seq("idx_c", "idx_d")
        if (!ok && bad.isEmpty) bad = Some(seen)
      }
    })
    reader.start()
    try
      for (_ <- 1 to 200) {
        EsPublish.setAlias(root, "rel_live", Seq("idx_c", "idx_d"))
        EsPublish.setAlias(root, "rel_live", Seq("idx_a", "idx_b"))
      }
    finally { stop.set(true); reader.join() }
    assert(bad.isEmpty, s"reader observed a partial alias state: $bad")
  }
}
