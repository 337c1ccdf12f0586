package graft

import graft.sources.LookupArchive
import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream
import org.scalatest.funsuite.AnyFunSuite

import java.io.{BufferedInputStream, FileInputStream}
import java.nio.file.Files

/** The lookup-directory packaging step (interpro/ftp/lookup.py:9-17):
  * every file of `indir/<version>` lands in `matches-api-data.tar.gz`
  * under the `interpro-<version>/` prefix, contents intact.
  */
class LookupArchiveSpec extends AnyFunSuite {

  test("archive packages indir/version under the interpro-<version> prefix") {
    val indir = Files.createTempDirectory("graft-lookup-in")
    val outdir = Files.createTempDirectory("graft-lookup-out")
    val versionDir = indir.resolve("104.0")
    Files.createDirectories(versionDir)
    val payload = Map(
      "matches.0.dat" -> "match-payload-0",
      "matches.1.dat" -> "match-payload-1",
      "manifest.json" -> """{"version":"104.0"}""")
    payload.foreach { case (name, text) =>
      Files.writeString(versionDir.resolve(name), text)
    }
    // a subdirectory is NOT packaged (listdir + fh.add of plain files)
    Files.createDirectories(versionDir.resolve("ignored-subdir"))

    val tarFile =
      LookupArchive.archive(indir.toString, "104.0", outdir.toString)
    assert(tarFile.getName === "matches-api-data.tar.gz")
    assert(tarFile.isFile && tarFile.length() > 0)

    val tar = new TarArchiveInputStream(new GzipCompressorInputStream(
      new BufferedInputStream(new FileInputStream(tarFile))))
    try {
      val got = Iterator.continually(tar.getNextEntry).takeWhile(_ != null)
        .map(e => e.getName -> new String(tar.readAllBytes(), "UTF-8"))
        .toMap
      assert(got === payload.map { case (n, t) => s"interpro-104.0/$n" -> t })
    } finally tar.close()
  }

  test("archive of a missing version dir fails loudly") {
    val indir = Files.createTempDirectory("graft-lookup-missing")
    intercept[IllegalArgumentException] {
      LookupArchive.archive(indir.toString, "does-not-exist",
        Files.createTempDirectory("graft-lookup-out2").toString)
    }
  }
}
