package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, File, FileInputStream, FileOutputStream}

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream

/** Release packaging of the lookup directory — the reference's
  * `matches-api-data.tar.gz` step (interpro/ftp/lookup.py:9-17):
  * tar-gz every file of `indir/version` under an `interpro-<version>/`
  * prefix. Driver-side file packaging with no dataflow (the lookup
  * files themselves are produced by the distributed sinks); kept out
  * of Spark deliberately — a single sequential gzip stream is the
  * format's own bottleneck, not a partitioning problem.
  */
object LookupArchive {

  val LookupTar = "matches-api-data.tar.gz"

  /** Package `indir/version`'s files into `outdir/matches-api-data
    * .tar.gz` with arcnames `interpro-<version>/<file>`. Returns the
    * archive path. Deterministic: entries are added in sorted name
    * order (os.listdir order is filesystem-dependent; sorted output
    * makes the archive reproducible byte-for-byte given equal inputs
    * and mtimes).
    */
  def archive(indir: String, version: String, outdir: String): File = {
    val lookupDir = new File(indir, version)
    val files = Option(lookupDir.listFiles()).getOrElse(
      throw new IllegalArgumentException(s"not a directory: $lookupDir"))
      .filter(_.isFile).sortBy(_.getName)
    new File(outdir).mkdirs()
    val out = new File(outdir, LookupTar)
    val tar = new TarArchiveOutputStream(new GzipCompressorOutputStream(
      new BufferedOutputStream(new FileOutputStream(out))))
    try {
      tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
      files.foreach { f =>
        val entry = new TarArchiveEntry(f, s"interpro-$version/${f.getName}")
        tar.putArchiveEntry(entry)
        val in = new BufferedInputStream(new FileInputStream(f))
        try in.transferTo(tar) finally in.close()
        tar.closeArchiveEntry()
      }
    } finally tar.close()
    out
  }
}
