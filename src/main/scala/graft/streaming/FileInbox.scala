package graft.streaming

/** Staging for file-stream sources: Spark's file source watches a
  * DIRECTORY (the inbox pattern — the reference's `.load`/`.done`
  * sentinel handoff, interpro/elastic/config.py:4-6), but the test
  * layout is one parquet file per table in a shared dir, so each
  * streamed table is staged once into its own per-sf inbox under
  * /tmp. In production the upstream job writes straight into the
  * inbox and no staging exists.
  */
object FileInbox {

  /** Stage `dir/table.parquet` into an inbox directory and return the
    * inbox path. The inbox name carries a digest of the ABSOLUTE source
    * path (two datasets whose directories share a leaf name must not
    * share an inbox), and staging preserves the source mtime so a
    * changed source is detected by mtime INEQUALITY — an mtime
    * -preserving copy of a regenerated dataset would defeat a
    * strictly-newer check and silently feed every streaming query
    * stale rows.
    */
  def stage(dir: String, table: String): String = {
    val srcDir = new java.io.File(dir).getAbsoluteFile
    val pathKey = java.security.MessageDigest.getInstance("MD5")
      .digest(srcDir.getPath.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    val suffix = if (table == "events") "" else s"-$table"
    val inbox = new java.io.File(
      s"/tmp/graft-stream-inbox$suffix-${srcDir.getName}-$pathKey")
    inbox.mkdirs()
    val src = new java.io.File(srcDir, s"$table.parquet")
    // the source is either one parquet FILE (driver-generated layout)
    // or a DIRECTORY of part files (Spark-written, e.g. ScaleUp
    // output) — stage every data file either way; a directory copied
    // as a single entry would stage an empty dir and silently feed
    // the stream zero rows
    val parts: Seq[java.io.File] =
      if (src.isDirectory)
        src.listFiles().toSeq
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      else Seq(src)
    // a directory with zero part files (e.g. an interrupted write that
    // left only _SUCCESS) would stage an empty inbox and every stream
    // would silently read zero rows — fail loudly instead, like the
    // single-file layout does via Files.copy on a missing file
    require(parts.nonEmpty, s"inbox staging: no parquet parts under $src")
    parts.foreach { p =>
      val staged = new java.io.File(inbox, p.getName)
      val stale = !staged.exists() || p.length() != staged.length() ||
        p.lastModified() != staged.lastModified()
      if (stale) {
        java.nio.file.Files.copy(p.toPath, staged.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        // the equality check depends on this mtime stamp; on a mount
        // where it silently fails every stage() would re-copy the
        // whole dataset forever — surface that loudly instead
        require(staged.setLastModified(p.lastModified()),
          s"inbox staging: cannot set mtime on $staged (filesystem " +
            "refuses), staleness detection would re-copy on every call")
      }
    }
    // drop staged parts whose source file vanished (regenerated
    // dataset with a different part layout)
    val keep = parts.map(_.getName).toSet
    inbox.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !keep(f.getName))
      .foreach(_.delete())
    inbox.getAbsolutePath
  }
}
