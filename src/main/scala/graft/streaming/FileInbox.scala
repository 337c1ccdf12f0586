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
    val src = java.nio.file.Paths.get(s"${srcDir.getPath}/$table.parquet")
    val staged = new java.io.File(inbox, s"$table.parquet")
    val srcMtime = java.nio.file.Files.getLastModifiedTime(src).toMillis
    val stale = !staged.exists() ||
      java.nio.file.Files.size(src) != staged.length() ||
      srcMtime != staged.lastModified()
    if (stale) {
      java.nio.file.Files.copy(src, staged.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      staged.setLastModified(srcMtime) // preserve for the equality check
    }
    inbox.getAbsolutePath
  }
}
