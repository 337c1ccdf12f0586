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
    * inbox path. Re-stages when the source is newer or a different
    * size: a staged copy left over from a regenerated dataset would
    * silently feed every streaming query stale rows.
    */
  def stage(dir: String, table: String): String = {
    val sfName = new java.io.File(dir).getName
    val suffix = if (table == "events") "" else s"-$table"
    val inbox = new java.io.File(s"/tmp/graft-stream-inbox$suffix-$sfName")
    inbox.mkdirs()
    val src = java.nio.file.Paths.get(s"$dir/$table.parquet")
    val staged = new java.io.File(inbox, s"$table.parquet")
    val stale = !staged.exists() ||
      java.nio.file.Files.size(src) != staged.length() ||
      java.nio.file.Files.getLastModifiedTime(src).toMillis > staged.lastModified()
    if (stale) {
      java.nio.file.Files.copy(src, staged.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    inbox.getAbsolutePath
  }
}
