package graft

import graft.streaming.FileInbox

import java.nio.file.{Files, Paths, StandardCopyOption}

/** The file-stream staging helper must re-stage when the source
  * changes (a staged copy left over from a regenerated dataset would
  * silently feed every streaming query stale rows) and must NOT
  * re-copy an unchanged source (the inbox is hit by every streaming
  * query in a session).
  */
class FileInboxSpec extends SparkSpec {

  test("stages once, re-stages on source change, leaves fresh copies alone") {
    val src = Files.createTempDirectory("inbox-src")
    val table = s"probe${System.nanoTime()}"
    val f = src.resolve(s"$table.parquet")
    Files.write(f, Array[Byte](1, 2, 3))

    val inbox = FileInbox.stage(src.toString, table)
    val staged = Paths.get(inbox, s"$table.parquet")
    assert(Files.readAllBytes(staged).toSeq === Seq[Byte](1, 2, 3))
    val mtime1 = Files.getLastModifiedTime(staged)

    // unchanged source → no re-copy
    FileInbox.stage(src.toString, table)
    assert(Files.getLastModifiedTime(staged) === mtime1)

    // longer content → size mismatch → re-staged
    Files.write(f, Array[Byte](9, 9, 9, 9))
    FileInbox.stage(src.toString, table)
    assert(Files.readAllBytes(staged).toSeq === Seq[Byte](9, 9, 9, 9))

    // same size, newer mtime → re-staged
    val alt = src.resolve("alt.bin")
    Files.write(alt, Array[Byte](7, 7, 7, 7))
    Files.move(alt, f, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(f, java.nio.file.attribute.FileTime.fromMillis(
      staged.toFile.lastModified() + 5000))
    FileInbox.stage(src.toString, table)
    assert(Files.readAllBytes(staged).toSeq === Seq[Byte](7, 7, 7, 7))
  }

  test("two sources with the same leaf name get distinct inboxes") {
    // the inbox name carries a digest of the ABSOLUTE source path:
    // /a/sf0.1 and /b/sf0.1 must never share a staging directory, or
    // whichever dataset staged second silently feeds the other's
    // streams
    val a = Files.createTempDirectory("inbox-a").resolve("sf")
    val b = Files.createTempDirectory("inbox-b").resolve("sf")
    Files.createDirectory(a); Files.createDirectory(b)
    val table = s"twin${System.nanoTime()}"
    Files.write(a.resolve(s"$table.parquet"), Array[Byte](1))
    Files.write(b.resolve(s"$table.parquet"), Array[Byte](2))
    val ia = FileInbox.stage(a.toString, table)
    val ib = FileInbox.stage(b.toString, table)
    assert(ia !== ib)
    assert(Files.readAllBytes(Paths.get(ia, s"$table.parquet")).toSeq === Seq[Byte](1))
    assert(Files.readAllBytes(Paths.get(ib, s"$table.parquet")).toSeq === Seq[Byte](2))
  }

  test("stages a directory-shaped source (Spark-written table) part by part") {
    val src = Files.createTempDirectory("inbox-src-dir")
    val table = s"dirprobe${System.nanoTime()}"
    val tdir = src.resolve(s"$table.parquet")
    Files.createDirectory(tdir)
    Files.write(tdir.resolve("part-00000.snappy.parquet"), Array[Byte](1, 1))
    Files.write(tdir.resolve("part-00001.snappy.parquet"), Array[Byte](2, 2))
    Files.write(tdir.resolve("_SUCCESS"), Array.emptyByteArray)

    val inbox = FileInbox.stage(src.toString, table)
    val stagedNames = new java.io.File(inbox).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    assert(stagedNames === Set("part-00000.snappy.parquet",
      "part-00001.snappy.parquet"),
      "every data part staged, marker files skipped")

    // a regenerated source with a different part layout replaces the
    // staged set — stale parts must not linger and feed old rows
    Files.delete(tdir.resolve("part-00001.snappy.parquet"))
    Files.write(tdir.resolve("part-00002.snappy.parquet"), Array[Byte](3, 3))
    FileInbox.stage(src.toString, table)
    val after = new java.io.File(inbox).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    assert(after === Set("part-00000.snappy.parquet",
      "part-00002.snappy.parquet"))
  }
}
