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
}
