package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class SparkLocalSpec extends AnyFunSuite {

  test("initial shuffle width floors at cores, grows with input, caps at 1024") {
    val dir = Files.createTempDirectory("sized")
    try {
      // empty input → core count (the driver-SF no-op case)
      assert(SparkLocal.initialShufflePartitions(dir.toString, 32) === 32)
      // 8 MB → 4 wanted, still floored at the core count
      Files.write(dir.resolve("a.parquet"), new Array[Byte](8 << 20))
      assert(SparkLocal.initialShufflePartitions(dir.toString, 32) === 32)
      // nested directory layout is summed recursively
      val sub = dir.resolve("t.parquet")
      Files.createDirectory(sub)
      Files.write(sub.resolve("part-0.parquet"), new Array[Byte](120 << 20))
      assert(SparkLocal.initialShufflePartitions(dir.toString, 32) === 64)
      // the cap bounds a huge rehearsal input
      assert(SparkLocal.initialShufflePartitions(dir.toString, 2048) === 2048,
        "floor (cores) wins over the cap when cores exceed it")
    } finally {
      // 128 MB of zeros per run otherwise accretes in /tmp forever —
      // enough runs starve the sf1 gate's DuckDB spill space
      val walk = Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
