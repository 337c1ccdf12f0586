package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class SparkLocalSpec extends AnyFunSuite {

  test("initial shuffle width floors at cores, grows with input, caps at 1024") {
    val dir = Files.createTempDirectory("sized").toString
    // empty input → core count (the driver-SF no-op case)
    assert(SparkLocal.initialShufflePartitions(dir, 32) === 32)
    // 8 MB → 4 wanted, still floored at the core count
    Files.write(java.nio.file.Paths.get(dir, "a.parquet"),
      new Array[Byte](8 << 20))
    assert(SparkLocal.initialShufflePartitions(dir, 32) === 32)
    // nested directory layout is summed recursively
    val sub = java.nio.file.Paths.get(dir, "t.parquet")
    Files.createDirectory(sub)
    Files.write(sub.resolve("part-0.parquet"), new Array[Byte](120 << 20))
    assert(SparkLocal.initialShufflePartitions(dir, 32) === 64)
    // the cap bounds a huge rehearsal input
    assert(SparkLocal.initialShufflePartitions(dir, 2048) === 2048,
      "floor (cores) wins over the cap when cores exceed it")
  }
}
