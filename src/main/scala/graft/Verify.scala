package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, rest @ _*) = args
    val only = rest.toSet // optional query-name filter for local iteration
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER=local-cluster[3,4,2048] runs the whole gate on
    // a real multi-process mini-cluster (the ExecutorLossDrill posture):
    // every query then proves itself over genuine cross-process shuffle
    // fetches and executor-side classloading, not one shared JVM. The
    // app classes and JDK17 module opens must ship to the executor
    // processes explicitly; both knobs are no-ops for local[N].
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val execOpens = Seq(
      "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .map(p => s"--add-opens java.base/$p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.executor.extraClassPath",
        "/root/repo/target/scala-2.13/classes")
      .config("spark.executor.extraJavaOptions", execOpens)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        SparkLocal.initialShufflePartitions(sfDir, cpus.toInt))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // reliable loops (default on the non-local gate master) write
      // one checkpoint dir per round; without the cleaner flag —
      // STATIC, so it must be set at context build — dereferenced
      // rounds accumulate on disk for the whole 240-query session
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the local-cluster gate runs reliable loops; its executors share
    // this machine's filesystem, so a shared tmp checkpoint dir is the
    // explicit, correct topology statement (Loops itself fails fast)
    SparkLocal.singleMachineCheckpointDir(spark)
    new java.io.File(outDir).mkdirs()
    // family-by-family with shared-frame release between families —
    // same discipline as Bench (see SharedFrames.release)
    SparkEntry.modules.foreach { case (_, qs, _) =>
      qs.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.isEmpty || only(name) }
        .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          // a throwing query must FAIL the gate, never vanish from it:
          // an absent output dir reads as "query removed" to the
          // checker, so leave an _ERROR marker the checker counts as a
          // hard failure (mode=overwrite on the next successful run
          // clears the dir)
          val dir = Paths.get(outDir, name)
          Files.createDirectories(dir)
          Files.writeString(dir.resolve("_ERROR"),
            s"${e.getClass.getName}: ${e.getMessage}\n")
        }
      }
      graft.harness.SharedFrames.release(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
