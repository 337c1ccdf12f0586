package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet paths so the first measured query
    // doesn't absorb session startup or first-touch footer reads
    Tables.names.foreach { t =>
      try {
        (if (t == "events") Tables.events(spark, sfDir)
         else Tables.load(spark, sfDir, t)).count()
      } catch { case _: Throwable => }
    }
    // optional comma-separated query filter for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').toSet).getOrElse(Set.empty[String])
    val results = SparkEntry.queries
      .filter { case (n, _) => only.isEmpty || only(n) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
