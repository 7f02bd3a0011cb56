package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time a handful of named SparkEntry queries in isolation
  * (same session config and noop-sink materialization as
  * [[graft.Bench]], two runs each with a cache clear between). Use it
  * to tell a real per-query regression from machine-load contention
  * without paying for the full ~90-query bench sweep:
  * `sbt 'runMain graft.tools.MiniBench q_dedup_minhash q_rollup'`.
  */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same env knobs as Bench, or the numbers aren't comparable
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      (1 to 2).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[mini] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
