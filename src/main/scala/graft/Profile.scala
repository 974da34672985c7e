package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc operator profiler: times named operators (or all registered
  * queries matching a prefix) with full materialization. Usage:
  * `sbt "runMain graft.Profile <sfDir> <namePrefix> [reps]"`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val prefix = if (args.length > 1) args(1) else ""
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "512")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach(t => try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => })
    SparkEntry.registry.filter(_.name.startsWith(prefix)).foreach { q =>
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => println(s"PROF ${q.name} rep$i FAILED: ${e.getMessage}") }
        println(f"PROF ${q.name} rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      graft.llm.Dedup.releaseSpills(spark)
    }
    spark.stop()
  }
}
