package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc wall-clock probe for individual registry entries (r16 bench
  * tail work) — cold + one warm rep per named entry at a given SF dir.
  * `sbt "Test/runMain graft.TimeProbe /root/testdata/sf0.1 st12_drift_aware_index,s20_drift_retrain"`
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val q = SparkEntry.registry.find(_.name == n).getOrElse(
        sys.error(s"unknown entry $n"))
      def rep(): Double = {
        val t0 = System.nanoTime()
        q.run(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = rep(); val warm = rep()
      println(f"[timeprobe] $n cold=$cold%.2f warm=$warm%.2f")
    }
    spark.stop()
  }
}
