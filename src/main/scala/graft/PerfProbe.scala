package graft
import org.apache.spark.sql.SparkSession

/** Builder-side micro-harness: time a handful of named registry queries
  * at sf0.1 with warm reps, Bench-style (pre-touched inputs, noop-write
  * materialization, spill release per run) but without the full
  * registry pass — the iterate-on-one-operator loop. Usage:
  * `sbt "runMain graft.PerfProbe t28_bm25 d5_ngram_jaccard"`. The
  * driver never runs this; Bench stays the artifact of record.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach(t => try Tables.load(spark, sfDir, t).write.format("noop").mode("overwrite").save() catch { case _: Throwable => })
    for (name <- args) {
      val q = SparkEntry.registry.find(_.name == name).get
      val times = (1 to 6).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        graft.llm.Dedup.releaseSpills(spark)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name cold=${times.head}%.3f warm=${times.tail.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
