package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable keyed-state ledger backed by versioned parquet — the
  * production shape of the `getState`/`setState` contract the streaming
  * entry points take (tests also use an in-memory swap). Each `set`
  * writes a fresh `v<N>` directory and then flips a tiny CURRENT pointer
  * file, so a reader never observes a half-written snapshot and a crash
  * mid-write leaves the previous version intact. Combined with a
  * checkpointed source and the [[IdempotentMerge]] watermark column —
  * which this ledger PERSISTS — merged state survives JVM restarts
  * exactly-once, and a re-delivered batch after a lost checkpoint is
  * still a no-op because the watermark rides in the parquet itself.
  *
  * At cluster scale a transactional table format (Delta/Iceberg) owns
  * this commit protocol; this is the same idea with a pointer file, and
  * the delete+rename pointer flip assumes a single writer (true for a
  * streaming query's foreachBatch, which Spark serializes per query).
  */
class ParquetLedger(spark: SparkSession, dir: String, initial: DataFrame) {

  private val root = new Path(dir)
  private def fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def pointer = new Path(root, "CURRENT")

  private def currentVersion: Option[Int] =
    if (!fs.exists(pointer)) None
    else {
      val in = fs.open(pointer)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toInt)
      finally in.close()
    }

  /** Latest committed snapshot, or the initial state before any commit. */
  def get(): DataFrame = currentVersion match {
    case Some(v) => spark.read.parquet(new Path(root, s"v$v").toString)
    case None    => initial
  }

  /** Commit a new snapshot: write `v<N+1>` fully, then flip the pointer. */
  def set(df: DataFrame): Unit = {
    val next = currentVersion.getOrElse(-1) + 1
    df.write.mode("overwrite").parquet(new Path(root, s"v$next").toString)
    val tmp = new Path(root, "CURRENT.tmp")
    val out = fs.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(pointer, false)
    fs.rename(tmp, pointer)
    ()
  }
}
