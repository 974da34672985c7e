package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR`, forcing full materialization of all output
  * columns via a noop-format write (a bare `count()` would let Catalyst
  * prune the projection and under-measure). Prints ONE JSON line.
  *
  * Measurement protocol: one untimed warm-up pass, then
  * `SPARK_GRAFT_REPS` (default 3) timed reps per query; the reported
  * per-query number is the MEDIAN, with min/max spread alongside — a
  * single run on a shared machine swings 2-3× on load (adjudicated by
  * hand in rounds 3 and 4; the median makes the artifact the evidence).
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup outside timing: session init, file listing.
    Tables.all.foreach { t =>
      try Tables.load(spark, sfDir, t).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $t failed: ${e.getMessage}")
      }
    }
    // Steady-state protocol: one untimed pass over every query first —
    // single-run timings otherwise charge one-time Janino codegen
    // compilation (hundreds of ms per generated stage) to whichever query
    // compiles it. The timed pass below then measures the engine, not the
    // compiler.
    SparkEntry.registry.foreach { q =>
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // Rep loops are per-query (not query-loop-inside-rep-loop) so each
    // query's reps run back-to-back under comparable machine load — the
    // spread then reflects noise, not drift across a long pass.
    // A rep whose query THROWS is not a measurement: its elapsed time is
    // discarded (failure latency folded into a median would make a broken
    // query look like a timed one), the error prints once, and a query
    // with zero successful reps reports null.
    val results = SparkEntry.registry.map { q =>
      var reported = false
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          if (!reported) {
            System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
            reported = true
          }
          None
        }
      }
      (q.name, times)
    }
    // Locale.ROOT: default-locale format would emit comma decimals on
    // e.g. de_DE JVMs and corrupt the JSON artifact
    def fmt(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, ts) =>
      "\"" + k + "\":" + (if (ts.isEmpty) "null" else fmt(median(ts)))
    }.mkString("{", ",", "}")
    val spread = results.map { case (k, ts) =>
      if (ts.isEmpty) "\"" + k + "\":{\"failed\":true}"
      else "\"" + k + "\":{\"min\":" + fmt(ts.min) + ",\"max\":" + fmt(ts.max) +
        (if (ts.length < reps) ",\"failed_reps\":" + (reps - ts.length) else "") + "}"
    }.mkString("{", ",", "}")
    val failed = results.count(_._2.isEmpty)
    val total = results.flatMap { case (_, ts) => if (ts.isEmpty) None else Some(median(ts)) }.sum
    // Host-speed calibration: a fixed single-thread LCG loop and the same
    // loop on every core. Round-4/5/6 adjudications kept re-litigating
    // "is this regression or a slow host" — these two denominators let a
    // reader NORMALIZE totals across rounds (calib_1t ≈ core speed;
    // calib_nt/calib_1t ≫ 1 ⇒ the box was oversubscribed during the run).
    def lcgLoop(): Double = {
      val t0 = System.nanoTime()
      var x = 12345L; var i = 0
      while (i < 200000000) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
      if (x == 42L) System.err.println("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    val calib1 = lcgLoop()
    val nThreads = Runtime.getRuntime.availableProcessors()
    val calibN = {
      val t0 = System.nanoTime()
      val threads = (1 to nThreads).map(_ => new Thread(() => { lcgLoop(); () }))
      threads.foreach(_.start()); threads.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"failed":$failed,"calib_1t":${fmt(calib1)},"calib_${nThreads}t":${fmt(calibN)},"queries":$qs,"spread":$spread,"sf":"$sfDir"}""")
    spark.stop()
  }
}
