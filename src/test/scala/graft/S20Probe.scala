package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Measurement probe for s20's promotion premise (r15 — the r14
  * verdict's #3, re-measuring the r13 revert): does the share gate
  * ("a FORCED blind append of a drifted batch imbalances cells beyond
  * a retrained index") hold when both indexes build through the
  * REPLAYABLE Lloyd trainer at ≥ 2 rounds? r13 measured it FAILING for
  * the 1-round replayable trainer at sf0.1 (the premise holds for the
  * production 10-iter sampled trainer) and reverted the promotion
  * rather than weaken the gate. Run:
  * `sbt "Test/runMain graft.S20Probe /root/testdata/sf0.1"` — prints
  * forced vs retrained max-cell shares per iteration count. Not a
  * spec: the number is a measurement, recorded in SURVEY §2.11 /
  * PLANS.md, not an invariant to gate CI on.
  */
object S20Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Similarity.clusteredEmbeddings(Tables.embeddings(spark, sfDir))
    val base = e.filter(pmod(col("vec_id"), lit(3)) === 0)
    val undrifted = e.filter(pmod(col("vec_id"), lit(3)) === 1)
    val drifted = e.filter(pmod(col("vec_id"), lit(3)) === 2)
      .select(col("vec_id"),
        transform(col("embedding"), x => x + lit(0.75f)).as("embedding"))
    val full = base.unionByName(undrifted).unionByName(drifted)
    def share(root: String): (Double, Long) = {
      val r = Similarity.ivfIndexAssignments(spark, root)
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .agg(max(col("n")).as("mx"), sum(col("n")).as("tot"),
          count(lit(1)).as("nc")).head()
      (r.getLong(0).toDouble / (r.getLong(1).toDouble / r.getLong(2)), r.getLong(2))
    }
    Seq(1, 2, 3).foreach { iters =>
      val idxF = Similarity.ivfIndexBuildReplayable(base,
        Similarity.deriveNlist(base.count()), iters)
      Similarity.ivfIndexAppendReplayable(spark, idxF, undrifted, batchId = 1L)
      Similarity.ivfIndexAppendReplayable(spark, idxF, drifted, batchId = 2L)
      val idxR = Similarity.ivfIndexBuildReplayable(full,
        Similarity.deriveNlist(full.count()), iters)
      val (fs, fc) = share(idxF)
      val (rs, rc) = share(idxR)
      println(f"[s20probe] iters=$iters forcedShare=$fs%.3f (cells=$fc) " +
        f"retrainedShare=$rs%.3f (cells=$rc) premiseHolds=${fs > rs}")
    }
    // r16 (the r15 verdict's #4a): does RANK-SPACED QUANTILE seeding of
    // the hash60 order — still a pure SQL function (ROW_NUMBER over
    // (h60, vec_id), keep ranks floor(j·N/k)) — restore the retrained
    // index's balance where min-hash60 seeding does not? Statistically
    // both are uniform draws of vec_ids (hash60 is independent of the
    // embedding), so this measures whether the r13/r15 imbalance was
    // seeding-DRAW luck rather than seeding-SCHEME structure.
    def quantileCentroids(emb: org.apache.spark.sql.DataFrame, k: Int,
        iters: Int): Seq[(Int, Seq[Double])] = {
      val h = emb.select(col("vec_id"), col("embedding"),
        graft.llm.Dedup.hash60(col("vec_id").cast("string")).as("h"))
      val n = h.count()
      val ranks = (0 until k).map(j => (j * n / k) + 1).toSet
      val seeds = h
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("h"), col("vec_id"))))
        .filter(col("rn").isin(ranks.toSeq.map(Long.box): _*))
        .orderBy(col("rn")).collect()
      var cents: Seq[(Int, Seq[Double])] = seeds.toSeq.zipWithIndex.map {
        case (r, i) => (i, r.getSeq[Float](1).map(_.toDouble))
      }
      for (_ <- 0 until iters) {
        val comps = Similarity.cellAssignRounded(emb, cents, 1)
          .select(col("cid"), posexplode(col("embedding")).as(Seq("i", "x")))
          .groupBy(col("cid"), col("i"))
          .agg((sum(col("x").cast("double").cast("decimal(25,12)")).cast("double") /
            count(lit(1))).as("c"))
          .collect()
        val updated = comps.groupBy(_.getInt(0)).map { case (cid, rows) =>
          (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
        }
        cents = cents.map { case (cid, prev) => (cid, updated.getOrElse(cid, prev)) }
      }
      cents
    }
    def quantileShare(corpus: org.apache.spark.sql.DataFrame, iters: Int): (Double, Long) = {
      val cents = quantileCentroids(corpus, Similarity.deriveNlist(corpus.count()), iters)
      val r = Similarity.cellAssignRounded(corpus, cents, 1)
        .groupBy(col("cid")).agg(count(lit(1)).as("n"))
        .agg(max(col("n")).as("mx"), sum(col("n")).as("tot"),
          count(lit(1)).as("nc")).head()
      (r.getLong(0).toDouble / (r.getLong(1).toDouble / r.getLong(2)), r.getLong(2))
    }
    Seq(1, 2, 3).foreach { iters =>
      val (qs, qc) = quantileShare(full, iters)
      println(f"[s20probe] QUANTILE-seeded retrain iters=$iters " +
        f"retrainedShare=$qs%.3f (cells=$qc)")
    }
    spark.stop()
  }
}
