package graft.llm

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table: payload bytes round-trip, metadata typed") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sf))
    val r = media.select(col("doc_id"), length(col("payload")).as("n"),
      col("meta.n_bytes"), col("meta.format"))
      .as[(Long, Int, Long, String)].head()
    assert(r._2.toLong === r._3)
    assert(r._4 === "text/plain")
  }

  test("feature extraction is deterministic and batch-shaped") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sf)).limit(50)
    val run1 = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    val run2 = Multimodal.extractFeatures(media.repartition(7)).orderBy("doc_id").collect()
    assert(run1.length === 50)
    // partitioning must not change results (no per-partition state leaks)
    run1.zip(run2).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0))
      assert(a.getDouble(2) === b.getDouble(2))
      assert(a.getSeq[Float](3) === b.getSeq[Float](3))
    }
    // feature contract: 8 floats, brightness in byte range
    run1.foreach { r =>
      assert(r.getSeq[Float](3).length === 8)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 255.0)
    }
  }

  test("decode stub handles empty payload") {
    val (b, f) = Multimodal.decodeStub(Array.emptyByteArray)
    assert(b === 0.0 && f.toSeq === Seq.fill(8)(0.0f))
  }

  test("resize stub honors the byte budget; frame sampling yields bounded windows") {
    val payload = Array.tabulate(1000)(_.toByte)
    val resized = Multimodal.resizeStub(payload, 256)
    assert(resized.length <= 256 && resized.length > 0)
    assert(Multimodal.resizeStub(payload, 2000) eq payload) // under budget: untouched
    val frames = Multimodal.frameSampleStub(payload, 4, 64)
    assert(frames.length === 4)
    assert(frames.forall(f => f.length > 0 && f.length <= 64))
    assert(Multimodal.frameSampleStub(Array.emptyByteArray, 4, 64).isEmpty)
    // determinism
    assert(Multimodal.resizeStub(payload, 256).toSeq === resized.toSeq)
  }

  test("fingerprint: identical texts collide, sketch bounded, scalar schema") {
    val docs = Seq((1L, "abcdefghijklmnop"), (2L, "abcdefghijklmnop"), (3L, "zzzzyyyyxxxxwwww"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("t5docs").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fp = graft.llm.TextStats.registry.find(_.name == "t5_fingerprint").get
    val out = fp.run(spark, dir)
    // scalar-only output: raw array columns break the driver's canonicalizer
    assert(out.schema.fields.forall(f =>
      !f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
    assert(out.columns.toSeq ===
      "doc_id" +: (0 until 8).map(k => s"s$k") :+ "fingerprint")
    val rows = out.collect()
      .map(r => r.getLong(0) -> (r.getString(9), (1 to 8).count(i => !r.isNullAt(i))))
      .toMap
    assert(rows(1L)._1 === rows(2L)._1) // identical text → identical digest
    assert(rows(1L)._1 !== rows(3L)._1)
    assert(rows.values.forall(_._2 <= 8))
    // 16-char docs have 9 grams → a full 8-slot sketch
    assert(rows(1L)._2 === 8)
  }
}
