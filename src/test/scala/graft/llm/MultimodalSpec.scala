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

  test("true aHash: decoded-raster signature replays the closed form; encoder-independent") {
    // closed-form recompute of the content-image aHash: tile the text
    // bytes into the 16x16 raster, 2x2 box sums, bit iff box mean >
    // global mean (cross-multiplied: s*64 > tot at this geometry)
    def closedForm(bytes: Array[Byte]): (Long, Long) = {
      val side = Multimodal.AHashSide
      val s = new Array[Long](64)
      var tot = 0L
      for (k <- 0 until 64; d <- 0 until 4) {
        val x = (k % 8) * 2 + d % 2
        val y = (k / 8) * 2 + d / 2
        val v = Multimodal.contentImagePixel(bytes, x, y).toLong
        s(k) += v; tot += v
      }
      require(side == 16, "closed form assumes the 16x16 fixture")
      def half(off: Int): Long = {
        var acc = 0L
        for (i <- 0 until 32) if (s(off + i) * 64 > tot) acc |= 1L << i
        acc
      }
      (half(0), half(32))
    }
    val docs = Tables.documents(spark, sf).limit(40)
    val viaCodec = Multimodal.contentImageTable(docs)
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .collect().map { case (id, p) => id -> Multimodal.imageAHash(id, p) }.toMap
    val texts = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect()
    texts.foreach { case (id, t) =>
      val bytes = Option(t).map(_.getBytes("UTF-8")).getOrElse(Array.emptyByteArray)
      assert(viaCodec(id) === closedForm(bytes),
        s"doc $id: encode->decode->aHash lost the closed-form signature")
    }
    // the point of the real decoder: the hash sees PIXELS, so the same
    // raster re-encoded (a second, independent PNG byte stream) must
    // collide exactly — the retired byte-slot stub failed this
    val p0 = Multimodal.contentImageTable(docs.limit(1))
      .select(col("payload")).as[Array[Byte]].head()
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p0))
    val copy = new java.awt.image.BufferedImage(
      img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    copy.getGraphics.drawImage(img, 0, 0, null)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(copy, "png", bos)
    assert(Multimodal.imageAHash(0L, bos.toByteArray) === Multimodal.imageAHash(0L, p0),
      "re-encoded identical raster changed the perceptual hash")
    // generic box partition on odd geometry (5x3: some 8x8 grid boxes
    // are empty): hash must equal a direct box-partition recompute
    val odd = new java.awt.image.BufferedImage(
      5, 3, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val orr = odd.getRaster
    for (y <- 0 until 3; x <- 0 until 5) orr.setSample(x, y, 0, (x * 37 + y * 101) % 256)
    val ob = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(odd, "png", ob)
    val (olo, ohi) = Multimodal.imageAHash(7L, ob.toByteArray)
    val s = new Array[Long](64); val c = new Array[Long](64)
    var tot = 0L; var npx = 0L
    for (j <- 0 until 8; i <- 0 until 8;
         y <- j * 3 / 8 until (j + 1) * 3 / 8; x <- i * 5 / 8 until (i + 1) * 5 / 8) {
      val k = j * 8 + i
      s(k) += (x * 37 + y * 101) % 256; c(k) += 1
      tot += (x * 37 + y * 101) % 256; npx += 1
    }
    def wantHalf(off: Int): Long = {
      var acc = 0L
      for (k <- 0 until 32) if (s(off + k) * npx > tot * c(off + k)) acc |= 1L << k
      acc
    }
    assert((olo, ohi) === ((wantHalf(0), wantHalf(32))),
      "odd-geometry box partition disagrees with the direct recompute")
  }

  test("feature extraction is deterministic, batch-shaped, and matches closed-form histograms") {
    val docs = Tables.documents(spark, sf).limit(50)
    val media = Multimodal.imageTable(docs)
    val run1 = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    val run2 = Multimodal.extractFeatures(media.repartition(7)).orderBy("doc_id").collect()
    assert(run1.length === 50)
    // partitioning must not change results (no per-partition state leaks)
    run1.zip(run2).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0))
      assert(a.getDouble(2) === b.getDouble(2))
      assert(a.getSeq[Float](3) === b.getSeq[Float](3))
    }
    // feature contract: 8 floats = the 8-bin intensity histogram of the
    // DECODED raster (the r12 real leg) — recompute from the fixture's
    // closed pixel form and compare count for count
    run1.foreach { r =>
      val id = r.getLong(0)
      val fv = r.getSeq[Float](3)
      assert(fv.length === 8)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 255.0)
      val w = Multimodal.imageWidth(id)
      val h = Multimodal.imageHeight(id)
      val want = new Array[Long](8)
      for (y <- 0 until h; x <- 0 until w)
        want(Multimodal.imagePixel(id, x, y) / 32) += 1
      assert(fv.map(_.toLong) === want.toSeq, s"doc $id histogram")
      assert(fv.map(_.toLong).sum === w.toLong * h, s"doc $id bins must cover all pixels")
    }
  }

  test("real PNG codec: payloads are genuine PNGs; decode round-trips pixels exactly") {
    val docs = Tables.documents(spark, sf).limit(40)
    val imgs = Multimodal.imageTable(docs)
      .select(col("doc_id"), col("payload"), col("meta.format"))
      .as[(Long, Array[Byte], String)].collect()
    assert(imgs.nonEmpty)
    imgs.foreach { case (id, p, fmt) =>
      assert(fmt === "image/png")
      // PNG magic: \x89 P N G \r \n \x1a \n — these are real encoded
      // image bytes, not a fake
      assert((p(0) & 0xff) === 0x89 && p(1) === 'P'.toByte &&
        p(2) === 'N'.toByte && p(3) === 'G'.toByte, s"doc $id not a PNG")
      // decode independently of the seam and compare pixel for pixel
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      assert(img.getWidth === Multimodal.imageWidth(id))
      assert(img.getHeight === Multimodal.imageHeight(id))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        assert(img.getRaster.getSample(x, y, 0) === Multimodal.imagePixel(id, x, y),
          s"doc $id pixel ($x,$y)")
    }
    // the seam's decode agrees with the closed form the oracle uses
    val dec = Multimodal.decodedImages(spark, docs)
      .select("doc_id", "width", "height", "channels", "total")
      .as[(Long, Long, Long, Long, Long)].collect()
    dec.foreach { case (id, w, h, c, tot) =>
      assert(w === Multimodal.imageWidth(id) && h === Multimodal.imageHeight(id))
      assert(c === 1L, "grayscale PNG must decode to one band")
      val want = (for (y <- 0 until h.toInt; x <- 0 until w.toInt)
        yield Multimodal.imagePixel(id, x, y).toLong).sum
      assert(tot === want, s"doc $id pixel total")
    }
  }

  test("real image resize: hand-computed 2x2 box means; round-trips through PNG") {
    for (id <- Seq(0L, 7L, 23L, 100L)) {
      val w = Multimodal.imageWidth(id)
      val h = Multimodal.imageHeight(id)
      // encode the fixture image independently of the seam
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, Multimodal.imagePixel(id, x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val (rid, tw, th, tot, chk) = Multimodal.resizeImageStats(id, bos.toByteArray)
      assert(rid === id)
      assert(tw === (w + 1) / 2 && th === (h + 1) / 2)
      // plain-Scala box means (integer floor; edge boxes shrink)
      var wantTot = 0L
      var wantChk = 0L
      for (o <- 0 until (tw * th).toInt) {
        val bx = (o % tw).toInt; val by = (o / tw).toInt
        val pix = for {
          dy <- 0 until 2; dx <- 0 until 2
          if 2 * bx + dx < w && 2 * by + dy < h
        } yield Multimodal.imagePixel(id, 2 * bx + dx, 2 * by + dy)
        val v = (pix.sum / pix.length).toLong
        wantTot += v
        wantChk += v * (o + 1)
      }
      assert(tot === wantTot, s"doc $id resized total")
      assert(chk === wantChk, s"doc $id resized checksum")
    }
  }

  test("real scene cuts: decoded-frame energies equal closed form; threshold replays") {
    val docs = Tables.documents(spark, sf).limit(30)
    val out = Multimodal.sceneCutsImage(spark, docs)
      .select("doc_id", "n_frames", "n_cuts", "n_scenes", "longest_scene")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, nf, nc, ns, ls) =>
      val w = Multimodal.imageWidth(id)
      val h = Multimodal.imageHeight(id)
      assert(nf === Multimodal.videoFrameCount(id).toLong)
      val energies = (0 until nf.toInt).map(f =>
        (for (y <- 0 until h; x <- 0 until w)
          yield Multimodal.videoPixel(id, f, x, y).toLong).sum)
      val cuts = (1 until nf.toInt).filter(f =>
        4L * math.abs(energies(f) - energies(f - 1)) > 255L * w * h)
      assert(nc === cuts.length.toLong, s"doc $id cuts")
      assert(ns === cuts.length.toLong + 1, s"doc $id scenes")
      val bounds = 0 +: cuts :+ nf.toInt
      assert(ls === bounds.sliding(2).map(p => (p(1) - p(0)).toLong).max,
        s"doc $id longest scene")
    }
    // the clip payload really is a sequence of genuine PNGs
    val clip = Multimodal.videoTable(docs.limit(3))
      .select(col("doc_id"), col("frames"), col("meta.format"))
      .as[(Long, Seq[Array[Byte]], String)].collect()
    clip.foreach { case (id, frames, fmt) =>
      assert(fmt === "video/png-frames")
      assert(frames.length === Multimodal.videoFrameCount(id))
      frames.foreach(p => assert((p(0) & 0xff) === 0x89 && p(1) === 'P'.toByte))
    }
  }

  test("fingerprint: identical texts collide, sketch bounded, scalar schema") {
    val docs = Seq((1L, "abcdefghijklmnop"), (2L, "abcdefghijklmnop"), (3L, "zzzzyyyyxxxxwwww"))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"), lit("synth").as("source"),
        length($"text").cast("long").as("n_chars"))
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

  test("audio landmarks: real WAV codec recovers the closed-form tone schedule") {
    val r = new scala.util.Random(5)
    // payload bytes must survive the text round-trip, so build from a-z
    def txtBytes(n: Int) = Array.fill(n)((r.nextInt(26) + 'a').toByte)
    val song = txtBytes(64 * 10) // 10 frames -> 17 landmark pairs
    val other = txtBytes(64 * 10)
    val tiny = txtBytes(40) // under one frame: no landmarks
    // the synthesized payload is a GENUINE RIFF/WAV container
    val wav = Multimodal.audioWav(song)
    assert(wav(0) === 'R'.toByte && wav(1) === 'I'.toByte &&
      wav(2) === 'F'.toByte && wav(3) === 'F'.toByte, "payload is not a RIFF/WAV")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    // independent decode: javax.sound.sampled sees 16-bit mono PCM with
    // exactly nFrames·LmkFrame samples
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getSampleSizeInBits === 16)
    assert(ais.getFormat.getChannels === 1)
    assert(ais.getFrameLength === 10L * Multimodal.LmkFrame)
    // the decode → DFT → peak-pick chain must recover EXACTLY the keys
    // the closed-form tone schedule predicts (what the oracle replays)
    val k1 = Multimodal.audioLandmarks(1L, wav)
    val want = Multimodal.landmarkKeys(Multimodal.audioFrameStates(song))
    assert(k1.toSeq === want.toSeq, "codec round trip lost the tone schedule")
    assert(k1.nonEmpty && k1.toSeq === k1.sorted.toSeq && k1.distinct.length === k1.length)
    val space = Multimodal.LmkBands * Multimodal.LmkBands
    assert(k1.forall(k => k >= 0 && k < space * space * Multimodal.LmkMaxDelta))
    assert(Multimodal.audioLandmarks(2L, Multimodal.audioWav(tiny)).isEmpty,
      "sub-frame payload must be silent")
    assert(Multimodal.audioLandmarks(3L, Multimodal.audioWav(song.clone())).toSeq === k1.toSeq)
    // the registry op end-to-end on a synthetic corpus: the planted dup
    // (1,2) matches at score 1.0; the sub-frame doc never appears
    val docs = Seq(
      (1L, new String(song, "UTF-8")), (2L, new String(song, "UTF-8")),
      (3L, new String(other, "UTF-8")), (4L, new String(tiny, "UTF-8"))
    ).toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"), lit("synth").as("source"),
        length($"text").cast("long").as("n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("m5docs").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val op = Multimodal.registry.find(_.name == "m5_audio_fingerprint").get
    val out = op.run(spark, dir).collect()
      .map(r2 => (r2.getLong(0), r2.getLong(1)) -> (r2.getLong(2), r2.getDouble(3))).toMap
    assert(out.contains((1L, 2L)), s"planted dup not found: ${out.keySet}")
    assert(out((1L, 2L))._2 === 1.0, s"identical payloads must score 1.0: $out")
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      "a sub-frame payload produced landmarks")
  }

  test("media dedup clusters: components cover exactly the m4 pair graph, byte-largest kept") {
    val docs = Tables.documents(spark, sf)
    val pairs = Multimodal.phashPairs(spark, docs)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "corpus must contain phash near-dups to test")
    val out = graft.SparkEntry.registry.find(_.name == "m8_media_dedup_clusters").get
      .run(spark, sf)
      .select("doc_id", "comp_id", "n_bytes", "kept")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    // membership = the pair graph's node set; both pair ends share a comp
    assert(out.keySet === pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    pairs.foreach { case (a, b) =>
      assert(out(a)._1 === out(b)._1, s"pair ($a,$b) split across components")
    }
    // exactly one keeper per component, and it is byte-maximal
    out.values.groupBy(_._1).foreach { case (c, members) =>
      val keepers = members.filter(_._3)
      assert(keepers.size === 1, s"component $c has ${keepers.size} keepers")
      assert(keepers.head._2 === members.map(_._2).max,
        s"component $c keeper is not byte-largest")
    }
  }

  test("alignment filter: plain-Scala cosines agree; decile flag; zero guard") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rng = new scala.util.Random(11)
    val featRows: Seq[(Long, Array[Float])] =
      (1L to 9L).map(i => i -> Array.fill(8)((rng.nextInt(120) + 1).toFloat)) :+
        (10L -> Array.fill(8)(0.0f)) // zero feature → guarded score 0.0
    val feats = featRows.toDF("doc_id", "feature")
    val embs = featRows.map { case (id, p) =>
      val ev: Array[Float] =
        if (id == 1L) p.map(_ * 2)        // parallel → 1.0
        else if (id == 2L) p.map(-_)      // opposite → −1.0
        else Array.fill(8)(rng.nextFloat * 2 - 1)
      (id, ev ++ Array.fill(56)(0.0f)) // dims past 8 must be ignored
    }.toDF("vec_id", "embedding")
    val out = Multimodal.alignmentFilter(feats, embs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getBoolean(3))))
      .toMap

    val expected = featRows.map { case (id, p) =>
      val fv = p.map(_.toDouble)
      val evRow = embs.filter(col("vec_id") === id).head().getSeq[Float](1).take(8)
      val ev = evRow.map(_.toDouble)
      val (na, nb) = (fv.map(x => x * x).sum, ev.map(x => x * x).sum)
      id -> (if (na * nb == 0) 0.0
             else round6((fv, ev).zipped.map(_ * _).sum / (math.sqrt(na) * math.sqrt(nb))))
    }.toMap
    expected.foreach { case (id, sc) =>
      assert(out(id)._1 === sc, s"doc $id score")
    }
    assert(out(1L)._1 === 1.0 && out(2L)._1 === -1.0 && out(10L)._1 === 0.0)
    // bottom decile of 10 rows = exactly the single worst pair (doc 2)
    assert(out.values.count(_._3) === 1)
    assert(out(2L)._3, "the opposite pair must be flagged")
    assert(out.values.map(_._2).toSeq.sorted === (1L to 10L))
  }
}
