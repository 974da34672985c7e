package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{OpQuery, Tables}
import graft.OpQuery.{rowsOnly, sql}

/** Multimodal-column plumbing (builder-prompt north-star): media as opaque
  * `binary` columns with a typed metadata struct, batch-shaped
  * decode/feature-extract over partitions.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[decodeStub]] is a deterministic fake standing in for a
  * real decoder. Everything around it — schema, batch iteration shape,
  * partition parallelism, output contract — is real and tested. Swapping
  * in a real decoder changes only the function body.
  */
object Multimodal {

  /** The media row contract: an opaque payload plus typed metadata —
    * the Parquet layout a 100 TB multimodal corpus would use (payload
    * column chunks stay untouched unless projected).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("source", StringType))))))

  /** Build a media table from the documents corpus: the UTF-8 text bytes
    * act as the opaque payload.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("text/plain").as("format"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        col("source").as("source")).as("meta"))

  /** Extracted features per media item. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, brightness: Double, feature: Array[Float])

  /** ======= STUB — replace with a real decoder =======
    * Deterministic fake "decode + feature-extract" for one payload:
    * brightness = mean byte value; feature = 8 floats from simple
    * byte-window sums. Stands in for e.g. JPEG decode + CNN features.
    */
  def decodeStub(payload: Array[Byte]): (Double, Array[Float]) = {
    if (payload == null || payload.isEmpty) (0.0, Array.fill(8)(0.0f))
    else {
      val brightness = payload.map(b => (b & 0xff).toDouble).sum / payload.length
      val win = math.max(payload.length / 8, 1)
      val feature = Array.tabulate(8) { i =>
        val slice = payload.slice(i * win, math.min((i + 1) * win, payload.length))
        if (slice.isEmpty) 0.0f else (slice.map(b => (b & 0xff).toLong).sum % 1000L).toFloat
      }
      (brightness, feature)
    }
  }

  /** ======= STUB — replace with a real resampler =======
    * "Resize": deterministic stride-subsample of the payload to at most
    * `targetBytes` bytes — stands in for image resize (the byte-budget
    * contract and batch shape are the real part).
    */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (payload == null || payload.length <= targetBytes) payload
    else {
      val stride = math.ceil(payload.length.toDouble / targetBytes).toInt
      payload.indices.collect { case i if i % stride == 0 => payload(i) }.toArray
    }
  }

  /** ======= STUB — replace with a real frame decoder =======
    * "Frame-sample": split the payload into `n` evenly-spaced fixed-width
    * windows — stands in for video frame sampling.
    */
  def frameSampleStub(payload: Array[Byte], n: Int, frameBytes: Int): Seq[Array[Byte]] = {
    if (payload == null || payload.isEmpty) Seq.empty
    else {
      val step = math.max(payload.length / n, 1)
      (0 until n).map { i =>
        val start = math.min(i * step, math.max(payload.length - 1, 0))
        payload.slice(start, math.min(start + frameBytes, payload.length))
      }.filter(_.nonEmpty)
    }
  }

  /** Batch feature extraction: `mapPartitions` over the media table — the
    * Scala analogue of an Arrow-batched Pandas UDF: one iterator per
    * partition, constant memory, no driver involvement.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), col("meta.n_bytes").as("n_bytes"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { it =>
        it.map { case (id, payload, nBytes) =>
          val (brightness, feature) = decodeStub(payload)
          MediaFeatures(id, nBytes, brightness, feature)
        }
      }
      .toDF()
  }

  def registry: Seq[OpQuery] = Seq(

    // ---- media metadata stats (oracle: byte lengths via BLOB encode) -----
    sql("m1_media_stats",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  ascii(substr(text, 1, 1)) AS first_byte
        |FROM documents""".stripMargin) { (s, d) =>
      mediaTable(Tables.documents(s, d))
        .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
          ascii(col("payload").cast("string")).as("first_byte"))
    },

    // ---- batched feature extraction through the stub decoder -------------
    // rows-only gate (the stub's output isn't SQL-expressible in DuckDB);
    // determinism + batch shape covered by MultimodalSpec.
    rowsOnly("m2_media_features") { (s, d) =>
      extractFeatures(mediaTable(Tables.documents(s, d)))
    },

    // ---- resize + frame-sample plumbing (stubs; shapes are the contract) -
    rowsOnly("m3_media_resize_frames") { (s, d) =>
      val spark = s
      import spark.implicits._
      mediaTable(Tables.documents(s, d))
        .select(col("doc_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, p) =>
          val resized = resizeStub(p, 256)
          val frames = frameSampleStub(p, 4, 64)
          (id, resized.length, frames.length, frames.map(_.length).sum)
        })
        .toDF("doc_id", "resized_bytes", "n_frames", "frame_bytes_total")
    }
  )
}
