package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Multimodal column plumbing (SURVEY.md §1.3: Image/Video/Audio htypes
  * are binary payloads + typed metadata over physical columns;
  * `cpp/deeplake_core/type.hpp:43-63`, `types.pyi:1011` Image).
  *
  * The PIXEL decode kernel is STUBBED (this container ships no image
  * codecs — see decodeImages) with a deterministic byte-derived fake, but
  * everything around it is real and tested: binary payload column,
  * per-partition batch decode via Dataset.mapPartitions (the Scala analog
  * of mapInPandas batch UDFs), fixed output schema, column-metadata tags —
  * and [[imageInfo]]'s container-header parsing (format detection +
  * dimensions for PNG/JPEG/GIF/BMP) needs no codec and is NOT stubbed.
  */
object Multimodal {

  /** decoded-image row: fixed schema the real codec would also emit */
  final case class DecodedImage(id: Long, width: Int, height: Int,
      channels: Int, pixels: Array[Float])

  /** tag + attach a binary payload column (stand-in for stored image
    * bytes; semantic type travels as column metadata like the reference's
    * htype) */
  def withBinaryPayload(df: DataFrame, srcCol: String, payloadCol: String = "payload"): DataFrame = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("htype", "image").putString("sample_compression", "raw").build()
    df.withColumn(payloadCol, col(srcCol).cast("binary").as(payloadCol, meta))
  }

  /** STUB decode ??? -> deterministic fake: an 8x8 single-channel image
    * whose pixels are payload bytes scaled to [0,1]. A real deployment
    * swaps the body for an actual codec (e.g. TwelveMonkeys/JavaCV on the
    * executor classpath); the partitioning, schema and batch shape stay
    * exactly as tested here. */
  def decodeImages(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val side = 8
        val px = Array.tabulate(side * side) { i =>
          if (bytes.isEmpty) 0f else (bytes(i % bytes.length) & 0xFF) / 255.0f
        }
        DecodedImage(id, side, side, 1, px)
      })
      .toDF()
  }

  /** parsed container metadata: REAL (not stubbed) — format detection and
    * dimensions come from the actual byte headers */
  final case class ImageInfo(id: Long, format: String, width: Int, height: Int)

  /** Parse image-container headers (PNG IHDR, JPEG SOF, GIF logical
    * screen, BMP info header) straight from the binary payload — no codec
    * library involved, so unlike the pixel decode this path is fully REAL:
    * magic-byte format detection + dimension extraction, the metadata the
    * reference stores alongside image htypes (`types.pyi:1011`). Unknown
    * or truncated payloads classify as ("unknown", -1, -1) rather than
    * failing the batch. */
  def imageInfo(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (f, w, h) = parseImageHeader(bytes)
        ImageInfo(id, f, w, h)
      })
      .toDF()
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private[graft] def parseImageHeader(b: Array[Byte]): (String, Int, Int) = {
    val n = b.length
    if (n >= 24 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      ("png", be32(b, 16), be32(b, 20))
    else if (n >= 4 && u8(b, 0) == 0xFF && u8(b, 1) == 0xD8) {
      // walk JPEG segments to the first SOFn (baseline/progressive frame)
      var i = 2
      var res: (String, Int, Int) = ("jpeg", -1, -1)
      var done = false
      while (!done && i + 9 < n) {
        if (u8(b, i) != 0xFF) i += 1
        else {
          val m = u8(b, i + 1)
          val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
          if (isSof) { res = ("jpeg", be16(b, i + 7), be16(b, i + 5)); done = true }
          else if (m == 0xD8 || (m >= 0xD0 && m <= 0xD9) || m == 0xFF) i += 2
          else i += 2 + be16(b, i + 2)
        }
      }
      res
    }
    else if (n >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      ("gif", le16(b, 6), le16(b, 8))
    else if (n >= 26 && b(0) == 'B' && b(1) == 'M')
      ("bmp", le32(b, 18), math.abs(le32(b, 22)))
    else ("unknown", -1, -1)
  }

  /** nearest-neighbor resize on a decoded image (pure Column math) */
  def resize(decoded: DataFrame, newW: Int, newH: Int): DataFrame =
    decoded.select(col("id"), lit(newW).as("width"), lit(newH).as("height"),
      col("channels"),
      transform(sequence(lit(0), lit(newW * newH - 1)), k => {
        val sy = floor(floor(k / newW) * col("height") / newH).cast("int")
        val sx = floor((k % newW) * col("width") / newW).cast("int")
        element_at(col("pixels"), (sy * col("width") + sx + 1).cast("int"))
      }).as("pixels"))

  /** feature extraction over decoded images: deterministic per-image
    * stats vector (mean/std/min/max of pixels) — the stub stands in for a
    * real embedding model; the contract (decoded frame -> fixed-width
    * float feature column, pure Column math, no shuffle) is the real one */
  def extractFeatures(decoded: DataFrame): DataFrame = {
    val xs = transform(col("pixels"), x => x.cast("double"))
    val n = size(col("pixels")).cast("double")
    val mean = aggregate(xs, lit(0.0d), (a, x) => a + x) / n
    val sumsq = aggregate(xs, lit(0.0d), (a, x) => a + x * x)
    decoded
      .withColumn("__xs", xs)
      .withColumn("features", array(
        aggregate(col("__xs"), lit(0.0d), (a, x) => a + x) / n,
        sqrt((sumsq - n * mean * mean) / n),
        array_min(col("__xs")), array_max(col("__xs"))))
      .drop("__xs")
  }

  /** frame sampling for sequence (video-like) columns: every `stride`-th
    * element of an array column, the UNGROUP/sequence analog for media */
  def sampleFrames(df: DataFrame, seqCol: String, stride: Int): DataFrame =
    df.withColumn(s"${seqCol}_sampled",
      filter(transform(col(seqCol), (x, i) => when(i % stride === 0, x)),
        x => x.isNotNull))
}
