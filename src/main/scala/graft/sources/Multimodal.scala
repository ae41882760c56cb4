package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Multimodal column plumbing (SURVEY.md §1.3: Image/Video/Audio htypes
  * are binary payloads + typed metadata over physical columns;
  * `cpp/deeplake_core/type.hpp:43-63`, `types.pyi:1011` Image).
  *
  * Pixel decode is REAL: [[decodeImages]] reads PNG/JPEG/GIF/BMP through
  * the JDK's built-in `javax.imageio` (no external codec library), as a
  * per-partition batch via Dataset.mapPartitions (the Scala analog of
  * mapInPandas batch UDFs; reference codec layer:
  * `cpp/codecs/compression.hpp`). [[imageInfo]] additionally parses
  * container headers directly (format detection + dimensions) without
  * instantiating pixels — the metadata fast path.
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

  /** REAL pixel decode via the JDK's built-in `javax.imageio`
    * (PNG/JPEG/GIF/BMP/WBMP — no external codec library required).
    * Pixels come out channel-interleaved, row-major, scaled to [0,1] by
    * the sample bit depth; palette (indexed-color) images are expanded
    * to 3-channel RGB. Payloads ImageIO cannot decode yield
    * (width=-1, height=-1, channels=0, pixels=[]) rather than failing
    * the whole batch — a corrupt sample in a 100-TB corpus must not
    * kill the job. */
  def decodeImages(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeOne(id, bytes) })
      .toDF()
  }

  private[graft] def decodeOne(id: Long, bytes: Array[Byte]): DecodedImage = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) DecodedImage(id, -1, -1, 0, Array.empty[Float])
    else {
      val w = img.getWidth
      val h = img.getHeight
      if (img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]) {
        // palette image: raster samples are palette INDICES, not colors —
        // expand through the color model to RGB
        val px = new Array[Float](w * h * 3)
        var y = 0
        var i = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            px(i) = ((rgb >> 16) & 0xFF) / 255.0f
            px(i + 1) = ((rgb >> 8) & 0xFF) / 255.0f
            px(i + 2) = (rgb & 0xFF) / 255.0f
            i += 3
            x += 1
          }
          y += 1
        }
        DecodedImage(id, w, h, 3, px)
      } else {
        val raster = img.getRaster
        val c = raster.getNumBands
        // getPixels returns samples in band order (R,G,B[,A] even for
        // BGR-stored images); normalize by the band's bit depth so
        // 16-bit PNGs also land in [0,1]
        val maxSample = ((1L << raster.getSampleModel.getSampleSize(0)) - 1).toFloat
        val row = new Array[Int](w * c)
        val px = new Array[Float](w * h * c)
        var y = 0
        var i = 0
        while (y < h) {
          raster.getPixels(0, y, w, 1, row)
          var j = 0
          while (j < w * c) { px(i) = row(j) / maxSample; i += 1; j += 1 }
          y += 1
        }
        DecodedImage(id, w, h, c, px)
      }
    }
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
          if (m == 0xFF) i += 1 // fill byte: 0xFF pads until the real marker
          else if (isSof) { res = ("jpeg", be16(b, i + 7), be16(b, i + 5)); done = true }
          else if (m == 0xD9) done = true // EOI with no frame seen
          else if (m == 0x00) i += 2 // stuffed literal 0xFF in entropy data
          else if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) i += 2 // standalone
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

  /** nearest-neighbor resize on a decoded image (pure Column math over
    * the channel-interleaved pixel layout) */
  def resize(decoded: DataFrame, newW: Int, newH: Int): DataFrame =
    decoded.select(col("id"), lit(newW).as("width"), lit(newH).as("height"),
      col("channels"),
      transform(sequence(lit(0), lit(newW * newH) * col("channels") - 1), k => {
        val c = col("channels")
        val pix = floor(k / c).cast("int") // destination pixel index
        val ch = k % c
        val sy = floor(floor(pix / newW) * col("height") / newH).cast("int")
        val sx = floor((pix % newW) * col("width") / newW).cast("int")
        element_at(col("pixels"),
          ((sy * col("width") + sx) * c + ch + 1).cast("int"))
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
