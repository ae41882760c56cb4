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

  /** Stamp a flat tensor column with its logical 2-d dims as "shape"
    * column metadata — the engine's form of the reference's htype dims
    * (`cpp/heimdall_common/spatial_column.hpp:19`): EXPAND BY reads it
    * to tile rectangular tensors. Metadata rides the schema, so it
    * survives projections that keep the column and costs nothing at
    * execution time. */
  def withShape(df: DataFrame, tensorCol: String, rows: Int, cols: Int): DataFrame = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(df.schema(tensorCol).metadata)
      .putLongArray("shape", Array(rows.toLong, cols.toLong)).build()
    df.withColumn(tensorCol, col(tensorCol).as(tensorCol, meta))
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
    val (w, h, c, px) = decodePixels(bytes)
    DecodedImage(id, w, h, c, px)
  }

  /** (width, height, channels, pixels) or (-1, -1, 0, empty) when
    * ImageIO cannot decode the payload — the shared pixel path behind
    * [[decodeImages]] and [[decodeVideoFrames]]. */
  private[graft] def decodePixels(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    imagePixels(img)
  }

  /** the BufferedImage → normalized-pixel conversion shared by the
    * single-image and per-frame decoders; null → the corrupt sentinel */
  private[graft] def imagePixels(img: java.awt.image.BufferedImage): (Int, Int, Int, Array[Float]) = {
    if (img == null) (-1, -1, 0, Array.empty[Float])
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
        (w, h, 3, px)
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
        (w, h, c, px)
      }
    }
  }

  /** Link-htype resolution (reference `python/deeplake/types.pyi:1038`:
    * a Link column stores a URL/path; the reader dereferences it to the
    * linked sample's bytes at read time, with per-query credentials —
    * `cpp/storage/provider_base.hpp`). The Spark-native shape: a
    * per-partition Hadoop-FS fetch — each task resolves its links
    * through `FileSystem` handles (cached per scheme by Hadoop), so
    * any configured scheme (file:, hdfs:, s3a:, …) works, batched and
    * distributed, never a driver-side loop.
    *
    * `hadoopOpts` are per-CALL conf overrides (access keys, endpoints —
    * the same map `Tql.Options.storageOptions` feeds FROM-"url" scans)
    * layered over the session's Hadoop conf; other queries never see
    * them. Corrupt tolerance matches the decoders: a NULL/missing/
    * unreadable/oversized link yields a NULL payload instead of failing
    * the batch — the downstream decoders already classify NULL payloads
    * as corrupt samples. */
  def resolveLinks(df: DataFrame, linkCol: String,
      payloadCol: String = "payload",
      hadoopOpts: Map[String, String] = Map.empty,
      maxBytes: Long = 256L * 1024 * 1024): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.BinaryType
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    hadoopOpts.foreach { case (k, v) => conf.set(k, v) }
    val bc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    val linkIdx = df.schema.fieldIndex(linkCol)
    val outSchema = df.schema.add(payloadCol, BinaryType, nullable = true)
    val fetched = df.rdd.mapPartitions { it =>
      val hconf = bc.value.value
      it.map { row =>
        val link = row.get(linkIdx) match {
          case null => null
          case s => s.toString
        }
        val bytes: Array[Byte] =
          if (link == null) null
          else try {
            val path = new org.apache.hadoop.fs.Path(link)
            val fs = path.getFileSystem(hconf)
            val st = fs.getFileStatus(path)
            if (st.getLen > maxBytes) null
            else {
              val in = fs.open(path)
              try {
                val buf = new Array[Byte](st.getLen.toInt)
                in.readFully(0, buf)
                buf
              } finally in.close()
            }
          } catch { case _: Exception => null }
        Row.fromSeq(row.toSeq :+ bytes)
      }
    }
    spark.createDataFrame(fetched, outSchema)
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
    else if (n >= 16 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') {
      // WebP (the dominant modern crawl format): three payload flavors
      val cc = new String(b, 12, 4, "US-ASCII")
      if (cc == "VP8 " && n >= 30 &&
          u8(b, 23) == 0x9D && u8(b, 24) == 0x01 && u8(b, 25) == 0x2A)
        ("webp", le16(b, 26) & 0x3FFF, le16(b, 28) & 0x3FFF) // lossy: sync code then 14-bit dims
      else if (cc == "VP8L" && n >= 25 && u8(b, 20) == 0x2F) {
        // lossless: 14-bit width-1 then 14-bit height-1, bit-packed LE
        val w = (u8(b, 21) | ((u8(b, 22) & 0x3F) << 8)) + 1
        val h = ((u8(b, 22) >> 6) | (u8(b, 23) << 2) | ((u8(b, 24) & 0x0F) << 10)) + 1
        ("webp", w, h)
      } else if (cc == "VP8X" && n >= 30) {
        // extended: 24-bit canvas width-1 / height-1
        val w = (u8(b, 24) | (u8(b, 25) << 8) | (u8(b, 26) << 16)) + 1
        val h = (u8(b, 27) | (u8(b, 28) << 8) | (u8(b, 29) << 16)) + 1
        ("webp", w, h)
      } else ("webp", -1, -1)
    }
    else if (n >= 8 && ((b(0) == 'I' && b(1) == 'I' && u8(b, 2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && u8(b, 3) == 42))) {
      // TIFF: walk the first IFD for ImageWidth(256)/ImageLength(257);
      // SHORT values sit in the HIGH-order-first position under MM
      val le = b(0) == 'I'
      def r16(i: Int) = if (le) le16(b, i) else be16(b, i)
      def r32(i: Int) = if (le) le32(b, i) else be32(b, i)
      val ifd = r32(4)
      var w = -1; var h = -1
      if (ifd >= 8 && ifd + 2 <= n) {
        val cnt = r16(ifd)
        var e = 0
        while (e < cnt && ifd + 2 + 12 * (e + 1) <= n) {
          val off = ifd + 2 + 12 * e
          val tag = r16(off); val typ = r16(off + 2)
          val v =
            if (typ == 3) r16(off + 8)      // SHORT: first two value bytes
            else if (typ == 4) r32(off + 8) // LONG
            else -1
          if (tag == 256) w = v else if (tag == 257) h = v
          e += 1
        }
      }
      ("tiff", w, h)
    }
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

  /** 64-bit average-hash (aHash) perceptual fingerprint over decoded
    * images: downsample to 8x8 via [[resize]], gray = channel mean per
    * cell, bit k = (gray(k) >= image mean). Returns (id, bits) with
    * `bits` an array<int> of 64 0/1 flags — the form the banded hamming
    * pair join ([[graft.operators.Dedup.hammingNearDupPairs]]) and the
    * HAMMING_DISTANCE kernel consume directly. Undecodable images
    * (channels=0) drop: no pixels, no fingerprint.
    *
    * Pure Column math over the decoded frame — no shuffle, no UDF; the
    * gray array is staged once so the mean and the bit pass don't each
    * re-run the channel fold. */
  def aHash64(decoded: DataFrame): DataFrame = {
    val small = resize(decoded.filter(col("channels") > 0), 8, 8)
    val c = col("channels")
    val gray = transform(sequence(lit(0), lit(63)), k =>
      aggregate(sequence(lit(0), c - 1), lit(0.0d),
        (a, ch) => a + element_at(col("pixels"), (k * c + ch + 1).cast("int"))) / c)
    small
      .withColumn("__g", gray)
      .withColumn("__m", aggregate(col("__g"), lit(0.0d), (a, x) => a + x) / 64.0d)
      .select(col("id"),
        transform(col("__g"), x => when(x >= col("__m"), 1).otherwise(0))
          .cast("array<tinyint>").as("bits"))
  }

  /** frame sampling for sequence (video-like) columns: every `stride`-th
    * element of an array column, the UNGROUP/sequence analog for media */
  def sampleFrames(df: DataFrame, seqCol: String, stride: Int): DataFrame =
    df.withColumn(s"${seqCol}_sampled",
      filter(transform(col(seqCol), (x, i) => when(i % stride === 0, x)),
        x => x.isNotNull))

  // ------------------------------------------------------------- audio

  /** decoded-audio row: per-clip signal features the real pipeline would
    * feed a filter/embedding stage (duration, loudness, zero-crossing
    * rate — the standard cheap audio-quality screens), plus a 64-window
    * RMS energy contour (the loudness envelope [[audioFingerprint64]]
    * hashes for perceptual near-dup) */
  final case class DecodedAudio(id: Long, sample_rate: Int, n_channels: Int,
      n_frames: Long, duration_s: Double, rms: Double, zcr: Double,
      peak: Double, contour: Array[Double])

  /** REAL audio decode via the JDK's built-in `javax.sound.sampled`
    * (WAV/AIFF/AU PCM — no external codec library): per-partition batch
    * decode to a mono mix, emitting per-clip features. Compressed
    * codecs (mp3/ogg/aac) are outside the JDK; those payloads yield
    * sample_rate=-1 rows instead of failing the batch (same corrupt-
    * sample posture as [[decodeImages]]). */
  def decodeAudio(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeAudioOne(id, bytes) })
      .toDF()
  }

  private[graft] def decodeAudioOne(id: Long, bytes: Array[Byte]): DecodedAudio = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      require(enc == AudioFormat.Encoding.PCM_SIGNED ||
        enc == AudioFormat.Encoding.PCM_UNSIGNED, s"non-PCM encoding $enc")
      val bits = fmt.getSampleSizeInBits
      require(bits == 8 || bits == 16, s"unsupported sample size $bits")
      val ch = fmt.getChannels
      val frameSize = fmt.getFrameSize
      val data = ais.readAllBytes()
      val n = data.length / frameSize
      val bytesPerSample = bits / 8
      var i = 0
      var sumSq = 0.0; var peak = 0.0; var crossings = 0L; var prevSign = 0
      val winSq = new Array[Double](64)
      val winN = new Array[Long](64)
      while (i < n) {
        var c = 0
        var mix = 0.0
        while (c < ch) {
          val o = i * frameSize + c * bytesPerSample
          val v =
            if (bits == 8) {
              if (enc == AudioFormat.Encoding.PCM_UNSIGNED) ((data(o) & 0xFF) - 128) / 128.0
              else data(o) / 128.0
            } else {
              val (lo, hi) = if (fmt.isBigEndian) (o + 1, o) else (o, o + 1)
              (((data(hi) << 8) | (data(lo) & 0xFF)).toShort) / 32768.0
            }
          mix += v
          c += 1
        }
        mix /= ch
        sumSq += mix * mix
        val w = (i.toLong * 64 / n).toInt
        winSq(w) += mix * mix
        winN(w) += 1
        if (math.abs(mix) > peak) peak = math.abs(mix)
        val sign = if (mix > 0) 1 else if (mix < 0) -1 else prevSign
        if (prevSign != 0 && sign != 0 && sign != prevSign) crossings += 1
        if (sign != 0) prevSign = sign
        i += 1
      }
      val rate = fmt.getSampleRate.toInt
      val contour = Array.tabulate(64)(k =>
        if (winN(k) > 0) math.sqrt(winSq(k) / winN(k)) else 0.0)
      DecodedAudio(id, rate, ch, n.toLong,
        if (rate > 0) n.toDouble / rate else 0.0,
        if (n > 0) math.sqrt(sumSq / n) else 0.0,
        if (n > 1) crossings.toDouble / (n - 1) else 0.0, peak,
        if (n >= 64) contour else Array.empty[Double])
    } catch {
      case _: Exception =>
        DecodedAudio(id, -1, 0, 0L, 0.0, 0.0, 0.0, 0.0, Array.empty[Double])
    }
  }

  final case class SsimRow(id: Long, width: Int, height: Int, ssim: Double)

  /** Structural similarity (SSIM, Wang et al. 2004) between two image
    * payloads carried on the same row — the perceptual near-dup /
    * re-encode detector a pixel-diff or [[aHash64]] Hamming bucket
    * hands its candidate pairs to for exact scoring. Global SSIM on
    * the luminance channel with the standard constants (K1=0.01,
    * K2=0.03 on unit dynamic range):
    * ((2μaμb+C1)(2σab+C2)) / ((μa²+μb²+C1)(σa²+σb²+C2)) ∈ [−1, 1];
    * 1 iff pixel-identical. Mismatched dimensions or an undecodable
    * side yield ssim = −2 with width/height = −1 (the corrupt-sample
    * posture — the row survives, the score is impossible).
    *
    * REAL decode via ImageIO (PNG/JPEG/GIF/BMP — the same
    * [[decodePixels]] path as [[decodeImages]]); luminance is the
    * channel mean. mapPartitions because bytes need a JVM decoder;
    * one pass over the pair table, no shuffle. */
  def ssimPairs(df: DataFrame, idCol: String, aCol: String,
      bCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(aCol), col(bCol))
      .as[(Long, Array[Byte], Array[Byte])]
      .mapPartitions(_.map { case (id, a, b) => ssimOne(id, a, b) })
      .toDF()
  }

  private[graft] def ssimOne(id: Long, a: Array[Byte], b: Array[Byte]): SsimRow = {
    val (wa, ha, ca, pa) = decodePixels(a)
    val (wb, hb, cb, pb) = decodePixels(b)
    if (wa <= 0 || wb <= 0 || wa != wb || ha != hb) SsimRow(id, -1, -1, -2.0)
    else {
      val n = wa * ha
      def lum(px: Array[Float], ch: Int, i: Int): Double = {
        var c = 0; var s = 0.0
        while (c < ch) { s += px(i * ch + c); c += 1 }
        s / ch
      }
      var sa = 0.0; var sb = 0.0
      var i = 0
      while (i < n) { sa += lum(pa, ca, i); sb += lum(pb, cb, i); i += 1 }
      val ma = sa / n; val mb = sb / n
      var va = 0.0; var vb = 0.0; var cov = 0.0
      i = 0
      while (i < n) {
        val da = lum(pa, ca, i) - ma
        val db = lum(pb, cb, i) - mb
        va += da * da; vb += db * db; cov += da * db
        i += 1
      }
      va /= n; vb /= n; cov /= n
      val c1 = 0.01 * 0.01; val c2 = 0.03 * 0.03
      val ssim = ((2 * ma * mb + c1) * (2 * cov + c2)) /
        ((ma * ma + mb * mb + c1) * (va + vb + c2))
      SsimRow(id, wa, ha, round6(ssim))
    }
  }

  /** SSIM-CONFIRMED perceptual near-dup — the image analog of the
    * MinHash-propose → Jaccard-verify text pipeline: [[aHash64]]
    * Hamming buckets PROPOSE candidate pairs through the pigeonhole-
    * banded, salt-guarded pair join (never all-pairs), and exact SSIM
    * on the real decoded pixels CONFIRMS (ssim ≥ tau). An aHash
    * collision between structurally different images dies at the
    * verify step exactly like a banded-MinHash false positive dies at
    * the Jaccard check; feed the verified pairs to
    * [[graft.operators.Dedup.connectedComponents]] for keeper
    * selection. Mismatched-dimension or undecodable candidates score
    * ssim = −2 and drop at the threshold.
    *
    * Scale shape: fingerprint + banded join propose O(near-dup) pairs;
    * only PROPOSED pairs decode for SSIM (payloads rejoin by id — two
    * hash joins, then one map pass). Returns (id_a, id_b, dist, ssim)
    * with ssim ≥ tau. */
  def perceptualNearDupPairs(images: DataFrame, idCol: String,
      payloadCol: String = "payload", maxHamming: Int = 6,
      tau: Double = 0.9): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    val payloads = images.select(col(idCol).cast("long").as("id"),
      col(payloadCol).as("__p"))
    val fps = aHash64(decodeImages(images, idCol, payloadCol))
    val cand = graft.operators.Dedup
      .hammingNearDupPairs(fps, "id", "bits", maxHamming)
    cand
      .join(payloads.select(col("id").as("id_a"), col("__p").as("__pa")), "id_a")
      .join(payloads.select(col("id").as("id_b"), col("__p").as("__pb")), "id_b")
      .select(col("id_a"), col("id_b"), col("dist"), col("__pa"), col("__pb"))
      .as[(Long, Long, Int, Array[Byte], Array[Byte])]
      .mapPartitions(_.map { case (a, b, d, pa, pb) =>
        (a, b, d, ssimOne(0L, pa, pb).ssim) })
      .toDF("id_a", "id_b", "dist", "ssim")
      .filter(col("ssim") >= tau)
  }

  final case class AudioSpectral(id: Long, sample_rate: Int,
      n_frames: Long, dominant_hz: Double, centroid_hz: Double,
      rolloff_hz: Double, flatness: Double)

  /** REAL spectral features over decoded PCM (WAV/AIFF/AU via the JDK,
    * same decode posture as [[decodeAudio]]): per clip, the Goertzel
    * power at 64 log-spaced analysis frequencies (40 Hz .. Nyquist)
    * over the first `maxFrames` mono samples, reduced to
    *  - dominant_hz: argmax-power frequency (the pitch-ish peak)
    *  - centroid_hz: power-weighted mean frequency (brightness — the
    *    standard spectral centroid)
    *  - rolloff_hz: lowest analysis frequency containing 85% of the
    *    cumulative power
    *  - flatness: geometric/arithmetic power mean ratio in [0,1]
    *    (≈1 white noise, ≈0 pure tone) — the tonality screen
    * Goertzel evaluates each bin in O(n) with no FFT dependency; 64
    * bins × `maxFrames` caps per-clip cost regardless of clip length.
    * Undecodable/compressed payloads yield sample_rate=-1 rows (the
    * corrupt-sample posture). mapPartitions because bytes need a JVM
    * decoder; one pass, no shuffle. */
  def audioSpectral(df: DataFrame, idCol: String,
      payloadCol: String = "payload", maxFrames: Int = 65536): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        audioSpectralOne(id, bytes, maxFrames) })
      .toDF()
  }

  private[graft] def audioSpectralOne(id: Long, bytes: Array[Byte],
      maxFrames: Int): AudioSpectral = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      require(enc == AudioFormat.Encoding.PCM_SIGNED ||
        enc == AudioFormat.Encoding.PCM_UNSIGNED, s"non-PCM encoding $enc")
      val bits = fmt.getSampleSizeInBits
      require(bits == 8 || bits == 16, s"unsupported sample size $bits")
      val ch = fmt.getChannels
      val frameSize = fmt.getFrameSize
      val rate = fmt.getSampleRate.toDouble
      val bytesPerSample = bits / 8
      val data = ais.readNBytes(frameSize * maxFrames)
      val n = data.length / frameSize
      val mono = new Array[Double](n)
      var i = 0
      while (i < n) {
        var c = 0; var mix = 0.0
        while (c < ch) {
          val o = i * frameSize + c * bytesPerSample
          val v =
            if (bits == 8) {
              if (enc == AudioFormat.Encoding.PCM_UNSIGNED) ((data(o) & 0xFF) - 128) / 128.0
              else data(o) / 128.0
            } else {
              val (lo, hi) = if (fmt.isBigEndian) (o + 1, o) else (o, o + 1)
              (((data(hi) << 8) | (data(lo) & 0xFF)).toShort) / 32768.0
            }
          mix += v; c += 1
        }
        mono(i) = mix / ch
        i += 1
      }
      // 64 log-spaced bins from 40 Hz to Nyquist; Goertzel power each
      val nyquist = rate / 2.0
      val f0 = 40.0
      val nBins = 64
      val freqs = Array.tabulate(nBins)(k =>
        f0 * math.pow(nyquist / f0, k.toDouble / (nBins - 1)))
      val power = freqs.map { f =>
        val w = 2.0 * math.Pi * f / rate
        val coeff = 2.0 * math.cos(w)
        var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
        var j = 0
        while (j < n) {
          s0 = mono(j) + coeff * s1 - s2
          s2 = s1; s1 = s0
          j += 1
        }
        val p = s1 * s1 + s2 * s2 - coeff * s1 * s2
        if (p > 0) p / math.max(1, n) else 0.0
      }
      val tot = power.sum
      if (n == 0 || tot <= 0)
        AudioSpectral(id, rate.toInt, n.toLong, 0.0, 0.0, 0.0, 0.0)
      else {
        val dominant = freqs(power.indexOf(power.max))
        val centroid = freqs.zip(power).map { case (f, p) => f * p }.sum / tot
        var cum = 0.0
        val rolloff = freqs.zip(power).collectFirst {
          case (f, p) if { cum += p; cum >= 0.85 * tot } => f
        }.getOrElse(freqs.last)
        val gm = math.exp(power.map(p => math.log(math.max(p, 1e-300))).sum / nBins)
        val am = tot / nBins
        AudioSpectral(id, rate.toInt, n.toLong,
          round6(dominant), round6(centroid), round6(rolloff),
          round6(if (am > 0) gm / am else 0.0))
      }
    } catch {
      case _: Exception => AudioSpectral(id, -1, 0L, 0.0, 0.0, 0.0, 0.0)
    }
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble

  /** 64-bit perceptual audio fingerprint: bit k = (window-k RMS >= clip
    * mean RMS) over the 64-window loudness envelope — pitch-invariant,
    * envelope-sensitive, the audio analog of [[aHash64]]. Same contract:
    * (id, bits array<tinyint>) feeding
    * [[graft.operators.Dedup.hammingNearDupPairs]] and the
    * HAMMING_DISTANCE kernel; undecodable or sub-64-frame clips drop. */
  def audioFingerprint64(decoded: DataFrame): DataFrame =
    decoded.filter(col("sample_rate") > 0 && size(col("contour")) === 64)
      .withColumn("__m",
        aggregate(col("contour"), lit(0.0d), (a, x) => a + x) / 64.0d)
      .select(col("id"),
        transform(col("contour"), x => when(x >= col("__m"), 1).otherwise(0))
          .cast("array<tinyint>").as("bits"))

  /** Envelope-confirmed perceptual AUDIO near-dup — the audio member of
    * the propose-verify family next to [[perceptualNearDupPairs]] and
    * the MinHash→Jaccard text pipeline: [[audioFingerprint64]] Hamming
    * buckets PROPOSE candidate pairs (pigeonhole-banded, salted — no
    * all-pairs) and the Pearson correlation of the two 64-window
    * loudness contours CONFIRMS (ρ ≥ tau). A re-encoded, re-normalized
    * or pitch-shifted copy keeps its envelope SHAPE (correlation is
    * offset/scale-invariant), while a different-shape clip whose
    * above/below-mean bit pattern happens to collide dies at the
    * verify step. Constant-envelope clips (zero contour variance) have
    * no shape to confirm and never pair.
    *
    * Scale shape: one decode pass (checkpointed — fingerprints and the
    * verify join both read it), the banded pair join, then map-side
    * correlation over 64-element arrays (staged sums — no per-element
    * recompute). Returns (id_a, id_b, dist, contour_corr ≥ tau). */
  def audioNearDupPairs(clips: DataFrame, idCol: String,
      payloadCol: String = "payload", maxHamming: Int = 6,
      tau: Double = 0.99): DataFrame = {
    val decoded = decodeAudio(clips, idCol, payloadCol)
      .filter(col("sample_rate") > 0 && size(col("contour")) === 64)
      .select(col("id"), col("sample_rate"), col("contour"))
      .localCheckpoint()
    val fps = audioFingerprint64(decoded)
    val cand = graft.operators.Dedup
      .hammingNearDupPairs(fps, "id", "bits", maxHamming)
    def s1(c: org.apache.spark.sql.Column) =
      aggregate(c, lit(0.0d), (a, x) => a + x)
    def s2(c: org.apache.spark.sql.Column) =
      aggregate(c, lit(0.0d), (a, x) => a + x * x)
    val joined = cand
      .join(decoded.select(col("id").as("id_a"), col("contour").as("__ca")), "id_a")
      .join(decoded.select(col("id").as("id_b"), col("contour").as("__cb")), "id_b")
      .withColumn("__sa", s1(col("__ca"))).withColumn("__sb", s1(col("__cb")))
      .withColumn("__saa", s2(col("__ca"))).withColumn("__sbb", s2(col("__cb")))
      .withColumn("__sab", s1(zip_with(col("__ca"), col("__cb"), (x, y) => x * y)))
    val n = lit(64.0)
    val va = n * col("__saa") - col("__sa") * col("__sa")
    val vb = n * col("__sbb") - col("__sb") * col("__sb")
    joined
      .withColumn("contour_corr",
        when(va > 0 && vb > 0,
          round((n * col("__sab") - col("__sa") * col("__sb")) /
            sqrt(va * vb), 6)))
      .filter(col("contour_corr") >= tau)
      .select(col("id_a"), col("id_b"), col("dist"), col("contour_corr"))
  }

  /** metadata fast path for audio: parse the container header directly
    * (WAV chunk walk, FLAC STREAMINFO, OGG Vorbis/Opus id header, MP3
    * first frame — channels, sample rate, bit depth, frame count →
    * duration) without touching the payload — the audio analog of
    * [[imageInfo]]'s header-only walk. MP3/OGG durations report 0 (a
    * frame scan is not a header fast path). */
  def audioInfo(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        val (fmtName, ch, rate, bits, frames) = parseAudioHeader(b)
        (id, fmtName, ch, rate, bits, frames,
          if (rate > 0) frames.toDouble / rate else 0.0)
      })
      .toDF("id", "format", "n_channels", "sample_rate", "bits_per_sample",
        "n_frames", "duration_s")
  }

  /** ("wav", channels, sampleRate, bits, frames), or ("unknown", 0...) */
  private[graft] def parseWavHeader(b: Array[Byte]): (String, Int, Int, Int, Long) = {
    def fourcc(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b.length < 44 || fourcc(0) != "RIFF" || fourcc(8) != "WAVE")
      return ("unknown", 0, 0, 0, 0L)
    var i = 12
    var ch = 0; var rate = 0; var bits = 0; var dataLen = -1L
    while (i + 8 <= b.length && (dataLen < 0 || ch == 0)) {
      val id = fourcc(i)
      val size = le32(b, i + 4).toLong & 0xFFFFFFFFL
      if (id == "fmt " && i + 24 <= b.length) {
        ch = le16(b, i + 10)
        rate = le32(b, i + 12)
        bits = le16(b, i + 22)
      } else if (id == "data") dataLen = size
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (ch == 0 || bits == 0) ("unknown", 0, 0, 0, 0L)
    else ("wav", ch, rate, bits,
      if (dataLen >= 0) dataLen / (ch.toLong * (bits / 8)) else 0L)
  }

  /** header dispatch across the audio formats a crawl actually serves:
    * WAV (RIFF chunk walk), FLAC (STREAMINFO bitfields), OGG (first-page
    * Vorbis/Opus id header), MP3 (ID3v2 skip + first frame header).
    * Frame counts are exact for WAV/FLAC (carried in the header) and 0
    * for MP3/OGG (a full-payload frame scan — deliberately not a
    * header fast path). Corrupt payloads degrade to ("unknown",0,0,0,0). */
  private[graft] def parseAudioHeader(b: Array[Byte]): (String, Int, Int, Int, Long) = {
    val n = b.length
    val wav = parseWavHeader(b)
    if (wav._1 != "unknown") wav
    else if (n >= 26 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C' &&
        (u8(b, 4) & 0x7F) == 0) {
      // STREAMINFO: rate 20 bits / channels-1 3 / bits-1 5 / samples 36
      val rate = (u8(b, 18) << 12) | (u8(b, 19) << 4) | (u8(b, 20) >> 4)
      val ch = ((u8(b, 20) >> 1) & 0x7) + 1
      val bits = (((u8(b, 20) & 1) << 4) | (u8(b, 21) >> 4)) + 1
      val frames = ((u8(b, 21) & 0x0F).toLong << 32) |
        ((u8(b, 22).toLong << 24) | (u8(b, 23) << 16) | (u8(b, 24) << 8) | u8(b, 25))
      if (rate == 0) ("flac", 0, 0, 0, 0L) else ("flac", ch, rate, bits, frames)
    }
    else if (n >= 28 && b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S' && b(4) == 0) {
      val nsegs = u8(b, 26)
      val p = 27 + nsegs // first packet (the codec id header)
      if (p + 19 <= n && b(p) == 1 && new String(b, p + 1, 6, "US-ASCII") == "vorbis")
        ("ogg", u8(b, p + 11), le32(b, p + 12), 0, 0L)
      else if (p + 16 <= n && new String(b, p, 8, "US-ASCII") == "OpusHead")
        ("ogg", u8(b, p + 9), le32(b, p + 12), 0, 0L)
      else ("ogg", 0, 0, 0, 0L)
    }
    else {
      // MP3: skip an ID3v2 tag (syncsafe 28-bit size), then read the
      // first frame header's version/samplerate/mode fields
      var i = 0
      if (n >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
        i = 10 + ((u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9))
      if (i + 4 <= n && u8(b, i) == 0xFF && (u8(b, i + 1) & 0xE0) == 0xE0) {
        val ver = (u8(b, i + 1) >> 3) & 0x3   // 3=MPEG1 2=MPEG2 0=MPEG2.5
        val layer = (u8(b, i + 1) >> 1) & 0x3 // 1 = Layer III
        val rIdx = (u8(b, i + 2) >> 2) & 0x3
        val rates = ver match {
          case 3 => Array(44100, 48000, 32000)
          case 2 => Array(22050, 24000, 16000)
          case 0 => Array(11025, 12000, 8000)
          case _ => Array(0, 0, 0)
        }
        val rate = if (rIdx < 3) rates(rIdx) else 0
        val ch = if (((u8(b, i + 3) >> 6) & 0x3) == 3) 1 else 2
        val bIdx = u8(b, i + 2) >> 4 // free (0) and bad (15) rejected:
        // the sync word alone is weak magic, so every frame field must
        // be coherent before claiming mp3
        if (layer == 1 && rate > 0 && bIdx >= 1 && bIdx <= 14)
          ("mp3", ch, rate, 0, 0L)
        else ("unknown", 0, 0, 0, 0L)
      } else ("unknown", 0, 0, 0, 0L)
    }
  }

  // -------------------------------------------------- document containers

  /** PDF + compressed-container magic classification — the payload
    * kinds a crawl actually stores besides media: returns (format,
    * pages) with pages >= 0 only for PDFs whose page tree is scannable.
    * PDF pages count "/Type /Page" leaf objects (any inter-token
    * whitespace, "/Pages" tree nodes excluded, and a PDF delimiter
    * required after the token so "/PageLabels" never counts).
    * `stream`…`endstream` payloads are skipped — compressed content
    * bytes can never contribute — EXCEPT object streams
    * (`/Type /ObjStm /Filter /FlateDecode`, the PDF-1.5+ default home
    * of page objects), which are inflated and their object dicts
    * counted; the root page tree's `/Count` is kept as a cross-check
    * fallback when no leaf is visible → −1 only when the tree is
    * truly unscannable. Pure byte walks + zlib, map-side. */
  private[graft] def parseContainer(b: Array[Byte]): (String, Int) = {
    val n = b.length
    def ascii(i: Int, s: String): Boolean =
      i + s.length <= n && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)
    if (ascii(0, "%PDF-")) ("pdf", pdfPages(b))
    else if (n >= 2 && u8(b, 0) == 0x1F && u8(b, 1) == 0x8B) ("gzip", -1)
    else if (n >= 4 && u8(b, 0) == 0x28 && u8(b, 1) == 0xB5 &&
      u8(b, 2) == 0x2F && u8(b, 3) == 0xFD) ("zstd", -1)
    else if (n >= 4 && b(0) == 'P' && b(1) == 'K' &&
      ((u8(b, 2) == 3 && u8(b, 3) == 4) || (u8(b, 2) == 5 && u8(b, 3) == 6) ||
        (u8(b, 2) == 7 && u8(b, 3) == 8))) ("zip", -1)
    else if (n >= 6 && u8(b, 0) == 0xFD && ascii(1, "7zXZ") && b(5) == 0) ("xz", -1)
    else if (n >= 4 && ascii(0, "BZh") && b(3) >= '1' && b(3) <= '9') ("bzip2", -1)
    else if (n >= 262 && ascii(257, "ustar")) ("tar", -1)
    else ("unknown", -1)
  }

  /** PDF leaf-page count (see [[parseContainer]]), or the page tree's
    * max `/Count` when no leaf dict is visible, or −1. */
  private[graft] def pdfPages(b: Array[Byte]): Int = {
    val n = b.length
    var pages = 0
    var maxCount = -1 // /Count appears on every /Pages node; the root's
    // (= the document total) is the max over intermediate nodes
    def isWs(c: Byte): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
    // PDF delimiters: token boundary after a name like /Page
    def isDelim(c: Byte): Boolean = isWs(c) || c == '/' || c == '>' ||
      c == '<' || c == '[' || c == ']' || c == '(' || c == ')' || c == '%'
    def scan(buf: Array[Byte], from: Int, to: Int): Unit = {
      def a(i: Int, s: String): Boolean =
        i + s.length <= to && s.indices.forall(j => buf(i + j) == s.charAt(j).toByte)
      var i = from
      while (i < to) {
        if (buf(i) == '/' && a(i, "/Type")) {
          var j = i + 5
          while (j < to && isWs(buf(j))) j += 1
          if (a(j, "/Pages") && (j + 6 >= to || isDelim(buf(j + 6)))) i = j + 6
          else if (a(j, "/Page") && (j + 5 >= to || isDelim(buf(j + 5)))) {
            pages += 1; i = j + 5
          } else i = j
        } else if (buf(i) == '/' && a(i, "/Count") &&
            (i + 6 >= to || isDelim(buf(i + 6)) || isWs(buf(i + 6)))) {
          var j = i + 6
          while (j < to && isWs(buf(j))) j += 1
          var v = 0; var any = false
          while (j < to && buf(j) >= '0' && buf(j) <= '9') {
            v = v * 10 + (buf(j) - '0'); any = true; j += 1
          }
          if (any && v > maxCount) maxCount = v
          i = j
        } else i += 1
      }
    }
    def indexOf(s: String, from: Int): Int = {
      val t = s.getBytes("US-ASCII")
      var i = from
      while (i + t.length <= n) {
        var j = 0
        while (j < t.length && b(i + j) == t(j)) j += 1
        if (j == t.length) return i
        i += 1
      }
      -1
    }
    var i = 0
    var regionStart = 0 // start of the current non-stream text region
    while (i < n) {
      // the `stream` KEYWORD: delimiter before, EOL after (bare text
      // "streams" inside a name or comment never starts a payload)
      if (b(i) == 's' && i > 0 && i + 6 <= n && isDelim(b(i - 1)) &&
          b(i + 1) == 't' && b(i + 2) == 'r' && b(i + 3) == 'e' &&
          b(i + 4) == 'a' && b(i + 5) == 'm' &&
          (i + 6 >= n || b(i + 6) == '\r' || b(i + 6) == '\n')) {
        scan(b, regionStart, i)
        var p = i + 6
        if (p < n && b(p) == '\r') p += 1
        if (p < n && b(p) == '\n') p += 1
        val e = indexOf("endstream", p)
        val end = if (e < 0) n else e
        // the stream's own dict is the text since the last `obj`
        // keyword in this region — inflate + scan if it is a Flate
        // object stream (where PDF 1.5+ keeps the page dicts)
        val dictFrom = {
          var k = i - 3; var at = regionStart
          while (k >= regionStart) {
            if (b(k) == 'o' && b(k + 1) == 'b' && b(k + 2) == 'j') { at = k; k = regionStart - 1 }
            else k -= 1
          }
          at
        }
        val dict = new String(b, dictFrom, i - dictFrom, "US-ASCII")
        if (dict.contains("/ObjStm") && dict.contains("/FlateDecode")) {
          try {
            val inf = new java.util.zip.Inflater()
            inf.setInput(b, p, end - p)
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var total = 0L
            while (!inf.finished() && total < (16L << 20)) { // bomb cap
              val k = inf.inflate(buf)
              if (k == 0 && inf.needsInput()) total = 16L << 20
              else { out.write(buf, 0, k); total += k }
            }
            inf.end()
            val d = out.toByteArray
            scan(d, 0, d.length)
          } catch { case _: Exception => () } // corrupt stream: skip
        }
        i = if (e < 0) n else e + 9
        regionStart = i
      } else i += 1
    }
    scan(b, regionStart, n)
    if (pages > 0) pages
    else if (maxCount > 0) maxCount
    else -1
  }

  /** metadata fast path for document/container payloads: (id, format,
    * pages) — pdf/gzip/zstd/zip/xz/bzip2/tar by magic, PDF page count
    * when the page tree is uncompressed */
  def containerInfo(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        val (f, p) = parseContainer(b)
        (id, f, p)
      })
      .toDF("id", "format", "pages")
  }

  // ------------------------------------------------------------- video

  /** metadata fast path for video: walk the MP4/ISO-BMFF box structure
    * (pure byte parsing, no codec) for brand, movie duration
    * (moov/mvhd timescale+duration) and track dimensions (trak/tkhd
    * 16.16 fixed-point width/height). Frame DECODE needs a codec the
    * JDK does not ship — that stage stays behind [[sampleFrames]]'s
    * array contract; the container metadata here is real. */
  def videoInfo(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        val (brand, dur, w, h) = parseMp4(b)
        (id, brand, dur, w, h)
      })
      .toDF("id", "brand", "duration_s", "width", "height")
  }

  /** (brand, durationSeconds, width, height) or ("unknown", 0, -1, -1) */
  private[graft] def parseMp4(b: Array[Byte]): (String, Double, Int, Int) = {
    def fourcc(i: Int): String = new String(b, i, 4, "US-ASCII")
    var brand = "unknown"; var dur = 0.0; var w = -1; var h = -1
    def walk(from: Int, to: Int): Unit = {
      var i = from
      while (i + 8 <= to) {
        val size = be32(b, i).toLong & 0xFFFFFFFFL
        val tpe = fourcc(i + 4)
        val end = if (size == 0) to else (i + size).toInt
        if (size < 8 || end > to) return
        tpe match {
          case "ftyp" => brand = fourcc(i + 8)
          case "moov" | "trak" => walk(i + 8, end)
          case "mvhd" =>
            val v = u8(b, i + 8)
            if (v == 0 && i + 28 <= to) {
              val timescale = be32(b, i + 20)
              val duration = be32(b, i + 24).toLong & 0xFFFFFFFFL
              if (timescale > 0) dur = duration.toDouble / timescale
            } else if (v == 1 && i + 40 <= to) {
              val timescale = be32(b, i + 28)
              val duration = (be32(b, i + 32).toLong << 32) |
                (be32(b, i + 36).toLong & 0xFFFFFFFFL)
              if (timescale > 0) dur = duration.toDouble / timescale
            }
          case "tkhd" =>
            val v = u8(b, i + 8)
            // width/height are the LAST two 16.16 fields of the box
            if (end - 8 >= i + 8 && (v == 0 || v == 1)) {
              w = be32(b, end - 8) >>> 16
              h = be32(b, end - 4) >>> 16
            }
          case _ => ()
        }
        i = end
      }
    }
    if (b.length >= 8) walk(0, b.length)
    (brand, dur, w, h)
  }

  // ── video frame decode (MJPEG) ───────────────────────────────────────

  final case class VideoFrame(id: Long, frame_idx: Int, width: Int,
      height: Int, channels: Int, pixels: Array[Float])

  /** REAL frame decode for the one video codec the JVM can do natively:
    * MJPEG — JPEG-compressed frames in an MP4 or AVI container. The
    * reference decodes video through native codecs
    * (`cpp/codecs/compression.hpp`; `types.pyi:1310` Video); pure-JVM
    * parity is exactly the JPEG-in-container subset, so this resolves
    * the container's REAL frame layout — the MP4 sample tables (stsd
    * codec check, stsz sizes, stsc sample→chunk mapping, stco/co64
    * chunk offsets) or the AVI `movi` chunk list — slices each frame's
    * bytes and feeds the same ImageIO pixel path as [[decodeImages]].
    * Inter-coded codecs (H.264/VP9) need decoders the JDK lacks; those
    * payloads still surface through [[videoInfo]] metadata and the
    * [[sampleFrames]] array contract.
    *
    * `stride` samples every n-th frame (`frame_idx` keeps the original
    * numbering) — the usual training-data frame-extraction shape, and
    * it skips the DECODE of unsampled frames, not just their emission.
    * Corrupt tolerance matches [[decodeImages]]: a payload with no
    * decodable JPEG track yields ONE sentinel row (frame_idx = -1),
    * an individually corrupt frame yields its own sentinel row
    * (width = -1), and nothing fails the batch. */
  def decodeVideoFrames(df: DataFrame, idCol: String,
      payloadCol: String = "payload", stride: Int = 1): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        val spans = jpegFrameSpans(b)
        if (spans.nonEmpty)
          spans.zipWithIndex.collect {
            case ((off, len), idx) if idx % stride == 0 =>
              val (w, h, c, px) =
                decodePixels(java.util.Arrays.copyOfRange(b, off, off + len))
              VideoFrame(id, idx, w, h, c, px)
          }
        else {
          val frames = multiImageFrames(b, stride)
          if (frames.isEmpty) Seq(VideoFrame(id, -1, -1, -1, 0, Array.empty[Float]))
          else frames.map { case (idx, (w, h, c, px)) => VideoFrame(id, idx, w, h, c, px) }
        }
      })
      .toDF()
  }

  /** Frames of a multi-image payload through ImageIO's multi-image
    * readers — animated GIF and multi-page TIFF, the formats the JDK
    * ships whole-sequence decoders for. Frames come back as STORED
    * rasters (GIF delta frames are not composited onto predecessors —
    * the training-data contract is per-frame pixels, not playback).
    * Empty when the payload is not a readable image at all; a
    * SINGLE-image payload yields its one frame (a degenerate video). */
  private def multiImageFrames(b: Array[Byte],
      stride: Int): Seq[(Int, (Int, Int, Int, Array[Float]))] = {
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      catch { case _: Exception => null }
    if (iis == null) return Seq.empty
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Seq.empty
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val n = try reader.getNumImages(true) catch { case _: Exception => -1 }
        if (n <= 0) return Seq.empty
        (0 until n).collect {
          case i if i % stride == 0 =>
            i -> (try imagePixels(reader.read(i))
            catch { case _: Exception => (-1, -1, 0, Array.empty[Float]) })
        }
      } finally reader.dispose()
    } finally iis.close()
  }

  /** (offset, length) of each JPEG frame in an MJPEG MP4/AVI payload;
    * empty when the payload is neither container or has no JPEG track.
    * Any structural corruption aborts to empty rather than throwing. */
  private[graft] def jpegFrameSpans(b: Array[Byte]): Seq[(Int, Int)] =
    try {
      if (b.length >= 12 && new String(b, 0, 4, "US-ASCII") == "RIFF" &&
          new String(b, 8, 4, "US-ASCII") == "AVI ") aviJpegSpans(b)
      else mp4JpegSpans(b)
    } catch { case _: Exception => Seq.empty }

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i).toLong << 32) | (be32(b, i + 4).toLong & 0xFFFFFFFFL)

  /** Walk moov→trak→mdia→minf→stbl and resolve the sample tables of
    * every track whose stsd sample-entry fourcc is a JPEG codec. */
  private def mp4JpegSpans(b: Array[Byte]): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var isJpeg = false
    var sizes: Array[Int] = Array.empty
    var chunkOffsets: Array[Long] = Array.empty
    var sampleToChunk: Array[(Int, Int)] = Array.empty // (first_chunk 1-based, samples_per_chunk)
    def reset(): Unit = {
      isJpeg = false; sizes = Array.empty
      chunkOffsets = Array.empty; sampleToChunk = Array.empty
    }
    def flushTrack(): Unit = {
      if (isJpeg && sizes.nonEmpty && chunkOffsets.nonEmpty &&
          sampleToChunk.nonEmpty) {
        var sample = 0
        var chunk = 0 // 0-based
        var si = 0
        while (sample < sizes.length && chunk < chunkOffsets.length) {
          // stsc runs: entry si applies from its first_chunk until the
          // next entry's first_chunk (first_chunk is nondecreasing)
          while (si + 1 < sampleToChunk.length &&
              sampleToChunk(si + 1)._1 <= chunk + 1) si += 1
          val perChunk = sampleToChunk(si)._2
          var off = chunkOffsets(chunk)
          var k = 0
          while (k < perChunk && sample < sizes.length) {
            val len = sizes(sample)
            if (off >= 0 && len > 0 && off + len <= b.length)
              out += ((off.toInt, len))
            off += len
            sample += 1; k += 1
          }
          chunk += 1
        }
      }
      reset()
    }
    def walk(from: Int, to: Int): Unit = {
      var i = from
      while (i + 8 <= to) {
        val size = be32(b, i).toLong & 0xFFFFFFFFL
        val tpe = new String(b, i + 4, 4, "US-ASCII")
        val end = if (size == 0) to else (i + size).toInt
        if (size != 0 && (size < 8 || end > to)) return
        tpe match {
          case "moov" | "mdia" | "minf" | "stbl" => walk(i + 8, end)
          case "trak" => reset(); walk(i + 8, end); flushTrack()
          case "stsd" =>
            // verflags(4) entry_count(4), entry: size(4) fourcc(4) …
            if (i + 24 <= end) {
              val fmt = new String(b, i + 20, 4, "US-ASCII")
              isJpeg = fmt == "jpeg" || fmt == "mjpa" || fmt == "mjpb" ||
                fmt == "MJPG"
            }
          case "stsz" if i + 20 <= end =>
            val fixed = be32(b, i + 12)
            val n = math.min(be32(b, i + 16),
              if (fixed != 0) Int.MaxValue else (end - i - 20) / 4)
            sizes =
              if (fixed != 0) Array.fill(math.min(n, (b.length / math.max(fixed, 1)) + 1))(fixed)
              else Array.tabulate(n)(k => be32(b, i + 20 + 4 * k))
          case "stco" if i + 16 <= end =>
            val n = math.min(be32(b, i + 12), (end - i - 16) / 4)
            chunkOffsets = Array.tabulate(n)(k =>
              be32(b, i + 16 + 4 * k).toLong & 0xFFFFFFFFL)
          case "co64" if i + 16 <= end =>
            val n = math.min(be32(b, i + 12), (end - i - 16) / 8)
            chunkOffsets = Array.tabulate(n)(k => be64(b, i + 16 + 8 * k))
          case "stsc" if i + 16 <= end =>
            val n = math.min(be32(b, i + 12), (end - i - 16) / 12)
            sampleToChunk = Array.tabulate(n)(k =>
              (be32(b, i + 16 + 12 * k), be32(b, i + 20 + 12 * k)))
          case _ => ()
        }
        i = end
      }
    }
    if (b.length >= 8) walk(0, b.length)
    out.toSeq
  }

  /** Scan RIFF-AVI `movi` (and `rec `) LISTs for `..dc`/`..db` stream
    * chunks whose payload starts with a JPEG SOI marker. */
  private def aviJpegSpans(b: Array[Byte]): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(from: Int, to: Int): Unit = {
      var i = from
      while (i + 8 <= to) {
        val id = new String(b, i, 4, "US-ASCII")
        val size = le32(b, i + 4)
        val dataEnd = i + 8 + size
        if (size < 0 || dataEnd > to) return
        if (id == "LIST" && size >= 4) {
          val listType = new String(b, i + 8, 4, "US-ASCII")
          if (listType == "movi" || listType == "rec ") walk(i + 12, dataEnd)
        } else if ((id.endsWith("dc") || id.endsWith("db")) && size >= 2 &&
            (b(i + 8) & 0xFF) == 0xFF && (b(i + 9) & 0xFF) == 0xD8) {
          out += ((i + 8, size))
        }
        i = dataEnd + (size & 1) // RIFF chunks pad to even
      }
    }
    walk(12, b.length)
    out.toSeq
  }

  // ---------------------------------------------------------- medical

  /** metadata fast path for the reference's medical htypes
    * (`cpp/base/htype.hpp:16-17` nifti/dicom, `types.pyi:1371`
    * Medical): parse NIfTI-1's fixed 348-byte header and DICOM's
    * Part-10 group/element stream — pure byte walks, no codec, same
    * corrupt-tolerant-sentinel contract as [[videoInfo]]. Voxel decode
    * (the reference routes it through native codecs) is out of
    * pure-JVM scope; the header metadata here is real.
    *
    * Output: (id, format, modality, width, height, depth, bits,
    * voxel_x, voxel_y, voxel_z). NIfTI: dims 1-3 + pixdim voxel sizes,
    * modality "". DICOM: Columns/Rows/NumberOfFrames + PixelSpacing
    * (col, row) as voxel_x/voxel_y, Modality tag. Unknown payloads
    * yield ("unknown", "", -1, -1, -1, -1, 0, 0, 0). */
  def medicalInfo(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        val n = parseNifti(b)
        val m = if (n._1 != "unknown") n else parseDicom(b)
        (id, m._1, m._2, m._3, m._4, m._5, m._6, m._7, m._8, m._9)
      })
      .toDF("id", "format", "modality", "width", "height", "depth",
        "bits", "voxel_x", "voxel_y", "voxel_z")
  }

  private val medicalUnknown =
    ("unknown", "", -1, -1, -1, -1, 0.0, 0.0, 0.0)

  /** NIfTI-1 (348-byte header; nifti.nimh.nih.gov/nifti-1): sizeof_hdr
    * at 0 must read 348 in EITHER endianness (the spec's own byte-order
    * probe), magic at 344 is "ni1\0" (.hdr) or "n+1\0" (.nii); dim[0]
    * in 1..7 validates. Emits dim[1..3], bitpix, pixdim[1..3]. */
  private[graft] def parseNifti(b: Array[Byte])
      : (String, String, Int, Int, Int, Int, Double, Double, Double) = {
    if (b.length < 348) return medicalUnknown
    val little =
      if (le32(b, 0) == 348) true
      else if (be32(b, 0) == 348) false
      else return medicalUnknown
    def s16(i: Int): Int = {
      val v = if (little) le16(b, i) else be16(b, i)
      if (v >= 0x8000) v - 0x10000 else v
    }
    def f32(i: Int): Double = {
      val bits = if (little) le32(b, i) else be32(b, i)
      java.lang.Float.intBitsToFloat(bits).toDouble
    }
    val magic = new String(b, 344, 3, "US-ASCII")
    if (magic != "ni1" && magic != "n+1") return medicalUnknown
    val ndim = s16(40)
    if (ndim < 1 || ndim > 7) return medicalUnknown
    def dim(k: Int): Int = if (k <= ndim) math.max(s16(40 + 2 * k), 1) else 1
    val bitpix = s16(72)
    def vox(k: Int): Double = {
      val v = f32(76 + 4 * k)
      if (java.lang.Double.isFinite(v) && v > 0) v else 0.0
    }
    ("nifti", "", dim(1), dim(2), dim(3), bitpix, vox(1), vox(2), vox(3))
  }

  /** DICOM Part-10: 128-byte preamble + "DICM", explicit-VR-LE meta
    * group (0002,xxxx), then a group/element walk of the dataset —
    * explicit VR LE by default, implicit VR LE when the transfer
    * syntax says so (1.2.840.10008.1.2). Reads Modality (0008,0060),
    * NumberOfFrames (0028,0008), Rows/Columns (0028,0010/0011),
    * PixelSpacing (0028,0030, "row\col" decimal strings) and
    * BitsAllocated (0028,0100); stops at PixelData (7FE0,0010), any
    * undefined-length sequence, or structural corruption — returning
    * whatever parsed so far rather than throwing. */
  private[graft] def parseDicom(b: Array[Byte])
      : (String, String, Int, Int, Int, Int, Double, Double, Double) = {
    if (b.length < 140 || new String(b, 128, 4, "US-ASCII") != "DICM")
      return medicalUnknown
    val longVrs = Set("OB", "OW", "OF", "OL", "OV", "OD", "SQ", "UC", "UR", "UT", "UN")
    var modality = ""; var rows = -1; var cols = -1; var bits = -1
    var frames = 1; var vx = 0.0; var vy = 0.0
    var implicitVr = false
    var i = 132
    var done = false
    while (!done && i + 8 <= b.length) {
      val group = le16(b, i)
      val elem = le16(b, i + 2)
      // meta group is always explicit LE; dataset encoding follows the
      // transfer syntax announced in (0002,0010)
      val explicitHere = group == 0x0002 || !implicitVr
      var valueAt = 0; var len = 0L
      if (explicitHere) {
        val vr = new String(b, i + 4, 2, "US-ASCII")
        if (!vr.forall(c => c >= 'A' && c <= 'Z')) { done = true }
        else if (longVrs(vr)) {
          if (i + 12 > b.length) done = true
          else { len = le32(b, i + 8).toLong & 0xFFFFFFFFL; valueAt = i + 12 }
        } else { len = le16(b, i + 6); valueAt = i + 8 }
      } else {
        len = le32(b, i + 4).toLong & 0xFFFFFFFFL; valueAt = i + 8
      }
      if (done || len == 0xFFFFFFFFL || valueAt + len > b.length ||
          (group == 0x7FE0 && elem == 0x0010)) {
        done = true
      } else {
        def str: String =
          new String(b, valueAt, len.toInt, "US-ASCII").trim
        (group, elem) match {
          case (0x0002, 0x0010) =>
            implicitVr = str.stripSuffix("\u0000") == "1.2.840.10008.1.2"
          case (0x0008, 0x0060) => modality = str
          case (0x0028, 0x0008) =>
            frames = scala.util.Try(str.toInt).getOrElse(1)
          case (0x0028, 0x0010) if len >= 2 => rows = le16(b, valueAt)
          case (0x0028, 0x0011) if len >= 2 => cols = le16(b, valueAt)
          case (0x0028, 0x0030) =>
            val parts = str.split("\\\\")
            if (parts.length == 2) {
              vy = scala.util.Try(parts(0).trim.toDouble).getOrElse(0.0)
              vx = scala.util.Try(parts(1).trim.toDouble).getOrElse(0.0)
            }
          case (0x0028, 0x0100) if len >= 2 => bits = le16(b, valueAt)
          case _ => ()
        }
        i = (valueAt + len).toInt
      }
    }
    if (rows < 0 && cols < 0 && modality.isEmpty) medicalUnknown
    else ("dicom", modality, cols, rows, frames, bits, vx, vy, 0.0)
  }

  // ---------------------------------------------------------- geometry

  /** metadata fast path for the reference's mesh/point_cloud htypes
    * (`cpp/base/htype.hpp:26,35`; `types.pyi:1430` Mesh lists ply+stl —
    * the exact compressions of `cpp/codecs/compression.hpp:31-32`):
    * parse PLY's self-describing ASCII header and STL's fixed binary
    * layout / ASCII facet grammar — pure byte walks, no geometry
    * library, same corrupt-tolerant-sentinel contract as [[videoInfo]]
    * and [[medicalInfo]]. Vertex-payload decode stays out of scope; the
    * counts and encoding here are what a 100 TB manifest scan needs.
    *
    * Output: (id, format, encoding, kind, n_vertices, n_faces). A PLY
    * with no face element (or zero faces) is a point cloud; any STL is
    * a mesh. Unknown payloads yield ("unknown", "", "", -1, -1). */
  def geometryInfo(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        val p = parsePly(b)
        val g = if (p._1 != "unknown") p else parseStl(b)
        val kind =
          if (g._1 == "unknown") ""
          else if (g._1 == "ply" && g._4 <= 0L) "point_cloud"
          else "mesh"
        (id, g._1, g._2, kind, g._3, g._4)
      })
      .toDF("id", "format", "encoding", "kind", "n_vertices", "n_faces")
  }

  private val geometryUnknown = ("unknown", "", -1L, -1L)

  /** PLY (the Stanford polygon format): the header is ALWAYS ASCII
    * lines — "ply", "format ascii|binary_little_endian|
    * binary_big_endian 1.0", "element <name> <count>" declarations,
    * "end_header" — even when the vertex payload that follows is
    * binary, so counts parse without touching geometry bytes. Header
    * scan is bounded (64 KiB): a missing end_header inside the bound
    * is corruption, not a reason to walk the payload. */
  private[graft] def parsePly(b: Array[Byte]): (String, String, Long, Long) = {
    if (b.length < 14 || b(0) != 'p' || b(1) != 'l' || b(2) != 'y') return geometryUnknown
    // bounded header window; tolerate \r\n
    val window = new String(b, 0, math.min(b.length, 1 << 16), "US-ASCII")
    val headerEnd = window.indexOf("end_header")
    if (headerEnd < 0) return geometryUnknown
    val lines = window.substring(0, headerEnd).split("\r?\n").iterator.map(_.trim)
    if (!lines.hasNext || lines.next() != "ply") return geometryUnknown
    var encoding = ""; var vertices = 0L; var faces = 0L
    lines.foreach { line =>
      val t = line.split("\\s+")
      t(0) match {
        case "format" if t.length >= 2 => encoding = t(1)
        case "element" if t.length >= 3 =>
          val n = scala.util.Try(t(2).toLong).getOrElse(-1L)
          if (n >= 0) t(1) match {
            case "vertex" => vertices = n
            case "face"   => faces = n
            case _        => ()
          }
        case _ => ()
      }
    }
    if (encoding.isEmpty) geometryUnknown
    else ("ply", encoding, vertices, faces)
  }

  /** STL: binary is an 80-byte free-text header + uint32 LE triangle
    * count + 50 bytes per triangle — the length equation
    * `84 + 50*n == size` is the discriminator, checked FIRST because a
    * binary header may legally begin with the bytes "solid" (the
    * classic STL-sniffing trap). ASCII is the `solid`/`facet normal`/
    * `endsolid` grammar; facets are counted with one bounded substring
    * walk. STL has no shared-vertex table, so n_vertices = 3·faces. */
  private[graft] def parseStl(b: Array[Byte]): (String, String, Long, Long) = {
    if (b.length >= 84) {
      val n = le32(b, 80).toLong & 0xFFFFFFFFL
      if (84L + 50L * n == b.length.toLong)
        return ("stl", "binary", 3L * n, n)
    }
    // ASCII: skip leading whitespace, require the "solid" keyword; the
    // facet/endsolid scan walks the BYTES directly — a corrupt
    // multi-hundred-MB payload must not pay a 2x String materialization
    // (STL keywords are pure ASCII, so byte match == text match)
    var s = 0
    while (s < b.length && (b(s) == ' ' || b(s) == '\t' ||
      b(s) == '\r' || b(s) == '\n')) s += 1
    def asciiAt(i: Int, kw: String): Boolean =
      i >= 0 && i + kw.length <= b.length &&
        kw.indices.forall(j => b(i + j) == kw.charAt(j).toByte)
    def countFrom(kw: String): (Long, Boolean) = {
      var n = 0L; var seen = false; var i = s
      val endKw = "endsolid"
      while (i < b.length) {
        if (asciiAt(i, kw)) { n += 1; i += kw.length }
        else { if (!seen && asciiAt(i, endKw)) seen = true; i += 1 }
      }
      (n, seen)
    }
    if (!asciiAt(s, "solid")) return geometryUnknown
    val (faces, sawEnd) = countFrom("facet normal")
    if (!sawEnd) return geometryUnknown
    ("stl", "ascii", 3L * faces, faces)
  }
}
