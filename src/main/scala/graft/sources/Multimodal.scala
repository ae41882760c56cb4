package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Multimodal column plumbing (SURVEY.md §1.3: Image/Video/Audio htypes
  * are binary payloads + typed metadata over physical columns;
  * `cpp/deeplake_core/type.hpp:43-63`, `types.pyi:1011` Image).
  *
  * The decode kernel itself is STUBBED (this container ships no image
  * codecs — see decodeImages) with a deterministic byte-derived fake, but
  * the Spark-side contract is real and tested: binary payload column,
  * per-partition batch decode via Dataset.mapPartitions (the Scala analog
  * of mapInPandas batch UDFs), fixed output schema, column-metadata tags.
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
