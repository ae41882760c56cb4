package graft.core

import org.apache.spark.sql.types._

/** Semantic-type (htype) layer (SURVEY.md §1.3): the reference types every
  * column with a physical dtype + semantic kind + per-kind parameters
  * (`cpp/deeplake_core/type.hpp:43-63` type_kind; Python constructors
  * `python/deeplake/types.pyi` — Embedding :669, Image :1011, BoundingBox
  * :1221, ClassLabel :1122, Sequence :983, Text :538, Link :1038).
  *
  * Spark-native: semantic info travels as `Metadata` on `StructField`s
  * over plain physical types, so every operator (and parquet round-trips)
  * see ordinary columns while the catalog layer can recover the htype.
  */
object Types {

  val HtypeKey = "graft.htype"

  private def meta(htype: String, kv: (String, Any)*): Metadata = {
    val b = new MetadataBuilder().putString(HtypeKey, htype)
    kv.foreach {
      case (k, v: String) => b.putString(k, v)
      case (k, v: Long) => b.putLong(k, v)
      case (k, v: Int) => b.putLong(k, v.toLong)
      case (k, v: Boolean) => b.putBoolean(k, v)
      case (k, v) => b.putString(k, v.toString)
    }
    b.build()
  }

  /** Embedding(size) -> array<float> + size metadata (types.pyi:669) */
  def embedding(name: String, size: Int, nullable: Boolean = true): StructField =
    StructField(name, ArrayType(FloatType), nullable,
      meta("embedding", "size" -> size))

  /** Text with index hint (types.pyi:538; index types tql.md:646-709) */
  def text(name: String, index: String = "none"): StructField =
    StructField(name, StringType, nullable = true,
      meta("text", "index" -> index))

  /** Image -> binary payload + codec metadata (types.pyi:1011) */
  def image(name: String, sampleCompression: String = "png"): StructField =
    StructField(name, BinaryType, nullable = true,
      meta("image", "sample_compression" -> sampleCompression))

  /** Audio/Video -> binary + codec (types.pyi:1310) */
  def video(name: String, sampleCompression: String = "mp4"): StructField =
    StructField(name, BinaryType, nullable = true,
      meta("video", "sample_compression" -> sampleCompression))

  /** BoundingBox -> array<array<float>> + format LTWH/LTRB/CCWH
    * (types.pyi:1221, `cpp/deeplake_core/bbox_type.hpp`) */
  def boundingBox(name: String, format: String = "LTWH"): StructField =
    StructField(name, ArrayType(ArrayType(FloatType)), nullable = true,
      meta("bbox", "format" -> format))

  /** ClassLabel over an int code column (types.pyi:1122) */
  def classLabel(name: String): StructField =
    StructField(name, IntegerType, nullable = true, meta("class_label"))

  /** Sequence(inner) -> array of the inner physical type (types.pyi:983) */
  def sequence(name: String, element: DataType, nullable: Boolean = true): StructField =
    StructField(name, ArrayType(element), nullable, meta("sequence"))

  /** Link -> URL string resolved at read time (types.pyi:1038) */
  def link(name: String): StructField =
    StructField(name, StringType, nullable = true, meta("link"))

  /** Dict/JSON payload as a JSON string (types.pyi:634) */
  def dict(name: String): StructField =
    StructField(name, StringType, nullable = true, meta("dict"))

  // ----------------------------------------------------------- readback

  def htypeOf(f: StructField): Option[String] =
    if (f.metadata.contains(HtypeKey)) Some(f.metadata.getString(HtypeKey)) else None

  def embeddingSize(f: StructField): Option[Long] =
    if (f.metadata.contains("size")) Some(f.metadata.getLong("size")) else None

  /** All htyped fields of a schema: name -> htype */
  def htypes(schema: StructType): Map[String, String] =
    schema.fields.flatMap(f => htypeOf(f).map(f.name -> _)).toMap
}
