package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingest boundaries (SURVEY.md §2.1): from_csv / to_csv / from_parquet /
  * from_coco (`__init__.pyi:4717-4733`, CSV sink :2500).
  *
  * Spark-native: `spark.read` handles schema inference and distributed
  * parse; COCO (one JSON object with images/annotations/categories
  * arrays) becomes three relational tables via explode — the same
  * flatten-to-columns shape the reference's `from_coco` produces.
  */
object Ingest {

  def fromParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def fromCsv(spark: SparkSession, path: String, header: Boolean = true,
      inferSchema: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(path)

  def toCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.option("header", header.toString).mode("overwrite").csv(path)

  /** COCO dataset JSON -> (images, annotations, categories) tables.
    * Annotations keep bbox as array<double> (LTWH, the COCO convention —
    * reference BoundingBox format metadata `types.pyi:1221`). */
  def fromCoco(spark: SparkSession, path: String): (DataFrame, DataFrame, DataFrame) = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val images = raw.select(explode(col("images")).as("i"))
      .select(col("i.id").as("image_id"), col("i.file_name"),
        col("i.width"), col("i.height"))
    val annotations = raw.select(explode(col("annotations")).as("a"))
      .select(col("a.id").as("ann_id"), col("a.image_id"),
        col("a.category_id"), col("a.bbox"), col("a.area"))
    val categories = raw.select(explode(col("categories")).as("c"))
      .select(col("c.id").as("category_id"), col("c.name"))
    (images, annotations, categories)
  }
}
