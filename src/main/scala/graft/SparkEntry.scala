package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator query module into the driver-checked maps.
  * Each module covers one slice of SURVEY.md §2's inventory; a query
  * appears in `oracleSql` iff its semantics are expressible in DuckDB
  * SQL (otherwise the driver records a weaker rows-only check).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    Relational,
    TpchMore,
    VectorQueries,
    TensorQueries,
    TqlQueries,
    DocumentQueries,
    SequenceQueries,
    SearchQueries,
    IndexQueries,
    AnnQueries,
    PipelineQueries)

  private lazy val allQs: Seq[(String, Q)] = {
    val qs = modules.flatMap(_.qs)
    val dup = qs.groupBy(_._1).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQs.head._2.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQs.map { case (n, q) => n -> q.build }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQs.collect { case (n, q) if q.oracle.isDefined => n -> q.oracle.get }.toMap
}
