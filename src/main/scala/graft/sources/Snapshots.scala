package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Versioned dataset lifecycle (SURVEY.md §2.14): append/commit, delete,
  * update, add/drop/rename column, time-travel open, history — the
  * relational slice of the reference's version control
  * (`Dataset.append` `__init__.pyi:3368-3426`, `commit` :3436,
  * `delete` :3428, `add_column`/`remove_column`/`rename_column`
  * :3282-3341, `History` :3843, time-travel `Branch.open` :903).
  *
  * Layout (Delta-style, manifest-per-version):
  * {{{
  *   root/seg-00001/          parquet segment (immutable once written)
  *   root/_v/00001.manifest   newline-separated segment names for that version
  * }}}
  *
  * Scale behavior: `append` writes ONLY the new rows as a fresh segment and
  * the new manifest references old segments — O(delta), never O(table).
  * Mutations (delete/update/DDL) are copy-on-write rewrites — O(table), the
  * same cost class as the reference's chunk rewrite. Reads open the
  * manifest's segment list with one `spark.read.parquet(paths*)`, so
  * partition pruning / pushdown behave exactly as a plain parquet table.
  */
object Snapshots {

  private def vDir(root: String): Path = Paths.get(root, "_v")

  private def versions(root: String): Seq[Long] = {
    val d = vDir(root)
    if (!Files.exists(d)) Seq.empty
    else Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".manifest"))
      .map(_.stripSuffix(".manifest").toLong)
      .toSeq.sorted
  }

  /** Latest committed version, or 0 if the dataset doesn't exist. */
  def currentVersion(root: String): Long = versions(root).lastOption.getOrElse(0L)

  def history(root: String): Seq[Long] = versions(root)

  private def segments(root: String, v: Long): Seq[String] = {
    val f = vDir(root).resolve(f"$v%05d.manifest")
    require(Files.exists(f), s"version $v does not exist under $root")
    new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def commit(root: String, segs: Seq[String]): Long = {
    val v = currentVersion(root) + 1
    Files.createDirectories(vDir(root))
    Files.write(vDir(root).resolve(f"$v%05d.manifest"),
      segs.mkString("\n").getBytes(StandardCharsets.UTF_8))
    v
  }

  private def newSegment(root: String, df: DataFrame): String = {
    val name = f"seg-${System.nanoTime()}%d"
    df.write.parquet(Paths.get(root, name).toString)
    name
  }

  /** Open the dataset at `version` (default: latest). */
  def open(spark: SparkSession, root: String, version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(root))
    val paths = segments(root, v).map(s => Paths.get(root, s).toString)
    spark.read.parquet(paths: _*)
  }

  /** Create version 1 from `df`. */
  def create(spark: SparkSession, root: String, df: DataFrame): Long = {
    require(versions(root).isEmpty, s"dataset already exists at $root")
    commit(root, Seq(newSegment(root, df)))
  }

  /** Append rows — writes only the delta segment (schema must match). */
  def append(spark: SparkSession, root: String, df: DataFrame): Long = {
    val cur = open(spark, root)
    require(df.columns.sorted.sameElements(cur.columns.sorted),
      s"append schema mismatch: ${df.columns.mkString(",")} vs ${cur.columns.mkString(",")}")
    val aligned = df.select(cur.columns.map(col): _*)
    commit(root, segments(root, currentVersion(root)) :+ newSegment(root, aligned))
  }

  /** DELETE WHERE cond — copy-on-write rewrite of surviving rows.
    * SQL DELETE semantics: rows where cond is NULL are NOT deleted, so the
    * survivor filter is NOT(coalesce(cond, false)), never a bare NOT. */
  def deleteWhere(spark: SparkSession, root: String, cond: Column): Long =
    rewrite(spark, root, _.filter(!coalesce(cond, lit(false))))

  /** UPDATE col = value WHERE cond — copy-on-write. */
  def update(spark: SparkSession, root: String, colName: String, value: Column,
      cond: Column): Long =
    rewrite(spark, root,
      _.withColumn(colName, when(cond, value).otherwise(col(colName))))

  /** ADD COLUMN with a default value (`add_column` `__init__.pyi:3282`). */
  def addColumn(spark: SparkSession, root: String, name: String, value: Column): Long =
    rewrite(spark, root, _.withColumn(name, value))

  def dropColumn(spark: SparkSession, root: String, name: String): Long =
    rewrite(spark, root, _.drop(name))

  def renameColumn(spark: SparkSession, root: String, from: String, to: String): Long =
    rewrite(spark, root, _.withColumnRenamed(from, to))

  private def rewrite(spark: SparkSession, root: String,
      f: DataFrame => DataFrame): Long =
    commit(root, Seq(newSegment(root, f(open(spark, root)))))
}
