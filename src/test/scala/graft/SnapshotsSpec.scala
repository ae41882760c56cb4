package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.Snapshots

/** Dataset lifecycle: append/commit, time-travel, delete, update, DDL. */
class SnapshotsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("snapshots-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshRoot(): String =
    Files.createTempDirectory("graft-snap").toString

  import scala.language.implicitConversions

  test("create + append is O(delta) and versions accumulate") {
    val root = freshRoot()
    import spark.implicits._
    val v1 = Snapshots.create(spark, root, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    assert(v1 == 1L)
    val v2 = Snapshots.append(spark, root, Seq((3L, "c")).toDF("id", "s"))
    assert(v2 == 2L)
    assert(Snapshots.open(spark, root).count() == 3)
    // time travel: v1 still has 2 rows
    assert(Snapshots.open(spark, root, Some(1L)).count() == 2)
    assert(Snapshots.history(root) == Seq(1L, 2L))
    // appending wrote exactly one new segment, not a table rewrite
    val segs = new java.io.File(root).listFiles().count(_.getName.startsWith("seg-"))
    assert(segs == 2)
  }

  test("append rejects schema mismatch, aligns column order") {
    val root = freshRoot()
    import spark.implicits._
    Snapshots.create(spark, root, Seq((1L, "a")).toDF("id", "s"))
    // reordered columns are fine
    Snapshots.append(spark, root, Seq(("b", 2L)).toDF("s", "id"))
    val rows = Snapshots.open(spark, root).orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    intercept[IllegalArgumentException] {
      Snapshots.append(spark, root, Seq((3L, "c", 1.0)).toDF("id", "s", "extra"))
    }
  }

  test("deleteWhere and update are copy-on-write with history intact") {
    val root = freshRoot()
    import spark.implicits._
    Snapshots.create(spark, root,
      (1L to 10L).map(i => (i, i * 10.0)).toDF("id", "v"))
    Snapshots.deleteWhere(spark, root, col("id") > 8)
    assert(Snapshots.open(spark, root).count() == 8)
    Snapshots.update(spark, root, "v", lit(0.0), col("id") === 1L)
    val updated = Snapshots.open(spark, root).filter(col("id") === 1L).collect()
    assert(updated.head.getDouble(1) == 0.0)
    // original still visible at v1
    assert(Snapshots.open(spark, root, Some(1L)).count() == 10)
  }

  test("deleteWhere keeps rows whose predicate is NULL (SQL DELETE semantics)") {
    val root = freshRoot()
    import spark.implicits._
    // v is NULL for id=2: DELETE WHERE v > 15 must delete ONLY id=3
    Snapshots.create(spark, root,
      Seq((1L, Some(10.0)), (2L, None), (3L, Some(20.0))).toDF("id", "v"))
    Snapshots.deleteWhere(spark, root, col("v") > 15.0)
    val ids = Snapshots.open(spark, root).select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L), "NULL-predicate row must survive the delete")
  }

  test("add/drop/rename column") {
    val root = freshRoot()
    import spark.implicits._
    Snapshots.create(spark, root, Seq((1L, "a")).toDF("id", "s"))
    Snapshots.addColumn(spark, root, "flag", lit(true))
    assert(Snapshots.open(spark, root).columns.toSeq == Seq("id", "s", "flag"))
    Snapshots.renameColumn(spark, root, "flag", "active")
    assert(Snapshots.open(spark, root).columns.contains("active"))
    Snapshots.dropColumn(spark, root, "s")
    assert(Snapshots.open(spark, root).columns.toSeq == Seq("id", "active"))
    // time travel sees the pre-DDL schema
    assert(Snapshots.open(spark, root, Some(1L)).columns.toSeq == Seq("id", "s"))
  }

  test("branches: O(1) cut, isolated appends, append-only merge") {
    val root = freshRoot()
    import spark.implicits._
    Snapshots.create(spark, root, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))

    Snapshots.createBranch(root, "dev")
    assert(Snapshots.branches(root) == Seq("main", "dev").sorted ||
           Snapshots.branches(root) == Seq("main", "dev"))
    assert(Snapshots.branchPoint(root, "dev") == ("main", 1L))

    // appends on dev are invisible on main, and vice versa
    Snapshots.append(spark, root, Seq((3L, "c")).toDF("id", "s"), branch = "dev")
    assert(Snapshots.open(spark, root, branch = "dev").count() == 3)
    assert(Snapshots.open(spark, root).count() == 2)
    Snapshots.append(spark, root, Seq((9L, "z")).toDF("id", "s"))
    assert(Snapshots.open(spark, root, branch = "dev").count() == 3)

    // merge splices dev's delta into main without data movement
    Snapshots.merge(spark, root, "dev")
    val ids = Snapshots.open(spark, root).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 9L))

    // a branch that rewrote inherited segments refuses the merge
    Snapshots.createBranch(root, "cow")
    Snapshots.deleteWhere(spark, root, col("id") === 1L, branch = "cow")
    assertThrows[IllegalArgumentException](Snapshots.merge(spark, root, "cow"))
  }

  test("tags pin a branch version") {
    val root = freshRoot()
    import spark.implicits._
    Snapshots.create(spark, root, Seq(1L, 2L).toDF("id"))
    Snapshots.tag(root, "v1.0")
    Snapshots.append(spark, root, Seq(3L).toDF("id"))
    assert(Snapshots.open(spark, root).count() == 3)
    assert(Snapshots.openTag(spark, root, "v1.0").count() == 2)
    assert(Snapshots.tags(root) == Seq("v1.0"))
    // tag on a branch head
    Snapshots.createBranch(root, "exp")
    Snapshots.append(spark, root, Seq(4L).toDF("id"), branch = "exp")
    Snapshots.tag(root, "exp-snap", branch = "exp")
    assert(Snapshots.openTag(spark, root, "exp-snap").count() == 4)
  }
}
