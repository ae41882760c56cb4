package graft.plans

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual, Literal, Or, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, JoinHint, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{approx_count_distinct, col, count, lit, max, min}

/** ANALYZE-style table statistics (row count, per-column NDV, min/max,
  * most-common values) driving a broadcast-hint optimizer rule — the
  * cost-based half the reference gets from its host engines' planners
  * (DuckDB/Postgres keep MCV lists and n_distinct per column and pick
  * build sides from them; `cpp/deeplake_pg/` delegates planning to PG,
  * whose pg_statistic MCVs this mirrors).
  *
  * Why Spark needs the help: without CBO stats, Spark's size estimator
  * passes a Filter's size through UNCHANGED (SizeInBytesOnlyStatsVisitor),
  * so `dim.filter(rare_predicate)` still "weighs" the whole table and a
  * perfectly broadcastable filtered side sort-merge-joins instead. At
  * 100 TB that one misplan is the difference between a map-side join and
  * a full shuffle of the fact table.
  *
  * [[StatsCatalog.analyze]] is the batch ANALYZE job (one partial-agg
  * pass for count/NDV/min/max + one top-k group per requested column);
  * stats register under the table's file-source root path, and
  * [[CboHints]] (injected via `graft.GraftExtensions`) estimates
  * filtered-side cardinality with MCV-aware equality selectivity to set
  * a BROADCAST join hint Spark's own estimator cannot justify.
  */
object StatsCatalog {

  /** `mcvs` maps the value's textual form to its exact row count —
    * equality on an MCV uses the true frequency (catches the skewed
    * value a 1/ndv guess would call rare); equality elsewhere spreads
    * the REMAINING mass over the remaining ndv. */
  final case class ColStats(ndv: Long, min: Option[Double], max: Option[Double],
      mcvs: Map[String, Long])

  final case class TableStats(rowCount: Long, bytesOnDisk: Long,
      cols: Map[String, ColStats]) {
    /** parquet bytes/row x3 decode inflation, floor 8 */
    def bytesPerRow: Double =
      math.max(8.0, 3.0 * bytesOnDisk / math.max(1L, rowCount))
  }

  @volatile private var entries: Map[String, TableStats] = Map.empty
  private val missCache = scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** Disk cache for ANALYZE output (the pg_statistic-persistence analog:
    * stats survive the session that computed them, so a later Bench /
    * Verify JVM plans with them without re-scanning). Keyed by md5 of
    * the table root path; format is private to this codebase. */
  @volatile private[graft] var cacheDir: java.io.File =
    new java.io.File(sys.env.getOrElse("GRAFT_STATS_CACHE", "target/graft-stats"))

  def register(tableRootPath: String, stats: TableStats): Unit = {
    entries += norm(tableRootPath) -> stats
    missCache.remove(norm(tableRootPath))
  }

  def lookup(tableRootPath: String): Option[TableStats] = {
    val key = norm(tableRootPath)
    entries.get(key).orElse {
      if (missCache.contains(key)) None
      else tryLoad(key) match {
        case some @ Some(stats) => entries += key -> stats; some
        case None => missCache.put(key, ()); None
      }
    }
  }

  /** fast bail for the optimizer rule: no in-memory stats AND no disk
    * cache means estimation can never succeed */
  def inactive: Boolean = entries.isEmpty && !cacheDir.exists()

  /** drops in-memory state only — persisted ANALYZE output reloads on
    * the next lookup */
  def clear(): Unit = { entries = Map.empty; missCache.clear() }

  /** drops memory AND disk (test isolation / re-ANALYZE from scratch) */
  def clearAll(): Unit = {
    clear()
    Option(cacheDir.listFiles()).foreach(_.foreach(_.delete()))
  }

  private def norm(p: String): String = p.stripPrefix("file:").stripSuffix("/")

  private def fileFor(key: String): java.io.File = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    new java.io.File(cacheDir, s"$md5.v1.bin")
  }

  private def persist(key: String, stats: TableStats): Unit = {
    cacheDir.mkdirs()
    val out = new java.io.ObjectOutputStream(
      new java.io.FileOutputStream(fileFor(key)))
    try out.writeObject(stats) finally out.close()
  }

  private def tryLoad(key: String): Option[TableStats] = {
    val f = fileFor(key)
    if (!f.isFile) None
    else try {
      val in = new java.io.ObjectInputStream(new java.io.FileInputStream(f))
      try Some(in.readObject().asInstanceOf[TableStats]) finally in.close()
    } catch { case _: Exception => None }
  }

  /** Compute and register stats for a file-backed DataFrame (must be a
    * single-relation scan so the root path is unambiguous). One
    * aggregate pass over the table + one top-`mcvK` frequency group per
    * requested column — each a map-side-combined shuffle, a legitimate
    * periodic batch job at any scale. */
  def analyze(df: DataFrame, statCols: Seq[String], mcvK: Int = 16): Option[TableStats] = {
    CboHints.scanRootPath(df.queryExecution.analyzed).map { root =>
      val numeric = df.schema.fields.map(f => f.name -> f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]).toMap
      val aggs = count(lit(1)).as("__n") +: statCols.flatMap { c =>
        Seq(approx_count_distinct(col(c)).as(s"__ndv_$c")) ++
          (if (numeric(c)) Seq(min(col(c)).cast("double").as(s"__min_$c"),
            max(col(c)).cast("double").as(s"__max_$c")) else Nil)
      }
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      val n = row.getAs[Long]("__n")
      val cols = statCols.map { c =>
        val mcvs = df.groupBy(col(c)).agg(count(lit(1)).as("__c"))
          .orderBy(col("__c").desc).limit(mcvK).collect()
          .filter(!_.isNullAt(0))
          .map(r => r.get(0).toString -> r.getLong(1)).toMap
        c -> ColStats(row.getAs[Long](s"__ndv_$c"),
          if (numeric(c)) Option(row.getAs[java.lang.Double](s"__min_$c")).map(_.toDouble) else None,
          if (numeric(c)) Option(row.getAs[java.lang.Double](s"__max_$c")).map(_.toDouble) else None,
          mcvs)
      }.toMap
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
      val stats = TableStats(n, bytes, cols)
      register(root, stats)
      persist(norm(root), stats)
      stats
    }
  }
}

/** Sets a BROADCAST hint on the provably-small side of a hint-less join,
  * using [[StatsCatalog]] cardinalities propagated through Filter /
  * Project / SubqueryAlias. Conservative by construction: no stats for a
  * side's relation, or any unrecognized operator in between, means no
  * estimate and no hint — Spark plans exactly as before. */
case class CboHints(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private def thresholdBytes: Long =
    Try(spark.conf.get("spark.graft.cbo.broadcastBytes").toLong)
      .getOrElse(10L * 1024 * 1024)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (StatsCatalog.inactive) plan
    else plan.transformUp {
      case j @ Join(l, r, tpe, _, JoinHint.NONE) =>
        val lB = estimateBytes(l)
        val rB = estimateBytes(r)
        def small(b: Option[Long]) = b.exists(_ <= thresholdBytes)
        val canL = tpe match { case Inner | Cross | RightOuter => true; case _ => false }
        val canR = tpe match { case Inner | Cross | LeftOuter | LeftSemi | LeftAnti => true; case _ => false }
        val pickR = canR && small(rB) &&
          (!(canL && small(lB)) || rB.get <= lB.get)
        val pickL = !pickR && canL && small(lB)
        if (pickR) j.copy(hint = JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
        else if (pickL) j.copy(hint = JoinHint(Some(HintInfo(Some(BROADCAST))), None))
        else j
    }

  /** estimated in-memory bytes of `plan`, None when any part is
    * un-estimable */
  private def estimateBytes(plan: LogicalPlan): Option[Long] =
    for {
      root <- CboHints.scanRootPath(plan)
      stats <- StatsCatalog.lookup(root)
      rows <- estimateRows(plan, stats)
    } yield math.ceil(rows * stats.bytesPerRow).toLong

  private def estimateRows(plan: LogicalPlan, stats: StatsCatalog.TableStats): Option[Double] =
    plan match {
      case LogicalRelation(_: HadoopFsRelation, _, _, _, _) =>
        Some(stats.rowCount.toDouble)
      case Filter(cond, child) =>
        estimateRows(child, stats).map { base =>
          splitConjunctivePredicates(cond)
            .map(selectivity(_, stats)).product * base
        }
      case Project(_, child) => estimateRows(child, stats)
      case SubqueryAlias(_, child) => estimateRows(child, stats)
      case _ => None
    }

  private def selectivity(e: Expression, stats: StatsCatalog.TableStats): Double = e match {
    case EqualTo(a: AttributeReference, Literal(v, _)) => eqSel(a.name, v, stats)
    case EqualTo(Literal(v, _), a: AttributeReference) => eqSel(a.name, v, stats)
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      math.min(1.0, vs.map(l => eqSel(a.name, l.asInstanceOf[Literal].value, stats)).sum)
    case GreaterThan(a: AttributeReference, Literal(v, _)) => rangeSel(a.name, v, stats, upper = true)
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => rangeSel(a.name, v, stats, upper = true)
    case LessThan(a: AttributeReference, Literal(v, _)) => rangeSel(a.name, v, stats, upper = false)
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => rangeSel(a.name, v, stats, upper = false)
    case And(x, y) => selectivity(x, stats) * selectivity(y, stats)
    case Or(x, y) => math.min(1.0, selectivity(x, stats) + selectivity(y, stats))
    case IsNotNull(_) => 1.0
    case _ => 0.25
  }

  private def eqSel(colName: String, v: Any, stats: StatsCatalog.TableStats): Double =
    stats.cols.get(colName) match {
      case Some(cs) =>
        val n = math.max(1L, stats.rowCount).toDouble
        val key = if (v == null) "" else v.toString
        cs.mcvs.get(key) match {
          case Some(c) => c / n
          case None =>
            // the value is NOT one of the top-k: spread the non-MCV mass
            // over the non-MCV distinct values
            val rest = math.max(0L, stats.rowCount - cs.mcvs.values.sum)
            val restNdv = math.max(1L, cs.ndv - cs.mcvs.size)
            (rest.toDouble / restNdv) / n
        }
      case None => 0.1
    }

  private def rangeSel(colName: String, v: Any, stats: StatsCatalog.TableStats,
      upper: Boolean): Double =
    (for {
      cs <- stats.cols.get(colName)
      lo <- cs.min
      hi <- cs.max
      x <- Try(v.toString.toDouble).toOption
      if hi > lo
    } yield {
      val frac = (x - lo) / (hi - lo)
      val f = if (upper) 1.0 - frac else frac
      math.min(1.0, math.max(0.0, f))
    }).getOrElse(0.3)
}

object CboHints {
  /** Root path of the single file-source relation feeding this subtree
    * (conservative: None unless exactly one). */
  private[plans] def scanRootPath(plan: LogicalPlan): Option[String] = {
    val rels = plan.collectLeaves().collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
    }
    rels match {
      case Seq(Seq(single)) => Some(single)
      case _ => None
    }
  }
}
