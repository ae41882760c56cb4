package graft.plans

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, EqualTo, ExprId, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual, Literal, Or, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, Filter, GlobalLimit, HintInfo, Join, JoinHint, LocalLimit, LogicalPlan, Project, SubqueryAlias}
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
    * the REMAINING mass over the remaining ndv. `hll` carries the
    * column's DataSketches HLL state (values hashed as strings), the
    * mergeable half of NDV: [[StatsCatalog.mergeDelta]] unions it with
    * a delta's sketch so distinct counts stay fresh under appends
    * without rescanning history. */
  final case class ColStats(ndv: Long, min: Option[Double], max: Option[Double],
      mcvs: Map[String, Long], hll: Option[Array[Byte]] = None)

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
    // v2: ColStats gained the hll field (old v1 files deserialize to
    // the wrong shape; a fresh suffix sidesteps them cleanly)
    new java.io.File(cacheDir, s"$md5.v2.bin")
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
      // NDV comes from a DataSketches HLL over the STRING form of the
      // value (one hash domain for every column type): the sketch IS
      // the persisted state, so a later delta's sketch unions into it
      // (mergeDelta) and the estimate never needs a history rescan
      val aggs = count(lit(1)).as("__n") +: statCols.flatMap { c =>
        Seq(org.apache.spark.sql.functions.hll_sketch_agg(
          col(c).cast("string")).as(s"__hll_$c")) ++
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
        val sketch = row.getAs[Array[Byte]](s"__hll_$c")
        c -> ColStats(estimateNdv(df.sparkSession, sketch),
          if (numeric(c)) Option(row.getAs[java.lang.Double](s"__min_$c")).map(_.toDouble) else None,
          if (numeric(c)) Option(row.getAs[java.lang.Double](s"__max_$c")).map(_.toDouble) else None,
          mcvs, Option(sketch))
      }.toMap
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
      val stats = TableStats(n, bytes, cols)
      register(root, stats)
      persist(norm(root), stats)
      stats
    }
  }

  private def estimateNdv(spark: SparkSession, sketch: Array[Byte]): Long = {
    if (sketch == null) 0L
    else {
      import spark.implicits._
      Seq(Tuple1(sketch)).toDF("s")
        .select(org.apache.spark.sql.functions.hll_sketch_estimate(col("s")))
        .head().getLong(0)
    }
  }

  /** Incremental ANALYZE: absorb an appended `delta` into `root`'s
    * registered stats WITHOUT rescanning history — the stats-freshness
    * half of dedupe-on-ingest pipelines, where the fact table grows by
    * streaming appends but the planner should keep seeing current
    * cardinalities.
    *
    * Merge rules, per column:
    *  - rowCount / bytes: add (exact)
    *  - min / max: widen (exact)
    *  - NDV: HLL sketch union (the PODS-mergeability argument again;
    *    estimate error stays the sketch's, independent of how many
    *    deltas merged in)
    *  - MCVs: counts for the union of (old MCV keys ∪ delta top-k)
    *    merge as old + exact-delta-count, then top-k re-trim. A value
    *    absent from the old MCV list contributes only its delta count —
    *    an undercount bounded by the old list's smallest frequency, the
    *    standard lossy-merge bound. Only the DELTA is ever scanned.
    *
    * Fails loudly if `root` has no sketch-bearing stats (run
    * [[analyze]] once first — legacy v1 stats carried no sketch). */
  def mergeDelta(spark: SparkSession, tableRootPath: String,
      delta: DataFrame, mcvK: Int = 16): TableStats = {
    val key = norm(tableRootPath)
    val old = lookup(tableRootPath).getOrElse(
      throw new IllegalStateException(s"no stats for $tableRootPath — ANALYZE first"))
    val statCols = old.cols.keys.toSeq.sorted
    statCols.foreach { c =>
      require(old.cols(c).hll.isDefined,
        s"stats for $tableRootPath($c) predate sketches — re-ANALYZE once")
    }
    val numeric = delta.schema.fields.map(f =>
      f.name -> f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]).toMap
    val aggs = count(lit(1)).as("__n") +: statCols.flatMap { c =>
      Seq(org.apache.spark.sql.functions.hll_sketch_agg(
        col(c).cast("string")).as(s"__hll_$c")) ++
        (if (numeric(c)) Seq(min(col(c)).cast("double").as(s"__min_$c"),
          max(col(c)).cast("double").as(s"__max_$c")) else Nil)
    }
    val row = delta.agg(aggs.head, aggs.tail: _*).collect()(0)
    val dn = row.getAs[Long]("__n")
    val cols = statCols.map { c =>
      val oldC = old.cols(c)
      // candidate MCV keys: whatever was hot before, plus whatever is
      // hot in the delta; ONE delta aggregation covers both
      val deltaTop = delta.groupBy(col(c)).agg(count(lit(1)).as("__c"))
        .orderBy(col("__c").desc).limit(mcvK).collect()
        .filter(!_.isNullAt(0)).map(r => r.get(0).toString -> r.getLong(1)).toMap
      val oldOnly = oldC.mcvs.keySet -- deltaTop.keySet
      val oldKeyCounts =
        if (oldOnly.isEmpty) Map.empty[String, Long]
        else delta.groupBy(col(c).cast("string").as("__k"))
          .agg(count(lit(1)).as("__c"))
          .filter(col("__k").isin(oldOnly.toSeq: _*))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val deltaCounts = deltaTop ++ oldKeyCounts
      val merged = (oldC.mcvs.keySet ++ deltaTop.keySet).map { k =>
        k -> (oldC.mcvs.getOrElse(k, 0L) + deltaCounts.getOrElse(k, 0L))
      }.toSeq.sortBy(-_._2).take(mcvK).toMap
      val dSketch = row.getAs[Array[Byte]](s"__hll_$c")
      val union =
        if (dSketch == null) oldC.hll.get
        else {
          import spark.implicits._
          Seq((oldC.hll.get, dSketch)).toDF("a", "b")
            .select(org.apache.spark.sql.functions.hll_union(col("a"), col("b")))
            .head().getAs[Array[Byte]](0)
        }
      val dMin = if (numeric(c)) Option(row.getAs[java.lang.Double](s"__min_$c")).map(_.toDouble) else None
      val dMax = if (numeric(c)) Option(row.getAs[java.lang.Double](s"__max_$c")).map(_.toDouble) else None
      c -> ColStats(estimateNdv(spark, union),
        (oldC.min.toSeq ++ dMin.toSeq).reduceOption(math.min(_, _)),
        (oldC.max.toSeq ++ dMax.toSeq).reduceOption(math.max(_, _)),
        merged, Some(union))
    }.toMap
    val dBytes = delta.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    val stats = TableStats(old.rowCount + dn, old.bytesOnDisk + dBytes, cols)
    register(tableRootPath, stats)
    persist(key, stats)
    stats
  }
}

/** Sets a BROADCAST hint on the provably-small side of a hint-less join,
  * using [[StatsCatalog]] cardinalities propagated through Filter /
  * Project / SubqueryAlias / Limit — and through inner Joins and
  * Aggregates, so a multi-table subtree (filtered dim JOIN dim, or a
  * low-NDV group-by) is itself recognized as broadcastable into an outer
  * fact join. Conservative by construction: no stats for a side's
  * relation, or any unrecognized operator in between, means no estimate
  * and no hint — Spark plans exactly as before. */
case class CboHints(spark: SparkSession) extends Rule[LogicalPlan] {

  private def thresholdBytes: Long =
    Try(spark.conf.get("spark.graft.cbo.broadcastBytes").toLong)
      .getOrElse(10L * 1024 * 1024)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (StatsCatalog.inactive) plan
    else plan.transformUp {
      case j @ Join(l, r, tpe, _, JoinHint.NONE) =>
        val lB = CboEstimator.estimateBytes(l)
        val rB = CboEstimator.estimateBytes(r)
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
}

/** Bottom-up cardinality/width estimation over [[StatsCatalog]] stats,
  * shared by [[CboHints]] (broadcast side choice) and [[JoinReorder]]
  * (join order choice). Conservative: any unrecognized operator kills
  * the estimate rather than guessing. */
private[plans] object CboEstimator extends PredicateHelper {

  /** Estimate for a subtree: output rows, decoded bytes per row, and the
    * column stats still visible in the subtree's output (keyed by ExprId
    * so self-joins with duplicate column names stay unambiguous).
    * `baseRows` is the row count of the attribute's SOURCE table — MCV
    * frequencies and NDVs are fractions of that, not of the (already
    * filtered) subtree cardinality. */
  final case class AttrStats(cs: StatsCatalog.ColStats, baseRows: Long)
  final case class Est(rows: Double, bytesPerRow: Double,
      cols: Map[ExprId, AttrStats])

  /** estimated in-memory bytes of `plan`, None when any part is
    * un-estimable */
  def estimateBytes(plan: LogicalPlan): Option[Long] =
    estimate(plan).map(e => math.ceil(e.rows * e.bytesPerRow).toLong)

  /** Bottom-up cardinality propagation. Conservative: any operator this
    * doesn't recognize kills the estimate (no hint) rather than guessing.
    * Joins use the textbook equi-join formula
    * |L JOIN R| = |L|x|R| / max(ndv_L, ndv_R) per key pair (NDVs capped
    * by each side's estimated rows — a filter that kept 20 rows cannot
    * contribute 20k distinct keys), so a small filtered-dim JOIN dim
    * subtree is itself recognized as broadcastable into a fact join. */
  def estimate(plan: LogicalPlan): Option[Est] = plan match {
    case rel @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      for {
        root <- fs.location.rootPaths.map(_.toString) match {
          case Seq(single) => Some(single); case _ => None
        }
        stats <- StatsCatalog.lookup(root)
      } yield Est(stats.rowCount.toDouble, stats.bytesPerRow,
        rel.output.flatMap(a => stats.cols.get(a.name)
          .map(cs => a.exprId -> AttrStats(cs, stats.rowCount))).toMap)
    case Filter(cond, child) =>
      estimate(child).map { e =>
        val sel = splitConjunctivePredicates(cond)
          .map(selectivity(_, e.cols)).product
        e.copy(rows = sel * e.rows)
      }
    case Project(list, child) =>
      estimate(child).map { e =>
        val kept = list.flatMap {
          case a: Attribute => e.cols.get(a.exprId).map(a.exprId -> _)
          case al @ Alias(a: Attribute, _) => e.cols.get(a.exprId).map(al.exprId -> _)
          case _ => None
        }.toMap
        e.copy(cols = kept)
      }
    case SubqueryAlias(_, child) => estimate(child)
    case GlobalLimit(Literal(n: Int, _), child) =>
      estimate(child).map(e => e.copy(rows = math.min(n.toDouble, e.rows)))
    case LocalLimit(Literal(n: Int, _), child) =>
      estimate(child).map(e => e.copy(rows = math.min(n.toDouble, e.rows)))
    case Aggregate(groupingExprs, aggExprs, child, _) =>
      estimate(child).flatMap { e =>
        if (groupingExprs.isEmpty) Some(Est(1.0, e.bytesPerRow, Map.empty))
        else {
          // output rows = product of key NDVs, capped by input rows;
          // unknown-NDV keys kill the estimate (could be near-unique)
          val ndvs = groupingExprs.map {
            case a: Attribute =>
              e.cols.get(a.exprId).map(s => math.min(s.cs.ndv.toDouble, e.rows))
            case _ => None
          }
          if (ndvs.exists(_.isEmpty)) None
          else {
            val kept = aggExprs.flatMap {
              case a: Attribute => e.cols.get(a.exprId).map(a.exprId -> _)
              case al @ Alias(a: Attribute, _) => e.cols.get(a.exprId).map(al.exprId -> _)
              case _ => None
            }.toMap
            Some(Est(math.min(ndvs.flatten.product, e.rows), e.bytesPerRow, kept))
          }
        }
      }
    case Join(l, r, tpe, cond, _) if tpe == Inner || tpe == Cross =>
      for {
        lE <- estimate(l)
        rE <- estimate(r)
        conjuncts = cond.toSeq.flatMap(splitConjunctivePredicates)
        (equi, residual) = conjuncts.partition {
          case EqualTo(a: AttributeReference, b: AttributeReference) =>
            (lE.cols.contains(a.exprId) && rE.cols.contains(b.exprId)) ||
              (lE.cols.contains(b.exprId) && rE.cols.contains(a.exprId))
          case _ => false
        }
        keyFactors <- traverseOpt(equi) {
          case EqualTo(a: AttributeReference, b: AttributeReference) =>
            val (la, ra) =
              if (lE.cols.contains(a.exprId)) (a.exprId, b.exprId)
              else (b.exprId, a.exprId)
            for {
              ls <- lE.cols.get(la)
              rs <- rE.cols.get(ra)
            } yield math.max(math.min(ls.cs.ndv.toDouble, lE.rows),
              math.min(rs.cs.ndv.toDouble, rE.rows)).max(1.0)
          case _ => None
        }
      } yield {
        val merged = lE.cols ++ rE.cols
        val resSel = residual.map(selectivity(_, merged)).product
        Est(lE.rows * rE.rows / keyFactors.product * resSel,
          lE.bytesPerRow + rE.bytesPerRow, merged)
      }
    case _ => None
  }

  private def traverseOpt[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val out = xs.map(f)
    if (out.exists(_.isEmpty)) None else Some(out.flatten)
  }

  private def selectivity(e: Expression, cols: Map[ExprId, AttrStats]): Double = e match {
    case EqualTo(a: AttributeReference, Literal(v, _)) => eqSel(a, v, cols)
    case EqualTo(Literal(v, _), a: AttributeReference) => eqSel(a, v, cols)
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      math.min(1.0, vs.map(l => eqSel(a, l.asInstanceOf[Literal].value, cols)).sum)
    case GreaterThan(a: AttributeReference, Literal(v, _)) => rangeSel(a, v, cols, upper = true)
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => rangeSel(a, v, cols, upper = true)
    case LessThan(a: AttributeReference, Literal(v, _)) => rangeSel(a, v, cols, upper = false)
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => rangeSel(a, v, cols, upper = false)
    case And(x, y) => selectivity(x, cols) * selectivity(y, cols)
    case Or(x, y) => math.min(1.0, selectivity(x, cols) + selectivity(y, cols))
    case IsNotNull(_) => 1.0
    case _ => 0.25
  }

  private def eqSel(a: AttributeReference, v: Any, cols: Map[ExprId, AttrStats]): Double =
    cols.get(a.exprId) match {
      case Some(AttrStats(cs, baseRows)) =>
        val n = math.max(1L, baseRows).toDouble
        val key = if (v == null) "" else v.toString
        cs.mcvs.get(key) match {
          case Some(c) => c / n
          case None =>
            // the value is NOT one of the top-k: spread the non-MCV mass
            // over the non-MCV distinct values
            val rest = math.max(0L, baseRows - cs.mcvs.values.sum)
            val restNdv = math.max(1L, cs.ndv - cs.mcvs.size)
            (rest.toDouble / restNdv) / n
        }
      case None => 0.1
    }

  private def rangeSel(a: AttributeReference, v: Any, cols: Map[ExprId, AttrStats],
      upper: Boolean): Double =
    (for {
      AttrStats(cs, _) <- cols.get(a.exprId)
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
