package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ArrayContains, AttributeReference, EqualTo, Expression, GetJsonObject, Literal, PredicateHelper, StringSplit, Lower}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, lit}

/** Filter→index rewrite (SURVEY.md §4.1; reference
  * `cpp/deeplake_pg/duckdb_deeplake_scan.cpp:209-301`
  * try_get_index_searcher + `cpp/query_core/index_holder.hpp:30-40`):
  * a linear-scan keyword predicate
  * `array_contains(split(lower(text), sep), 'term')` over a table whose
  * text column has a registered inverted index becomes a LEFT SEMI join
  * with the (term, doc_id) posting table — the relational analog of
  * answering the filter from a roaring bitmap and intersecting.
  *
  * The index must be persisted (parquet path registered in
  * [[IndexCatalog]]); the rule plans a FRESH scan of it per application,
  * which keeps expression IDs disjoint from the query plan without any
  * tree re-instantiation.
  *
  * Injected via `graft.GraftExtensions` (injectOptimizerRule).
  */
object IndexCatalog {
  /** index kinds: Contains = tokenized posting table (term, doc_id);
    * Equals = exact full-text table (md5 hash, doc_id),
    * `cpp/query_core/text_search_info.hpp:28-52`; Json = JSON path
    * posting table (path, value hash, doc_id),
    * `python/deeplake/types.pyi:220` JsonIndex */
  val Contains = "contains"
  val Equals = "equals"
  val Json = "json"

  /** (table root path, column, kind) -> (index parquet path, id column,
    * and — for Json — the paths the posting table actually holds: a
    * predicate on any OTHER path must stay a linear scan, because the
    * index has no postings for it and a semi-join would wrongly drop
    * matching rows) */
  final case class Entry(indexPath: String, idCol: String,
      jsonPaths: Seq[String] = Nil)
  @volatile private var entries: Map[(String, String, String), Entry] = Map.empty

  def register(tableRootPath: String, column: String, indexPath: String,
      idCol: String, kind: String = Contains,
      jsonPaths: Seq[String] = Nil): Unit =
    entries += (norm(tableRootPath), column, kind) -> Entry(indexPath, idCol, jsonPaths)

  def unregister(tableRootPath: String, column: String,
      kind: String = Contains): Unit =
    entries -= ((norm(tableRootPath), column, kind))

  def clear(): Unit = entries = Map.empty

  def lookup(tableRootPath: String, column: String,
      kind: String = Contains): Option[Entry] =
    entries.get((norm(tableRootPath), column, kind))

  private def norm(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")
}

case class IndexRewrite(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      // peel index-answerable CONTAINS conjuncts off the predicate; each
      // becomes one semi-join (the reference ANDs roaring bitmaps and
      // leaves the residual filter in place, index_holder.hpp:33)
      val conjuncts = splitConjunctivePredicates(cond)
      // roots once per Filter and indexable once per conjunct: the root
      // resolution reads version-manifest metadata (the routing gate), so
      // it must not run 2 x conjuncts times per optimizer application
      val roots = scanRootPaths(child)
      val probes = conjuncts.map(c => c -> indexable(child, roots, c))
      val (rewritten, residual) = probes.partition(_._2.isDefined)
      if (rewritten.isEmpty) f
      else {
        val base = residual.map(_._1)
          .reduceOption(org.apache.spark.sql.catalyst.expressions.And)
          .map(Filter(_, child)).getOrElse(child)
        rewritten.foldLeft(base) { (acc, cp) =>
          val p = cp._2.get
          import p.{entry, childId, value}
          val md5f = org.apache.spark.sql.functions.md5 _
          val probe = p.kind match {
            case IndexCatalog.Equals =>
              spark.read.parquet(entry.indexPath)
                .filter(col("th") === md5f(lit(value)))
            case IndexCatalog.Json =>
              spark.read.parquet(entry.indexPath)
                .filter(col("path") === lit(p.jsonPath.get) &&
                  col("vh") === md5f(lit(value)))
            case _ =>
              spark.read.parquet(entry.indexPath)
                .filter(col("term") === lit(value))
          }
          val matched = probe.select(col("doc_id"))
            .queryExecution.analyzed // fresh scan -> disjoint expr ids
          Join(acc, matched, LeftSemi,
            Some(EqualTo(childId, matched.output.head)), JoinHint.NONE)
        }
      }
  }

  /** Regex the posting tables are tokenized with (InvertedIndex.terms).
    * A split on ANY other separator has different tokenization semantics
    * and must NOT be answered from the index. */
  private val IndexTokenizer = "[^a-z0-9]+"

  /** An index probe extracted from one predicate conjunct. */
  private final case class Probe(entry: IndexCatalog.Entry,
      childId: AttributeReference, value: String, kind: String,
      jsonPath: Option[String] = None)

  /** Some(probe) when `e` is a CONTAINS-, EQUALS-, or JSON-path-equality
    * shaped predicate answerable from a registered index of the matching
    * kind. */
  private def indexable(child: LogicalPlan, roots: Seq[String],
      e: Expression): Option[Probe] = e match {
    case ArrayContains(
        StringSplit(Lower(attr: AttributeReference),
          Literal(sep, _), Literal(limit, _)), Literal(term, _))
        if sep != null && sep.toString == IndexTokenizer &&
          limit != null && limit.toString == "-1" =>
      lookup(child, roots, attr, term, IndexCatalog.Contains)
    // get_json_object(attr, path) = 'v' — answerable from a JSON path
    // index holding md5 hashes of the same textual value form, but ONLY
    // for paths the index was built with
    case EqualTo(GetJsonObject(attr: AttributeReference, Literal(path, _)), Literal(v, _))
        if v != null && path != null =>
      lookup(child, roots, attr, v, IndexCatalog.Json)
        .filter(_.entry.jsonPaths.contains(path.toString))
        .map(_.copy(jsonPath = Some(path.toString)))
    case EqualTo(Literal(v, _), GetJsonObject(attr: AttributeReference, Literal(path, _)))
        if v != null && path != null =>
      lookup(child, roots, attr, v, IndexCatalog.Json)
        .filter(_.entry.jsonPaths.contains(path.toString))
        .map(_.copy(jsonPath = Some(path.toString)))
    case EqualTo(attr: AttributeReference, Literal(v, _)) if v != null =>
      lookup(child, roots, attr, v, IndexCatalog.Equals)
    case EqualTo(Literal(v, _), attr: AttributeReference) if v != null =>
      lookup(child, roots, attr, v, IndexCatalog.Equals)
    case _ => None
  }

  private def lookup(child: LogicalPlan, roots: Seq[String],
      attr: AttributeReference, value: Any, kind: String): Option[Probe] =
    for {
      entry <- roots.flatMap(IndexCatalog.lookup(_, attr.name, kind)).headOption
      childId <- child.output.collectFirst {
        case a: AttributeReference if a.name == entry.idCol => a
      }
    } yield Probe(entry, childId, value.toString, kind)

  /** Root path of the single file-source relation feeding this subtree
    * (conservative: bail out unless exactly one relation). A versioned
    * [[graft.sources.Snapshots]] table reads N `seg-*` segment dirs in
    * one relation; when every root is a segment dir under one parent,
    * the TABLE root (the parent) is the index key — that is how
    * `Snapshots.createIndex` registers, so DDL-created indexes route on
    * multi-segment snapshots too. */
  private def scanRootPaths(plan: LogicalPlan): Seq[String] = {
    val rels = plan.collectLeaves().collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
    }
    def segParent(paths: Seq[String]): Option[String] = {
      val parsed = paths.map(p => new org.apache.hadoop.fs.Path(p)).map { hp =>
        (Option(hp.getParent).map(_.toString), hp.getName)
      }
      val parent = parsed.head._1
      if (parent.isDefined && parsed.forall(x =>
          x._1 == parent && x._2.startsWith("seg-"))) {
        // table-owned indexes reflect the CURRENT main-branch version:
        // routing is sound iff every SCANNED segment is part of that
        // version (its rows are then all present in the index; extra
        // index rows are filtered by the LEFT SEMI join back to the
        // scanned child). Subset, not equality, so sidecar-pruned scans
        // (openPruned/openPrunedEq) and append-only time travel still
        // route; a branch's own segment or a pre-COW segment is not in
        // current main -> linear scan. routingMainSegments memoizes the
        // manifest read per version-dir mtime (this rule fires per
        // Filter per optimizer application) and reports NO segments
        // while a copy-on-write rebuild is fenced — scans of the
        // freshly-committed version stay linear until the rebuild
        // lands, in every session. IO failures fall back to the linear
        // scan but are logged, never swallowed silently (manifest
        // corruption must surface somewhere).
        val segs = parsed.map(_._2).toSet
        val current = try graft.sources.Snapshots.routingMainSegments(
          parent.get.stripPrefix("file:"))
        catch { case e: java.io.IOException =>
          logWarning(s"index routing gate: manifest read failed for " +
            s"${parent.get} (${e.getMessage}); falling back to linear scan")
          Set.empty[String]
        }
        if (segs.nonEmpty && segs.subsetOf(current)) parent else None
      } else None
    }
    rels match {
      // a lone root is itself a candidate; a lone SEGMENT dir (a
      // single-segment snapshot) is additionally addressable by its
      // table root — DDL indexes register under the root
      case Seq(Seq(single)) => single +: segParent(Seq(single)).toSeq
      case Seq(many) if many.size > 1 => segParent(many).toSeq
      case _ => Nil
    }
  }
}
