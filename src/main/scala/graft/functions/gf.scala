package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** graft function surface — Column wrappers over the native vector
  * expressions plus composed built-ins for the array/tensor scalar
  * functions (SURVEY.md §2.9, §2.10).
  *
  * Everything here stays inside whole-stage codegen: custom expressions
  * implement doGenCode, the rest compose `org.apache.spark.sql.functions`
  * higher-order functions (no Scala/Python UDFs anywhere).
  */
object gf {

  private def c2(f: (org.apache.spark.sql.catalyst.expressions.Expression,
                     org.apache.spark.sql.catalyst.expressions.Expression) =>
                     org.apache.spark.sql.catalyst.expressions.Expression)
                (a: Column, b: Column): Column =
    Bridge.column(f(Bridge.expression(a), Bridge.expression(b)))

  // ---- vector similarity kernel (native codegen expressions) ----
  def cosine_similarity(a: Column, b: Column): Column = c2(CosineSimilarity)(a, b)
  def dot(a: Column, b: Column): Column = c2(DotProduct)(a, b)
  def l1_norm(a: Column, b: Column): Column = c2(VectorDistance(_, _, 1))(a, b)
  def l2_norm(a: Column, b: Column): Column = c2(VectorDistance(_, _, 2))(a, b)
  def linf_norm(a: Column, b: Column): Column = c2(VectorDistance(_, _, Int.MaxValue))(a, b)
  def l2_norm(a: Column): Column = Bridge.column(VectorNorm(Bridge.expression(a), 2))
  def hamming_distance(a: Column, b: Column): Column = c2(HammingDistance)(a, b)
  def maxsim(doc: Column, query: Column): Column = c2(MaxSim)(doc, query)

  // ---- unicode text normalization (native codegen expression) ----
  def normalize_unicode(c: Column, form: String = "NFC"): Column =
    Bridge.column(NormalizeUnicode(Bridge.expression(c), form))

  /** accent folding: NFD-decompose then drop combining marks (\p{Mn}) —
    * DuckDB's strip_accents equivalent for Latin-script text */
  /** compression-ratio quality signal: deflate(bytes)/bytes at level 6
    * — templated/repetitive junk scores far below natural text */
  def deflate_ratio(c: Column): Column =
    Bridge.column(DeflateRatio(Bridge.expression(c)))

  /** Shannon entropy (bits) of the code-point distribution — map-side
    * gibberish signal; see [[graft.functions.CharEntropy]] */
  def char_entropy(c: Column): Column =
    Bridge.column(CharEntropy(Bridge.expression(c)))

  /** all boundary-valid occurrences of a phrase dictionary (Aho-Corasick,
    * one O(n) automaton pass per row regardless of dictionary size) */
  def match_keywords(c: Column, phrases: Seq[String]): Column =
    Bridge.column(MatchKeywords(Bridge.expression(c), phrases))

  /** all visible text of an HTML document (tags/containers/entities
    * handled natively, one O(n) walk per row) */
  def strip_html(c: Column): Column =
    Bridge.column(StripHtml(Bridge.expression(c)))

  /** boilerplate-filtered main content: keep blocks >= minChars visible
    * chars with anchor-char density <= maxLinkDensity (jusText-style) */
  def extract_text(c: Column, minChars: Int = 25,
      maxLinkDensity: Double = 0.35): Column =
    Bridge.column(ExtractMainContent(Bridge.expression(c), minChars, maxLinkDensity))

  /** repair UTF-8-decoded-as-cp1252 mojibake ("Ã©" → "é"); applied only
    * on an exact encode/decode round-trip, so clean text never changes */
  def fix_mojibake(c: Column): Column =
    Bridge.column(FixMojibake(Bridge.expression(c)))

  def strip_accents(c: Column): Column =
    org.apache.spark.sql.functions.regexp_replace(
      normalize_unicode(c, "NFD"), "\\p{Mn}", "")

  // ---- array/tensor scalar functions composed from built-ins ----
  // (tql.md:435-451) ANY/ALL over array elements; ALL true on empty,
  // ALL_STRICT false on empty.
  def any_(cond: Column): Column = exists(cond, x => x)
  def all_(cond: Column): Column = forall(cond, x => x)
  def all_strict(cond: Column): Column = forall(cond, x => x) && size(cond) > 0

  /** QUANTIZE(a): binary quantization to {-1, 1} per element
    * (`cpp/nd/norm.hpp:42`; basis of maxsim_bq / ClusteredQuantized). */
  def quantize(a: Column): Column =
    transform(a, x => when(x >= 0, lit(1.0f)).otherwise(lit(-1.0f)))

  /** SHAPE(a) for 1-D arrays (tql.md:408-412). */
  def shape(a: Column): Column = array(size(a))

  /** NONZERO(a): indices of non-zero elements (tql.md:419-423). */
  def nonzero(a: Column): Column =
    filter(transform(a, (x, i) => when(x =!= 0, i).otherwise(lit(-1))), i => i >= 0)

  /** ISCLOSE(a, b, rtol, atol) elementwise -> array<boolean>
    * (`cpp/nd/comparison.hpp:17`). */
  def isclose(a: Column, b: Column, rtol: Double = 1e-5, atol: Double = 1e-8): Column =
    zip_with(a, b, (x, y) => abs(x - y) <= lit(atol) + lit(rtol) * abs(y))

  /** LOGICAL_AND/OR(a, b) elementwise (`cpp/nd/logical.hpp:14-16`). */
  def logical_and(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x && y)
  def logical_or(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x || y)

  /** Within-row tensor reductions (TQL SUM/AVG/AMIN/AMAX over one sample's
    * array; `cpp/nd/functions.hpp:79-149`). */
  def tsum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double"))
  // NULL (not a divide-by-zero crash) for an empty array, matching SQL
  // AVG-of-nothing
  def tavg(a: Column): Column =
    tsum(a) / when(size(a) === 0, lit(null)).otherwise(size(a))
  def tmin(a: Column): Column = array_min(a)
  def tmax(a: Column): Column = array_max(a)
  def tprod(a: Column): Column =
    aggregate(a, lit(1.0), (acc, x) => acc * x.cast("double"))

  /** FLAT(a): flatten one nesting level (`cpp/nd/functions.hpp:127`). */
  def flat(a: Column): Column = flatten(a)

  /** TRANSPOSE(a): transpose a 2-D row-major array-of-arrays
    * (`cpp/nd/functions.hpp:141`). Assumes rectangular input. */
  def transpose(a: Column): Column =
    transform(
      sequence(lit(1), size(element_at(a, 1))),
      j => transform(a, row => element_at(row, j)))

  /** BINCOUNT(a, nbins): per-row histogram of non-negative int bins
    * (`cpp/nd/statistics.hpp:10-35`). Element values outside [0, nbins)
    * are ignored, matching numpy.bincount over clipped input. */
  def bincount(a: Column, nbins: Int): Column =
    transform(
      sequence(lit(0), lit(nbins - 1)),
      k => size(filter(a, x => x.cast("long") === k.cast("long"))))

  /** KEYS(json): object keys of a JSON string (tql.md:517-521). */
  def keys(j: Column): Column = json_object_keys(j)

  /** MAXSIM_POOLED(doc, query): maxsim against the mean-pooled document
    * (`cpp/nd/norm.hpp:46`) — the cheap one-vector prefilter form. With a
    * single pooled doc row the per-query-token max degenerates to
    * cos(q_i, pooled), so this is sum_i cos(q_i, mean_pool(doc)). */
  def maxsim_pooled(doc: Column, query: Column): Column =
    maxsim(array(mean_pool_rows(doc)), query)

  /** MAXSIM_BQ(doc, query): maxsim over binary-quantized {-1,+1} token
    * embeddings (`cpp/nd/norm.hpp:48`) — 1-bit cosine approximation. */
  def maxsim_bq(doc: Column, query: Column): Column =
    maxsim(transform(doc, r => quantize(r)), transform(query, r => quantize(r)))

  /** MEAN_POOL_ROWS(a): mean-pool a bag of embeddings down to one vector
    * (`cpp/nd/norm.hpp:44`, used by maxsim_pooled prefilter). */
  def mean_pool_rows(bag: Column): Column = {
    val n = size(bag)
    val summed = aggregate(
      bag,
      array_repeat(lit(0.0d), size(element_at(bag, 1))),
      (acc, v) => zip_with(acc, v, (x, y) => x + y.cast("double")))
    transform(summed, x => x / n)
  }
}
