package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Sketch-based column statistics — the 100 TB replacement for the exact
  * forms (reference maintains exact n_distinct/MCV per column at its
  * single-node scale, `cpp/deeplake_pg/column_statistics.cpp:278-345`;
  * at cluster scale the exact computation is a full shuffle of every
  * value, while sketches are fixed-size, mergeable map-side state).
  *
  * - distinct count: HyperLogLog++ (`approx_count_distinct`, default
  *   ~2.3% rsd) — constant memory per partition, one partial-agg pass
  * - percentiles: the Greenwald-Khanna-style `percentile_approx` with an
  *   accuracy knob — bounded-size mergeable summaries
  *
  * Both are Spark built-ins (codegen'd partial aggregation), so a
  * profile over N columns is ONE scan with map-side combine, no joins.
  */
object Sketches {

  /** per-group sketch profile of `valueCol`: approximate distinct count
    * and p50/p95/p99, plus exact count/min/max which are free in the
    * same pass */
  def profile(df: DataFrame, groupCols: Seq[String], valueCol: String,
      rsd: Double = 0.023, percentileAccuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col(valueCol), rsd).as("approx_distinct"),
        percentile_approx(col(valueCol),
          array(lit(0.5), lit(0.95), lit(0.99)), lit(percentileAccuracy))
          .as("p50_p95_p99"),
        min(col(valueCol)).as("mn"),
        max(col(valueCol)).as("mx"))

  /** Misra-Gries frequent-items summary with `k` counters: a mergeable,
    * fixed-size heavy-hitter sketch (Misra & Gries 1982; merge rule from
    * Agarwal et al., "Mergeable Summaries", PODS 2012). Guarantee: every
    * item with true frequency > n/(k+1) survives, and each kept counter
    * undercounts by at most n/(k+1). State is a bounded map — map-side
    * partial aggregation, tiny merge, no value shuffle. */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0, "need at least one counter")

    /** Reduce to <= k entries: subtract the (k+1)-th largest counter
      * value from every counter and drop the non-positive ones. At most
      * k counters exceed that value, and the total subtracted mass over
      * a run is bounded by n/(k+1) per surviving counter. */
    private def shrink(b: Map[String, Long]): Map[String, Long] =
      if (b.size <= k) b
      else {
        val dec = b.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
        b.collect { case (t, c) if c > dec => t -> (c - dec) }
      }

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], t: String): Map[String, Long] =
      if (t == null) b
      else shrink(b.updated(t, b.getOrElse(t, 0L) + 1L))

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val m = b.foldLeft(a) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      shrink(m)
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Exact heavy hitters by two-pass sketch-then-verify: pass 1 runs the
    * [[MisraGries]] summary (fixed-size state, no shuffle of values) to
    * get a candidate set that provably contains every item with count
    * >= threshold (requires threshold > n/(k+1), checked at runtime);
    * pass 2 exact-counts ONLY the <= k candidates (broadcast isin
    * filter) and keeps those at/above threshold. Output is deterministic
    * and exact even though the sketch itself is merge-order dependent —
    * the classic two-pass heavy-hitter pattern, turned oracle-checkable.
    */
  def heavyHitters(df: DataFrame, itemCol: String, threshold: Long,
      k: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(itemCol).cast("string")).as[String]
    val mg = new MisraGries(k)
    val (total, summary) = {
      val agg = items.select(count(lit(1)), udaf(mg, Encoders.STRING)(col(itemCol)))
      val r = agg.head()
      (r.getLong(0), r.getMap[String, Long](1))
    }
    require(threshold > total / (k + 1).toLong,
      s"threshold $threshold is below the sketch guarantee n/(k+1) = ${total / (k + 1)}; raise k")
    val candidates = summary.keys.toSeq
    df.filter(col(itemCol).isin(candidates: _*))
      .groupBy(col(itemCol)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }

  /** Bottom-k (KMV) distinct-value sketch over 64-bit hashes: the k
    * SMALLEST DISTINCT hash values seen (Bar-Yossef et al. 2002; Beyer
    * et al., SIGMOD 2007). Fixed-size mergeable state (a sorted array),
    * so it rides map-side partial aggregation — no distinct shuffle.
    * Supports distinct-count estimation (n̂ = (k−1)/R with R the kth
    * normalized minimum; EXACT when fewer than k distinct values exist)
    * and set-overlap estimation: for signatures A, B the k smallest of
    * A ∪ B form a uniform sample of the union, so |sample ∩ A ∩ B| / |sample|
    * estimates Jaccard — the scale path for [[Dedup.corpusOverlapSketch]]. */
  final class BottomK(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k > 0, "k must be positive")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      val i = java.util.Arrays.binarySearch(b, h)
      if (i >= 0) b // duplicate — DISTINCT semantics
      else {
        val ins = -(i + 1)
        if (b.length < k) {
          val out = new Array[Long](b.length + 1)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, b.length - ins)
          out
        } else if (ins < k) { // beats the current kth minimum
          val out = new Array[Long](k)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
          out
        } else b
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // sorted-merge distinct, capped at k
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(b: Array[Long]): Array[Long] = b

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** KMV distinct-count estimate from a [[BottomK]] signature: exact
    * |sig| when the sketch never filled; (k−1)/R otherwise, with R =
    * the kth minimum mapped to (0, 1] from the full signed-64 range. */
  def kmvDistinctEstimate(sig: Array[Long], k: Int): Double =
    if (sig.length < k) sig.length.toDouble
    else {
      val r = (sig(k - 1).toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      (k - 1) / math.max(r, java.lang.Double.MIN_VALUE)
    }

  /** [[kmvDistinctEstimate]] for NON-NEGATIVE 60-bit hashes (the
    * md5-prefix keys [[Dedup.corpusOverlapSketch]] uses so its DuckDB
    * oracle can replay the hash): n̂ = (k−1)·2⁶⁰ / h₍ₖ₎. The expression
    * multiplies BEFORE dividing — (k−1)·2⁶⁰ is exact in double for any
    * practical k — so an engine replaying `(k-1) * 2^60 / h` gets the
    * bit-identical result. */
  def kmvDistinctEstimate60(sig: Array[Long], k: Int): Double =
    if (sig.length < k) sig.length.toDouble
    else (k - 1).toDouble * 1152921504606846976.0d / sig(k - 1).toDouble
}
