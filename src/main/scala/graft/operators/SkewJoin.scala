package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Salted equi-join for pathologically skewed keys.
  *
  * A hash join shuffles both sides by key, so one hot key (a null-ish
  * default id, a "deleted" sentinel, a viral document) lands its entire
  * volume on ONE reducer: at 100 TB that task runs for hours while the
  * other 999 executors idle. AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin`) already rescues sort-merge joins at
  * runtime; salting is the PLANNED fix for the cases AQE can't touch —
  * e.g. when the skewed side feeds an aggregation on the same key, or
  * the join is forced into a shuffled-hash strategy.
  *
  * Mechanics: the big (skewed) side gets a uniform salt in [0, n); the
  * other side is replicated n times, once per salt value; the join key
  * becomes (key, salt), spreading each hot key over n reducers. Rows and
  * results are identical to the unsalted join for inner/left joins keyed
  * on the big side — replication only multiplies the MATCH opportunities
  * that the salt then partitions.
  *
  * `numSalts` trades replication volume (n x the small side's shuffle)
  * for parallelism (n-way split of each hot key): at scale pick
  * n ≈ hot-key volume / healthy-partition size.
  */
object SkewJoin {

  /** Inner/left equi-join `big.key = small.key` with an n-way salt on
    * the big side. `small` is replicated n times (keep it the smaller
    * side). joinType: "inner" or "left". */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      numSalts: Int, joinType: String = "inner"): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting preserves semantics for inner/left joins only, got $joinType")
    // deterministic per-row salt: spreads each key's rows uniformly
    // without an RNG (reruns and retried tasks agree)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(numSalts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase salted aggregation for hot grouping keys: partial
    * aggregate on (key, salt), then final merge on key. `aggs` maps
    * output column -> (partialAgg, finalMerge) — e.g. count is
    * (count(x), sum(partial)). Spark's map-side partial aggregation
    * usually makes this unnecessary; it pays off when the partial state
    * itself is large (collect_list/set, large sketches) and one reducer
    * would otherwise hold a hot key's entire state. */
  def saltedAgg(df: DataFrame, key: String, numSalts: Int,
      partial: Seq[Column], finalMerge: Seq[Column]): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(numSalts)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(finalMerge.head, finalMerge.tail: _*)
}
