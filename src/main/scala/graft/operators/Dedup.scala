package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import TextAnalysis._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash buckets, n-gram Jaccard with length blocking,
  * embedding-cosine near-dup.
  *
  * Scale design notes (100 TB):
  *  - exact dedup is one hash-shuffle on md5(text) — never on raw text,
  *    so shuffle rows are fixed-width
  *  - near-dup never goes all-pairs: candidates come from equi-joinable
  *    keys (LSH band keys, simhash buckets, length buckets), each a plain
  *    shuffle join; only candidate pairs pay the exact-verify cost
  *  - pair enumeration within a bucket uses a self-equi-join on the
  *    bucket key; skewed buckets would salt-split first (a bucket with
  *    millions of identical docs is itself a finding)
  */
object Dedup {

  /** one-row corpus duplication profile */
  def exactStats(docs: DataFrame, textCol: String): DataFrame = {
    val perText = docs.groupBy(md5(col(textCol)).as("h")).agg(count(lit(1)).as("c"))
    perText.agg(
      sum(col("c")).as("n_docs"),
      count(lit(1)).as("n_unique"),
      sum(when(col("c") > 1, 1).otherwise(0)).as("n_dup_groups"),
      sum(when(col("c") > 1, col("c") - 1).otherwise(0)).as("n_redundant"))
  }

  /** exact dedup keeper mapping: every duplicated doc -> kept (min) id */
  def exactDupMapping(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("h"))
    docs.select(col(idCol).as("id"), md5(col(textCol)).as("h"))
      .withColumn("keeper", min(col("id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .filter(col("group_size") > 1 && col("id") =!= col("keeper"))
      .select(col("id").as("dropped_id"), col("keeper").as("kept_id"))
  }

  /** (id, shingle-set, blocking key) prep shared by near-dup variants */
  private def shingled(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), length(col(textCol)).as("len"),
      shingles(tokens(col(textCol))).as("sh"))

  /** exact n-gram Jaccard near-dup pairs over the WHOLE corpus via an
    * inverted shingle index: explode to (shingle, id) postings, self-join
    * on the shingle to count common shingles per pair, then
    * jac = common / (|A| + |B| - common) — exact, and never materializes
    * a per-pair array intersection. Cost is sum over shingles of df^2
    * (rare-shingle dominated); a pathological hot shingle would be
    * salted/split before the join at real scale. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val s = shingled(docs, idCol, textCol)
    val sizes = s.select(col("id"), size(col("sh")).as("cnt"))
    val posts = s.select(col("id"), explode(col("sh")).as("shingle"))
    val common = posts.as("a").join(posts.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(broadcast(sizes.select(col("id").as("id_a"), col("cnt").as("cnt_a"))), "id_a")
      .join(broadcast(sizes.select(col("id").as("id_b"), col("cnt").as("cnt_b"))), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("c").cast("double") / (col("cnt_a") + col("cnt_b") - col("c")), 6).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** MinHash + LSH near-dup pairs: md5-string minhash signature,
    * `numHashes/rowsPerBand` band keys, candidates = docs sharing any
    * band key, verified with exact shingle Jaccard >= threshold. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val s = shingled(docs, idCol, textCol)
    val sig = minhashSig(col("sh"), numHashes)
    val bands = bandKeys(sig, rowsPerBand)
    // carry only (id, band) through the candidate join; shingle sets
    // rejoin afterwards for the (much smaller) verify step
    val banded = s.select(col("id"),
      posexplode(array(bands: _*)).as(Seq("band_idx", "band_key")))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(s.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(s.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** SimHash bucket groups: docs sharing a 16-bit simhash signature */
  def simhashBuckets(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), simhash16(tokens(col(textCol))).as("sig"))
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("n"), sort_array(collect_list(col("id"))).as("member_ids"))
      .filter(col("n") > 1)

  /** embedding-cosine near-dup pairs. Exact all-pairs within blocks is
    * O(n^2); at scale route through AnnIndex cluster assignment first
    * (same-cluster candidates only). Here: brute pairs, id_a < id_b. */
  def embeddingNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(graft.functions.gf.cosine_similarity(col("v_a"), col("v_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") > threshold)
  }
}
