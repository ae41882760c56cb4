package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge training — the tokenizer-
  * training step of a pretraining data pipeline (Sennrich et al. 2016,
  * public algorithm; semantics match the standard word-frequency
  * formulation used by common tokenizer trainers).
  *
  * Scale shape: training runs over the DISTINCT-WORD table (corpus
  * tokens collapse to word -> count first), which is orders of magnitude
  * smaller than the corpus and stays distributed throughout. Each merge
  * round is one explode + hash-agg (map-side combine) to score adjacent
  * symbol pairs; only the single argmax row is collected per round.
  * Word re-segmentation is a map-side Dataset transform; lineage is
  * truncated with localCheckpoint so round N's plan does not replay
  * rounds 0..N-1.
  *
  * Determinism: pair scores are exact long sums; argmax tie-breaks on
  * (count desc, left asc, right asc); merging is leftmost-first. Output
  * is therefore engine-independent — the spec gates it against an
  * independent single-node reference implementation.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, score: Long)

  /** split a word into initial symbols: one per character, plus a
    * trailing end-of-word marker so merges cannot cross word ends */
  def initialSymbols(w: String, endOfWord: String): Seq[String] =
    w.map(_.toString) :+ endOfWord

  /** leftmost-first merge of adjacent (l, r) pairs in a symbol sequence */
  def mergePair(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i + 1 < n && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** word -> count table for a corpus (whitespace tokens) */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))

  /** Train `numMerges` BPE merges over the corpus; returns the ordered
    * merge table. `checkpointEvery` bounds lineage depth. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      endOfWord: String = "</w>", checkpointEvery: Int = 8): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val eow = endOfWord
    var words: Dataset[(Seq[String], Long)] = wordCounts(docs, textCol)
      .as[(String, Long)]
      .map { case (w, c) => (initialSymbols(w, eow), c) }
      .localCheckpoint()

    val merges = Seq.newBuilder[Merge]
    var lastCheckpoint = words
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val best = words
        .flatMap { case (syms, c) =>
          if (syms.length < 2) Iterator.empty
          else syms.iterator.zip(syms.iterator.drop(1)).map { case (a, b) => (a, b, c) }
        }
        .toDF("l", "r", "c")
        .groupBy(col("l"), col("r")).agg(sum(col("c")).as("score"))
        .orderBy(col("score").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val row = best(0)
        val (l, r, score) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += Merge(rank, l, r, score)
        words = words.map { case (syms, c) => (mergePair(syms, l, r), c) }
        if ((rank + 1) % checkpointEvery == 0) {
          words = words.localCheckpoint() // eager: materializes before we drop the old one
          lastCheckpoint.unpersist()
          lastCheckpoint = words
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** merge table as a DataFrame (rank, left, right, score) */
  def trainDF(spark: SparkSession, docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    import spark.implicits._
    train(docs, textCol, numMerges).toDF()
      .select(col("rank"), col("left"), col("right"), col("score"))
  }

  /** Segment words with a trained merge list: apply merges in rank
    * order to each word (the standard encode step). Map-side only. */
  def segment(docs: DataFrame, textCol: String, merges: Seq[Merge],
      endOfWord: String = "</w>"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ordered = merges.sortBy(_.rank).map(m => (m.left, m.right))
    val eow = endOfWord
    docs.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .as[String]
      .map { w =>
        val syms = ordered.foldLeft(initialSymbols(w, eow)) {
          case (s, (l, r)) => mergePair(s, l, r)
        }
        (w, syms.mkString(" "), syms.length)
      }
      .toDF("w", "segmentation", "n_symbols")
  }

  /** Doc-level BPE encode — the tokenizer-APPLY step over the corpus:
    * every doc's token stream becomes its subword stream. Each DISTINCT
    * word is segmented exactly once ([[segment]] runs over the distinct-
    * word table, the same collapse [[train]] uses), then the corpus's
    * pos-exploded tokens equi-join that segmentation table (distinct
    * words ≪ corpus, so the join broadcasts) and ONE per-doc re-agg
    * restores token order map-side — no per-occurrence re-segmentation,
    * no window over the corpus.
    * Output: (id, n_words, n_subwords, subwords — space-joined). */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge], endOfWord: String = "</w>"): DataFrame = {
    val seg = segment(docs, textCol, merges, endOfWord)
      .select(col("w"), col("segmentation"), col("n_symbols"))
    docs.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\\s+")).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
      .join(broadcast(seg), Seq("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_symbols")).as("n_subwords"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("segmentation")))),
          s => s.getField("segmentation"))).as("subwords"))
  }
}
