package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed WordPiece tokenizer training (Schuster & Nakajima 2012;
  * the BERT tokenizer) — the third member of the trainer triad next to
  * [[Bpe]] (count-scored merges) and [[Unigram]] (EM-pruned vocabulary).
  * WordPiece merges like BPE but scores a candidate pair by LIKELIHOOD
  * GAIN, count(ab) / (count(a)·count(b)) — the merge that most
  * increases corpus probability under a unigram model, which prefers
  * pairs whose parts rarely occur apart over merely frequent pairs.
  *
  * Uses BERT's `##` continuation scheme: a word's first symbol is bare,
  * every later symbol carries the `##` prefix, and merging `a + ##b`
  * yields `ab` (continuations merge to `##ab`). No end-of-word marker.
  *
  * Scale shape: identical to [[Bpe.train]] — training runs over the
  * DISTINCT-WORD table (corpus collapses to word → count first), each
  * round is one flatMap + two hash-aggs (adjacent-pair counts and unit
  * symbol counts, both map-side combined) and collects exactly ONE
  * argmax row; re-segmentation is a map-side Dataset transform with
  * localCheckpoint lineage truncation. Encoding greedy-longest-matches
  * each DISTINCT word once against the broadcast vocabulary, then the
  * corpus equi-joins that table — no per-occurrence re-segmentation.
  *
  * Determinism: pair and unit counts are exact long sums; the score is
  * the one double division both the trainer and the single-node
  * reference in WordPieceSpec compute identically; argmax tie-breaks on
  * (score desc, pair count desc, left asc, right asc). No SQL oracle —
  * like BPE/Unigram, the gate is the spec's independent reference. */
object WordPiece {

  final case class Merge(rank: Int, left: String, right: String,
      pairCount: Long, score: Double)

  /** BERT-style initial symbols: bare first char, ##-prefixed rest. */
  def initialSymbols(w: String): Seq[String] =
    w.headOption.map(_.toString).toSeq ++ w.drop(1).map("##" + _)

  /** join two adjacent symbols under the ## scheme */
  def joinSyms(l: String, r: String): String = l + r.stripPrefix("##")

  /** leftmost-first merge of adjacent (l, r) pairs */
  def mergePair(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i + 1 < n && syms(i) == l && syms(i + 1) == r) {
        out += joinSyms(l, r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train `numMerges` WordPiece merges; returns them in rank order.
    * The final vocabulary is the initial alphabet plus one symbol per
    * merge — [[vocabulary]] assembles it. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      checkpointEvery: Int = 8): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words: Dataset[(Seq[String], Long)] = Bpe.wordCounts(docs, textCol)
      .as[(String, Long)]
      .map { case (w, c) => (initialSymbols(w), c) }
      .localCheckpoint()

    val merges = Seq.newBuilder[Merge]
    var lastCheckpoint = words
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val pairs = words
        .flatMap { case (syms, c) =>
          if (syms.length < 2) Iterator.empty
          else syms.iterator.zip(syms.iterator.drop(1)).map { case (a, b) => (a, b, c) }
        }
        .toDF("l", "r", "c")
        .groupBy(col("l"), col("r")).agg(sum(col("c")).as("pc"))
      val units = words
        .flatMap { case (syms, c) => syms.iterator.map(s => (s, c)) }
        .toDF("s", "c")
        .groupBy(col("s")).agg(sum(col("c")).as("uc"))
      // units is bounded by the SYMBOL inventory (alphabet + one entry
      // per merge), never by the word table — broadcast both probes so
      // the pair table never exchanges between its agg and the argmax
      val best = pairs
        .join(broadcast(units.withColumnRenamed("s", "l").withColumnRenamed("uc", "lc")), "l")
        .join(broadcast(units.withColumnRenamed("s", "r").withColumnRenamed("uc", "rc")), "r")
        .withColumn("score",
          col("pc").cast("double") / (col("lc").cast("double") * col("rc").cast("double")))
        .orderBy(col("score").desc, col("pc").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val row = best(0)
        val (l, r) = (row.getAs[String]("l"), row.getAs[String]("r"))
        merges += Merge(rank, l, r, row.getAs[Long]("pc"), row.getAs[Double]("score"))
        words = words.map { case (syms, c) => (mergePair(syms, l, r), c) }
        if ((rank + 1) % checkpointEvery == 0) {
          words = words.localCheckpoint()
          lastCheckpoint.unpersist()
          lastCheckpoint = words
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** merge table as a DataFrame (rank, left, right, pair_count, score 9dp) */
  def trainDF(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, numMerges).toDF()
      .select(col("rank"), col("left"), col("right"),
        col("pairCount").as("pair_count"), round(col("score"), 9).as("score"))
  }

  /** final vocabulary: the corpus alphabet (bare + ## forms) plus one
    * joined symbol per merge, in deterministic order */
  def vocabulary(docs: DataFrame, textCol: String, merges: Seq[Merge]): Seq[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val alphabet = Bpe.wordCounts(docs, textCol).as[(String, Long)]
      .flatMap { case (w, _) => initialSymbols(w) }
      .distinct().collect().sorted
    (alphabet ++ merges.sortBy(_.rank).map(m => joinSyms(m.left, m.right))).distinct
  }

  /** Greedy longest-match-first encode of one word against a vocab —
    * the standard WordPiece inference step (BERT's WordpieceTokenizer):
    * repeatedly take the LONGEST vocab entry prefixing the remainder
    * (continuations tried with `##`); any dead end makes the whole word
    * `[UNK]`. */
  def encodeWord(w: String, vocab: Set[String], unk: String = "[UNK]"): Seq[String] = {
    val out = Seq.newBuilder[String]
    var start = 0
    while (start < w.length) {
      var end = w.length
      var piece: String = null
      while (end > start && piece == null) {
        val cand = (if (start > 0) "##" else "") + w.substring(start, end)
        if (vocab.contains(cand)) piece = cand else end -= 1
      }
      if (piece == null) return Seq(unk)
      out += piece
      start = end
    }
    out.result()
  }

  /** Doc-level encode: each DISTINCT word greedy-matched once, then the
    * pos-exploded corpus equi-joins the (broadcast) segmentation table
    * and one per-doc re-agg restores order — the [[Bpe.encodeDocs]]
    * shape. Output: (id, n_words, n_pieces, n_unk, pieces). */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocabSet = vocab.toSet
    val seg = docs.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .as[String]
      .map { w =>
        val pieces = encodeWord(w, vocabSet)
        (w, pieces.mkString(" "), pieces.length,
          if (pieces == Seq("[UNK]")) 1 else 0)
      }
      .toDF("w", "segmentation", "n_pieces", "n_unk")
    docs.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\\s+")).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
      .join(broadcast(seg), Seq("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).cast("long").as("n_pieces"),
        sum(col("n_unk")).cast("long").as("n_unk"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("segmentation")))),
          s => s.getField("segmentation"))).as("pieces"))
  }
}
