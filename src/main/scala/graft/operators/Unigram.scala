package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed unigram-LM tokenizer training (Kudo 2018 — the
  * SentencePiece unigram model; public algorithm) — the EM sibling of
  * [[Bpe]]: instead of greedy merges, a probabilistic piece vocabulary
  * is fit by expectation-maximization over ALL segmentations of each
  * word, then pruned to the target size; encoding is the Viterbi best
  * segmentation. The reference ships tokenizer-adjacent text pipelines;
  * both trainers here serve the pretraining-data story
  * (`python/deeplake/__init__.pyi` text datasets feeding LM training).
  *
  * Scale shape (the same contract as [[Bpe]]): everything heavy runs on
  * the DISTINCT-WORD table (corpus collapses to word -> count first —
  * orders of magnitude smaller than the corpus, stays distributed).
  * Per EM round: ONE flatMap over the word table (each word runs an
  * O(|w|·maxPieceLen) forward-backward against the BROADCAST piece
  * table) + one hash-agg of expected counts; only the bounded
  * (<= seedSize rows) count table is collected. No driver-side corpus
  * pass anywhere.
  *
  * Determinism: EM is deterministic up to float-sum order; outputs
  * round log-probs to 9dp before ranking and tie-break on the piece
  * string, and the spec additionally gates run-to-run stability at
  * that precision. Viterbi tie-breaks prefer the LONGER first piece,
  * then lexicographic — fully specified, engine-independent.
  */
object Unigram {

  final case class Piece(piece: String, logProb: Double)

  final case class TrainResult(
      pieces: Seq[Piece],
      /** per-EM-round corpus log-likelihoods: first `emRounds` entries
        * are the seed-vocab phase (monotone non-decreasing — the EM
        * guarantee), the rest the post-prune phase (again monotone) */
      logLikelihoods: Seq[Double])

  private val LlKey = " __ll__"

  /** log(exp(a) + exp(b)) without overflow */
  private def logAdd(a: Double, b: Double): Double =
    if (a.isNegInfinity) b
    else if (b.isNegInfinity) a
    else if (a > b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  /** One word's forward-backward pass: returns (logZ, expected count
    * per piece over all segmentations). logZ = -inf when the word is
    * not coverable (cannot happen while single chars stay in vocab). */
  private[operators] def forwardBackward(w: String,
      logP: collection.Map[String, Double], maxLen: Int):
      (Double, Iterator[(String, Double)]) = {
    val n = w.length
    val f = Array.fill(n + 1)(Double.NegativeInfinity)
    val b = Array.fill(n + 1)(Double.NegativeInfinity)
    f(0) = 0.0; b(n) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val lp = logP.getOrElse(w.substring(j, i), Double.NegativeInfinity)
        if (!lp.isNegInfinity && !f(j).isNegInfinity)
          f(i) = logAdd(f(i), f(j) + lp)
        j += 1
      }
      i += 1
    }
    var j = n - 1
    while (j >= 0) {
      var i2 = math.min(n, j + maxLen)
      while (i2 > j) {
        val lp = logP.getOrElse(w.substring(j, i2), Double.NegativeInfinity)
        if (!lp.isNegInfinity && !b(i2).isNegInfinity)
          b(j) = logAdd(b(j), lp + b(i2))
        i2 -= 1
      }
      j -= 1
    }
    val logZ = f(n)
    if (logZ.isNegInfinity) (logZ, Iterator.empty)
    else {
      val acc = new scala.collection.mutable.HashMap[String, Double]()
      var s = 0
      while (s < n) {
        var e = s + 1
        val eMax = math.min(n, s + maxLen)
        while (e <= eMax) {
          val p = w.substring(s, e)
          val lp = logP.getOrElse(p, Double.NegativeInfinity)
          if (!lp.isNegInfinity && !f(s).isNegInfinity && !b(e).isNegInfinity) {
            val exp = math.exp(f(s) + lp + b(e) - logZ)
            if (exp > 0) acc.update(p, acc.getOrElse(p, 0.0) + exp)
          }
          e += 1
        }
        s += 1
      }
      (logZ, acc.iterator)
    }
  }

  /** Viterbi best segmentation; ties prefer the LONGER piece at the
    * earliest split, then lexicographic — fully deterministic. */
  def encodeWord(w: String, logP: collection.Map[String, Double],
      maxLen: Int): Seq[String] = {
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val bk = Array.fill(n + 1)(-1) // chosen start for position i
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val lp = logP.getOrElse(w.substring(j, i), Double.NegativeInfinity)
        if (!lp.isNegInfinity && !best(j).isNegInfinity) {
          val cand = best(j) + lp
          // strictly-better wins; an exact tie prefers the longer
          // piece ending here (smaller j); j scans ascending so the
          // first acceptance is the longest — keep it on ties
          if (cand > best(i)) { best(i) = cand; bk(i) = j }
        }
        j += 1
      }
      i += 1
    }
    if (best(n).isNegInfinity) Seq(w) // uncoverable: emit verbatim
    else {
      val out = List.newBuilder[String]
      val stack = scala.collection.mutable.ArrayBuffer.empty[String]
      var p = n
      while (p > 0) { stack += w.substring(bk(p), p); p = bk(p) }
      stack.reverseIterator.foreach(out += _)
      out.result()
    }
  }

  /** Seed inventory as an exact-count table (p, c): every single
    * character (coverage guarantee — chars are never pruned) PLUS the
    * `seedSize` most frequent multi-char substrings (length
    * 2..maxPieceLen, weighted by word count, count >= minCount, total
    * order (c desc, p)). This is the deterministic INTEGER half of
    * training — fully SQL-replayable (q_unigram_seed's oracle) — while
    * the float EM refinement over it stays spec-gated. One flatMap +
    * hash-agg over the distinct-word table. */
  def seedCounts(docs: DataFrame, textCol: String, maxPieceLen: Int = 6,
      seedSize: Int = 20000, minCount: Long = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    seedCountTable(Bpe.wordCounts(docs, textCol).as[(String, Long)],
      maxPieceLen, seedSize, minCount)
  }

  private def seedCountTable(words: Dataset[(String, Long)], maxPieceLen: Int,
      seedSize: Int, minCount: Long): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val subs = words.flatMap { case (w, c) =>
      for {
        s <- 0 until w.length
        e <- (s + 1) to math.min(w.length, s + maxPieceLen)
      } yield (w.substring(s, e), c)
    }.toDF("p", "c")
      .groupBy(col("p")).agg(sum(col("c")).as("c"))
    val chars = subs.filter(length(col("p")) === 1)
    val multi = subs.filter(length(col("p")) > 1 && col("c") >= minCount)
      .orderBy(col("c").desc, col("p")).limit(seedSize)
    chars.unionByName(multi)
  }

  /** Seed vocabulary log-probs from the [[seedCountTable]] inventory. */
  private def seed(words: Dataset[(String, Long)], maxPieceLen: Int,
      seedSize: Int, minCount: Long): Map[String, Double] = {
    val all = seedCountTable(words, maxPieceLen, seedSize, minCount)
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble)
    val total = all.map(_._2).sum
    all.map { case (p, c) => p -> math.log(c / total) }.toMap
  }

  /** Train a unigram-LM piece vocabulary of ~`vocabSize` pieces. */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 6, seedSize: Int = 20000, emRounds: Int = 3,
      minCount: Long = 2): TrainResult = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = Bpe.wordCounts(docs, textCol)
      .as[(String, Long)].localCheckpoint()

    var probs = seed(words, maxPieceLen, seedSize, minCount)
    val lls = Seq.newBuilder[Double]

    // one EM round: distributed E-step (flatMap + agg), driver M-step
    // over the bounded count table. The corpus log-likelihood rides
    // the same aggregation under a reserved key — no second job.
    def emRound(): Unit = {
      val bc = spark.sparkContext.broadcast(probs)
      val maxL = maxPieceLen
      val counts = words.flatMap { case (w, c) =>
        val (logZ, exp) = forwardBackward(w, bc.value, maxL)
        if (logZ.isNegInfinity) Iterator.empty
        else exp.map { case (p, e) => (p, e * c) } ++
          Iterator((LlKey, logZ * c))
      }.toDF("p", "e")
        .groupBy(col("p")).agg(sum(col("e")).as("e"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      bc.destroy()
      lls += counts.getOrElse(LlKey, Double.NegativeInfinity)
      val pieceCounts = counts - LlKey
      val total = pieceCounts.valuesIterator.sum
      // chars always survive (coverage); zero-expectation multi-char
      // pieces drop out of the model
      probs = probs.flatMap { case (p, _) =>
        val e = pieceCounts.getOrElse(p, 0.0)
        if (e > 0) Some(p -> math.log(e / total))
        else if (p.length == 1) Some(p -> math.log(Double.MinPositiveValue))
        else None
      }
    }

    (0 until emRounds).foreach(_ => emRound())
    // prune: keep the vocabSize most probable pieces (chars exempt),
    // 9dp-rounded prob + piece-name tie-break for determinism
    val chars = probs.filter(_._1.length == 1)
    val kept = probs.filter(_._1.length > 1).toSeq
      .map { case (p, lp) =>
        (p, BigDecimal(lp).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (p, lp) => (-lp, p) }
      .take(math.max(0, vocabSize - chars.size))
    probs = chars ++ kept
    (0 until emRounds).foreach(_ => emRound())

    val out = probs.toSeq
      .map { case (p, lp) =>
        Piece(p, BigDecimal(lp).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy(pc => (-pc.logProb, pc.piece))
    TrainResult(out, lls.result())
  }

  /** Viterbi-encode documents against a trained vocabulary:
    * (id, pieces array) — a map-side transform with the bounded piece
    * table broadcast, no shuffle. */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
      pieces: Seq[Piece], maxPieceLen: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      pieces.map(p => p.piece -> p.logProb).toMap)
    val maxL = maxPieceLen
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .map { case (id, t) =>
        val ps = t.split("\\s+").filter(_.nonEmpty).toSeq
          .flatMap(w => encodeWord(w, bc.value, maxL))
        (id, ps)
      }
      .toDF("id", "pieces")
  }
}
