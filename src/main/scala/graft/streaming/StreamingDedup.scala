package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, TextAnalysis}

/** Streaming near-duplicate detection: [[Dedup.minhashLshPairs]]
  * maintained incrementally over an unbounded document stream — the
  * ingestion-time dedup a training-data pipeline runs so near-dups are
  * caught as documents ARRIVE, not in a nightly batch (the reference
  * keeps its indexes fresh the same way: `cpp/deeplake_pg/
  * sync_worker.cpp` background sync).
  *
  * LSM-style like [[StreamingText]]: state lives in a persisted
  * artifact (band-key postings + hashed shingle sets + verified
  * pairs), NOT the Spark state store, so executor memory stays flat
  * regardless of history size. Per micro-batch the COMPUTE is
  * O(batch + matches), on top of one columnar scan of the postings
  * table for the cross-batch join (O(history) IO — the cost every
  * index-file design pays without a point-lookup store; amortized by
  * batch size and bounded by periodic postings compaction):
  *   - batch-internal pairs via the batch LSH (same salted band join
  *     as the batch operator),
  *   - cross-batch CANDIDATES via one equi-join of the batch's band
  *     keys against the persisted postings (history is never
  *     re-shingled),
  *   - only candidates pay the exact-Jaccard verify, with history's
  *     shingle sets read from the artifact,
  *   - then the batch's postings + shingles APPEND (a handful of new
  *     parquet files; nothing read-modify-writes).
  * Band layout and signature math are identical to the batch
  * operator, so stream-accumulated pairs equal the single-shot batch
  * result on the same corpus (spec-gated).
  */
object StreamingDedup {

  /** (id, sh) shingle sets + (id, band_idx, band_key) postings for a
    * batch — same native MinHash signature and grouped band layout as
    * [[Dedup.minhashLshPairs]] / [[TextAnalysis.bandKeys]]. */
  private def shinglesAndBands(docs: DataFrame, idCol: String,
      textCol: String, numHashes: Int, rowsPerBand: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.graft.Bridge
    val s = docs
      .select(col(idCol).cast("long").as("id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("id"), TextAnalysis.shingles(col("__toks")).as("sh"))
    val withSig = s.select(col("id"),
      Bridge.column(graft.functions.MinHashSignature(
        Bridge.expression(col("sh")), numHashes)).as("__sig"))
    val bands = (0 until numHashes).grouped(rowsPerBand).map { idxs =>
      md5(concat(idxs.map(i => element_at(col("__sig"), i + 1)): _*))
    }.toSeq
    val banded = withSig.select(col("id"),
      posexplode(array(bands: _*)).as(Seq("band_idx", "band_key")))
    (s, banded)
  }

  def maintainNearDup(stream: DataFrame, dir: String, idCol: String,
      textCol: String, threshold: Double, checkpoint: String,
      numHashes: Int = 8, rowsPerBand: Int = 2): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        absorbNearDupBatch(batch, Lsm.segmentKey(checkpoint, batchId), dir,
          idCol, textCol, threshold, numHashes, rowsPerBand)
        ()
      }
      .start()

  /** One batch's near-dup absorb, batch-id keyed so an at-least-once
    * foreachBatch replay is EXACT: the history view excludes the
    * batch's own first-delivery segments (else the replay would
    * candidate-join the batch against its own postings — the
    * self-join the original "pairs first, then state" ordering
    * prevented) and every write rewrites `batch=<id>` instead of
    * appending a second copy. Package-private so the replay spec can
    * drive it directly. */
  private[graft] def absorbNearDupBatch(batch: DataFrame, segKey: String,
      dir: String, idCol: String, textCol: String, threshold: Double,
      numHashes: Int, rowsPerBand: Int): Unit = {
    val spark = batch.sparkSession
    val (s0, banded0) = shinglesAndBands(batch, idCol, textCol,
      numHashes, rowsPerBand)
    // shingle/sign the batch ONCE; both the pair math and the
    // artifact writes read the materialized forms
    val s = s0.localCheckpoint()
    val banded = banded0.localCheckpoint()
    val internal = Dedup.minhashLshPairs(batch, idCol, textCol,
      threshold, numHashes, rowsPerBand)
    // BOTH history dirs must exist: a batch-0 first delivery that crashed
    // between the postings and shingles absorbs leaves postings without
    // shingles, and a replay guarded on postings alone would wedge forever
    // on PATH_NOT_FOUND reading shingles (history is genuinely empty then —
    // every postings row is the replay's own excluded segment)
    val cross =
      if (!Lsm.exists(s"$dir/postings") ||
          !Lsm.exists(s"$dir/shingles")) internal.limit(0)
      else {
        val hist = Lsm.readSegmentsExcept(spark, s"$dir/postings", segKey)
        val histSh = Lsm.readSegmentsExcept(spark, s"$dir/shingles", segKey)
        banded
          .join(hist.select(col("id").as("old_id"),
            col("band_idx"), col("band_key")), Seq("band_idx", "band_key"))
          .select(col("old_id"), col("id").as("new_id"))
          .filter(col("old_id") =!= col("new_id"))
          .distinct()
          .join(histSh.select(col("id").as("old_id"), col("sh").as("sh_a")), "old_id")
          .join(s.select(col("id").as("new_id"), col("sh").as("sh_b")), "new_id")
          .select(
            least(col("old_id"), col("new_id")).as("id_a"),
            greatest(col("old_id"), col("new_id")).as("id_b"),
            round(TextAnalysis.jaccard(col("sh_a"), col("sh_b")), 6).as("jac"))
          .filter(col("jac") >= threshold)
      }
    Lsm.absorbSegment(internal.unionByName(cross), s"$dir/pairs", segKey)
    Lsm.absorbSegment(banded, s"$dir/postings", segKey)
    Lsm.absorbSegment(s, s"$dir/shingles", segKey)
  }

  /** all near-dup pairs found so far (accumulates across batches) */
  def currentPairs(spark: SparkSession, dir: String): DataFrame =
    Lsm.readSegments(spark, s"$dir/pairs")

  /** duplicate GROUPS over everything seen so far: connected components
    * of the accumulated pair table. The pair table is matches-sized
    * (tiny next to the corpus), so recomputing components on read is
    * cheap; stream-accumulated pairs equal the batch operator's, so
    * these components equal the batch components (spec-gated). */
  def currentComponents(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(currentPairs(spark, dir), "id_a", "id_b")

  /** EXACT dedup across the entire stream history with no state-store
    * growth (Spark's own `dropDuplicates` needs a watermark or keeps
    * every key in executor state forever): the seen-hash set lives in a
    * persisted parquet table of fixed-width md5 rows. Per batch:
    * collapse within-batch duplicates (min-id keeper per hash), ANTI-
    * JOIN the batch's hashes against the seen set (a plain hash join —
    * at any history size the shuffled rows are fixed-width hashes, and
    * the batch side broadcasts; the seen-set scan is O(history) IO per
    * batch, amortized by batch size), emit survivors to `dir/unique`,
    * append their (hash, keeper id) rows. First arrival wins
    * (dedupe-on-ingest).
    *
    * DELETE mirrors append ([[deleteFromExactDedup]]): a tombstoned
    * keeper vanishes from [[currentUnique]] AND its hash re-opens at
    * ingest (the seen-set anti-joins the tombstones), so a later
    * arrival of the same text is admitted — exactly the rebuild-without
    * semantics, with no history rewrite. */
  def maintainExactDedup(stream: DataFrame, dir: String, idCol: String,
      textCol: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        absorbExactDedupBatch(batch, Lsm.segmentKey(checkpoint, batchId),
          dir, idCol, textCol)
        ()
      }
      .start()

  /** One batch's exact-dedup absorb, batch-id keyed like every other
    * maintainer here: an at-least-once replay that crashed between the
    * unique and hashes writes would otherwise re-anti-join against a
    * seen-set missing this batch, recompute the same survivors, and
    * APPEND them a second time — duplicating `dir/unique` forever. With
    * keyed absorbs (own segment excluded from the seen-set view) the
    * replay rewrites its own segments instead. Package-private so the
    * replay spec can drive it directly. */
  private[graft] def absorbExactDedupBatch(batch: DataFrame, segKey: String,
      dir: String, idCol: String, textCol: String): Unit = {
    val spark = batch.sparkSession
    // a restarted maintainer must FIRST complete any compaction swap
    // interrupted mid-[[Lsm.swapInAll]]: absorbing into a stale live dir
    // would let the next reader's recoverAll rmTree this batch's
    // already-checkpoint-committed segment while finishing the commit —
    // silent data loss, not a replay
    Lsm.recoverAll(dir, Seq("unique", "hashes"))
    val hashed = batch.withColumn("__h", md5(col(textCol)))
    val keepers = hashed
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__h")).orderBy(col(idCol))))
      .filter(col("__rk") === 1).drop("__rk")
    val fresh =
      (if (!Lsm.exists(s"$dir/hashes")) keepers
       else keepers.join(
         Lsm.dropTombstoned(spark, dir,
           Lsm.readSegmentsExcept(spark, s"$dir/hashes", segKey), "id")
           .select(col("__h")),
         Seq("__h"), "left_anti"))
        .localCheckpoint()
    Lsm.absorbSegment(fresh.drop("__h"), s"$dir/unique", segKey)
    Lsm.absorbSegment(fresh.select(col("__h"), col(idCol).as("id")),
      s"$dir/hashes", segKey)
  }

  def currentUnique(spark: SparkSession, dir: String,
      idCol: String = "doc_id"): DataFrame = {
    Lsm.recoverAll(dir, Seq("unique", "hashes"))
    Lsm.dropTombstoned(spark, dir,
      Lsm.readSegments(spark, s"$dir/unique"), idCol)
  }

  /** Tombstone previously-emitted keepers (one appended id segment).
    * Readers fold it; the next batches may re-admit the same text. */
  def deleteFromExactDedup(spark: SparkSession, dir: String,
      ids: DataFrame, idKey: String): Unit =
    Lsm.tombstone(ids, idKey, dir)

  /** Stop-the-world LSM merge for the exact-dedup state: rewrite
    * `unique` and `hashes` minus the tombstones as one segment each and
    * drop the tombstones. Caller pauses the maintainer first.
    * `unique` and `hashes` are ONE logical state (the seen-set and its
    * keepers), so both dirs commit through the [[Lsm.swapInAll]] marker
    * protocol — two independent swapIns would let a crash between them
    * strand a stale `hashes__compact` that a later recover could move
    * into place, regressing the seen-set and re-admitting duplicates. */
  def compactExactDedup(spark: SparkSession, dir: String,
      idCol: String): Unit = {
    currentUnique(spark, dir, idCol)
      .write.mode("overwrite").parquet(s"$dir/unique__compact/batch=compact")
    Lsm.dropTombstoned(spark, dir,
      Lsm.readSegments(spark, s"$dir/hashes"), "id")
      .write.mode("overwrite").parquet(s"$dir/hashes__compact/batch=compact")
    Lsm.swapInAll(dir, Seq("unique", "hashes"))
  }

  /** Streaming CHUNK-level dedup (the paragraph dedup of
    * [[Dedup.chunkDedup]] at ingest time): the seen-set is chunk
    * hashes, so a new document sheds the boilerplate blocks history
    * already owns the moment it lands. Per batch: chunk map-side,
    * pick the within-batch first occurrence per hash (min (id, idx) —
    * the batch operator's keeper rule), anti-join the fixed-width
    * hashes against the persisted seen set, rebuild EVERY batch doc
    * from its surviving chunks, emit to `dir/docs`, append the
    * survivors' hashes. For id-ordered arrival the accumulated output
    * equals the batch operator on the full corpus (spec-gated across a
    * mid-corpus split). */
  def maintainChunkDedup(stream: DataFrame, dir: String, idCol: String,
      textCol: String, chunkWords: Int, checkpoint: String): StreamingQuery =
    maintainChunkDedupFrom(stream, dir,
      batch => graft.operators.TextAnalysis
        .chunkTokens(batch, idCol, textCol, chunkWords, 0)
        .select(col(idCol).as("id"), col("chunk_idx"), col("chunk_text")),
      sep = " ", checkpoint = checkpoint)

  /** [[maintainChunkDedup]] over ANY per-batch chunker (`batch →
    * (id, chunk_idx, chunk_text)`) — fixed token windows or the
    * content-defined chunkers ([[graft.operators.TextAnalysis.cdcChunks]]
    * / `gearChunks` with `sep = ""`), mirroring the batch
    * [[Dedup.chunkDedupFrom]] generalization. */
  def maintainChunkDedupFrom(stream: DataFrame, dir: String,
      chunker: DataFrame => DataFrame, sep: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        absorbChunkBatch(batch, Lsm.segmentKey(checkpoint, batchId), dir,
          chunker, sep)
        ()
      }
      .start()

  /** One batch's chunk-dedup absorb, batch-id keyed: the seen-set view
    * excludes the batch's own first-delivery hash segment — a plain
    * replay would find every batch chunk "already seen" and rebuild
    * every doc EMPTY while appending the docs a second time. With the
    * exclusion the replay recomputes the identical rebuild and
    * rewrites its own segments. Package-private for the replay spec. */
  private[graft] def absorbChunkBatch(batch: DataFrame, segKey: String,
      dir: String, chunker: DataFrame => DataFrame, sep: String): Unit = {
    val spark = batch.sparkSession
    val chunks = chunker(batch)
      .select(col("id"), col("chunk_idx"), col("chunk_text"),
        md5(col("chunk_text")).as("__h"))
      .localCheckpoint()
    val keeper = chunks.groupBy(col("__h"))
      .agg(min(struct(col("id"), col("chunk_idx"))).as("__keep"))
    val freshKeeper =
      (if (!Lsm.exists(s"$dir/chunk_hashes")) keeper
       else keeper.join(
         Lsm.readSegmentsExcept(spark, s"$dir/chunk_hashes", segKey),
         Seq("__h"), "left_anti"))
        .localCheckpoint()
    val rebuilt = chunks.join(freshKeeper, Seq("__h"), "left")
      .withColumn("__kept", col("__keep.id") === col("id") &&
        col("__keep.chunk_idx") === col("chunk_idx"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_kept"),
        array_sort(collect_list(when(col("__kept"),
          struct(col("chunk_idx"), col("chunk_text"))))).as("__surv"))
      .withColumn("text_clean",
        when(col("n_kept") > 0, array_join(
          transform(col("__surv"), _.getField("chunk_text")), sep)))
      .drop("__surv")
    Lsm.absorbSegment(rebuilt, s"$dir/docs", segKey)
    Lsm.absorbSegment(freshKeeper.select(col("__h")),
      s"$dir/chunk_hashes", segKey)
  }

  /** every streamed doc's rebuilt form so far */
  def currentChunkDeduped(spark: SparkSession, dir: String): DataFrame =
    Lsm.readSegments(spark, s"$dir/docs")

  /** Streaming BOILERPLATE dedup (the drop-everywhere
    * [[Dedup.boilerplateDedupFrom]] at ingest): state is the per-batch
    * (chunk-hash, distinct-doc count) partials — algebraic under SUM,
    * so segments absorb O(delta) with no history re-chunking. A chunk
    * is dropped from a batch's docs when its ACCUMULATED document
    * frequency (history + this batch) reaches `minDf`.
    *
    * ARRIVAL-TIME semantics, stated plainly: a doc emitted before its
    * chunk crossed the df threshold keeps that chunk forever (streaming
    * emit cannot retroactively rewrite history) — the same one-sided
    * contract as [[maintainExactDedup]]'s first-arrival-wins. When
    * every batch alone carries >= minDf copies of the boilerplate, the
    * accumulated output equals the batch operator exactly (spec-gated).
    * Contract: a document's chunks arrive within ONE batch (docs are
    * batch-atomic), else its df partials double-count. */
  def maintainBoilerplateDedup(stream: DataFrame, dir: String,
      chunker: DataFrame => DataFrame, sep: String, minDf: Int,
      checkpoint: String,
      exempt: org.apache.spark.sql.Column = lit(false)): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        absorbBoilerplateBatch(batch, Lsm.segmentKey(checkpoint, batchId),
          dir, chunker, sep, minDf, exempt)
        ()
      }
      .start()

  /** One batch's boilerplate absorb, batch-id keyed: the df view
    * excludes the batch's own first-delivery segment, so a replay
    * recomputes the identical rebuild and rewrites its own segments.
    * Package-private for the replay spec. */
  private[graft] def absorbBoilerplateBatch(batch: DataFrame, segKey: String,
      dir: String, chunker: DataFrame => DataFrame, sep: String,
      minDf: Int,
      exempt: org.apache.spark.sql.Column = lit(false)): Unit = {
    require(minDf >= 2, "minDf < 2 would drop every chunk")
    val spark = batch.sparkSession
    // `exempt` mirrors the batch operator's parameter (blank lines are
    // STRUCTURE): exempt chunks never count toward df and always survive
    val chunks = chunker(batch)
      .select(col("id"), col("chunk_idx"), col("chunk_text"),
        md5(col("chunk_text")).as("__h"), exempt.as("__ex"))
      .localCheckpoint()
    val dfPart = chunks.filter(!col("__ex")).groupBy(col("__h"))
      .agg(countDistinct(col("id")).as("nd"))
      .localCheckpoint()
    val histNd =
      (if (!Lsm.exists(s"$dir/chunk_df"))
         dfPart.select(col("__h"), col("nd")).limit(0)
       else Lsm.readSegmentsExcept(spark, s"$dir/chunk_df", segKey))
        .groupBy(col("__h")).agg(sum(col("nd")).as("h_nd"))
    val total = dfPart.join(histNd, Seq("__h"), "left")
      .select(col("__h"),
        (col("nd") + coalesce(col("h_nd"), lit(0L))).as("t_nd"))
    val rebuilt = graft.operators.Dedup.rebuildFromMarked(
      chunks.join(total, Seq("__h"), "left")
        .withColumn("__kept",
          col("__ex") || coalesce(col("t_nd") < minDf, lit(true))), sep)
    Lsm.absorbSegment(rebuilt, s"$dir/docs", segKey)
    Lsm.absorbSegment(dfPart, s"$dir/chunk_df", segKey)
  }

  /** every streamed doc's boilerplate-filtered form so far */
  def currentBoilerplateDeduped(spark: SparkSession, dir: String): DataFrame =
    Lsm.readSegments(spark, s"$dir/docs")

  // ------------------------------------------------------ decontamination

  /** Streaming cross-corpus decontamination — the ingestion-time form of
    * [[Dedup.crossCorpusContainmentBloom]]: the eval suite is FIXED, so
    * its shingle postings and Bloom filter persist once as an artifact;
    * every arriving train batch is Bloom-prefiltered at ingest and ONLY
    * its eval-matching (train_id, shingle) pairs land as a batch-keyed
    * LSM segment — contamination is caught as documents arrive, not by a
    * later whole-corpus sweep. Per-batch compute is O(batch); state
    * grows with eval-matching pairs (+ ~fpp false positives), never with
    * the corpus.
    *
    * Exactness: [[currentContaminated]] applies the stop-shingle df cap
    * at READ time over the ACCUMULATED per-shingle counts (the cap is a
    * whole-corpus property — freezing it at arrival time would let a
    * shingle's verdict depend on batch order), so the merged answer
    * equals the batch operator over the accumulated corpus for ANY
    * batch split (spec-gated). The Bloom filter drops only shingles
    * absent from eval, which contribute nothing to containment, and its
    * false positives die in the eval equi-join — same argument as the
    * batch Bloom variant sharing the exact operator's oracle. */
  def writeDecontaminationEval(evalDf: DataFrame, evalIdCol: String,
      evalTextCol: String, dir: String, n: Int = 3,
      expectedEvalShingles: Long = 1000000L, fpp: Double = 0.01): Unit = {
    val spark = evalDf.sparkSession
    Lsm.resetDir(dir)
    val ePost = evalDf
      .select(col(evalIdCol).cast("long").as("eval_id"),
        TextAnalysis.shingles(TextAnalysis.tokens(col(evalTextCol)), n).as("sh"))
      .withColumn("n_sh", size(col("sh")))
      .filter(col("n_sh") > 0)
      .select(col("eval_id"), col("n_sh"), explode(col("sh")).as("s"))
    ePost.write.mode("overwrite").parquet(s"$dir/eval_postings")
    val bloom = spark.read.parquet(s"$dir/eval_postings")
      .stat.bloomFilter("s", expectedEvalShingles, fpp)
    val p = new org.apache.hadoop.fs.Path(s"$dir/eval_bloom.bin")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try bloom.writeTo(out) finally out.close()
  }

  private def readEvalBloom(spark: SparkSession,
      dir: String): org.apache.spark.util.sketch.BloomFilter = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/eval_bloom.bin")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
    finally in.close()
  }

  def maintainDecontamination(stream: DataFrame, dir: String, idCol: String,
      textCol: String, checkpoint: String, n: Int = 3): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        absorbDecontaminationBatch(batch,
          Lsm.segmentKey(checkpoint, batchId), dir, idCol, textCol, n)
        ()
      }
      .start()

  /** One train batch's absorb: Bloom-prefilter the batch's distinct
    * per-doc shingles against the persisted eval filter and write the
    * survivors as the `batch=<key>` segment — a replay rewrites the
    * same segment (at-least-once safe; counts are per-(doc, shingle)
    * DISTINCT rows, so no absorb-order dependence either). */
  private[graft] def absorbDecontaminationBatch(batch: DataFrame,
      segKey: String, dir: String, idCol: String, textCol: String,
      n: Int = 3): Unit = {
    val spark = batch.sparkSession
    val bloomB = spark.sparkContext.broadcast(readEvalBloom(spark, dir))
    // deliberate udf: broadcast-BloomFilter probe, no expression form
    // (see Dedup.crossCorpusContainmentBloom)
    val mightContain = udf((s: String) =>
      s != null && bloomB.value.mightContainString(s))
    val tPost = batch
      .select(col(idCol).cast("long").as("train_id"),
        TextAnalysis.shingles(TextAnalysis.tokens(col(textCol)), n).as("sh"))
      .select(col("train_id"), explode(col("sh")).as("s"))
      .filter(mightContain(col("s")))
    try Lsm.absorbSegment(tPost, s"$dir/train_postings", segKey)
    finally bloomB.destroy()
  }

  /** Merge-on-read contamination tags over everything absorbed so far:
    * accumulated per-shingle train df -> stop-shingle cap -> eval
    * equi-join -> containment threshold — EXACTLY
    * [[Dedup.crossCorpusContainment]]'s math over the accumulated
    * corpus. Pass `onlyIds` to tag just an arriving batch (the
    * ingest-time answer) without rescanning anything but the bounded
    * state. */
  def currentContaminated(spark: SparkSession, dir: String,
      threshold: Double = 0.8, maxShingleDf: Long = 100000L,
      onlyIds: Option[DataFrame] = None): DataFrame = {
    val tPost0 = Lsm.readSegments(spark, s"$dir/train_postings")
    val dfCounts = tPost0.groupBy("s").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxShingleDf).select("s")
    val tPost = onlyIds match {
      case Some(ids) => tPost0.join(
        ids.select(col(ids.columns.head).cast("long").as("train_id")),
        Seq("train_id"), "left_semi")
      case None => tPost0
    }
    val ePost = spark.read.parquet(s"$dir/eval_postings")
    tPost.join(dfCounts, "s")
      .join(ePost, "s")
      .groupBy("train_id", "eval_id", "n_sh").agg(count(lit(1)).as("overlap"))
      .withColumn("containment", col("overlap") / col("n_sh"))
      .filter(col("containment") >= threshold)
      .select(col("eval_id"), col("train_id"),
        round(col("containment"), 6).as("containment"))
  }
}
