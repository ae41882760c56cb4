package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

import graft.operators.Sketches

/** Streaming maintenance of a heavy-hitters (frequent items) summary —
  * the trending-tokens / hot-keys monitor of an ingest pipeline, in the
  * same LSM posture as [[StreamingText]]: every micro-batch reduces to a
  * fixed-size Misra-Gries summary (distributed map-side partial agg
  * inside the batch) appended as at most k (item, cnt) segment rows;
  * nothing read-modify-writes. Readers sum the segment rows per item and
  * apply ONE final MG shrink — summing mergeable summaries then
  * shrinking once is itself a valid merge (Agarwal et al., PODS 2012),
  * with total undercount bounded by 2n/(k+1) (one n/(k+1) from the
  * per-batch summaries, one from the final shrink). Compaction = write
  * the merged summary back as a single segment.
  */
object StreamingSketch {

  /** per-batch MG summary rows appended to `dir` */
  def maintainHeavyHitters(stream: DataFrame, dir: String, itemCol: String,
      k: Int, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        // a restarted maintainer must first complete any interrupted
        // compaction swap — absorbing into a recreated live dir would
        // strand (then let the next compact delete) the merged summary
        Lsm.recoverPath(dir)
        val mg = new Sketches.MisraGries(k)
        val summary = batch
          .agg(udaf(mg, Encoders.STRING)(col(itemCol).cast("string")))
          .head().getMap[String, Long](0)
        // lineage-keyed: MG summaries merge by SUM, so a replayed
        // batch must rewrite its segment, never add a second one
        Lsm.absorbSegment(summary.toSeq.toDF("item", "cnt").coalesce(1),
          dir, Lsm.segmentKey(checkpoint, batchId))
        ()
      }
      .start()

  /** Merge-on-read: sum the (<= k per batch) segment rows and shrink to
    * k once. The pre-shrink frame is tiny (k x number of batches), so
    * the driver-side shrink is bounded — it never sees item-level data. */
  def currentHeavyHitters(spark: SparkSession, dir: String, k: Int): DataFrame = {
    import spark.implicits._
    Lsm.recoverPath(dir) // complete an interrupted compaction swap
    val summed = Lsm.readSegments(spark, dir)
      .groupBy(col("item")).agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mg = new Sketches.MisraGries(k)
    mg.merge(mg.zero, summed).toSeq.toDF("item", "cnt")
  }

  /** compaction: rewrite all segments as the single merged summary
    * (under `batch=compact` through the crash-safe swap, keeping the dir
    * uniformly batch-partitioned) */
  def compact(spark: SparkSession, dir: String, k: Int): Unit = {
    val merged = currentHeavyHitters(spark, dir, k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    import spark.implicits._
    merged.toDF("item", "cnt")
      .coalesce(1).write.mode("overwrite").parquet(s"${dir}__compact/batch=compact")
    Lsm.swapInPath(dir)
  }

  // ------------------------------------------- streaming percentiles
  // Mergeable quantile summaries in the same LSM posture: each
  // micro-batch reduces (distributed percentile_approx, map-side
  // partial agg) to an EQUI-DEPTH summary of `numPoints` (value,
  // weight) rows — the batch's quantile points at ranks (i+0.5)/B,
  // each carrying weight n_batch/B. A weighted union of equi-depth
  // summaries is itself a quantile summary: each point displaces at
  // most (n_b/B)/N of total rank mass, so the merged rank error is
  // bounded by ~1/B plus the per-batch sketch error — independent of
  // the number of batches. Readers never see item-level data; the
  // summary store is B rows per batch until compaction folds it back
  // to B rows total.

  /** per-batch equi-depth quantile summary rows appended to `dir` */
  def maintainPercentiles(stream: DataFrame, dir: String, valueCol: String,
      numPoints: Int, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        Lsm.recoverPath(dir) // see maintainHeavyHitters
        val n = batch.count()
        if (n > 0) {
          val qs = (0 until numPoints).map(i => (i + 0.5) / numPoints)
          val vals = batch.agg(percentile_approx(
              col(valueCol).cast("double"),
              array(qs.map(lit(_)): _*), lit(10000)).as("v"))
            .head().getSeq[Double](0)
          // lineage-keyed: summaries merge by weighted union, so a
          // replayed batch must rewrite, never add rank mass twice
          Lsm.absorbSegment(
            vals.map(v => (v, n.toDouble / numPoints)).toDF("value", "weight")
              .coalesce(1), dir, Lsm.segmentKey(checkpoint, batchId))
        }
        ()
      }
      .start()

  /** Merge-on-read weighted percentiles over every summary segment.
    * The summary frame is numPoints x batches rows (compaction resets
    * it to numPoints), so the driver-side weighted scan is bounded —
    * like [[currentHeavyHitters]], it never touches item-level data. */
  def currentPercentiles(spark: SparkSession, dir: String,
      ps: Seq[Double]): Map[Double, Double] = {
    Lsm.recoverPath(dir) // complete an interrupted compaction swap
    val pts = Lsm.readSegments(spark, dir).select("value", "weight").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).sortBy(_._1)
    require(pts.nonEmpty, s"no percentile summary at $dir")
    val total = pts.map(_._2).sum
    ps.map { p =>
      require(p >= 0 && p <= 1, s"percentile $p out of [0,1]")
      var cum = 0.0
      val hit = pts.find { case (_, w) => cum += w; cum >= p * total }
      p -> hit.getOrElse(pts.last)._1
    }.toMap
  }

  /** compaction: refold every segment into one equi-depth summary of
    * `numPoints` rows (weighted quantile points of the merged summary) */
  def compactPercentiles(spark: SparkSession, dir: String,
      numPoints: Int): Unit = {
    Lsm.recoverPath(dir) // complete an interrupted prior swap
    val pts = Lsm.readSegments(spark, dir).select("value", "weight").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).sortBy(_._1)
    if (pts.nonEmpty) {
      val total = pts.map(_._2).sum
      val merged = (0 until numPoints).map { i =>
        val target = (i + 0.5) / numPoints * total
        var cum = 0.0
        val hit = pts.find { case (_, w) => cum += w; cum >= target }
        (hit.getOrElse(pts.last)._1, total / numPoints)
      }
      import spark.implicits._
      merged.toDF("value", "weight")
        .coalesce(1).write.mode("overwrite").parquet(s"${dir}__compact/batch=compact")
      Lsm.swapInPath(dir)
    }
  }

  // --------------------------------------- streaming corpus-overlap KMV
  // Per-source bottom-k shingle signatures in the same LSM posture:
  // each micro-batch reduces (map-side combinable BottomK agg) to at
  // most k (g, h) rows per source — 60-bit md5-prefix keys, identical
  // to the batch sketch — plus one (g, NULL) presence row per source,
  // so a source whose batch yields no shingles still owes its matrix
  // rows. Bottom-k of a union IS the bottom-k of the unioned bottom-ks
  // (any of the union's k smallest is among the k smallest of its own
  // set), so merge-on-read = distinct + per-source window bottom-k:
  // the maintained matrix is EXACTLY the batch operator's output over
  // everything absorbed, regardless of batch splits — spec-gated.

  /** per-batch (source, hash) signature rows appended to `dir` */
  def maintainKmvOverlap(stream: DataFrame, dir: String, groupCol: String,
      textCol: String, k: Int, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Lsm.recoverPath(dir)
        val bk = new Sketches.BottomK(k)
        val sig = batch
          .select(col(groupCol).cast("string").as("g"),
            graft.operators.TextAnalysis.tokens(col(textCol)).as("__t"))
          .select(col("g"),
            explode(graft.operators.TextAnalysis.shingles(col("__t"))).as("sh"))
          .select(col("g"), graft.operators.Dedup.md5Hash60(col("sh")).as("h"))
          .groupBy(col("g"))
          .agg(udaf(bk, Encoders.scalaLong)(col("h")).as("sig"))
          .select(col("g"), explode(col("sig")).as("h"))
        val presence = batch
          .select(col(groupCol).cast("string").as("g")).distinct()
          .withColumn("h", lit(null).cast("long"))
        Lsm.absorbSegment(sig.unionByName(presence).coalesce(1),
          dir, Lsm.segmentKey(checkpoint, batchId))
        ()
      }
      .start()

  /** Merge-on-read: distinct hashes per source, ONE window bottom-k,
    * then the SAME pairwise estimation the batch sketch uses
    * ([[graft.operators.Dedup]]); the collected artifact is bounded at
    * |sources| × k longs. */
  def currentKmvOverlap(spark: SparkSession, dir: String, k: Int): DataFrame = {
    Lsm.recoverPath(dir)
    val segs = Lsm.readSegments(spark, dir)
    val groups = segs.select(col("g")).distinct()
      .collect().map(_.getString(0)).sorted
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("h"))
    val bottom = segs.filter(col("h").isNotNull)
      .select(col("g"), col("h")).distinct()
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (g, hs) => g -> hs.map(_._2).sorted }
    graft.operators.Dedup.overlapFromSignatures(spark,
      groups.map(g => g -> bottom.getOrElse(g, Array.emptyLongArray)).toSeq, k)
  }

  /** compaction: rewrite all segments as the merged per-source bottom-k
    * (+ presence rows) through the crash-safe swap */
  def compactKmvOverlap(spark: SparkSession, dir: String, k: Int): Unit = {
    Lsm.recoverPath(dir)
    val segs = Lsm.readSegments(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("h"))
    val bottom = segs.filter(col("h").isNotNull)
      .select(col("g"), col("h")).distinct()
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("g"), col("h"))
    val presence = segs.select(col("g")).distinct()
      .withColumn("h", lit(null).cast("long"))
    bottom.unionByName(presence)
      .coalesce(1).write.mode("overwrite").parquet(s"${dir}__compact/batch=compact")
    Lsm.swapInPath(dir)
  }

  // -------------------------------------------------- uniform reservoir

  /** Streaming uniform sample — a k-row reservoir over everything that
    * ever arrived: the k rows with the SMALLEST md5-fold uniform key
    * hashUniform(id). Bottom-k by a fixed id hash IS uniform sampling
    * without replacement, but unlike the classic reservoir it is
    * deterministic, layout/arrival-order independent, exactly-once
    * under at-least-once replay (lineage-keyed segment rewrites), and
    * SQL-replayable. The bottom-k-of-unions law (bottom-k of a union ==
    * bottom-k of unioned bottom-ks) means each batch lands only ITS OWN
    * bottom-k rows — O(k) state per batch — and merge-on-read equals
    * the batch operator over the accumulated corpus for ANY split.
    * A row's membership can only flip when a lower-key row arrives:
    * the sample is append-stable, so downstream epoch caches built on
    * it invalidate minimally. */
  def maintainUniformSample(stream: DataFrame, dir: String, idCol: String,
      k: Int, checkpoint: String, seed: String = "urs42"): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        absorbUniformSampleBatch(batch,
          Lsm.segmentKey(checkpoint, batchId), dir, idCol, k, seed)
        ()
      }
      .start()

  /** one batch's absorb: the batch's own bottom-k rows (full payload +
    * key) as the `batch=<key>` segment; replay rewrites it */
  private[graft] def absorbUniformSampleBatch(batch: DataFrame,
      segKey: String, dir: String, idCol: String, k: Int,
      seed: String = "urs42"): Unit = {
    Lsm.recoverPath(dir)
    val keyed = batch.withColumn("__u",
      graft.operators.Sampling.hashUniform(
        concat_ws(":", lit(seed), col(idCol).cast("string"))))
      .orderBy(col("__u"), col(idCol)).limit(k)
    Lsm.absorbSegment(keyed.coalesce(1), dir, segKey)
  }

  /** merge-on-read: global bottom-k over ≤ k·batches accumulated rows
    * (compaction refolds to k) — never touches the corpus */
  def currentUniformSample(spark: SparkSession, dir: String, k: Int,
      idCol: String): DataFrame = {
    Lsm.recoverPath(dir)
    Lsm.readSegments(spark, dir)
      .orderBy(col("__u"), col(idCol)).limit(k)
      .drop("__u")
  }

  /** compaction: rewrite all segments as the single merged bottom-k
    * through the crash-safe swap */
  def compactUniformSample(spark: SparkSession, dir: String, k: Int,
      idCol: String): Unit = {
    Lsm.recoverPath(dir)
    Lsm.readSegments(spark, dir)
      .orderBy(col("__u"), col(idCol)).limit(k)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${dir}__compact/batch=compact")
    Lsm.swapInPath(dir)
  }
}
