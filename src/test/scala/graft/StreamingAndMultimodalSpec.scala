package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Multimodal
import graft.streaming.EventStream

class StreamingAndMultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("streaming hourly counts match the batch computation exactly") {
    val q = EventStream.runToMemorySink(spark, dir, "stream_hourly")
    try {
      val streamed = spark.table("stream_hourly")
        .orderBy(col("hour"), col("event_type")).collect()
      val batch = graft.sources.Tables(spark, dir, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("hour"), col("event_type")).collect()
      assert(streamed.length === batch.length)
      assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
    } finally q.stop()
  }

  test("streaming session windows match the batch sessionization exactly") {
    val q = EventStream.runToMemorySink(
      EventStream.userSessions(
        EventStream.readEvents(spark, dir).filter(col("user_id") < 20)),
      "stream_sessions", "complete")
    try {
      val streamed = spark.table("stream_sessions")
        .orderBy(col("user_id"), col("start_us")).collect()
      val batch = EventStream.userSessions(
          graft.sources.Tables(spark, dir, "events").filter(col("user_id") < 20))
        .orderBy(col("user_id"), col("start_us")).collect()
      assert(streamed.length === batch.length)
      assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
      // sessions are genuinely gap-split: some user has more than one
      assert(batch.map(_.getLong(0)).distinct.length < batch.length)
    } finally q.stop()
  }

  test("streaming sliding windows match the batch computation exactly") {
    val q = EventStream.runToMemorySink(
      EventStream.slidingCounts(EventStream.readEvents(spark, dir)),
      "stream_sliding", "complete")
    try {
      val streamed = spark.table("stream_sliding")
        .orderBy(col("win_start"), col("event_type")).collect()
      val batch = EventStream.slidingCounts(
          graft.sources.Tables(spark, dir, "events"))
        .orderBy(col("win_start"), col("event_type")).collect()
      assert(streamed.length === batch.length)
      assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered events within the watermark") {
    // simulate at-least-once delivery: the same events file lands twice
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_dedup").toFile
    try {
      val src = new java.io.File(s"$dir/events.parquet").toPath
      java.nio.file.Files.copy(src, new java.io.File(tmp, "a.parquet").toPath)
      java.nio.file.Files.copy(src, new java.io.File(tmp, "b.parquet").toPath)
      val deduped = EventStream.dedupEvents(
        EventStream.readEvents(spark, tmp.toString, glob = "*.parquet"))
      val q = EventStream.runToMemorySink(deduped.select(col("event_id")),
        "stream_dedup", "append")
      try {
        val n = spark.table("stream_dedup").count()
        val expected = spark.read.parquet(s"$dir/events.parquet")
          .select("event_id").distinct().count()
        assert(n === expected)
      } finally q.stop()
    } finally {
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
  }

  test("custom-state user profiles: streaming updates converge to the batch result") {
    val q = EventStream.runToMemorySink(
      EventStream.userProfiles(
        EventStream.readEvents(spark, dir).filter(col("user_id") < 20)).toDF(),
      "stream_profiles", "update")
    try {
      // Update mode emits one row per touched user per micro-batch;
      // profiles are cumulative (n_events strictly grows), so the final
      // state per user is its max-n_events row
      val streamed = spark.table("stream_profiles")
        .withColumn("__rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("n_events").desc)))
        .filter(col("__rk") === 1).drop("__rk")
        .orderBy(col("user_id")).collect()
      val batch = EventStream.userProfiles(
          graft.sources.Tables(spark, dir, "events").filter(col("user_id") < 20))
        .toDF().orderBy(col("user_id")).collect()
      assert(streamed.length === batch.length)
      assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
      // the state actually accumulated: someone saw more than one event type
      assert(batch.exists(_.getInt(3) > 1))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch computation exactly") {
    def sides(src: org.apache.spark.sql.DataFrame) = (
      src.filter(col("event_type") === "click"),
      src.filter(col("event_type") === "purchase"))
    val (sc, sp) = sides(EventStream.readEvents(spark, dir))
    val q = EventStream.runToMemorySink(
      EventStream.purchaseClickJoin(sc, sp), "stream_rjoin", "append")
    try {
      val streamed = spark.table("stream_rjoin")
        .orderBy("purchase_id", "click_id").collect()
      val (bc, bp) = sides(graft.sources.Tables(spark, dir, "events"))
      val batch = EventStream.purchaseClickJoin(bc, bp)
        .orderBy("purchase_id", "click_id").collect()
      assert(batch.nonEmpty)
      assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
    } finally q.stop()
  }

  test("multimodal: real header parsing extracts format + dimensions from bytes") {
    def png(w: Int, h: Int): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      b.write(Array(0, 0, 0, 13).map(_.toByte)); b.write("IHDR".getBytes)
      b.write(java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array())
      b.toByteArray
    }
    val jpeg = Array(0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x11, 0x08,
      0x01, 0xE0, 0x02, 0x80, 0x03).map(_.toByte) // SOF0: 640x480
    val gif = "GIF89a".getBytes ++ Array(0x80, 0x02, 0xE0, 0x01, 0, 0).map(_.toByte)
    val bmp = "BM".getBytes ++ new Array[Byte](16) ++
      java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(640).putInt(480).array() ++ new Array[Byte](4)
    assert(Multimodal.parseImageHeader(png(640, 480)) === (("png", 640, 480)))
    assert(Multimodal.parseImageHeader(jpeg) === (("jpeg", 640, 480)))
    assert(Multimodal.parseImageHeader(gif) === (("gif", 640, 480)))
    assert(Multimodal.parseImageHeader(bmp) === (("bmp", 640, 480)))
    assert(Multimodal.parseImageHeader("hello".getBytes) === (("unknown", -1, -1)))

    // and through the distributed path
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, png(12, 34)), (2L, "nope".getBytes)).toDF("id", "payload")
    val info = Multimodal.imageInfo(df, "id").orderBy("id").collect()
    assert(info(0).getString(1) === "png" && info(0).getInt(2) === 12 && info(0).getInt(3) === 34)
    assert(info(1).getString(1) === "unknown")
  }

  test("multimodal: binary payload -> stub decode keeps schema and determinism") {
    val docs = graft.sources.Tables(spark, dir, "documents").limit(20)
    val withBin = Multimodal.withBinaryPayload(docs, "text")
    assert(withBin.schema("payload").dataType.typeName === "binary")
    assert(withBin.schema("payload").metadata.getString("htype") === "image")
    val decoded = Multimodal.decodeImages(withBin, "doc_id")
    val rows = decoded.collect()
    assert(rows.length === 20)
    assert(rows.forall { r =>
      r.getAs[Int]("width") == 8 && r.getAs[scala.collection.Seq[Float]]("pixels").length == 64
    })
    // deterministic: same input -> same pixels
    val again = Multimodal.decodeImages(withBin, "doc_id").collect()
    assert(rows.map(_.getAs[scala.collection.Seq[Float]]("pixels").toList).toSeq ===
      again.map(_.getAs[scala.collection.Seq[Float]]("pixels").toList).toSeq)
  }

  test("multimodal: resize halves dimensions, frame sampling strides") {
    val docs = graft.sources.Tables(spark, dir, "documents").limit(5)
    val decoded = Multimodal.decodeImages(
      Multimodal.withBinaryPayload(docs, "text"), "doc_id")
    val small = Multimodal.resize(decoded, 4, 4).collect()
    assert(small.forall(_.getAs[scala.collection.Seq[Float]]("pixels").length == 16))
    val framed = Multimodal.sampleFrames(decoded, "pixels", 8).collect()
    assert(framed.forall(_.getAs[scala.collection.Seq[Float]]("pixels_sampled").length == 8))
  }

  test("multimodal: feature extraction emits fixed-width stats vector") {
    val docs = graft.sources.Tables(spark, dir, "documents").limit(5)
    val decoded = Multimodal.decodeImages(
      Multimodal.withBinaryPayload(docs, "text"), "doc_id")
    val feats = Multimodal.extractFeatures(decoded).collect()
    assert(feats.forall(_.getAs[scala.collection.Seq[Double]]("features").length == 4))
    feats.foreach { r =>
      val Seq(mean, std, mn, mx) = r.getAs[scala.collection.Seq[Double]]("features").toSeq
      assert(mn <= mean && mean <= mx)
      assert(std >= 0.0)
    }
  }
}
