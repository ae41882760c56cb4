package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.Batches

/** SQL-visible vector kernel via SparkSessionExtensions + batches export. */
class ExtensionsAndBatchesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .appName("extensions-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // getOrCreate may hand back a session built by an earlier suite (no
  // extensions config applied) — runtime registration covers that path
  private def withFns: SparkSession = { GraftExtensions.register(spark); spark }

  test("vector kernel callable from SQL, matches Column API") {
    withFns
    graft.sources.Tables(spark, dir, "embeddings").createOrReplaceTempView("emb")
    val viaSql = spark.sql(
      """SELECT e.vec_id,
        |  cosine_similarity(e.embedding, q.embedding) AS cos,
        |  l2_distance(e.embedding, q.embedding) AS l2,
        |  dot_product(e.embedding, q.embedding) AS dp,
        |  hamming_distance(e.embedding, q.embedding) AS hd
        |FROM emb e JOIN emb q ON q.vec_id = 0
        |ORDER BY cos DESC, e.vec_id LIMIT 5""".stripMargin).collect()
    assert(viaSql.length == 5)
    assert(viaSql.head.getLong(0) == 0L)
    assert(math.abs(viaSql.head.getDouble(1) - 1.0) < 1e-6)
    assert(math.abs(viaSql.head.getDouble(2)) < 1e-3) // self-distance ~ 0
    assert(viaSql.head.getLong(4) == 0L) // self hamming = 0
  }

  test("explain shows the native expressions inside the plan (no UDF)") {
    withFns
    graft.sources.Tables(spark, dir, "embeddings").createOrReplaceTempView("emb2")
    val plan = spark.sql(
      "SELECT cosine_similarity(embedding, embedding) FROM emb2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("cosine_similarity") || plan.contains("CosineSimilarity"))
    assert(!plan.toLowerCase.contains("batchevalpython"))
  }

  test("batches cuts the stream into fixed-size groups") {
    val df = graft.sources.Tables(spark, dir, "region") // 5 rows
    val bs = Batches.batches(df, 2).toSeq
    assert(bs.map(_.size) == Seq(2, 2, 1))
    val dropped = Batches.batches(df, 2, dropLast = true).toSeq
    assert(dropped.map(_.size) == Seq(2, 2))
  }

  test("foreachPartitionBatches consumes executor-side") {
    val acc = spark.sparkContext.longAccumulator("rows")
    Batches.foreachPartitionBatches(
      graft.sources.Tables(spark, dir, "events"), 64)(b => acc.add(b.size))
    assert(acc.value == graft.sources.Tables(spark, dir, "events").count())
  }

  test("Arrow IPC export: one stream file per partition, round-trips, matches row iterator") {
    val df = graft.sources.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("double").as("price"), col("o_orderstatus"))
      .repartition(3, col("o_orderkey"))
    val out = java.nio.file.Files.createTempDirectory("graft-arrow").toString
    val infos = Batches.exportArrowShards(df, out, batchRows = 64)
    // one file per plan partition, each written by its own task — the
    // encoder rides the plan's RDD (no collect precedes the iterator)
    assert(infos.size == 3)
    assert(infos.forall(i => new java.io.File(i.path).exists))
    assert(new java.io.File(s"$out/_manifest.json").exists)
    // batch height honors batchRows: rows/64 rounded up per partition
    val n = df.count()
    assert(infos.map(_.rows).sum >= (n + 63) / 64)
    // round-trip through Spark's own Arrow reader == the source frame
    val back = Batches.readArrowShards(spark, out, df.schema.json)
    assert(back.schema == df.schema)
    val a = back.orderBy("o_orderkey").collect().map(_.toSeq.toList).toList
    val b = df.orderBy("o_orderkey").collect().map(_.toSeq.toList).toList
    assert(a == b, "Arrow round-trip must reproduce every row")
    // and equals the row-iterator export surface on the same data
    val viaIter = Batches.batches(df.orderBy("o_orderkey"), 64)
      .flatten.map(_.toSeq.toList).toList
    assert(a == viaIter, "Arrow batches must carry what the row iterator carries")
  }

  test("exportShards writes one file per shard, a manifest, and round-trips") {
    val docs = graft.sources.Tables(spark, dir, "documents")
      .select("doc_id", "text", "lang")
    val n = docs.count()
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val infos = Batches.exportShards(docs, "doc_id", out, targetRowsPerShard = 20)
    val expectShards = ((n + 19) / 20).toInt
    assert(infos.size == expectShards)
    assert(infos.map(_.rows).sum == n, "manifest row counts must cover the dataset")
    assert(infos.forall(_.bytes > 0), "every shard directory must hold data")
    // one data file per shard (hash-colocated write)
    infos.foreach { s =>
      val files = java.nio.file.Files.list(java.nio.file.Paths.get(s.path))
        .iterator().asScala.map(_.getFileName.toString)
        .filterNot(f => f.startsWith("_") || f.startsWith(".")).toSeq
      assert(files.size == 1, s"shard ${s.shardId} has files $files")
    }
    // manifest parses and matches the returned infos
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "_manifest.json")))
    assert(infos.forall(s => manifest.contains(s""""shard_id": ${s.shardId}, "rows": ${s.rows}""")))
    // roundtrip: shard_id partition column + identical data
    val back = spark.read.parquet(out)
    assert(back.count() == n)
    assert(back.select("doc_id").collect().map(_.getLong(0)).toSet ==
      docs.select("doc_id").collect().map(_.getLong(0)).toSet)
    // re-export is deterministic: same rows land in the same shards
    val out2 = java.nio.file.Files.createTempDirectory("graft-shards2").toString
    val infos2 = Batches.exportShards(docs, "doc_id", out2, targetRowsPerShard = 20)
    assert(infos.map(s => s.shardId -> s.rows) == infos2.map(s => s.shardId -> s.rows))
  }

  test("exportShards emits JSONL shards when asked") {
    val docs = graft.sources.Tables(spark, dir, "documents").select("doc_id", "lang")
    val out = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val infos = Batches.exportShards(docs, "doc_id", out, 25, format = "json")
    assert(infos.map(_.rows).sum == docs.count())
    val back = spark.read.json(out)
    assert(back.count() == docs.count())
  }

  test("epochShuffle: a permutation per seed, stable for a seed, seed-independent across seeds") {
    val docs = graft.sources.Tables(spark, dir, "documents").select("doc_id")
    val n = docs.count()
    val e1 = Batches.epochShuffle(docs, "doc_id", seed = 1L, numShards = 4)
    // every row appears exactly once, positions are 0..count-1 per shard
    assert(e1.count() == n)
    assert(e1.select("doc_id").distinct().count() == n)
    import org.apache.spark.sql.functions._
    val perShard = e1.groupBy("shard_id")
      .agg(count(lit(1)).as("c"), min("position").as("lo"), max("position").as("hi"))
      .collect()
    perShard.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L)
      assert(r.getAs[Long]("hi") == r.getAs[Long]("c") - 1)
    }
    // deterministic for a fixed seed
    val e1b = Batches.epochShuffle(docs, "doc_id", seed = 1L, numShards = 4)
    assert(e1.exceptAll(e1b).isEmpty && e1b.exceptAll(e1).isEmpty)
    // a different seed yields a genuinely different permutation
    val e2 = Batches.epochShuffle(docs, "doc_id", seed = 2L, numShards = 4)
    val moved = e1.as("a").join(e2.as("b"), "doc_id")
      .filter(col("a.shard_id") =!= col("b.shard_id") ||
        col("a.position") =!= col("b.position")).count()
    assert(moved > n / 2, s"only $moved of $n rows moved between seeds")
  }

  test("concatChunkPack: contiguous token stream per shard, straddling consistent, no doc lost") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1L to 200L).map(i => (i, 1 + (i % 37).toInt)).toDF("doc_id", "nt")
    val budget = 50
    val packed = graft.sources.Batches
      .concatChunkPack(docs, "doc_id", "nt", budget, numShards = 4)
    // every doc exactly once
    assert(packed.count() === 200L && packed.select("doc_id").distinct().count() === 200L)
    // per shard in id order the stream is CONTIGUOUS: each doc starts
    // where the previous ended (seq_id*budget + seq_offset accumulates
    // the token counts exactly), starting at 0
    val rows = packed.orderBy("shard_id", "doc_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      var expectStart = 0L
      rs.sortBy(_._2).foreach { case (_, id, nt, seqId, off) =>
        assert(seqId * budget + off === expectStart, s"doc $id not contiguous")
        assert(off >= 0 && off < budget)
        expectStart += nt
      }
    }
    // deterministic across runs
    val again = graft.sources.Batches
      .concatChunkPack(docs, "doc_id", "nt", budget, numShards = 4)
    assert(packed.exceptAll(again).isEmpty && again.exceptAll(packed).isEmpty)
    // duplicate ids: the ROWS frame keeps the stream contiguous (the
    // default RANGE frame would double-count ORDER BY peers) — starts
    // sorted must equal the prefix sums of the token list
    val dup = Seq((1L, 10), (1L, 7), (1L, 5), (2L, 30)).toDF("doc_id", "nt")
    val dp = graft.sources.Batches.concatChunkPack(dup, "doc_id", "nt", budget, 1)
      .collect().map(r => (r.getLong(3) * budget + r.getLong(4), r.getLong(2)))
      .sortBy(_._1)
    var at = 0L
    dp.foreach { case (start, nt) =>
      assert(start === at, s"non-contiguous at $start (expected $at)")
      at += nt
    }
  }

  test("tar shard export: GNU tar reads the archives; layout, manifest, determinism") {
    import spark.implicits._
    import scala.sys.process._
    val out = java.nio.file.Files.createTempDirectory("tarshards").toString
    val docs = (1 to 37).map(i =>
      (i.toLong, s"text of doc $i", s"""{"id":$i}""")).toDF("doc_id", "text", "meta")
    val infos = Batches.exportTarShards(docs, "doc_id",
      Seq("txt" -> "text", "json" -> "meta"), out, targetRowsPerShard = 10)
    assert(infos.map(_.rows).sum === 37L)
    val nonEmpty = infos.filter(_.rows > 0)
    assert(nonEmpty.size >= 2, "hash sharding should populate several shards")
    nonEmpty.foreach(s => assert(new java.io.File(s.path).isFile, s.path))
    // GNU tar accepts the hand-rolled ustar format; members list with a
    // sample's files ADJACENT and samples in key order
    val sh = nonEmpty.head
    val names = Seq("tar", "-tf", sh.path).!!.trim.split("\n").toSeq
    assert(names.length === sh.rows * 2, s"$names")
    names.grouped(2).foreach { g =>
      val k = g(0).stripSuffix(".txt")
      assert(g(0) == s"$k.txt" && g(1) == s"$k.json", s"sample not adjacent: $g")
    }
    val keys = names.grouped(2).map(_.head.stripSuffix(".txt")).toSeq
    assert(keys == keys.sorted, "samples must sort by key inside a shard")
    // extraction round-trips exact bytes
    val xd = java.nio.file.Files.createTempDirectory("tarx").toString
    assert(Seq("tar", "-xf", sh.path, "-C", xd).! === 0)
    keys.take(3).foreach { k =>
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(xd, s"$k.txt")), "UTF-8")
      assert(txt === s"text of doc $k")
      val js = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(xd, s"$k.json")), "UTF-8")
      assert(js === s"""{"id":$k}""")
    }
    // manifest names every shard with its sample count
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "_manifest.json")), "UTF-8")
    nonEmpty.foreach(s => assert(
      manifest.contains(s""""shard_id": ${s.shardId}, "samples": ${s.rows}""")))
    // byte-stable: a re-export yields identical archives (epoch mtimes)
    val out2 = java.nio.file.Files.createTempDirectory("tarshards2").toString
    Batches.exportTarShards(docs.repartition(7), "doc_id",
      Seq("txt" -> "text", "json" -> "meta"), out2, targetRowsPerShard = 10)
    val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(sh.path))
    val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      out2, java.nio.file.Paths.get(sh.path).getFileName.toString))
    assert(java.util.Arrays.equals(a, b),
      "archives must be byte-identical across runs and input layouts")
  }
}
