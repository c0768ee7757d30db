package graft.sinks

import graft.SparkSpec
import graft.services.{Retry, RetryPolicy}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable.ArrayBuffer

/** Shared in-JVM store standing in for an external KV service — static
  * so executor threads (same JVM in local mode) and the test see one
  * store. */
object TestKvStore {
  import java.util.concurrent.ConcurrentHashMap
  val data = new ConcurrentHashMap[String, String]()
  def clear(): Unit = data.clear()
  def get(dest: String, k: String): Option[String] = Option(data.get(s"$dest|$k"))
}

final class TestKvClient(maxBytes: Long) extends ForeachKvSink.KvClient with Serializable {
  override def putAll(destination: String, entries: Seq[(String, String)]): Unit =
    entries.foreach { case (k, v) => TestKvStore.data.put(s"$destination|$k", v) }
  override def delete(destination: String, key: String): Unit =
    TestKvStore.data.remove(s"$destination|$key")
  override def memory(): (Long, Long) = (0L, maxBytes)
  override def close(): Unit = ()
}

class SinksSpec extends SparkSpec {

  private val keySchema = StructType(Seq(StructField("id", IntegerType)))
  private val rowSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("q", StringType), StructField("a", StringType)))

  private def records(n: Int) = {
    val schema = graft.model.Envelope.recordSchema(keySchema, rowSchema)
    val rows = (1 to n).map { i =>
      Row("testc.faq.items", Row(i),
          Row("c", null, Row(i, s"question $i", s"answer $i"),
              Row("pg", "db", "faq", "items", i.toLong, "false", 0L), 0L),
          Map("src" -> "unit"))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("retry: backs off, caps interval, honors retryable predicate") {
    val sleeps = ArrayBuffer[Long]()
    val calls = new AtomicInteger()
    val out = Retry(RetryPolicy(maxAttempts = 4, initialIntervalMs = 100,
        maxIntervalMs = 250, multiplier = 2.0), sleeps.append(_)) { attempt =>
      if (calls.incrementAndGet() < 4) throw new RuntimeException("boom")
      attempt
    }
    assert(out == 4)
    assert(sleeps.toSeq == Seq(100L, 200L, 250L)) // capped at max

    val nonRetryable = intercept[IllegalArgumentException] {
      Retry(RetryPolicy(maxAttempts = 5, retryable = !_.isInstanceOf[IllegalArgumentException]),
            _ => ()) { _ => throw new IllegalArgumentException("fatal") }
    }
    assert(nonRetryable.getMessage == "fatal")
  }

  test("http sink posts JSON-array batches and retries failures") {
    val received = ArrayBuffer[String]()
    val failFirst = new AtomicInteger(1)
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/hook", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val body = new String(x.getRequestBody.readAllBytes())
        if (failFirst.getAndDecrement() > 0) {
          x.sendResponseHeaders(503, -1)
        } else {
          received.synchronized(received.append(
            x.getRequestHeaders.getFirst("X-Auth") + "|" + body))
          x.sendResponseHeaders(200, -1)
        }
        x.close()
      }
    })
    server.start()
    try {
      val sink = new HttpSink(s"http://localhost:${server.getAddress.getPort}/hook",
        batchMode = true, chunkSize = 2,
        authHeaders = () => Map("X-Auth" -> "tok"), sleeper = _ => ())
      // one partition so the per-partition chunking is deterministic
      sink.write(records(3).coalesce(1), epochId = 0)
      assert(received.size == 2) // 3 records, chunk 2 → 2 posts
      assert(received.forall(_.startsWith("tok|[")))
      assert(received.mkString.contains("\"question 1\""))
    } finally server.stop(0)
  }

  test("instructlab sink writes qna.yml per taxonomy mapping") {
    import InstructLabSink._
    val dir = Files.createTempDirectory("graft-ilab").toString
    val sink = new InstructLabSink(dir, Seq(
      TaxonomyMapping("testc\\.faq\\..*", "knowledge/faq",
        FromValue("q"), FromValue("a"), Some(Constant("unit-test")))))
    sink.write(records(2), 0)
    val yml = Files.readString(Paths.get(dir, "knowledge/faq/qna.yml"))
    assert(yml.startsWith("version: 3"))
    assert(yml.contains("question: \"question 1\"") && yml.contains("answer: \"answer 2\""))
    assert(yml.contains("context: \"unit-test\""))
    // non-matching destination writes nothing
    assert(!Files.exists(Paths.get(dir, "other")))
  }

  test("instructlab aggregation reaches the driver as ONE row per taxonomy") {
    import InstructLabSink._
    val m = TaxonomyMapping("testc\\.faq\\..*", "knowledge/faq",
      FromValue("q"), FromValue("a"))
    val big = records(200)
    val agg = InstructLabSink.taxonomyAggs(big, Seq(m))
    // batch-size-independent driver footprint: the aggregate is a
    // single row carrying (mapping-idx, count, rendered-yaml)
    // regardless of records
    assert(agg.count() == 1)
    val row = agg.head()
    assert(row.getInt(0) == 0)
    assert(row.getLong(1) == 200)
    assert(row.getString(2).split("questions_and_answers").length - 1 == 200)
    // escaping runs executor-side inside the rendered string
    assert(row.getString(2).contains("question: \"question 1\""))
  }

  test("instructlab job count is independent of the mapping count (one pass)") {
    import InstructLabSink._
    // count the Spark jobs a write() submits (listener events post
    // asynchronously — poll until the count is stable)
    def jobsFor(body: => Unit): Int = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        val deadline = System.currentTimeMillis() + 5000
        var last = -1
        while (System.currentTimeMillis() < deadline && jobs.get() != last) {
          last = jobs.get(); Thread.sleep(150)
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      jobs.get()
    }
    val one = Seq(
      TaxonomyMapping("testc\\.faq\\..*", "knowledge/a", FromValue("q"), FromValue("a")))
    val three = one ++ Seq(
      TaxonomyMapping("testc\\.faq\\..*", "knowledge/b", FromValue("a"), FromValue("q")),
      TaxonomyMapping("no\\.match\\..*", "knowledge/c", FromValue("q"), FromValue("a")))
    val dir1 = Files.createTempDirectory("graft-ilab-j1").toString
    val dir3 = Files.createTempDirectory("graft-ilab-j3").toString
    val j1 = jobsFor(new InstructLabSink(dir1, one).write(records(4), 0))
    val j3 = jobsFor(new InstructLabSink(dir3, three).write(records(4), 0))
    // the whole batch is ONE aggregation pass: 3 mappings cost the
    // same jobs as 1 (the old per-mapping loop ran m filter+agg jobs)
    assert(j3 == j1, s"expected mapping-count-independent jobs, saw $j1 (1 mapping) vs $j3 (3)")
    // both matching mappings produced files, the non-matching one none
    assert(Files.exists(Paths.get(dir3, "knowledge/a/qna.yml")))
    assert(Files.exists(Paths.get(dir3, "knowledge/b/qna.yml")))
    assert(!Files.exists(Paths.get(dir3, "knowledge/c")))
  }

  test("parquet upsert sink skips a replayed epoch (idempotency)") {
    val dir = Files.createTempDirectory("graft-up2").toString
    val sink = new ParquetUpsertSink(dir, Seq("id"))
    sink.write(records(2), epochId = 7)
    sink.write(records(2), epochId = 7) // replay of same epoch
    val n = sink.readTable(spark, "testc.faq.items").count()
    assert(n == 2)
  }

  private def recordsWithLsn(rows: Seq[(Int, String, String, String, java.lang.Long)]) = {
    val schema = graft.model.Envelope.recordSchema(keySchema, rowSchema)
    val rws = rows.map { case (id, op, q, a, lsn) =>
      val payload = Row(id, q, a)
      Row("testc.faq.items", Row(id),
          Row(op, if (op == "d") payload else null, if (op == "d") null else payload,
              Row("pg", "db", "faq", "items", lsn, "false", 0L), 5L),
          Map("src" -> "unit"))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rws), schema)
  }

  test("parquet upsert sink rewrites only dirty buckets; clean bucket files survive untouched") {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft-up3").toString
    val sink = new ParquetUpsertSink(dir, Seq("id"), numBuckets = 8)
    sink.write(recordsWithLsn((1 to 16).map(i =>
      (i, "c", s"q$i", s"a$i", java.lang.Long.valueOf(i.toLong))).toSeq), epochId = 1)

    def dataFiles() = Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(p => p.toString -> Files.getLastModifiedTime(p)).toMap
    val before = dataFiles()

    // epoch 2 touches a single key → a single bucket
    sink.write(recordsWithLsn(Seq((1, "u", "q1b", "a1b", java.lang.Long.valueOf(100L)))), epochId = 2)
    val after = dataFiles()
    val surviving = before.keySet.intersect(after.keySet)
    assert(surviving.nonEmpty, "clean buckets must keep their original files")
    surviving.foreach(f => assert(before(f) == after(f), s"$f was rewritten"))
    // the updated key reads back the new value; table row count unchanged
    val state = sink.readTable(spark, "testc.faq.items").orderBy("id").collect()
    assert(state.length == 16)
    assert(state.find(_.getAs[Int]("id") == 1).get.getAs[String]("q") == "q1b")
  }

  test("upsert sink: a crash before the manifest flip loses nothing; replay converges") {
    val dir = Files.createTempDirectory("graft-up4").toString
    val sink = new ParquetUpsertSink(dir, Seq("id"), numBuckets = 8)
    sink.write(recordsWithLsn((1 to 16).map(i =>
      (i, "c", s"q$i", s"a$i", java.lang.Long.valueOf(i.toLong))).toSeq), epochId = 1)
    val table = Paths.get(dir, "testc_faq_items")
    val manifestV1 = Files.readAllBytes(table.resolve("_manifest"))

    // epoch 2 updates one key (one dirty bucket), then we simulate a
    // crash BETWEEN the epoch-dir write and the manifest flip by
    // restoring the previous manifest: the exact on-disk state a crash
    // there leaves behind (both epoch dirs present, pointer on v1)
    val epoch2 = recordsWithLsn(Seq((1, "u", "q1-crash", "a1b", java.lang.Long.valueOf(100L))))
    sink.write(epoch2, epochId = 2)
    Files.write(table.resolve("_manifest"), manifestV1)

    // pre-crash state is fully intact — nothing was deleted before the flip
    val preReplay = sink.readTable(spark, "testc.faq.items").orderBy("id").collect()
    assert(preReplay.length == 16)
    assert(preReplay.find(_.getAs[Int]("id") == 1).get.getAs[String]("q") == "q1")

    // the replayed epoch merges against the intact v1 state and converges
    sink.write(epoch2, epochId = 2)
    val state = sink.readTable(spark, "testc.faq.items").orderBy("id").collect()
    assert(state.length == 16)
    assert(state.find(_.getAs[Int]("id") == 1).get.getAs[String]("q") == "q1-crash")
    assert(state.find(_.getAs[Int]("id") == 16).get.getAs[String]("q") == "q16")
  }

  test("compaction with clusterBy z-orders rows within each bucket file, same MERGE result") {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft-upz").toString
    val sink = new ParquetUpsertSink(dir, Seq("id"), numBuckets = 2,
      clusterBy = Some(("id", "__lsn")), clusterBits = 8)
    // lsn deliberately uncorrelated with id so z-order differs from both
    // single-column sorts
    sink.write(recordsWithLsn((1 to 40).map(i =>
      (i, "c", s"q$i", s"a$i", java.lang.Long.valueOf((i * 37 % 50).toLong))).toSeq),
      epochId = 1)
    sink.write(recordsWithLsn(Seq((3, "u", "q3-v2", "a3",
      java.lang.Long.valueOf(60L)))), epochId = 2)
    val table = Paths.get(dir, "testc_faq_items")
    val expected = sink.readTable(spark, "testc.faq.items").orderBy("id").collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("q"))).toSeq

    sink.compact(spark, "testc.faq.items")
    val after = sink.readTable(spark, "testc.faq.items").orderBy("id").collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("q"))).toSeq
    assert(after == expected, "MERGE result must be identical after clustered compaction")

    def zRef(a: Long, b: Long): Long = (0 until 8).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }
    val compactDir = Files.list(table).iterator().asScala
      .find(_.getFileName.toString.startsWith("data-compact-")).get
    val bucketDirs = Files.list(compactDir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("__bucket=")).toSeq
    assert(bucketDirs.nonEmpty)
    bucketDirs.foreach { bd =>
      val files = Files.list(bd).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq
      assert(files.size == 1, s"one file per bucket, got ${files.size} in $bd")
      val zs = spark.read.parquet(files.head.toString)
        .select("id", "__lsn").collect()
        .map(r => zRef(r.getAs[Int]("id").toLong, r.getAs[Long]("__lsn")))
      assert(zs.length > 1 && zs.sameElements(zs.sorted),
        s"bucket ${bd.getFileName} rows not in Morton order")
    }
  }

  test("upsert compaction: N epochs fold to one dir, same MERGE result, fewer files, old epochs gone") {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft-upc").toString
    val sink = new ParquetUpsertSink(dir, Seq("id"), numBuckets = 4)
    // 6 epochs: creates, repeated same-key updates (the first epoch's
    // dir keeps a STALE subdir for that bucket — dir-level GC cannot
    // touch it while other buckets still reference the dir), a delete
    sink.write(recordsWithLsn((1 to 12).map(i =>
      (i, "c", s"q$i", s"a$i", java.lang.Long.valueOf(i.toLong))).toSeq), epochId = 1)
    (2 to 5).foreach { e =>
      sink.write(recordsWithLsn(Seq(
        (2, "u", s"q2-v$e", "a2", java.lang.Long.valueOf(100L + e)))), epochId = e.toLong)
    }
    sink.write(recordsWithLsn(Seq((12, "d", s"q12", s"a12",
      java.lang.Long.valueOf(999L)))), epochId = 6)

    val table = Paths.get(dir, "testc_faq_items")
    def epochDirs() = Files.list(table).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("data-"))
      .map(_.getFileName.toString).toSet
    def parquetFiles() = Files.walk(table).iterator().asScala
      .count(_.toString.endsWith(".parquet"))
    val expected = sink.readTable(spark, "testc.faq.items")
      .orderBy("id").collect().map(r => (r.getAs[Int]("id"), r.getAs[String]("q"))).toSeq
    assert(epochDirs().size > 1, "fixture must be fragmented before compaction")
    val filesBefore = parquetFiles()

    sink.compact(spark, "testc.faq.items")
    assert(epochDirs() == Set("data-compact-6"), s"old epochs must be gone: ${epochDirs()}")
    assert(parquetFiles() < filesBefore, "compaction must reduce the file count")
    val after = sink.readTable(spark, "testc.faq.items")
      .orderBy("id").collect().map(r => (r.getAs[Int]("id"), r.getAs[String]("q"))).toSeq
    assert(after == expected, "MERGE result must be identical after compaction")

    // repeated compaction is a no-op (single-dir guard, no self-overwrite)
    sink.compact(spark, "testc.faq.items")
    assert(epochDirs() == Set("data-compact-6"))

    // idempotency watermark survives: replaying epoch 6 is skipped,
    // and the next epoch merges against compacted state
    sink.write(recordsWithLsn(Seq((1, "u", "q1-replay", "a1",
      java.lang.Long.valueOf(5000L)))), epochId = 6)
    assert(sink.readTable(spark, "testc.faq.items")
      .filter(org.apache.spark.sql.functions.col("id") === 1).head().getAs[String]("q") == "q1")
    sink.write(recordsWithLsn(Seq((1, "u", "q1-new", "a1",
      java.lang.Long.valueOf(5000L)))), epochId = 7)
    assert(sink.readTable(spark, "testc.faq.items")
      .filter(org.apache.spark.sql.functions.col("id") === 1).head().getAs[String]("q") == "q1-new")
  }

  test("upsert auto-compaction bounds epoch-dir growth across a long stream") {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft-upac").toString
    val sink = new ParquetUpsertSink(dir, Seq("id"), numBuckets = 4,
      autoCompactAfterDirs = 2)
    (1 to 8).foreach { e =>
      sink.write(recordsWithLsn(Seq(
        (e, "c", s"q$e", s"a$e", java.lang.Long.valueOf(e.toLong)))), epochId = e.toLong)
    }
    val table = Paths.get(dir, "testc_faq_items")
    val dirs = Files.list(table).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("data-"))
      .toSeq
    assert(dirs.size <= 2, s"auto-compaction must bound dir growth, saw ${dirs.map(_.getFileName)}")
    assert(sink.readTable(spark, "testc.faq.items").count() == 8)
  }

  test("foreach kv sink puts from executors, honors tombstones and memory admission") {
    TestKvStore.clear()
    val sink = new ForeachKvSink(() => new TestKvClient(maxBytes = Long.MaxValue), batchSize = 2)
    val schema = graft.model.Envelope.recordSchema(keySchema, rowSchema)
    val rows = Seq(
      Row("testc.faq.items", Row(1), Row("c", null, Row(1, "q1", "a1"),
          Row("pg", "db", "faq", "items", 1L, "false", 0L), 0L), Map.empty[String, String]),
      Row("testc.faq.items", Row(2), Row("c", null, Row(2, "q2", "a2"),
          Row("pg", "db", "faq", "items", 2L, "false", 0L), 0L), Map.empty[String, String]),
      Row("testc.faq.items", Row(1), null, Map.empty[String, String])) // tombstone
    // one partition: cross-partition put/tombstone order for one key is
    // undefined (keys must be routed, OrderedDelivery.keyOrdered)
    val batch = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    sink.write(batch, 0)
    assert(TestKvStore.get("testc.faq.items", """{"id":2}""").isDefined)
    assert(TestKvStore.get("testc.faq.items", """{"id":1}""").isEmpty)

    // a store that reports no headroom rejects the chunk after retries
    val full = new ForeachKvSink(() => new TestKvClient(maxBytes = 1),
      admissionRetries = 1, sleeper = _ => ())
    val e = intercept[org.apache.spark.SparkException] { full.write(batch, 1) }
    assert(e.getMessage.contains("memory threshold") ||
           Option(e.getCause).exists(_.getMessage.contains("memory threshold")))

    // extended format carries headers in the stored document
    TestKvStore.clear()
    val ext = new ForeachKvSink(() => new TestKvClient(maxBytes = Long.MaxValue),
      extendedFormat = true)
    ext.write(batch, 2)
    val stored = TestKvStore.get("testc.faq.items", """{"id":2}""").get
    assert(stored.contains(""""headers":""") && stored.contains(""""value":"""))

    // tombstone THEN re-insert of the same key in one chunk must leave
    // the re-inserted value (order-preserving flush, not puts-then-deletes)
    TestKvStore.clear()
    val schema2 = graft.model.Envelope.recordSchema(keySchema, rowSchema)
    val reinsert = Seq(
      Row("testc.faq.items", Row(9), Row("c", null, Row(9, "old", "old"),
          Row("pg", "db", "faq", "items", 1L, "false", 0L), 0L), Map.empty[String, String]),
      Row("testc.faq.items", Row(9), null, Map.empty[String, String]), // tombstone
      Row("testc.faq.items", Row(9), Row("c", null, Row(9, "new", "new"),
          Row("pg", "db", "faq", "items", 2L, "false", 0L), 0L), Map.empty[String, String]))
    val ordered = spark.createDataFrame(spark.sparkContext.parallelize(reinsert, 1), schema2)
    new ForeachKvSink(() => new TestKvClient(maxBytes = Long.MaxValue)).write(ordered, 3)
    val fin = TestKvStore.get("testc.faq.items", """{"id":9}""")
    assert(fin.isDefined && fin.get.contains("\"new\""), s"tombstone clobbered the re-insert: $fin")
  }

  test("queue chunker flushes mid-batch on the byte cap and rejects oversize singles") {
    def msg(n: Int, size: Int) = QueueSink.Message("d", s"k$n", "x" * size)
    val chunks = QueueSink.chunkBySize(
      Iterator(msg(1, 40), msg(2, 40), msg(3, 40), msg(4, 10)), maxCount = 10, maxBytes = 100)
      .map(_.map(_.orderingKey)).toSeq
    assert(chunks == Seq(Seq("k1", "k2"), Seq("k3", "k4"))) // 40+40 fits, +40 flushes
    val counted = QueueSink.chunkBySize(
      (1 to 5).iterator.map(i => msg(i, 1)), maxCount = 2, maxBytes = 100).toSeq
    assert(counted.map(_.length) == Seq(2, 2, 1))
    intercept[IllegalArgumentException] {
      QueueSink.chunkBySize(Iterator(msg(1, 200)), 10, 100).next()
    }
  }

  test("parquet upsert sink evolves schema (basic) or rejects drift (none)") {
    val schemaV2 = StructType(Seq(
      StructField("id", IntegerType), StructField("q", StringType),
      StructField("a", StringType), StructField("rating", IntegerType)))
    def recordsV2(ids: Seq[Int], lsnBase: Long) = {
      val schema = graft.model.Envelope.recordSchema(keySchema, schemaV2)
      val rows = ids.map { i =>
        Row("testc.faq.items", Row(i),
            Row("u", null, Row(i, s"q$i-v2", s"a$i-v2", i * 10),
                Row("pg", "db", "faq", "items", lsnBase + i, "false", 0L), 0L),
            Map.empty[String, String])
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    }

    val dir = Files.createTempDirectory("graft-up-evo").toString
    val sink = new ParquetUpsertSink(dir, Seq("id"))
    sink.write(records(2), epochId = 1) // v1 schema: id,q,a
    sink.write(recordsV2(Seq(2, 3), 100L), epochId = 2) // v2 adds rating
    val state = sink.readTable(spark, "testc.faq.items").orderBy("id").collect()
    assert(state.map(_.getAs[Int]("id")).toSeq == Seq(1, 2, 3))
    // old row reads the new column as null; updated row carries it
    assert(state.find(_.getAs[Int]("id") == 1).get.isNullAt(state.head.fieldIndex("rating")))
    assert(state.find(_.getAs[Int]("id") == 2).get.getAs[Int]("rating") == 20)

    val strictDir = Files.createTempDirectory("graft-up-strict").toString
    val strict = new ParquetUpsertSink(strictDir, Seq("id"),
      schemaEvolution = ParquetUpsertSink.SchemaEvolution.None)
    strict.write(records(2), epochId = 1)
    val e = intercept[Exception] { strict.write(recordsV2(Seq(2), 100L), epochId = 2) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("schema drift")))
  }

  test("multi-epoch upsert converges to the batch apply-changes state (randomized)") {
    import org.apache.spark.sql.functions.{col, coalesce, lit}
    val rnd = new scala.util.Random(42) // fixed seed: deterministic test
    val schema = graft.model.Envelope.recordSchema(keySchema, rowSchema)
    var lsn = 0L
    def randomEpoch(n: Int) = (1 to n).map { _ =>
      lsn += 1
      val id = rnd.nextInt(20)
      val op = rnd.nextInt(10) match { case 0 | 1 => "d"; case 2 => "c"; case _ => "u" }
      val payload = Row(id, s"q$id-$lsn", s"a$id-$lsn")
      Row("testc.faq.items", Row(id),
          Row(op, if (op == "d") payload else null, if (op == "d") null else payload,
              Row("pg", "db", "faq", "items", lsn, "false", 0L), 0L),
          Map.empty[String, String])
    }
    val epochs = (1 to 5).map(_ => randomEpoch(40))
    val dir = Files.createTempDirectory("graft-up-rand").toString
    val sink = new ParquetUpsertSink(dir, Seq("id"), numBuckets = 4)
    epochs.zipWithIndex.foreach { case (rows, i) =>
      sink.write(spark.createDataFrame(spark.sparkContext.parallelize(rows), schema), i.toLong)
    }
    val incremental = sink.readTable(spark, "testc.faq.items")
      .select("id", "q", "a").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq

    val all = spark.createDataFrame(spark.sparkContext.parallelize(epochs.flatten), schema)
    val batch = graft.operators.ApplyChanges.latestState(all,
        keyCols = Seq(col("key.id")),
        orderCols = Seq(coalesce(col("value.source.lsn"), lit(0L))),
        opCol = col("value.op"))
      .select(col("key.id").as("id"), col("value.after.q").as("q"), col("value.after.a").as("a"))
      .orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(incremental == batch, s"incremental=$incremental\nbatch=$batch")
  }

  test("parquet upsert sink: incoming beats stored state on lsn ties; deletes win by order") {
    val dir = Files.createTempDirectory("graft-up4").toString
    val sink = new ParquetUpsertSink(dir, Seq("id"))
    // lsn-less envelopes: __lsn falls back to ts_ms (5) for every record
    sink.write(recordsWithLsn(Seq((1, "c", "q1", "a1", null))), epochId = 1)
    // same key, same (null) lsn: the incoming update must still apply
    sink.write(recordsWithLsn(Seq((1, "u", "q1-new", "a1-new", null))), epochId = 2)
    val state = sink.readTable(spark, "testc.faq.items").collect()
    assert(state.length == 1 && state.head.getAs[String]("q") == "q1-new")
    // delete with a real lsn removes the key
    sink.write(recordsWithLsn(Seq((1, "d", "q1-new", "a1-new", java.lang.Long.valueOf(50L)))), epochId = 3)
    assert(sink.readTable(spark, "testc.faq.items").count() == 0)
  }
}
