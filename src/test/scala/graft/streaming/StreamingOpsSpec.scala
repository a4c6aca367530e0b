package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** Structured Streaming specs: the same transform applied to a file-replay
  * stream and to the batch frame must agree (Spark's unified semantics —
  * this is the property the extension mandate cares about). */
class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark

  /** events (sf0.001) with ts normalized to TimestampType whatever
    * encoding the testdata shipped (nanos-as-long or timestamp[us]). */
  private lazy val batchEvents: DataFrame =
    graft.sources.Sources.normalizeTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))

  /** The same events re-staged as typed parquet (micros), one file, so the
    * replay is a single micro-batch: stream ≡ batch equality holds exactly.
    * (Multi-file replay of randomly-partitioned data would legitimately
    * drop out-of-order events past the watermark — that semantics is
    * pinned separately in the late-data test below.) */
  private lazy val stagedDir: String = {
    val dir = Files.createTempDirectory("events_stream").toString
    batchEvents.repartition(1).write.mode("overwrite").parquet(dir)
    dir
  }

  private def replay: DataFrame =
    StreamingOps.replayParquet(spark, stagedDir, batchEvents.schema, maxFilesPerTrigger = 10)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("tumbling window: stream result equals batch result") {
    val streamed = StreamingOps.runToMemory(spark,
      StreamingOps.tumblingCounts(replay, "1 hour"), "tumbling_out")
    val batch = StreamingOps.tumblingCounts(batchEvents, "1 hour")
    assert(sortedRows(streamed) == sortedRows(batch))
    assert(streamed.count() > 0)
  }

  test("session window: stream result equals batch result") {
    val streamed = StreamingOps.runToMemory(spark,
      StreamingOps.sessionCounts(replay, "5 minutes"), "session_out")
    val batch = StreamingOps.sessionCounts(batchEvents, "5 minutes")
    assert(sortedRows(streamed) == sortedRows(batch))
  }

  test("sliding window: stream result equals batch result") {
    val streamed = StreamingOps.runToMemory(spark,
      StreamingOps.slidingCounts(replay, "10 minutes", "5 minutes"), "sliding_out")
    val batch = StreamingOps.slidingCounts(batchEvents, "10 minutes", "5 minutes")
    assert(sortedRows(streamed) == sortedRows(batch))
  }

  test("watermark drops late data (event older than watermark is discarded)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = source.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingOps.tumblingCounts(events, "1 hour", watermark = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // batch 1: watermark advances to 12:50
      source.addData((ts("2024-01-01 10:30:00"), "a", 1.0), (ts("2024-01-01 13:00:00"), "a", 1.0))
      q.processAllAvailable()
      // batch 2: 10:45 is inside the already-finalized 10:00 window, far
      // behind the 12:50 watermark -> must be dropped
      source.addData((ts("2024-01-01 10:45:00"), "a", 1.0), (ts("2024-01-01 14:00:00"), "a", 1.0))
      q.processAllAvailable()
      // batch 3: advance watermark far enough to emit everything pending
      source.addData((ts("2024-01-01 20:00:00"), "a", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val counts = spark.table("late_out")
      .select($"window_start".cast("string"), $"n_events").as[(String, Long)]
      .collect().toMap
    assert(counts("2024-01-01 10:00:00") == 1L, "late 10:45 event must NOT be counted")
    assert(counts("2024-01-01 13:00:00") == 1L)
  }

  test("mapGroupsWithState carries per-user totals across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val events = source.toDF().toDF("ts", "user_id", "value")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val q = StreamingOps.runningUserTotals(events, watermark = "0 seconds")
      .writeStream.format("memory").queryName("state_out")
      .outputMode("update").start()
    try {
      source.addData((ts("2024-01-01 10:00:00"), 1L, 2.0),
        (ts("2024-01-01 10:00:10"), 1L, 3.0), (ts("2024-01-01 10:00:20"), 2L, 1.0))
      q.processAllAvailable()
      // state must carry (well inside the TTL): user 1 now 3 events, 10.0
      source.addData((ts("2024-01-01 10:01:00"), 1L, 5.0))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("state_out")
      .groupBy($"user_id").agg(max($"n_events").as("n"), max($"total_value").as("v"))
      .as[(Long, Long, Double)].collect().toMap2
    assert(last(1L) == (3L, 10.0))
    assert(last(2L) == (1L, 1.0))
  }

  test("runningUserTotals evicts state after the event-time TTL") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val events = source.toDF().toDF("ts", "user_id", "value")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val q = StreamingOps.runningUserTotals(events,
      watermark = "0 seconds", stateTtl = "5 minutes")
      .writeStream.format("memory").queryName("ttl_out")
      .outputMode("update").start()
    try {
      source.addData((ts("2024-01-01 10:00:00"), 1L, 2.0))
      q.processAllAvailable()
      // advance the watermark far past user 1's 10:05 timeout
      source.addData((ts("2024-01-01 11:00:00"), 9L, 1.0))
      q.processAllAvailable()
      source.addData((ts("2024-01-01 12:00:00"), 9L, 1.0)) // fires the timeout
      q.processAllAvailable()
      // user 1 returns: state was evicted, so totals restart from zero
      source.addData((ts("2024-01-01 12:00:30"), 1L, 5.0))
      q.processAllAvailable()
    } finally q.stop()
    val u1 = spark.table("ttl_out").where($"user_id" === 1L)
      .select($"n_events", $"total_value").as[(Long, Double)].collect().toSet
    assert(u1.contains((1L, 5.0)), s"expected a fresh (1, 5.0) row after eviction, got $u1")
    assert(!u1.contains((2L, 7.0)), s"state survived past TTL: $u1")
  }

  implicit class RowsOps(rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[Long, (Long, Double)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("flatMapGroupsWithState sessionization emits completed sessions on timeout") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, java.sql.Timestamp)]
    val events = source.toDF().toDF("user_id", "ts")
    val q = StreamingOps.sessionizeWithTimeout(events, gap = "5 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("fmgws_out")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      // session A: two events 1 min apart; session B for another user
      source.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:01:00")),
        (2L, ts("2024-01-01 10:00:30")))
      q.processAllAvailable()
      // advance the watermark past gap → both open sessions time out
      source.addData((9L, ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      source.addData((9L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val sessions = spark.table("fmgws_out")
      .select($"user_id", $"n_events").as[(Long, Long)].collect().toMap
    assert(sessions(1L) == 2L) // merged into one session of 2 events
    assert(sessions(2L) == 1L)
  }

  test("dropDuplicatesWithinWatermark removes in-watermark duplicate keys") {
    import spark.implicits._
    val dupDir = Files.createTempDirectory("events_dup").toString
    val dup = batchEvents.limit(50)
    dup.union(dup).write.mode("overwrite").parquet(dupDir) // every event twice
    val streamed = StreamingOps.runToMemory(spark,
      StreamingOps.dedupWithinWatermark(
        StreamingOps.replayParquet(spark, dupDir, batchEvents.schema, 8),
        Seq("event_id")),
      "dedup_out", outputMode = "append")
    assert(streamed.count() == 50)
    assert(streamed.select("event_id").as[Long].collect().toSet.size == 50)
  }

  test("mergeStreamIntoTable: continuous keyed upsert equals the last-write-wins table") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, Double, Long)]
    val updates = source.toDF().toDF("k", "name", "v", "version")
    val stage = Files.createTempDirectory("merge_stage").toString
    spark.sql("CREATE DATABASE IF NOT EXISTS test_stream_merge")
    spark.sql("DROP TABLE IF EXISTS test_stream_merge.t")
    val q = StreamingOps.mergeStreamIntoTable(
      updates, "test_stream_merge.t", Seq("k"), "version", stage)
    try {
      // batch 1 carries an in-batch duplicate key: version 1 must win
      // deterministically over version 0
      source.addData((1L, "a", 1.0, 1L), (2L, "b", 2.0, 1L), (2L, "b0", 0.5, 0L))
      q.processAllAvailable()
      val after1 = spark.table("test_stream_merge.t")
        .as[(Long, String, Double, Long)].collect().toSet
      assert(after1 == Set((1L, "a", 1.0, 1L), (2L, "b", 2.0, 1L)))
      // batch 2: update key 2, insert key 3; key 1 untouched
      source.addData((2L, "B", 9.0, 2L), (3L, "c", 3.0, 1L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("test_stream_merge.t")
      .as[(Long, String, Double, Long)].collect().toSet
    assert(got == Set((1L, "a", 1.0, 1L), (2L, "B", 9.0, 2L), (3L, "c", 3.0, 1L)))
  }

  test("dedupStreamIntoCorpus: later batches dedupe against earlier survivors via the stored index") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val docs = source.toDF().toDF("doc_id", "text")
    val corpus = Files.createTempDirectory("dedup_corpus").toString
    val index = Files.createTempDirectory("dedup_index").toString
    val uniqueA = "the quick brown fox jumps over the lazy dog near the river bank today"
    val uniqueB = "completely different prose about distributed query engines and shuffle plans"
    val nearA = uniqueA.replace("today", "tonight") // high-Jaccard near-dup of A
    val q = StreamingOps.dedupStreamIntoCorpus(
      docs, corpus, index, "text", "doc_id", threshold = 0.5)
    try {
      // batch 1: one doc + its in-batch near-dup -> min-id survivor only
      source.addData((1L, uniqueA), (2L, nearA))
      q.processAllAvailable()
      val after1 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(after1 == Set(1L), s"in-batch near-dup must collapse, got $after1")
      // batch 2: a near-dup of the INDEXED doc (dropped: cluster tainted
      // by the corpus) + a genuinely new doc (kept)
      source.addData((3L, nearA), (4L, uniqueB))
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(after2 == Set(1L, 4L), s"indexed near-dup must drop, got $after2")
      // the index grew with batch 2's survivor: a batch-3 near-dup of
      // uniqueB must now drop too
      val nearB = uniqueB.replace("plans", "graphs")
      source.addData((5L, nearB))
      q.processAllAvailable()
      val after3 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(after3 == Set(1L, 4L), s"index must grow per batch, got $after3")
    } finally q.stop()
    // the stored index holds exactly the survivors' projections
    val indexedIds = spark.read.parquet(s"$index/shingles")
      .select("id").as[Long].collect().toSet
    assert(indexedIds == Set(1L, 4L))
  }

  test("dedupStreamIntoCorpus: ANN index append — survivors only, probe ≡ rebuild on the final corpus") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{FrozenAnn, Similarity}
    implicit val sqlCtx = spark.sqlContext
    // deterministic synthetic 64-dim embeddings (the frozen artifacts'
    // dim); values are arbitrary — the properties checked are membership
    // and append≡rebuild parity, not recall
    def vec(seed: Long): Seq[Float] =
      Seq.tabulate(64)(i => ((seed * 31 + i * 7) % 97).toFloat / 97f - 0.5f)
    val source = MemoryStream[(Long, String, Seq[Float])]
    val docs = source.toDF().toDF("doc_id", "text", "embedding")
    val corpus = Files.createTempDirectory("ann_corpus").toString
    val index = Files.createTempDirectory("ann_index").toString
    val annDir = Files.createTempDirectory("ann_ivfpq").toString
    val uniqueA = "the quick brown fox jumps over the lazy dog near the river bank today"
    val uniqueB = "completely different prose about distributed query engines and shuffle plans"
    val nearA = uniqueA.replace("today", "tonight")
    val q = StreamingOps.dedupStreamIntoCorpus(
      docs, corpus, index, "text", "doc_id", threshold = 0.5,
      annIndex = Some(StreamingOps.AnnIndexConfig(
        annDir, "embedding", FrozenAnn.coarse, FrozenAnn.pqIndex)))
    // a probe against whatever the ANN dir holds right now — the
    // between-batches consumer a live retrieval service is
    def members(): Set[Long] = Similarity.loadIvfPqIndex(spark, annDir)
      .select("c_id").as[Long].collect().toSet
    def probeAll(idxDf: DataFrame, probes: DataFrame): Set[(Long, Long)] =
      Similarity.ivfPqTopKIndexed(
        idxDf, probes, "embedding", "doc_id",
        FrozenAnn.coarse, FrozenAnn.pqIndex, k = 1,
        nProbe = FrozenAnn.coarse.length)
        .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    try {
      source.addData((1L, uniqueA, vec(1)), (2L, nearA, vec(2)))
      q.processAllAvailable()
      // mid-stream: batch 1's survivor is probeable ALREADY (a probe
      // between batches sees every landed vector, nothing else)
      assert(members() == Set(1L),
        "batch 1's survivor must be probeable before batch 2 lands")
      // batch 2: a near-dup of the indexed doc (dropped — must NOT reach
      // the ANN index either) + a new doc (kept and indexed)
      source.addData((3L, nearA, vec(3)), (4L, uniqueB, vec(4)))
      q.processAllAvailable()
      assert(members() == Set(1L, 4L),
        "batch 2's new vector must become visible to the next probe")
    } finally q.stop()

    // the ANN index holds codes for exactly the corpus survivors
    val annIdx = Similarity.loadIvfPqIndex(spark, annDir)

    // probing the streamed-and-appended index ≡ probing a fresh build
    // over the final corpus (the append≡rebuild contract, end to end)
    val finalCorpus = spark.read.parquet(corpus)
    val probes = finalCorpus.where($"doc_id" === 1L)
    val viaStream = probeAll(annIdx, probes)
    val viaRebuild = probeAll(Similarity.buildIvfPqIndex(
      finalCorpus, "embedding", "doc_id", FrozenAnn.coarse, FrozenAnn.pqIndex),
      probes)
    assert(viaStream.nonEmpty && viaStream == viaRebuild)

    // compaction of the STREAMING-PRODUCED dirs (corpus + dedup index +
    // ANN dir in one call): per-batch partitions fold to batch_id=-1,
    // survivors and probe results identical — the close of the
    // batch-lands → index-appends → probe-sees → compaction-preserves
    // loop
    StreamingOps.compactCorpus(spark, corpus, index, annIndexDir = Some(annDir))
    val annParts = new java.io.File(annDir).listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("batch_id=")).toSet
    assert(annParts == Set("batch_id=-1"), s"ANN dir partitions: $annParts")
    assert(members() == Set(1L, 4L))
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      == Set(1L, 4L), "compaction must not change corpus survivors")
    assert(probeAll(Similarity.loadIvfPqIndex(spark, annDir),
      spark.read.parquet(corpus).where($"doc_id" === 1L)) == viaStream,
      "compaction must not change probe results")
  }

  test("dedupStreamIntoCorpus: per-batch fuzzy decontamination against a stored benchmark index") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and it was a " +
      "good day for all of you with this fine weather in the field near " +
      "the river bank where we like to walk for a while every morning"
    // marker every 7 tokens: no verbatim 8-gram run survives, trigram
    // Jaccard to the benchmark ~0.5 — the reworded leak only the fuzzy
    // probe can see (cf. the CorpusPipeline fuzzy spec)
    val reworded = base.split(" ").grouped(7).flatMap(_ :+ "qq9").mkString(" ")
    val clean = "cooking with fresh herbs is a joy and you should try it " +
      "for dinner this week with your family at home every single night"
    val benchIdx = Files.createTempDirectory("bench_idx").toString
    val benchSh = graft.operators.Dedup.shingleIndex(
      Seq((500L, base)).toDF("doc_id", "text"), "text", "doc_id")
    benchSh.write.mode("overwrite").parquet(s"$benchIdx/shingles")
    graft.operators.Dedup.minHashBandIndex(
      spark.read.parquet(s"$benchIdx/shingles"), threshold = 0.4)
      .write.mode("overwrite").parquet(s"$benchIdx/bands")

    val source = MemoryStream[(Long, String)]
    val docs = source.toDF().toDF("doc_id", "text")
    val corpus = Files.createTempDirectory("decon_corpus").toString
    val index = Files.createTempDirectory("decon_index").toString
    val q = StreamingOps.dedupStreamIntoCorpus(
      docs, corpus, index, "text", "doc_id", threshold = 0.8,
      benchmarkIndexDir = Some(benchIdx), decontaminateThreshold = 0.4)
    try {
      // batch 1: a verbatim leak + a clean doc — the leak is a trivial
      // fuzzy hit (J = 1.0), only the clean doc lands
      source.addData((1L, base), (2L, clean))
      q.processAllAvailable()
      val after1 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(after1 == Set(2L), s"verbatim leak must never land: $after1")
      // batch 2: the REWORDED leak (passes the 0.8 dedup probe — J to the
      // corpus is ~0, J to the benchmark ~0.5) + a near-dup of the stored
      // clean doc (dedup's kill, proving both probes run)
      source.addData((3L, reworded), (4L, clean.replace("night", "week")))
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(after2 == Set(2L), s"reworded leak + near-dup must both drop: $after2")
    } finally q.stop()
    // contaminated docs never reached the stored dedup index either
    val indexedIds = spark.read.parquet(s"$index/shingles")
      .select("id").as[Long].collect().toSet
    assert(indexedIds == Set(2L),
      s"a leak must not become an indexed survivor: $indexedIds")
  }

  test("dedupStreamIntoCorpus: PARTIAL sighead dir (mid-life upgrade) still drops near-dups of head-less docs") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    val corpus = Files.createTempDirectory("parthead_corpus").toString
    val index = Files.createTempDirectory("parthead_index").toString
    val uniqueA = "the quick brown fox jumps over the lazy dog near the river bank today"
    val uniqueB = "completely different prose about distributed query engines and shuffle plans"
    val uniqueC = "a third passage on watermarks checkpoints and stateful stream processing"
    // Pre-seed the index as a mid-life-upgraded stream leaves it: batch
    // 100 predates the sighead artifact (bands+shingles only), batch 101
    // post-dates it (all three) — so the heads dir EXISTS but covers only
    // doc 4, not doc 1. High batch ids avoid colliding with the fresh
    // stream's own batch 0 (the replay guard drops the current batch id).
    val b100 = Seq((1L, uniqueA)).toDF("doc_id", "text")
    val sh100 = Dedup.shingleIndex(b100, "text", "doc_id")
    sh100.write.parquet(s"$index/shingles/batch_id=100")
    Dedup.minHashBandIndex(sh100, threshold = 0.5)
      .write.parquet(s"$index/bands/batch_id=100")
    val b101 = Seq((4L, uniqueB)).toDF("doc_id", "text")
    val sh101 = Dedup.shingleIndex(b101, "text", "doc_id")
    sh101.write.parquet(s"$index/shingles/batch_id=101")
    Dedup.minHashBandIndex(sh101, threshold = 0.5)
      .write.parquet(s"$index/bands/batch_id=101")
    Dedup.minHashSignatureHead(sh101)
      .write.parquet(s"$index/sigheads/batch_id=101")

    val source = MemoryStream[(Long, String)]
    val docs = source.toDF().toDF("doc_id", "text")
    // gate forced open so the prefilter's head joins are actually in the
    // plan at spec scale — the pre-fix inner join silently dropped the
    // (1,3) candidate here and kept doc 3 as a false survivor
    val q = StreamingOps.dedupStreamIntoCorpus(
      docs, corpus, index, "text", "doc_id", threshold = 0.5,
      prefilterMinCandidates = 0.0)
    try {
      val nearA = uniqueA.replace("today", "tonight")
      source.addData((3L, nearA), (5L, uniqueC))
      q.processAllAvailable()
      val kept = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(kept == Set(5L),
        s"near-dup of the head-less indexed doc must drop via verify pass-through, got $kept")
    } finally q.stop()
  }

  test("compactCorpus: survivor sets identical to the uncompacted run; file count drops to O(1)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val uniqueA = "the quick brown fox jumps over the lazy dog near the river bank today"
    val uniqueB = "completely different prose about distributed query engines and shuffle plans"
    val uniqueC = "a third unrelated document describing harbor lights and evening tides calmly"
    val nearA = uniqueA.replace("today", "tonight")
    val nearB = uniqueB.replace("plans", "graphs")

    // run the same 4-batch ingestion twice: one run compacts after batch 2,
    // the control run never compacts — survivor sets must be identical
    def ingest(compactAfterBatch2: Boolean): (String, String) = {
      val corpus = Files.createTempDirectory("compact_corpus").toString
      val index = Files.createTempDirectory("compact_index").toString
      val source = MemoryStream[(Long, String)]
      val q = StreamingOps.dedupStreamIntoCorpus(
        source.toDF().toDF("doc_id", "text"), corpus, index,
        "text", "doc_id", threshold = 0.5)
      try {
        source.addData((1L, uniqueA), (2L, nearA)); q.processAllAvailable()
        source.addData((3L, uniqueB)); q.processAllAvailable()
        if (compactAfterBatch2)
          StreamingOps.compactCorpus(spark, corpus, index)
        // post-compaction batches must still dedupe against EVERYTHING
        // ingested before the compaction (the probe-equivalence property)
        source.addData((4L, nearA), (5L, nearB), (6L, uniqueC))
        q.processAllAvailable()
      } finally q.stop()
      (corpus, index)
    }

    def parquetFiles(dir: String): Seq[String] = {
      val root = java.nio.file.Paths.get(dir)
      val out = scala.collection.mutable.ArrayBuffer[String]()
      java.nio.file.Files.walk(root).forEach { p =>
        if (p.toString.endsWith(".parquet")) out += p.toString
      }
      out.toSeq
    }

    val (corpusC, indexC) = ingest(compactAfterBatch2 = true)
    val (corpusU, indexU) = ingest(compactAfterBatch2 = false)
    val survC = spark.read.parquet(corpusC).select("doc_id").as[Long].collect().toSet
    val survU = spark.read.parquet(corpusU).select("doc_id").as[Long].collect().toSet
    assert(survU == Set(1L, 3L, 6L), s"control run survivors wrong: $survU")
    assert(survC == survU, s"compaction changed survivors: $survC vs $survU")

    // final compaction folds everything: one partition dir, filesPerDir
    // parquet files per directory, contents unchanged
    StreamingOps.compactCorpus(spark, corpusC, indexC)
    assert(spark.read.parquet(corpusC).select("doc_id").as[Long].collect().toSet == survC)
    Seq(corpusC, s"$indexC/shingles", s"$indexC/bands").foreach { d =>
      assert(parquetFiles(d).size == 1, s"$d not compacted: ${parquetFiles(d)}")
      val parts = new java.io.File(d).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("batch_id=")).toSet
      assert(parts == Set("batch_id=-1"), s"$d partitions: $parts")
    }
    // the index after compaction still holds exactly the survivors
    val indexedIds = spark.read.parquet(s"$indexC/shingles")
      .select("id").as[Long].collect().toSet
    assert(indexedIds == survC)

    // idempotent: recompacting a compacted layout is a no-op
    StreamingOps.compactCorpus(spark, corpusC, indexC)
    assert(spark.read.parquet(corpusC).select("doc_id").as[Long].collect().toSet == survC)
  }

  test("compactCorpus: ANN index dir folds to one batch_id=-1 partition, probe-identical") {
    import spark.implicits._
    import graft.operators.{FrozenAnn, Similarity}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val annDir = Files.createTempDirectory("compact_ann").toString
    Similarity.appendToIvfPqIndex(emb.where($"vec_id" % 2 === 0), annDir,
      "embedding", "vec_id", FrozenAnn.coarse, FrozenAnn.pqIndex, batchId = 0)
    Similarity.appendToIvfPqIndex(emb.where($"vec_id" % 2 === 1), annDir,
      "embedding", "vec_id", FrozenAnn.coarse, FrozenAnn.pqIndex, batchId = 1)
    val probes = emb.where($"vec_id" < 20)
    def probe() = Similarity.ivfPqTopKIndexed(
      Similarity.loadIvfPqIndex(spark, annDir), probes, "embedding",
      "vec_id", FrozenAnn.coarse, FrozenAnn.pqIndex, k = 2)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    val before = probe()

    // corpus/index dirs that never existed are skipped by compaction —
    // the ANN dir is the one under test here
    val emptyCorpus = Files.createTempDirectory("compact_ann_c").toString + "/none"
    val emptyIndex = Files.createTempDirectory("compact_ann_i").toString + "/none"
    StreamingOps.compactCorpus(spark, emptyCorpus, emptyIndex,
      annIndexDir = Some(annDir))
    val parts = new java.io.File(annDir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("batch_id=")).toSet
    assert(parts == Set("batch_id=-1"), s"ANN dir partitions: $parts")
    assert(probe() == before, "compaction must not change probe results")

    // idempotent
    StreamingOps.compactCorpus(spark, emptyCorpus, emptyIndex,
      annIndexDir = Some(annDir))
    assert(probe() == before)
  }

  test("mergeStreamIntoTable: resumes from a checkpoint across a restart without double-applying") {
    import spark.implicits._
    val src = Files.createTempDirectory("merge_restart_src").toString
    val ckpt = Files.createTempDirectory("merge_restart_ckpt").toString
    val stage = Files.createTempDirectory("merge_restart_stage").toString
    spark.sql("CREATE DATABASE IF NOT EXISTS test_stream_merge")
    spark.sql("DROP TABLE IF EXISTS test_stream_merge.t2")
    def writeFile(rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("k", "name", "version").repartition(1)
        .write.mode("append").parquet(src)
    writeFile(Seq((1L, "a", 1L), (2L, "b", 1L)))
    val schema = spark.read.parquet(src).schema
    def start() = StreamingOps.mergeStreamIntoTable(
      StreamingOps.replayParquet(spark, src, schema, maxFilesPerTrigger = 1),
      "test_stream_merge.t2", Seq("k"), "version", stage, Some(ckpt))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.table("test_stream_merge.t2").count() == 2)
    // new data lands while the query is DOWN; restart must pick up ONLY
    // the unprocessed file (committed offsets live in the checkpoint)
    writeFile(Seq((2L, "B", 2L), (3L, "c", 1L)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.table("test_stream_merge.t2")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "a", 1L), (2L, "B", 2L), (3L, "c", 1L)))
  }

  test("stream-stream interval join: stream result equals batch result") {
    val clicks = batchEvents.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val purchases = batchEvents.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))

    val clickDir = Files.createTempDirectory("clicks_stream").toString
    val purchDir = Files.createTempDirectory("purch_stream").toString
    clicks.repartition(1).write.mode("overwrite").parquet(clickDir)
    purchases.repartition(1).write.mode("overwrite").parquet(purchDir)

    val streamed = StreamingOps.runToMemory(spark,
      StreamingOps.intervalJoin(
        StreamingOps.replayParquet(spark, clickDir, clicks.schema, 10),
        StreamingOps.replayParquet(spark, purchDir, purchases.schema, 10),
        "user_id", "click_ts", "p_ts", lookback = "1 hour"),
      "interval_join_out", outputMode = "append")
    val batch = StreamingOps.intervalJoin(
      clicks, purchases, "user_id", "click_ts", "p_ts", lookback = "1 hour")
    assert(sortedRows(streamed) == sortedRows(batch))
    assert(streamed.count() > 0, "fixture must produce at least one joined pair")
  }

  test("dedupStreamIntoCorpus: quality gate drops docs BEFORE dedup; gated docs never land or index") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // deliberately NO GraftFunctions.register here: foreachBatch runs on
    // a cloned session, so the operator must register the kernels itself
    // for a kernel-built gate to resolve (pinned regression)
    val source = MemoryStream[(Long, String)]
    val docs = source.toDF().toDF("doc_id", "text")
    val corpus = Files.createTempDirectory("gated_corpus").toString
    val index = Files.createTempDirectory("gated_index").toString
    // word-salad in the raw-pool vocabulary: strongly NEGATIVE under the
    // frozen target model (the target class is the English filler prose)
    val offTarget = "hash join scan batch filter column merge row value stream window table sort key agg"
    val nearOffTarget = offTarget.replace("agg", "group")
    // DSIR-style importance gate: frozen-model log-weight above a cut.
    // The filler-shaped doc scores strongly positive under FrozenDsir;
    // word-salad and junk score strongly negative.
    val target = graft.QmOracle.fillerSuffix.trim
    val gate = graft.operators.Dsir.logWeightCol(
      col("text"), graft.operators.FrozenDsir.model) >= 0.0
    val q = StreamingOps.dedupStreamIntoCorpus(
      docs, corpus, index, "text", "doc_id", threshold = 0.5,
      qualityGate = Some(gate))
    try {
      // batch 1: an on-target doc (passes) + an off-target doc (gated)
      source.addData((1L, target), (2L, offTarget))
      q.processAllAvailable()
      val after1 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(after1 == Set(1L), s"off-target doc must be gated out, got $after1")
      // batch 2: a near-dup of the GATED doc must also be judged by the
      // gate (not resurrected by the index's ignorance of doc 2), and an
      // on-target near-dup of doc 1 must drop at the DEDUP rung
      source.addData((3L, nearOffTarget), (4L, target + " extra token"))
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(after2 == Set(1L), s"gate-then-dedup must hold, got $after2")
    } finally q.stop()
    // the index holds only gate survivors that also survived dedup
    val indexedIds = spark.read.parquet(s"$index/shingles")
      .select("id").as[Long].collect().toSet
    assert(indexedIds == Set(1L), s"gated docs must never index, got $indexedIds")
  }

  test("dedupStreamIntoCorpus: the trained-LM perplexity gate composes through streaming ingestion") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // the CCNet LM-filter rung as the streaming qualityGate: the frozen
    // trigram backoff LM's exact integer decision (NgramLm.gateCol) is
    // just a boolean Column, so continuous ingestion gets the same gate
    // the batch pipeline's Config.perplexityGate applies — and the
    // kernel resolves on the cloned foreachBatch session because the
    // operator registers GraftFunctions itself (the pinned regression)
    val source = MemoryStream[(Long, String)]
    val docs = source.toDF().toDF("doc_id", "text")
    val corpus = Files.createTempDirectory("ppl_corpus").toString
    val index = Files.createTempDirectory("ppl_index").toString
    val fluent = graft.QmOracle.fillerSuffix.trim // the LM's reference prose
    val offRef = "hash join scan batch filter column merge row value stream window table sort key agg"
    val gate = graft.operators.NgramLm.gateCol(col("text"),
      graft.operators.FrozenNgramLm.model, minMeanLog = -3.0)
    val q = StreamingOps.dedupStreamIntoCorpus(
      docs, corpus, index, "text", "doc_id", threshold = 0.5,
      qualityGate = Some(gate))
    try {
      source.addData((1L, fluent), (2L, offRef))
      q.processAllAvailable()
      val kept = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L),
        s"only the reference-shaped doc may clear the LM gate, got $kept")
    } finally q.stop()
  }

  test("dedupStreamIntoCorpus: perceptual media dedup probes + grows the persisted hash index") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.AudioFixture
    implicit val sqlCtx = spark.sqlContext
    // continuous multimodal ingestion: docs carry an audio payload; the
    // media stage self-dedups batch 1 (no index yet), appends survivors'
    // hash frames, and later batches probe the index — a re-encoded copy
    // of an INGESTED clip must drop even when its text is fresh
    val source = MemoryStream[(Long, String, String, Array[Byte])]
    val docs = source.toDF().toDF("doc_id", "text", "media_type", "content")
    val corpus = Files.createTempDirectory("media_corpus").toString
    val index = Files.createTempDirectory("media_index").toString
    val t1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val t2 = "completely different prose about distributed query engines and shuffle plans"
    val t3 = "a third unrelated passage describing mountain weather patterns in spring"
    val t4 = "yet another standalone text on deep sea creatures and their glowing lures"
    val t5 = "final distinct words concerning ancient pottery excavated from dry valleys"
    val q = StreamingOps.dedupStreamIntoCorpus(
      docs, corpus, index, "text", "doc_id", threshold = 0.5,
      mediaDedup = Some(StreamingOps.MediaDedupConfig(
        "media_type", "content", kind = "audio", maxHamming = 4)))
    try {
      // batch 1: clip 0 + its exact-scaled twin (self-dedup -> min id)
      // + a payload-less doc (must pass the media stage)
      source.addData(
        (1L, t1, "audio/wav", AudioFixture.wavBytes(0L)),
        (2L, t2, "audio/wav", AudioFixture.wavBytesScaled(0L, 4, 5)),
        (3L, t3, null, null))
      q.processAllAvailable()
      val after1 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(after1 == Set(1L, 3L), s"in-batch media twin must collapse, got $after1")
      // batch 2: fresh text + a re-encoded copy of the INGESTED clip
      // (tainted via the index probe) and a genuinely fresh clip (kept)
      source.addData(
        (10L, t4, "audio/wav", AudioFixture.wavBytesScaled(0L, 3, 5)),
        (11L, t5, "audio/wav", AudioFixture.wavBytes(30L)))
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(after2 == Set(1L, 3L, 11L),
        s"indexed media twin must drop, fresh clip must land, got $after2")
    } finally q.stop()
    // the hash index holds exactly the decodable survivors' fingerprints
    val indexed = spark.read.parquet(s"$index/mediahashes")
      .select("id").as[Long].collect().toSet
    assert(indexed == Set(1L, 11L), s"got $indexed")
  }

  test("dedupStreamIntoCorpus: OVERSIZED media batch auto-splits the probe — outcome identical") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.AudioFixture
    implicit val sqlCtx = spark.sqlContext
    // The round-15 batch-size contract: a delta whose probe mass would
    // not fit local disk runs as sequential id-hash sub-batches instead
    // of warn-and-die. Fixture batches sit far below the 200k-row guard
    // floor, so the split is FORCED through MediaDedupConfig — the
    // ingested corpus and hash index must match the single-pass run of
    // the sibling test exactly (same fixture, same batches).
    val source = MemoryStream[(Long, String, String, Array[Byte])]
    val docs = source.toDF().toDF("doc_id", "text", "media_type", "content")
    val corpus = Files.createTempDirectory("media_corpus_split").toString
    val index = Files.createTempDirectory("media_index_split").toString
    val t1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val t2 = "completely different prose about distributed query engines and shuffle plans"
    val t3 = "a third unrelated passage describing mountain weather patterns in spring"
    val t4 = "yet another standalone text on deep sea creatures and their glowing lures"
    val t5 = "final distinct words concerning ancient pottery excavated from dry valleys"
    val q = StreamingOps.dedupStreamIntoCorpus(
      docs, corpus, index, "text", "doc_id", threshold = 0.5,
      mediaDedup = Some(StreamingOps.MediaDedupConfig(
        "media_type", "content", kind = "audio", maxHamming = 4,
        forceProbeGroups = Some(2))))
    try {
      source.addData(
        (1L, t1, "audio/wav", AudioFixture.wavBytes(0L)),
        (2L, t2, "audio/wav", AudioFixture.wavBytesScaled(0L, 4, 5)),
        (3L, t3, null, null))
      q.processAllAvailable()
      source.addData(
        (10L, t4, "audio/wav", AudioFixture.wavBytesScaled(0L, 3, 5)),
        (11L, t5, "audio/wav", AudioFixture.wavBytes(30L)))
      q.processAllAvailable()
      val landed = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(landed == Set(1L, 3L, 11L),
        s"staged probe must keep the single-pass survivors, got $landed")
    } finally q.stop()
    val indexed = spark.read.parquet(s"$index/mediahashes")
      .select("id").as[Long].collect().toSet
    assert(indexed == Set(1L, 11L), s"got $indexed")
  }

  test("dedupStreamIntoCorpus: per-batch MEDIA decontamination drops a planted benchmark image (batch ≡ stream)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{Dedup, ImageFixture}
    implicit val sqlCtx = spark.sqlContext
    // frozen benchmark hash index, persisted once per benchmark version
    // (the removeContaminatedMediaIndexed artifact contract)
    val benchDir = Files.createTempDirectory("media_bench_idx").toString
    val benchHashes = Dedup.imageHashFrame(
      ImageFixture.frame(spark).where($"media_id" % 5 === 0),
      "media_id", "media_type", "content")
    benchHashes.write.mode("overwrite").parquet(benchDir)
    val source = MemoryStream[(Long, String, String, Array[Byte])]
    val docs = source.toDF().toDF("doc_id", "text", "media_type", "content")
    val corpus = Files.createTempDirectory("media_decon_corpus").toString
    val index = Files.createTempDirectory("media_decon_index").toString
    val t1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val t2 = "completely different prose about distributed query engines and shuffle plans"
    val t3 = "a third unrelated passage describing mountain weather patterns in spring"
    val t4 = "yet another standalone text on deep sea creatures and their glowing lures"
    val t5 = "final distinct words concerning ancient pottery excavated from dry valleys"
    val q = StreamingOps.dedupStreamIntoCorpus(
      docs, corpus, index, "text", "doc_id", threshold = 0.5,
      mediaDedup = Some(StreamingOps.MediaDedupConfig(
        "media_type", "content", kind = "image", maxHamming = 6,
        benchmarkIndexDir = Some(benchDir), benchmarkMaxHamming = 6)))
    val all = Seq(
      (1L, t1, "image/png", ImageFixture.pngBytes(2L)),
      (2L, t2, null.asInstanceOf[String], null.asInstanceOf[Array[Byte]]),
      (10L, t3, "image/png", ImageFixture.pngBytes(16L)),
      (11L, t4, "image/png", ImageFixture.pngBytes(5L)),
      (12L, t5, "image/png", ImageFixture.pngBytes(8L)))
    try {
      // batch 1: a clean image (unrelated-triple member 2) + a
      // payload-less doc — both must pass the media stages
      source.addData(all(0), all(1))
      q.processAllAvailable()
      val after1 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(after1 == Set(1L, 2L), s"clean batch must land whole, got $after1")
      // batch 2 plants the leaks: image 16 = the fixture NEAR-TWIN of
      // benchmark image 15 (perceptual leak the exact probe would miss),
      // image 5 = an exact benchmark member, image 8 = genuinely fresh
      source.addData(all(2), all(3), all(4))
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(after2 == Set(1L, 2L, 12L),
        s"benchmark twin + exact member must drop, fresh image lands: $after2")
    } finally q.stop()
    // a decon-dropped doc must never index: later batches would
    // otherwise dedupe against a leaked survivor
    val indexed = spark.read.parquet(s"$index/mediahashes")
      .select("id").as[Long].collect().toSet
    assert(indexed == Set(1L, 12L), s"got $indexed")
    // batch ≡ stream: the batch operators over the SAME five docs (media
    // dedup, then the indexed media decon — the pipeline slot order)
    // keep exactly the streamed survivor set
    val streamedKept = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().toSet
    val allDf = all.toDF("doc_id", "text", "media_type", "content")
    val batchKept = Dedup.removeContaminatedMediaIndexed(
      Dedup.removeNearDuplicateImages(allDf, "doc_id", "media_type",
        "content", maxHamming = 6),
      spark.read.parquet(benchDir), "doc_id", "media_type", "content",
      kind = "image", maxHamming = 6)
      .select("doc_id").as[Long].collect().toSet
    assert(batchKept == streamedKept,
      s"batch semantics must equal streamed survivors: batch=$batchKept " +
        s"streamed=$streamedKept")
  }

  test("dedupStreamIntoCorpus: VIDEO kind probes + grows the per-frame hash index") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.VideoFixture
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, String, Array[Byte])]
    val docs = source.toDF().toDF("doc_id", "text", "media_type", "content")
    val corpus = Files.createTempDirectory("video_corpus").toString
    val index = Files.createTempDirectory("video_index").toString
    val t1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val t2 = "completely different prose about distributed query engines and shuffle plans"
    val t3 = "a third unrelated passage describing mountain weather patterns in spring"
    val t4 = "yet another standalone text on deep sea creatures and their glowing lures"
    val q = StreamingOps.dedupStreamIntoCorpus(
      docs, corpus, index, "text", "doc_id", threshold = 0.5,
      mediaDedup = Some(StreamingOps.MediaDedupConfig(
        "media_type", "content", kind = "video", maxHamming = 4)))
    try {
      // batch 1: clip 0 + its planted near-dup twin (clip 1 — every
      // aligned frame within 2 bits) -> empty-index self-dedup keeps min
      source.addData(
        (1L, t1, "video/avi", VideoFixture.aviBytes(0L)),
        (2L, t2, "video/avi", VideoFixture.aviBytes(1L)))
      q.processAllAvailable()
      val after1 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(after1 == Set(1L), s"in-batch video twin must collapse, got $after1")
      // batch 2: a byte-identical re-container of the INGESTED clip
      // (tainted via the per-frame index) + a fresh clip (kept)
      source.addData(
        (10L, t3, "video/avi", VideoFixture.aviBytes(0L)),
        (11L, t4, "video/avi", VideoFixture.aviBytes(9000L)))
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      assert(after2 == Set(1L, 11L),
        s"indexed video twin must drop, fresh clip must land, got $after2")
    } finally q.stop()
    // per-frame index: 3 sampled-frame rows per surviving clip
    val idx = spark.read.parquet(s"$index/mediahashes")
      .groupBy($"id").count().as[(Long, Long)].collect().toMap
    assert(idx == Map(1L -> 3L, 11L -> 3L), s"got $idx")
  }

  test("MediaDedupConfig alignFrames=false: the streaming video rung catches a TRIMMED re-upload") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.VideoFixture
    implicit val sqlCtx = spark.sqlContext
    def run(align: Boolean): Set[Long] = {
      val source = MemoryStream[(Long, String, String, Array[Byte])]
      val docs = source.toDF().toDF("doc_id", "text", "media_type", "content")
      val corpus = Files.createTempDirectory("video_set_corpus").toString
      val index = Files.createTempDirectory("video_set_index").toString
      val q = StreamingOps.dedupStreamIntoCorpus(
        docs, corpus, index, "text", "doc_id", threshold = 0.5,
        mediaDedup = Some(StreamingOps.MediaDedupConfig(
          "media_type", "content", kind = "video", maxHamming = 4,
          everyN = 1, alignFrames = align)))
      try {
        source.addData((1L,
          "the quick brown fox jumps over the lazy dog near the river bank",
          "video/avi", VideoFixture.aviBytes(0L)))
        q.processAllAvailable()
        // batch 2: clip 0 with its first frame trimmed — every surviving
        // frame identical, every ordinal shifted by one
        source.addData((2L,
          "completely different prose about distributed query engines here",
          "video/avi", VideoFixture.aviBytes(0L, fromFrame = 1)))
        q.processAllAvailable()
      } finally q.stop()
      spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
    }
    // the aligned probe is provably blind to the trim; the SET config
    // (wired through MediaDedupConfig) drops the re-upload at ingest
    assert(run(align = true) == Set(1L, 2L), "aligned rung must miss the trim")
    assert(run(align = false) == Set(1L), "SET rung must drop the trimmed re-upload")
  }
}
