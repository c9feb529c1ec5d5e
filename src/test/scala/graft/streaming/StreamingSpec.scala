package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{ExtractionJob, TranscriptGen}
import graft.schema.Turn

class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("batch replay is idempotent: re-writing the same batchId leaves no duplicates") {
    val sp = spark; import sp.implicits._
    val outDir = Files.createTempDirectory("graft-replay-out").toString + "/out"
    val all = TranscriptGen.dataset(spark, 6).collect().toSeq
    val (b0, b1) = all.splitAt(all.size / 2)

    StreamingExtract.writeBatch(b0.toDS(), 0L, outDir)
    // crash between write and checkpoint commit -> the stream REPLAYS
    // batch 0 on restart; the dynamic partition overwrite must absorb it
    StreamingExtract.writeBatch(b0.toDS(), 0L, outDir)
    StreamingExtract.writeBatch(b1.toDS(), 1L, outDir)

    val got = spark.read.parquet(outDir)
      .select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
    val expected = all.map(t => (t.conv_id, t.turn_idx)).sorted
    assert(got == expected, s"replay duplicated or lost rows: got ${got.size}, expected ${expected.size}")
  }

  test("file-source AvailableNow stream equals batch extraction, exactly-once across restarts") {
    val sp = spark; import sp.implicits._
    val inDir = Files.createTempDirectory("graft-stream-in").toString
    val outDir = Files.createTempDirectory("graft-stream-out").toString + "/out"
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString

    val all = TranscriptGen.dataset(spark, 20).collect().toSeq
    val (first, second) = all.splitAt(all.size / 2)

    // drop 1: first half arrives
    first.toDS().write.mode("append").parquet(inDir)
    StreamingExtract.runAvailableNow(spark, inDir, outDir, ckpt)

    // drop 2: second half arrives; restart drains ONLY the new files
    second.toDS().write.mode("append").parquet(inDir)
    StreamingExtract.runAvailableNow(spark, inDir, outDir, ckpt)

    val streamed = spark.read.parquet(outDir)
      .select("conv_id", "turn_idx", "text_clean")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val batch = ExtractionJob.extract(all.toDS())
      .select("conv_id", "turn_idx", "text_clean")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(streamed == batch)
    assert(streamed.size == all.size)
  }

  test("maxFilesPerTrigger bounds micro-batches (the reference's batch_size=5 watcher semantics)") {
    val sp = spark; import sp.implicits._
    val inDir = Files.createTempDirectory("graft-mb-in").toString
    val ckpt = Files.createTempDirectory("graft-mb-ckpt").toString
    val turns = TranscriptGen.dataset(spark, 6).collect().toSeq
    // 12 separate files
    turns.grouped(math.max(turns.size / 12, 1)).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDS().coalesce(1).write.mode("append").parquet(inDir)
    }
    val nFiles = new java.io.File(inDir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFiles >= 10)

    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingExtract.readTurns(spark, inDir, maxFilesPerTrigger = 5)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Turn], _: Long) =>
        batchSizes.synchronized { batchSizes += batch.count() }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(batchSizes.size >= 3, s"expected >=3 micro-batches for $nFiles files at 5/trigger, got $batchSizes")
    assert(batchSizes.sum == turns.size.toLong)
  }

  test("stateful conversation progress via mapGroupsWithState accumulates across batches") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Turn]
    val q = StreamingExtract.conversationProgress(input.toDS())
      .writeStream
      .format("memory")
      .queryName("conv_progress")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    val turns = TranscriptGen.dataset(spark, 3).collect().toSeq
    val (b1, b2) = turns.splitAt(turns.size / 2)
    input.addData(b1)
    q.processAllAvailable()
    input.addData(b2)
    q.processAllAvailable()
    q.stop()

    // latest state per conversation must equal the batch ground truth
    val latest = spark.sql(
      """SELECT conv_id, max_by(n_turns, n_turns) AS n_turns,
        |       max(max_turn_idx) AS max_turn_idx
        |FROM conv_progress GROUP BY conv_id""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val expected = turns.groupBy(_.conv_id).map { case (cid, ts) =>
      (cid, ts.size.toLong, ts.map(_.turn_idx).max)
    }.toSeq.sorted
    assert(latest == expected)
  }

  test("streaming exact dedup drops cross-batch duplicate fingerprints") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Turn]
    val q = StreamingExtract.dedupTurns(input.toDS())
      .writeStream
      .format("memory")
      .queryName("dedup_stream")
      .outputMode("append")
      .start()
    val base = TranscriptGen.dataset(spark, 3).collect().toSeq
    // batch 1: originals; batch 2: the SAME texts under different ids
    // (same fingerprint -> must be dropped) plus one genuinely new text
    input.addData(base)
    q.processAllAvailable()
    val dupes = base.take(5).map(t => t.copy(conv_id = t.conv_id + "-copy"))
    val fresh = base.head.copy(conv_id = "fresh",
      text = "a brand new never seen before text body")
    input.addData(dupes :+ fresh)
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT text FROM dedup_stream").collect().map(_.getString(0))
    val gotFps = got.map(t => t.toLowerCase.trim.replaceAll("\\s+", " ")).distinct
    assert(got.length == gotFps.length, "emitted stream must contain no duplicate fingerprints")
    assert(got.exists(_.contains("brand new never seen")), "genuinely new text must pass")
    assert(!spark.sql("SELECT 1 FROM dedup_stream WHERE conv_id LIKE '%-copy'")
      .collect().exists(_ => true), "cross-batch duplicates must be dropped")
  }

  test("streaming near-dup suppression drops a cross-batch NEAR duplicate within the watermark") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vocab = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon").split(" ")
    def doc(seed: Long): String =
      (0 until 60).map { i =>
        vocab(((TranscriptGen.sm64(seed * 131 + i) >>> 33) % vocab.length).toInt)
      }.mkString(" ")
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingExtract.nearDupNovel(
      input.toDS().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts",
      watermark = "30 minutes", windowLength = "5 minutes")
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    val t0 = 1700000000000L
    // batch 1: ten distinct documents
    input.addData((0L until 10L).map(i => (i, doc(i), new java.sql.Timestamp(t0))))
    q.processAllAvailable()
    // batch 2 (10 min later, inside the watermark): a NEAR duplicate of
    // doc 0 — same text plus a tail token, different id — and one
    // genuinely novel document
    input.addData(Seq(
      (100L, doc(0) + " tailword", new java.sql.Timestamp(t0 + 10 * 60 * 1000L)),
      (101L, doc(42), new java.sql.Timestamp(t0 + 10 * 60 * 1000L))))
    q.processAllAvailable()
    // batch 3: heartbeat far in the future advances the watermark so the
    // earlier windows close and emit
    input.addData(Seq((999L, doc(77), new java.sql.Timestamp(t0 + 3 * 3600 * 1000L))))
    q.processAllAvailable()
    q.stop()
    // ids ride as strings (total cast for any id type — ANSI-safe)
    val ids = spark.sql("SELECT id FROM neardup_stream")
      .collect().map(_.getString(0)).toSet
    assert((0 until 10).map(_.toString).forall(ids.contains),
      s"all ten batch-1 originals must emit as novel, got $ids")
    assert(ids.contains("101"), "the genuinely new batch-2 document must emit")
    assert(!ids.contains("100"),
      "the cross-batch NEAR duplicate must be suppressed (shares band buckets with doc 0)")
    assert(!ids.contains("999"), "heartbeat's window has not closed yet")
  }

  test("session_window sessionization closes sessions in streaming append mode") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Turn]
    val q = StreamingExtract.sessions(
      input.toDS().toDF(), "conv_id", "ts", "30 minutes", watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").start()
    def turn(c: String, i: Int, ms: Long) =
      Turn(c, i, "user", s"text $i", "", new java.sql.Timestamp(ms))
    val t0 = 1700000000000L
    val H = 3600 * 1000L
    // c1: two turns 5 min apart (one session), a third 2h later (second session)
    input.addData(Seq(turn("c1", 0, t0), turn("c1", 1, t0 + 5 * 60 * 1000L),
      turn("c1", 2, t0 + 2 * H)))
    q.processAllAvailable()
    input.addData(Seq(turn("c2", 0, t0 + 10 * H))) // advances the watermark
    q.processAllAvailable()
    input.addData(Seq(turn("c3", 0, t0 + 20 * H))) // advances it further
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT conv_id, n_rows FROM sessions_stream")
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    // closed: c1's 2-turn and 1-turn sessions, c2's single; c3 still open
    assert(got == Seq(("c1", 1L), ("c1", 2L), ("c2", 1L)), s"got $got")
  }

  test("event-time windowed rollup with watermark over a turn stream") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Turn]
    val q = StreamingExtract.turnsPerHour(input.toDS())
      .writeStream
      .format("memory")
      .queryName("turns_hourly")
      .outputMode("update")
      .start()
    val turns = TranscriptGen.dataset(spark, 4).collect().toSeq
    input.addData(turns)
    q.processAllAvailable()
    q.stop()
    val got = spark.sql(
      """SELECT CAST(window.start AS STRING) AS ws, role, max(n_turns) AS n
        |FROM turns_hourly GROUP BY 1, 2""".stripMargin)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val expected = turns.groupBy(t =>
      (java.time.Instant.ofEpochMilli(t.ts.getTime - Math.floorMod(t.ts.getTime, 3600000L))
        .toString.replace("T", " ").replace("Z", ""), t.role))
      .map { case (k, v) => k -> v.size.toLong }
    expected.foreach { case ((ws, role), n) =>
      val key = (ws, role)
      val wsKey = got.keys.find(k => k._2 == role && k._1.startsWith(ws.take(13)))
      assert(got.exists { case ((w, r), c) => r == role && c == n &&
        w.take(13) == ws.take(13) }, s"missing window $key=$n in $got; probe=$wsKey")
    }
  }
}
