package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{functions, SparkSession}
import org.json4s._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.TextKernel
import graft.schema.{ExtractedTurn, Turn}

class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-pipeline-spec")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** A scheme-qualified (`file://`) Hadoop path for a fresh temp dir: the
    * checkpoint/curation/backup suites drive the pipeline through the
    * Hadoop FileSystem surface (the one HDFS/object-store deployments
    * use), not through `java.nio`-only local paths.
    */
  private def fsTmp(prefix: String): String =
    "file://" + Files.createTempDirectory(prefix)

  private lazy val goldenTexts: Set[String] = {
    val in = getClass.getResourceAsStream("/graft/golden_kernel.json")
    val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    val json = org.json4s.jackson.JsonMethods.parse(s)
    (json \ "rows").asInstanceOf[JArray].arr.map { r =>
      (r \ "text") match { case JString(t) => t; case _ => "" }
    }.toSet
  }

  test("generator parity with the python fixture generator (bit-identical)") {
    // tools/gen_goldens.py generated texts for conv<40, turn<min(turns,30);
    // every Scala-generated text for the same coordinates must be in the
    // golden corpus (proving splitmix64 + fragment parity).
    var checked = 0
    (0L until 40L).foreach { conv =>
      (0 until math.min(TranscriptGen.convTurns(conv), 30)).foreach { turn =>
        val t = TranscriptGen.turnText(conv, turn)
        assert(goldenTexts.contains(t), s"conv=$conv turn=$turn text not in goldens: ${t.take(60)}")
        checked += 1
      }
    }
    info(s"$checked generated texts matched python generator output")
    assert(checked > 600)
  }

  test("generator dataset: schema, counts, ordering keys, heavy tail") {
    val n = 120
    val ds = TranscriptGen.dataset(spark, n)
    val rows = ds.collect()
    val expectedTotal = TranscriptGen.totalTurns(n)
    assert(rows.length == expectedTotal)
    val byConv = rows.groupBy(_.conv_id)
    assert(byConv.size == n)
    // turn_idx dense 0..k-1 per conversation
    byConv.foreach { case (c, ts) =>
      assert(ts.map(_.turn_idx).sorted.sameElements(0 until ts.length), c)
    }
    // heavy tail: conv 0 and conv 97 are 50x
    assert(byConv("conv00000000").length >= 200)
    assert(byConv("conv00000097").length >= 200)
    // ts monotone within conversation
    byConv.foreach { case (c, ts) =>
      val sorted = ts.sortBy(_.turn_idx)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(!b.ts.before(a.ts), c)
        case _           =>
      }
    }
  }

  test("extraction matches the kernel applied per turn (distributed = local)") {
    val sp = spark; import sp.implicits._
    val ds = TranscriptGen.dataset(spark, 30)
    val out = ExtractionJob.extract(ds).collect()
    val kernel = new TextKernel
    val inputs = ds.collect().map(t => (t.conv_id, t.turn_idx) -> t).toMap
    assert(out.length == inputs.size)
    out.foreach { e =>
      val t = inputs((e.conv_id, e.turn_idx))
      val expected = kernel.process(t.text)
      assert(e.text_clean == expected.text,
        s"distributed != local for ${e.conv_id}/${e.turn_idx}")
      assert(e.conf_delta == expected.metrics.confidenceImprovement)
      assert(e.success)
    }
  }

  test("error rows: empty text becomes success=false row, not an exception") {
    val sp = spark; import sp.implicits._
    val ts = java.sql.Timestamp.from(java.time.Instant.EPOCH)
    val ds = spark.createDataset(Seq(
      Turn("c1", 0, "user", "texto normal valido aqui", "", ts),
      Turn("c1", 1, "assistant", "", "", ts),
      Turn("c1", 2, "tool", null, "search", ts)))
    val out = ExtractionJob.extract(ds).collect().sortBy(_.turn_idx)
    assert(out.length == 3)
    assert(out(0).success)
    assert(!out(1).success && out(1).error_message.isDefined)
    assert(!out(2).success)
  }

  test("salting invariance: output independent of salt bucket count") {
    val sp = spark; import sp.implicits._
    val ds = TranscriptGen.dataset(spark, 25)
    def norm(rows: Array[ExtractedTurn]) =
      rows.map(e => (e.conv_id, e.turn_idx, e.text_clean, e.conf_delta))
        .sortBy(r => (r._1, r._2)).toSeq
    val base = norm(ExtractionJob.extract(ds, saltBuckets = 0).collect())
    val salted = norm(ExtractionJob.extract(ds, saltBuckets = 8).collect())
    val salted64 = norm(ExtractionJob.extract(ds, saltBuckets = 64).collect())
    assert(base == salted)
    assert(base == salted64)
  }

  test("salting spread: a giant conversation's turns land on MULTIPLE tasks, not one") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions._
    // conv 0 is the heavy-tail 50x conversation (every 97th); without salt
    // a conv_id repartition serializes all its turns through ONE task —
    // the salt must spread it across partitions (the north rule's skew story)
    // one-partition input: the generator's range layout puts all of
    // conv0's turns in one split, the exact "clustered input" shape
    // salting exists for
    val ds = TranscriptGen.dataset(spark, 25, partitions = 1)
    val giant = TranscriptGen.convTurns(0)
    assert(giant >= 200, s"conv0 must be the 50x tail, got $giant turns")
    // measured through the REAL operator: spark_partition_id after the
    // kernel map reflects the salted shuffle's partitions (narrow map).
    // This is also the AQE regression guard: a bare repartition(cols...)
    // was byte-coalesced back to ONE partition at this scale, silently
    // un-spreading the giant conversation
    def partsOfConv0(saltBuckets: Int): Long =
      ExtractionJob.extract(ds, saltBuckets).toDF()
        .withColumn("pid", spark_partition_id())
        .where(col("conv_id") === "conv00000000")
        .select(countDistinct(col("pid"))).first().getLong(0)
    assert(partsOfConv0(0) == 1L, "unsalted clustered input = one task (the skew)")
    assert(partsOfConv0(8) > 1L, "salted extraction must spread the giant conversation")
  }

  test("assembly: stable turn ordering regardless of input row order") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions._
    val ds = TranscriptGen.dataset(spark, 12)
    // shuffle input rows deliberately
    val shuffled = ds.orderBy(hash(col("turn_idx"), col("conv_id"))).as[Turn]
    val extracted = ExtractionJob.extract(shuffled)
    val assembled = ExtractionJob.assemble(extracted).collect()
      .map(r => r.getAs[String]("conv_id") -> r).toMap

    val kernel = new TextKernel
    val expected = ds.collect().groupBy(_.conv_id).map { case (c, ts) =>
      c -> ts.sortBy(_.turn_idx).map(t => kernel.process(t.text).text).mkString("\n\n")
    }
    expected.foreach { case (c, fullText) =>
      val row = assembled(c)
      assert(row.getAs[String]("full_text") == fullText, s"conv $c assembly mismatch")
      assert(row.getAs[Long]("n_turns") == TranscriptGen.convTurns(c.stripPrefix("conv").toLong))
    }
    assert(assembled.size == 12)
  }

  test("checkpoint: resume skips completed buckets, final result identical") {
    val sp = spark; import sp.implicits._
    val outDir = fsTmp("graft-ckpt")
    val ds = TranscriptGen.dataset(spark, 40)
    val numBuckets = 8

    // full run
    val run1 = Checkpoint.run(ds, outDir, numBuckets, runId = "run-1", groupSize = 3)
    assert(run1.map(_.partId).sorted == (0 until numBuckets))
    val full = Checkpoint.readResult(spark, outDir, numBuckets)
    val fullCount = full.count()
    assert(fullCount == TranscriptGen.totalTurns(40))

    // simulate crash: delete 2 manifests (data may or may not survive)
    Seq(2, 5).foreach { k =>
      Fs.deleteIfExists(s"$outDir/manifests/part-$k.json")
    }
    assert(Checkpoint.completedBuckets(outDir, numBuckets).size == numBuckets - 2)

    // resume run: only buckets 2 and 5 recomputed
    val run2 = Checkpoint.run(ds, outDir, numBuckets, runId = "run-2", groupSize = 3)
    assert(run2.map(_.partId).sorted == Seq(2, 5))
    // untouched manifests keep run-1
    (0 until numBuckets).filterNot(Seq(2, 5).contains).foreach { k =>
      assert(Checkpoint.readManifest(outDir, k).get.runId == "run-1", s"bucket $k recomputed")
    }
    assert(Checkpoint.readManifest(outDir, 2).get.runId == "run-2")

    val resumed = Checkpoint.readResult(spark, outDir, numBuckets)
    assert(resumed.count() == fullCount)
    // content identical to a direct extraction
    val direct = ExtractionJob.extract(ds).collect()
      .map(e => (e.conv_id, e.turn_idx, e.text_clean)).sortBy(r => (r._1, r._2)).toSeq
    val fromCkpt = resumed.select("conv_id", "turn_idx", "text_clean").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).sortBy(r => (r._1, r._2)).toSeq
    assert(fromCkpt == direct)

    // manifests carry row counts that add up
    val manifestRows = (0 until numBuckets)
      .flatMap(Checkpoint.readManifest(outDir, _)).map(_.rows).sum
    assert(manifestRows == fullCount)
  }

  test("checkpoint invalidation: changed config hash recomputes, unchanged skips, TTL expires") {
    val outDir = fsTmp("graft-ckpt-inv")
    val ds = TranscriptGen.dataset(spark, 20)
    val numBuckets = 4

    val run1 = Checkpoint.run(ds, outDir, numBuckets, runId = "r1",
      groupSize = 4, configHash = "kernel-v1")
    assert(run1.map(_.partId).sorted == (0 until numBuckets))

    // unchanged config: zero recompute
    val run2 = Checkpoint.run(ds, outDir, numBuckets, runId = "r2",
      groupSize = 4, configHash = "kernel-v1")
    assert(run2.isEmpty)
    (0 until numBuckets).foreach(k =>
      assert(Checkpoint.readManifest(outDir, k).get.runId == "r1"))

    // changed config (kernel/config version bump): every bucket is stale
    val run3 = Checkpoint.run(ds, outDir, numBuckets, runId = "r3",
      groupSize = 4, configHash = "kernel-v2")
    assert(run3.map(_.partId).sorted == (0 until numBuckets))
    (0 until numBuckets).foreach { k =>
      val m = Checkpoint.readManifest(outDir, k).get
      assert(m.runId == "r3" && m.configHash == "kernel-v2")
    }

    // data still complete and correct after the invalidation-driven rewrite
    assert(Checkpoint.readResult(spark, outDir, numBuckets).count() ==
      TranscriptGen.totalTurns(20))

    // manifest row counts (from the write-time Observation) add up exactly
    val manifestRows = (0 until numBuckets)
      .flatMap(Checkpoint.readManifest(outDir, _)).map(_.rows).sum
    assert(manifestRows == TranscriptGen.totalTurns(20))

    // TTL: an expired manifest is stale even with a matching config hash
    val now = System.currentTimeMillis()
    assert(Checkpoint.validBuckets(outDir, numBuckets, "kernel-v2",
      ttlMs = Long.MaxValue, nowMs = now).size == numBuckets)
    assert(Checkpoint.validBuckets(outDir, numBuckets, "kernel-v2",
      ttlMs = 0L, nowMs = now + 10000).isEmpty)
    Thread.sleep(10)
    val run4 = Checkpoint.run(ds, outDir, numBuckets, runId = "r4",
      groupSize = 4, configHash = "kernel-v2", ttlMs = 1L)
    assert(run4.map(_.partId).sorted == (0 until numBuckets))
  }

  test("checkpoint: stale bucket recomputed to ZERO rows deletes its old data dir") {
    import org.apache.spark.sql.functions.{col, hash, pmod, lit}
    val outDir = fsTmp("graft-ckpt-zero")
    val ds = TranscriptGen.dataset(spark, 20)
    val numBuckets = 4

    val run1 = Checkpoint.run(ds, outDir, numBuckets, runId = "r1",
      groupSize = 4, configHash = "v1")
    assert(run1.map(_.partId).sorted == (0 until numBuckets))

    // find a bucket and drop every conversation that lands in it, then
    // recompute under a new config hash: the bucket's new result is 0 rows
    val victim = 1
    import spark.implicits._
    val filtered = ds.where(
      pmod(hash(col("conv_id")), lit(numBuckets)) =!= victim).as[Turn]
    assert(filtered.count() < ds.count(), "victim bucket must be non-empty")

    val run2 = Checkpoint.run(filtered, outDir, numBuckets, runId = "r2",
      groupSize = 4, configHash = "v2")
    assert(run2.map(_.partId).sorted == (0 until numBuckets))
    val m = Checkpoint.readManifest(outDir, victim).get
    assert(m.rows == 0L && m.runId == "r2")
    // the stale parquet from r1 must be GONE — dynamic partition overwrite
    // never touches a partition the new job wrote no rows for
    assert(!Fs.exists(s"$outDir/data/part_id=$victim"),
      "zero-row recomputed bucket must have its old data directory deleted")
    assert(m.bytes == 0L)
    // readResult serves exactly the filtered input, no stale rows
    assert(Checkpoint.readResult(spark, outDir, numBuckets).count() == filtered.count())
  }

  test("checkpoint: bucket-count mismatch fails loudly instead of dropping/duplicating") {
    val outDir = fsTmp("graft-ckpt-nb")
    val ds = TranscriptGen.dataset(spark, 10)
    Checkpoint.run(ds, outDir, 8, runId = "nb-1", groupSize = 3)
    // placement is mod numBuckets: a "resume" under a different count
    // would silently lose (smaller) or duplicate (larger) conversations
    intercept[IllegalStateException] { Checkpoint.run(ds, outDir, 4, runId = "nb-2") }
    intercept[IllegalStateException] { Checkpoint.run(ds, outDir, 16, runId = "nb-3") }
    intercept[IllegalStateException] { Checkpoint.readResult(spark, outDir, 4) }
    assert(Checkpoint.readResult(spark, outDir, 8).count() ==
      TranscriptGen.totalTurns(10))
    // the multi-group run's input staging scratch never outlives the run
    assert(!Fs.exists(s"$outDir/.input-staged"))
  }

  test("checkpoint: committed manifest over a missing data dir fails readResult loudly") {
    val outDir = fsTmp("graft-ckpt-miss")
    val ds = TranscriptGen.dataset(spark, 10)
    val run1 = Checkpoint.run(ds, outDir, 4, runId = "m-1")
    val k = run1.filter(_.rows > 0).head.partId
    Fs.deleteTree(s"$outDir/data/part_id=$k")
    // manifest-present/data-missing violates the commit discipline —
    // surfacing corruption beats silently serving a partial store
    intercept[IllegalStateException] { Checkpoint.readResult(spark, outDir, 4) }
  }

  test("backup: corrupt/id-mismatched manifests are skipped, stale staging reaped") {
    val outDir = fsTmp("graft-bk-guard")
    val backupDir = fsTmp("graft-bk-guard-dst")
    val ds = TranscriptGen.dataset(spark, 10)
    Checkpoint.run(ds, outDir, 4, runId = "b-1")
    Backup.backup(outDir, 4, backupDir, "b1")
    // a truncated backup.json must not brick the listing for the whole dir
    Fs.mkdirs(s"$backupDir/bad")
    Fs.writeAtomic(s"$backupDir/bad/backup.json", "{truncated")
    // a hand-copied dir whose manifest still declares the original id
    // must not alias two directories under one id
    Fs.mkdirs(s"$backupDir/b1-old")
    Fs.copyFile(s"$backupDir/b1/backup.json", s"$backupDir/b1-old/backup.json")
    assert(Backup.listBackups(backupDir).map(_.backupId) == Seq("b1"))
    // a crashed backup's .tmp staging dir is reaped once past retention
    Fs.mkdirs(s"$backupDir/.dead.tmp/files")
    Backup.cleanupOldBackups(backupDir, retentionMs = 1000L,
      nowMs = System.currentTimeMillis() + 10000L)
    assert(!Fs.exists(s"$backupDir/.dead.tmp"))
    assert(Fs.exists(s"$backupDir/b1"), "most recent backup per source is always kept")
  }

  test("backup/restore: full + incremental watermarks, hash validation, retention") {
    val outDir = fsTmp("graft-bk-src")
    val backupDir = fsTmp("graft-bk-dst")
    val ds = TranscriptGen.dataset(spark, 30)
    val numBuckets = 8
    Checkpoint.run(ds, outDir, numBuckets, runId = "r1", groupSize = 4)
    val total = TranscriptGen.totalTurns(30)

    // full backup captures every bucket
    val b1 = Backup.backup(outDir, numBuckets, backupDir, "b1")
    assert(b1.mode == "full" && b1.buckets.sorted == (0 until numBuckets))
    assert(b1.files.nonEmpty && Backup.readBackupManifest(backupDir, "b1").isDefined)

    // nothing changed: incremental is empty and commits NO backup dir
    val b2 = Backup.backup(outDir, numBuckets, backupDir, "b2", incremental = true)
    assert(b2.buckets.isEmpty && Backup.readBackupManifest(backupDir, "b2").isEmpty)

    // recommit two buckets, then incremental picks up exactly those — no
    // sleep: selection is per-bucket IDENTITY (runId@commit@rows@bytes),
    // so a recommit within the same millisecond is still detected
    Seq(2, 5).foreach(k => Fs.deleteIfExists(s"$outDir/manifests/part-$k.json"))
    Checkpoint.run(ds, outDir, numBuckets, runId = "r2", groupSize = 4)
    val b3 = Backup.backup(outDir, numBuckets, backupDir, "b3", incremental = true)
    assert(b3.mode == "incremental" && b3.buckets.sorted == Seq(2, 5))

    // restore full, then layer the incremental: bucket dirs are REPLACED,
    // and the restored store reads back complete and exact
    val restoreDir = fsTmp("graft-bk-restore")
    val r1 = Backup.restore(backupDir, "b1", restoreDir)
    assert(r1.ok && r1.filesRestored == b1.files.size)
    val r3 = Backup.restore(backupDir, "b3", restoreDir)
    assert(r3.ok)
    assert(Checkpoint.readResult(spark, restoreDir, numBuckets).count() == total)
    assert(Checkpoint.readManifest(restoreDir, 2).get.runId == "r2")
    assert(Checkpoint.readManifest(restoreDir, 0).get.runId == "r1")

    // corruption: flip a byte in a backed-up data file -> restore refuses
    // to write ANYTHING
    // flip a byte UNDERNEATH the filesystem (raw java.nio on the local
    // file) — simulates bit rot; Hadoop's local FS then fails its .crc
    // check on read, which Fs.md5 reports as corruption, not a crash
    val victim = Paths.get(backupDir.stripPrefix("file://"), "b1", "files",
      b1.files.find(_.relPath.contains("part_id=")).get.relPath)
    val bytes = Files.readAllBytes(victim)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x7f).toByte
    Files.write(victim, bytes)
    val badDir = fsTmp("graft-bk-bad")
    val rBad = Backup.restore(backupDir, "b1", badDir)
    assert(!rBad.ok && rBad.corruptFiles.nonEmpty && rBad.filesRestored == 0)
    assert(!Fs.exists(s"$badDir/data"), "corrupt restore must write nothing")

    // retention with chain protection: while the newest backup is the
    // INCREMENTAL b3, its full base b1 must survive any window — deleting
    // it would make b3 unrestorable
    val deleted0 = Backup.cleanupOldBackups(backupDir, retentionMs = 0L,
      nowMs = System.currentTimeMillis() + 100000)
    assert(deleted0.isEmpty,
      s"b1 is the full base of kept incremental b3 — must survive, deleted $deleted0")
    assert(Backup.listBackups(backupDir).map(_.backupId).sorted == Seq("b1", "b3"))

    // a fresh FULL backup supersedes the chain: now b1 AND b3 are deletable
    val b4 = Backup.backup(outDir, numBuckets, backupDir, "b4")
    assert(b4.mode == "full" && b4.buckets.sorted == (0 until numBuckets))
    val deleted1 = Backup.cleanupOldBackups(backupDir, retentionMs = 0L,
      nowMs = System.currentTimeMillis() + 100000)
    assert(deleted1.sorted == Seq("b1", "b3"))
    assert(Backup.listBackups(backupDir).map(_.backupId) == Seq("b4"))

    // reusing an id must FAIL, not silently replace a chain link; explicit
    // overwrite is the escape hatch
    intercept[IllegalStateException] {
      Backup.backup(outDir, numBuckets, backupDir, "b4")
    }
    assert(Backup.backup(outDir, numBuckets, backupDir, "b4",
      overwrite = true).mode == "full")

    // per-source retention: a SECOND checkpoint store sharing this
    // backupDir must keep its own most recent backup even when its only
    // backup is past retention and the other source has a newer one —
    // "keep the newest" is per sourceDir, not global
    val outDir2 = fsTmp("graft-bk-src2")
    Checkpoint.run(TranscriptGen.dataset(spark, 10), outDir2, numBuckets,
      runId = "s1", groupSize = 4)
    val c1 = Backup.backup(outDir2, numBuckets, backupDir, "c1",
      nowMs = System.currentTimeMillis() - 1000000L)
    assert(c1.buckets.nonEmpty)
    val deleted2 = Backup.cleanupOldBackups(backupDir, retentionMs = 0L,
      nowMs = System.currentTimeMillis() + 100000)
    assert(deleted2.isEmpty,
      s"c1 is its source's only backup — must survive, deleted $deleted2")
    assert(Backup.listBackups(backupDir).map(_.backupId).sorted == Seq("b4", "c1"))
  }

  test("curation chain: stage lineage counts, resume, downstream-only invalidation, decontam") {
    val outDir = fsTmp("graft-curation")
    val docs = DocGen.dataset(spark, 800, partitions = 8)

    // ---- cold run: every stage computes, counts chain monotonically
    val r1 = CurationJob.run(spark, docs, outDir, "c1", inputId = "synth:800")
    assert(r1.map(_.stage) == Seq("clean", "gates", "exact", "neardup", "split"))
    assert(r1.forall(!_.resumed))
    val rows = r1.map(s => s.stage -> s.rows).toMap
    assert(rows("clean") > 0 && rows("clean") < 800,
      s"C4 must drop some adversarial docs: ${rows("clean")}")
    assert(rows("gates") < rows("clean"), "repetition gates must drop documents")
    assert(rows("exact") < rows("gates"), "planted exact duplicates must be removed")
    assert(rows("neardup") < rows("exact"), "planted near duplicates must be removed")
    assert(rows("split") == rows("neardup"))
    // manifest rows == actual parquet rows for every stage (the lineage a
    // downstream consumer trusts)
    r1.foreach { s =>
      assert(spark.read.parquet(CurationJob.stageDataDir(outDir, s.stage)).count() == s.rows,
        s"manifest/parquet row mismatch at ${s.stage}")
    }
    // dedup output has no two docs with equal fingerprint
    val dd = spark.read.parquet(CurationJob.stageDataDir(outDir, "exact"))
    assert(dd.groupBy(graft.operators.TextAnalysis.fingerprint(functions.col("text")))
      .count().where(functions.col("count") > 1).count() == 0,
      "exact duplicates must be gone after the exact stage")
    // split partitions cover the output exactly
    val split = spark.read.parquet(CurationJob.stageDataDir(outDir, "split"))
    assert(split.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val", "test")))
    assert(split.count() == rows("split"))

    // ---- resume: identical config skips every stage
    val r2 = CurationJob.run(spark, docs, outDir, "c2", inputId = "synth:800")
    assert(r2.forall(_.resumed), s"full resume expected, got $r2")

    // ---- invalidation: a gates-stage parameter change recomputes gates
    // and everything downstream but leaves clean untouched
    val cfg3 = CurationJob.Config(maxDupLineFrac = 0.25)
    val r3 = CurationJob.run(spark, docs, outDir, "c3", cfg3, inputId = "synth:800")
    val resumed3 = r3.map(s => s.stage -> s.resumed).toMap
    assert(resumed3("clean") && !resumed3("gates") && !resumed3("exact") &&
      !resumed3("neardup") && !resumed3("split"), s"got $r3")
    val rows3 = r3.map(s => s.stage -> s.rows).toMap

    // ---- decontamination: plant a benchmark of 3 curated docs — each
    // shares all its 8-gram shingles with its train source, so those
    // (plus any other train doc sharing >= 2 such 8-grams) are removed;
    // split recomputes on the new upstream (same cfg3 so clean..dedup
    // resume; the dedup parquet is RE-read because r3 overwrote it)
    val bench = spark.read.parquet(CurationJob.stageDataDir(outDir, "neardup"))
      .orderBy(functions.col("doc_id")).limit(3)
    val r4 = CurationJob.run(spark, docs, outDir, "c4", cfg3,
      inputId = "synth:800", test = Some(bench), testId = "bench-3")
    assert(r4.map(_.stage) == Seq("clean", "gates", "exact", "neardup", "decontam", "split"))
    val resumed4 = r4.map(s => s.stage -> s.resumed).toMap
    assert(resumed4("clean") && resumed4("gates") && resumed4("exact") &&
      resumed4("neardup") && !resumed4("decontam") && !resumed4("split"), s"got $r4")
    val decontamRows = r4.find(_.stage == "decontam").get.rows
    assert(decontamRows <= rows3("neardup") - 3 && decontamRows > 0,
      s"decontam must remove at least the 3 planted benchmark docs: " +
        s"$decontamRows of ${rows3("neardup")}")

    // the whole chain obeys the cache-lifecycle invariant: four full runs
    // (incl. minhash dedup and decontamination) left nothing persisted
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "curation chain must leave no persisted RDDs behind")
  }

  test("curation chain: optional C4 span-dedup stage — lineage, resume, toggle invalidation") {
    val outDir = fsTmp("graft-curation-spans")
    val docs = DocGen.dataset(spark, 600, partitions = 8)
    val cfgS = CurationJob.Config(spanDedup = true)

    // cold: the spans stage sits between clean and gates and must drop
    // documents — DocGen's planted exact duplicates are 6..19-line docs
    // whose every span is a non-keeper duplicate, so they come back empty
    val r1 = CurationJob.run(spark, docs, outDir, "s1", cfgS, inputId = "synth:600")
    assert(r1.map(_.stage) ==
      Seq("clean", "spans", "gates", "exact", "neardup", "split"))
    val rows = r1.map(s => s.stage -> s.rows).toMap
    assert(rows("spans") < rows("clean"),
      s"planted whole-doc duplicates must be emptied by span dedup: $rows")
    assert(rows("gates") <= rows("spans"))
    // whole-doc exact duplicates vanish at the spans stage, but near-dup
    // plants COLLAPSE there instead: all spans shared with the original
    // are removed, leaving only the distinctive tail line — and those
    // identical remainders become fresh exact duplicates the exact stage
    // then removes. Downstream stages still monotonically shrink
    assert(rows("exact") <= rows("gates"), s"got $rows")
    // the surviving corpus has no duplicated 3-line span anywhere
    val spansOut = spark.read.parquet(CurationJob.stageDataDir(outDir, "spans"))
    val unitCol = functions.split(functions.col("text"), "\n")
    val dupSpans = spansOut
      .where(functions.size(unitCol) >= 3)
      .select(functions.explode(functions.transform(
        functions.sequence(functions.lit(0), functions.size(unitCol) - 3),
        i => functions.md5(functions.concat_ws("\n",
          functions.slice(unitCol, i + 1, functions.lit(3)))))).as("k"))
      .groupBy("k").count().where(functions.col("count") > 1).count()
    assert(dupSpans == 0, "no 3-unit span may occur twice after the spans stage")

    // resume: identical config skips everything including spans
    val r2 = CurationJob.run(spark, docs, outDir, "s2", cfgS, inputId = "synth:600")
    assert(r2.forall(_.resumed), s"full resume expected, got $r2")

    // toggling the flag off removes the stage and invalidates gates and
    // downstream (upstream identity flips back to clean) — never clean
    val r3 = CurationJob.run(spark, docs, outDir, "s3", inputId = "synth:600")
    assert(r3.map(_.stage) == Seq("clean", "gates", "exact", "neardup", "split"))
    val resumed3 = r3.map(s => s.stage -> s.resumed).toMap
    assert(resumed3("clean") && !resumed3("gates"), s"got $r3")
    // ...and RETRACTS the now-inactive spans stage: its corpus-sized
    // parquet and its manifest (which no downstream stage pins any more)
    // must not linger as a stale, current-looking stage dir
    assert(!Fs.exists(s"$outDir/stages/spans"),
      "toggling span-dedup off must retract the orphaned spans stage")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("curation chain: optional Gopher quality gate — equivalence, resume, invalidation") {
    import graft.operators.TextAnalysis
    val outA = fsTmp("graft-curation-gq-base")
    val outB = fsTmp("graft-curation-gq")
    val docs = DocGen.dataset(spark, 600, partitions = 8)
    // the synthetic vocabulary contains no English stop words, so the
    // corpus-appropriate configuration turns that one rule off (the
    // documented knob); every other threshold stays at the paper default
    val p = TextAnalysis.GopherQualityParams(minStopWords = 0)
    val cfgQ = CurationJob.Config(gopherQuality = Some(p))

    val rA = CurationJob.run(spark, docs, outA, "a1", inputId = "synth:600")
    val rB = CurationJob.run(spark, docs, outB, "b1", cfgQ, inputId = "synth:600")
    // the gate composes INTO the gates stage — no new stage, no new scan
    assert(rB.map(_.stage) == Seq("clean", "gates", "exact", "neardup", "split"))
    val gA = rA.find(_.stage == "gates").get.rows
    val gB = rB.find(_.stage == "gates").get.rows
    assert(gB > 0 && gB < gA,
      s"quality gate must drop short documents but not all: $gB of $gA")
    // pushable predicates commute: the gated chain's stage output equals
    // the baseline gates output filtered by the standalone predicate
    val baseOut = spark.read.parquet(CurationJob.stageDataDir(outA, "gates"))
    val expected = baseOut
      .where(TextAnalysis.gopherQualityGate(functions.col("text"), p)).count()
    assert(gB == expected, s"gated rows $gB != standalone-filtered $expected")
    val qOut = spark.read.parquet(CurationJob.stageDataDir(outB, "gates"))
    assert(qOut.where(!TextAnalysis.gopherQualityGate(functions.col("text"), p))
      .count() == 0, "every survivor must satisfy the gate")

    // resume: identical params skip every stage
    val rB2 = CurationJob.run(spark, docs, outB, "b2", cfgQ, inputId = "synth:600")
    assert(rB2.forall(_.resumed), s"full resume expected, got $rB2")
    // a threshold change recomputes gates + downstream, never clean
    val cfgQ2 = CurationJob.Config(gopherQuality = Some(p.copy(minWords = 40)))
    val rB3 = CurationJob.run(spark, docs, outB, "b3", cfgQ2, inputId = "synth:600")
    val resumed3 = rB3.map(s => s.stage -> s.resumed).toMap
    assert(resumed3("clean") && !resumed3("gates") && !resumed3("exact") &&
      !resumed3("split"), s"got $rB3")
    assert(rB3.find(_.stage == "gates").get.rows > gB,
      "relaxing minWords must keep more documents")
    // turning the gate off restores the pre-existing hash: gates rows
    // return to baseline (and old chains' manifests stay valid — outA's
    // second run resumes everything)
    val rB4 = CurationJob.run(spark, docs, outB, "b4", inputId = "synth:600")
    assert(rB4.find(_.stage == "gates").get.rows == gA)
    val rA2 = CurationJob.run(spark, docs, outA, "a2", inputId = "synth:600")
    assert(rA2.forall(_.resumed), "no-gate config hash must be unchanged")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("inputIdentity fingerprints the file listing: appends under the same path invalidate") {
    val dir = Files.createTempDirectory("graft-inpid").toString + "/d"
    DocGen.dataset(spark, 10).write.parquet(dir)
    val id1 = CurationJob.inputIdentity(spark, dir)
    assert(id1.startsWith(dir + "@n="), s"path inputs must carry a listing fingerprint: $id1")
    DocGen.dataset(spark, 5).write.mode("append").parquet(dir)
    val id2 = CurationJob.inputIdentity(spark, dir)
    assert(id1 != id2, "appending files must change the identity (stage 1 invalidates)")
    // synthetic descriptors fully determine content — identity is the descriptor
    assert(CurationJob.inputIdentity(spark, "synth:800") == "synth:800")
    // an unlistable path FAILS LOUDLY instead of degrading to a path-only
    // identity (two failed listings would share an identity across file
    // changes — the stale resume the fingerprint exists to prevent)
    intercept[java.io.IOException] {
      CurationJob.inputIdentity(spark, "/graft-definitely-missing/nope")
    }
  }

  test("planted contamination: decontam removes EXACTLY the contaminated survivors") {
    val outDir = fsTmp("graft-curation-plant")
    val nBench = 50L
    // the reserved bm-token space cannot collide with the corpus vocab,
    // so contaminated == planted — the expected removal count is exact
    val docs = DocGen.plantContamination(
      DocGen.dataset(spark, 800, partitions = 8), nBench)
    val bench = DocGen.benchmarkDocs(spark, nBench)
    val r = CurationJob.run(spark, docs, outDir, "p1",
      inputId = "synth:800:planted", test = Some(bench), testId = s"bench:$nBench")
    val rows = r.map(s => s.stage -> s.rows).toMap
    // count planted text that SURVIVED to the decontam stage's input (a
    // content predicate, not id arithmetic: dedup can copy planted text
    // onto unplanted ids and remove planted originals)
    val plantedSurvivors = spark.read
      .parquet(CurationJob.stageDataDir(outDir, "neardup"))
      .where(functions.col("text").rlike("bm[0-9a-f]{8}")).count()
    val removed = rows("neardup") - rows("decontam")
    assert(plantedSurvivors > 0, "some planted docs must survive cleaning+dedup")
    assert(removed == plantedSurvivors,
      s"decontam removed $removed, planted survivors $plantedSurvivors")
    // and nothing planted survives decontamination
    assert(spark.read.parquet(CurationJob.stageDataDir(outDir, "decontam"))
      .where(functions.col("text").rlike("bm[0-9a-f]{8}")).count() == 0L)
  }

  test("curation run refuses a test benchmark without a testId (resume-identity trap)") {
    val outDir = fsTmp("graft-curation-tid")
    val docs = DocGen.dataset(spark, 50, partitions = 2)
    val ex = intercept[IllegalArgumentException] {
      CurationJob.run(spark, docs, outDir, "t1", inputId = "synth:50",
        test = Some(docs.limit(2)))
    }
    assert(ex.getMessage.contains("testId"))
  }

  test("partition-count invariance: same output at 2 and 16 input partitions") {
    val a = ExtractionJob.extract(TranscriptGen.dataset(spark, 15, partitions = 2)).collect()
    val b = ExtractionJob.extract(TranscriptGen.dataset(spark, 15, partitions = 16)).collect()
    def norm(rows: Array[ExtractedTurn]) =
      rows.map(e => (e.conv_id, e.turn_idx, e.text_clean)).sortBy(r => (r._1, r._2)).toSeq
    assert(norm(a) == norm(b))
  }
}
