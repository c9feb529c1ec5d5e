// Scheduler drive at the spark-submit surface (the composition
// SchedulerSpec covers only at unit level): two REAL scheduled jobs — a
// Trigger.AvailableNow streaming drain and a CurationJob resume tick —
// driven through two scheduler ticks with a simulated process kill (a
// fresh Runner rebuilt from the persisted state file) between them.
// Mirrors the reference's scheduler run loop (scheduler.py:437-536) and
// its persisted next_execution clocks (:95-116).
// Run via the verify skill's MainGenericRunner recipe; exits nonzero on
// any mismatch.
import org.apache.spark.sql.SparkSession
import graft.pipeline.{CurationJob, DocGen, TranscriptGen}
import graft.streaming.{Scheduler, StreamingExtract}

val spark = SparkSession.builder()
  .appName("graft-drive-scheduler")
  .config("spark.sql.shuffle.partitions", "8")
  .config("spark.sql.session.timeZone", "UTC")
  .getOrCreate()
spark.sparkContext.setLogLevel("WARN")

def tmp(p: String): String = java.nio.file.Files.createTempDirectory(p).toString
val inDir = tmp("graft-sched-in")
val outDir = tmp("graft-sched-out") + "/out"
val ckpt = tmp("graft-sched-ckpt")
val curOut = tmp("graft-sched-cur")
val state = java.nio.file.Paths.get(tmp("graft-sched-state"), "scheduler.json")

val docs = DocGen.dataset(spark, 300)
var drains = 0
var curLineages = Vector.empty[Seq[CurationJob.StageResult]]
def jobs: Seq[Scheduler.Job] = Seq(
  Scheduler.Job("drain", Scheduler.Interval(60000L), () => {
    StreamingExtract.runAvailableNow(spark, inDir, outDir, ckpt); drains += 1
  }),
  Scheduler.Job("curation", Scheduler.Interval(120000L), () => {
    curLineages :+= CurationJob.run(spark, docs, curOut, s"tick-${curLineages.size}",
      inputId = "synth:300")
  }))

val t0 = 1000000L

// ---- tick 1: registering must not fire; first due tick runs both jobs
val r1 = new Scheduler.Runner(jobs, startMs = t0, stateFile = Some(state))
assert(r1.runPending(t0).isEmpty, "registering a job must not fire it")
TranscriptGen.dataset(spark, 12).write.mode("append").parquet(inDir)
val ran1 = r1.runPending(t0 + 120000L)
assert(ran1 == Seq("drain", "curation"), s"tick 1 ran $ran1")
assert(drains == 1)
val n1 = spark.read.parquet(outDir).count()
val expect1 = TranscriptGen.totalTurns(12)
assert(n1 == expect1, s"drain 1: $n1 != $expect1")
assert(curLineages.head.forall(!_.resumed), "tick-1 curation must be a cold run")

// ---- kill + restart: a fresh Runner resumes clocks from the state file
val r2 = new Scheduler.Runner(jobs, startMs = t0, stateFile = Some(state))
assert(r2.runPending(t0 + 120000L).isEmpty,
  "restarted runner must not replay the tick that already ran")

// ---- tick 2 after MANY periods down: catch-up-once (no backfill storm);
// the drain picks up ONLY the new files, the curation tick RESUMES every
// stage from its manifests
TranscriptGen.dataset(spark, 5).write.mode("append").parquet(inDir)
val late = t0 + 10L * 120000L
val ran2 = r2.runPending(late)
assert(ran2 == Seq("drain", "curation"), s"tick 2 ran $ran2")
assert(r2.runPending(late + 1L).isEmpty, "catch-up must run each job ONCE")
assert(drains == 2)
val n2 = spark.read.parquet(outDir).count()
val expect2 = expect1 + TranscriptGen.totalTurns(5)
assert(n2 == expect2, s"drain 2 must add only the new files: $n2 != $expect2")
assert(curLineages.size == 2 && curLineages(1).forall(_.resumed),
  s"tick-2 curation must resume every stage: ${curLineages(1)}")

println(s"DRIVESCHEDULER OK: ticks=2 drains=$drains rows=$n2 " +
  s"curation_cold=${curLineages(0).count(!_.resumed)} " +
  s"curation_resumed=${curLineages(1).count(_.resumed)}")
spark.stop()
