// Positive-path decontamination at sustained scale (round-4 ran 0
// contaminated because the synth corpus genuinely shared no 8-grams with
// the benchmark): plant benchmark 8-grams into ~1% of a 500k-doc corpus
// (DocGen.plantContamination — reserved token space, so contaminated ==
// planted exactly), run the chain cold WITHOUT --test, then re-run with
// --test and verify (a) clean..neardup resume untouched, only
// decontam+split compute (incremental stage addition), and (b) the
// decontam stage removes EXACTLY the planted survivors counted in the
// neardup stage parquet — a predicted, nonzero removal.
// Run via the verify skill's MainGenericRunner recipe (-Xmx8g,
// -Dspark.master=local[32] for the scale run).
import org.apache.spark.sql.SparkSession
import graft.pipeline.{CurationJob, DocGen}

val nDocs = sys.env.getOrElse("GRAFT_PLANT_DOCS", "500000").toLong
val nBench = 5000L
val root = java.nio.file.Files.createTempDirectory("graft-plant").toString
val inDir = s"$root/input"
val benchDir = s"$root/bench"
val out = s"$root/store"

// phase A: planted corpus + benchmark parquet, in a session that is then
// STOPPED so RunCuration's tuned session (maxPartitionBytes=16m) applies
locally {
  val spark = SparkSession.builder().appName("graft-plant-gen").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  DocGen.plantContamination(DocGen.dataset(spark, nDocs), nBench)
    .write.parquet(inDir)
  DocGen.benchmarkDocs(spark, nBench).write.parquet(benchDir)
  spark.stop()
}

def run(extra: String*): (Seq[(String, Long, Boolean)], Double) = {
  val base = Array("--input", inDir, "--output", out)
  val bout = new java.io.ByteArrayOutputStream()
  val t0 = System.nanoTime()
  Console.withOut(new java.io.PrintStream(bout)) {
    graft.RunCuration.main(base ++ extra)
  }
  val sec = (System.nanoTime() - t0) / 1e9
  val json = bout.toString("UTF-8").linesIterator.find(_.startsWith("{")).get
  val stages = """\{"stage":"(\w+)","rows":(\d+),"resumed":(true|false)""".r
    .findAllMatchIn(json)
    .map(m => (m.group(1), m.group(2).toLong, m.group(3).toBoolean)).toSeq
  (stages, sec)
}

// phase B1: cold chain, no benchmark
val (s1, coldSec) = run("--run-id", "a")
assert(s1.map(_._1) == Seq("clean", "gates", "exact", "neardup", "split"), s1)
assert(s1.forall(!_._3), s"cold run must compute every stage: $s1")

// phase B2: incremental --test — upstream stages resume, decontam computes
val (s2, incSec) = run("--run-id", "b", "--test", benchDir)
assert(s2.map(_._1) ==
  Seq("clean", "gates", "exact", "neardup", "decontam", "split"), s2)
val resumed = s2.map(t => t._1 -> t._3).toMap
assert(resumed("clean") && resumed("gates") && resumed("exact") &&
  resumed("neardup") && !resumed("decontam") && !resumed("split"),
  s"incremental --test must resume clean..neardup only: $s2")

// phase C: predicted removal — planted survivors in the neardup parquet
val spark = SparkSession.builder().appName("graft-plant-check").getOrCreate()
spark.sparkContext.setLogLevel("WARN")
val rows = s2.map(t => t._1 -> t._2).toMap
val plantedInput = (0L until nDocs).count(_ % 97L == 13L)
val survivors = spark.read.parquet(CurationJob.stageDataDir(out, "neardup"))
  .where(org.apache.spark.sql.functions.col("text").rlike("bm[0-9a-f]{8}"))
  .count()
val removed = rows("neardup") - rows("decontam")
assert(survivors > 0, "planted docs must survive cleaning+dedup")
assert(removed == survivors,
  s"decontam removed $removed, planted survivors $survivors")
assert(spark.read.parquet(CurationJob.stageDataDir(out, "decontam"))
  .where(org.apache.spark.sql.functions.col("text").rlike("bm[0-9a-f]{8}"))
  .count() == 0L, "no planted text may survive decontamination")
println(s"DRIVEDECONTAM OK: docs=$nDocs planted_input=$plantedInput " +
  s"survivors=$survivors removed=$removed " +
  s"lineage=${s2.map(t => t._1 + "=" + t._2).mkString(",")} " +
  f"coldSec=$coldSec%.1f incSec=$incSec%.1f")
spark.stop()
