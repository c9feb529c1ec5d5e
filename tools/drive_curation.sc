// Cold → resume → stage-invalidation drive of the curation spark-submit
// surface (graft.RunCuration) — validates per-stage manifest lineage
// against the stage parquet at the production entry point.
// Run via the verify skill's MainGenericRunner recipe; expects the packaged
// jar + /opt/spark/jars on the classpath. Exits nonzero on any mismatch.
import org.apache.spark.sql.SparkSession
import graft.pipeline.CurationJob

val out = java.nio.file.Files.createTempDirectory("graft-curation-drive").toString
def run(extra: String*): String = {
  val base = Array("--input", "synth:3000", "--output", out)
  val bout = new java.io.ByteArrayOutputStream()
  Console.withOut(new java.io.PrintStream(bout)) {
    graft.RunCuration.main(base ++ extra)
  }
  bout.toString("UTF-8").linesIterator.find(_.startsWith("{")).get
}
def stages(json: String): Seq[(String, Long, Boolean)] =
  """\{"stage":"(\w+)","rows":(\d+),"resumed":(true|false)""".r
    .findAllMatchIn(json)
    .map(m => (m.group(1), m.group(2).toLong, m.group(3).toBoolean)).toSeq

// 1) cold run: all four stages compute, counts decrease monotonically
val s1 = stages(run("--run-id", "a"))
assert(s1.map(_._1) == Seq("clean", "gates", "exact", "neardup", "split"), s1)
assert(s1.forall(!_._3), s"cold run must compute every stage: $s1")
val Seq(clean1, gates1, exact1, near1, split1) = s1.map(_._2)
assert(clean1 > 0 && clean1 < 3000 && gates1 < clean1 && exact1 < gates1
  && near1 < exact1 && split1 == near1, s1)

// 2) resume: every stage skipped, identical rows
val s2 = stages(run("--run-id", "b"))
assert(s2.forall(_._3) && s2.map(_._2) == s1.map(_._2), s"resume broke: $s2")

// 3) invalidation: a version-tag change recomputes every stage with the
// same results (content-deterministic chain)
val s3 = stages(run("--run-id", "c", "--version-tag", "drive-v2"))
assert(s3.forall(!_._3) && s3.map(_._2) == s1.map(_._2), s"invalidation: $s3")

// 4) the optional Gopher quality gate at the CLI surface: enabling it
// (stop-word rule off — the synthetic vocabulary has no English stop
// words) invalidates gates and downstream ONLY and drops documents.
// Must run BEFORE this script opens its own session: RunCuration.main
// stops the active SparkSession when it returns
val s4 = stages(run("--run-id", "d", "--version-tag", "drive-v2",
  "--gopher-quality", "true", "--gopher-min-stop-words", "0"))
val res4 = s4.map(t => t._1 -> t._3).toMap
assert(res4("clean") && !res4("gates") && !res4("exact") && !res4("split"),
  s"quality gate must invalidate gates+downstream only: $s4")
val gates4 = s4.find(_._1 == "gates").get._2
assert(gates4 > 0 && gates4 < s3.find(_._1 == "gates").get._2,
  s"quality gate must drop documents: $gates4 of ${s3.find(_._1 == "gates").get._2}")

// 5) ground truth: every stage's parquet row count equals its manifest
// (clean resumed from run c; gates and downstream recomputed by run d)
val spark = SparkSession.builder().getOrCreate()
spark.sparkContext.setLogLevel("WARN")
s4.foreach { case (stage, rows, resumed) =>
  val onDisk = spark.read.parquet(CurationJob.stageDataDir(out, stage)).count()
  assert(onDisk == rows, s"$stage parquet $onDisk != manifest $rows")
  val m = CurationJob.readStageManifest(out, stage).get
  assert(m.rows == rows && m.runId == (if (resumed) "c" else "d"),
    s"$stage manifest $m")
}
// every gated survivor satisfies the standalone predicate (the chain
// applied exactly the configured gate, nothing weaker)
val p = graft.operators.TextAnalysis.GopherQualityParams(minStopWords = 0)
val violators = spark.read.parquet(CurationJob.stageDataDir(out, "gates"))
  .where(!graft.operators.TextAnalysis.gopherQualityGate(
    org.apache.spark.sql.functions.col("text"), p)).count()
assert(violators == 0, s"$violators gated survivors violate the predicate")
// split partitions are readable per split (partition pruning layout)
val train = spark.read.parquet(CurationJob.stageDataDir(out, "split"))
  .where("split = 'train'").count()
assert(train > 0 && train <= s4.last._2, s"train=$train")

println(s"DRIVECURATION OK: stages=${s3.map(t => t._1 + "=" + t._2).mkString(",")} train=$train gqGates=$gates4")
spark.stop()
