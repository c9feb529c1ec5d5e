// 64-bucket / group-size-8 invalidation + resume drive of the spark-submit
// surface (graft.RunExtraction) — validates Observation-per-group row
// counts against readResult at more than toy bucket counts.
// Run via the verify skill's MainGenericRunner recipe; expects the packaged
// jar + /opt/spark/jars on the classpath. Exits nonzero on any mismatch.
import org.apache.spark.sql.SparkSession
import graft.pipeline.{Checkpoint, TranscriptGen}

val out = java.nio.file.Files.createTempDirectory("graft-ckpt64").toString
def run(extra: String*): String = {
  val base = Array("--input", "synth:400", "--output", out,
    "--buckets", "64", "--group-size", "8")
  // RunExtraction prints one JSON line; capture it via Console redirect
  val bout = new java.io.ByteArrayOutputStream()
  Console.withOut(new java.io.PrintStream(bout)) {
    graft.RunExtraction.main(base ++ extra)
  }
  bout.toString("UTF-8").linesIterator.find(_.startsWith("{")).get
}
def field(json: String, k: String): Long =
  s""""$k":(-?\\d+)""".r.findFirstMatchIn(json).get.group(1).toLong

val expect = TranscriptGen.totalTurns(400)

// 1) cold run: all 64 buckets committed, manifest rows == total turns
val j1 = run("--run-id", "a")
assert(field(j1, "committed_buckets") == 64, j1)
assert(field(j1, "rows") == expect, s"rows ${field(j1, "rows")} != $expect")

// 2) resume: nothing recomputed
val j2 = run("--run-id", "b")
assert(field(j2, "resumed_buckets") == 64 && field(j2, "committed_buckets") == 0, j2)

// 3) invalidation: new config hash recomputes all 64
val j3 = run("--run-id", "c", "--config-hash", "drive-v2")
assert(field(j3, "committed_buckets") == 64 && field(j3, "rows") == expect, j3)

// 4) crash-sim resume: drop 5 manifests, only those recompute
Seq(3, 17, 31, 44, 63).foreach { k =>
  java.nio.file.Files.delete(java.nio.file.Paths.get(out, "manifests", s"part-$k.json")) }
val j4 = run("--run-id", "d", "--config-hash", "drive-v2")
assert(field(j4, "resumed_buckets") == 59 && field(j4, "committed_buckets") == 5, j4)

// 5) ground truth: readResult row count AND per-bucket manifest sums agree
val spark = SparkSession.builder().getOrCreate()
val readBack = Checkpoint.readResult(spark, out, 64).count()
val manifestSum = (0 until 64).flatMap(Checkpoint.readManifest(out, _)).map(_.rows).sum
assert(readBack == expect, s"readResult $readBack != $expect")
assert(manifestSum == expect, s"manifest sum $manifestSum != $expect")
println(s"DRIVE64 OK: buckets=64 groupSize=8 rows=$expect readBack=$readBack manifestSum=$manifestSum")
spark.stop()
