// Query microbench + plan capture for the optimization round.
// Usage (verify-skill java invocation, packaged jar on the classpath):
//   ... MainGenericRunner -nc tools/qbench.sc [--plans DIR [SUFFIX]] [--reps N] q37_gopher_quality x07_ngram_jaccard ...
// With no query names: runs every SparkEntry query.
// Prints one line per query: "QBENCH <name> <best-of-N seconds>".
// --plans DIR additionally writes DIR/<query>_<SUFFIX>.txt with
// .explain("formatted") output (SUFFIX defaults to "plan").
import org.apache.spark.sql.SparkSession

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

val spark = SparkSession.builder()
  .master(s"local[$cpus]")
  .appName("graft-qbench")
  .config("spark.sql.shuffle.partitions", math.max(cpus, 8))
  .config("spark.sql.session.timeZone", "UTC")
  .config("spark.sql.adaptive.enabled", "true")
  .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000")
  .config("spark.ui.enabled", "false")
  .getOrCreate()
spark.sparkContext.setLogLevel("WARN")

var rest = args.toList
var plansDir: Option[String] = None
var planSuffix = "plan"
var reps = 2
while (rest.headOption.exists(_.startsWith("--"))) rest match {
  case "--plans" :: dir :: tail =>
    plansDir = Some(dir)
    tail match {
      case s :: t2 if !s.startsWith("--") && !graft.SparkEntry.queries.contains(s) =>
        planSuffix = s; rest = t2
      case _ => rest = tail
    }
  case "--reps" :: n :: tail => reps = n.toInt; rest = tail
  case other :: tail => sys.error(s"unknown flag $other")
  case Nil =>
}
val names =
  if (rest.nonEmpty) rest
  else graft.SparkEntry.queries.keys.toList.sorted

def time[A](f: => A): Double = {
  val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
}

// same JIT/codegen warm as Bench phase 2
spark.range(1000000L).selectExpr("sum(id)").collect()
import graft.pipeline.{ExtractionJob, TranscriptGen}
ExtractionJob.extract(TranscriptGen.dataset(spark, 200)).toDF()
  .write.format("noop").mode("overwrite").save()

names.foreach { name =>
  val fn = graft.SparkEntry.queries(name)
  spark.sparkContext.setJobDescription(name)
  val secs = (1 to reps).map { _ =>
    time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
  }
  println(f"QBENCH $name ${secs.min}%.3f  (runs: ${secs.map(s => f"$s%.3f").mkString(", ")})")
  plansDir.foreach { dir =>
    new java.io.File(dir).mkdirs()
    val out = new java.io.File(dir, s"${name}_$planSuffix.txt")
    val plan = fn(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.print(plan) finally w.close()
  }
}
spark.stop()
