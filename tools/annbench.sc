// ANN index build/query split microbench (mirrors Bench phase 3 exactly).
// Usage: ... MainGenericRunner -nc tools/annbench.sc [reps]
// Prints "ANNBENCH <leg> <seconds>" lines; build legs are cold per rep.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.operators.Similarity

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
val reps = args.headOption.map(_.toInt).getOrElse(2)

val spark = SparkSession.builder()
  .master(s"local[$cpus]")
  .appName("graft-annbench")
  .config("spark.sql.shuffle.partitions", math.max(cpus, 8))
  .config("spark.sql.session.timeZone", "UTC")
  .config("spark.sql.adaptive.enabled", "true")
  .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000")
  .config("spark.ui.enabled", "false")
  .getOrCreate()
spark.sparkContext.setLogLevel("WARN")

def time[A](f: => A): Double = {
  val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
}
def runToNoop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()

// same JIT warm as Bench
spark.range(1000000L).selectExpr("sum(id)").collect()

val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
val qv = emb.where(col("vec_id") === 0)
  .select("embedding").first().getSeq[Float](0).toArray

(1 to reps).foreach { r =>
  val tmpDir = java.nio.file.Files.createTempDirectory("graft-annbench")
  val tmp = tmpDir.toString
  try {
    spark.sparkContext.setJobDescription(s"x20_build r$r")
    val lshBuild = time {
      Similarity.writeLshIndex(
        Similarity.buildLshIndex(emb, "vec_id", "embedding"), s"$tmp/lsh")
    }
    val lshIdx = spark.read.parquet(s"$tmp/lsh")
    spark.sparkContext.setJobDescription(s"x20_query r$r")
    val lshQ = Seq.fill(2)(time(runToNoop(
      Similarity.lshTopKIndexed(lshIdx, qv, 10)))).min
    spark.sparkContext.setJobDescription(s"x21_train r$r")
    val (cents, ivfTrain) = {
      val t0 = System.nanoTime()
      val c = Similarity.trainIvfCentroids(emb, "vec_id", "embedding", nList = 16, iters = 2)
      (c, (System.nanoTime() - t0) / 1e9)
    }
    spark.sparkContext.setJobDescription(s"x21_write r$r")
    val ivfWrite = time {
      Similarity.writeIvfIndex(
        Similarity.ivfIndex(emb, "vec_id", "embedding", cents, nAssign = 4), s"$tmp/ivf")
    }
    val ivfIdx = spark.read.parquet(s"$tmp/ivf")
    spark.sparkContext.setJobDescription(s"x21_query r$r")
    val ivfQ = Seq.fill(2)(time(runToNoop(
      Similarity.ivfTopKIndexed(ivfIdx, cents, qv, 10, nProbe = 8)))).min
    println(f"ANNBENCH x20_build $lshBuild%.3f  (rep $r)")
    println(f"ANNBENCH x20_query $lshQ%.3f  (rep $r)")
    println(f"ANNBENCH x21_train $ivfTrain%.3f  (rep $r)")
    println(f"ANNBENCH x21_write $ivfWrite%.3f  (rep $r)")
    println(f"ANNBENCH x21_build ${ivfTrain + ivfWrite}%.3f  (rep $r)")
    println(f"ANNBENCH x21_query $ivfQ%.3f  (rep $r)")
  } finally {
    val stream = java.nio.file.Files.walk(tmpDir)
    try stream.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally stream.close()
  }
}
spark.stop()
