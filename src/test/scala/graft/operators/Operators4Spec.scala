package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 tests: incremental maintenance of the materialized ANN indexes
  * (append new ids only — no rebuild — with indexed results equal to a
  * fresh full build, and idempotent replays).
  */
class Operators4Spec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-operators4-spec")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-warehouse4").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def vecs(from: Long, until: Long, dim: Int = 16): Seq[(Long, Seq[Float])] =
    (from until until).map { i =>
      i -> (0 until dim).map { d =>
        val h = graft.pipeline.TranscriptGen.sm64(i * 7919L + d)
        (h.toDouble / Long.MaxValue.toDouble).toFloat
      }
    }

  test("appendToLshIndex: append-only incremental build equals fresh build; replay is a no-op") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("graft-lsh-idx").toString + "/idx"
    val base = vecs(0L, 150L)
    val extra = vecs(150L, 200L)
    val baseDf = base.toDF("vec_id", "embedding")
    val extraDf = extra.toDF("vec_id", "embedding")
    val fullDf = (base ++ extra).toDF("vec_id", "embedding")
    val query = extra(25)._2.toArray

    Similarity.writeLshIndex(
      Similarity.buildLshIndex(baseDf, "vec_id", "embedding"), dir)
    val filesBefore = countParquetFiles(dir)

    // append ONLY the new ids: tables × |extra| membership rows
    val n1 = Similarity.appendToLshIndex(extraDf, "vec_id", "embedding", dir)
    assert(n1 == 8L * extra.size, s"appended $n1 membership rows")
    // replaying the same batch appends nothing (idempotent upsert)
    val n2 = Similarity.appendToLshIndex(extraDf, "vec_id", "embedding", dir)
    assert(n2 == 0L, s"replayed append must be a no-op, appended $n2")

    // append added files; it did not rewrite the base index
    assert(countParquetFiles(dir) > filesBefore)

    // indexed search over base+appended == the scan form over the full set
    val viaIndex = Similarity.lshTopKIndexed(spark.read.parquet(dir), query, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaScan = Similarity.lshTopK(fullDf, "vec_id", "embedding", query, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaIndex == viaScan)
  }

  test("appendToIvfIndex: append with ORIGINAL centroids equals fresh assignment; replay no-op") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("graft-ivf-idx").toString + "/idx"
    val base = vecs(0L, 150L)
    val extra = vecs(150L, 200L)
    val baseDf = base.toDF("vec_id", "embedding")
    val extraDf = extra.toDF("vec_id", "embedding")
    val fullDf = (base ++ extra).toDF("vec_id", "embedding")
    val query = extra(7)._2.toArray

    // centroids are trained ONCE on the base corpus and reused by appends
    val cents = Similarity.trainIvfCentroids(baseDf, "vec_id", "embedding", nList = 8)
    Similarity.writeIvfIndex(
      Similarity.ivfIndex(baseDf, "vec_id", "embedding", cents, nAssign = 4), dir)

    val n1 = Similarity.appendToIvfIndex(
      extraDf, "vec_id", "embedding", dir, cents, nAssign = 4)
    assert(n1 == 4L * extra.size, s"appended $n1 assignment rows")
    assert(Similarity.appendToIvfIndex(
      extraDf, "vec_id", "embedding", dir, cents, nAssign = 4) == 0L)

    val viaIndex = Similarity.ivfTopKIndexed(
      spark.read.parquet(dir), cents, query, 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaFresh = Similarity.ivfTopKIndexed(
      Similarity.ivfIndex(fullDf, "vec_id", "embedding", cents, nAssign = 4),
      cents, query, 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaIndex == viaFresh)
  }

  test("de-UDF'd LSH plans: index build is one narrow codegen projection; scan top-k stays codegen") {
    val sp = spark; import sp.implicits._
    val df = vecs(0L, 200L).toDF("vec_id", "embedding")
    val query = vecs(5L, 6L).head._2.toArray

    // build: project + explode, no shuffle, no RDD mapPartitions, no
    // interpreted fallback — the whole membership table in one pass
    val idx = Similarity.buildLshIndex(df, "vec_id", "embedding")
    assert(idx.count() == 200L * 8)
    val buildPlan = idx.queryExecution.executedPlan.toString
    assert(!buildPlan.contains("Exchange"), s"index build must not shuffle:\n$buildPlan")
    assert(!buildPlan.contains("CodegenFallback"), s"native expr fell back:\n$buildPlan")
    assert(!buildPlan.contains("MapPartitions"), s"explode path, not an RDD map:\n$buildPlan")

    // scan-form top-k: codegen candidate filter + TakeOrdered (per-
    // partition top-k, no full sort shuffle)
    val topk = Similarity.lshTopK(df, "vec_id", "embedding", query, 10)
    topk.collect()
    val scanPlan = topk.queryExecution.executedPlan.toString
    assert(scanPlan.contains("TakeOrderedAndProject"), scanPlan)
    assert(!scanPlan.contains("CodegenFallback"), scanPlan)
    assert(!scanPlan.contains("BatchEvalPython") && !scanPlan.contains("SQLAppRow"),
      scanPlan)
  }

  private def countParquetFiles(dir: String): Long = {
    val stream = Files.walk(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala.count(p => p.toString.endsWith(".parquet")).toLong
    } finally stream.close()
  }
}
