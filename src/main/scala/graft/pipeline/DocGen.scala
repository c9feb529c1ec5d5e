package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.TranscriptGen.sm64

/** Deterministic synthetic DOCUMENT corpus for curation tests and
  * sustained-scale runs (the documents-table analog of [[TranscriptGen]]
  * — same splitmix64 discipline, so any (id) regenerates bit-identically
  * on any partitioning at any scale; no external data).
  *
  * The corpus is adversarial on purpose — every curation stage gets real
  * work:
  *   - ~3% of lines carry no terminal punctuation, ~1.5% say "lorem
  *     ipsum", ~1.5% contain a curly brace (C4 line/document prey);
  *   - ~8% of documents repeat one line many times (Gopher
  *     duplicate-line-fraction prey) and ~4% repeat a single bigram long
  *     enough to trip the top-n-gram gate;
  *   - every id ≡ 0 (mod 37) is an EXACT duplicate of id-1, and every id
  *     ≡ 0 (mod 41) a NEAR duplicate of id-2 (same text + tail sentence)
  *     — exact/near dedup prey with a known planted rate.
  */
object DocGen {

  private val Vocab: Array[String] = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu " +
      "nu xi omicron pi rho sigma tau upsilon phi chi psi omega spark " +
      "shuffle partition codegen catalyst tungsten parquet manifest " +
      "lineage bucket salt broadcast watermark session window cluster " +
      "executor driver stage task scan filter project aggregate join " +
      "exchange sort limit union sample split train corpus document").split(" ")

  private def word(h: Long): String = Vocab(((h >>> 33) % Vocab.length).toInt)

  /** Body text for the UNIQUE document family of `seed` (planted
    * duplicates are derived in [[docText]], not here).
    */
  private def baseText(seed: Long): String = {
    val h0 = sm64(seed * 0x9E3779B97F4A7C15L + 1L)
    val nLines = 6 + (Math.floorMod(h0, 14L)).toInt // 6..19 lines
    val kind = Math.floorMod(sm64(h0 + 7L), 100L)
    val sb = new StringBuilder
    var l = 0
    while (l < nLines) {
      val hl = sm64(h0 + 1000L * (l + 1))
      // ~8%: duplicate-line documents repeat line 0 (Gopher dlf prey)
      val lineSeed = if (kind < 8 && l > 0 && l % 2 == 0) sm64(h0 + 1000L) else hl
      val nWords = 4 + Math.floorMod(lineSeed, 9L).toInt // 4..12 words
      val words = (0 until nWords).map(w => word(sm64(lineSeed + 31L * w)))
      // ~4%: a single repeated bigram dominates (top-n-gram prey)
      val body =
        if (kind >= 8 && kind < 12)
          Seq.fill(6)(word(sm64(h0 + 13L)) + " " + word(sm64(h0 + 17L))).mkString(" ")
        else words.mkString(" ")
      val r = Math.floorMod(sm64(lineSeed + 99L), 100L)
      val line =
        if (r < 3) body // no terminal punctuation (C4 line prey)
        else if (r < 5) body + ", lorem ipsum dolor." // C4 document prey
        else if (r < 7) body + " { code }" // C4 curly-brace prey
        else if (r < 12) body + "!"
        else if (r < 17) body + "?"
        else body + "."
      sb.append(line)
      if (l < nLines - 1) sb.append('\n')
      l += 1
    }
    sb.toString
  }

  /** The text of document `id` — planted exact dups every 37 ids, near
    * dups every 41 ids (ids divisible by both prefer the exact rule).
    * RECURSIVE on the referenced neighbor, so the planted copy matches
    * the neighbor's ACTUAL text even when that neighbor is itself
    * planted (id 370 = text of 369 = near-dup of 367 — still an exact
    * duplicate of a real document; 37 and 41 are coprime, so reference
    * chains stay short and the recursion is trivially bounded).
    */
  def docText(id: Long): String =
    if (id > 0 && id % 37L == 0L) docText(id - 1L)
    else if (id > 1 && id % 41L == 0L)
      docText(id - 2L) + "\nnear duplicate tail sentence marker."
    else baseText(id)

  /** Distributed generation: (doc_id, text), `n` documents. */
  def dataset(spark: SparkSession, n: Long, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism * 4
    spark.range(0L, n, 1L, parts)
      .map(id => (id, docText(id)))
      .toDF("doc_id", "text")
  }

  // ---- planted benchmark contamination (decontamination-stage prey) ----
  // A reserved token space ("bm" + 8 hex chars) that can never collide
  // with [[Vocab]], so the ONLY 8-grams a corpus document can share with
  // a benchmark document are planted ones — the expected removal count
  // of the decontamination stage is exact, not probabilistic.

  private def bmToken(bench: Long, j: Int): String =
    "bm" + java.lang.Long.toHexString(sm64(bench * 131071L + 31L * j + 5L))
      .reverse.padTo(8, '0').reverse.takeRight(8)

  /** Benchmark document `bench`: two 12-token sentences over the reserved
    * token space (periods attach only to sentence-final tokens, so tokens
    * 0..10 and 12..22 are clean in whitespace-token space).
    */
  def benchmarkText(bench: Long): String =
    (0 until 2).map { s =>
      val toks = (0 until 12).map(j => bmToken(bench, s * 12 + j))
      toks.init.mkString(" ") + " " + toks.last + "."
    }.mkString("\n")

  /** Deterministic benchmark corpus: (doc_id, text), `n` documents. */
  def benchmarkDocs(spark: SparkSession, n: Long, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else math.max(2, spark.sparkContext.defaultParallelism)
    spark.range(0L, n, 1L, parts)
      .map(b => (b, benchmarkText(b)))
      .toDF("doc_id", "text")
  }

  /** The contamination line planted into a corpus document: the first 10
    * tokens of benchmark doc `bench`'s first sentence, period attached to
    * the last. Tokens 0..8 stay clean, so the line shares EXACTLY two
    * distinct word 8-grams — windows (0..7) and (1..8) — with the
    * benchmark text: precisely [[graft.operators.Curation.contamination]]'s
    * default `minCommon = 2`. The line ends in terminal punctuation with
    * ≥ 3 words, so C4 line cleaning always keeps it (the plant survives
    * to the decontamination stage unless dedup drops the whole document).
    */
  def plantLine(bench: Long): String =
    (0 until 9).map(bmToken(bench, _)).mkString(" ") + " " + bmToken(bench, 9) + "."

  /** Plant benchmark contamination into ~1/`everyK` of `docs`: document
    * ids ≡ 13 (mod `everyK`) get [[plantLine]] of benchmark doc
    * `sm64(id) mod nBench` appended as an extra line. Planting marks the
    * TEXT (the reserved "bm" prefix), so a downstream count of
    * contaminated survivors keys on content, not id arithmetic — exact
    * even when dedup copies planted text onto other ids.
    */
  def plantContamination(
      docs: DataFrame, nBench: Long, everyK: Int = 97): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    require(nBench > 0 && everyK > 1)
    docs.select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        if (Math.floorMod(id, everyK.toLong) == 13L) {
          val b = Math.floorMod(sm64(id * 0x9E3779B97F4A7C15L + 11L), nBench)
          (id, text + "\n" + plantLine(b))
        } else (id, text)
      }
      .toDF("doc_id", "text")
  }
}
