package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, language-ID (stopword n-gram heuristic), quality
  * scoring, and document fingerprinting.
  *
  * All are pure `Column` expressions (whole-stage codegen; no UDFs), each
  * with an exactly-equivalent ANSI-SQL form used by the DuckDB oracle —
  * outputs avoid order-sensitive float accumulation so results hash-match
  * across engines.
  */
object TextAnalysis {

  /** whitespace tokens of lowercased text (empty text → single "" token
    * dropped by the trim)
    */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** distinct-token ratio denominator-safe; returned as exact ints for
    * oracle parity (ratios recomputed by consumers)
    */
  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  // Small marker-word inventories per language. Counting OCCURRENCES (not
  // set-intersect) keeps Spark `filter` and DuckDB `list_filter` in exact
  // agreement.
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "it", "that"),
    "pt" -> Seq("de", "que", "não", "uma", "para", "com", "por", "mais"),
    "es" -> Seq("el", "la", "los", "las", "una", "pero", "como", "más"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ein", "ist", "mit"))

  def markerHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words: _*)))

  /** n-gram/stopword language-ID heuristic: argmax of marker hits with a
    * minimum-evidence threshold of 2, ties broken by inventory order;
    * otherwise "und". Mirrors the reference's language handling being a
    * lookup/heuristic, not a model (tesseract_engine.py:351-375).
    */
  def langId(text: Column): Column = {
    val hits = markers.map { case (lang, ws) => lang -> markerHits(text, ws) }
    val best = hits.foldLeft((lit("und"), lit(1))) {
      case ((bestLang, bestHits), (lang, h)) =>
        // strictly-greater keeps earlier languages on ties (priority order)
        (when(h > bestHits, lit(lang)).otherwise(bestLang),
          when(h > bestHits, h).otherwise(bestHits))
    }
    best._1
  }

  /** The same heuristic as ANSI SQL for the oracle. */
  def langIdSql(textExpr: String): String = {
    def hitsSql(ws: Seq[String]): String = {
      val inList = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(regexp_split_to_array(trim(lower($textExpr)), '\\s+'), t -> t IN ($inList)))"
    }
    // same fold: start (und, 1), strictly-greater updates
    val steps = markers.map { case (lang, ws) => (lang, hitsSql(ws)) }
    val (finalLang, _) = steps.foldLeft(("'und'", "1")) {
      case ((bl, bh), (lang, h)) =>
        (s"CASE WHEN $h > $bh THEN '$lang' ELSE $bl END",
          s"CASE WHEN $h > $bh THEN $h ELSE $bh END")
    }
    finalLang
  }

  /** Heuristic quality bucket over exact integer features — the text-domain
    * analog of the reference's image-quality ladder
    * (quality_detector.py:331-380: score thresholds 0.8/0.6/0.4/0.2 →
    * excellent/good/fair/poor/very_poor).
    */
  def qualityBucket(text: Column): Column = {
    val nChars = length(text)
    val nTokens = tokenCount(text)
    val nDistinct = distinctTokenCount(text)
    // integer-arithmetic score: 0..10, exact in any engine
    val score =
      when(nChars >= 400, lit(4)).when(nChars >= 150, lit(3))
        .when(nChars >= 50, lit(2)).when(nChars >= 10, lit(1)).otherwise(lit(0)) +
      when(nTokens >= 60, lit(3)).when(nTokens >= 20, lit(2))
        .when(nTokens >= 5, lit(1)).otherwise(lit(0)) +
      when(nDistinct * 2 >= nTokens, lit(3))
        .when(nDistinct * 3 >= nTokens, lit(2)).otherwise(lit(1))
    when(score >= 8, "excellent").when(score >= 6, "good")
      .when(score >= 4, "fair").when(score >= 2, "poor").otherwise("very_poor")
  }

  def qualityBucketSql(t: String): String = {
    val nChars = s"length($t)"
    val nTokens = s"len(regexp_split_to_array(trim(lower($t)), '\\s+'))"
    val nDistinct = s"len(list_distinct(regexp_split_to_array(trim(lower($t)), '\\s+')))"
    val score =
      s"(CASE WHEN $nChars >= 400 THEN 4 WHEN $nChars >= 150 THEN 3 WHEN $nChars >= 50 THEN 2 WHEN $nChars >= 10 THEN 1 ELSE 0 END" +
        s" + CASE WHEN $nTokens >= 60 THEN 3 WHEN $nTokens >= 20 THEN 2 WHEN $nTokens >= 5 THEN 1 ELSE 0 END" +
        s" + CASE WHEN $nDistinct * 2 >= $nTokens THEN 3 WHEN $nDistinct * 3 >= $nTokens THEN 2 ELSE 1 END)"
    s"CASE WHEN $score >= 8 THEN 'excellent' WHEN $score >= 6 THEN 'good' " +
      s"WHEN $score >= 4 THEN 'fair' WHEN $score >= 2 THEN 'poor' ELSE 'very_poor' END"
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercased text —
    * the reference's index key (search_manager.py:147-149 md5; cache key
    * sha-256 cache_manager.py:119-170).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  def fingerprintSql(t: String): String =
    s"md5(regexp_replace(trim(lower($t)), '\\s+', ' ', 'g'))"
}
