package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C4-style corpus cleaning (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning…", §2.2) — the published line/document filter ladder
  * used to produce C4 from Common Crawl, as pure pushable Column
  * expressions (no UDFs, exact DuckDB mirrors for the oracle):
  *
  *   line level: keep only lines that end in a terminal punctuation mark
  *   and contain at least `minWords` words;
  *   document level: drop pages with "lorem ipsum", pages containing a
  *   curly brace (code), and pages with fewer than `minSentences`
  *   sentences.
  *
  * The badword-list rule is omitted (no list ships with this engine);
  * three-sentence-window dedup is covered by the [[Dedup]] operators.
  * Every predicate is a scalar expression over the text column, so
  * document gates push into the parquet scan.
  */
object C4 {

  private val TerminalChars = Seq(".", "!", "?", "\"")

  /** The lines of `text` that survive C4's line filters: terminal
    * punctuation at the end and ≥ `minWords` words.
    */
  def cleanLines(text: Column, minWords: Int = 3): Column =
    filter(split(text, "\n"), l => {
      val t = trim(l)
      substring(t, -1, 1).isin(TerminalChars: _*) &&
        size(split(t, "\\s+")) >= minWords
    })

  def cleanLinesSql(t: String, minWords: Int = 3): String =
    s"list_filter(regexp_split_to_array($t, chr(10)), l -> " +
      s"right(trim(l), 1) IN ('.', '!', '?', '\"') AND " +
      s"len(regexp_split_to_array(trim(l), '\\s+')) >= $minWords)"

  /** Cleaned document text: surviving lines re-joined. */
  def cleanedText(text: Column, minWords: Int = 3): Column =
    array_join(cleanLines(text, minWords), "\n")

  /** Heuristic sentence count: non-blank segments split on .!? */
  def sentenceCount(text: Column): Column =
    size(filter(split(text, "[.!?]"), s => trim(s) =!= ""))

  def sentenceCountSql(t: String): String =
    s"len(list_filter(regexp_split_to_array($t, '[.!?]'), s -> trim(s) <> ''))"

  /** C4 document gate: no "lorem ipsum", no curly brace, ≥ minSentences
    * sentences. A predicate — pushes into the scan.
    */
  def keepDocument(text: Column, minSentences: Int = 5): Column =
    !lower(text).contains("lorem ipsum") &&
      !text.contains("{") &&
      sentenceCount(text) >= minSentences

  def keepDocumentSql(t: String, minSentences: Int = 5): String =
    s"(NOT contains(lower($t), 'lorem ipsum') AND NOT contains($t, '{') " +
      s"AND ${sentenceCountSql(t)} >= $minSentences)"
}
