package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * the paper's corpus-level three-sentence-span dedup is [[spanDedup]].
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

  /** C4's corpus-level span dedup (Raffel et al. §2.2: "we discarded all
    * but one of any three-sentence span occurring more than once") — an
    * exact cross-corpus REWRITE, distinct from the document-level
    * near-dup family in [[Dedup]].
    *
    * Unit segmentation is caller-controlled: `text` is split on the
    * literal `sep` (default newline) and spans are `n` consecutive
    * units. For the paper's sentence rule, pre-segment sentences onto
    * lines (the same derivation q33/q29 use). Rule, fully deterministic:
    *
    *   - span key = md5 of the n units joined by `sep` (128-bit,
    *     collision-negligible at any corpus size, engine-agnostic);
    *   - the KEEPER of a key occurring more than once is its globally
    *     minimal (id, position) occurrence;
    *   - every unit covered by any NON-keeper occurrence of a duplicated
    *     key is deleted; the document is the `sep`-join of surviving
    *     units. (Position-set semantics: a keeper whose units are also
    *     covered by a different duplicated span loses those units —
    *     the same overlap behavior as the reference implementation's
    *     sequential hash-and-delete, but order-free.)
    *
    * Scale shape: one shuffle on the span key (the inherent corpus-wide
    * exchange — map-side combinable count + min), one join of the
    * deletion set back to documents (tiny for clean corpora ⇒ AQE
    * broadcasts it), one aggregation per doc. Pure built-in expressions
    * end-to-end (posexplode/sequence/slice/filter-with-index): no UDFs,
    * whole-stage codegen, and an exact DuckDB mirror for the oracle.
    *
    * Returns (id, n_units, n_units_kept, text_dedup).
    */
  def spanDedup(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, sep: String = "\n"): DataFrame = {
    require(n >= 1, "span width must be >= 1")
    Dedup.requireIntegralId(df, idCol) // same silent-null-cast trap as dedup
    val sepRegex = java.util.regex.Pattern.quote(sep)
    val u = df.select(
      col(idCol).cast("long").as("id"),
      split(col(textCol), sepRegex).as("us"))

    // (id, i, k): every span start position and its 128-bit content key.
    // sequence() is empty-safe only for from <= to, so gate on size >= n
    val spans = u
      .where(size(col("us")) >= n)
      .select(col("id"),
        posexplode(transform(
          sequence(lit(0), size(col("us")) - n),
          i => md5(concat_ws(sep, slice(col("us"), i + 1, lit(n)))))))
      .toDF("id", "i", "k")

    // keeper = global min (id, i) per key; only duplicated keys matter.
    // groupBy(k) is the one corpus-wide shuffle; min/count combine map-side
    val dupKeys = spans.groupBy(col("k")).agg(
      min(struct(col("id"), col("i"))).as("kp"),
      count(lit(1)).as("cnt"))
      .where(col("cnt") > 1)

    // non-keeper occurrences -> the unit positions they cover
    val del = spans.join(dupKeys, Seq("k"))
      .where(!(col("id") === col("kp.id") && col("i") === col("kp.i")))
      .select(col("id"), explode(sequence(col("i"), col("i") + (n - 1))).as("j"))
      .groupBy(col("id")).agg(collect_set(col("j")).as("del"))

    u.join(del, Seq("id"), "left")
      .select(
        col("id"),
        size(col("us")).as("n_units"),
        filter(col("us"), (_, i) =>
          !array_contains(coalesce(col("del"), typedLit(Seq.empty[Int])), i)).as("kept"))
      .select(
        col("id"), col("n_units"),
        size(col("kept")).as("n_units_kept"),
        array_join(col("kept"), sep).as("text_dedup"))
  }

  /** DuckDB mirror of [[spanDedup]] (n=3, newline units) over a relation
    * `rel(doc_id, text)` — a CTE chain whose last member is
    * `span_dedup(doc_id, n_units, n_units_kept, text_dedup)`; the caller
    * supplies the surrounding WITH and final SELECT (q36 oracle). 1-based
    * list indexing mirrors the Spark side's 0-based positions shifted by
    * one.
    */
  def spanDedupSql(rel: String): String =
    s"""u AS (
       |  SELECT doc_id, string_split(text, chr(10)) AS us FROM $rel),
       |spans AS (
       |  SELECT doc_id, g.i AS i,
       |         md5(array_to_string(us[g.i:g.i+2], chr(10))) AS k
       |  FROM u, LATERAL (SELECT unnest(generate_series(1, len(us) - 2)) AS i) g
       |  WHERE len(us) >= 3),
       |ranked AS (
       |  SELECT doc_id, i, k,
       |         row_number() OVER (PARTITION BY k ORDER BY doc_id, i) AS rn,
       |         count(*) OVER (PARTITION BY k) AS cnt
       |  FROM spans),
       |del AS (
       |  SELECT doc_id, list_distinct(flatten(list(generate_series(i, i + 2)))) AS del
       |  FROM ranked WHERE cnt > 1 AND rn > 1
       |  GROUP BY doc_id),
       |kept AS (
       |  SELECT u.doc_id, len(us) AS n_units,
       |         [us[i] FOR i IN generate_series(1, len(us))
       |          IF del.del IS NULL OR NOT list_contains(del.del, i)] AS ks
       |  FROM u LEFT JOIN del ON u.doc_id = del.doc_id),
       |span_dedup AS (
       |  SELECT doc_id, CAST(n_units AS BIGINT) AS n_units,
       |         CAST(len(ks) AS BIGINT) AS n_units_kept,
       |         coalesce(array_to_string(ks, chr(10)), '') AS text_dedup
       |  FROM kept)""".stripMargin
}
