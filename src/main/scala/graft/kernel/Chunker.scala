package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** Text chunking for embedding/indexing (SURVEY.md F14) — exact semantics
  * of the reference's two variants:
  *
  *   - `semantic`: greedy word-packing to `chunkSize` chars with
  *     `overlapWords`-word overlap between consecutive chunks
  *     (semantic_search.py:137-170; defaults 512/50 at :66-67)
  *   - `index`: greedy word-packing to `maxLength` chars, no overlap
  *     (search_manager.py:326-346; default 500)
  *
  * Pure Scala — unit-testable without Spark; used via a column function in
  * operators and exploded with `posexplode`.
  */
object Chunker {

  /** semantic_search.py:137-170 — returns empty for texts under 10 chars
    * after strip; overlap carries the last `overlapWords` words forward.
    */
  def semantic(text: String, chunkSize: Int = 512, overlapWords: Int = 50): Seq[String] = {
    if (text == null || Py.strip(text).length < 10) return Seq.empty
    val words = Py.splitWs(text)
    val chunks = ArrayBuffer.empty[String]
    var current = ArrayBuffer.empty[String]
    var currentLen = 0
    words.foreach { word =>
      if (currentLen + word.length + 1 > chunkSize) {
        if (current.nonEmpty) {
          chunks += current.mkString(" ")
          val overlap = current.takeRight(overlapWords)
          current = ArrayBuffer.from(overlap) += word
          currentLen = current.map(_.length).sum + current.length
        } else {
          current = ArrayBuffer(word)
          currentLen = word.length
        }
      } else {
        current += word
        currentLen += word.length + 1
      }
    }
    if (current.nonEmpty) chunks += current.mkString(" ")
    chunks.toSeq
  }

  /** search_manager.py:326-346 — simple no-overlap packing. */
  def index(text: String, maxLength: Int = 500): Seq[String] = {
    if (text == null) return Seq.empty
    val words = Py.splitWs(text)
    val chunks = ArrayBuffer.empty[String]
    var current = ArrayBuffer.empty[String]
    var currentLen = 0
    words.foreach { word =>
      if (currentLen + word.length + 1 <= maxLength) {
        current += word
        currentLen += word.length + 1
      } else {
        if (current.nonEmpty) chunks += current.mkString(" ")
        current = ArrayBuffer(word)
        currentLen = word.length
      }
    }
    if (current.nonEmpty) chunks += current.mkString(" ")
    chunks.toSeq
  }
}
