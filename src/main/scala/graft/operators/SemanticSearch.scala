package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunk-level semantic search — the reference's chunk-embedding search
  * (semantic_search.py:137-170: documents → chunks → embeddings → cosine
  * ranking) composed from the engine's own blocks:
  * `Chunker.semantic` → embed → ANN scoring.
  *
  * The embedder is a deterministic token-hash signed random projection
  * (±1 per dimension per token, L2-normalized) — the sandbox stand-in for
  * a sentence encoder (no model weights in this container); swap [[embed]]
  * to productionize. The property the stub preserves end-to-end: texts
  * sharing more tokens have higher cosine, which is enough to exercise
  * the chunk→embed→rank pipeline and its plans for real.
  *
  * Scale shape: chunking+embedding is ONE narrow mapPartitions pass (no
  * shuffle); scoring is a scan + TakeOrdered via the native codegen
  * cosine. At corpus scale, materialize [[chunkEmbeddings]] once
  * (partitioned/bucketed by doc) and search with `Similarity.lshTopK` /
  * `ivfTopK` over that table instead of re-embedding per query.
  */
object SemanticSearch {

  /** deterministic token-hash random projection, L2-normalized */
  def embed(text: String, dim: Int = 64): Array[Float] = {
    val v = new Array[Float](dim)
    val toks = graft.kernel.Py.splitWs(
      graft.kernel.Py.lower(Option(text).getOrElse("")))
    toks.foreach { t =>
      var h = Dedup.hash64(t)
      var d = 0
      while (d < dim) {
        if (d % 64 == 0 && d > 0) h = graft.pipeline.TranscriptGen.sm64(h)
        v(d) += (if (((h >>> (d % 64)) & 1L) == 1L) 1.0f else -1.0f)
        d += 1
      }
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += v(i).toDouble * v(i); i += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
    }
    v
  }

  /** documents → overlapping semantic chunks → embeddings; one narrow
    * mapPartitions pass (chunker + embedder pooled per task).
    */
  def chunkEmbeddings(
      df: DataFrame, idCol: String, textCol: String, dim: Int = 64): DataFrame = {
    Dedup.requireIntegralId(df, idCol) // same silent-null-cast trap as dedup
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        graft.kernel.Chunker.semantic(Option(text).getOrElse(""))
          .iterator.zipWithIndex.map { case (c, i) => (id, i, c, embed(c, dim).toSeq) }
      })
      .toDF("doc_id", "chunk_idx", "chunk", "embedding")
  }

  /** Top-k chunks for a text query: brute-force cosine + TakeOrdered (the
    * correctness baseline; see the scale note in the object doc).
    */
  def searchChunks(
      df: DataFrame, idCol: String, textCol: String,
      query: String, k: Int, dim: Int = 64): DataFrame = {
    val qv = embed(query, dim)
    chunkEmbeddings(df, idCol, textCol, dim)
      .select(col("doc_id"), col("chunk_idx"), col("chunk"),
        graft.functions.VectorFunctions.cosineConst(col("embedding"), qv).as("score"))
      .orderBy(col("score").desc, col("doc_id"), col("chunk_idx"))
      .limit(k)
  }
}
