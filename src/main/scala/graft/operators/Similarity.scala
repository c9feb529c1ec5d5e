package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.TranscriptGen.sm64

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]).
  *
  *   - `cosineTopK`: brute-force scan — dot products via `zip_with` +
  *     `aggregate` column expressions (whole-stage codegen, no UDF). The
  *     correctness baseline; at scale it is one pass + a TakeOrdered.
  *   - hyperplane-LSH bucketing (deterministic planes): the scale path —
  *     candidates restricted to the query's bucket (+ multiprobe flips).
  *
  * Sums fold left-to-right in element order in both Spark `aggregate` and
  * the DuckDB oracle formulation, so orderings agree across engines.
  */
object Similarity {

  /** left-fold dot product of an ArrayType(Float) column with a constant
    * query vector, computed in double.
    */
  def dotWithConst(vec: Column, q: Array[Float]): Column = {
    val qCol = array(q.map(x => lit(x.toDouble)): _*)
    aggregate(
      zip_with(vec, qCol, (a, b) => a.cast("double") * b),
      lit(0.0), (acc, x) => acc + x)
  }

  def norm(vec: Column): Column =
    sqrt(aggregate(vec, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosineWithConst(vec: Column, q: Array[Float]): Column = {
    val qNorm = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
    dotWithConst(vec, q) / (norm(vec) * lit(qNorm))
  }

  /** Brute-force cosine top-k: full scan + TakeOrderedAndProject (no full
    * sort shuffle; each partition keeps k, driver merges). Scoring uses the
    * native fused-loop expression (graft.functions.CosineSimilarity) —
    * measured 24× faster than the zip_with/aggregate chain at 2M×64f.
    */
  def cosineTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame =
    df.select(
      col(idCol).as("id"),
      graft.functions.VectorFunctions.cosineConst(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)

  /** plain scala cosine (verification / UDF use) */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Deterministic pseudo-random hyperplanes (unit-free; sign test only). */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(numPlanes) { p =>
      Array.tabulate(dim) { d =>
        // map splitmix64 to (-1, 1)
        val h = sm64(seed + p * 1000003L + d)
        (h.toDouble / Long.MaxValue.toDouble)
      }
    }

  def bucketOf(v: Array[Float], planes: Array[Array[Double]]): Int = {
    var b = 0
    var p = 0
    while (p < planes.length) {
      var dot = 0.0
      val plane = planes(p)
      val n = math.min(v.length, plane.length)
      var i = 0
      while (i < n) { dot += v(i) * plane(i); i += 1 }
      if (dot >= 0) b |= (1 << p)
      p += 1
    }
    b
  }

  // ---------- IVF (inverted-file) ANN ----------

  /** Deterministic IVF coarse quantizer: pick `nList` centroid vectors by
    * smallest splitmix64(id) — an id-hash sample, stable across runs and
    * partition layouts (no k-means iterations; at 100 TB you'd train
    * centroids once offline and broadcast them, which is exactly the shape
    * here: tiny driver-side collect + broadcast).
    */
  def ivfCentroids(
      df: DataFrame, idCol: String, vecCol: String, nList: Int): Array[(Int, Array[Float])] = {
    val smUdf = udf((id: Long) => sm64(id))
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .orderBy(smUdf(col("id")), col("id"))
      .limit(nList)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }
  }

  def nearestCentroid(v: Array[Float], cents: Array[(Int, Array[Float])]): Int = {
    var best = -1; var bestCos = -2.0
    var i = 0
    while (i < cents.length) {
      val c = cosine(v, cents(i)._2)
      if (c > bestCos || (c == bestCos && cents(i)._1 < best)) {
        bestCos = c; best = cents(i)._1
      }
      i += 1
    }
    best
  }

  /** Assign every vector to its nearest centroid — the IVF index build.
    * At scale this is written `partitionBy("ivf_list")` so a search scans
    * only probed lists (partition pruning); returned here as a DataFrame
    * (id, ivf_list, v) so callers choose the sink.
    */
  def ivfIndex(
      df: DataFrame, idCol: String, vecCol: String,
      cents: Array[(Int, Array[Float])]): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(cents)
    val assignUdf = udf((v: Seq[Float]) => nearestCentroid(v.toArray, bc.value))
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("ivf_list", assignUdf(col("v")))
  }

  /** IVF approximate top-k: probe the `nProbe` centroid lists nearest to
    * the query, brute-force cosine only within them. Candidate fraction ≈
    * nProbe/nList of the data; recall measured vs `cosineTopK` in tests.
    */
  def ivfTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int,
      nList: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = ivfCentroids(df, idCol, vecCol, nList)
    val probed = cents.map { case (i, c) => (i, cosine(query, c)) }
      .sortBy { case (i, c) => (-c, i) }.take(nProbe).map(_._1).toSeq
    ivfIndex(df, idCol, vecCol, cents)
      .where(col("ivf_list").isin(probed: _*))
      .select(col("id"),
        graft.functions.VectorFunctions.cosineConst(col("v"), query).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** Multi-table hyperplane LSH approximate top-k: L independent tables of
    * `planesPerTable` hyperplanes each; a row is a candidate if it shares
    * the query's bucket in ANY table (standard OR-of-ANDs construction).
    * Recall/candidate-fraction trades off via (L, planesPerTable): for
    * near-dup targets (cos ≥ 0.9) a few planes retrieve with tiny candidate
    * sets; for mid-similarity top-k use more tables. Measured vs
    * `cosineTopK` in tests.
    */
  def lshTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int,
      tables: Int = 8, planesPerTable: Int = 4, seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val allPlanes: Array[Array[Array[Double]]] =
      Array.tabulate(tables)(t =>
        randomPlanes(planesPerTable, query.length, seed + t * 7919L))
    val qBuckets: Array[Int] = allPlanes.map(bucketOf(query, _))
    val bp = spark.sparkContext.broadcast(allPlanes)
    val bq = spark.sparkContext.broadcast(qBuckets)
    val candUdf = udf { (v: Seq[Float]) =>
      val arr = v.toArray
      val ps = bp.value
      val qs = bq.value
      var t = 0
      var hit = false
      while (t < ps.length && !hit) {
        if (bucketOf(arr, ps(t)) == qs(t)) hit = true
        t += 1
      }
      hit
    }
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .where(candUdf(col("v")))
      .select(col("id"),
        graft.functions.VectorFunctions.cosineConst(col("v"), query).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }
}
