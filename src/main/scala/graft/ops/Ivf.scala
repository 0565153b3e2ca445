package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.NearestCells.nearestCells

/** IVF-flat approximate-nearest-neighbor search (the north-star "IVF or
  * LSH-bucketed variant" — this engine ships both; see [[Similarity]] for
  * the hyperplane-LSH path).
  *
  * Structure: a KMeans coarse quantizer (trained on a sample — at 100 TB
  * you train on ~10⁶ sampled vectors, never the corpus) partitions the
  * corpus into cells; each vector is assigned to its nearest cell (one
  * codegen pass, [[graft.functions.NearestCells]]); a query probes the
  * `nprobe` nearest cells and scores only those candidates. The cell
  * assignment is the shuffle key, so the index co-locates each cell's
  * vectors — the classic IVF trade: recall vs. fraction of corpus
  * scanned.
  */
object Ivf {

  /** Train centroids (driver-held, broadcast into expressions). Seeded,
    * deterministic. `sampleFraction < 1` for corpora where even one pass
    * for training is too much. */
  def trainCentroids(emb: DataFrame, vecCol: String, k: Int,
                     seed: Long = 42L, sampleFraction: Double = 1.0,
                     maxIter: Int = 10): Array[Array[Double]] = {
    val data = (if (sampleFraction < 1.0) emb.sample(withReplacement = false, sampleFraction, seed) else emb)
      .select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features")
      .fit(data).clusterCenters.map(_.toArray)
  }

  private def flat(centroids: Array[Array[Double]]): (Array[Double], Int, Int) =
    (centroids.flatten, centroids.length, centroids.head.length)

  /** (cell, id, vec): the inverted file. Cell is the vector's single
    * nearest centroid. */
  def index(emb: DataFrame, idCol: String, vecCol: String,
            centroids: Array[Array[Double]]): DataFrame = {
    val (m, cells, dim) = flat(centroids)
    emb.select(
      element_at(nearestCells(col(vecCol), m, cells, dim, 1), 1).as("cell"),
      col(idCol), col(vecCol))
  }

  /** Probe-style top-k: score only vectors in the query's `nprobe`
    * nearest cells; exact cosine within the candidate set, then
    * per-partition top-k heaps (TakeOrderedAndProject). */
  def topK(emb: DataFrame, idCol: String, vecCol: String,
           query: DataFrame, queryVecCol: String, k: Int,
           centroids: Array[Array[Double]], nprobe: Int = 4): DataFrame = {
    val (m, cells, dim) = flat(centroids)
    val idx = index(emb, idCol, vecCol, centroids)
    val probes = broadcast(
      query.select(
        explode(nearestCells(col(queryVecCol), m, cells, dim, nprobe)).as("cell"),
        col(queryVecCol).as("__qv")))
    idx.join(probes, Seq("cell"))
      .select(col(idCol), round(Similarity.cosine(col(vecCol), col("__qv")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
