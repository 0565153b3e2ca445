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

  /** Search-sized cell count (the classic IVF nlist rule): a probe costs
    * ~k centroid distances plus nprobe·n/k candidate scans, minimized at
    * k ≈ √(nprobe·n) — a FIXED k turns the probe into a constant corpus
    * fraction as n grows, the same unsized-hyperparameter class as the
    * LSH plane count (PERF.md finding 17). Floor 16 = the historical
    * default; past [[Dedup.HierarchicalCellsThreshold]]-scale counts the
    * two-level [[trainResidualQuantizer]] takes over training. */
  def cellsForSearch(corpusSize: Long, nprobe: Int = 4): Int =
    math.max(16, math.ceil(
      math.sqrt((math.max(corpusSize, 1) * nprobe).toDouble)).toInt)

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

  /** Two-level residual coarse quantizer (the IMI idea, Babenko &
    * Lempitsky 2012, "The inverted multi-index" — here in its residual
    * form): level 1 is a k1-cell KMeans on the vectors; level 2 is a
    * k2-cell KMeans trained on the RESIDUALS v − c1(v); the composite
    * cell id is cell1·k2 + cell2, giving k1·k2 effective cells from two
    * (k1 + k2)-sized training problems.
    *
    * This is the scale path past the single-level limits documented at
    * [[Dedup.cellsFor]]: one Lloyd iteration costs points·k distance
    * evals and the driver holds k·dim centroid doubles — both linear in
    * k, so k = k1·k2 effective cells for √k-sized costs. Assignment is
    * two [[graft.functions.NearestCells]] codegen passes plus one
    * row-level residual subtraction (a dim-length zip_with — the only
    * interpreted lambda, O(dim) subtractions per row). */
  final case class ResidualQuantizer(level1: Array[Array[Double]],
                                     level2: Array[Array[Double]]) {
    def cells: Int = level1.length * level2.length
  }

  /** The residual v − c1(v) as a column (array<double>): level-1 cell via
    * the codegen quantizer, centroid lookup from a literal nested-array
    * reference, element-wise subtraction. */
  private def residual(vec: Column, c1: Array[Array[Double]]): Column = {
    val (m, cells, dim) = flat(c1)
    val cell1 = element_at(nearestCells(vec, m, cells, dim, 1), 1)
    val centroid = element_at(typedLit(c1.map(_.toSeq).toSeq), cell1 + 1)
    zip_with(vec.cast("array<double>"), centroid, (a, b) => a - b)
  }

  def trainResidualQuantizer(emb: DataFrame, vecCol: String, k1: Int, k2: Int,
                             seed: Long = 42L,
                             sampleFraction: Double = 1.0,
                             maxIter: Int = 10): ResidualQuantizer = {
    require(k1 >= 2 && k2 >= 2, s"need k1, k2 >= 2, got $k1, $k2")
    val c1 = trainCentroids(emb, vecCol, k1, seed, sampleFraction, maxIter)
    // sample BEFORE the residual projection: at 100 TB, projecting
    // residuals over the whole corpus only to sample 0.1% of them for
    // training would be a full wasted pass — both levels train on the
    // same seeded sample
    val base =
      if (sampleFraction < 1.0) emb.sample(withReplacement = false, sampleFraction, seed)
      else emb
    val resid = base.select(residual(col(vecCol), c1).as("__r"))
    val c2 = trainCentroids(resid, "__r", k2, seed + 1, 1.0, maxIter)
    ResidualQuantizer(c1, c2)
  }

  /** (cell, id, vec) inverted file under the composite two-level cell. */
  def indexResidual(emb: DataFrame, idCol: String, vecCol: String,
                    q: ResidualQuantizer): DataFrame = {
    val (m1, k1, dim) = flat(q.level1)
    val (m2, k2, _) = flat(q.level2)
    emb
      .withColumn("__c1", element_at(nearestCells(col(vecCol), m1, k1, dim, 1), 1))
      .withColumn("__r", zip_with(col(vecCol).cast("array<double>"),
        element_at(typedLit(q.level1.map(_.toSeq).toSeq), col("__c1") + 1),
        (a, b) => a - b))
      .select(
        (col("__c1") * k2 +
          element_at(nearestCells(col("__r"), m2, k2, dim, 1), 1)).as("cell"),
        col(idCol), col(vecCol))
  }

  /** Probe-style top-k: score only vectors in the query's `nprobe`
    * nearest cells; exact cosine within the candidate set, then
    * per-partition top-k heaps (TakeOrderedAndProject).
    *
    * Never returns short: when the probed cells hold fewer than k
    * vectors (small/imbalanced quantizer, outlier query) the query
    * falls back to the exact scan — the same ANN contract as
    * [[Similarity.lshTopKSized]]: recall degrades, the answer is never
    * empty. The gate counts the ≤ k probe result, not the corpus. */
  def topK(emb: DataFrame, idCol: String, vecCol: String,
           query: DataFrame, queryVecCol: String, k: Int,
           centroids: Array[Array[Double]], nprobe: Int = 4): DataFrame = {
    val (m, cells, dim) = flat(centroids)
    // clamp: NearestCells pads with -1 past the centroid count, and a -1
    // cell would silently probe nothing (no index row carries it)
    val np = math.min(nprobe, cells)
    val idx = index(emb, idCol, vecCol, centroids)
    val probes = broadcast(
      query.select(
        explode(nearestCells(col(queryVecCol), m, cells, dim, np)).as("cell"),
        col(queryVecCol).as("__qv")))
    val probed = idx.join(probes, Seq("cell"))
      .select(col(idCol), round(Similarity.cosine(col(vecCol), col("__qv")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .localCheckpoint(true)
    if (probed.count() >= k) probed
    else Similarity.bruteForceTopK(emb, idCol, vecCol, query, queryVecCol, k)
  }

  /** [[topK]] on the two-level residual index — the search analog of the
    * hierarchical dedup path: each query probes its `nprobe1` nearest
    * level-1 cells and, within each, the `nprobe2` nearest level-2 cells
    * of its residual — nprobe1·nprobe2 composite cells, still a broadcast
    * probe join against the inverted file. The probe expansion is pure
    * expressions over the (small) query frame: two codegen NearestCells
    * passes and one dim-length residual subtraction per (query, cell1). */
  def topKResidual(emb: DataFrame, idCol: String, vecCol: String,
                   query: DataFrame, queryVecCol: String, k: Int,
                   q: ResidualQuantizer,
                   nprobe1: Int = 4, nprobe2: Int = 4): DataFrame = {
    val (m1, k1, dim) = flat(q.level1)
    val (m2, k2, _) = flat(q.level2)
    // clamp both levels: NearestCells pads with -1 past the centroid
    // count. Unclamped, __c1 = -1 makes the level-1 centroid lookup an
    // index-0 element_at (throws), and __c2 = -1 ALIASES the composite
    // cell c1·k2 − 1 onto the valid cell (c1−1)·k2 + (k2−1) — a silent
    // wrong-cell probe (round-6 advisor finding). Legal small quantizers
    // (k1 = 2) sit below the public nprobe defaults, so clamping is the
    // builder's job, not the caller's.
    val np1 = math.min(nprobe1, k1)
    val np2 = math.min(nprobe2, k2)
    val idx = indexResidual(emb, idCol, vecCol, q)
    val probes = broadcast(
      query.select(col(queryVecCol).as("__qv"))
        .select(col("__qv"),
          explode(nearestCells(col("__qv"), m1, k1, dim, np1)).as("__c1"))
        .select(col("__qv"), col("__c1"),
          explode(nearestCells(
            zip_with(col("__qv").cast("array<double>"),
              element_at(typedLit(q.level1.map(_.toSeq).toSeq), col("__c1") + 1),
              (a, b) => a - b), m2, k2, dim, np2)).as("__c2"))
        .select((col("__c1") * k2 + col("__c2")).as("cell"), col("__qv")))
    // same never-empty contract as [[topK]]: short probe ⇒ exact scan
    val probed = idx.join(probes, Seq("cell"))
      .select(col(idCol), round(Similarity.cosine(col(vecCol), col("__qv")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .localCheckpoint(true)
    if (probed.count() >= k) probed
    else Similarity.bruteForceTopK(emb, idCol, vecCol, query, queryVecCol, k)
  }
}
