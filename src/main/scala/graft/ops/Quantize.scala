package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization (LLM-pipeline memory lever): symmetric int8
  * per-vector quantization — 4× smaller embedding columns, which at
  * 100 TB is the difference between an in-memory ANN index and a
  * spilled one. `q = round(x * 127 / max|x|)`, scale kept alongside for
  * dequantization; cosine on dequantized vectors approximates the
  * original to ~1e-2 (spec-pinned).
  *
  * Pure `functions._` projections: the array passes (max|x|, transform)
  * are row-level and codegen-friendly; no shuffle. */
object Quantize {

  /** Adds `qvec: array<tinyint>` and `qscale: float` columns. */
  def toInt8(df: DataFrame, vecCol: String): DataFrame = {
    val absMax = array_max(transform(col(vecCol), x => abs(x)))
    df
      .withColumn("qscale", (absMax / lit(127.0)).cast("float"))
      .withColumn("qvec",
        transform(col(vecCol), x =>
          when(col("qscale") === 0f, lit(0))
            .otherwise(round(x / col("qscale")).cast("int"))
            .cast("tinyint")))
  }

  /** Reconstruct an approximate float vector from (qvec, qscale). */
  def dequantize(qvec: Column, qscale: Column): Column =
    transform(qvec, q => (q.cast("float") * qscale))

  /** Product-quantization codebooks (Jégou, Douze & Schmid, "Product
    * quantization for nearest neighbor search", TPAMI 2011): the vector
    * splits into `m` contiguous `dsub`-dim subvectors, each quantized to
    * one of `k` per-subspace centroids — a vector becomes `m` small
    * codes (m bytes at k ≤ 256) instead of 4·dim float bytes, the
    * memory lever that keeps a billion-vector index in RAM.
    * `books(j)(c)` is subspace j's centroid c; driver-held and tiny
    * (m·k·dsub doubles — ~8 KB at the defaults), riding into
    * expressions as literals like the IVF centroid matrix. */
  final case class PqCodebooks(m: Int, k: Int, dsub: Int,
                               books: Array[Array[Array[Double]]])

  /** Train PQ codebooks: one seeded KMeans per SUBSPACE over the
    * corpus' subvectors (sampled via `sampleFraction` when even one
    * training pass is too much — the [[Ivf.trainCentroids]] posture).
    * The m fits are INDEPENDENT (disjoint subspaces, fixed per-subspace
    * seeds) and dominated by per-fit job-scheduling overhead at k=16 ×
    * dsub-wide rows, so they run CONCURRENTLY — Spark's scheduler
    * interleaves the m jobs and the wall is one fit plus contention,
    * not m fits end-to-end (measured 7.4 → ~2 s on the registered
    * query). Results are unchanged by the concurrency: each fit's seed
    * and input are fixed per subspace. */
  def trainPq(emb: DataFrame, vecCol: String, m: Int = 8, k: Int = 16,
              seed: Long = 42L, sampleFraction: Double = 1.0): PqCodebooks = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    require(m > 0 && dim % m == 0, s"dim $dim not divisible into $m subspaces")
    require(k > 1 && k <= 256, s"k $k outside (1, 256] — codes are bytes")
    val dsub = dim / m
    val books = Await.result(
      Future.sequence((0 until m).map { j =>
        // blocking: each future runs a Spark action; mark it so the
        // shared pool spawns compensation threads instead of starving
        // other users of the global EC. A failed fit fails the whole
        // train (Future.sequence fails fast; sibling fits run to
        // completion — train on a bounded frame, see pqTopK, so an
        // orphaned sibling is a small job, not a corpus scan).
        Future(scala.concurrent.blocking(Ivf.trainCentroids(
          emb.select(slice(col(vecCol), j * dsub + 1, dsub).as("__sub")),
          "__sub", k, seed + j, sampleFraction)))
      }), Duration.Inf).toArray
    PqCodebooks(m, k, dsub, books)
  }

  /** PQ code column: array<int> of `m` per-subspace nearest-centroid
    * ids — one [[graft.functions.NearestCells]] compiled pass per
    * subspace over the sliced vector, no shuffle. */
  def pqCode(vec: Column, cb: PqCodebooks): Column =
    array((0 until cb.m).map { j =>
      // cells = the ACTUAL trained count, not the requested k: KMeans
      // returns fewer centers when a subspace has fewer distinct points
      // (constant/zero-padded dims), and NearestCells reads
      // centroids(c*dim+i) for c < cells
      element_at(graft.functions.NearestCells.nearestCells(
        slice(vec, j * cb.dsub + 1, cb.dsub),
        cb.books(j).flatten, cb.books(j).length, cb.dsub, 1), 1)
    }: _*)

  /** Asymmetric-distance (ADC) inner-product approximation for one
    * query: dot(q, x) ≈ Σⱼ dot(qⱼ, books(j)(codeⱼ)). The per-subspace
    * lookup tables are m·k doubles computed driver-side and inlined as
    * array literals, so the scan cost per row is m element_at's + m−1
    * adds — pure column arithmetic inside codegen, no HOF lambda. */
  def pqAdcScore(codeCol: Column, cb: PqCodebooks,
                 query: Array[Double]): Column = {
    require(query.length == cb.m * cb.dsub,
      s"query dim ${query.length} != ${cb.m}·${cb.dsub}")
    (0 until cb.m).map { j =>
      val table = cb.books(j).map { c =>
        var d = 0.0; var i = 0
        while (i < cb.dsub) { d += query(j * cb.dsub + i) * c(i); i += 1 }
        d
      }
      element_at(typedLit(table.toSeq), element_at(codeCol, j + 1) + 1)
    }.reduce(_ + _)
  }

  /** Two-stage PQ top-k — the production memory-bounded search shape
    * (FAISS's IVFADC without the coarse quantizer; compose with [[Ivf]]
    * for that): (1) every row scores by the ADC approximation over its
    * m-byte code — a map-side projection planned as
    * `TakeOrderedAndProject` down to the `rerank` shortlist; (2) the
    * shortlist (≤ rerank rows, never corpus-sized BY CONSTRUCTION — the
    * limit is in the plan, not an assumption) re-ranks by EXACT cosine
    * against the broadcast query, so PQ distortion costs recall only
    * when a true neighbor falls outside the shortlist, not precision
    * inside it. Returns (idCol, sim) like [[Similarity.bruteForceTopK]];
    * KMeans float-reduction order makes codebooks hash-unstable →
    * rows-only query, recall + planted-duplicate specs in QuantizeSpec. */
  def pqTopK(emb: DataFrame, idCol: String, vecCol: String,
             query: DataFrame, queryVecCol: String, k: Int,
             m: Int = 8, codebookSize: Int = 16, rerank: Int = 100,
             seed: Long = 42L, trainSampleRows: Long = 16384L): DataFrame = {
    require(rerank >= k, s"rerank $rerank < k $k")
    require(trainSampleRows > 0, s"trainSampleRows $trainSampleRows")
    val nAll = emb.count()
    // a corpus at or under the shortlist size IS its own shortlist: the
    // exact scan answers directly (and KMeans with k centroids needs at
    // least k points — tiny inputs must not crash the approximate path)
    if (nAll <= rerank)
      return Similarity.bruteForceTopK(emb, idCol, vecCol, query, queryVecCol, k)
    // codebook training is SAMPLE-BOUNDED (the corpus-sized-hyperparameter
    // rule): k=16 centroids per subspace need ~hundreds of points each
    // (FAISS's ~39·k guideline), so passes over the whole corpus buy
    // nothing past that. The sample is drawn ONCE and checkpointed —
    // every subspace trains on the SAME ~trainSampleRows rows (the
    // standard PQ setup) and the corpus pays ONE sampling scan, not one
    // per fit. The ENCODE pass still covers every row.
    val n = nAll
    val trainBase =
      if (n <= trainSampleRows) emb
      else emb.sample(withReplacement = false,
        trainSampleRows.toDouble / n, seed).localCheckpoint(true)
    val cb = trainPq(trainBase, vecCol, m, codebookSize, seed)
    // the single query vector is a 1-row collect (the ADC tables need it
    // driver-side); the query frame's contract is one probe row
    val q = query.select(col(queryVecCol).cast("array<double>").as("__q"))
      .head().getSeq[Double](0).toArray
    val shortlist = emb
      .select(col(idCol), col(vecCol),
        pqAdcScore(pqCode(col(vecCol), cb), cb, q).as("__adc"))
      .orderBy(col("__adc").desc, col(idCol))
      .limit(rerank)
    Similarity.bruteForceTopK(shortlist, idCol, vecCol, query, queryVecCol, k)
  }

  /** IVFADC — the full FAISS index architecture (Jégou et al. TPAMI
    * 2011 §IV): an IVF coarse quantizer partitions the corpus into
    * cells, vectors encode as PQ codes of their RESIDUAL from the cell
    * centroid (residuals are smaller and more isotropic than raw
    * vectors, so the same code budget quantizes them better), and a
    * query probes only `nprobe` cells, scoring each candidate as
    *
    *   dot(q, x) = dot(q, cen_cell) + dot(q, residual)
    *             ≈ [per-cell scalar]  + [shared ADC lookup]
    *
    * — exact decomposition, both terms cheap: the per-cell scalar is a
    * |cells|-sized array literal and the ADC tables do not depend on
    * the cell for inner product. The ADC shortlist re-ranks by exact
    * cosine ([[pqTopK]]'s two-stage discipline) and the probe falls
    * back to the exact scan below k results — an ANN answer is never
    * empty (the contract every search path holds).
    *
    * Scale shape: cell count is CORPUS-SIZED ([[Ivf.cellsForSearch]]);
    * coarse + PQ training each run on bounded samples; the probe scans
    * only ~nprobe/cells of the corpus and encodes only probed rows in
    * this in-query form (a serving deployment materializes the code
    * table once). Delegates to [[ivfPqSized]] — past the single-level
    * cell limit the two-level residual coarse quantizer takes over.
    * KMeans reduction order → rows-only; recall + fallback specs. */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
                query: DataFrame, queryVecCol: String, k: Int,
                nprobe: Int = 4, m: Int = 8, codebookSize: Int = 16,
                rerank: Int = 100, seed: Long = 42L,
                trainSampleRows: Long = 16384L): DataFrame =
    ivfPqSized(emb, idCol, vecCol, query, queryVecCol, k, nprobe, m,
      codebookSize, rerank, seed, trainSampleRows)

  /** IVFADC on a corpus of unknown size — the composed entry point,
    * completing the sized-family contract every other ANN/dedup path
    * already holds ([[Ivf.topKSized]], [[Ivf.topKBatchSized]],
    * [[Dedup.semanticDedupSized]]): the cell count comes from
    * [[Ivf.cellsForSearch]]; at or below `hierarchicalThreshold` cells a
    * single-level coarse quantizer trains and probes; PAST it the
    * two-level residual quantizer ([[Ivf.trainResidualQuantizer]]) takes
    * over as the coarse stage — √cells centroids per level, so neither
    * the driver-held centroid literal nor a Lloyd iteration's points·k
    * distance evals grow past the documented single-level limit (PERF.md
    * finding 18). PQ then encodes the SECOND-level residual
    * v − c1 − c2 (no larger than the single-level residual, so the same
    * code budget quantizes it at least as well) and the inner product
    * still decomposes exactly:
    *
    *   dot(q, x) = dot(q, c1) + dot(q, c2) + dot(q, r2)
    *             ≈ [k1 table]  + [k2 table] + [shared ADC lookup]
    *
    * — the per-cell scalar splits into two √cells-sized literals instead
    * of one cells-sized one. The probe widens to nprobe² composite cells,
    * the same deliberate widening as [[Ivf.topKSized]] (a neighbor must
    * land right at BOTH levels). Coarse-training support scales with the
    * centroid count (max(trainSampleRows, 39·k) — the ~39 points/centroid
    * guideline the PQ literature cites), so recall does not silently
    * degrade as cellsForSearch outgrows a fixed sample. */
  def ivfPqSized(emb: DataFrame, idCol: String, vecCol: String,
                 query: DataFrame, queryVecCol: String, k: Int,
                 nprobe: Int = 4, m: Int = 8, codebookSize: Int = 16,
                 rerank: Int = 100, seed: Long = 42L,
                 trainSampleRows: Long = 16384L,
                 hierarchicalThreshold: Int = Dedup.HierarchicalCellsThreshold): DataFrame = {
    require(rerank >= k, s"rerank $rerank < k $k")
    require(trainSampleRows > 0, s"trainSampleRows $trainSampleRows")
    val n = emb.count()
    // same tiny-corpus short-circuit as [[pqTopK]]: at or under the
    // shortlist size the exact scan IS the answer, and neither KMeans
    // stage has enough points to train
    if (n <= rerank)
      return Similarity.bruteForceTopK(emb, idCol, vecCol, query, queryVecCol, k)
    val cells = Ivf.cellsForSearch(n, nprobe)
    if (cells <= hierarchicalThreshold)
      ivfPqFlatCoarse(emb, idCol, vecCol, query, queryVecCol, k, nprobe, m,
        codebookSize, rerank, seed, trainSampleRows, n, cells)
    else
      ivfPqResidualCoarse(emb, idCol, vecCol, query, queryVecCol, k, nprobe,
        m, codebookSize, rerank, seed, trainSampleRows, n, cells)
  }

  /** Single-level-coarse IVFADC body ([[ivfPqSized]] below the
    * hierarchical threshold); `n`/`cells` precomputed by the caller. */
  private def ivfPqFlatCoarse(emb: DataFrame, idCol: String, vecCol: String,
                              query: DataFrame, queryVecCol: String, k: Int,
                              nprobe: Int, m: Int, codebookSize: Int,
                              rerank: Int, seed: Long, trainSampleRows: Long,
                              n: Long, cells: Int): DataFrame = {
    // coarse support scales with the centroid count, never below the
    // caller's floor: a fixed sample shrinks per-cell support as
    // cellsForSearch grows with the corpus (ADVICE r11)
    val coarseRows = math.max(trainSampleRows, 39L * cells)
    val centroids = Ivf.trainCentroids(emb, vecCol, cells, seed,
      sampleFraction =
        if (n <= coarseRows) 1.0 else coarseRows.toDouble / n)
    val indexed = Ivf.index(emb, idCol, vecCol, centroids)
    val cen2d = typedLit(centroids.map(_.toSeq).toSeq)
    def residual = zip_with(col(vecCol),
      element_at(cen2d, col("cell") + 1),
      (x, y) => x.cast("double") - y)
    // PQ trains on a bounded ONE-SCAN sample of residuals from the
    // whole corpus (not just probed cells — training must not bias to
    // the query's neighborhood)
    val trainBase =
      (if (n <= trainSampleRows) indexed
       else indexed.sample(withReplacement = false,
         trainSampleRows.toDouble / n, seed))
        .select(residual.as("__res")).localCheckpoint(true)
    val cb = trainPq(trainBase, "__res", m, codebookSize, seed)
    val q = query.select(col(queryVecCol).cast("array<double>").as("__q"))
      .head().getSeq[Double](0).toArray
    // probe cells and per-cell dot(q, cen) driver-side: the centroid
    // matrix is already driver-held
    def dotq(c: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < math.min(c.length, q.length)) { d += q(i) * c(i); i += 1 }
      d
    }
    val probedCells = centroids.zipWithIndex
      .map { case (c, i) =>
        var d2 = 0.0; var j = 0
        while (j < math.min(c.length, q.length)) {
          val diff = q(j) - c(j); d2 += diff * diff; j += 1
        }
        (d2, i)
      }
      .sortBy(_._1).take(nprobe).map(_._2)
    val qcDots = typedLit(centroids.map(dotq).toSeq)
    val shortlist = indexed
      .filter(col("cell").isin(probedCells.map(Integer.valueOf): _*))
      .select(col(idCol), col(vecCol),
        (element_at(qcDots, col("cell") + 1) +
          pqAdcScore(pqCode(residual, cb), cb, q)).as("__adc"))
      .orderBy(col("__adc").desc, col(idCol))
      .limit(rerank)
    Similarity.neverShort(
      Similarity.bruteForceTopK(shortlist, idCol, vecCol, query, queryVecCol, k),
      emb, idCol, vecCol, query, queryVecCol, k)
  }

  /** Two-level-coarse IVFADC body ([[ivfPqSized]] past the hierarchical
    * threshold): composite cell c1·k2 + c2 from [[Ivf.indexResidual]],
    * PQ codes of the second-level residual, per-cell scalar split into
    * two √cells-sized query-dot tables, driver-side nprobe² probe over
    * the two SMALL centroid arrays. */
  private def ivfPqResidualCoarse(emb: DataFrame, idCol: String, vecCol: String,
                                  query: DataFrame, queryVecCol: String, k: Int,
                                  nprobe: Int, m: Int, codebookSize: Int,
                                  rerank: Int, seed: Long, trainSampleRows: Long,
                                  n: Long, cells: Int): DataFrame = {
    // √cells per level — k1·k2 effective cells from two small fits, the
    // same split as [[Ivf.topKSized]]; per-level support scales with the
    // PER-LEVEL centroid count (each KMeans trains kLevel centers)
    val kLevel = math.max(2, math.ceil(math.sqrt(cells.toDouble)).toInt)
    val coarseRows = math.max(trainSampleRows, 39L * kLevel)
    val rq = Ivf.trainResidualQuantizer(emb, vecCol, kLevel, kLevel, seed,
      sampleFraction = if (n <= coarseRows) 1.0 else coarseRows.toDouble / n)
    val k2 = rq.level2.length
    val indexed = Ivf.indexResidual(emb, idCol, vecCol, rq)
    val c1Lit = typedLit(rq.level1.map(_.toSeq).toSeq)
    val c2Lit = typedLit(rq.level2.map(_.toSeq).toSeq)
    // cell ids are non-negative, so the double-divide truncation IS the
    // floor: c1 = cell div k2, c2 = cell mod k2
    def cell1 = (col("cell") / lit(k2)).cast("int")
    def cell2 = pmod(col("cell"), lit(k2))
    def residual2 = zip_with(
      zip_with(col(vecCol).cast("array<double>"),
        element_at(c1Lit, cell1 + 1), (x, y) => x - y),
      element_at(c2Lit, cell2 + 1), (x, y) => x - y)
    // PQ trains on a bounded ONE-SCAN sample of second-level residuals
    // from the whole corpus (never just probed cells — training must not
    // bias to the query's neighborhood)
    val trainBase =
      (if (n <= trainSampleRows) indexed
       else indexed.sample(withReplacement = false,
         trainSampleRows.toDouble / n, seed))
        .select(residual2.as("__res")).localCheckpoint(true)
    val cb = trainPq(trainBase, "__res", m, codebookSize, seed)
    val q = query.select(col(queryVecCol).cast("array<double>").as("__q"))
      .head().getSeq[Double](0).toArray
    def dotq(c: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < math.min(c.length, q.length)) { d += q(i) * c(i); i += 1 }
      d
    }
    def sqDist(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        val diff = a(i) - b(i); d += diff * diff; i += 1
      }
      d
    }
    // driver-side probe over the two small centroid arrays: nprobe
    // nearest level-1 cells, then nprobe nearest level-2 cells of the
    // query's residual within each — nprobe² composite cells (clamped to
    // the ACTUAL trained counts, like [[Ivf.probeCellsResidual]])
    val np1 = math.min(nprobe, rq.level1.length)
    val np2 = math.min(nprobe, k2)
    val probedCells: Seq[Int] = rq.level1.zipWithIndex
      .map { case (c, i) => (sqDist(q, c), i) }
      .sortBy(_._1).take(np1).toSeq
      .flatMap { case (_, c1) =>
        val qres = Array.tabulate(q.length)(i =>
          q(i) - (if (i < rq.level1(c1).length) rq.level1(c1)(i) else 0.0))
        rq.level2.zipWithIndex.map { case (c, j) => (sqDist(qres, c), j) }
          .sortBy(_._1).take(np2).map { case (_, c2) => c1 * k2 + c2 }.toSeq
      }
    val qc1Dots = typedLit(rq.level1.map(dotq).toSeq)
    val qc2Dots = typedLit(rq.level2.map(dotq).toSeq)
    val shortlist = indexed
      .filter(col("cell").isin(probedCells.map(Integer.valueOf): _*))
      .select(col(idCol), col(vecCol),
        (element_at(qc1Dots, cell1 + 1) + element_at(qc2Dots, cell2 + 1) +
          pqAdcScore(pqCode(residual2, cb), cb, q)).as("__adc"))
      .orderBy(col("__adc").desc, col(idCol))
      .limit(rerank)
    Similarity.neverShort(
      Similarity.bruteForceTopK(shortlist, idCol, vecCol, query, queryVecCol, k),
      emb, idCol, vecCol, query, queryVecCol, k)
  }
}
