package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization: 4x smaller element type, bounded reconstruction error") {
    val emb = graft.engine.Tables.read(spark, sf0001, "embeddings")
    val q = Quantize.toInt8(emb, "embedding")
    assert(q.schema("qvec").dataType.simpleString == "array<tinyint>")
    val err = q.select(
      max(abs(
        Similarity.cosine(col("embedding"), col("embedding")) -
          Similarity.cosine(Quantize.dequantize(col("qvec"), col("qscale")), col("embedding"))
      )).as("max_err")
    ).collect().head.getDouble(0)
    assert(err < 0.02, s"cosine drift after int8 roundtrip: $err")
  }

  test("cosine top-k on quantized vectors matches exact top-k almost everywhere") {
    val emb = Quantize.toInt8(graft.engine.Tables.read(spark, sf0001, "embeddings"), "embedding")
    val query = emb.filter($"vec_id" === 0)
    val exact = Similarity.bruteForceTopK(
      emb.filter($"vec_id" =!= 0), "vec_id", "embedding",
      query, "embedding", k = 10).collect().map(_.getLong(0)).toSet
    val dq = emb.withColumn("deq", Quantize.dequantize(col("qvec"), col("qscale")))
    val approx = Similarity.bruteForceTopK(
      dq.filter($"vec_id" =!= 0), "vec_id", "deq",
      dq.filter($"vec_id" === 0), "deq", k = 10).collect().map(_.getLong(0)).toSet
    assert((exact intersect approx).size >= 8, s"top-10 overlap too low: $exact vs $approx")
  }

  test("zero vector quantizes without division blowup") {
    val df = Seq((1L, Array.fill(4)(0.0f))).toDF("vec_id", "embedding")
    val row = Quantize.toInt8(df, "embedding").select("qvec", "qscale").collect().head
    assert(row.getSeq[Byte](0).forall(_ == 0) && row.getFloat(1) == 0f)
  }

  test("PQ codes are m small ints; codebooks train deterministically under a seed") {
    val emb = graft.engine.Tables.read(spark, sf0001, "embeddings")
    val cb = Quantize.trainPq(emb, "embedding", m = 8, k = 16, seed = 7L)
    assert(cb.m == 8 && cb.dsub == 8 && cb.books.forall(_.length == 16))
    val cb2 = Quantize.trainPq(emb, "embedding", m = 8, k = 16, seed = 7L)
    assert(cb.books.flatten.flatten.toSeq == cb2.books.flatten.flatten.toSeq,
      "same-seed codebooks must be identical")
    val codes = emb.select(Quantize.pqCode(col("embedding"), cb).as("c"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
  }

  test("PQ two-stage top-k: planted duplicate always found, recall >= 0.7 vs brute force") {
    val emb = graft.engine.Tables.read(spark, sf0001, "embeddings")
    val corpus = emb.filter($"vec_id" =!= 0)
    val query = emb.filter($"vec_id" === 0)
    // plant an exact duplicate of the query in the corpus: identical
    // subvectors take identical codes, so its ADC score ties the maximum
    // and the exact re-rank puts it first
    val qvec = query.select("embedding").head().getSeq[Float](0).toArray
    val planted = corpus.select("vec_id", "embedding").unionAll(
      Seq((999999L, qvec)).toDF("vec_id", "embedding"))
    val got = Quantize.pqTopK(planted, "vec_id", "embedding",
      query, "embedding", k = 10).collect()
    assert(got.head.getLong(0) == 999999L && got.head.getDouble(1) == 1.0,
      s"planted duplicate not first: ${got.toSeq}")
    // recall vs the exact scan on the UNplanted corpus: the rerank=100
    // shortlist must hold most of the true top-10
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      query, "embedding", k = 10).collect().map(_.getLong(0)).toSet
    val approx = Quantize.pqTopK(corpus, "vec_id", "embedding",
      query, "embedding", k = 10).collect().map(_.getLong(0)).toSet
    val recall = (exact intersect approx).size / 10.0
    assert(recall >= 0.7, s"PQ recall $recall: $exact vs $approx")
    // precision inside the shortlist is exact: every returned sim equals
    // the brute-force cosine for that id (4-dp projection of the same
    // expression) — PQ distortion can only cost membership, not scores
    val exactSims = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      query, "embedding", k = 200).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    Quantize.pqTopK(corpus, "vec_id", "embedding", query, "embedding", k = 10)
      .collect().foreach(r =>
        assert(exactSims(r.getLong(0)) == r.getDouble(1), s"sim drifted for ${r.getLong(0)}"))
  }

  test("IVFADC: planted duplicate first, reasonable recall, exact-scan fallback below k") {
    val emb = graft.engine.Tables.read(spark, sf0001, "embeddings")
    val corpus = emb.filter($"vec_id" =!= 0).select("vec_id", "embedding")
    val query = emb.filter($"vec_id" === 0)
    // a planted exact duplicate lands in the query's own nearest cell —
    // the FIRST probed one — with a zero residual, so it tops the ADC
    // shortlist and the exact re-rank returns it first at sim 1.0
    val qvec = query.select("embedding").head().getSeq[Float](0).toArray
    val planted = corpus.unionAll(Seq((999999L, qvec)).toDF("vec_id", "embedding"))
    val got = Quantize.ivfPqTopK(planted, "vec_id", "embedding",
      query, "embedding", k = 10).collect()
    assert(got.head.getLong(0) == 999999L && got.head.getDouble(1) == 1.0,
      s"planted duplicate not first: ${got.toSeq}")
    // recall vs brute force: the probe covers nprobe of the corpus-sized
    // cell count, then re-ranks exactly — random near-orthogonal vectors
    // are ANN's worst case, so the bar is the mechanism, not precision
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      query, "embedding", k = 10).collect().map(_.getLong(0)).toSet
    val approx = Quantize.ivfPqTopK(corpus, "vec_id", "embedding",
      query, "embedding", k = 10).collect().map(_.getLong(0)).toSet
    assert(approx.size == 10, s"IVFADC returned ${approx.size} rows")
    val recall = (exact intersect approx).size / 10.0
    assert(recall >= 0.3, s"IVFADC recall $recall: $exact vs $approx")
    // tiny corpora short-circuit to the exact scan (at or under the
    // shortlist size there is nothing to approximate, and KMeans lacks
    // training points): the answer still carries k rows — the
    // never-empty search contract
    val tiny = corpus.limit(12).localCheckpoint(true)
    val tinyGot = Quantize.ivfPqTopK(tiny, "vec_id", "embedding",
      query, "embedding", k = 10).collect()
    assert(tinyGot.length == 10, s"fallback returned ${tinyGot.length} rows")
  }

  test("ivfPqSized switches to the residual coarse quantizer past the threshold and holds recall (gate)") {
    // round-11 verdict #1: the SWITCHED path specifically — force the
    // hierarchical exit with a tiny threshold (cellsForSearch(219) = 30
    // cells > 8), so this corpus routes through trainResidualQuantizer +
    // the composite-cell ADC probe exactly as a ~4M-vector corpus would
    // at the default threshold. Clustered corpus (the IvfSpec recall
    // template): 22 clusters x 10 tight members.
    val rnd = new scala.util.Random(13)
    val rows = for (c <- 0 until 22; centre = Array.fill(64)(rnd.nextGaussian());
                    mm <- 0 until 10)
      yield ((c * 10 + mm).toLong,
        centre.map(v => (v + 0.03 * rnd.nextGaussian()).toFloat))
    val corpus = rows.toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" === 0L)
    val rest = corpus.filter($"vec_id" =!= 0L)
    val exact = Similarity.bruteForceTopK(rest, "vec_id", "embedding",
      q, "embedding", k = 9).collect().map(_.getLong(0)).toSet
    val approx = Quantize.ivfPqSized(rest, "vec_id", "embedding",
      q, "embedding", k = 9, hierarchicalThreshold = 8)
      .collect().map(_.getLong(0)).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    info(f"ivfPqSized switched-path recall = $recall%.2f")
    assert(recall >= 0.7, s"ivfPqSized switched-path recall degraded to $recall")
    // the switched path keeps the never-short contract
    assert(approx.size == 9)
    // and the planted-duplicate guarantee survives the switch: an exact
    // duplicate shares the query's composite cell with a zero residual,
    // tops the ADC shortlist, and re-ranks first at sim 1.0
    val qvec = q.select("embedding").head().getSeq[Float](0).toArray
    val planted = rest.select("vec_id", "embedding").unionAll(
      Seq((999999L, qvec)).toDF("vec_id", "embedding"))
    val got = Quantize.ivfPqSized(planted, "vec_id", "embedding",
      q, "embedding", k = 9, hierarchicalThreshold = 8).collect()
    assert(got.head.getLong(0) == 999999L && got.head.getDouble(1) == 1.0,
      s"planted duplicate not first on the switched path: ${got.toSeq}")
  }

  test("buildPqIndex/probePqIndex: parquet round-trip equals the in-memory probe on both coarse regimes") {
    // the round-trip-equivalence spec pqProbeCore's doc promises: probe
    // (a) through the persisted codes.parquet + loadPqIndex and (b)
    // through an in-memory code table + the model the build returned —
    // identical top-k proves parquet (codebook reconstruction, cell
    // partition typing, int code arrays) changes nothing
    val emb = graft.engine.Tables.read(spark, sf0001, "embeddings")
    val corpus = emb.select("vec_id", "embedding").localCheckpoint(true)
    val query = emb.filter($"vec_id" === 0)
    for ((thresh, label) <- Seq((graft.ops.Dedup.HierarchicalCellsThreshold, "single-level"),
                                (1, "residual"))) {
      val dir = java.nio.file.Files.createTempDirectory("graft_pqserve").toString
      val model = Quantize.buildPqIndex(corpus, "vec_id", "embedding", dir,
        hierarchicalThreshold = thresh)
      assert(model.coarse.isResidual == (thresh == 1), s"$label coarse regime not engaged")
      val loaded = Quantize.loadPqIndex(spark, dir)
      assert(loaded.coarse.level1.map(_.toSeq).toSeq == model.coarse.level1.map(_.toSeq).toSeq &&
             loaded.coarse.level2.map(_.toSeq).toSeq == model.coarse.level2.map(_.toSeq).toSeq,
        s"$label coarse centroids drifted through parquet")
      assert(loaded.cb.m == model.cb.m && loaded.cb.dsub == model.cb.dsub &&
             loaded.cb.books.map(_.map(_.toSeq).toSeq).toSeq ==
               model.cb.books.map(_.map(_.toSeq).toSeq).toSeq,
        s"$label PQ codebooks drifted through parquet")
      val codesMem = model.coarse.indexOf(corpus, "vec_id", "embedding")
        .withColumn("code",
          Quantize.pqCode(model.coarse.residualOf(col("embedding")), model.cb))
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val inMem = pairs(Quantize.pqProbeCore(codesMem, model,
        "vec_id", "embedding", query, "embedding", k = 10, nprobe = 4, rerank = 100))
      val fromDisk = pairs(Quantize.probePqIndex(spark, dir,
        "vec_id", "embedding", query, "embedding", k = 10))
      assert(inMem == fromDisk, s"$label parquet round-trip changed the probe")
      assert(fromDisk.length == 10, s"$label returned ${fromDisk.length} rows")
      // vec 0 is IN the index: zero residual ⇒ tops the ADC shortlist in
      // its own (first-probed) cell, exact re-rank returns it at 1.0
      assert(fromDisk.head == (0L, 1.0), s"$label planted self not first: ${fromDisk.head}")
    }
  }

  test("appendPqIndex: appended codes serve immediately and equal the in-memory union probe") {
    // lifecycle parity with Ivf.appendIndex: codes for the appended rows
    // come from the PERSISTED coarse model + codebooks, and the served
    // top-k equals pqProbeCore over an in-memory union code table built
    // with the same model; a query whose vector arrives via append must
    // re-rank first at 1.0
    val emb = graft.engine.Tables.read(spark, sf0001, "embeddings")
      .select("vec_id", "embedding").localCheckpoint(true)
    val half = emb.filter($"vec_id" % 2 === 0)
    val rest = emb.filter($"vec_id" % 2 =!= 0)
    val query = emb.filter($"vec_id" === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_pqappend").toString
    val model = Quantize.buildPqIndex(half, "vec_id", "embedding", dir)
    Quantize.appendPqIndex(rest, "vec_id", "embedding", dir)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val served = pairs(Quantize.probePqIndex(spark, dir, "vec_id", "embedding",
      query, "embedding", k = 10))
    val codesMem = model.coarse.indexOf(emb, "vec_id", "embedding")
      .withColumn("code",
        Quantize.pqCode(model.coarse.residualOf(col("embedding")), model.cb))
    val inMem = pairs(Quantize.pqProbeCore(codesMem, model,
      "vec_id", "embedding", query, "embedding", k = 10, nprobe = 4, rerank = 100))
    assert(served == inMem, "append-built PQ index diverged from the in-memory union probe")
    assert(served.head == (1L, 1.0), s"appended self not first: ${served.head}")
  }

  test("probePqIndex: never-short fallback below k; single-query contract enforced") {
    val emb = graft.engine.Tables.read(spark, sf0001, "embeddings")
    val query = emb.filter($"vec_id" === 0)
    val tiny = emb.filter($"vec_id" =!= 0).limit(12)
      .select("vec_id", "embedding").localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("graft_pqserve_tiny").toString
    Quantize.buildPqIndex(tiny, "vec_id", "embedding", dir)
    val got = Quantize.probePqIndex(spark, dir, "vec_id", "embedding",
      query, "embedding", k = 10).collect()
    assert(got.length == 10, s"fallback returned ${got.length} rows")
    val err = intercept[IllegalArgumentException] {
      Quantize.probePqIndex(spark, dir, "vec_id", "embedding",
        emb.filter($"vec_id".isin(0L, 1L)), "embedding", k = 10)
    }
    assert(err.getMessage.contains("single-query"))
  }
}
