package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pointer-flip lifecycle mode end-to-end (r19 verdict #1): on a
  * pointer-mode root, EVERY lifecycle verb — build, probe (single +
  * batch), append, remove, compact, stats, rebuild, maintain — runs
  * with a [[IndexLifecycle.RenameIo]] installed that THROWS on any
  * rename under the fixture: the protocol's safety on copy+delete
  * stores comes from never renaming live data, and this suite turns
  * that claim into a hard pin (a single protocol rename anywhere in
  * the lifecycle fails the test loudly). Probe results are pinned
  * EQUAL to the same-seed plain-dir index, so pointer mode changes
  * deployment semantics, never answers.
  *
  * The zombie fence extends to the commit — the pointer protocol's one
  * protocol-critical write: a writer taken over mid-verb aborts BEFORE
  * flipping the pointer (the swap-rename fence's exact posture), pinned
  * here by replacing the lease content under a held lock. And
  * [[IndexLifecycle.fencedProbeResolved]] re-resolves across a
  * concurrent flip: a probe that straddles a generation commit retries
  * against the NEW world instead of serving a mixed one. */
class PointerModeLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.engine.Tables.read(spark, sf0001, "embeddings")
    .select("vec_id", "embedding")

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  /** Throws on any fixture-scoped rename; delegates elsewhere (the
    * NonAtomicRenameSpec scoping rule). Protocol renames only — parquet
    * committer renames go through the filesystem directly: for the
    * REPLACE verbs those happen inside fresh generation dirs; for the
    * append verbs they land inside the live generation and ride the
    * configured committer (the documented SCOPE caveat on
    * IndexLifecycle's pointer-mode intro). */
  private final class ForbiddenRenameIo(fixtureDir: String)
    extends IndexLifecycle.RenameIo {
    def rename(fs: org.apache.hadoop.fs.FileSystem,
               src: org.apache.hadoop.fs.Path,
               dst: org.apache.hadoop.fs.Path): Boolean = {
      if (!src.toUri.getPath.startsWith(fixtureDir))
        return IndexLifecycle.HadoopRenameIo.rename(fs, src, dst)
      throw new AssertionError(
        s"pointer-mode lifecycle issued a protocol rename $src -> $dst — " +
          "the mode's contract is that live data is never renamed")
    }
  }

  private def withFake[T](io: IndexLifecycle.RenameIo)(body: => T): T = {
    IndexLifecycle.renameIo = io
    try body finally IndexLifecycle.renameIo = IndexLifecycle.HadoopRenameIo
  }

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def genNames(root: String): Seq[String] =
    new java.io.File(root).listFiles().map(_.getName).toSeq
      .filter(n => n.startsWith("gen-") && !n.contains(".__")).sorted

  test("IVF pointer lifecycle: build/probe/append/remove/compact/rebuild/maintain, zero renames, equal answers") {
    val corpus = emb.localCheckpoint(true)
    val query = corpus.filter($"vec_id" === 0)
    val fixture = tmpDir("graft_ptr_ivf")
    val root = s"$fixture/idx"
    val plainDir = s"$fixture/plain"
    // the plain twin builds OUTSIDE the forbidden scope? No — builds
    // rename nothing either way; both run under the forbidden fake so
    // the whole test doubles as a rename audit of the build path too
    withFake(new ForbiddenRenameIo(fixture)) {
      Ivf.buildIndex(corpus, "vec_id", "embedding", plainDir, maxIter = 5)
      IndexLifecycle.buildIndexGeneration(spark, root) { gen =>
        Ivf.buildIndex(corpus, "vec_id", "embedding", gen, maxIter = 5)
      }
      // direct builds against a pointer root fail loudly with the remedy
      val boom = intercept[IllegalArgumentException] {
        Ivf.buildIndex(corpus, "vec_id", "embedding", root, maxIter = 5)
      }
      assert(boom.getMessage.contains("buildIndexGeneration"))

      // probes resolve the pointer and answer exactly like the plain twin
      val fromPtr = pairs(Ivf.probeIndex(spark, root, "vec_id", "embedding",
        query, "embedding", k = 10))
      val fromPlain = pairs(Ivf.probeIndex(spark, plainDir, "vec_id", "embedding",
        query, "embedding", k = 10))
      assert(fromPtr == fromPlain,
        s"pointer-mode probe diverged from the plain twin: $fromPtr vs $fromPlain")
      assert(fromPtr.head._1 == 0L, "planted self not first")

      // batch probe resolves too
      val batchQ = corpus.filter($"vec_id" < 3)
        .select($"vec_id".as("qid"), $"embedding")
      val fromPtrBatch = Ivf.probeIndexBatch(spark, root, "vec_id", "embedding",
        batchQ, "qid", "embedding", k = 5).collect().toSet
      val fromPlainBatch = Ivf.probeIndexBatch(spark, plainDir, "vec_id",
        "embedding", batchQ, "qid", "embedding", k = 5).collect().toSet
      assert(fromPtrBatch == fromPlainBatch)

      // append lands INSIDE the live generation (no flip), serves union
      val extra = corpus.limit(5)
        .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
        .localCheckpoint(true)
      val gensBefore = genNames(root)
      Ivf.appendIndex(extra, "vec_id", "embedding", root)
      assert(genNames(root) == gensBefore, "append must not churn generations")
      val self = extra.limit(1)
      val appendedProbe = pairs(Ivf.probeIndex(spark, root, "vec_id",
        "embedding", self, "embedding", k = 3))
      // the appended row is a DUPLICATE of its source vector (sim 1.0
      // tie, id-ordered) — containment is the membership pin
      assert(appendedProbe.map(_._1).contains(self.head().getLong(0)),
        s"appended row not served: $appendedProbe")

      // removal on a pointer root ALWAYS tombstones (the physical arm's
      // dynamic overwrite is rename-based): invfile untouched, nested
      // pointer-root tombstone set appears, probes serve it out
      val victims = fromPtr.take(2).map(_._1)
      val livGen = IndexLifecycle.resolveIndexDir(spark, root)
      val cellFilesBefore = new java.io.File(s"$livGen/invfile.parquet")
        .listFiles().map(_.getName).toSet
      IndexLifecycle.removeIds(spark, root, victims.toDF("vec_id"), "vec_id",
        tombstone = false)
      assert(new java.io.File(s"$livGen/invfile.parquet")
        .listFiles().map(_.getName).toSet == cellFilesBefore,
        "pointer-mode remove physically rewrote cells")
      assert(IndexLifecycle.isPointerRoot(spark, s"$livGen/deletes.parquet"),
        "pointer-mode tombstone set is not a nested pointer root")
      val afterRemove = pairs(Ivf.probeIndex(spark, root, "vec_id", "embedding",
        query, "embedding", k = 10))
      assert(afterRemove.map(_._1).toSet.intersect(victims.toSet).isEmpty,
        s"removed ids still served: $afterRemove")
      assert(IndexLifecycle.indexStats(spark, root).head()
        .getAs[Long]("tombstones") == victims.length.toLong)

      // compaction flips a generation, applies the backlog physically,
      // clears it — and the old generation is GC'd
      val genBeforeCompact = genNames(root)
      IndexLifecycle.compactIndex(spark, root)
      val genAfterCompact = genNames(root)
      assert(genAfterCompact.length == 1 &&
        genAfterCompact != genBeforeCompact,
        s"compaction should flip to one fresh generation: $genBeforeCompact -> $genAfterCompact")
      val newGen = IndexLifecycle.resolveIndexDir(spark, root)
      assert(spark.read.parquet(s"$newGen/invfile.parquet")
        .filter($"vec_id".isin(victims: _*)).count() == 0L,
        "compaction did not apply the tombstone backlog physically")
      assert(IndexLifecycle.indexStats(spark, root).head()
        .getAs[Long]("tombstones") == 0L, "backlog not cleared by the flip")
      assert(pairs(Ivf.probeIndex(spark, root, "vec_id", "embedding",
        query, "embedding", k = 10)) == afterRemove,
        "compaction changed probe answers")

      // rebuild retrains into a fresh generation and flips
      val statsBefore = IndexLifecycle.indexStats(spark, root).head()
      IndexLifecycle.rebuildIndex(spark, root)
      val statsAfter = IndexLifecycle.indexStats(spark, root).head()
      assert(statsAfter.getAs[Long]("built_rows") ==
        statsAfter.getAs[Long]("live_rows"),
        "rebuild should reset built==live")
      assert(statsAfter.getAs[Long]("live_rows") ==
        statsBefore.getAs[Long]("live_rows"),
        "rebuild changed the corpus")
      assert(genNames(root).length == 1, "stale generations survived the rebuild GC")
      val rebuiltProbe = pairs(Ivf.probeIndex(spark, root, "vec_id", "embedding",
        query, "embedding", k = 10))
      // the query's own id was among the removed victims — the rebuilt
      // index must keep serving the post-removal world: full k, still no
      // victim, and the appended duplicate of vec 0 now answers first
      assert(rebuiltProbe.length == 10)
      assert(rebuiltProbe.map(_._1).toSet.intersect(victims.toSet).isEmpty,
        s"removed ids resurrected by rebuild: $rebuiltProbe")

      // maintenance runs the same policy loop through the pointer verbs
      assert(IndexLifecycle.maintainIndex(spark, root) == "none",
        "fresh rebuild should be a maintenance fixpoint")
    }
  }

  test("LSH pointer lifecycle: build/probe/append/remove/compact, zero renames, equal answers") {
    val corpus = emb.localCheckpoint(true)
    val query = corpus.filter($"vec_id" === 0)
    val fixture = tmpDir("graft_ptr_lsh")
    val root = s"$fixture/idx"
    val plainDir = s"$fixture/plain"
    withFake(new ForbiddenRenameIo(fixture)) {
      Similarity.buildLshIndex(corpus, "vec_id", "embedding", plainDir)
      IndexLifecycle.buildIndexGeneration(spark, root) { gen =>
        Similarity.buildLshIndex(corpus, "vec_id", "embedding", gen)
      }
      val fromPtr = pairs(Similarity.probeLshIndex(spark, root, "vec_id",
        "embedding", query, "embedding", k = 10))
      val fromPlain = pairs(Similarity.probeLshIndex(spark, plainDir, "vec_id",
        "embedding", query, "embedding", k = 10))
      assert(fromPtr == fromPlain)
      // batch probe parity
      val batchQ = corpus.filter($"vec_id" < 3)
        .select($"vec_id".as("qid"), $"embedding")
      assert(
        Similarity.probeLshIndexBatch(spark, root, "vec_id", "embedding",
          batchQ, "qid", "embedding", k = 5).collect().toSet ==
        Similarity.probeLshIndexBatch(spark, plainDir, "vec_id", "embedding",
          batchQ, "qid", "embedding", k = 5).collect().toSet)

      // append (postings-first protocol, inside the live generation) +
      // the un-delete rewrite of the nested tombstone pointer root —
      // the one mutation that is a SWAP in rename mode
      val victims = fromPtr.take(2).map(_._1)
      IndexLifecycle.removeIds(spark, root, victims.toDF("vec_id"), "vec_id")
      val afterRemove = pairs(Similarity.probeLshIndex(spark, root, "vec_id",
        "embedding", query, "embedding", k = 10))
      assert(afterRemove.map(_._1).toSet.intersect(victims.toSet).isEmpty)
      val reinsert = corpus.filter($"vec_id" === victims.head)
        .localCheckpoint(true)
      Similarity.appendLshIndex(reinsert, "vec_id", "embedding", root)
      val afterReinsert = pairs(Similarity.probeLshIndex(spark, root, "vec_id",
        "embedding", query, "embedding", k = 10))
      assert(afterReinsert.map(_._1).contains(victims.head),
        s"re-appended id not un-deleted: $afterReinsert")
      // compaction: generation flip, backlog applied + postings distinct
      IndexLifecycle.compactIndex(spark, root)
      assert(genNames(root).length == 1)
      val stats = IndexLifecycle.indexStats(spark, root).head()
      assert(stats.getAs[Long]("tombstones") == 0L)
      assert(stats.getAs[Double]("postings_dup_fraction") == 0.0)
      assert(pairs(Similarity.probeLshIndex(spark, root, "vec_id",
        "embedding", query, "embedding", k = 10)) == afterReinsert,
        "compaction changed probe answers")
    }
  }

  test("PQ pointer probe: resolves and answers like the plain twin") {
    val corpus = emb.localCheckpoint(true)
    val query = corpus.filter($"vec_id" === 0)
    val fixture = tmpDir("graft_ptr_pq")
    val root = s"$fixture/idx"
    val plainDir = s"$fixture/plain"
    withFake(new ForbiddenRenameIo(fixture)) {
      Quantize.buildPqIndex(corpus, "vec_id", "embedding", plainDir, m = 4)
      IndexLifecycle.buildIndexGeneration(spark, root) { gen =>
        Quantize.buildPqIndex(corpus, "vec_id", "embedding", gen, m = 4)
      }
      assert(
        pairs(Quantize.probePqIndex(spark, root, "vec_id", "embedding",
          query, "embedding", k = 10)) ==
        pairs(Quantize.probePqIndex(spark, plainDir, "vec_id", "embedding",
          query, "embedding", k = 10)))
    }
  }

  test("zombie fence covers the pointer commit: a taken-over writer aborts BEFORE flipping") {
    val corpus = emb.limit(50).localCheckpoint(true)
    val fixture = tmpDir("graft_ptr_zombie")
    val root = s"$fixture/idx"
    IndexLifecycle.buildIndexGeneration(spark, root) { gen =>
      Ivf.buildIndex(corpus, "vec_id", "embedding", gen, maxIter = 2)
    }
    val committedBefore = IndexLifecycle.resolvePointer(spark, root)
    val lock = new java.io.File(IndexLifecycle.lockPath(root))
    val boom = intercept[IllegalStateException] {
      IndexLifecycle.withIndexLock(spark, root, "zombieCompact") {
        // simulate a takeover landing mid-verb: the lock now carries a
        // DIFFERENT holder's token
        val w = new java.io.FileWriter(lock)
        try w.write("newHolder 0 other-token\n") finally w.close()
        IndexLifecycle.compactIndexInner(spark, root, maxFilesPerCell = 0)
      }
    }
    assert(boom.getMessage.contains("taken over"),
      s"wrong failure: ${boom.getMessage}")
    // the fence sits between the generation WRITE (an invisible orphan —
    // harmless, GC'd by the next flip) and the COMMIT: the committed
    // world must be untouched
    assert(IndexLifecycle.resolvePointer(spark, root) == committedBefore,
      "a taken-over writer still flipped the pointer")
    // clean up the fake lock so later suites can take the path over
    lock.delete()
  }

  test("an UNCOMMITTED generation write does not perturb probes (epoch keys on commits only)") {
    // r20 review: a long rebuild writes artifacts into its staging
    // generation for minutes — if the root epoch included gen-* dirs,
    // every such write would spuriously retry live probes and burn the
    // budget on a committed world that never changed
    val fixture = tmpDir("graft_ptr_epoch")
    val root = s"$fixture/art.parquet"
    IndexLifecycle.initPointerRoot(spark, root)
    IndexLifecycle.swapInParquet(spark, root)(spark.range(0, 50).toDF("id"))
    var invocations = 0
    val out = IndexLifecycle.fencedProbeResolved(spark, root) { phys =>
      invocations += 1
      val ids = spark.read.parquet(phys).as[Long].collect().toSet
      // an in-flight writer lands a FULL but uncommitted generation
      // while this probe is mid-body — staging, not a new world
      spark.range(500, 550).toDF("id").write.mode("overwrite")
        .parquet(s"$root/gen-staging99")
      ids
    }
    assert(invocations == 1,
      s"an uncommitted generation write retried the probe ($invocations runs) — " +
        "the epoch must key on commit files only")
    assert(out == (0L until 50L).toSet)
  }

  test("flip GC reclaims orphaned gen-*.__lock files; a live generation keeps its lock (ADVICE r20)") {
    // a build that crashed inside buildIndexGeneration leaves its
    // generation's sibling lock behind — before this fix every sweep
    // skipped `.__` names, so each crash leaked one lock file forever
    val fixture = tmpDir("graft_ptr_lockgc")
    val root = s"$fixture/idx"
    IndexLifecycle.buildIndexGeneration(spark, root) { gen =>
      Ivf.buildIndex(emb.localCheckpoint(true), "vec_id", "embedding",
        gen, maxIter = 5); ()
    }
    // plant: a lock with NO generation (crash before any artifact), a
    // crashed build's orphan generation WITH its lock, and a crashed
    // TAKEOVER's guard file (r21 review: the guard leaks the same way)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$root/gen-dead.__lock"))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$root/gen-dead.__lock.__takeover"))
    spark.range(0, 5).toDF("id").write.parquet(s"$root/gen-orphan/x.parquet")
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$root/gen-orphan.__lock"))
    // next flip: gc sweeps stale generations AND their/now-dirless locks
    IndexLifecycle.rebuildIndex(spark, root)
    val names = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(!names.contains("gen-dead.__lock") &&
      !names.contains("gen-dead.__lock.__takeover"),
      "a lock/guard with no generation survived the flip GC")
    assert(!names.contains("gen-orphan.__lock") && !names.contains("gen-orphan"),
      s"a crashed build's orphan generation or its lock survived: $names")
    val gens = names.filter(n => n.startsWith("gen-") && !n.contains(".__"))
    assert(gens.size == 1, s"expected exactly the live generation: $names")
    // the live world still answers
    val q = emb.filter($"vec_id" === 0)
    assert(Ivf.probeIndex(spark, root, "vec_id", "embedding",
      q, "embedding", k = 5).count() == 5L)
  }

  test("the mid-probe tombstone fence is NAME-keyed: a removeIds changes the nested root's commit-file listing (object-store-valid signal)") {
    // r21 review: the generation-listing fence rides POSIX parent-dir
    // mtime bumps, which copy+delete object stores don't provide — the
    // fence arm that must hold THERE is the nested deletes.parquet
    // pointer root's epoch, which dirEpoch keys on immutable commit FILE
    // NAMES. Pin that the names themselves change across a removeIds, so
    // the signal never depends on mtime semantics.
    val corpus = emb.localCheckpoint(true)
    val root = s"${tmpDir("graft_ptr_tombname")}/idx"
    IndexLifecycle.buildIndexGeneration(spark, root) { gen =>
      Ivf.buildIndex(corpus.filter($"vec_id" =!= 0), "vec_id", "embedding",
        gen, maxIter = 5); ()
    }
    val phys = IndexLifecycle.resolveIndexDir(spark, root)
    val before = IndexLifecycle.dirEpoch(spark, s"$phys/deletes.parquet")
      .map(_._1).toSet
    IndexLifecycle.removeIds(spark, root,
      corpus.filter($"vec_id" === 1).select("vec_id"), "vec_id")
    val after = IndexLifecycle.dirEpoch(spark, s"$phys/deletes.parquet")
      .map(_._1).toSet
    assert(before != after,
      s"the nested tombstone root's NAME listing did not change across a " +
        s"removeIds — the object-store fence arm would be blind: $before vs $after")
    // a second flip changes the names again (commit seq advances)
    IndexLifecycle.removeIds(spark, root,
      corpus.filter($"vec_id" === 2).select("vec_id"), "vec_id")
    val after2 = IndexLifecycle.dirEpoch(spark, s"$phys/deletes.parquet")
      .map(_._1).toSet
    assert(after != after2, "a second tombstone flip did not advance the commit names")
  }

  test("initPointerRoot refuses a root already holding plain artifacts (migration footgun)") {
    val dir = tmpDir("graft_ptr_mig")
    val live = s"$dir/idx"
    spark.range(0, 10).toDF("id").write.parquet(s"$live/invfile.parquet")
    val boom = intercept[IllegalArgumentException] {
      IndexLifecycle.buildIndexGeneration(spark, live) { gen =>
        spark.range(0, 10).toDF("id").write.parquet(s"$gen/invfile.parquet")
      }
    }
    assert(boom.getMessage.contains("invfile.parquet") &&
      boom.getMessage.contains("NEW pointer root"),
      s"wrong failure: ${boom.getMessage}")
    // the refused marking left the plain artifacts readable
    assert(spark.read.parquet(s"$live/invfile.parquet").count() == 10L)
  }

  test("compaction DROPS a committed-empty tombstone root instead of taxing every probe forever") {
    val corpus = emb.localCheckpoint(true)
    val query = corpus.filter($"vec_id" === 0)
    val fixture = tmpDir("graft_ptr_emptytomb")
    val root = s"$fixture/idx"
    IndexLifecycle.buildIndexGeneration(spark, root) { gen =>
      Ivf.buildIndex(corpus, "vec_id", "embedding", gen, maxIter = 5); ()
    }
    val victims = corpus.filter($"vec_id" =!= 0).limit(3)
      .select("vec_id", "embedding").localCheckpoint(true)
    IndexLifecycle.removeIds(spark, root, victims.select("vec_id"), "vec_id")
    // re-append every victim: undeleteTombstones commits an EMPTY set
    Ivf.appendIndex(victims, "vec_id", "embedding", root)
    val phys = IndexLifecycle.resolveIndexDir(spark, root)
    assert(IndexLifecycle.isPointerRoot(spark, s"$phys/deletes.parquet"),
      "fixture broken: no tombstone root to drop")
    assert(IndexLifecycle.loadTombstones(spark, phys).exists(_.count() == 0L),
      "fixture broken: tombstone set not empty")
    val before = pairs(Ivf.probeIndex(spark, root, "vec_id", "embedding",
      query, "embedding", k = 10))
    val gensBefore = genNames(root)
    IndexLifecycle.compactIndex(spark, root)
    assert(!new java.io.File(s"$phys/deletes.parquet").exists(),
      "committed-empty tombstone root survived compaction")
    assert(genNames(root) == gensBefore,
      "dropping an empty tombstone root must not churn a full generation")
    assert(pairs(Ivf.probeIndex(spark, root, "vec_id", "embedding",
      query, "embedding", k = 10)) == before)
  }

  test("fencedProbeResolved re-resolves across a concurrent flip: one world, never mixed") {
    val fixture = tmpDir("graft_ptr_flip")
    val root = s"$fixture/art.parquet"
    IndexLifecycle.initPointerRoot(spark, root)
    IndexLifecycle.swapInParquet(spark, root)(spark.range(0, 50).toDF("id"))
    var invocations = 0
    val out = IndexLifecycle.fencedProbeResolved(spark, root) { phys =>
      invocations += 1
      val ids = spark.read.parquet(phys).as[Long].collect().toSet
      if (invocations == 1)
        // a maintenance flip lands AFTER this probe read its artifacts:
        // the post-body fence must reject the stale world and retry
        IndexLifecycle.swapInParquet(spark, root)(
          spark.range(100, 150).toDF("id"))
      ids
    }
    assert(invocations == 2,
      s"probe straddling a flip should retry exactly once, ran $invocations")
    assert(out == (100L until 150L).toSet,
      "the retried probe must serve exactly the post-flip world")
  }
}
