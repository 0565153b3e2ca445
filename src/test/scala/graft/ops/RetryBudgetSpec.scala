package graft.ops

import graft.SparkSpec

/** Pins for [[IndexLifecycle.retryOnStaleFiles]]' PROGRESS-AWARE budget
  * (r19 verdict #6: the freeCap/epoch accounting landed from inspection
  * — these pins reproduce the scenario it exists for, deterministically:
  * a k-cell compaction advances the dir epoch k+ times, k larger than
  * the charged budget, and slow probe bodies straddle successive
  * renames).
  *
  *  - a probe that keeps racing a MUTATING verb (every failure follows
  *    an epoch advance) survives k ≫ attempts failures — the free pool
  *    absorbs steady progress instead of conflating it with futility;
  *  - a genuinely STUCK state (no epoch movement between failures)
  *    still fails after exactly `attempts` tries — the charged budget
  *    is untouched by the progress provision;
  *  - the free pool is CAPPED: a pathological always-mutating dir
  *    cannot livelock the probe — after freeCap progressed failures the
  *    charged budget resumes and the probe fails loudly. */
class RetryBudgetSpec extends SparkSpec {

  private def fixture(): String = {
    // epoch observation NEEDS a live session (retryOnStaleFiles'
    // documented degrade: absent one, failures just charge) — force the
    // lazy shared session here, or this suite running FIRST in a JVM
    // would test the chargeback path instead of the progress provision
    spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft_retry").toString
    new java.io.File(s"$dir/seed").createNewFile()
    dir
  }

  /** Advance the dir's epoch the way maintenance renames do: a new
    * direct child with a new name. */
  private def advanceEpoch(dir: String, i: Int): Unit =
    new java.io.File(s"$dir/epoch-$i").createNewFile()

  private def raceFailure(dir: String) =
    new java.io.FileNotFoundException(s"$dir/invfile.parquet/part-0 does not exist")

  test("failures that keep pace with epoch advances draw from the free pool: k=8 rounds survive attempts=4") {
    val dir = fixture()
    var calls = 0
    val out = IndexLifecycle.retryOnStaleFiles(dir, attempts = 4) {
      calls += 1
      if (calls <= 8) {
        // the compaction's next cell rename lands while this probe body
        // runs — every failure is observed AFTER fresh progress
        advanceEpoch(dir, calls)
        throw raceFailure(dir)
      }
      "served"
    }
    assert(out == "served")
    // 8 failures: the first charges (no prior epoch observation), the
    // rest ride the free pool — well past the charged budget of 3
    assert(calls == 9, s"expected 9 calls (8 races + success), got $calls")
  }

  test("a FAILED_READ_FILE under the probed dir is a recognized race shape (incl. the NO_HINT variant)") {
    // caught in the field (r20): a reader mid-file when a generation
    // flip's GC deletes it surfaces FAILED_READ_FILE.NO_HINT — a
    // generic read failure, not FILE_NOT_EXIST — which the retry
    // harness must treat as the transient maintenance race it is
    val dir = fixture()
    var calls = 0
    val out = IndexLifecycle.retryOnStaleFiles(dir, attempts = 4) {
      calls += 1
      if (calls == 1)
        throw new RuntimeException(
          s"[FAILED_READ_FILE.NO_HINT] Encountered error while reading file " +
            s"file://$dir/gen-abc/centroids.parquet/part-0.snappy.parquet.  " +
            "SQLSTATE: KD001")
      "served"
    }
    assert(out == "served" && calls == 2)
    // and the SAME shape under an UNRELATED path is a caller error, not
    // a race — no anchored retry (only the one FNFE fallback could
    // apply, and this is not an FNFE)
    var calls2 = 0
    intercept[RuntimeException] {
      IndexLifecycle.retryOnStaleFiles(dir, attempts = 4) {
        calls2 += 1
        throw new RuntimeException(
          "[FAILED_READ_FILE.NO_HINT] Encountered error while reading file " +
            "file:///somewhere/else/part-0.parquet.  SQLSTATE: KD001")
      }
    }
    assert(calls2 == 1, s"unanchored read failure was retried $calls2 times")
  }

  test("a genuinely STUCK state (no epoch movement) fails after exactly `attempts` tries") {
    val dir = fixture()
    var calls = 0
    val boom = intercept[java.io.FileNotFoundException] {
      IndexLifecycle.retryOnStaleFiles(dir, attempts = 4) {
        calls += 1
        throw raceFailure(dir)
      }
    }
    assert(boom.getMessage.contains(dir))
    assert(calls == 4,
      s"stuck probes must fail after the charged budget (4 attempts), ran $calls")
  }

  test("the free pool is capped: an always-mutating dir cannot livelock the probe") {
    val dir = fixture()
    var calls = 0
    intercept[java.io.FileNotFoundException] {
      IndexLifecycle.retryOnStaleFiles(dir, attempts = 4) {
        calls += 1
        advanceEpoch(dir, calls) // progress EVERY round, forever
        throw raceFailure(dir)
      }
    }
    // 1 charged (first failure, no prior observation) + 12 free (the
    // cap) + 2 more charged = 15 swallowed failures, the 16th throws
    assert(calls == 16,
      s"free pool must cap at 12 (1+12+2 swallowed, 16th throws), ran $calls")
  }
}
