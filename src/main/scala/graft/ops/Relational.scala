package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational composites (SURVEY.md §2 C5, C10): operators Spark lacks as
  * single calls, assembled from built-ins so Catalyst still owns the
  * physical strategy.
  */
object Relational {

  /** Row-count gate that hands the SMALL arm its rows: one `take(limit+1)`
    * action; `Some(rows)` iff the frame proved ≤ `limit` — the caller then
    * builds a [[localFrame]] and skips the eager localCheckpoint + count
    * pair the gate previously paid PLUS the distributed broadcast-collect
    * the final plan would pay to ship the same rows (guide §1.2: fewer
    * sequential driver actions; PERF.md finding 21's local-relation
    * posture generalized to measured-small frames). `None` past the gate:
    * the caller takes its distributed fallback and re-derives the frame —
    * one extra pass over the gate INPUT on that arm, which every caller
    * documents (the inputs are already-materialized checkpoints or frames
    * whose past-gate shuffle join dominates the re-aggregation, and the
    * arm only exists past `limit` distinct gate rows). take(), never
    * collect(): the guard must fail before materializing an unbounded
    * frame on the driver (the k-bounded-guard rule). NOT for byte-gated
    * string tables ([[graft.ops.Text.broadcastableVocab]]): their gate
    * exists to REJECT oversized payloads without collecting them. */
  private[graft] def collectUnderGate(df: DataFrame,
                                      limit: Long): Option[Array[org.apache.spark.sql.Row]] =
    if (limit < 0L) None
    else {
      // take() needs an Int; a limit past Int.MaxValue clamps — any frame
      // the clamped take still exhausts is under the caller's limit too,
      // and one it can't exhaust would also blow the 512M-row broadcast
      // cap on the arm this gate selects, so the distributed arm is right
      val eff = math.min(limit, Int.MaxValue - 2L).toInt
      val head = df.take(eff + 1)
      if (head.length <= eff && head.length <= limit) Some(head) else None
    }

  /** The collected gate rows as a local relation (no job to build, no job
    * to broadcast — the rows are already on the driver). */
  private[graft] def localFrame(df: DataFrame,
                                rows: Array[org.apache.spark.sql.Row],
                                schema: org.apache.spark.sql.types.StructType): DataFrame =
    df.sparkSession.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  /** C5: as-of join — for each left row, the single most recent right row
    * with `rightTime <= leftTime`, matched on an equality key.
    *
    * Implementation: equi-join on the key (shuffle/broadcast chosen by
    * Catalyst) restricted by the time inequality, then a per-left-row
    * window keeps the latest match (deterministic tie-break on
    * `rightTieBreak`). The equi-key keeps it a hash join — never a pure
    * range/BNL join — so it scales with the key cardinality. For a
    * time-series-dense right side the scale refinement is bucketing both
    * sides by key (co-located join) which this plan picks up for free.
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               leftIdCol: String, rightTieBreak: String): DataFrame = {
    val joined = left.join(
      right,
      left(leftKey) === right(rightKey) && right(rightTime) <= left(leftTime),
      "inner"
    )
    // "latest right row per left row" as ONE hash aggregate (max_by over a
    // lexicographic (time, tie-break) struct) — partial aggregation folds
    // most candidates map-side, where the window formulation would shuffle
    // every joined candidate and sort each partition
    val best = max_by(
      struct(right.columns.map(right(_)).toIndexedSeq: _*),
      struct(right(rightTime), right(rightTieBreak))
    ).as("__best")
    val carriedNames = left.columns.filterNot(_ == leftIdCol).toIndexedSeq
    val carried = carriedNames.map(c => first(left(c)).as(c))
    joined
      .groupBy(left(leftIdCol))
      .agg(best, carried: _*)
      .select(col(leftIdCol) +: carriedNames.map(col) :+ col("__best.*"): _*)
  }

  /** C10: per-group top-k, the window+filter idiom (rank pushes the filter
    * into `WindowGroupLimit` in Spark 4 — per-partition heaps, no full
    * per-group sort materialization). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderBy: Seq[Column], k: Int, rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Distributed prefix (running) sum of `valueCol` in `orderCol` order.
    *
    * The naive `Window.orderBy(x)` with no partition spec plans an
    * `Exchange SinglePartition` — the WHOLE dataset funnels through one
    * task, the canonical scale cliff for running totals. This is the
    * textbook two-phase parallel scan instead:
    *  1. range-partition by `orderCol` (equal keys co-located, ranges
    *     ordered across partitions) and compute the running sum WITHIN
    *     each partition, windowed on the physical partition id — fully
    *     parallel;
    *  2. per-partition totals (numPartitions rows, ≪ data) get their own
    *     tiny running sum — the only single-partition window, over ~32
    *     rows — and join back as broadcast starting offsets.
    *
    * That phase-2 window IS Spark's "No Partition Defined for Window"
    * warning in bench/verify logs: harmless here by construction (the
    * frame is at most `numPartitions` rows), silenced in the Bench main.
    *
    * `alias` = inclusive running sum (ties share a value via the default
    * RANGE frame, same as SQL window semantics). */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
                alias: String, numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // localCheckpoint: the ranged frame feeds both the per-partition scan
    // and the totals aggregate; partition ids must also be STABLE across
    // the two reads (spark_partition_id is plan-dependent otherwise)
    val ranged = df.repartitionByRange(parts, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val local = ranged.withColumn("__local",
      sum(col(valueCol)).over(Window.partitionBy("__pid").orderBy(orderCol)))
    val offsets = ranged.groupBy("__pid").agg(sum(col(valueCol)).as("__ptotal"))
    val off = offsets.withColumn("__offset",
      coalesce(sum(col("__ptotal")).over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__pid"), col("__offset"))
    local.join(broadcast(off), Seq("__pid"))
      .withColumn(alias, col("__local") + col("__offset"))
      .drop("__pid", "__local", "__offset")
  }

  /** Distributed global `row_number` over a TOTAL order — the rank
    * companion to [[prefixSum]], same two-phase shape:
    *  1. range-partition by `orderCols` (ranges ordered across
    *     partitions) and `row_number` WITHIN each partition — fully
    *     parallel;
    *  2. per-partition row counts (≤ numPartitions rows) get starting
    *     offsets via the one tiny single-partition window, broadcast-join
    *     back; global rank = offset + local rank.
    *
    * The naive `row_number().over(Window.orderBy(...))` plans an
    * `Exchange SinglePartition` that funnels the WHOLE dataset through one
    * task (the perplexity-tercile rank's original hazard).
    * `orderCols` must be a total order (include a unique id as the
    * last key) — then the rank is deterministic and identical to the
    * naive form for ANY range-boundary placement, because ranges are
    * ordered and each row's rank = rows in earlier ranges + its local
    * rank. RelationalSpec pins equality with the naive window form;
    * PlanShapeSpec pins that no corpus-sized exchange is SinglePartition. */
  def globalRank(df: DataFrame, orderCols: Seq[Column], alias: String,
                 numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // localCheckpoint: the ranged frame feeds both the local rank and the
    // counts aggregate, and spark_partition_id must be STABLE across reads
    val ranged = df.repartitionByRange(parts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val local = ranged.withColumn("__lrn",
      row_number().over(Window.partitionBy("__pid").orderBy(orderCols: _*)))
    val counts = ranged.groupBy("__pid").agg(count(lit(1)).as("__c"))
    val off = counts.withColumn("__offset",
      coalesce(sum(col("__c")).over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__pid"), col("__offset"))
    local.join(broadcast(off), Seq("__pid"))
      .withColumn(alias, col("__offset") + col("__lrn"))
      .drop("__pid", "__lrn", "__offset")
  }

  /** Distributed PER-GROUP `row_number` — [[globalRank]] generalized to a
    * rank within each `groupCols` value, without the
    * `Window.partitionBy(group)` single-task-per-group funnel (a 50 TB
    * dominant group would sort on one executor). Same two-phase shape:
    *  1. range-partition by (group, order) — each group spans a run of
    *     ordered partitions, skew bounded by the range partitioner, not
    *     by the largest group — and `row_number` within
    *     (partition, group): fully parallel;
    *  2. per-(partition, group) counts (≤ partitions × groups rows) get
    *     per-group starting offsets via a tiny window partitioned by
    *     group, broadcast-joined back; rank = offset + local rank.
    * (order must be total within a group — include a unique id.) This is
    * [[datasetMix]]'s rank phase, extracted: mix = groupedRank by source
    * filtered to the quota. */
  def groupedRank(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
                  alias: String, numPartitions: Int = 0,
                  offsetBroadcastLimit: Long = Dedup.HotShingleBroadcastLimit): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // localCheckpoint: the ranged frame feeds the local rank AND the count
    // aggregate, and spark_partition_id must be stable across both reads
    val ranged = df.repartitionByRange(parts, groupCols.map(col) ++ orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val keys = col("__pid") +: groupCols.map(col)
    val local = ranged.withColumn("__lrn",
      row_number().over(Window.partitionBy(keys: _*).orderBy(orderCols: _*)))
    val counts = ranged.groupBy(keys: _*).agg(count(lit(1)).as("__c"))
    // The offsets frame scales with partitions × |groups| — low-cardinality
    // for language/source callers, but nothing here assumes that: a
    // high-cardinality group column falls back to a distributed join on
    // the same (pid, group) keys instead of an unbounded broadcast.
    // Under the gate (r22): the per-group starting offsets are cumulative
    // INTEGER sums of the collected counts in __pid order — computed on
    // the driver and shipped as a local relation, which replaces the
    // eager checkpoint + count gate pair and the tiny offsets window with
    // ONE take action (pure integer arithmetic, bit-identical to the
    // window form; RelationalSpec pins both arms against the naive
    // per-group window). Past the gate the counts aggregate runs once
    // more inside the checkpoint — one extra pass over the CACHED ranged
    // blocks, on an arm that only exists past `offsetBroadcastLimit`
    // distinct (pid, group) rows where the rank's own shuffle dominates.
    val joined = collectUnderGate(counts, offsetBroadcastLimit) match {
      case Some(rows) =>
        val nGroup = groupCols.size
        val acc = scala.collection.mutable.HashMap.empty[IndexedSeq[Any], Long]
        val offRows = rows.sortBy(_.getInt(0)).map { r =>
          val g = (1 to nGroup).map(r.get).toIndexedSeq
          val off = acc.getOrElse(g, 0L)
          acc(g) = off + r.getLong(nGroup + 1)
          org.apache.spark.sql.Row.fromSeq(r.toSeq.dropRight(1) :+ off)
        }
        val schema = org.apache.spark.sql.types.StructType(
          counts.schema.fields.dropRight(1) :+
            org.apache.spark.sql.types.StructField("__offset",
              org.apache.spark.sql.types.LongType, nullable = false))
        local.join(broadcast(localFrame(counts, offRows, schema)),
          "__pid" +: groupCols)
      case None =>
        val cnts = counts.localCheckpoint(true) // feeds the offsets window + join
        val off = cnts.withColumn("__offset",
          coalesce(sum(col("__c")).over(
            Window.partitionBy(groupCols.map(col): _*).orderBy("__pid")
              .rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
          .select(keys :+ col("__offset"): _*)
        local.join(off.hint("SHUFFLE_HASH"), "__pid" +: groupCols)
    }
    joined
      .withColumn(alias, col("__offset") + col("__lrn"))
      .drop("__pid", "__lrn", "__offset")
  }

  /** Sequence packing for LLM training (concat-and-chunk): concatenate
    * documents in `idCol` order and cut the stream into fixed
    * `budget`-token sequences. Each doc gets the sequence id and offset
    * where it STARTS — exactly the bookkeeping a packed-pretraining
    * pipeline materializes. Built on [[prefixSum]], so it scales without
    * a single-task global window. */
  def packSequences(docs: DataFrame, idCol: String, tokenCount: Column,
                    budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val withN = docs.select(col(idCol), tokenCount.cast("long").as("n_tokens"))
    prefixSum(withN, idCol, "n_tokens", "__cum")
      .withColumn("__before", col("__cum") - col("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        // integer `div`, not `/`: float division + cast loses exactness
        // once cumulative token counts pass 2^53
        expr(s"__before div $budget").as("seq_id"),
        (col("__before") % budget).cast("long").as("seq_offset"))
  }

  /** Deterministic dataset mixing: fill a per-source quota in `orderCol`
    * order — the exact, auditable variant of proportional sampling for
    * assembling a training mix (seeded `sampleBy` is the statistical
    * cousin; this one is reproducible row-for-row, the property you want
    * when a mix must be re-derived bit-identically). Quotas ride in as a
    * broadcast frame.
    *
    * The obvious `row_number().over(Window.partitionBy(source))` form
    * funnels EACH source through one task — a 50 TB dominant source sorts
    * on a single executor — and because the
    * quota is a *column*, Spark 4's WindowGroupLimit (literal limits only)
    * can't rescue it. Instead, [[groupedRank]] — the [[prefixSum]]
    * two-phase rank applied per source:
    *  1. range-partition by (source, order) — each source spans a run of
    *     ordered partitions — and `row_number` within (partition, source):
    *     fully parallel, skew bounded by the range partitioner, not by the
    *     largest source;
    *  2. per-(partition, source) counts (≤ partitions × sources rows) get
    *     per-source starting offsets via a tiny window partitioned by
    *     source, broadcast-joined back; global rank = offset + local rank.
    */
  def datasetMix(docs: DataFrame, sourceCol: String, orderCol: String,
                 quotas: Map[String, Int]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qdf = broadcast(quotas.toSeq.toDF(sourceCol, "__quota"))
    // quota join first: sources outside the mix never enter the shuffle
    groupedRank(docs.join(qdf, Seq(sourceCol)),
        Seq(sourceCol), Seq(col(orderCol)), "__grn")
      .filter(col("__grn") <= col("__quota"))
      .drop("__grn", "__quota")
  }

  /** The shared membership predicate behind [[hashSplit]] and
    * [[stratifiedHashSample]] — one definition, so the two oracle-checked
    * surfaces cannot drift apart. Lexicographic order on fixed-length
    * lowercase hex IS numeric order, so `frac` maps to round(frac·65536)
    * as a 4-digit hex literal — 16-bit granularity ⇒ frac honored to
    * ±1/65536 (nearest-bucket ROUNDING, not floor — reproduce oracle
    * constants accordingly). frac = 1.0 rounds to 65536 = "10000",
    * 5 hex digits, which sorts BELOW "ffff" lexicographically — hence
    * the literal-true short-circuit instead of a string compare. */
  private def md5Below(idCol: String, frac: Double): Column = {
    val t = math.round(frac * 65536).toInt
    if (t >= 65536) lit(true)
    else substring(md5(col(idCol).cast("string")), 1, 4) < lit(f"$t%04x")
  }

  /** Deterministic content-stable train/val split — the reproducible way
    * to split a training corpus: bucket by a cryptographic hash of the
    * id, never by position or RNG, so membership survives reorderings,
    * re-partitioning, and incremental corpus growth (a doc's split never
    * flips when new docs arrive — the property rand()-with-seed lacks).
    *
    * The assignment compares the first 4 hex chars of md5(id) against a
    * fixed threshold ([[md5Below]]): a pure codegen projection, zero
    * shuffle, and the SAME expression is portable SQL (the DuckDB oracle
    * runs it verbatim). */
  def hashSplit(df: DataFrame, idCol: String, trainFrac: Double,
                splitCol: String = "split"): DataFrame = {
    require(trainFrac >= 0.0 && trainFrac <= 1.0, s"bad trainFrac $trainFrac")
    df.withColumn(splitCol,
      when(md5Below(idCol, trainFrac), "train").otherwise("val"))
  }

  /** Deterministic epoch shuffle — the reproducible training-data
    * ordering: every row keyed by md5(id ":" seed), so the same
    * (corpus, seed) yields the SAME order on any cluster size, partition
    * count, or input file layout (the property partition-order and
    * RNG-based shuffles lack — `orderBy(rand(seed))` changes with the
    * physical row order feeding it), while each epoch's seed reshuffles
    * independently and uncorrelated (avalanche). The fixed-length hex
    * digest makes lexicographic order total; `idCol` breaks the
    * astronomically-unlikely digest tie. A pure codegen projection —
    * consumers choose the sort shape: a bounded epoch HEAD plans as
    * `TakeOrderedAndProject` (per-partition heaps, no global sort), a
    * full-epoch write is one range-partitioned sort, the thing an epoch
    * is by definition. Portable SQL: the oracle runs the same md5
    * verbatim. */
  def epochShuffle(df: DataFrame, idCol: String, seed: Long,
                   keyCol: String = "epoch_key"): DataFrame =
    df.withColumn(keyCol,
      md5(concat(col(idCol).cast("string"), lit(":" + seed))))

  /** Per-stratum content-stable sampling — [[hashSplit]] generalized to a
    * fraction PER GROUP (the training-data use: downsample dominant
    * classes/languages/sources to target fractions). Same mechanism
    * ([[md5Below]]): keep a row iff the first 4 hex chars of md5(id) sit
    * below the stratum's threshold. Deterministic and content-stable
    * (membership survives reordering, re-partitioning, and corpus
    * growth — the property seeded `sampleBy` lacks: its kept set is a
    * function of partition iteration order at execution time, so the
    * "same" sample differs across layouts). Rows whose stratum has no
    * entry are dropped, mirroring `sampleBy`.
    *
    * Scale shape: a pure codegen filter projection — ZERO shuffle, no
    * per-stratum state — and the predicate is portable SQL, so an oracle
    * runs the IDENTICAL expression (the hashSplit pattern that converts
    * rows-only entries to hash-checked ones). */
  def stratifiedHashSample(df: DataFrame, stratumCol: String, idCol: String,
                           fracs: Map[String, Double]): DataFrame = {
    require(fracs.nonEmpty, "need at least one stratum fraction")
    require(fracs.values.forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0,1]: $fracs")
    val cond = fracs.toSeq.sortBy(_._1).map { case (s, f) =>
      col(stratumCol) === s && md5Below(idCol, f)
    }.reduce(_ || _)
    df.filter(cond)
  }

  /** Temperature-scaled stratum sampling at α = 0.5 — the multilingual
    * rebalancing rule (Conneau et al. XLM-R, arXiv:1911.02116 §3.1:
    * sample language l with q_l ∝ p_l^α): dominant strata are
    * downsampled, rare strata kept, so expected kept counts go as
    * √(c_l) instead of c_l. Rates are anchored to the LARGEST stratum
    * (it keeps exactly `baseFrac`): rate_l = min(1, baseFrac·√(c_max/c_l)),
    * which is q ∝ p^0.5 re-expressed without the cross-stratum
    * normalization sum — deliberately, because every surviving operation
    * (integer counts, correctly-rounded IEEE ÷ and √, ×2⁻¹, ×2¹⁶) is
    * bit-reproducible in ANY engine, so a DuckDB oracle recomputes the
    * exact same per-stratum thresholds from the data. A Σ p_l^α
    * normalizer would hang determinism on summation order; α ≠ 0.5
    * would hang it on `pow`, which IEEE does NOT require correctly
    * rounded — √ it does. Membership itself is the [[md5Below]] rule
    * evaluated against the per-stratum threshold (content-stable: a
    * doc's fate never flips under re-layout; it CAN flip under corpus
    * growth since rates are corpus-derived — pin rates for perfect
    * incremental stability, which is [[stratifiedHashSample]]).
    *
    * Scale shape: one partial+final count aggregate over the stratum
    * column (map-side-folding, |strata| rows), then the rate frame joins
    * back — count-gated broadcast with a SHUFFLE_HASH fallback past
    * `rateBroadcastLimit` (strata are languages/sources in practice, but
    * nothing here assumes the column is low-cardinality). The filter is
    * codegen; the corpus never shuffles on the broadcast path. */
  def temperatureSample(df: DataFrame, stratumCol: String, idCol: String,
                        baseFrac: Double = 0.5,
                        rateBroadcastLimit: Long = Dedup.HotShingleBroadcastLimit): DataFrame = {
    require(baseFrac > 0.0 && baseFrac <= 1.0, s"bad baseFrac $baseFrac")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__c"))
    // the per-stratum threshold expression — ONE definition for both gate
    // arms, evaluated IN-PLAN on both (the float surface — ÷, √, round —
    // stays Spark's own; only the SOURCE of cmax differs: an integer max
    // over collected longs under the gate, the same max as an aggregate
    // past it — identical long, identical cast, identical IEEE ops)
    def thrFrom(cnts: DataFrame, cmaxCol: Column): DataFrame = cnts
      .select(col(stratumCol),
        round(least(lit(1.0),
          lit(baseFrac) * sqrt(cmaxCol.cast("double") / col("__c"))) * 65536, 0)
          .cast("long").as("__thr"))
    // Under the gate (r22): collect the |strata| counts in one take action
    // and build the rate table over a local relation — replaces the eager
    // checkpoint + count pair and the broadcast 1-row max subquery. Past
    // the gate (> rateBroadcastLimit strata) the counts aggregate runs
    // once more into the checkpoint — one extra pass over `df`, on an arm
    // where the corpus-sized SHUFFLE_HASH rate join dominates it.
    val joined = collectUnderGate(counts, rateBroadcastLimit) match {
      case Some(rows) =>
        val cIdx = counts.schema.fieldIndex("__c")
        val cmaxV = rows.foldLeft(0L)((m, r) => math.max(m, r.getLong(cIdx)))
        val thr = thrFrom(localFrame(counts, rows, counts.schema), lit(cmaxV))
        df.join(broadcast(thr), Seq(stratumCol))
      case None =>
        val cnts = counts.localCheckpoint(true) // feeds the max AND the join
        val thr = thrFrom(
          cnts.crossJoin(broadcast(cnts.agg(max(col("__c")).as("__cmax")))),
          col("__cmax"))
        df.join(thr.hint("SHUFFLE_HASH"), Seq(stratumCol))
    }
    joined
      .filter(col("__thr") >= 65536 ||
        substring(md5(col(idCol).cast("string")), 1, 4) < format_string("%04x", col("__thr")))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Interval-overlap join (genomics' bread-and-butter: features × reads,
    * genes × regulatory regions) over half-open intervals [start, end):
    * overlap iff aStart < bEnd AND bStart < aEnd.
    *
    * The naive formulation is a cross/nested-loop join with a theta
    * predicate — O(n·m) comparisons, the BNLJ cliff. Here each interval
    * explodes into the fixed-width BINS it touches and the join is an
    * equi-join on bin (hash-partitioned, near-linear): only intervals
    * sharing a bin are ever compared. Duplicate pair emission (a pair can
    * co-occupy many bins) is eliminated WITHOUT a dropDuplicates shuffle
    * by the first-bin rule: a pair reports only from the bin containing
    * `greatest(aStart, bStart)` — exactly one bin per overlapping pair.
    * `binWidth` tunes bins-per-interval (≈ interval length / binWidth + 1
    * replicas per row) against candidates-per-bin; SHUFFLE_HASH pinned
    * (bin counts are Zipf-ish and the exploded sides are expensive to
    * sort). */
  def intervalJoin(a: DataFrame, b: DataFrame,
                   aId: String, aStart: String, aEnd: String,
                   bId: String, bStart: String, bEnd: String,
                   binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, id: String, s: String, e: String, p: String) =
      df.select(col(id).as(s"${p}_id"),
          col(s).cast("long").as(s"${p}_start"), col(e).cast("long").as(s"${p}_end"))
        .where(col(s"${p}_start") < col(s"${p}_end")) // empty intervals match nothing
        .select(col(s"${p}_id"), col(s"${p}_start"), col(s"${p}_end"),
          explode(sequence(floor(col(s"${p}_start") / binWidth),
            // end is exclusive: an interval ending ON a bin boundary does
            // not touch that bin
            floor((col(s"${p}_end") - 1) / binWidth))).as("bin"))
    binned(a, aId, aStart, aEnd, "a")
      .join(binned(b, bId, bStart, bEnd, "b").hint("SHUFFLE_HASH"), Seq("bin"))
      .filter(col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .filter(col("bin") === floor(greatest(col("a_start"), col("b_start")) / binWidth))
      .select(col("a_id"), col("b_id"),
        (least(col("a_end"), col("b_end")) -
          greatest(col("a_start"), col("b_start"))).as("overlap_len"))
  }

  /** Nearest-feature join (bedtools `closest` with a search window): for
    * each half-open interval in `a`, the nearest interval in `b` within
    * `maxDist` (distance 0 when overlapping, else the gap), deterministic
    * tie-break on the lower b id.
    *
    * Scale shape: `a` expands by `maxDist` on both sides and goes through
    * the same binned equi-join as [[intervalJoin]] (first-bin dedup, no
    * nested loop), then ONE hash aggregate (min_by over a (dist, b_id)
    * struct — partial aggregation folds candidates map-side) picks the
    * winner per `a` row, exactly the [[asOfJoin]] reduction. Unbounded
    * nearest needs iterative widening — a windowed search is what the
    * genomics tools expose, and it bounds candidates per row. */
  def nearestIntervalJoin(a: DataFrame, b: DataFrame,
                          aId: String, aStart: String, aEnd: String,
                          bId: String, bStart: String, bEnd: String,
                          maxDist: Long, binWidth: Long): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    // expanded a-intervals overlap b iff dist(a, b) < maxDist... using
    // [s - maxDist, e + maxDist) makes gap <= maxDist - 1? No: expansion
    // by maxDist catches every b with gap <= maxDist (half-open math:
    // gap = b_start - a_end; overlap of expansion iff b_start < a_end +
    // maxDist, i.e. gap < maxDist... so expand by maxDist + 1 to include
    // gap == maxDist exactly)
    val expanded = a.select(col(aId).as("a_id"),
      col(aStart).cast("long").as("a_start"), col(aEnd).cast("long").as("a_end"))
    val cand = intervalJoin(
      expanded.select(col("a_id"), (col("a_start") - maxDist - 1).as("s"),
        (col("a_end") + maxDist + 1).as("e")),
      b, "a_id", "s", "e", bId, bStart, bEnd, binWidth)
      .select(col("a_id"), col("b_id"))
      .join(expanded, Seq("a_id"))
      .join(b.select(col(bId).as("b_id"), col(bStart).cast("long").as("b_start"),
        col(bEnd).cast("long").as("b_end")), Seq("b_id"))
    val dist = greatest(lit(0L),
      greatest(col("b_start") - col("a_end"), col("a_start") - col("b_end")))
    cand
      .withColumn("__dist", dist)
      .filter(col("__dist") <= maxDist)
      .groupBy(col("a_id"))
      .agg(min_by(struct(col("b_id"), col("__dist")), struct(col("__dist"), col("b_id")))
        .as("__best"))
      .select(col("a_id"), col("__best.b_id").as("b_id"), col("__best.__dist").as("dist"))
  }

  /** Skew-resistant two-phase aggregation for decomposable aggregates
    * (sum/count/min/max): phase 1 aggregates (key, salt) — a hot key's
    * rows spread over `saltBuckets` reducers — phase 2 merges the salted
    * partials per key. AQE's skew handling covers joins but NOT
    * aggregations; this is the manual idiom for power-law keys (user ids,
    * tokens) at the 100 TB end. Aggregate specs: (alias, partial agg on
    * the raw column expr, final merge on the partial). */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], saltBuckets: Int,
                aggs: Seq[(String, Column => Column, Column => Column)],
                valueCols: Seq[String]): DataFrame = {
    require(aggs.length == valueCols.length)
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(
        aggs.head._2(col(valueCols.head)).as(s"__p0"),
        aggs.tail.zipWithIndex.map { case ((_, p, _), i) =>
          p(col(valueCols(i + 1))).as(s"__p${i + 1}")
        }: _*)
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(
        aggs.head._3(col("__p0")).as(aggs.head._1),
        aggs.tail.zipWithIndex.map { case ((name, _, f), i) =>
          f(col(s"__p${i + 1}")).as(name)
        }: _*)
  }
}
