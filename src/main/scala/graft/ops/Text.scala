package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (SURVEY.md §2 C15 + the
  * north-star text-analysis extension): tokenization, shingling, word
  * stats, language-ID heuristic, quality scoring, fingerprinting.
  *
  * All operators are pure `functions._` column expressions (whole-stage
  * codegen, no UDFs), so they vectorize inside the scan projection and
  * scale linearly with the corpus — the per-document work is embarrassingly
  * parallel and never shuffles until an explicit aggregation.
  */
object Text {

  /** Whitespace tokenization as an array column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word-level n-gram shingles (distinct), the unit for near-dup Jaccard
    * and MinHash. `transform(sequence(...))` keeps it codegen-friendly. */
  def shingles(text: Column, n: Int): Column = shinglesFromTokens(tokens(text), n)

  /** Shingles over a token array column.
    *
    * Formulated as `transform(arrays_zip(slice(ws,1,c), …, slice(ws,n,c)))`
    * rather than `transform(sequence(...), i => element_at(ws, i+o))`: a
    * subexpression inside a higher-order-function lambda is re-evaluated
    * PER ARRAY ELEMENT, so the element_at form re-splits the document
    * ~3·n times per shingle (measured 8s for 5000 docs — the whole
    * near-dup pipeline's cost). Here every `ws` reference sits at row
    * level, where whole-stage codegen's common-subexpression elimination
    * applies, and the lambda touches only the zipped struct. */
  def shinglesFromTokens(ws: Column, n: Int): Column = {
    val cnt = size(ws) - (n - 1)
    when(size(ws) >= n,
      array_distinct(
        transform(
          arrays_zip((0 until n).map(o => slice(ws, lit(o + 1), cnt)): _*),
          s => concat_ws(" ", (0 until n).map(o => s.getField(o.toString)): _*)
        )
      )
    ).otherwise(array().cast("array<string>"))
  }

  /** C15: corpus word frequencies, descending. One shuffle (the groupBy);
    * the explode is map-side. */
  def wordCount(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))

  /** BPE-ish regex tokenization: letter runs, digit runs, and
    * punctuation runs as separate tokens (the GPT-2-style pre-tokenizer
    * shape, ASCII-simplified — real BPE then merges within these spans,
    * which never changes the span boundaries this counts). Codegen
    * `regexp_extract_all`, no UDF. */
  val BpeishPattern = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]+"
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeishPattern), lit(0))

  /** Per-document token/char statistics (token counting). */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(tokens(col(textCol))).as("n_tokens"),
      length(col(textCol)).as("n_chars_measured"),
      size(array_distinct(tokens(col(textCol)))).as("n_unique_tokens")
    )

  /** Quality scoring: lexical-diversity + mean-token-length heuristics
    * (the length/punct/stopword-ratio family; this corpus is synthetic
    * lowercase words, so the informative ratios are diversity and length). */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = tokens(col(textCol))
    docs.select(
      col(idCol),
      round(size(array_distinct(ws)).cast("double") / size(ws), 4).as("lexical_diversity"),
      round((length(col(textCol)) - size(ws) + 1).cast("double") / size(ws), 4).as("avg_token_len"),
      round(
        size(filter(ws, w => w.isin("a", "the"))).cast("double") / size(ws), 4
      ).as("stopword_ratio")
    )
  }

  /** TF-IDF, pure DataFrame ops (no mllib): tf = term count / doc length,
    * idf = ln(N / df) with exact document frequencies. Two aggregates
    * (term-per-doc counts, df per term) + one join on the per-term df
    * table; the corpus-size N is a scalar literal computed once.
    *
    * The df table is vocabulary-sized, but "vocabulary ≪ corpus" fails at
    * 100 TB — a web corpus's unique-token set (typos, ids, URLs) runs
    * ~10⁹ entries, tens of GB, past any broadcast threshold. So the join
    * back is count-gated (the [[Dedup.decontaminate]] shape): at or under
    * `vocabBroadcastLimit` distinct tokens it broadcasts; past it the
    * probe is a SHUFFLE_HASH equi-join, the same plan [[bigramNll]]
    * always uses for its never-broadcastable pair table. Both paths are
    * result-identical (TextSpec pins it). */
  /** (rows, estimated MATERIALIZED broadcast bytes) of a string-keyed
    * stats table, in ONE agg job (these gates already paid a count()):
    * ~64 B/row of UnsafeRow + HashedRelation slot overhead — the
    * [[Dedup.SigTableBroadcastBytes]] accounting — plus the actual
    * string payload. PERF.md finding 37: a row-count gate sized for
    * 8-byte longs ("4M longs ≈ 32 MB") admits a 4M-row STRING vocab at
    * 10–20× the intended bytes; the x100 curation rung measured the
    * consequence (a 1313 s broadcast-probe stage, 22% GC) before the
    * byte term flipped it to the SHUFFLE_HASH plan the scale shape
    * always intended. Non-string key columns are estimated through a
    * string cast — an over-estimate, which only ever flips toward the
    * always-correct shuffle plan. Coalesce is PER COLUMN (ADVICE r19):
    * an entirely-NULL key column's sum is NULL, and a single outer
    * coalesce over the summed expression would null the WHOLE payload
    * term to 0 — silently degrading the gate to rows-only, re-admitting
    * exactly the oversized broadcast the byte term exists to reject. */
  private[ops] def tableBroadcastEstimate(df: DataFrame,
                                          strCols: Seq[String]): (Long, Long) = {
    val payload = strCols
      .map(c => coalesce(sum(octet_length(col(c).cast("string"))), lit(0L)))
      .reduce(_ + _)
    val r = df.agg(count(lit(1)), payload).head()
    val n = r.getLong(0)
    (n, n * 64L + r.getLong(1))
  }

  /** True iff a string-keyed stats table may broadcast: under the
    * caller's ROW limit (API-compat knob; 0 still forces the shuffle
    * path in specs) AND under the materialized-bytes bound. */
  private[ops] def broadcastableVocab(df: DataFrame, strCols: Seq[String],
                                      rowLimit: Long): Boolean = {
    val (n, bytes) = tableBroadcastEstimate(df, strCols)
    n <= rowLimit && bytes <= Dedup.SigTableBroadcastBytes
  }

  /** Materialize-for-reuse has a size ceiling, and a corpus-TOKEN-sized
    * frame crosses it (the finding-14/35 pattern applied to
    * checkpoints — PERF.md finding 37, the x400 rung: the eager tok
    * checkpoint was 67% of c24_curation_v7's wall at 47% GC; the frame
    * it "saves" is one codegen tokenize+explode, recomputed for ~2 s).
    * So token streams checkpoint only while the corpus's total TEXT
    * bytes (one cheap agg over the text column, paid once per call)
    * stay under this bound; past it every consumer recomputes the
    * projection — identical results, no corpus-sized write into
    * executor storage. Since r21 the corpus-BIGRAM-sized streams
    * (interpNllCore/bigramNll/bigramKnNll `pairs`, dsirScores
    * `corpusGrams`) ride the same bound — same ceiling, same remedy. */
  private[ops] val TokCheckpointTextBytes: Long = 64L << 20

  /** `frame.localCheckpoint(true)` while `docs`' total text bytes stay
    * under [[TokCheckpointTextBytes]] / `shapeFactor`; `frame` unchanged
    * (lazy, recomputed per consumer) past it. `shapeFactor = 2` for
    * PAIR-shaped frames (the bigram streams): a (w1, w2) struct stream
    * materializes at roughly twice the token stream's constant factor,
    * so near the bound the eager checkpoint could exceed the ceiling the
    * 64 MB text bound was measured for (ADVICE r21) — halving the
    * effective bound keeps the materialized bytes in the measured band.
    * Results are identical on both arms at any factor.
    *
    * Gate cost (r22): the exact byte aggregate is a FULL corpus-text
    * scan whose only product is this yes/no — at 100 TB that is an
    * entire corpus pass to learn the obvious "no". The plan's size
    * statistics answer for free on the ONE side where a wrong call is
    * harmless: when `stats > bound`, skip the checkpoint without the
    * scan. File-backed stats are COMPRESSED bytes (raw text only
    * larger), so the skip is right whenever text carries the table; a
    * frame whose stats are inflated estimates (join shapes) lands here
    * too, and the worst case of a wrong skip is re-running one codegen
    * projection (measured ~2 s at x400 — finding 37's cheap side). The
    * SMALL side never trusts stats: LocalRelation/LogicalRDD stats are
    * schema-default row estimates that read a 65 MB string as ~20 B
    * (TextSpec plants exactly that), and a wrong CHECKPOINT at scale is
    * the 47%-GC materialization regression — so under the stats bound
    * the exact aggregate still decides, as before. */
  private[ops] def checkpointTokens(docs: DataFrame, textCol: String,
                                    frame: DataFrame,
                                    shapeFactor: Int = 1): DataFrame = {
    val bound = TokCheckpointTextBytes / shapeFactor
    val statBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    if (statBytes > BigInt(bound)) frame
    else {
      val bytes = docs.agg(coalesce(sum(octet_length(col(textCol))), lit(0L)))
        .head().getLong(0)
      if (bytes <= bound) frame.localCheckpoint(true) else frame
    }
  }

  def tfidf(docs: DataFrame, idCol: String, textCol: String,
            vocabBroadcastLimit: Long = Dedup.HotShingleBroadcastLimit): DataFrame = {
    // localCheckpoint: both the df aggregate and the probe side read the
    // term-count pipeline; materializing it once avoids the
    // double-computation that made the plain broadcast-join formulation
    // 2× the window formulation — while ALSO dropping the
    // Window.partitionBy(token) that put every posting of a hot token in
    // one task (power-law token skew is the aggregation-skew failure mode
    // at scale).
    val termCounts = docs
      .select(col(idCol).as("doc"), tokens(col(textCol)).as("__ws"))
      .select(col("doc"), size(col("__ws")).as("doc_len"), explode(col("__ws")).as("token"))
      .groupBy("doc", "doc_len", "token")
      .agg(count(lit(1)).as("tf_raw"))
      .localCheckpoint(true)
    // localCheckpoint: the df table feeds the count gate AND the join back
    val dfTable = termCounts.groupBy("token").agg(count(lit(1)).as("df"))
      .localCheckpoint(true)
    // corpus size N folded into the plan as a broadcast 1-row frame
    // instead of a separate docs.count() driver action per call.
    val nRow = broadcast(docs.agg(count(lit(1)).cast("double").as("__n")))
    // idf is a function of the df-table row alone: compute log(N/df) once
    // per token TYPE and join the precomputed double (r21 opt, the NLL
    // family's stats-side rule) — the (doc, token) stream previously paid
    // the division + log per row. Same doubles, same final round ⇒
    // bit-identical (oracle-pinned).
    val idfTable = dfTable.crossJoin(nRow)
      .select(col("token"), log(col("__n") / col("df")).as("__idf"))
    val probed =
      if (broadcastableVocab(dfTable, Seq("token"), vocabBroadcastLimit))
        termCounts.join(broadcast(idfTable), Seq("token"))
      else
        termCounts.join(idfTable.hint("SHUFFLE_HASH"), Seq("token"))
    probed
      .select(
        col("doc"), col("token"),
        round((col("tf_raw").cast("double") / col("doc_len")) *
          col("__idf"), 6).as("tfidf")
      )
  }

  /** BM25 ranked retrieval (Robertson & Zaragoza 2009, the Okapi
    * formulation with the +1 idf floor Lucene uses): score every
    * document against a keyword query,
    *   Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avgLen)),
    *   idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
    * The lexical complement to embedding search ([[graft.ops
    * .Similarity]]): hybrid RAG retrieval runs both and fuses.
    *
    * Scale shape — deliberately NOT the [[tfidf]] whole-vocab shape: the
    * token stream filters to QUERY TERMS FIRST, so every aggregate
    * (per-doc tf, per-term df) is |query|-bounded per doc and the
    * corpus-wide structures are two broadcast 1-row frames (N, avgLen).
    * No vocabulary table exists at all; the scan is the only
    * corpus-sized pass, and scoring folds map-side. Per-term scores
    * accumulate through DECIMAL(18,6) so summation order cannot flip a
    * rounded result (the float-sum oracle hazard), and top-k plans as
    * TakeOrderedAndProject under the (score desc, id) total order. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "empty BM25 query")
    val ws = tokens(col(textCol))
    val lens = docs.select(col(idCol).as("doc"), size(ws).as("doc_len"),
      ws.as("__ws"))
    val stats = broadcast(lens.agg(
      count(lit(1)).cast("double").as("__n"),
      avg(col("doc_len")).as("__avglen")))
    val hits = lens
      .select(col("doc"), col("doc_len"), explode(col("__ws")).as("token"))
      .filter(col("token").isin(queryTerms: _*)) // query-bounded from here on
      .groupBy("doc", "doc_len", "token")
      .agg(count(lit(1)).cast("double").as("tf"))
      .localCheckpoint(true) // feeds the df aggregate AND the score join
    val dfT = hits.groupBy("token").agg(count(lit(1)).cast("double").as("df"))
    hits
      .join(broadcast(dfT), Seq("token")) // |query| rows, always broadcastable
      .crossJoin(stats)
      .select(col("doc"),
        ((log(lit(1.0) + (col("__n") - col("df") + 0.5) / (col("df") + 0.5))) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("doc_len") / col("__avglen"))))
          .cast("decimal(18,6)").as("__s"))
      .groupBy("doc")
      .agg(round(sum(col("__s")), 4).cast("double").as("bm25"))
      .orderBy(col("bm25").desc, col("doc"))
      .limit(topK)
  }

  /** Language-ID heuristic: score a document against per-language marker
    * token sets and pick the argmax. On real corpora the markers would be
    * character n-gram profiles; the synthetic corpus carries a `lang`
    * column, so specs validate mechanics (argmax, tie-break) not accuracy. */
  def languageId(docs: DataFrame, idCol: String, textCol: String,
                 markers: Map[String, Seq[String]]): DataFrame = {
    val ws = tokens(col(textCol))
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct(
        (size(filter(ws, w => w.isin(ms: _*))).cast("double") / size(ws)).as("score"),
        lit(lang).as("lang")
      )
    }
    docs.select(
      col(idCol),
      element_at(reverse(array_sort(array(scored: _*))), 1).getField("lang").as("lang_pred")
    )
  }

  /** Unigram language-model score per document: the corpus-trained
    * unigram negative log-likelihood (the cheap, shuffle-bounded proxy
    * for the LM-perplexity quality filters real pipelines run — CCNet
    * trains a KenLM; the plumbing is identical, only the model is
    * richer). Emits token count and the summed NLL, decimal-accumulated
    * so summation order can't move the rounded result.
    *
    * Shape mirrors [[tfidf]]: one token-keyed aggregate builds the
    * vocabulary, corpus total rides as a broadcast 1-row frame, then one
    * per-doc aggregate. The vocab join back is count-gated like
    * [[tfidf]]'s — a 100 TB web corpus's unique-token set is ~10⁹
    * entries and cannot broadcast; past `vocabBroadcastLimit` the probe
    * becomes a SHUFFLE_HASH equi-join (the [[bigramNll]] plan). Both
    * paths are result-identical (TextSpec pins it). */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String,
                 vocabBroadcastLimit: Long = Dedup.HotShingleBroadcastLimit): DataFrame = {
    // feeds the vocab aggregate AND the probe side — checkpointed only
    // under the text-bytes bound (finding 37: corpus-token-sized
    // materializations invert the reuse trade at scale)
    val tok = checkpointTokens(docs, textCol, docs
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("token")))
    // localCheckpoint: the vocab feeds the count gate, the N total, AND
    // the join back
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val nRow = broadcast(vocab.agg(sum(col("c")).cast("double").as("__n")))
    // the per-token NLL term is a function of the VOCAB row alone, so it
    // is computed once per vocab TYPE here and the occurrence stream only
    // sums precomputed decimals (r21 opt: −log + decimal cast per
    // occurrence was the hottest task in the ppl family; guide §2.3
    // "aggregate before you shuffle" applied to scalar work). Decimal
    // sums are exact integer arithmetic, so the doc totals are
    // bit-identical to the per-occurrence form — the oracle hash pins it.
    val scored = vocab.crossJoin(nRow)
      .select(col("token"),
        (-log(col("c").cast("double") / col("__n")))
          .cast("decimal(18,6)").as("__nll"))
    val probed =
      if (broadcastableVocab(vocab, Seq("token"), vocabBroadcastLimit))
        tok.join(broadcast(scored), Seq("token"))
      else
        tok.join(scored.hint("SHUFFLE_HASH"), Seq("token"))
    probed
      .groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_tok"),
        round(sum(col("__nll")), 4).cast("double").as("sum_nll"))
  }

  /** Bigram conditional NLL per document: −Σ log P(w₂|w₁) with MLE
    * P(w₂|w₁) = c(w₁w₂)/c(w₁·) over the corpus (the next-step language-
    * model signal after [[unigramNll]]; low = predictable/templated).
    *
    * Scale shape — deliberately DIFFERENT from unigramNll: a corpus
    * bigram table is |V|²-ish and cannot broadcast at 100 TB, so the
    * probe is a SHUFFLE_HASH equi-join of the bigram stream against the
    * two count frames (both partial-aggregate map-side first). The
    * bigram stream itself is a codegen projection (arrays_zip of
    * slices — no per-element lambda re-eval, the shinglesFromTokens
    * pattern). */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = tokens(col(textCol))
    val cnt = size(ws) - 1
    // the pair stream feeds both count aggregates AND the probe side —
    // checkpointed only under the text-bytes bound (r21: corpus-BIGRAM-
    // sized, the finding-37 materialize-for-reuse ceiling; past the bound
    // each consumer recomputes the codegen tokenize+zip+explode)
    val pairs = checkpointTokens(docs, textCol, docs
      .select(col(idCol).as("doc"),
        explode(when(size(ws) >= 2,
          arrays_zip(slice(ws, lit(1), cnt), slice(ws, lit(2), cnt)))
          .otherwise(array().cast("array<struct<`0`:string,`1`:string>>"))).as("bg"))
      .select(col("doc"), col("bg.0").as("w1"), col("bg.1").as("w2")), shapeFactor = 2)
    val c2 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = pairs.groupBy("w1").agg(count(lit(1)).as("c1"))
    // compose the stats at TYPE level first (c2 ⋈ c1 is |bigram types| ⋈
    // |V| rows), precompute the decimal NLL term per type, and probe the
    // pair STREAM exactly once — the stream previously paid two
    // SHUFFLE_HASH joins (by (w1,w2), then re-shuffled by w1) and the
    // −log + decimal cast per OCCURRENCE (r21 opt; guide §2.3: shuffle
    // fewer bytes — types ≤ occurrences — and §8: decide on small rows).
    // Per-type term values and the exact decimal sums are bit-identical;
    // every observed bigram has a c2 and c1 row, so inner-join
    // multiplicity (n_big) is unchanged. The oracle hash pins all of it.
    val stats = c2.join(c1.hint("SHUFFLE_HASH"), Seq("w1"))
      .select(col("w1"), col("w2"),
        (-log(col("c12").cast("double") / col("c1")))
          .cast("decimal(18,6)").as("__nll"))
    pairs
      .join(stats.hint("SHUFFLE_HASH"), Seq("w1", "w2"))
      .groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_big"),
        round(sum(col("__nll")), 4).cast("double").as("sum_nll"))
  }

  /** Interpolated bigram NLL — Jelinek–Mercer smoothing, the
    * CCNet-fidelity step up from the unigram proxy: a real LM never
    * trusts sparse bigram MLE alone, it backs off to the lower order.
    * Per-doc score = −Σ ln(λ·P(w₂|w₁) + (1−λ)·P(w₂)) over the doc's
    * bigrams, with P(w₂|w₁) = c(w₁w₂)/c(w₁·) and P(w₂) = c(w₂)/N, both
    * corpus-MLE. λ is evaluated as IEEE double on BOTH engines (the
    * oracle writes CAST(0.7 AS DOUBLE) — a bare 0.7 literal would bind
    * as DECIMAL and round differently), the mixture evaluates
    * left-associative, and the sum accumulates through DECIMAL(18,6)
    * with a 4-dp round — the oracle recomputes every doc bit-for-bit.
    *
    * Scale shape: the bigram table is |V|²-ish and never broadcasts —
    * SHUFFLE_HASH probes ([[bigramNll]]'s plan); the unigram vocab probe
    * count-gates broadcast ↔ SHUFFLE_HASH like [[unigramNll]]'s. Docs
    * with fewer than two tokens carry no bigram and drop out (the
    * order-2 model has nothing to score). */
  def bigramInterpNll(docs: DataFrame, idCol: String, textCol: String,
                      lambda: Double = 0.7,
                      vocabBroadcastLimit: Long = Dedup.HotShingleBroadcastLimit): DataFrame =
    interpNllCore(docs, idCol, textCol, keyCols = Seq.empty, lambda,
      vocabBroadcastLimit)
      .select(col("doc"), col("n_big"), col("sum_nll"))

  /** The interpolated-bigram scoring pipeline shared by
    * [[bigramInterpNll]] (one global LM — empty `keyCols`) and
    * [[perplexityBucketsByLang]]'s lmOrder=2 branch (one LM per
    * language — `keyCols = Seq(langCol)`): every count conditions on the
    * key columns, the mixture formula exists in exactly ONE place so the
    * global and per-key paths cannot drift. Returns
    * (doc, keyCols…, n_big, sum_nll). Gate posture: the (key, w1, w2)
    * bigram table and the w1 counts probe SHUFFLE_HASH (|V|²-ish, never
    * broadcastable); the unigram probe and keyed totals ride the
    * `vocabBroadcastLimit` count gate; a global total is a broadcast
    * 1-row frame. */
  private def interpNllCore(docs: DataFrame, idCol: String, textCol: String,
                            keyCols: Seq[String], lambda: Double,
                            vocabBroadcastLimit: Long): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0, s"lambda $lambda outside (0,1)")
    val ws = tokens(col(textCol))
    val cnt = size(ws) - 1
    val keys = keyCols.map(col)
    // tok has ONE consumer (uni — totals derive from uni, not tok), so it
    // is NOT checkpointed: eagerly materializing the corpus-token-sized
    // frame for zero reuse would be the query's largest write
    val tok = docs
      .select(col(idCol).as("doc") +: keys :+ explode(ws).as("token"): _*)
    val uni = tok.groupBy(keyCols.map(col) :+ col("token"): _*)
      .agg(count(lit(1)).as("cu"))
      .localCheckpoint(true) // feeds the gate count, the totals, AND the probe
    val vocabGated =
      broadcastableVocab(uni, keyCols :+ "token", vocabBroadcastLimit)
    val totals = uni.groupBy(keyCols.map(col): _*)
      .agg(sum(col("cu")).cast("double").as("__n"))
    // feeds both count aggregates AND the probe side — checkpointed only
    // under the text-bytes bound (r21: a corpus-BIGRAM-sized frame is the
    // finding-37 materialize-for-reuse ceiling the tok checkpoint already
    // respects; past the bound each consumer recomputes the codegen
    // tokenize+zip+explode, identical results)
    val pairs = checkpointTokens(docs, textCol, docs
      .select(col(idCol).as("doc") +: keys :+
        explode(when(size(ws) >= 2,
          arrays_zip(slice(ws, lit(1), cnt), slice(ws, lit(2), cnt)))
          .otherwise(array().cast("array<struct<`0`:string,`1`:string>>"))).as("bg"): _*)
      .select(col("doc") +: keys :+ col("bg.0").as("w1") :+ col("bg.1").as("w2"): _*), shapeFactor = 2)
    val c2 = pairs.groupBy(keyCols.map(col) :+ col("w1") :+ col("w2"): _*)
      .agg(count(lit(1)).as("c12"))
    val c1 = pairs.groupBy(keyCols.map(col) :+ col("w1"): _*)
      .agg(count(lit(1)).as("c1"))
    val uniAsW2 = uni.withColumnRenamed("token", "w2")
    // compose the stats at TYPE level (all joins are |bigram types| ⋈
    // |V|-or-smaller frames), precompute the decimal mixture term per
    // type, and probe the pair STREAM exactly once — the stream
    // previously paid up to four joins (two of them re-shuffles of every
    // occurrence) plus the mixture's −log + decimal cast per OCCURRENCE
    // (r21 opt; guide §2.3/§8). The mixture expression, its operand
    // order, and the exact decimal sums are unchanged per type, so doc
    // scores are bit-identical — the oracle hash pins it. The uni/totals
    // gate still decides broadcast ↔ SHUFFLE_HASH for the type-level
    // joins; the pair probe is SHUFFLE_HASH either way (|V|²-ish stats
    // never broadcast).
    val statsBase = c2.join(c1.hint("SHUFFLE_HASH"), keyCols :+ "w1")
    val statsUni =
      if (vocabGated) statsBase.join(broadcast(uniAsW2), keyCols :+ "w2")
      else statsBase.join(uniAsW2.hint("SHUFFLE_HASH"), keyCols :+ "w2")
    val statsTotal =
      if (keyCols.isEmpty) statsUni.crossJoin(broadcast(totals))
      else if (vocabGated) statsUni.join(broadcast(totals), keyCols)
      else statsUni.join(totals.hint("SHUFFLE_HASH"), keyCols)
    val stats = statsTotal.select(keys ++ Seq(col("w1"), col("w2"),
      (-log(
        lit(lambda) * col("c12").cast("double") / col("c1") +
          lit(1.0 - lambda) * col("cu").cast("double") / col("__n")))
        .cast("decimal(18,6)").as("__nll")): _*)
    pairs
      .join(stats.hint("SHUFFLE_HASH"), keyCols :+ "w1" :+ "w2")
      .groupBy(col("doc") +: keys: _*)
      .agg(
        count(lit(1)).as("n_big"),
        round(sum(col("__nll")), 4).cast("double").as("sum_nll"))
  }

  /** Interpolated Kneser–Ney bigram NLL (Kneser & Ney 1995; the
    * interpolated form and d=0.75 default per Chen & Goodman 1998 §2.7)
    * — the smoothing real LM toolkits (KenLM, hence CCNet's filter
    * models) actually ship. Where Jelinek–Mercer
    * ([[bigramInterpNll]]) backs off to the unigram FREQUENCY, KN backs
    * off to the unigram's CONTINUATION probability — how many distinct
    * contexts a word follows — which stops high-count but
    * context-locked words ("Francisco": frequent, yet only ever after
    * "San") from soaking up backoff mass:
    *
    *   P(w₂|w₁) = max(c(w₁w₂) − d, 0)/c(w₁·)
    *              + d·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/N₁₊(··)
    *
    * with N₁₊ the distinct-bigram-type counts. Scoring the training
    * corpus itself, every probed bigram has c ≥ 1 > d, so the max clamp
    * never binds — it is kept anyway so the formula is the textbook one.
    * All counts are integers; the discount is evaluated as IEEE double
    * on BOTH engines (the oracle writes CAST(0.75 AS DOUBLE) — a bare
    * literal would bind DECIMAL), the mixture evaluates
    * left-associative, and the sum accumulates through DECIMAL(18,6)
    * with a 4-dp round — the oracle recomputes every doc bit-for-bit.
    *
    * Scale shape: [[bigramInterpNll]]'s — the bigram table and the
    * w₁-keyed stats (c(w₁·) joined with N₁₊(w₁·), ONE probe) are
    * |V|-to-|V|²-sized and probe SHUFFLE_HASH; the w₂-keyed
    * continuation counts ride the count gate (broadcast ↔ SHUFFLE_HASH);
    * N₁₊(··) is a broadcast 1-row frame. Docs with fewer than two
    * tokens carry no bigram and drop out. */
  def bigramKnNll(docs: DataFrame, idCol: String, textCol: String,
                  discount: Double = 0.75,
                  vocabBroadcastLimit: Long = Dedup.HotShingleBroadcastLimit): DataFrame = {
    require(discount > 0.0 && discount < 1.0, s"discount $discount outside (0,1)")
    val ws = tokens(col(textCol))
    val cnt = size(ws) - 1
    // bigram stream checkpointed only under the text-bytes bound
    // (interpNllCore's r21 rationale — the finding-37 ceiling; pair
    // shape ⇒ the halved effective bound, ADVICE r21)
    val pairs = checkpointTokens(docs, textCol, docs
      .select(col(idCol).as("doc"),
        explode(when(size(ws) >= 2,
          arrays_zip(slice(ws, lit(1), cnt), slice(ws, lit(2), cnt)))
          .otherwise(array().cast("array<struct<`0`:string,`1`:string>>"))).as("bg"))
      .select(col("doc"), col("bg.0").as("w1"), col("bg.1").as("w2")), shapeFactor = 2)
    val c2 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(true) // feeds the probe, both type counts, AND the total
    val c1 = pairs.groupBy("w1").agg(count(lit(1)).as("c1"))
    val n1f = c2.groupBy("w1").agg(count(lit(1)).as("n1f"))
    val n1b = c2.groupBy("w2").agg(count(lit(1)).as("n1b"))
      .localCheckpoint(true) // feeds the gate count AND the probe
    val tRow = broadcast(c2.agg(count(lit(1)).cast("double").as("__t")))
    val w1Stats = c1.join(n1f, Seq("w1")) // both |V|-sized, keyed alike
    // compose the stats at TYPE level and precompute the decimal KN term
    // per bigram type; the pair STREAM probes exactly once instead of
    // three times, and the −log + decimal cast runs per TYPE, not per
    // occurrence (r21 opt, interpNllCore's rationale — guide §2.3/§8).
    // Term expression and operand order unchanged ⇒ bit-identical doc
    // scores; every observed bigram has c2/w1Stats/n1b rows ⇒ n_big
    // multiplicity unchanged. The oracle hash pins it.
    val statsBase = c2.join(w1Stats.hint("SHUFFLE_HASH"), Seq("w1"))
    val statsCont =
      if (broadcastableVocab(n1b, Seq("w2"), vocabBroadcastLimit))
        statsBase.join(broadcast(n1b), Seq("w2"))
      else statsBase.join(n1b.hint("SHUFFLE_HASH"), Seq("w2"))
    val stats = statsCont
      .crossJoin(tRow)
      .select(col("w1"), col("w2"),
        (-log(
          greatest(col("c12").cast("double") - lit(discount), lit(0.0)) / col("c1") +
            lit(discount) * col("n1f") / col("c1") *
              (col("n1b").cast("double") / col("__t"))))
          .cast("decimal(18,6)").as("__nll"))
    pairs
      .join(stats.hint("SHUFFLE_HASH"), Seq("w1", "w2"))
      .groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_big"),
        round(sum(col("__nll")), 4).cast("double").as("sum_nll"))
  }

  /** Shared quality-signal columns — [[gopherFilter]] and
    * [[QualityModel.features]] both compose THESE definitions, so the
    * rule filter and the learned classifier read the same signals (the
    * GPT-3 §2.2 "classifier learns the decision surface over the same
    * signals" relationship) and cannot silently drift apart.
    * Unrounded — each call site applies its own precision. */
  val QualityStopwords: Seq[String] =
    Seq("a", "the", "of", "and", "to", "in", "is")

  /** Fraction of tokens in [[QualityStopwords]]. */
  def stopwordFrac(ws: Column): Column =
    size(filter(ws, w => w.isin(QualityStopwords: _*))).cast("double") / size(ws)

  /** Mean token length, computed from char count without re-joining:
    * (chars − separators) / tokens for single-space-joined text. */
  def avgTokenLen(text: Column, ws: Column): Column =
    (length(text) - size(ws) + 1).cast("double") / size(ws)

  /** Duplicate-bigram fraction, 1 − distinct/total over word bigrams —
    * the fused [[graft.functions.ShingleHashes]] pass, one codegen
    * projection. 0.0 for docs too short to carry a bigram. */
  def dupBigramFrac(ws: Column): Column =
    when(size(ws) >= 2,
      lit(1.0) - size(graft.functions.ShingleHashes.sortedShingleHashes(ws, 2))
        .cast("double") / (size(ws) - 1))
      .otherwise(lit(0.0))

  /** The Gopher rule columns over a text column (each TRUE = rule
    * passed), shared by [[gopherFilter]] and [[gopherKept]]. */
  private def gopherRules(text: Column): Seq[Column] = {
    val ws = tokens(text)
    val nTok = size(ws)
    def r4(c: Column): Column = round(c, 4)
    Seq(
      nTok.between(30, 50000),
      r4(avgTokenLen(text, ws)).between(3.0, 10.0),
      r4(stopwordFrac(ws)) >= 0.02,
      r4(size(filter(ws, w => w.rlike("[a-zA-Z]"))).cast("double") / nTok) >= 0.7,
      r4(dupBigramFrac(ws)) <= 0.3)
  }

  /** The Gopher document-quality rule set applied as a FILTER (Rae et
    * al. 2021 §A1.1, the subset computable from text alone): token count
    * in [30, 50k], mean word length in [3, 10], ≥ 2% stopwords, ≥ 70% of
    * tokens containing a letter, duplicate-bigram fraction ≤ 0.3.
    * Returns every doc with its failed-rule count and the kept verdict —
    * pipelines either filter on `kept` or route `n_fail` into triage.
    * (The stopword rule is English-centric by design — Gopher was an
    * English model; run it per-language or after language routing.)
    *
    * Scale shape: ONE codegen projection over the scan — every signal is
    * a column expression (the [[repetitionSignals]] fused-shingle pass
    * for dup2), no shuffle, no state. All ratios round to 4 dp before
    * threshold comparison so an oracle reproduces each verdict exactly. */
  def gopherFilter(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nFail = gopherRules(col(textCol))
      .map(r => when(r, 0).otherwise(1)).reduce(_ + _)
    docs.select(col(idCol), nFail.as("n_fail"), (nFail === 0).as("kept"))
  }

  /** [[gopherFilter]]'s keep verdict as ONE boolean column — the form a
    * streaming ingest pipeline composes statelessly
    * ([[graft.streaming.Streaming.curateStream]]). Same rules, same
    * rounding, so stream and batch agree doc-for-doc. */
  def gopherKept(text: Column): Column = gopherRules(text).reduce(_ && _)

  /** C4/FineWeb LINE-level quality signals (Raffel et al. 2020 §2.2's
    * line heuristics; Penedo et al. 2024's formatting filters): the
    * rules that look at a page's LINE STRUCTURE, which the token-level
    * [[gopherRules]] can't see — a nav-menu page and an article can share
    * token statistics while their lines look nothing alike. Ratios round
    * to 4 dp so an oracle reproduces each verdict exactly. */
  private def lineRuleSignals(text: Column): Seq[(String, Column)] = {
    val lines = split(text, "\n")
    val nl = size(lines)
    def r4(c: Column): Column = round(c, 4)
    Seq(
      // fraction of lines ending in terminal punctuation (C4 keeps such lines)
      "term_punct_ratio" -> r4(size(filter(lines, l =>
        l.endsWith(".") || l.endsWith("!") || l.endsWith("?") || l.endsWith("\"")))
        .cast("double") / nl),
      // bullet-formatted line fraction (FineWeb: listicle/nav boilerplate)
      "bullet_frac" -> r4(size(filter(lines, l =>
        l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• ")))
        .cast("double") / nl),
      // fraction of lines under 3 words (C4 drops sub-3-word lines)
      "short_line_frac" -> r4(size(filter(lines, l =>
        size(split(l, " ")) < 3)).cast("double") / nl),
      // placeholder/code artifacts: any hit dooms the page (C4 §2.2)
      "has_lorem" -> lower(text).contains("lorem ipsum"),
      "has_js" -> lower(text).contains("javascript"),
      "has_curly" -> text.contains("{"))
  }

  /** The line-rule verdicts, TRUE = rule passed, aligned with
    * [[lineRuleSignals]]. */
  private def lineRuleChecks(sig: Map[String, Column]): Seq[Column] = Seq(
    sig("term_punct_ratio") >= 0.2,
    sig("bullet_frac") <= 0.5,
    sig("short_line_frac") <= 0.5,
    !sig("has_lorem"),
    !sig("has_js"),
    !sig("has_curly"))

  /** Line-level rule table per document: every signal, the failed-rule
    * count, and the kept verdict — [[gopherFilter]]'s shape at line
    * granularity. ONE projection over the scan (the line split and each
    * per-line predicate are column expressions), no shuffle, no state. */
  def lineRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sig = lineRuleSignals(col(textCol))
    val checks = lineRuleChecks(sig.toMap)
    val nFail = checks.map(r => when(r, 0).otherwise(1)).reduce(_ + _)
    docs.select(col(idCol) +: sig.map { case (n, c) => c.as(n) } :+
      nFail.as("n_fail") :+ (nFail === 0).as("kept"): _*)
  }

  /** [[lineRules]]' keep verdict as ONE boolean column for stateless
    * stream composition — same signals, same rounding, so stream and
    * batch agree doc-for-doc. */
  def lineRulesKept(text: Column): Column =
    lineRuleChecks(lineRuleSignals(text).toMap).reduce(_ && _)

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3: score
    * documents with a language model, split the corpus into head /
    * middle / tail terciles; downstream trainers keep head+middle). The
    * LM here is the corpus [[unigramNll]]; per-doc ppl-proxy =
    * sum_nll / n_tok, terciles by exact rank under the (ppl, doc) total
    * order — integer bucket edges (3·r ≤ n, 3·r ≤ 2n), so an oracle
    * reproduces the split bit-for-bit.
    *
    * Scale shape: the NLL is [[unigramNll]]'s (count-gated vocab probe);
    * the tercile rank is [[Relational.globalRank]]'s two-phase
    * range-partitioned form — a parallel range sort plus one ≤32-row
    * offset window, never the naive `Window.orderBy(ppl, doc)` whose
    * `Exchange SinglePartition` funnels the whole corpus through one
    * task. (ppl, doc) is a total
    * order (doc is unique), so the rank — and both oracles — are
    * unchanged from the naive form. Production CCNet avoids even the
    * range sort by bucketing against FIXED thresholds trained once on a
    * held-out sample; with thresholds in hand this collapses to a
    * zero-shuffle codegen filter (`when(ppl <= t1, ...)`), so the sort
    * here is the price of deriving thresholds in-query, not of applying
    * them. */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        lmOrder: Int = 1): DataFrame = {
    require(lmOrder == 1 || lmOrder == 2, s"lmOrder $lmOrder not in {1, 2}")
    // localCheckpoint: the scored frame feeds the corpus count AND the
    // rank phases — one NLL computation, not two
    val scored =
      if (lmOrder == 1)
        unigramNll(docs, idCol, textCol)
          .select(col("doc"), round(col("sum_nll") / col("n_tok"), 6).as("ppl"))
      else // interpolated bigram LM; <2-token docs drop (nothing to score)
        bigramInterpNll(docs, idCol, textCol)
          .select(col("doc"), round(col("sum_nll") / col("n_big"), 6).as("ppl"))
    val ppl = scored.localCheckpoint(true)
    val n = broadcast(ppl.agg(count(lit(1)).as("__n")))
    Relational.globalRank(ppl, Seq(col("ppl"), col("doc")), "__r")
      .crossJoin(n)
      .select(col("doc"), col("ppl"),
        when(col("__r") * 3 <= col("__n"), "head")
          .when(col("__r") * 3 <= col("__n") * 2, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Per-language CCNet perplexity bucketing — the form Wenzek et al.
    * 2020 actually ship (§4.3 trains ONE LM PER LANGUAGE and splits each
    * language's corpus into its own terciles; a single global split would
    * let an easy language's docs crowd a hard language out of "head").
    * The LM is the per-language unigram MLE: P(w | lang) =
    * c(lang, w) / c(lang, ·); per-doc ppl-proxy and integer tercile
    * edges as in [[perplexityBuckets]], ranked within language.
    *
    * Scale shape: the vocab aggregate keys on (lang, token) — same
    * map-side-folding shape as [[unigramNll]]'s, count-gated broadcast ↔
    * SHUFFLE_HASH probe; per-language totals ride inside the vocab rows
    * (a window-free second aggregate joined on lang through the same
    * gate). The within-language rank is [[Relational.groupedRank]] — a
    * dominant language never funnels through one task, the exact hazard
    * `Window.partitionBy(lang)` would plan (the [[Relational.datasetMix]]
    * hazard). Per-language doc counts join through the
    * [[Relational.temperatureSample]] gate posture (languages are
    * low-cardinality in practice, but nothing here assumes it). */
  def perplexityBucketsByLang(docs: DataFrame, idCol: String, textCol: String,
                              langCol: String,
                              vocabBroadcastLimit: Long = Dedup.HotShingleBroadcastLimit,
                              lmOrder: Int = 1,
                              lambda: Double = 0.7): DataFrame = {
    require(lmOrder == 1 || lmOrder == 2, s"lmOrder $lmOrder not in {1, 2}")
    val scored =
      if (lmOrder == 1) {
        // feeds the vocab aggregate AND the probe side — checkpointed
        // only under the text-bytes bound (finding 37)
        val tok = checkpointTokens(docs, textCol, docs
          .select(col(idCol).as("doc"), col(langCol).as("lang"),
            explode(tokens(col(textCol))).as("token")))
        // localCheckpoint: the vocab feeds the gate count, the totals,
        // AND the join back
        val vocab = tok.groupBy("lang", "token").agg(count(lit(1)).as("c"))
          .localCheckpoint(true)
        val totals = vocab.groupBy("lang").agg(sum(col("c")).cast("double").as("__n"))
        // per-type decimal NLL term precomputed on the vocab side, the
        // token stream probes ONE stats table (unigramNll's r21 shape:
        // −log + decimal cast per occurrence was the family's hottest
        // task; decimal sums are exact ⇒ bit-identical, oracle-pinned)
        val scored = vocab.join(totals, Seq("lang"))
          .select(col("lang"), col("token"),
            (-log(col("c").cast("double") / col("__n")))
              .cast("decimal(18,6)").as("__nll"))
        val probed =
          if (broadcastableVocab(vocab, Seq("lang", "token"), vocabBroadcastLimit))
            tok.join(broadcast(scored), Seq("lang", "token"))
          else
            tok.join(scored.hint("SHUFFLE_HASH"), Seq("lang", "token"))
        probed
          .groupBy(col("doc"), col("lang"))
          .agg(
            count(lit(1)).as("n_tok"),
            round(sum(col("__nll")), 4).cast("double").as("sum_nll"))
          .select(col("doc"), col("lang"),
            round(col("sum_nll") / col("n_tok"), 6).as("ppl"))
      } else
        // per-language interpolated bigram LM: every count conditioned on
        // lang through the SHARED [[interpNllCore]] pipeline — the
        // mixture formula, decimal accumulation, and gate posture exist
        // in one place, so the global and per-lang paths cannot drift
        interpNllCore(
          docs.select(col(idCol), col(langCol).as("lang"), col(textCol)),
          idCol, textCol, keyCols = Seq("lang"), lambda, vocabBroadcastLimit)
          .select(col("doc"), col("lang"),
            round(col("sum_nll") / col("n_big"), 6).as("ppl"))
    val ppl = scored
      .localCheckpoint(true) // feeds the per-lang counts AND the rank
    val n = ppl.groupBy("lang").agg(count(lit(1)).as("__n"))
    val ranked = Relational.groupedRank(ppl, Seq("lang"),
      Seq(col("ppl"), col("doc")), "__r")
    // n is |langs|-sized — gate the BROADCAST on its own count (it, not
    // the vocab, is what ships). Under the gate (r22) the counts collect
    // in one take action and join back as a local relation (the
    // collectUnderGate posture — replaces the checkpoint + count pair);
    // past it the aggregate re-runs into the checkpoint, one extra pass
    // over the CHECKPOINTED ppl blocks on the > limit-langs arm.
    val withN = Relational.collectUnderGate(n, vocabBroadcastLimit) match {
      case Some(rows) =>
        ranked.join(broadcast(Relational.localFrame(n, rows, n.schema)), Seq("lang"))
      case None =>
        ranked.join(n.localCheckpoint(true).hint("SHUFFLE_HASH"), Seq("lang"))
    }
    withN.select(col("doc"), col("lang"), col("ppl"),
      when(col("__r") * 3 <= col("__n"), "head")
        .when(col("__r") * 3 <= col("__n") * 2, "middle")
        .otherwise("tail").as("bucket"))
  }

  /** BPE merge-rule training (Sennrich et al. 2016, arXiv:1508.07909
    * §3.2): iteratively merge the most frequent adjacent symbol pair,
    * weighted by word frequency, starting from characters plus an
    * end-of-word marker. Returns the learned merge table
    * (rank, left, right, merged, pair_count) — the artifact a tokenizer
    * ships. Ties break lexicographically on (left, right), so the table
    * is deterministic for a given corpus.
    *
    * Scale shape: training state is the WORD VOCABULARY (distinct words ×
    * symbol arrays), not the corpus — one explode+count builds it, and
    * every step after that touches only vocab rows. The vocabulary is
    * GATED (the repo's standard gate template) on BOTH row count
    * (`vocabBroadcastLimit`) and total characters (`localCharBudget`):
    * the local path's driver structures — per-symbol strings, pair maps,
    * one heap entry per adjacency — scale with Σ|word|, not rows, so a
    * row-count gate alone would admit a near-limit vocab of long words
    * straight into a driver OOM (~150 B per
    * char ⇒ the 8M default budgets ~1.2 GB worst-case). Under the gate
    * it collects and the merge loop runs in memory with incrementally-
    * maintained pair counts (the HF-tokenizers shape — a real
    * tokenizer's ~30k merges cost seconds, not 30k Spark jobs).
    * Past it, [[bpeTrainIterative]]
    * runs one distributed pair-count aggregate + 1-row argmax collect
    * per merge — correct at any vocab size but numMerges-paced; both
    * paths are result-identical (TextSpec pins it). The corpus-sized
    * pass happens exactly once, at vocab build. */
  val BpeLocalCharBudget: Long = 8000000L

  def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int,
               vocabBroadcastLimit: Long = Dedup.HotShingleBroadcastLimit,
               localCharBudget: Long = BpeLocalCharBudget): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    // localCheckpoint: the vocab feeds the gate stats AND (either path's)
    // training input — one corpus pass
    val vocab = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .localCheckpoint(true)
    val stats = vocab.agg(count(lit(1)).as("__n"),
      coalesce(sum(length(col("word"))), lit(0L)).as("__chars")).head()
    val merges =
      if (stats.getLong(0) <= vocabBroadcastLimit &&
          stats.getLong(1) <= localCharBudget)
        bpeTrainLocal(vocab.collect().map(r => (r.getString(0), r.getLong(1))),
          numMerges)
      else bpeTrainIterative(vocab, numMerges)
    merges.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Driver-local BPE merge loop over a collected (word, count) vocab —
    * the under-gate path of [[bpeTrain]]. Pair counts are maintained
    * INCREMENTALLY: a merge re-scans only the words containing the merged
    * pair, and the argmax comes from a lazy-deletion heap (entries are
    * pushed on every count change and validated against the live count at
    * pop — the current maximum always has a fresh entry, stale ones
    * discard). Total work ∝ vocab symbols + Σ touched-word sizes, so ~30k
    * merges run in seconds where a per-merge full recount would be
    * O(numMerges · vocab). Tie-breaks ((cnt desc, l, r) in CODE-POINT
    * order — Java's UTF-16 `compareTo` sorts [U+E000, U+FFFF] above
    * supplementary chars, diverging from Spark's binary UTF8String order
    * the iterative path ties on), code-point
    * symbol splitting, and the greedy left-to-right fold match
    * [[bpeTrainIterative]] exactly. */
  private[ops] def codePointCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Split into code-point symbols (surrogate pairs stay whole) — the
    * unit DuckDB's `string_split(w, '')` and Spark's binary sort share;
    * Scala's per-Char map would shear supplementary chars into lone
    * surrogates. */
  private[ops] def codePointSymbols(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** GPT-2's bytes-to-unicode table (Radford et al. 2019, `encoder.py`
    * `bytes_to_unicode`): every byte 0–255 maps to a VISIBLE unicode
    * character — printable bytes (`!`–`~`, `¡`–`¬`, `®`–`ÿ`) to
    * themselves, the rest to U+0100.. in byte order — so byte-level BPE
    * can reuse string symbol machinery with no unprintable/whitespace
    * symbols. One code point per byte by construction (all targets <
    * U+0143), so [[codePointSymbols]] of a mapped word IS its byte
    * symbol sequence. */
  private[ops] val ByteUnicode: Array[String] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    Array.tabulate(256) { b =>
      if (printable(b)) new String(Character.toChars(b))
      else { val s = new String(Character.toChars(256 + n)); n += 1; s }
    }
  }

  /** Driver-side word → byte-symbol string (UTF-8 bytes through
    * [[ByteUnicode]]) — the under-gate path's splitter input. */
  private[ops] def byteMapString(w: String): String = {
    val bs = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bs.length)
    bs.foreach(b => sb.append(ByteUnicode(b & 0xff)))
    sb.toString
  }

  /** In-plan word → byte-symbol string, all builtins (encode to UTF-8
    * binary, per-byte hex→int→table lookup) — vocab-sized work only
    * (applied to DISTINCT words, never corpus occurrences), so the
    * interpreted transform lambda is off the hot path. */
  private[ops] def byteMapColumn(c: Column): Column = {
    val b = encode(c, "UTF-8")
    concat_ws("", transform(sequence(lit(1), octet_length(b)),
      i => element_at(typedLit(ByteUnicode.toSeq),
        conv(hex(b.substr(i, lit(1))), 16, 10).cast("int") + 1)))
  }

  /** BYTE-level BPE training (the GPT-2 tokenizer alphabet): identical
    * merge semantics to [[bpeTrain]], but the initial symbols are the
    * word's UTF-8 BYTES through [[ByteUnicode]] instead of its code
    * points — char-level tables undercount non-ASCII token budgets
    * (one symbol for a 3-byte CJK char), and real byte-level
    * tokenizers never see an OOV symbol. Because every mapped byte is
    * one code point, byte-level training IS char-level training over
    * the byte-mapped vocabulary — both gate paths reuse the exact
    * [[bpeTrainLocal]]/[[bpeTrainIterative]] loops (their equivalence
    * spec carries over), with the word map applied driver-side under
    * the gate and in-plan (vocab-sized) past it. The char budget gates
    * Σ UTF-8 bytes — the quantity the local path's per-symbol
    * structures actually scale with here. */
  def bpeTrainBytes(docs: DataFrame, textCol: String, numMerges: Int,
                    vocabBroadcastLimit: Long = Dedup.HotShingleBroadcastLimit,
                    localCharBudget: Long = BpeLocalCharBudget): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .localCheckpoint(true)
    val stats = vocab.agg(count(lit(1)).as("__n"),
      coalesce(sum(octet_length(col("word"))), lit(0L)).as("__bytes")).head()
    val merges =
      if (stats.getLong(0) <= vocabBroadcastLimit &&
          stats.getLong(1) <= localCharBudget)
        bpeTrainLocal(vocab.collect().map(r =>
          (byteMapString(r.getString(0)), r.getLong(1))), numMerges)
      else bpeTrainIterative(
        vocab.select(byteMapColumn(col("word")).as("word"), col("wc")), numMerges)
    merges.toDF("rank", "left", "right", "merged", "pair_count")
  }

  private[ops] def bpeTrainLocal(vocab: Array[(String, Long)],
                                 numMerges: Int): Seq[(Int, String, String, String, Long)] = {
    import scala.collection.mutable
    val syms: Array[Array[String]] =
      vocab.map { case (w, _) => codePointSymbols(w) :+ "</w>" }
    val wcs: Array[Long] = vocab.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val members = mutable.HashMap.empty[(String, String), mutable.BitSet]
    val pairOrd = new java.util.Comparator[((String, String), Long)] {
      def compare(x: ((String, String), Long), y: ((String, String), Long)): Int = {
        val c = java.lang.Long.compare(y._2, x._2) // count desc
        if (c != 0) c
        else {
          val l = codePointCompare(x._1._1, y._1._1)
          if (l != 0) l else codePointCompare(x._1._2, y._1._2)
        }
      }
    }
    val heap = new java.util.PriorityQueue[((String, String), Long)](11, pairOrd)
    def bump(p: (String, String), delta: Long): Unit = {
      val c = counts.getOrElse(p, 0L) + delta
      if (c <= 0L) counts.remove(p)
      else { counts(p) = c; heap.add((p, c)) }
    }
    def scan(wi: Int, sign: Long, register: Boolean): Unit = {
      val s = syms(wi); val w = wcs(wi) * sign
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        bump(p, w)
        if (register) members.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        i += 1
      }
    }
    syms.indices.foreach(scan(_, 1L, register = true))
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      var top: ((String, String), Long) = null
      while (top == null && !heap.isEmpty) {
        val e = heap.poll()
        if (counts.get(e._1).contains(e._2)) top = e
      }
      if (top == null) exhausted = true
      else {
        val ((l, r), cnt) = top
        rank += 1
        out += ((rank, l, r, l + r, cnt))
        // membership may be stale (pair folded away by an earlier merge):
        // verify adjacency before re-scanning the word
        members.getOrElse((l, r), mutable.BitSet.empty).toArray.foreach { wi =>
          val s = syms(wi)
          var has = false; var i = 0
          while (!has && i < s.length - 1) {
            if (s(i) == l && s(i + 1) == r) has = true
            i += 1
          }
          if (has) {
            scan(wi, -1L, register = false)
            // greedy left-to-right fold: replace each non-overlapping
            // (l, r) adjacency with the merged symbol
            val buf = mutable.ArrayBuffer.empty[String]
            s.foreach { x =>
              if (buf.nonEmpty && buf.last == l && x == r)
                buf(buf.length - 1) = l + r
              else buf += x
            }
            syms(wi) = buf.toArray
            scan(wi, 1L, register = true)
          }
        }
        members.remove((l, r))
      }
    }
    out.result()
  }

  /** Distributed BPE merge loop — the past-gate fallback of [[bpeTrain]]
    * for vocabularies too large to collect. Per merge: one map-side-
    * folding pair-count aggregate, ONE single-row collect (the argmax —
    * bounded by numMerges, never by data; the iterative-CC driver-loop
    * posture), and a fold-merge projection with lineage truncated per
    * round. The fold is an `aggregate` HOF (interpreted per element) —
    * acceptable off the hot path because it runs over vocab entries whose
    * symbol arrays shrink as merges land. */
  private[ops] def bpeTrainIterative(vocab0: DataFrame,
                                     numMerges: Int): Seq[(Int, String, String, String, Long)] = {
    val EndOfWord = "</w>"
    // regexp '(?s).' splits by CODE POINT (Java regex matches code
    // points), where split(w, "") yields UTF-16 units — lone surrogates
    // on supplementary chars, diverging from the local path and the
    // DuckDB oracle
    var vocab = vocab0
      .select(concat(regexp_extract_all(col("word"), lit("(?s)."), lit(0)),
          array(lit(EndOfWord))).as("sym"),
        col("wc"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val n = size(col("sym"))
      val best = vocab
        .select(col("wc"), explode(
          arrays_zip(slice(col("sym"), lit(1), n - 1),
                     slice(col("sym"), lit(2), n - 1))).as("p"))
        .groupBy(col("p.0").as("l"), col("p.1").as("r"))
        .agg(sum(col("wc")).as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        rank += 1
        merges += ((rank, l, r, l + r, cnt))
        // greedy left-to-right fold: replace each non-overlapping (l, r)
        // adjacency with the merged symbol — [a,a,a,a] + (a,a) → [aa,aa]
        val mergedSym = aggregate(
          col("sym"),
          array().cast("array<string>"),
          (acc, x) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(x))))
        vocab = vocab.select(mergedSym.as("sym"), col("wc"))
          .localCheckpoint(true) // truncate the per-round lineage
      }
    }
    merges.result()
  }

  /** Apply a learned BPE merge table ([[bpeTrain]]'s output) and count
    * tokens per document — the budgeting number a training pipeline
    * actually plans with (docs-per-sequence, packing, cost estimates are
    * all in TOKENIZER tokens, not whitespace words).
    *
    * Scale shape: each DISTINCT word is encoded exactly once — the word
    * vocabulary (one explode+count aggregate) runs through a
    * `mapPartitions` encoder with the merge list on the closure (merge
    * tables are KB-sized by construction: numMerges entries), then
    * per-doc word counts join the word→token-length table and fold in
    * one aggregate. The imperative merge loop runs over vocab entries,
    * never corpus occurrences — a Zipf corpus re-encodes "the" once, not
    * 10¹¹ times. The join back is count-gated ([[tfidf]]'s shape):
    * broadcast under `vocabBroadcastLimit` distinct words, SHUFFLE_HASH
    * past it. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)],
                vocabBroadcastLimit: Long = Dedup.HotShingleBroadcastLimit): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wordCounts = docs
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("doc", "word").agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds the vocab distinct AND the probe
    val mergeList = merges.toArray // closure-shipped, numMerges entries
    val wordLens = wordCounts.select("word").distinct()
      .mapPartitions { it =>
        it.map { row =>
          val w = row.getString(0)
          var sym: Array[String] = codePointSymbols(w) :+ "</w>"
          mergeList.foreach { case (l, r) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            sym.foreach { s =>
              if (out.nonEmpty && out.last == l && s == r)
                out(out.length - 1) = l + r
              else out += s
            }
            sym = out.toArray
          }
          (w, sym.length.toLong)
        }
      }.toDF("word", "tok_len")
      .localCheckpoint(true) // encode once: feeds the gate count AND the join
    val probed =
      if (broadcastableVocab(wordLens, Seq("word"), vocabBroadcastLimit))
        wordCounts.join(broadcast(wordLens), Seq("word"))
      else wordCounts.join(wordLens.hint("SHUFFLE_HASH"), Seq("word"))
    probed.groupBy("doc")
      .agg(sum(col("n") * col("tok_len")).as("n_bpe_tokens"))
  }

  /** Repetition signals (the Gopher-style repetitious-text filters, Rae et
    * al. 2021 §A1.1): fraction of duplicate word n-grams per document,
    * `1 − distinct_ngrams / total_ngrams` for n ∈ {2, 3}. High values mark
    * degenerate boilerplate/looping text that LLM-data pipelines drop.
    * Distinct counts reuse the fused [[graft.functions.ShingleHashes]]
    * pass (sorted distinct hashes), so the whole metric is one codegen
    * projection — no shuffle, no per-element lambda. */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = tokens(col(textCol))
    def dupFrac(n: Int): Column = {
      val total = (size(ws) - (n - 1)).cast("double")
      when(size(ws) >= n,
        round(lit(1.0) -
          size(graft.functions.ShingleHashes.sortedShingleHashes(ws, n))
            .cast("double") / total, 4))
        .otherwise(lit(0.0))
    }
    docs.select(col(idCol),
      dupFrac(2).as("dup2_frac"),
      dupFrac(3).as("dup3_frac"))
  }

  /** Byte-compressibility quality signal (LLM-data curation: degenerate /
    * templated / looping text deflates far smaller than natural prose, so
    * pipelines cut on compressed/raw ratio alongside the n-gram
    * repetition fractions). One `Deflater` per PARTITION, reset per row
    * (the expensive-handle `mapPartitions` contract — constructing a
    * native zlib stream per row would dominate), released via a
    * task-completion listener: tying `end()` to the last `next()` leaks
    * the native zlib stream on empty partitions, early-stopping consumers
    * (limit/take), and mid-partition task failures — the listener fires
    * on ALL task exits. Output bytes are counted, never buffered whole.
    * Not SQL-expressible → rows-only query + ordering property spec. */
  def compressionRatios(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
        org.apache.spark.TaskContext.get()
          .addTaskCompletionListener[Unit](_ => d.end())
        val buf = new Array[Byte](1 << 16)
        new Iterator[(Long, Double)] {
          def hasNext: Boolean = rows.hasNext
          def next(): (Long, Double) = {
            val (id, t) = rows.next()
            val bytes = if (t == null) Array.emptyByteArray else t.getBytes("UTF-8")
            d.reset(); d.setInput(bytes); d.finish()
            var n = 0L
            while (!d.finished()) n += d.deflate(buf)
            (id, if (bytes.isEmpty) 1.0 else math.rint(n.toDouble / bytes.length * 1e4) / 1e4)
          }
        }
      }.toDF(idCol, "compress_ratio")
  }

  /** PII scrubbing (training-data pipelines redact before the corpus ever
    * reaches a trainer): emails → [EMAIL], IPv4 literals → [IP],
    * phone-like digit runs → [PHONE]. Chained codegen `regexp_replace` —
    * a pure projection, no UDF. Order is load-bearing: emails first
    * (their local parts contain digits), then IPs (the phone rule would
    * otherwise eat the octets), then phones. Patterns are RE2-compatible
    * (no backtracking constructs), so the DuckDB oracle applies the SAME
    * three rewrites in the same order. */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    val ip = regexp_replace(email, "[0-9]{1,3}(\\.[0-9]{1,3}){3}", "[IP]")
    regexp_replace(ip, "\\+?[0-9][0-9 ()-]{6,}[0-9]", "[PHONE]")
  }

  /** Context-window chunking: cut each document's token stream into
    * overlapping windows of `window` tokens advancing by `window - overlap`
    * (the pretraining "split long docs into training windows" op; overlap
    * preserves cross-boundary context so no bigram is lost to a cut).
    *
    * Chunk i covers tokens `[i·stride, i·stride + window)`; the last chunk
    * is the first whose end reaches the document end (so it may be short,
    * but every token appears in ≥1 chunk and starts never run past n).
    * Pure per-row projection — `sequence → explode → slice` — zero
    * shuffle, embarrassingly parallel at any corpus size. The only lambda
    * (inside nothing) is avoided entirely: chunk text is built from the
    * exploded index with row-level `slice`/`concat_ws`, so the token array
    * is computed once per row, not per chunk (the HOF re-eval trap,
    * PERF.md finding 1, does not apply to post-explode row-level exprs).
    */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                window: Int, overlap: Int): DataFrame = {
    require(window > 0 && overlap >= 0 && overlap < window,
      s"need 0 <= overlap < window, got window=$window overlap=$overlap")
    val stride = window - overlap
    val base = docs.select(col(idCol), tokens(col(textCol)).as("__ws"))
      .select(col(idCol), col("__ws"), size(col("__ws")).as("__n"))
    // ceil((n - window) / stride) + 1 chunks (floor of the shifted divide;
    // token counts are ints, so the double divide is exact well past any
    // document length)
    val nChunks = when(col("__n") <= window, lit(1L))
      .otherwise(floor((col("__n") - window + (stride - 1)) / lit(stride)) + 1L)
    base
      .select(col(idCol), col("__ws"),
        explode(sequence(lit(0L), nChunks - 1L)).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx").cast("int").as("chunk_idx"),
        concat_ws(" ",
          slice(col("__ws"), (col("chunk_idx") * stride + 1).cast("int"),
            lit(window))).as("chunk"))
  }

  /** Document fingerprint: order-sensitive 64-bit rolling hash of the token
    * stream (hash chaining: acc' = xxhash64(acc, token), which is
    * position-sensitive and never overflows under ANSI mode, unlike a
    * polynomial `acc*31+h` accumulation). Distributed as a pure projection.
    * One codegen loop ([[graft.functions.RollingTokenHash]]) — the HOF
    * `aggregate(..., (acc, w) => xxhash64(acc, w))` form computes the same
    * chain but interprets its lambda per token (PERF.md finding 16). */
  def fingerprint(text: Column): Column =
    graft.functions.RollingTokenHash.rollingTokenHash(tokens(text))

  /** Fixed hashed-feature bucket count for [[dsirScores]]: 256 buckets
    * keyed by the first 2 hex chars of md5(bigram) — lexical string keys,
    * the [[Relational.hashSplit]] trick that makes the hash portable SQL
    * so a DuckDB oracle mirrors the bucketing exactly (no xxhash on the
    * oracle side). A CONSTANT, not a data-sized structure, so the weight
    * table genuinely is broadcast-safe by construction — the one shape
    * the no-small-by-construction rule exempts. */
  val DsirBuckets: Int = 256

  /** DSIR data selection scores (Xie et al., NeurIPS 2023,
    * arXiv:2302.03169): per-document importance weight
    * `log p_target(doc) − log p_raw(doc)` under hashed-bigram unigram-
    * of-features models with add-1 smoothing — the distribution-matching
    * selection step real pipelines run between quality filtering and
    * dedup (pick raw-corpus docs that look like the high-quality target).
    * Docs scoring high are target-like; selection = top-k by score.
    *
    * Scale shape: both distributions are ONE map-side-foldable aggregate
    * over the hashed gram streams (256 groups); the weight table is a
    * 256-row broadcast; scoring is one per-(doc, bucket) aggregate over
    * the corpus gram stream followed by a broadcast join + per-doc sum.
    * The corpus never shuffles except by (doc, bucket) — grams never
    * leave their scan task unaggregated. Weights are rounded to 6 dp and
    * DECIMAL-accumulated so summation order cannot move a score (and the
    * oracle's float arithmetic agrees bit-for-bit after the round).
    *
    * Returns (idCol, dsir_score DECIMAL) for corpus docs with ≥ 1 bigram
    * (shorter docs carry no feature evidence and drop, matching the
    * inner-join oracle shape). */
  def dsirScores(corpus: DataFrame, target: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val b = DsirBuckets
    val ws = tokens(col(textCol))
    val cnt = size(ws) - 1
    def gramBuckets(df: DataFrame): DataFrame = df
      .select(col(idCol).as("doc"),
        explode(when(size(ws) >= 2,
          arrays_zip(slice(ws, lit(1), cnt), slice(ws, lit(2), cnt)))
          .otherwise(array().cast("array<struct<`0`:string,`1`:string>>"))).as("bg"))
      .select(col("doc"),
        substring(md5(concat_ws(" ", col("bg.`0`"), col("bg.`1`"))), 1, 2).as("b"))
    // the corpus gram stream feeds the raw distribution AND the per-doc
    // feature counts — checkpointed only under the text-bytes bound
    // (r21: corpus-bigram-sized, the finding-37 ceiling)
    val corpusGrams = checkpointTokens(corpus, textCol, gramBuckets(corpus))
    // the two distributions are ≤256-row aggregates: collect them (the
    // tiny-frame pattern, PERF.md finding 21) instead of checkpointing,
    // so the target gram stream is scanned exactly once — and in ONE
    // action (r22): a source-tagged union aggregates both distributions
    // in a single job instead of two sequential collects (counts are
    // exact integers either way; the weight-table arithmetic below is
    // unchanged)
    val both = corpusGrams.select(lit(0).as("__src"), col("b"))
      .unionAll(gramBuckets(target).select(lit(1).as("__src"), col("b")))
      .groupBy("__src", "b").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val rawCounts = both.collect { case ((0, b2), c2) => b2 -> c2 }
    val tgtCounts = both.collect { case ((1, b2), c2) => b2 -> c2 }
    val nr = rawCounts.valuesIterator.sum
    val nt = tgtCounts.valuesIterator.sum
    val spark = corpus.sparkSession
    import spark.implicits._
    // weight table from the collected counts, but log/round evaluated
    // IN-PLAN so the rounding semantics are Spark's own (matching every
    // other oracled float round in this repo)
    val weights = broadcast(
      (0 until b).map { i =>
        val k = f"$i%02x"
        (k, tgtCounts.getOrElse(k, 0L), rawCounts.getOrElse(k, 0L))
      }.toDF("b", "ct", "cr")
        .select(col("b"),
          round(log(col("ct") + lit(1.0)) - log(lit(nt.toDouble + b))
              - log(col("cr") + lit(1.0)) + log(lit(nr.toDouble + b)), 6)
            .cast("decimal(18,6)").as("wb")))
    corpusGrams.groupBy("doc", "b").agg(count(lit(1)).as("n"))
      .join(broadcast(weights), Seq("b"))
      .groupBy("doc")
      .agg(sum(col("n").cast("decimal(18,0)") * col("wb")).as("dsir_score"))
      .select(col("doc").as(idCol), col("dsir_score"))
  }
}
