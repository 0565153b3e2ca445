package graft.ops

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the GPT-3 §2.2 / PaLM data-selection
  * shape (Brown et al. 2020, arXiv:2005.14165 Appendix A): train a linear
  * classifier to separate a TRUSTED REFERENCE slice (WebText/Wikipedia
  * there; a caller-chosen label here) from the raw crawl, score every
  * document with the model, and keep documents the classifier finds
  * reference-like. Complements the hand-tuned heuristics in
  * [[Text.qualityScore]]: the classifier LEARNS the decision surface over
  * those same signals instead of fixing thresholds per signal.
  *
  * Scale shape: features are pure codegen projections (one corpus scan,
  * zero shuffle — the [[Text.qualityScore]] / [[Text.repetitionSignals]]
  * expressions inlined); training is spark.ml logistic regression, whose
  * L-BFGS iterations are each ONE treeAggregate over the feature frame
  * (driver state = the coefficient vector, fixed-size, never data-sized);
  * scoring is a map-side transform with the coefficients broadcast. No
  * step materializes anything proportional to the corpus on the driver.
  */
object QualityModel {

  /** Per-document numeric feature vector source columns: the quality
    * heuristics a curation pipeline already computes, assembled for the
    * classifier. One codegen projection. The stopword / token-length /
    * duplicate-bigram signals are [[Text]]'s shared column helpers — the
    * SAME definitions [[Text.gopherFilter]] thresholds, so the learned
    * decision surface and the rule filter read identical signals by
    * construction. */
  def features(docs: DataFrame, idCol: String, textCol: String,
               passthrough: Seq[String] = Nil): DataFrame = {
    val ws = Text.tokens(col(textCol))
    val nTok = size(ws).cast("double")
    def frac(c: Column): Column = round(c.cast("double") / nTok, 6)
    docs.select(
      (col(idCol) +: passthrough.map(col)) ++ Seq(
      frac(size(array_distinct(ws))).as("lexical_diversity"),
      round(Text.avgTokenLen(col(textCol), ws), 6).as("avg_token_len"),
      round(Text.stopwordFrac(ws), 6).as("stopword_ratio"),
      round(log1p(nTok), 6).as("log_n_tok"),
      frac(size(filter(ws, w => w.rlike("^[0-9]+$")))).as("digit_token_ratio"),
      round(Text.dupBigramFrac(ws), 6).as("dup2_frac")): _*)
  }

  private val FeatureCols = Seq("lexical_diversity", "avg_token_len",
    "stopword_ratio", "log_n_tok", "digit_token_ratio", "dup2_frac")

  /** Train on `labelCol` (1.0 = trusted reference slice, 0.0 = raw) and
    * score every document. Returns (id, label, quality_score) with the
    * score = P(reference | features), rounded — the column a pipeline
    * thresholds or importance-samples on (GPT-3 kept documents by a
    * score-biased Pareto draw). Fixed hyperparameters keep the fit
    * reproducible for a given corpus up to float-reduction order. */
  private def fitOn(docs: DataFrame, idCol: String, textCol: String,
                    labelCol: Column) = {
    val labeled = docs.select(col(idCol), col(textCol),
      labelCol.cast("double").as("__label"))
    val feats = features(labeled, idCol, textCol, passthrough = Seq("__label"))
    val assembled = new VectorAssembler()
      .setInputCols(FeatureCols.toArray)
      .setOutputCol("__features")
      .setHandleInvalid("keep")
      .transform(feats)
      // the LR iterations each rescan their input: cache-equivalent
      // truncation, and the scoring pass reuses the same frame
      .localCheckpoint(true)
    val model = new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol("__label")
      .setMaxIter(50).setRegParam(0.01).setStandardization(true)
      .fit(assembled)
    (model, assembled)
  }

  def trainScore(docs: DataFrame, idCol: String, textCol: String,
                 labelCol: Column): DataFrame = {
    val (model, assembled) = fitOn(docs, idCol, textCol, labelCol)
    val scored = model.transform(assembled)
    // probability is a vector column (P(0), P(1)) — project the scalar
    // before returning: array/vector columns never leave a query surface
    scored.select(col(idCol), col("__label").as("label"),
      round(element_at(vector_to_array(col(model.getProbabilityCol)), 2), 4)
        .as("quality_score"))
  }

  /** Train only, returning the fitted coefficient vector and intercept —
    * the fixed-size artifact a serving/ingest layer ships. Same fit as
    * [[trainScore]]. */
  def train(docs: DataFrame, idCol: String, textCol: String,
            labelCol: Column): (Seq[Double], Double) = {
    val (model, _) = fitOn(docs, idCol, textCol, labelCol)
    (model.coefficients.toArray.toSeq, model.intercept)
  }

  /** σ(w·x + b) over the [[features]] columns as a pure codegen
    * expression — no mllib at apply time, so the same column scores a
    * STREAMING frame statelessly (coefficients ride the plan as
    * literals, the size of the feature list). The left-fold sum matches
    * BLAS ddot's index order, so batch `trainScore` and this expression
    * round to the same 4-dp probability. */
  def scoreColumn(coefficients: Seq[Double], intercept: Double): Column = {
    require(coefficients.length == FeatureCols.length,
      s"expected ${FeatureCols.length} coefficients, got ${coefficients.length}")
    val margin = FeatureCols.zip(coefficients)
      .map { case (f, w) => col(f) * lit(w) }
      .reduce(_ + _) + lit(intercept)
    round(lit(1.0) / (lit(1.0) + exp(-margin)), 4)
  }

  private def vector_to_array(c: Column): Column =
    org.apache.spark.ml.functions.vector_to_array(c)
}
