package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // a planted corpus with a real quality gradient: fluent English-like
  // sentences (stopword-rich, lexically diverse) vs degenerate junk
  // (digit spam, looping bigrams, no stopwords)
  private def plantedCorpus = {
    val clean = (1L to 40L).map { i =>
      (i, s"the quick report $i describes a method to measure the outcome " +
        s"of trial$i and the panel agreed in the end that result$i is sound",
        1.0)
    }
    val junk = (41L to 80L).map { i =>
      val loop = Seq.fill(12)(s"buy$i now$i").mkString(" ")
      (i, s"$loop 00$i 111 2222 $i$i$i 33 44 55 66 77 88 99 000", 0.0)
    }
    (clean ++ junk).toDF("doc_id", "text", "label")
  }

  test("features: one codegen projection, finite values, passthrough kept") {
    val f = QualityModel.features(plantedCorpus, "doc_id", "text",
      passthrough = Seq("label"))
    assert(f.columns.toSeq == Seq("doc_id", "label", "lexical_diversity",
      "avg_token_len", "stopword_ratio", "log_n_tok", "digit_token_ratio",
      "dup2_frac"))
    val rows = f.collect()
    assert(rows.length == 80)
    // no NaN/null leaks into the assembler
    rows.foreach { r =>
      (2 until 8).foreach { i =>
        assert(!r.isNullAt(i) && !r.getDouble(i).isNaN, s"bad feature at $i: $r")
      }
    }
    // the signals separate in the expected direction on the planted corpus
    val byLabel = f.groupBy("label")
      .agg(avg("stopword_ratio").as("sw"), avg("dup2_frac").as("dup"))
      .collect().map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(byLabel(1.0)._1 > byLabel(0.0)._1, s"stopword signal inverted: $byLabel")
    assert(byLabel(1.0)._2 < byLabel(0.0)._2, s"repetition signal inverted: $byLabel")
  }

  test("trainScore separates reference-like docs from junk") {
    val scored = QualityModel.trainScore(plantedCorpus, "doc_id", "text",
      col("label")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(scored.length == 80)
    val pos = scored.filter(_._2 == 1.0).map(_._3)
    val neg = scored.filter(_._2 == 0.0).map(_._3)
    // exact AUC over the planted labels: every (pos, neg) pair ordered
    // correctly scores 1, ties 0.5
    val auc = pos.flatMap(p => neg.map(n =>
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0)).sum / (pos.length * neg.length)
    assert(auc > 0.95, s"classifier failed to separate planted quality: auc=$auc")
    // scores are probabilities
    assert(scored.forall(s => s._3 >= 0.0 && s._3 <= 1.0))
  }

  test("trainScore generalizes: scores rank an UNLABELED gradient correctly") {
    // train on the planted extremes, score a middle doc that was present
    // but neutral-ish: a clean doc with mild digit noise should land
    // between the clean mean and the junk mean
    val mid = Seq((81L,
      "the method 123 describes 456 a result and the panel 789 agreed 000",
      0.0)).toDF("doc_id", "text", "label")
    val scored = QualityModel.trainScore(plantedCorpus.union(mid),
        "doc_id", "text", col("label")).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val cleanMean = (1L to 40L).map(scored).sum / 40
    val junkMean = (41L to 80L).map(scored).sum / 40
    assert(scored(81L) > junkMean && scored(81L) < cleanMean,
      s"mid-quality doc not between the extremes: ${scored(81L)} " +
        s"vs clean=$cleanMean junk=$junkMean")
  }
}
