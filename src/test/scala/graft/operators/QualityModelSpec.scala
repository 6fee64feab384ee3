package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** QualityModel beyond the q184/q184c fixture: deterministic training,
  * held-out separation on a synthetic two-vocabulary corpus, the
  * mean-pooling collision-robustness claim, and the degenerate-doc
  * edges (one token, empty string). */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies; docs mix mostly-A (good) or mostly-B
  // (junk), with per-doc variation so no two docs are identical
  private def corpus(n: Int) = (0 until n).map { i =>
    val good = i % 2 == 0
    val base =
      if (good) s"alpha bravo charlie delta echo word$i alpha bravo"
      else s"spamx spamy spamz spamw spamv junk$i spamx spamy"
    (i.toLong, good, base)
  }.toDF("id", "label_good", "text")

  private def toks = TextFunctions.tokens(col("text"))

  test("training is deterministic and separates a held-out split") {
    val df = corpus(120)
    val train = df.filter(col("id") % 10 < 8)
    val m1 = QualityModel.train(train, "label_good", toks, "id", dim = 512)
    val m2 = QualityModel.train(train, "label_good", toks, "id", dim = 512)
    assert(m1.bias === m2.bias)
    assert(m1.weights.toSeq === m2.weights.toSeq)
    val holdout = df.filter(col("id") % 10 >= 8)
      .select(col("label_good"),
        (QualityModel.logitCol(toks, m1) > 0).as("pred"))
      .collect()
    assert(holdout.length === 24)
    assert(holdout.forall(r => r.getBoolean(0) === r.getBoolean(1)),
      "held-out misclassification")
  }

  test("mean pooling bounds a single collision's influence") {
    val df = corpus(120)
    val m = QualityModel.train(df, "label_good", toks, "id", dim = 512)
    // a long good doc carrying ONE junk token still scores positive:
    // the poisoned bucket contributes w/n, not w
    val mixed = Seq((0L, ("alpha bravo charlie delta echo " * 8) + "spamx"))
      .toDF("id", "text")
      .select(QualityModel.logitCol(toks, m).as("z"))
      .as[Double].head()
    assert(mixed > 0, s"one collision flipped a 41-token doc: $mixed")
    // whereas a pure junk doc is firmly negative
    val junk = Seq((1L, "spamx spamy spamz spamw"))
      .toDF("id", "text")
      .select(QualityModel.logitCol(toks, m).as("z"))
      .as[Double].head()
    assert(junk < 0)
  }

  test("degenerate docs: one token has no bigram; empty text scores bias") {
    val m = QualityModel.Model(Array.fill(64)(0.25), bias = -1.0, dim = 64)
    val one = Seq(Tuple1("solo")).toDF("text")
      .select(QualityModel.logitCol(toks, m).as("z")).as[Double].head()
    // one feature (the unigram), weight 0.25 everywhere → -1 + 0.25
    assert(math.abs(one - (-0.75)) < 1e-12)
    // tokens("") yields [""] in Spark split semantics — still one feature,
    // never a divide-by-zero or a descending-sequence bigram
    val empty = Seq(Tuple1("")).toDF("text")
      .select(QualityModel.logitCol(toks, m).as("z")).as[Double].head()
    assert(math.abs(empty - (-0.75)) < 1e-12)
  }

  test("featureIdxs emits uni+bigrams with repetition, all within dim") {
    val idxs = Seq(Tuple1("a b a b")).toDF("text")
      .select(QualityModel.featureIdxs(toks, 32).as("i"))
      .as[Seq[Long]].head()
    assert(idxs.length === 7) // 4 unigrams + 3 bigrams
    assert(idxs.forall(i => i >= 0 && i < 32))
    // repetition preserved: "a" appears twice and hashes identically
    assert(idxs.take(4).distinct.length === 2)
    assert(idxs.drop(4).distinct.length === 2) // "a b" twice, "b a" once
  }
}
