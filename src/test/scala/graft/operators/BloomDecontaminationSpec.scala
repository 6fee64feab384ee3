package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Certificate for the Bloom-prefiltered decontamination scale path
  * (Dedup.bloomContaminationPairs): result identity with the exact
  * operator, zero false negatives in the prefilter, and a measured
  * false-positive rate near the configured fpp. */
class BloomDecontaminationSpec extends SparkSpec {
  import spark.implicits._

  // synthetic corpus: 40 "benchmark" docs, 360 corpus docs of which every
  // 9th quotes a benchmark doc's text verbatim (guaranteed contamination)
  // and the rest are salted to share no 3-gram with any benchmark doc
  private def fixture = {
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def benchText(i: Int): String =
      (0 until 12).map(j => words((i * 5 + j * 7) % words.size)).mkString(" ")
    val bench = (0 until 40).map(i => (i.toLong, benchText(i)))
    val corpus = (0 until 360).map { i =>
      val id = 1000L + i
      if (i % 9 == 0) (id, benchText(i % 40))
      else (id, (0 until 12).map(j => s"u${i}w${j}").mkString(" "))
    }
    (bench.toDF("doc_id", "text"), corpus.toDF("doc_id", "text"))
  }

  test("bloom-prefiltered result is identical to the exact operator") {
    val (bench, corpus) = fixture
    val exact = Dedup.contaminationPairs(corpus, bench, "doc_id", "text", 3, 3)
      .as[(Long, Long, Long)].collect().toSet
    val bloomed =
      Dedup.bloomContaminationPairs(corpus, bench, "doc_id", "text", 3, 3)
        .as[(Long, Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture must plant contamination")
    assert(bloomed === exact)
  }

  test("prefilter covers every true overlap and fp rate stays near fpp") {
    val (bench, corpus) = fixture
    val fpp = 0.01
    val candidates =
      Dedup.bloomShingleCandidates(corpus, bench, "doc_id", "text", 3, fpp)
        .as[(Long, String)].collect().toSet
    val corpusShingles = Dedup.shingleSet(corpus, "doc_id", "text", 3)
      .as[(Long, String)].collect().toSet
    val benchShingles = Dedup.shingleSet(bench, "doc_id", "text", 3)
      .select(col("shingle")).as[String].collect().toSet
    val trueOverlap = corpusShingles.filter(p => benchShingles(p._2))
    // zero false negatives: a Bloom filter never loses an inserted item
    assert(trueOverlap.subsetOf(candidates))
    // false positives bounded: clean shingles that slipped through
    val clean = corpusShingles.size - trueOverlap.size
    val fps = candidates.size - trueOverlap.size
    assert(clean > 1000, "fixture must have a large clean majority")
    assert(fps.toDouble / clean < 10 * fpp,
      s"fp rate ${fps.toDouble / clean} far above configured $fpp")
    // and the prefilter genuinely shrinks the shuffle input
    assert(candidates.size < corpusShingles.size / 2)
  }

  test("determinism: two builds give the same candidate set") {
    val (bench, corpus) = fixture
    def run() =
      Dedup.bloomShingleCandidates(corpus, bench, "doc_id", "text", 3, 0.01)
        .as[(Long, String)].collect().toSet
    assert(run() === run())
  }
}
