package graft.queries

import graft.{SparkEntry, SparkSpec, TempDirs}

/** Planted-truth bars for the bigram-LM perplexity scorer (q139): a
  * document whose bigrams dominate the corpus LM must score far lower
  * perplexity than word-salad documents, and the bigram count must be
  * exactly len(tokens)−1. */
class QualityLmSpec extends SparkSpec {
  import spark.implicits._

  private def plantedDir: String = {
    val dir = TempDirs.create("graft_lm_planted")
    val vocab = (0 until 50).map(i => s"w$i")
    def salad(seed: Int): String = {
      val rnd = new scala.util.Random(seed)
      (0 until 80).map(_ => vocab(rnd.nextInt(50))).mkString(" ")
    }
    val rows = (1 to 20).map(i => (i.toLong, salad(i), "en", s"src$i", 0L)) :+
      (0L, Seq.fill(40)("alpha beta").mkString(" "), "en", "src0", 0L)
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("repeated-bigram doc scores far below word-salad perplexity") {
    val rows = SparkEntry.queries("q139_bigram_lm_perplexity")(
        spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(rows.length === 21)
    val planted = rows.find(_._1 == 0L).get
    assert(planted._2 === 79, "bigram count must be len(tokens)-1")
    val saladMean = rows.filter(_._1 != 0L).map(_._3).sum / 20
    assert(planted._3 < saladMean / 4,
      s"planted perplexity ${planted._3} not far below salad mean $saladMean")
    assert(rows.forall(r => r._3 > 0 && java.lang.Double.isFinite(r._3)))
  }
}
