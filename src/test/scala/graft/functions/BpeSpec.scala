package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The BPE trainer/encoder: planted merge recovery, deterministic
  * ordering, lossless round-trips, and the distributed encode path. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("planted corpus: dominant pair merges first, merges chain") {
    // "aaab" x 50, "ccd" x 10: pair (a,a) dominates (2 per word x 50),
    // then (aa,a), then (aa+a, b) ... tie-breaks deterministic
    val docs = (1 to 50).map(i => (i.toLong, "aaab")) ++
      (51 to 60).map(i => (i.toLong, "ccd"))
    val df = docs.toDF("doc_id", "text")
    val m = Bpe.train(df, "text", nMerges = 3)
    // deterministic chain: (a,a) dominates; then (aa,a) ties (a,b) at 50
    // and the lexicographic tie-break picks (a,b); then (aa,ab) merges
    // the whole word
    assert(m.ranked === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    val toks = Bpe.encodeText("aaab", m)
    assert(toks.mkString === "aaab")
    assert(toks === Seq("aaab"))
    // determinism: retraining yields identical merges
    assert(Bpe.train(df, "text", nMerges = 3).ranked === m.ranked)
  }

  test("whitespace pre-tokenization reconstructs exactly") {
    val s = "  leading and  double  spaces\ttabs\nnewlines trailing  "
    assert(Bpe.pretokenize(s).mkString === s)
    val m = Bpe.Merges(Seq(("a", "n"), ("t", "h")))
    assert(Bpe.encodeText(s, m).mkString === s)
  }

  test("OOV symbols and empty/degenerate docs survive") {
    val m = Bpe.Merges(Seq(("a", "b")))
    assert(Bpe.encodeText("", m) === Seq.empty)
    assert(Bpe.encodeText("ab", m) === Seq("ab"))
    assert(Bpe.encodeText("日本語 text", m).mkString === "日本語 text")
    assert(Bpe.encodeText("x", m) === Seq("x"))
    // unbroken blobs past the merge cap pass through whole (lossless,
    // no quadratic merge walk)
    val blob = "a" * (Bpe.MaxMergeTokenLen + 50)
    assert(Bpe.encodeText(s"pre $blob post", m).mkString ===
      s"pre $blob post")
    assert(Bpe.encodeText(blob, m) === Seq(blob))
  }

  test("vocabulary ids: deterministic, UNK for unseen, round-trip by id") {
    val docs = (1L to 40L).map(i => (i, "abab cdcd abab")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", nMerges = 4)
    // trained alphabet covers everything seen, including the space run
    assert(m.chars.contains(" "))
    val v = Bpe.vocabOf(m, m.chars)
    // ids dense, deterministic, UNK reserved at 0
    assert(v.UnkId === 0)
    assert(v.idOf.values.min === 1)
    assert(v.idOf.values.toSeq.distinct.length === v.idOf.size)
    assert(Bpe.vocabOf(m, m.chars).idOf === v.idOf)
    // unseen symbol maps to UNK; known merge products don't
    assert(v.id("zzz-never-seen") === 0)
    assert(v.id(m.ranked.head._1 + m.ranked.head._2) > 0)
    val ids = Bpe.encodeIds(docs, "doc_id", "text", m)
      .select(col("token_ids")).as[Seq[Int]].head()
    assert(ids.nonEmpty && ids.forall(_ > 0), s"unexpected UNK in $ids")
  }

  test("distributed encode: lossless over a corpus, merges applied") {
    val docs = (1L to 200L).map(i =>
      (i, s"the cat sat on the mat ${i % 7} times, the end"))
      .toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", nMerges = 50)
    val enc = Bpe.encode(docs, "doc_id", "text", m)
      .select(col("doc_id"), concat_ws("", col("tokens")).as("r"),
        size(col("tokens")).as("n"))
      .as[(Long, String, Int)].collect()
    val texts = docs.as[(Long, String)].collect().toMap
    enc.foreach { case (id, r, _) => assert(r === texts(id)) }
    // real compression: " the" and friends merge, tokens < chars
    val totalTokens = enc.map(_._3).sum
    val totalChars = texts.values.map(_.length).sum
    assert(totalTokens < totalChars / 2,
      s"expected >2x compression, got $totalTokens tokens / $totalChars chars")
  }
}
