package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair encoding — the REAL merge-learning tokenizer a training
  * pipeline runs over its corpus (q66's regex tokenizer measures counts;
  * this one builds and applies an actual vocabulary).
  *
  * Scale shape, the standard one: the corpus-sized work is ONE
  * distributed word-frequency aggregation (pre-tokenization splits on
  * `\S+|\s+` runs, so whitespace is itself tokenized and detokenization
  * is exact concatenation); the merge loop then runs driver-side over the
  * frequency-capped word table (top `maxWords` by count — the table is a
  * bounded model object, and rare tail words contribute nothing to pair
  * counts that matters at vocabulary scale). Encoding broadcasts the
  * ranked merge list and runs embarrassingly parallel per partition.
  *
  * Determinism: merge selection tie-breaks (count desc, pair lexicographic),
  * and the word-table cap tie-breaks (count desc, word) — same corpus,
  * same merges, every run.
  */
object Bpe {

  final case class Merges(ranked: Seq[(String, String)],
      /** Distinct characters of the training table — the vocabulary's
        * base alphabet (merge pairs alone never cover symbols that never
        * merged, e.g. single spaces). */
      chars: Seq[String] = Seq.empty) {
    /** pair → rank, lower merges first. */
    lazy val rank: Map[(String, String), Int] =
      ranked.zipWithIndex.toMap
  }

  /** Pre-tokenize: alternating non-space/space runs — concatenation of
    * the pieces reproduces the text byte-for-byte. */
  private[graft] def pretokenize(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < text.length) {
      val ws = Character.isWhitespace(text.charAt(i))
      var j = i + 1
      while (j < text.length && Character.isWhitespace(text.charAt(j)) == ws)
        j += 1
      out += text.substring(i, j)
      i = j
    }
    out.toSeq
  }

  /** Learn `nMerges` merges from the corpus: one distributed word count,
    * then the classic frequency-table merge loop on the driver. */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 50000): Merges = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words: Array[(String, Long)] = docs
      .select(col(textCol).as[String])
      .flatMap(t => if (t == null) Nil else pretokenize(t))
      // blob guard: tokens past the merge cap never merge, so keeping
      // them in the table would only slow every pair-count iteration
      .filter((w: String) => w.length <= MaxMergeTokenLen)
      .groupByKey(identity)
      .count()
      // bounded model table: top maxWords by (count desc, word) — the
      // deterministic cap that keeps the driver loop driver-sized
      .orderBy(col("count(1)").desc, col("key"))
      .limit(maxWords)
      .as[(String, Long)]
      .collect()
    // driver loop over symbolized words
    var table: Array[(Array[String], Long)] =
      words.map { case (w, n) => (w.map(_.toString).toArray, n) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var it = 0
    while (it < nMerges) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      table.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) it = nMerges
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        table = table.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val out = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 &&
                  syms(i + 1) == best._2) { out += joined; i += 2 }
              else { out += syms(i); i += 1 }
            }
            (out.toArray, n)
          }
        }
        it += 1
      }
    }
    Merges(merges.toSeq,
      words.flatMap(_._1.map(_.toString)).distinct.sorted.toSeq)
  }

  /** Pre-tokens longer than this bypass merging (emitted whole — still
    * lossless): the greedy apply is O(len²) per token, and real corpora
    * contain unbroken base64/URL blobs that would stall an executor;
    * no useful vocabulary merge lives in them anyway. */
  val MaxMergeTokenLen = 1000

  /** Encode one string: greedy lowest-rank-first pair merging per
    * pre-token (the standard BPE apply algorithm). */
  def encodeText(text: String, merges: Merges): Seq[String] =
    pretokenize(text).flatMap { w =>
      if (w.length > MaxMergeTokenLen) Seq(w)
      else {
        var syms = w.map(_.toString).toVector
        var done = false
        while (!done && syms.length > 1) {
          var bestRank = Int.MaxValue
          var bestAt = -1
          var i = 0
          while (i < syms.length - 1) {
            merges.rank.get((syms(i), syms(i + 1))).foreach { r =>
              if (r < bestRank) { bestRank = r; bestAt = i }
            }
            i += 1
          }
          if (bestAt < 0) done = true
          else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
            syms.drop(bestAt + 2)
        }
        syms
      }
    }

  /** Tokenize a corpus: merge ranks broadcast by closure, one pass per
    * partition, no shuffle. Output rows: (id, tokens). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Merges): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, String)] =
      graft.operators.Scale.fanOut(
        docs.select(col(idCol).cast("long").as(idCol), col(textCol)), idCol)
        .as[(Long, String)]
    ds.mapPartitions(_.map { case (id, text) =>
      (id, if (text == null) Seq.empty[String] else encodeText(text, merges))
    }).toDF(idCol, "tokens")
  }

  /** Deterministic vocabulary over a merge list: every merge product in
    * rank order, preceded by the id-0 unknown marker — base characters
    * and capped blobs fall through to UNK, the standard closed-vocab
    * contract (a byte-level vocab would enumerate the 256 base symbols
    * instead; the id assignment stays reproducible either way). */
  final case class Vocab(idOf: Map[String, Int]) {
    val UnkId = 0
    def id(token: String): Int = idOf.getOrElse(token, UnkId)
    def size: Int = idOf.size + 1
  }

  def vocabOf(merges: Merges, baseSymbols: Seq[String] = Seq.empty): Vocab =
    Vocab((baseSymbols ++ merges.ranked.map { case (a, b) => a + b })
      .distinct.zipWithIndex.map { case (t, i) => t -> (i + 1) }.toMap)

  /** Corpus → (id, token_ids): the training-batch shape. The trained
    * character alphabet seeds the vocabulary, so only characters the
    * training table never saw map to UNK. */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
      merges: Merges): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = vocabOf(merges, merges.chars)
    val ds: Dataset[(Long, String)] =
      graft.operators.Scale.fanOut(
        docs.select(col(idCol).cast("long").as(idCol), col(textCol)), idCol)
        .as[(Long, String)]
    ds.mapPartitions(_.map { case (id, text) =>
      (id, if (text == null) Seq.empty[Int]
           else encodeText(text, merges).map(vocab.id))
    }).toDF(idCol, "token_ids")
  }
}
