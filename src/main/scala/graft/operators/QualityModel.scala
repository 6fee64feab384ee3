package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the fastText-style classifier stage
  * (Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification"; the CCNet/GPT-3-style "looks like good text" filter)
  * that complements the heuristic quality signals (q65 ratios, q139
  * LM perplexity): a LOGISTIC REGRESSION over hashed word uni+bigram
  * features, trained corpus-side, applied corpus-wide.
  *
  * Reference behavior surface: JeremyBuchanan/telescope-data-pipeline has
  * no text-curation stage; this extends §2.10 with the standard public
  * recipe (hashing trick + averaged n-gram bag + driver-side SGD).
  *
  * Scale posture — the bounded-model pattern (q139 / LSH-planes):
  *   - FEATURES are a pure codegen expression ([[featureIdxs]]:
  *     xxhash64 → pmod), identical on the train and score paths by
  *     construction (the trainer evaluates the same Column), so there
  *     is no JVM-vs-SQL hash-parity risk;
  *   - TRAINING collects only a CAPPED sample pool (TakeOrdered by a
  *     deterministic hash — `sampleCap` rows of sparse indices, a few
  *     MB) and runs deterministic driver-side SGD over it — the one
  *     driver loop, over a bounded object, like the PQ/OPQ codebooks;
  *   - SCORING broadcasts the weight vector as ONE array literal and
  *     evaluates `bias + mean(w[idx])` per row with
  *     `aggregate`/`element_at` — codegen'd, shuffle-free,
  *     scan-parallel; a 100 TB corpus scores in one pass with no joins.
  *
  * The averaged (mean, not summed) feature representation is fastText's
  * own and is what makes scoring robust at scale: one hash collision
  * with a spam-weighted bucket moves a 300-feature document's logit by
  * w/300, not w.
  */
object QualityModel {

  /** Trained classifier: `dim` hashed-bucket weights + bias. Driver-side
    * value, broadcast into the scoring expression as a literal. */
  final case class Model(weights: Array[Double], bias: Double, dim: Int)

  /** Hashed feature indices of a token array: word unigrams + adjacent
    * bigrams, each mapped to `pmod(xxhash64(gram), dim)`. Repetition is
    * kept (term frequency lives in the multiset). Pure codegen chain. */
  def featureIdxs(toks: Column, dim: Int): Column = {
    val d = lit(dim.toLong)
    val uni = transform(toks, t => pmod(xxhash64(t), d))
    val bi = transform(sequence(lit(1), size(toks) - 1),
      i => pmod(xxhash64(concat_ws(" ",
        element_at(toks, i), element_at(toks, i + 1))), d))
    // sequence(1, 0) would DESCEND ([1,0]) — guard the one-token doc
    when(size(toks) >= 2, concat(uni, bi)).otherwise(uni)
  }

  /** Mean-pooled logit of a token array under `m`:
    * `bias + avg(weights[idx])` — the fastText forward pass as one
    * codegen expression (weights are a single array literal; no join,
    * no UDF, no shuffle). Empty docs score the bare bias. */
  def logitCol(toks: Column, m: Model): Column = {
    val idxs = featureIdxs(toks, m.dim)
    val w = lit(m.weights)
    when(size(idxs) > 0,
      lit(m.bias) + aggregate(idxs, lit(0.0),
        (acc, i) => acc + element_at(w, (i + 1).cast("int"))) / size(idxs))
      .otherwise(lit(m.bias))
  }

  /** Train on `docs`: `labelCol` boolean (true = keep-quality),
    * `toksCol` the token array, `orderCol` a unique id whose xxhash64
    * orders the deterministic sample (TakeOrdered `sampleCap` → the
    * bounded driver pool). SGD is seed-free and order-deterministic:
    * zero init, fixed epoch count, per-epoch decaying rate, pool
    * iterated in hash order — the same corpus always yields the same
    * model. */
  def train(docs: DataFrame, labelCol: String, toksCol: Column,
      orderCol: String, dim: Int = 4096, sampleCap: Int = 2000,
      epochs: Int = 10, lr0: Double = 0.5): Model = {
    require(dim > 0 && sampleCap > 0 && epochs > 0)
    import org.apache.spark.sql.Row
    // bounded collect: sampleCap rows of (label, sparse indices) — the
    // capped-seed-pool pattern, a few MB regardless of corpus size
    val pool: Array[(Boolean, Array[Long])] = docs
      .select(col(labelCol).cast("boolean").as("y"),
        featureIdxs(toksCol, dim).as("x"),
        xxhash64(col(orderCol)).as("ord"))
      .orderBy(col("ord"), col(orderCol))
      .limit(sampleCap)
      .collect()
      .map { case Row(y: Boolean, x: scala.collection.Seq[_], _) =>
        (y, x.map(_.asInstanceOf[Long]).toArray)
      }
    val w = new Array[Double](dim)
    var b = 0.0
    var e = 0
    while (e < epochs) {
      val lr = lr0 / (1.0 + e)
      pool.foreach { case (y, idxs) =>
        val n = idxs.length
        var z = b
        if (n > 0) {
          var s = 0.0
          var j = 0
          while (j < n) { s += w(idxs(j).toInt); j += 1 }
          z += s / n
        }
        val p = 1.0 / (1.0 + math.exp(-z))
        val g = p - (if (y) 1.0 else 0.0)
        b -= lr * g
        if (n > 0) {
          val step = lr * g / n
          var j = 0
          while (j < n) { w(idxs(j).toInt) -= step; j += 1 }
        }
      }
      e += 1
    }
    Model(w, b, dim)
  }
}
