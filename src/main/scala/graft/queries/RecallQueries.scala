package graft.queries

import graft.{NamedQuery, Tables}
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-visible correctness traces for the APPROXIMATE operators
  * (SURVEY.md §2.10 + §2.5): each query here computes the approximate
  * result AND its exact reference in the same plan and returns the
  * comparison (recall / precision / relative error) as rows. The
  * approximate side is not ANSI-SQL-expressible, so these are rows-only
  * driver entries — but the returned values are deterministic (fixed
  * seeds, deterministic tie-breaks), so regressions in the approximate
  * operators surface as changed recall rows in the verify dump, not just
  * as ScalaTest failures invisible to the driver.
  */
object RecallQueries {

  private def probes(s: SparkSession, d: String) =
    Tables.embeddings(s, d).filter(col("vec_id") < 10)

  /** recall@5 per probe of one ANN result against the exact top-5. */
  private def topkRecall(exact: DataFrame, approx: DataFrame): DataFrame = {
    val e = exact.select(col("q_id"), col("vec_id"))
    val a = approx.select(col("q_id"), col("vec_id").as("a_vec"))
    e.join(a, e("q_id") === a("q_id") && col("vec_id") === col("a_vec"),
        "left_outer")
      .groupBy(e("q_id"))
      .agg(count(lit(1)).as("n_exact"),
        count(col("a_vec")).as("n_hit"))
      .select(col("q_id"), col("n_exact"), col("n_hit"),
        round(col("n_hit") / col("n_exact"), 6).as("recall"))
  }

  /** q95: IVF ANN (q71's exact configuration) recall@5 vs brute force. */
  private val q95 = NamedQuery(
    "q95_ann_ivf_recall",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      topkRecall(
        Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          probes(s, d), "vec_id", "embedding", 5),
        Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
          probes(s, d), "vec_id", "embedding", 5, 4, spill = 2))
    },
    None)

  /** q96: sign-LSH ANN (q74's exact configuration) recall@5 vs brute
    * force. */
  private val q96 = NamedQuery(
    "q96_ann_lsh_recall",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      topkRecall(
        Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          probes(s, d), "vec_id", "embedding", 5),
        Similarity.lshTopK(emb, "vec_id", "embedding",
          probes(s, d), "vec_id", "embedding", 5, dims = 64,
          nBits = 48, nBands = 12))
    },
    None)

  /** q97: LSH near-dup pairs (q88's configuration) vs the exact all-pairs
    * set (q72's): one summary row. Precision is 1.0 by construction (every
    * LSH candidate is exact-verified against the same threshold); recall
    * is the banding tradeoff being certified. */
  private val q97 = NamedQuery(
    "q97_neardup_lsh_recall",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val exact = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.45)
        .select(col("id_a"), col("id_b"))
      val lsh = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.45,
          dims = 64, nBits = 64, nBands = 16)
        .select(col("id_a"), col("id_b"), lit(1).as("hit"))
      exact.join(lsh, Seq("id_a", "id_b"), "full_outer")
        .agg(count(lit(1)).as("n_union"),
          sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_lsh"))
        .join(exact.agg(count(lit(1)).as("n_exact")))
        .select(col("n_exact"), col("n_lsh"),
          round(col("n_lsh") / col("n_exact"), 6).as("recall"),
          // union size == exact size ⇔ no false positives
          round(col("n_exact") / col("n_union"), 6).as("precision_floor"))
    },
    None)

  /** q98: HLL++ approx_count_distinct (q17b's aggregate) relative error vs
    * the exact distinct count, per group. */
  private val q98 = NamedQuery(
    "q98_hll_rel_error",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"))
      .select(col("l_returnflag"), col("exact_orders"), col("approx_orders"),
        round(abs(col("approx_orders") - col("exact_orders")) /
          col("exact_orders"), 6).as("rel_error")),
    None)

  /** q99: SimHash chunk-banding (q63's candidate generator) recall vs the
    * exact all-pairs Hamming scan — the pigeonhole guarantee (≤3 differing
    * bits leave one 16-bit chunk intact) made driver-visible: recall must
    * be exactly 1.0. The all-pairs reference is quadratic and exists ONLY
    * as this fixture-scale certificate; the banded path is the operator. */
  private val q99 = NamedQuery(
    "q99_simhash_band_recall",
    (s, d) => {
      val sigs = Dedup.simhash(Tables.documents(s, d), "doc_id", "text")
      val exact = sigs.as("a").join(sigs.as("b"),
          col("a.doc_id") < col("b.doc_id") &&
          expr("bit_count(a.simhash ^ b.simhash)") <= 3)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      val banded = Dedup.simhashPairs(Tables.documents(s, d), "doc_id",
          "text", 3)
        .select(col("id_a"), col("id_b"), lit(1).as("hit"))
      exact.join(banded, Seq("id_a", "id_b"), "left_outer")
        .agg(count(lit(1)).as("n_exact"),
          sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_banded"))
        .select(col("n_exact"), col("n_banded"),
          when(col("n_exact") === 0, lit(1.0))
            .otherwise(round(col("n_banded") / col("n_exact"), 6))
            .as("recall"))
    },
    None)

  /** q106: IVF with a TRAINED coarse quantizer (3 Lloyd rounds over
    * hash-seeded centroids, spill=2 redundant assignment) instead of the
    * fixture's label column —
    * the cells now track vector geometry, which is what a 100 TB corpus
    * without meaningful pre-clustering needs. Same recall@5 certificate
    * shape as q95; the values show what training buys. */
  private val q106 = NamedQuery(
    "q106_ann_ivf_trained_recall",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val cells = Similarity.trainCells(emb, "vec_id", "embedding",
        nCells = 16, iters = 3)
      val withCell = emb.select(col("vec_id"), col("embedding"))
        .join(cells, Seq("vec_id"))
      topkRecall(
        Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          probes(s, d), "vec_id", "embedding", 5),
        Similarity.ivfTopK(withCell, "vec_id", "embedding", "cell",
          probes(s, d), "vec_id", "embedding", 5, 6, spill = 2))
    },
    None)

  /** q109: approx_percentile (the quantile sketch) relative error vs the
    * exact percentile, per quartile of the lineitem price column — the
    * quantile member of the sketch family certificate (q98 covers HLL).
    * The sketch's accuracy parameter is pinned, and the aggregation runs
    * over ONE partition: Greenwald–Khanna partial-sketch merges are not
    * strictly order-independent, so a multi-partition plan could emit
    * different (all within-guarantee) quantiles run to run — the
    * single-partition fold makes the certified values deterministic. */
  private val q109 = NamedQuery(
    "q109_quantile_sketch_error",
    (s, d) => {
      val exact = expr(
        "percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("ex")
      val approx = expr(
        "approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 1000)")
        .as("ap")
      Tables.lineitem(s, d).select(col("l_extendedprice"))
        .coalesce(1).agg(exact, approx)
        .select(explode(arrays_zip(
          array(lit(0.25), lit(0.5), lit(0.75)).as("q"),
          col("ex"), col("ap"))).as("r"))
        .select(col("r.q"), col("r.ex").as("exact"),
          col("r.ap").as("approx"),
          round(abs(col("r.ap") - col("r.ex")) /
            abs(col("r.ex")), 6).as("rel_error"))
    },
    None)

  /** q110: Misra–Gries heavy-hitters guarantee, driver-visible. The
    * sketch (k=50 counters, O(k) shuffle per group at any scale) must
    * contain EVERY token whose true frequency exceeds n/(k+1) — that
    * containment is order-independent even though individual sketch
    * counts are not, so the output (true heavy hitters + membership) is
    * deterministic. */
  private val q110 = NamedQuery(
    "q110_heavy_hitters",
    (s, d) => {
      import s.implicits._
      import graft.functions.{FrequentItems, TextFunctions}
      // pin the exploded token stream once: the sketch scan and the exact
      // reference both read the materialized blocks
      val toks = Tables.documents(s, d)
        .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
        .localCheckpoint()
      val k = 50
      val sketch: Map[String, Long] = toks.as[String]
        .select(new FrequentItems(k).toColumn).head()
      val exact = toks.groupBy(col("tok"))
        .agg(count(lit(1)).as("exact_count")).localCheckpoint()
      // n from the exact counts — no third pass over the stream
      val n = exact.agg(sum(col("exact_count"))).head().getLong(0)
      exact
        .filter(col("exact_count") > lit(n / (k + 1)))
        .select(col("tok"), col("exact_count"),
          col("tok").isInCollection(sketch.keys.toSeq).as("in_sketch"))
    },
    None)

  /** q127: INCREMENTAL IVF index maintenance certificate. A growing
    * corpus cannot rebuild its ANN index per batch: the index is built on
    * 75% of the embeddings, the remaining 25% arrives as two appended
    * micro-batches placed by the SAVED centroid model
    * (Similarity.appendIvfIndex — new files in existing cell partitions,
    * no history rewrite), then compacted. The certificate compares, per
    * probe, recall@5 of (a) the appended+compacted index and (b) a full
    * rebuild on the same final corpus, both against brute force — the
    * drift cost of append-only maintenance, made driver-visible. */
  private val q127 = NamedQuery(
    "q127_ann_ivf_append_recall",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val base = emb.filter(col("vec_id") % 4 =!= 0)
      val appended = graft.TempDirs.create("graft_ivf_appended")
      Similarity.writeIvfIndex(base, "vec_id", "embedding", appended,
        nCells = 16, iters = 3, spill = 2)
      Similarity.appendIvfIndex(emb.filter(col("vec_id") % 8 === 0),
        "vec_id", "embedding", appended, spill = 2)
      Similarity.appendIvfIndex(emb.filter(col("vec_id") % 8 === 4),
        "vec_id", "embedding", appended, spill = 2)
      val compacted = graft.TempDirs.create("graft_ivf_compacted")
      Similarity.compactIvfIndex(s, appended, compacted)
      val rebuilt = graft.TempDirs.create("graft_ivf_rebuilt")
      Similarity.writeIvfIndex(emb, "vec_id", "embedding", rebuilt,
        nCells = 16, iters = 3, spill = 2)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        probes(s, d), "vec_id", "embedding", 5)
      val app = topkRecall(exact,
          Similarity.probeIvfIndex(s, compacted, probes(s, d), "vec_id",
            "embedding", 5, nprobe = 6))
        .select(col("q_id"), col("n_exact"),
          col("recall").as("recall_appended"))
      val reb = topkRecall(exact,
          Similarity.probeIvfIndex(s, rebuilt, probes(s, d), "vec_id",
            "embedding", 5, nprobe = 6))
        .select(col("q_id"), col("recall").as("recall_rebuilt"))
      app.join(reb, Seq("q_id"))
        .select(col("q_id"), col("n_exact"), col("recall_appended"),
          col("recall_rebuilt"),
          round(col("recall_rebuilt") - col("recall_appended"), 6)
            .as("drift_cost"))
    },
    None)

  /** q133: SemDeDup (cluster-partitioned semantic dedup,
    * Dedup.semanticDedup) vs the exact all-pairs drop set under the same
    * threshold and keep-lowest-id rule. Every semantic drop is
    * exact-verified within its cell, so the drop set is a SUBSET of the
    * exact one — precision must be exactly 1.0; recall is the price of
    * confining comparisons to cells (|corpus|²/nCells work instead of
    * |corpus|²), certified driver-visibly like q97's banding tradeoff. */
  private val q133 = NamedQuery(
    "q133_semantic_dedup",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val exact = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.45)
        .select(col("id_b").as("drop_id")).distinct()
        .withColumn("ex", lit(1))
      val sem = Dedup.semanticDedup(emb, "vec_id", "embedding",
          nCells = 8, tau = 0.45)
        .withColumn("sm", lit(1))
      exact.join(sem, Seq("drop_id"), "full_outer")
        .agg(sum(col("ex")).as("n_exact"),
          sum(col("sm")).as("n_sem"),
          sum(col("ex") * col("sm")).as("n_inter"))
        .select(col("n_exact"), col("n_sem"),
          round(col("n_inter") / col("n_exact"), 6).as("recall"),
          round(col("n_inter") / col("n_sem"), 6).as("precision"))
    },
    None)

  val all: Seq[NamedQuery] =
    Seq(q95, q96, q97, q98, q99, q106, q109, q110, q127, q133)
}
