package graft.queries

import graft.{NamedQuery, Tables}
import graft.Compat._
import graft.functions.VectorFunctions._
import graft.operators.{Dedup, Pq, Similarity}
import org.apache.spark.sql.functions._

/** Embedding similarity-search operators over the `embeddings` fixture
  * (SURVEY.md §2.10): brute-force cosine top-k (exact baseline), IVF
  * cell-probed ANN (scale path), cosine near-dup pairs, per-cluster stats.
  */
object VectorOps {

  private def probes(s: org.apache.spark.sql.SparkSession, d: String) =
    SharedAnn.probes(s, d)

  /** Exact cosine top-5 per probe vector — also the recall-cert family's
    * shared ground truth ([[SharedAnn.exactTop5]]: one scan per session,
    * byte-identical to the per-query build it replaced). */
  private val q70 = NamedQuery(
    "q70_cosine_topk",
    (s, d) => SharedAnn.exactTop5(s, d),
    Some("""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
      n AS (SELECT vec_id, e, SQRT(list_dot_product(e, e)) AS nrm FROM v),
      p AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM n WHERE vec_id < 50),
      j AS (SELECT p.q_id, n.vec_id,
              list_dot_product(p.qe, n.e) / (p.qn * n.nrm) AS cos_raw
            FROM p CROSS JOIN n WHERE n.vec_id <> p.q_id),
      r AS (SELECT q_id, vec_id, cos_raw,
              CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id) AS BIGINT) AS rank
            FROM j)
      SELECT q_id, vec_id, ROUND(cos_raw, 6) AS cosine, rank
      FROM r WHERE rank <= 5"""))

  /** IVF ANN (label cells, nprobe=4, spill=2: each vector indexed under
    * its 2 closest cells — measured recall@5 0.86 vs 0.42 for the naive
    * single-assignment nprobe=3 config, certified by q95). Approximate by
    * construction → rows-only check. */
  private val q71 = NamedQuery(
    "q71_ann_ivf_topk",
    (s, d) => SharedAnn.ivfResult(s, d),
    None,
    note = Some("ANN result sets are approximate by construction; " +
      "recall@5 vs brute force is hash-gated by the q95_ann_ivf_recall " +
      "certificate."))

  /** Embedding-cosine near-dup pairs. */
  private val q72 = NamedQuery(
    "q72_embedding_neardup",
    (s, d) => Dedup.embeddingNearDup(Tables.embeddings(s, d), "vec_id",
      "embedding", 0.45),
    Some("""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
      n AS (SELECT vec_id, e, SQRT(list_dot_product(e, e)) AS nrm FROM v)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cosine
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.45"""))

  /** Per-cluster embedding statistics (norms + first-component mean). */
  private val q73 = NamedQuery(
    "q73_embedding_stats",
    (s, d) => {
      val v = Tables.embeddings(s, d)
        .select(col("label"), toDouble(col("embedding")).as("e"))
        .withColumn("nrm", norm(col("e")))
        .withColumn("e0", col("e").getItem(0))
      v.groupBy(col("label"))
        .agg(count(lit(1)).as("n"), r6(avg(col("nrm"))).as("mean_norm"),
          r6(avg(col("e0"))).as("mean_e0"))
    },
    Some("""WITH v AS (SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings)
      SELECT label, COUNT(*) AS n,
        ROUND(AVG(SQRT(list_dot_product(e, e))), 6) AS mean_norm,
        ROUND(AVG(e[1]), 6) AS mean_e0
      FROM v GROUP BY label"""))

  /** Sign-LSH banded ANN (the brief's "LSH-bucketed variant"): approximate
    * by construction → rows-only check; recall vs the exact baseline is
    * certified by q96 (48 bits / 12 bands = 4 bits/band → measured
    * recall@5 0.90 vs 0.40 for the old 16/4 config). */
  private val q74 = NamedQuery(
    "q74_ann_lsh_topk",
    (s, d) => SharedAnn.lshResult(s, d),
    None,
    note = Some("ANN result sets are approximate by construction; " +
      "recall@5 vs brute force is hash-gated by the q96_ann_lsh_recall " +
      "certificate."))

  /** Cell-partitioned embedding near-dup (the scale path of q72's exact
    * all-pairs at the MODERATE cos 0.45 threshold): trained-cell
    * candidate generation (Dedup.cellNearDupPairsAuto — nCells sized to
    * the corpus, spill 4) → rows-only check; recall/precision vs the
    * exact pairs are certified by q97. Re-registered off sign-LSH
    * banding in round 13: the round-12 second-decade sweep measured the
    * fixture-tuned 4-bit banding degenerating toward all-pairs (slope
    * 3.0 — 16 buckets/band regardless of corpus size), and at this
    * threshold per-bit agreement is only 0.65, so NO banding holds both
    * recall and subquadratic candidates. The cell path is measured
    * linear (within-cell work n²/nCells with nCells ∝ n); banding stays
    * registered where it is right — the high-threshold regime (q62's
    * MinHash at J ≥ 0.9; Similarity.lshNearDupPairsAuto sizes bands to
    * the corpus for that regime). */
  private val q88 = NamedQuery(
    "q88_embedding_neardup_cells",
    (s, d) => Dedup.cellNearDupPairsAuto(
      Tables.embeddings(s, d), "vec_id", "embedding", 0.45),
    None,
    note = Some("Cell-partitioned candidate generation is " +
      "quantizer-specific; recall and precision vs the exact all-pairs " +
      "set are hash-gated by the q97_neardup_cells_recall certificate."))

  /** Higher-order array functions over the embedding vectors: exists /
    * forall (as filter-length predicates on both engines), fold
    * (aggregate ↔ list_reduce), flatten, and a transform-chain — the HOF
    * battery beyond q41b's element ops. */
  private val q91 = NamedQuery(
    "q91_array_hof",
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      e.select(col("vec_id"),
        exists(col("v"), x => x > 2.0).as("has_large"),
        forall(col("v"), x => abs(x) < 10.0).as("all_bounded"),
        r6(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x))
          .as("sumsq"),
        size(flatten(array(slice(col("v"), 1, 4), slice(col("v"), 61, 4))))
          .cast("long").as("n_ends"),
        r6(element_at(transform(col("v"), x => x * 2.0 + 1.0), 1))
          .as("first_affine"))
    },
    Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
      SELECT vec_id,
        len(list_filter(v, x -> x > 2.0)) > 0 AS has_large,
        len(list_filter(v, x -> NOT (abs(x) < 10.0))) = 0 AS all_bounded,
        ROUND(list_reduce(list_prepend(0.0, v), (acc, x) -> acc + x * x), 6) AS sumsq,
        CAST(len(flatten([v[1:4], v[61:64]])) AS BIGINT) AS n_ends,
        ROUND(v[1] * 2.0 + 1.0, 6) AS first_affine
      FROM e"""))

  /** The IVF index's I/O half, driver-visible: the corpus is WRITTEN as
    * cell-partitioned parquet (trained coarse quantizer + `_centroids`
    * sidecar) and the probe reads only its nprobe cell directories —
    * partition pruning before any file opens. Deterministic (trained
    * cells and ranking are); approximate by construction → rows-only. */
  private val q112 = NamedQuery(
    "q112_ann_ivf_index_probe",
    (s, d) => SharedAnn.fullIvfProbe(s, d),
    None,
    note = Some("On-disk IVF probe results are approximate by " +
      "construction; recall and append/compact maintenance drift are " +
      "hash-gated by the q127_ann_ivf_append_recall certificate."))

  /** q119: int8 scalar quantization round trip under the hash gate — the
    * embedding STORAGE path (4× smaller than float32). Per vector: the
    * symmetric scale, the cosine between the original and its
    * dequantized copy (the number that tells you retrieval survives
    * quantization), and the max reconstruction error (bounded by
    * scale/2 by construction). Every step is an explicit formula
    * (half-up FLOOR quantizer, HOF folds) mirrored 1:1 in SQL. */
  private val q119 = NamedQuery(
    "q119_embedding_quantization",
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), toDouble(col("embedding")).as("e"))
        .withColumn("scale", quantizeScale(col("e")))
        .withColumn("dq",
          dequantizeInt8(quantizeInt8(col("e"), col("scale")), col("scale")))
      e.select(col("vec_id"), r6(col("scale")).as("scale"),
        r6(cosine(col("e"), col("dq"))).as("cos_rt"),
        r6(aggregate(
          zip_with(col("e"), col("dq"), (a, b) => abs(a - b)),
          lit(0.0), (acc, x) => greatest(acc, x))).as("max_err"))
    },
    Some("""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
      s AS (SELECT vec_id, e,
              list_reduce(list_prepend(0.0, list_transform(e, x -> ABS(x))),
                (a, b) -> GREATEST(a, b)) / 127.0 AS scale
            FROM v),
      q AS (SELECT vec_id, e, scale,
              list_transform(e, x -> CASE WHEN scale = 0 THEN 0.0
                ELSE FLOOR(x / scale + 0.5) * scale END) AS dq
            FROM s)
      SELECT vec_id, ROUND(scale, 6) AS scale,
        ROUND(list_dot_product(e, dq) /
          (SQRT(list_dot_product(e, e)) * SQRT(list_dot_product(dq, dq))), 6)
          AS cos_rt,
        ROUND(list_reduce(list_prepend(0.0,
            list_transform(list_zip(e, dq),
              p -> ABS(p[1] - p[2]))),
          (a, b) -> GREATEST(a, b)), 6) AS max_err
      FROM q"""))

  /** q136: product-quantized ANN — the memory-compression scale path
    * (64 float dims → 8 int codes per vector) with the standard exact
    * re-rank of the ADC shortlist (refine×k raw-vector fetches per
    * probe). Deterministic (seeded codebooks, fixed tie-breaks). */
  private val q136 = NamedQuery(
    "q136_pq_topk",
    (s, d) => SharedAnn.pqSearch(s, d),
    None,
    note = Some("PQ/ADC result sets are approximate by construction; " +
      "refined recall@5 and reconstruction error are hash-gated by the " +
      "q137_pq_recall certificate."))

  /** q138: IVF-PQ — coarse cells prune the scan (nprobe of nCells),
    * RESIDUAL-encoded PQ codes (v − c(cell), the FAISS default —
    * residuals quantize finer on the same codebook budget) compress the
    * within-cell ranking, spill=2 placement covers cell boundaries, and
    * the ADC shortlist is exact-re-ranked (refine=8). Measured recall@5
    * 0.88/0.66 at sf0.01/sf0.1 vs 0.88/0.52 without residuals. */
  private val q138 = NamedQuery(
    "q138_ivfpq_topk",
    (s, d) => SharedAnn.ivfPqResult(s, d),
    None,
    note = Some("IVF-PQ composes the q95/q106-certified cell pruning " +
      "with the q137-certified PQ codes; recall@5 is hash-gated by the " +
      "q140_ivfpq_recall certificate and planted-cluster retrieval is " +
      "asserted in PqSpec."))

  /** q141: the on-disk IVF-PQ index (q138's algorithm as an I/O story):
    * codes tree partitioned by cell (the index of a float corpus is
    * ~nSub bytes/vector), model sidecars, listing-time partition
    * pruning at probe, and refine re-rank joining the SOURCE table by id
    * (raw vectors are never duplicated into the index). */
  private val q141 = NamedQuery(
    "q141_ivfpq_index_probe",
    (s, d) => SharedAnn.fullIvfPqProbe(s, d),
    None,
    note = Some("On-disk IVF-PQ probe; PqSpec asserts it returns exactly " +
      "the in-memory q138 results (same trained model, deterministic), " +
      "whose recall is hash-gated by q140_ivfpq_recall."))

  /** q148: the on-disk OPQ-IVFPQ index (FAISS's OPQ-as-pretransform
    * norm, completing q141's serving stack): the learned orthogonal
    * rotation is persisted as a THIRD frozen model sidecar
    * (`_rotation`) and applied as the same literal-matrix projection at
    * build, append and probe; everything else is q141's layout
    * (cell-partitioned codes, listing-time pruning, refine re-rank
    * joining the raw source — exact cosine is rotation-invariant, so
    * the refine never touches the rotated form). */
  private val q148 = NamedQuery(
    "q148_opq_index_probe",
    (s, d) => SharedAnn.opqFullIvfPqProbe(s, d),
    None,
    note = Some("On-disk OPQ-IVFPQ probe; PqSpec asserts it returns " +
      "exactly the in-memory opqIvfPqTopK results (same trained " +
      "rotation+models, deterministic); recall and frozen-rotation " +
      "append drift are hash-gated by the q149_opq_index_append_recall " +
      "certificate."))

  val all: Seq[NamedQuery] =
    Seq(q70, q71, q72, q73, q74, q88, q91, q112, q119, q136, q138, q141,
      q148)
}
