package graft.queries

import graft.{NamedQuery, Tables}
import graft.Compat._
import graft.functions.TextFunctions._
import graft.operators.{Dedup, QualityModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LLM-training-data text operators over the `documents` fixture
  * (SURVEY.md §2.10): dedup family, language ID, quality scoring, token
  * counting, fingerprinting, term frequencies, and the multimodal binary
  * plumbing's metadata path.
  */
object TextOps {

  /** Shared tokenization SQL mirror (see TextFunctions.tokens). */
  private[queries] val toksSql =
    """string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')"""

  /** Exact dedup with deterministic survivor. */
  private val q60 = NamedQuery(
    "q60_dedup_exact",
    (s, d) => Dedup.exact(Tables.documents(s, d), "doc_id", "text")
      .withColumn("n_chars", col("n_chars").cast(LongType)),
    Some("""SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies,
      CAST(LENGTH(text) AS BIGINT) AS n_chars
      FROM documents GROUP BY text"""))

  private[queries] def jaccardSql(threshold: Double) =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
      sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
             FROM t, UNNEST(generate_series(1, len(toks)-2)) AS u(i)),
      c AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
      SELECT id_a, id_b, common,
        CAST(common AS DOUBLE)/(ca.n_sh + cb.n_sh - common) AS jaccard
      FROM p JOIN c ca ON ca.doc_id = id_a JOIN c cb ON cb.doc_id = id_b
      WHERE CAST(common AS DOUBLE)/(ca.n_sh + cb.n_sh - common) >= $threshold"""

  /** Exact 3-gram Jaccard near-dup pairs (inverted-index join). Registered
    * WITH the dfCap hot-shingle guard — the 100 TB-safe form: a stop-phrase
    * shingle's posting list k²/2-explodes pair generation without it.
    * Scores stay exact under the cap (membership recounts from full sets).
    * The oracle mirrors the CAPPED semantics (candidates need ≥1 non-hot
    * shared shingle; counts from full sets), so the gate stays valid at
    * any scale factor — not just ones whose max df happens to sit under
    * the cap (sf0.01 tops out near 7). */
  private val q61 = NamedQuery(
    "q61_ngram_jaccard_pairs",
    (s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text", 3, 0.6,
      dfCap = 1000),
    Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
      sh AS MATERIALIZED (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
        FROM t, UNNEST(generate_series(1, len(toks)-2)) AS u(i)),
      hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > 1000),
      gen AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        WHERE a.shingle NOT IN (SELECT shingle FROM hot)),
      c AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      p AS (SELECT g.id_a, g.id_b, COUNT(*) AS common
            FROM gen g
            JOIN sh a ON a.doc_id = g.id_a
            JOIN sh b ON b.doc_id = g.id_b AND a.shingle = b.shingle
            GROUP BY 1, 2)
      SELECT id_a, id_b, common,
        CAST(common AS DOUBLE)/(ca.n_sh + cb.n_sh - common) AS jaccard
      FROM p JOIN c ca ON ca.doc_id = id_a JOIN c cb ON cb.doc_id = id_b
      WHERE CAST(common AS DOUBLE)/(ca.n_sh + cb.n_sh - common) >= 0.6"""))

  /** MinHash+LSH near-dup pairs, exact-verified at J ≥ 0.9. The oracle is
    * the exact-Jaccard SQL: at J ≥ 0.9 with k=32, b=8, r=4 the banding miss
    * probability is < 1e-4 per pair and the xxhash64 pipeline is
    * deterministic — equality against the exact oracle is validated on the
    * gate fixtures. */
  private val q62 = NamedQuery(
    "q62_minhash_lsh_pairs",
    (s, d) => Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
      3, 32, 8, 0.9),
    Some(jaccardSql(0.9)))

  /** q121: exact repeated-substring spans (Lee et al. 2022 suffix-array
    * dedup, re-expressed as keyed shuffles): maximal token regions covered
    * by 8-token windows occurring more than once in the corpus, merged
    * per document by gaps-and-islands. The registered form groups the
    * verbatim window strings (exact); Dedup.duplicateSpansHashed is the
    * 8-byte-key shuffle that survives 100 TB (spec-pinned equal on
    * fixtures). */
  private val q121 = NamedQuery(
    "q121_duplicate_spans",
    (s, d) => Dedup.duplicateSpans(Tables.documents(s, d), "doc_id", "text", 8),
    Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
      w AS MATERIALIZED (
        SELECT doc_id, i - 1 AS start, array_to_string(toks[i:i+7], ' ') AS win
        FROM t, UNNEST(generate_series(1, len(toks) - 7)) AS u(i)),
      d AS (SELECT win FROM w GROUP BY win HAVING COUNT(*) > 1),
      h AS (SELECT w.doc_id, w.start FROM w JOIN d USING (win)),
      e AS (SELECT doc_id, start,
              CASE WHEN LAG(start) OVER ws IS NULL
                     OR start - LAG(start) OVER ws > 8 THEN 1 ELSE 0 END AS brk
            FROM h WINDOW ws AS (PARTITION BY doc_id ORDER BY start)),
      g AS (SELECT *, SUM(brk) OVER (PARTITION BY doc_id ORDER BY start
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
            FROM e)
      SELECT doc_id, MIN(start) AS span_start, MAX(start) + 8 AS span_end,
        COUNT(*) AS n_windows
      FROM g GROUP BY doc_id, island"""))

  /** q122: the corpus-curation funnel END TO END — the composed pipeline a
    * training-data team actually runs, as one dataflow under one hash
    * gate: quality gate (≥30 tokens, type-token ratio ≥ 0.3) → exact
    * dedup (min-id survivor per text) → near-dup drop (3-gram Jaccard ≥
    * 0.6, greedy keep-smaller-id rule; the transitive-closure variant is
    * q76's operator) → per-(source, lang) curation summary. Every stage
    * reuses the registered operator (ngramJaccardPairs runs with its
    * dfCap guard). The certified first moment is the quality SUM, not the
    * mean (dyadic-mean rounding-boundary lesson). */
  private val q122 = NamedQuery(
    "q122_corpus_curation",
    (s, d) => {
      val t = Tables.documents(s, d).withColumn("toks", tokens(col("text")))
      val nTok = size(col("toks"))
      val ttr = size(array_distinct(col("toks"))).cast(DoubleType) / size(col("toks"))
      val meanLen = aggregate(transform(col("toks"), t => length(t)),
        lit(0), (a, x) => a + x).cast(DoubleType) / size(col("toks"))
      val stopRatio = stopwordHits(col("toks"), Seq("the", "a"))
        .cast(DoubleType) / size(col("toks"))
      val quality = ttr * 0.5 + stopRatio * 0.3 + meanLen * 0.05
      val gated = t.filter(nTok >= 30 && ttr >= 0.3)
        .select(col("doc_id"), col("text"), col("source"), col("lang"),
          nTok.cast(LongType).as("n_tokens"), quality.as("quality"))
      val survivors = gated.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
      // base feeds three consumers (shingling, the near-dup anti-join and
      // the summary) — pin it so tokenize+gate runs once
      val base = gated.join(survivors, Seq("doc_id")).localCheckpoint()
      val pairs = Dedup.ngramJaccardPairs(
        base.select(col("doc_id"), col("text")), "doc_id", "text", 3, 0.6,
        dfCap = 1000)
      val keep = base.join(
        pairs.select(col("id_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      keep.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          round(sum(col("quality")), 6).as("sum_quality"))
    },
    Some(s"""WITH t AS MATERIALIZED (
        SELECT doc_id, text, source, lang, $toksSql AS toks FROM documents),
      q AS MATERIALIZED (
        SELECT doc_id, text, source, lang,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5
            + (CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS DOUBLE) / len(toks)) * 0.3
            + (CAST(list_sum(list_transform(toks, x -> LENGTH(x))) AS DOUBLE) / len(toks)) * 0.05 AS quality
        FROM t
        WHERE len(toks) >= 30
          AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3),
      e AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY text),
      base AS MATERIALIZED (SELECT q.* FROM q JOIN e USING (doc_id)),
      bt AS MATERIALIZED (
        SELECT t.doc_id, t.toks FROM t JOIN base ON t.doc_id = base.doc_id),
      sh AS MATERIALIZED (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
        FROM bt, UNNEST(generate_series(1, len(toks) - 2)) AS u(i)),
      hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > 1000),
      gen AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        WHERE a.shingle NOT IN (SELECT shingle FROM hot)),
      c AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      p AS (SELECT g.id_a, g.id_b, COUNT(*) AS common
            FROM gen g
            JOIN sh a ON a.doc_id = g.id_a
            JOIN sh b ON b.doc_id = g.id_b AND a.shingle = b.shingle
            GROUP BY 1, 2),
      drops AS (
        SELECT DISTINCT id_b FROM p
        JOIN c ca ON ca.doc_id = id_a JOIN c cb ON cb.doc_id = id_b
        WHERE CAST(common AS DOUBLE) / (ca.n_sh + cb.n_sh - common) >= 0.6),
      keep AS (SELECT * FROM base WHERE doc_id NOT IN (SELECT id_b FROM drops))
      SELECT source, lang, COUNT(*) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        ROUND(SUM(quality), 6) AS sum_quality
      FROM keep GROUP BY source, lang"""))

  /** SimHash near-dup pairs. xxhash64-based bit votes are not reproducible
    * in the oracle engine → rows-only check; recall/precision covered by
    * ScalaTest against the exact pairs. */
  /** Asymmetric containment near-dup (quote/subset detection): directed
    * |A∩B|/|A| over 3-gram shingle sets — catches a short document quoted
    * inside a long one, which symmetric Jaccard (q61) misses. */
  private val q107 = NamedQuery(
    "q107_containment_pairs",
    (s, d) => Dedup.containmentPairs(Tables.documents(s, d), "doc_id",
      "text", 3, 0.8),
    Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
      sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
             FROM t, UNNEST(generate_series(1, len(toks)-2)) AS u(i)),
      c AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
      d AS (
        SELECT id_a AS id_from, id_b AS id_to, common,
          CAST(common AS DOUBLE) / ca.n_sh AS containment
        FROM p JOIN c ca ON ca.doc_id = id_a
        UNION ALL
        SELECT id_b, id_a, common, CAST(common AS DOUBLE) / cb.n_sh
        FROM p JOIN c cb ON cb.doc_id = id_b)
      SELECT id_from, id_to, common, containment FROM d
      WHERE containment >= 0.8"""))

  private val q63 = NamedQuery(
    "q63_simhash_pairs",
    (s, d) => Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text", 3),
    None,
    note = Some("Banded SimHash candidate pairs are hash-function-" +
      "specific; completeness vs the exact Hamming scan is hash-gated by " +
      "the q99_simhash_band_recall certificate (recall exactly 1.0)."))

  /** Language-ID heuristic: function-word occurrence ratio (n-gram
    * heuristic surface; the fixture text is synthetic so the signal, not
    * the accuracy, is under test). */
  private val q64 = NamedQuery(
    "q64_langid_heuristic",
    (s, d) => {
      val t = Tables.documents(s, d).withColumn("toks", tokens(col("text")))
      t.select(col("doc_id"), col("lang"),
          size(col("toks")).cast(LongType).as("n_tokens"),
          stopwordHits(col("toks"), Seq("the", "a")).cast(LongType).as("en_hits"))
        .withColumn("en_ratio", col("en_hits").cast(DoubleType) / col("n_tokens"))
        .withColumn("pred_lang",
          when(col("en_ratio") >= 0.04, lit("en")).otherwise(lit("other")))
        .withColumn("is_match", col("pred_lang") === col("lang"))
    },
    Some(s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
      x AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
              CAST(len(list_filter(toks, t -> t = 'the' OR t = 'a')) AS BIGINT) AS en_hits
            FROM t)
      SELECT doc_id, lang, n_tokens, en_hits,
        CAST(en_hits AS DOUBLE) / n_tokens AS en_ratio,
        CASE WHEN CAST(en_hits AS DOUBLE) / n_tokens >= 0.04 THEN 'en' ELSE 'other' END AS pred_lang,
        (CASE WHEN CAST(en_hits AS DOUBLE) / n_tokens >= 0.04 THEN 'en' ELSE 'other' END) = lang AS is_match
      FROM x"""))

  /** Quality scoring: length, type-token ratio, mean token length,
    * stopword ratio, combined score (quality-scoring surface). */
  private val q65 = NamedQuery(
    "q65_quality_score",
    (s, d) => {
      val t = Tables.documents(s, d).withColumn("toks", tokens(col("text")))
      val nTok = size(col("toks")).cast(LongType)
      val ttr = size(array_distinct(col("toks"))).cast(DoubleType) / size(col("toks"))
      val meanLen = aggregate(transform(col("toks"), t => length(t)),
        lit(0), (a, x) => a + x).cast(DoubleType) / size(col("toks"))
      val stopRatio = stopwordHits(col("toks"), Seq("the", "a"))
        .cast(DoubleType) / size(col("toks"))
      t.select(col("doc_id"),
        length(col("text")).cast(LongType).as("n_chars"),
        nTok.as("n_tokens"),
        ttr.as("ttr"),
        meanLen.as("mean_tok_len"),
        stopRatio.as("stop_ratio"),
        (ttr * 0.5 + stopRatio * 0.3 + meanLen * 0.05).as("quality"))
    },
    Some(s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents)
      SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
        CAST(list_sum(list_transform(toks, t -> LENGTH(t))) AS DOUBLE) / len(toks) AS mean_tok_len,
        CAST(len(list_filter(toks, t -> t = 'the' OR t = 'a')) AS DOUBLE) / len(toks) AS stop_ratio,
        (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5
          + (CAST(len(list_filter(toks, t -> t = 'the' OR t = 'a')) AS DOUBLE) / len(toks)) * 0.3
          + (CAST(list_sum(list_transform(toks, t -> LENGTH(t))) AS DOUBLE) / len(toks)) * 0.05 AS quality
      FROM t"""))

  /** Token counting: whitespace tokens + a BPE-ish regex token count. */
  private val q66 = NamedQuery(
    "q66_token_count",
    (s, d) => {
      val t = Tables.documents(s, d)
      t.select(col("doc_id"),
        size(tokens(col("text"))).cast(LongType).as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast(LongType).as("re_tokens"),
        length(col("text")).cast(LongType).as("n_chars"))
    },
    Some(s"""SELECT doc_id,
      CAST(len($toksSql) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS re_tokens,
      CAST(LENGTH(text) AS BIGINT) AS n_chars
      FROM documents"""))

  /** Rolling polynomial fingerprint (document fingerprinting). */
  private val q67 = NamedQuery(
    "q67_fingerprint",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), rollingFingerprint(col("text"), 64).as("fp")),
    Some("""SELECT doc_id,
      list_reduce(list_prepend(CAST(0 AS BIGINT),
        generate_series(1, LEAST(LENGTH(text), 64))),
        (acc, i) -> (acc * 31 + ascii(substring(text, i, 1))) % 1000000007) AS fp
      FROM documents"""))

  /** Corpus term frequencies: explode + two-level counts (TF surface). */
  private val q68 = NamedQuery(
    "q68_term_frequency",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs")),
    Some(s"""WITH x AS (SELECT doc_id, UNNEST($toksSql) AS token FROM documents)
      SELECT token, COUNT(*) AS n_occurrences,
        COUNT(DISTINCT doc_id) AS n_docs
      FROM x GROUP BY token"""))

  /** Multimodal metadata path: text treated as an opaque binary payload
    * (the image/audio column pattern — abstraction #1 in SURVEY.md §1);
    * deterministic byte-level features stand in for decode. The real
    * decode plumbing (schema, partitioning, batch shape) lives in
    * graft.multimodal with a stubbed codec. */
  private val q69 = NamedQuery(
    "q69_multimodal_meta",
    (s, d) => {
      val t = Tables.documents(s, d)
        .withColumn("payload", encode(col("text"), "UTF-8"))
      t.select(col("doc_id"),
        length(col("payload")).cast(LongType).as("byte_len"),
        ascii(substring(col("text"), 1, 1)).cast(LongType).as("first_byte"),
        rollingFingerprint(col("text"), 64).as("checksum"),
        substring(col("text"), 1, 16).as("head"))
    },
    Some("""SELECT doc_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte,
      list_reduce(list_prepend(CAST(0 AS BIGINT),
        generate_series(1, LEAST(LENGTH(text), 64))),
        (acc, i) -> (acc * 31 + ascii(substring(text, i, 1))) % 1000000007) AS checksum,
      substring(text, 1, 16) AS head
      FROM documents"""))

  /** TF-IDF scoring: term frequency per (doc, term) × ln(N/df). The idf
    * log is transcendental → rounded (Compat.r6); tf·idf magnitudes stay
    * well under the rounding stability bound. Scale shape: two hash
    * aggregations (doc,term) → term plus a broadcast of the (small) corpus
    * size — the same two-shuffle plan at any corpus scale. */
  private val q75 = NamedQuery(
    "q75_tfidf",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val tf = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("token"))
        .agg(count(lit(1)).as("df"))
      val n = docs.select(count(lit(1)).as("n_docs"))
      tf.join(df, Seq("token")).crossJoin(broadcast(n))
        .select(col("doc_id"), col("token"), col("tf"), col("df"),
          r6(col("tf") * log(col("n_docs").cast(DoubleType) / col("df")))
            .as("tfidf"))
    },
    Some(s"""WITH t AS (SELECT doc_id, UNNEST($toksSql) AS token FROM documents),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY 1, 2),
      df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_docs FROM documents)
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
        ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n"""))

  /** Near-dup cluster resolution (connected components over the J ≥ 0.6
    * pair graph, min-id canonical): Spark side is iterative min-label
    * propagation; the oracle walks the same graph with a recursive CTE.
    * Both converge to the component minimum, so the outputs agree
    * exactly. */
  private val q76 = NamedQuery(
    "q76_dedup_clusters",
    (s, d) => Dedup.nearDupClusters(Tables.documents(s, d), "doc_id", "text",
      3, 0.6),
    Some(s"""WITH RECURSIVE p AS (${jaccardSql(0.6)}),
      edges AS (SELECT id_a AS a, id_b AS b FROM p
                UNION SELECT id_b, id_a FROM p),
      walk(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node)
      SELECT node AS doc_id, MIN(label) AS cluster_id
      FROM walk GROUP BY node"""))

  /** Decontamination: corpus docs (doc_id % 20 != 0) sharing ≥ 5 distinct
    * 3-gram shingles with any "benchmark" doc (doc_id % 20 == 0). */
  private val q87 = NamedQuery(
    "q87_decontamination",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.contaminationPairs(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", 3, 5)
    },
    Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
      sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
             FROM t, UNNEST(generate_series(1, len(toks)-2)) AS u(i)),
      c AS (SELECT * FROM sh WHERE doc_id % 20 != 0),
      b AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 20 = 0)
      SELECT c.doc_id, b.bench_id, COUNT(*) AS n_shared
      FROM c JOIN b USING (shingle)
      GROUP BY 1, 2 HAVING COUNT(*) >= 5"""))

  /** q131: Bloom-prefiltered decontamination — the 100 TB scale path of
    * q87. The benchmark shingle set becomes a broadcast Bloom filter the
    * corpus consults BEFORE the shuffle, so only overlapping (+ ~1% fp)
    * shingles enter the exchange; the exact equi-join downstream kills
    * the false positives, making the result identical to the exact
    * operator — which is exactly what the oracle checks. Different split
    * and threshold from q87 (every 16th doc is "benchmark", ≥3 shared
    * 3-grams) so the two gates exercise different overlap densities. */
  private val q131 = NamedQuery(
    "q131_bloom_decontamination",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.bloomContaminationPairs(
        docs.filter(col("doc_id") % 16 =!= 0),
        docs.filter(col("doc_id") % 16 === 0),
        "doc_id", "text", 3, 3)
    },
    Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
      sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
             FROM t, UNNEST(generate_series(1, len(toks)-2)) AS u(i)),
      c AS (SELECT * FROM sh WHERE doc_id % 16 != 0),
      b AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 16 = 0)
      SELECT c.doc_id, b.bench_id, COUNT(*) AS n_shared
      FROM c JOIN b USING (shingle)
      GROUP BY 1, 2 HAVING COUNT(*) >= 3"""))

  /** q139: corpus-trained bigram-LM perplexity scoring — the CCNet-style
    * quality signal (Wenzek et al. 2020 filter wikipedia-LM perplexity;
    * here the LM is the corpus's own word-bigram model, the engine-side
    * analog). Train = ONE linear aggregation (bigram counts, with c(w1)
    * derived from them — no second pass) + a distinct-token vocabulary
    * count; score = Laplace-smoothed P(w2|w1) = (c12+1)/(c1+V) joined
    * back to each document's bigram stream, mean −ln P per doc reported
    * as bits/bigram and perplexity. Everything is native expressions
    * (bigrams via sequence/element_at transform — no shuffle until the
    * count aggregations); the count tables are vocabulary-bounded and
    * meet the stream through equi-joins (AQE broadcasts them when small,
    * shuffles when a web-scale vocabulary isn't) — linear at 100 TB. */
  private val q139 = NamedQuery(
    "q139_bigram_lm_perplexity",
    (s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
      val bi = t.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("w1"),
            element_at(col("t"), i + 1).as("w2")))).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val big = bi.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c12"))
      val uni = big.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
      val v = t.select(explode(col("t")).as("w"))
        .agg(countDistinct(col("w")).as("vsz"))
      bi.join(big, Seq("w1", "w2")).join(uni, Seq("w1")).crossJoin(v)
        .select(col("doc_id"),
          (-log((col("c12") + 1) / (col("c1") + col("vsz")))).as("nll"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          r6(avg(col("nll")) / lit(math.log(2.0))).as("bits_per_bigram"),
          r6(exp(avg(col("nll")))).as("perplexity"))
    },
    Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
      b AS (SELECT doc_id, UNNEST(list_zip(toks[:len(toks)-1], toks[2:])) AS bz FROM t WHERE len(toks) >= 2),
      bi AS (SELECT doc_id, bz[1] AS w1, bz[2] AS w2 FROM b),
      big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
      uni AS (SELECT w1, SUM(c12) AS c1 FROM big GROUP BY w1),
      v AS (SELECT COUNT(DISTINCT w) AS vsz FROM (SELECT UNNEST(toks) AS w FROM t)),
      nl AS (SELECT bi.doc_id, -LN((big.c12 + 1) / (uni.c1 + v.vsz)) AS nll
             FROM bi JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v)
      SELECT doc_id, COUNT(*) AS n_bigrams,
        ROUND(AVG(nll) / LN(2), 6) AS bits_per_bigram,
        ROUND(EXP(AVG(nll)), 6) AS perplexity
      FROM nl GROUP BY doc_id"""))

  /** q161: Unicode normalization facts under the hash gate. The fixture
    * text is pure ASCII (NFC-invariant — verified against the corpus),
    * so each row PLANTS a decomposed accent pair (base letter +
    * combining mark, chosen by doc_id) on an 8-char prefix, then
    * certifies the full normalization surface against DuckDB's native
    * `nfc_normalize`/`length_grapheme`: the composed string ITSELF (a
    * cross-engine string equality — Java's Normalizer and DuckDB's
    * utf8proc must agree byte-for-byte), the codepoint lengths before
    * and after (composition removes exactly one codepoint), and the
    * grapheme count (the combining mark never added one — UAX #29
    * clustering via BreakIterator ≡ length_grapheme). */
  private val q161 = NamedQuery(
    "q161_unicode_normalize",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 8).as("b"))
        .transform(graft.operators.Scale.fanOut(_, "doc_id"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, b) =>
          val pair = (id % 4) match {
            case 0 => "e\u0301" // composes to U+00E9
            case 1 => "A\u0300" // composes to U+00C0
            case 2 => "o\u0308" // composes to U+00F6
            case _ => "n\u0303" // composes to U+00F1
          }
          val raw = b + pair
          val norm = graft.functions.TextFunctions.nfc(raw)
          (id, norm,
            raw.codePointCount(0, raw.length).toLong,
            norm.codePointCount(0, norm.length).toLong,
            graft.functions.TextFunctions.graphemeLen(raw),
            norm != raw)
        })
        .toDF("doc_id", "norm_str", "raw_len", "norm_len", "glen", "changed")
    },
    Some("""WITH d AS (SELECT doc_id, substr(text, 1, 8) AS b FROM documents),
      p AS (SELECT doc_id, b || CASE doc_id % 4
              WHEN 0 THEN 'e' || chr(769)
              WHEN 1 THEN 'A' || chr(768)
              WHEN 2 THEN 'o' || chr(776)
              ELSE 'n' || chr(771) END AS raw
            FROM d)
      SELECT doc_id, nfc_normalize(raw) AS norm_str,
        CAST(LENGTH(raw) AS BIGINT) AS raw_len,
        CAST(LENGTH(nfc_normalize(raw)) AS BIGINT) AS norm_len,
        CAST(length_grapheme(raw) AS BIGINT) AS glen,
        nfc_normalize(raw) <> raw AS changed
      FROM p"""))

  /** q162: NORMALIZED exact dedup (Dedup.exactNormalized) — q60's drill
    * for the canonical-equivalence gap: per document two byte-DISTINCT
    * variants are planted (prefix + precomposed é/À/ö/ñ vs prefix + the
    * decomposed base+combining pair). Raw exact dedup keeps both;
    * NFC-normalized dedup must collapse each canonical pair to its
    * min-id survivor (n_copies ≥ 2 — exactly 2 unless two documents
    * share a prefix AND an accent class, which the global grouping and
    * the oracle both honor). A normalizer that misses a composition, or
    * a survivor rule that drifts from min-id, flips rows and the hash. */
  private val q162 = NamedQuery(
    "q162_normalized_dedup",
    (s, d) => {
      import s.implicits._
      val rows = Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 8).as("b"))
        .as[(Long, String)]
        .flatMap { case (id, b) =>
          val pre = (id % 4) match {
            case 0 => "\u00e9"; case 1 => "\u00c0"
            case 2 => "\u00f6"; case _ => "\u00f1"
          }
          val dec = (id % 4) match {
            case 0 => "e\u0301"; case 1 => "A\u0300"
            case 2 => "o\u0308"; case _ => "n\u0303"
          }
          Seq((id * 2, b + pre), (id * 2 + 1, b + dec))
        }
        .toDF("row_id", "s")
      Dedup.exactNormalized(rows, "row_id", "s")
        .withColumn("n_chars", col("n_chars").cast(LongType))
    },
    Some("""WITH d AS (SELECT doc_id, substr(text, 1, 8) AS b FROM documents),
      r AS (SELECT doc_id * 2 AS row_id, b || CASE doc_id % 4
              WHEN 0 THEN chr(233) WHEN 1 THEN chr(192)
              WHEN 2 THEN chr(246) ELSE chr(241) END AS s
            FROM d
            UNION ALL
            SELECT doc_id * 2 + 1, b || CASE doc_id % 4
              WHEN 0 THEN 'e' || chr(769) WHEN 1 THEN 'A' || chr(768)
              WHEN 2 THEN 'o' || chr(776) ELSE 'n' || chr(771) END
            FROM d)
      SELECT MIN(row_id) AS doc_id, COUNT(*) AS n_copies,
        CAST(LENGTH(nfc_normalize(s)) AS BIGINT) AS n_chars
      FROM r GROUP BY nfc_normalize(s)"""))

  /** q165: COMPATIBILITY-equivalence dedup (Dedup.exactNormalizedCompat —
    * NFKC + case fold), q162's drill for the gap NFC leaves open: per
    * document two byte-distinct variants are planted whose difference is
    * compatibility-only (ligature ﬁ / fullwidth Ａ９ / unit square ㎞ /
    * roman numeral Ⅸ) against the plain-ASCII uppercase spelling. NFC
    * dedup keeps both (they are canonically DISTINCT); NFKC+fold must
    * collapse each pair to its min-id survivor. DuckDB has no
    * nfkc_normalize, so the oracle reconstructs the expected normalized
    * key from the planted structure's closed form (lower(prefix) + the
    * known compatibility target) — Java's NFKC table drifting from
    * Unicode's published decompositions, or a fold miss, flips rows and
    * the hash. */
  private val q165 = NamedQuery(
    "q165_compat_dedup",
    (s, d) => {
      import s.implicits._
      val rows = Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 8).as("b"))
        .as[(Long, String)]
        .flatMap { case (id, b) =>
          val compat = (id % 4) match {
            case 0 => "\ufb01le"             // ﬁ ligature + "le" → "file"
            case 1 => "\uff21\uff19"         // fullwidth A, 9    → "a9"
            case 2 => "\u339e\uff12"         // ㎞ square, full 2 → "km2"
            case _ => "\u2168"               // roman numeral Ⅸ  → "ix"
          }
          val ascii = (id % 4) match {
            case 0 => "FILE"; case 1 => "A9"
            case 2 => "KM2"; case _ => "IX"
          }
          Seq((id * 2, b + compat), (id * 2 + 1, b + ascii))
        }
        .toDF("row_id", "s")
      Dedup.exactNormalizedCompat(rows, "row_id", "s")
        .withColumn("n_chars", col("n_chars").cast(LongType))
    },
    Some("""WITH d AS (SELECT doc_id, substr(text, 1, 8) AS b FROM documents),
      r AS (SELECT doc_id * 2 AS row_id, lower(b) || CASE doc_id % 4
              WHEN 0 THEN 'file' WHEN 1 THEN 'a9'
              WHEN 2 THEN 'km2' ELSE 'ix' END AS k
            FROM d
            UNION ALL
            SELECT doc_id * 2 + 1, lower(b) || CASE doc_id % 4
              WHEN 0 THEN 'file' WHEN 1 THEN 'a9'
              WHEN 2 THEN 'km2' ELSE 'ix' END
            FROM d)
      SELECT MIN(row_id) AS doc_id, COUNT(*) AS n_copies,
        CAST(LENGTH(k) AS BIGINT) AS n_chars
      FROM r GROUP BY k"""))

  /** q166: LINE-LEVEL corpus dedup (Dedup.lineDedup — the CCNet /
    * RefinedWeb boilerplate pass): drop every line shared by more than
    * maxDocFreq distinct documents, keep the rest in order. The fixture
    * docs are single-line, so the gate plants a 4-line page per document
    * — a near-unique header, a 1-in-10 shared nav line (~n/10 docs), a
    * corpus-wide copyright footer (every doc), and a near-unique tail —
    * and the operator must drop exactly the middle two at the driver SFs
    * while preserving header/tail order and counting both sides. The
    * oracle rebuilds the same pages and states the rule relationally
    * (unnest + distinct-doc HAVING + ordered string_agg), so survivor
    * CONTENT, line ORDER, and the kept/dropped split are all under the
    * hash. */
  private val q166 = NamedQuery(
    "q166_line_dedup",
    (s, d) => {
      val b = substring(col("text"), 1, 12)
      val pages = Tables.documents(s, d).select(col("doc_id"),
        concat_ws("\n",
          concat(lit("h "), b),
          concat(lit("shared "), (col("doc_id") % 10).cast("string")),
          lit("(c) corpus boilerplate"),
          concat(lit("t "), b)).as("text"))
      Dedup.lineDedup(pages, "doc_id", "text", maxDocFreq = 5)
    },
    Some("""WITH d AS (SELECT doc_id, substr(text, 1, 12) AS b FROM documents),
      pages AS (SELECT doc_id,
          'h ' || b || chr(10) ||
          'shared ' || CAST(doc_id % 10 AS VARCHAR) || chr(10) ||
          '(c) corpus boilerplate' || chr(10) ||
          't ' || b AS text
        FROM d),
      arr AS (SELECT doc_id, string_split(text, chr(10)) AS a FROM pages),
      lines AS (SELECT doc_id, unnest(a) AS line,
          generate_subscripts(a, 1) AS pos FROM arr),
      drp AS (SELECT line FROM lines GROUP BY line
          HAVING COUNT(DISTINCT doc_id) > 5),
      fl AS (SELECT l.doc_id, l.pos, l.line,
          (p.line IS NOT NULL) AS dropped
        FROM lines l LEFT JOIN drp p USING (line))
      SELECT doc_id,
        COALESCE(string_agg(CASE WHEN NOT dropped THEN line END,
          chr(10) ORDER BY pos), '') AS clean_text,
        CAST(SUM(CASE WHEN dropped THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
        CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
      FROM fl GROUP BY doc_id"""))

  /** q166b: line dedup under NORMALIZED keys (Dedup.lineDedupNormalized
    * — whitespace fold + NFC), the RefinedWeb refinement q166 leaves
    * open: boilerplate that arrives trivially reformatted. The planted
    * page carries (1) a near-unique header, (2) a corpus-wide footer in
    * THREE raw spellings — precomposed é, decomposed e+◌́, and an
    * extra-whitespace variant — that share one normalized form, (3) the
    * distinguishing line: 'x <doc_id%100>' whose two spacing variants
    * alternate by floor(doc_id/100)%2, so at sf0.01 each RAW spelling
    * appears in ≤3 docs (under the threshold — raw line dedup KEEPS it)
    * while the normalized form appears in 5 (> 3 — normalized dedup must
    * drop it), and (4) a near-unique tail. Survivors keep ORIGINAL
    * bytes; the oracle states the same rule with DuckDB's nfc_normalize
    * over the folded line, so the key normalization itself is under the
    * hash. */
  private val q166b = NamedQuery(
    "q166b_line_dedup_normalized",
    (s, d) => {
      val id = col("doc_id")
      val b = substring(col("text"), 1, 12)
      val footer = when(id % 3 === 0, lit("caf\u00e9 ltd \u00a9 2026"))
        .when(id % 3 === 1, lit("cafe\u0301 ltd \u00a9 2026"))
        .otherwise(lit(" caf\u00e9  ltd \u00a9 2026 "))
      val xline = when(floor(id / 100) % 2 === 0,
          concat(lit("x "), (id % 100).cast("string")))
        .otherwise(concat(lit("x  "), (id % 100).cast("string")))
      val pages = Tables.documents(s, d).select(id,
        concat_ws("\n",
          concat(lit("h "), b), footer, xline,
          concat(lit("t "), b)).as("text"))
      Dedup.lineDedupNormalized(pages, "doc_id", "text", maxDocFreq = 3)
    },
    Some("""WITH d AS (SELECT doc_id, substr(text, 1, 12) AS b FROM documents),
      pages AS (SELECT doc_id,
          'h ' || b || chr(10) ||
          CASE doc_id % 3
            WHEN 0 THEN 'caf' || chr(233) || ' ltd ' || chr(169) || ' 2026'
            WHEN 1 THEN 'cafe' || chr(769) || ' ltd ' || chr(169) || ' 2026'
            ELSE ' caf' || chr(233) || '  ltd ' || chr(169) || ' 2026 ' END
          || chr(10) ||
          CASE CAST(FLOOR(doc_id/100.0) AS BIGINT) % 2
            WHEN 0 THEN 'x ' || CAST(doc_id % 100 AS VARCHAR)
            ELSE 'x  ' || CAST(doc_id % 100 AS VARCHAR) END
          || chr(10) ||
          't ' || b AS text
        FROM d),
      arr AS (SELECT doc_id, string_split(text, chr(10)) AS a FROM pages),
      lines AS (SELECT doc_id, unnest(a) AS line,
          generate_subscripts(a, 1) AS pos FROM arr),
      keyed AS (SELECT doc_id, pos, line,
          nfc_normalize(trim(regexp_replace(line, '\s+', ' ', 'g'))) AS k
        FROM lines),
      drp AS (SELECT k FROM keyed GROUP BY k
          HAVING COUNT(DISTINCT doc_id) > 3),
      fl AS (SELECT l.doc_id, l.pos, l.line, (p.k IS NOT NULL) AS dropped
        FROM keyed l LEFT JOIN drp p USING (k))
      SELECT doc_id,
        COALESCE(string_agg(CASE WHEN NOT dropped THEN line END,
          chr(10) ORDER BY pos), '') AS clean_text,
        CAST(SUM(CASE WHEN dropped THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
        CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
      FROM fl GROUP BY doc_id"""))

  /** q170: HTML → text extraction (TextFunctions.htmlToText — the WET-
    * style entry stage of a web corpus, a single-pass JVM state machine
    * run per row, never a SQL UDF). The gate plants a full page per
    * document — DOCTYPE, title, a style element, an entity in a heading,
    * a comment, an inline-tagged paragraph with a raw source newline, a
    * script whose BODY contains markup-looking text (raw-text mode must
    * drop it, not parse it), decimal/hex character references, and an
    * &nbsp; — and the oracle reconstructs the expected extraction from
    * the planted closed form (title/heading/paragraph/list lines in
    * order), so tag stripping, raw-text handling, entity decoding,
    * separators, and whitespace normalization are all under the hash.
    * Fixture prefixes ride inside title/heading with spaces replaced by
    * underscores so the closed form never depends on trim edge cases. */
  private val q170 = NamedQuery(
    "q170_html_extract",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"),
          translate(substring(col("text"), 1, 10), " ", "_").as("b1"),
          translate(substring(col("text"), 11, 10), " ", "_").as("b2"))
        .transform(graft.operators.Scale.fanOut(_, "doc_id"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, b1, b2) =>
          val html = "<!DOCTYPE html><html><head><title>T " + b1 +
            "</title><style>p{color:red}</style></head>" +
            "<body><h1>H &amp; " + b2 + "</h1><!-- hidden -->" +
            "<p>first <b>bold</b>\npara</p>" +
            "<script>var s = \"<p>not text</p>\";</script>" +
            "<p>second &#82;ow &#x41;</p><hr>" +
            "<ul><li>item &nbsp;one</li></ul></body></html>"
          val clean = graft.functions.TextFunctions.htmlToText(html)
          (id, clean, clean.length.toLong)
        })
        .toDF("doc_id", "text_clean", "n_chars")
    },
    Some("""WITH d AS (SELECT doc_id,
          replace(substr(text, 1, 10), ' ', '_') AS b1,
          replace(substr(text, 11, 10), ' ', '_') AS b2 FROM documents)
      SELECT doc_id,
        'T ' || b1 || chr(10) || 'H & ' || b2 || chr(10) ||
        'first bold para' || chr(10) || 'second Row A' || chr(10) ||
        'item one' AS text_clean,
        CAST(LENGTH('T ' || b1 || chr(10) || 'H & ' || b2 || chr(10) ||
          'first bold para' || chr(10) || 'second Row A' || chr(10) ||
          'item one') AS BIGINT) AS n_chars
      FROM d"""))

  /** q171: link-density boilerplate removal (TextFunctions.
    * htmlMainContent over htmlBlocks — the jusText-style second half of
    * web extraction): a block survives iff it has no anchors or carries
    * ≥ 4 tokens per anchor, so nav lists and footers drop while prose
    * with an occasional inline link stays. The planted page carries a
    * 3-item nav list (1 link / 1 token each), a long anchor-free prose
    * block, a 5-token paragraph with one inline link (must SURVIVE —
    * the rule is a ratio, not "any link kills"), and a 2-link footer;
    * the oracle reconstructs the two surviving blocks and both counts
    * closed-form. */
  private val q171 = NamedQuery(
    "q171_html_main_content",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"),
          translate(substring(col("text"), 1, 10), " ", "_").as("b1"),
          translate(substring(col("text"), 11, 10), " ", "_").as("b2"))
        .transform(graft.operators.Scale.fanOut(_, "doc_id"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, b1, b2) =>
          val html = "<body><ul>" +
            "<li><a href=\"/\">Home</a></li>" +
            "<li><a href=\"/a\">About</a></li>" +
            "<li><a href=\"/c\">Contact</a></li></ul>" +
            "<p>prose " + b1 +
            " with plenty of ordinary words and no anchors</p>" +
            "<p>Read <a href=\"/more\">more</a> about " + b2 + " here</p>" +
            "<div><a href=\"/t\">Terms</a> | <a href=\"/p\">Privacy</a></div>" +
            "</body>"
          val (main, kept, dropped) =
            graft.functions.TextFunctions.htmlMainContent(html, tokensPerLink = 4)
          (id, main, kept, dropped)
        })
        .toDF("doc_id", "text_main", "n_kept", "n_dropped")
    },
    Some("""WITH d AS (SELECT doc_id,
          replace(substr(text, 1, 10), ' ', '_') AS b1,
          replace(substr(text, 11, 10), ' ', '_') AS b2 FROM documents)
      SELECT doc_id,
        'prose ' || b1 || ' with plenty of ordinary words and no anchors'
          || chr(10) || 'Read more about ' || b2 || ' here' AS text_main,
        CAST(2 AS BIGINT) AS n_kept,
        CAST(4 AS BIGINT) AS n_dropped
      FROM d"""))

  /** q172: the WEB-CRAWL INGESTION FUNNEL end to end — WARC container →
    * HTTP envelope → HTML → text under one hash gate (sources.Warc +
    * TextFunctions.htmlToText, per-row JVM, shuffle-free). Each document
    * becomes a two-record WARC file: a warcinfo record whose payload
    * QUOTES a complete WARC header block (the phantom-boundary trap — a
    * delimiter-splitting parser would manufacture a fake record and
    * shift every downstream byte) and a response record whose HTTP body
    * is q170's planted page. The funnel must walk records by
    * Content-Length framing, keep only WARC-Type: response, split the
    * HTTP envelope, and extract the text — the oracle reconstructs URI
    * and extraction closed-form, so a framing error anywhere in the
    * chain flips the hash. */
  private val q172 = NamedQuery(
    "q172_warc_ingest",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"),
          translate(substring(col("text"), 1, 10), " ", "_").as("b1"),
          translate(substring(col("text"), 11, 10), " ", "_").as("b2"))
        .transform(graft.operators.Scale.fanOut(_, "doc_id"))
        .as[(Long, String, String)]
        .mapPartitions { it =>
          val L1 = java.nio.charset.StandardCharsets.ISO_8859_1
          it.map { case (id, b1, b2) =>
            val html = "<!DOCTYPE html><html><head><title>T " + b1 +
              "</title><style>p{color:red}</style></head>" +
              "<body><h1>H &amp; " + b2 + "</h1><!-- hidden -->" +
              "<p>first <b>bold</b>\npara</p>" +
              "<script>var s = \"<p>not text</p>\";</script>" +
              "<p>second &#82;ow &#x41;</p><hr>" +
              "<ul><li>item &nbsp;one</li></ul></body></html>"
            val uri = "http://corpus.example/doc/" + id
            val trap = ("crawler config:\r\nWARC/1.0\r\nWARC-Type: response\r\n" +
              "Content-Length: 4\r\n\r\nfake\r\n\r\n").getBytes(L1)
            // the on-disk crawl shape: a .warc.gz MEMBER stream (one gzip
            // member per record), decompressed and walked by the reader
            val warc = graft.sources.Warc.writeGz(Seq(
              (Seq("WARC-Type" -> "warcinfo"), trap),
              (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri),
                graft.sources.Warc.httpResponse(html.getBytes(L1), "text/html"))))
            val texts = graft.sources.Warc.recordsGz(warc)
              .filter(_.recordType.contains("response"))
              .flatMap(r => graft.sources.Warc.httpBody(r.payload)
                .map(b => (r.targetUri.getOrElse(""),
                  graft.functions.TextFunctions.htmlToText(new String(b, L1)))))
            val (u, clean) = texts.head
            (id, u, clean, clean.length.toLong)
          }
        }
        .toDF("doc_id", "uri", "text_clean", "n_chars")
    },
    Some("""WITH d AS (SELECT doc_id,
          replace(substr(text, 1, 10), ' ', '_') AS b1,
          replace(substr(text, 11, 10), ' ', '_') AS b2 FROM documents)
      SELECT doc_id,
        'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS uri,
        'T ' || b1 || chr(10) || 'H & ' || b2 || chr(10) ||
        'first bold para' || chr(10) || 'second Row A' || chr(10) ||
        'item one' AS text_clean,
        CAST(LENGTH('T ' || b1 || chr(10) || 'H & ' || b2 || chr(10) ||
          'first bold para' || chr(10) || 'second Row A' || chr(10) ||
          'item one') AS BIGINT) AS n_chars
      FROM d"""))

  /** q179: quality-ranked canonical selection (Dedup.keepBest) — the
    * keep-BEST survivor policy (RefinedWeb keeps the longest duplicate,
    * FineWeb the best-scored one) vs q60/q162's keep-min-id. Each
    * document expands to 1 + (doc_id % 3) byte-identical variant copies
    * with distinct ids and a closed-form quality score of
    * ((vid div 2)·37) % 101 — the integer halving makes variants v=0 and
    * v=1 share a quality, so every 2-copy cluster and HALF the max
    * contests in 3-copy clusters are genuine TIES at the top: the
    * lowest-id tiebreak is under the hash on thousands of rows, not just
    * on trivial singleton clusters. The oracle re-derives each winner
    * with a rank window. A survivor policy drift (max vs min, wrong
    * tiebreak direction) or a lost/duplicated cluster flips the hash.
    * Scale shape: the expansion is a generator projection; the selection
    * is ONE content-key groupBy with a map-side (quality, −id) champion —
    * no window, no sort. */
  private val q179 = NamedQuery(
    "q179_dedup_keep_best",
    (s, d) => {
      val vid = col("doc_id") * 10 + col("v")
      val variants = Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0L), col("doc_id") % 3)).as("v"))
        .select(vid.as("vid"), col("text"),
          ((expr("(doc_id * 10 + v) div 2") * 37) % 101)
            .cast(DoubleType).as("quality"))
      Dedup.keepBest(variants, "vid", "text", "quality")
        .withColumn("n_chars", col("n_chars").cast(LongType))
    },
    Some("""WITH v AS (SELECT doc_id * 10 + u.i AS vid, text,
          CAST(((doc_id * 10 + u.i) // 2) * 37 % 101 AS DOUBLE) AS quality
        FROM documents, UNNEST(generate_series(0, doc_id % 3)) AS u(i)),
      r AS (SELECT vid, text, quality,
          ROW_NUMBER() OVER (PARTITION BY text
            ORDER BY quality DESC, vid) AS rn,
          COUNT(*) OVER (PARTITION BY text) AS n_copies,
          MAX(quality) OVER (PARTITION BY text) AS best_quality
        FROM v)
      SELECT vid AS keep_id, n_copies, best_quality,
        CAST(LENGTH(text) AS BIGINT) AS n_chars
      FROM r WHERE rn = 1"""))

  /** q182: train/eval SPLIT-LEAKAGE audit (Dedup.splitLeakage) — the
    * contamination an id-hash split cannot prevent: near-identical pages
    * hash to different sides, so the eval split silently contains
    * paraphrases of training documents. The fixture splits by the same
    * multiplicative hash q101/q178 use (80% train / 20% eval) and the
    * operator reports every exact-verified J ≥ 0.9 pair whose members sit
    * on OPPOSITE sides (12 pairs at sf0.01, 82 at sf0.1 — nonzero and
    * two-sided at both SFs by fixture construction). The oracle restates
    * the whole funnel: exact-Jaccard pairs × the split CASE × the
    * crossing filter. Scale shape: q62's banded-LSH pair generation (one
    * linear shuffle) + two joins against a 2-column corpus projection
    * (AQE broadcasts it at gate scale). */
  private val q182 = NamedQuery(
    "q182_split_leakage",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("split",
          when((col("doc_id") * 2654435761L) % 100 < 80, "train")
            .otherwise("eval"))
      graft.operators.Dedup.splitLeakage(
        docs, "doc_id", "text", "split", 3, 32, 8, 0.9)
    },
    Some(s"""WITH j AS (${jaccardSql(0.9)}),
      x AS (SELECT id_a, id_b, common, jaccard,
          CASE WHEN (id_a * 2654435761) % 100 < 80
            THEN 'train' ELSE 'eval' END AS split_a,
          CASE WHEN (id_b * 2654435761) % 100 < 80
            THEN 'train' ELSE 'eval' END AS split_b
        FROM j)
      SELECT id_a, id_b, common, jaccard, split_a, split_b
      FROM x WHERE split_a <> split_b"""))

  /** The labeled fixture behind q184 and its held-out certificate
    * (RecallQueries.q184c): odd doc_ids become planted machine junk — a
    * spam phrase repeated (disjoint `zzq…` vocabulary, so the planted
    * separation is closed-form) plus a per-doc variation token; even
    * doc_ids keep their fixture prose. Columns: doc_id, label_good,
    * toks. */
  private[queries] def qualityLabeled(s: SparkSession, d: String): DataFrame = {
    val junk = "zzqclick zzqbuy zzqfree zzqwin zzqcash zzqpills zzqoffer"
    val junkText = concat(lit(junk + " " + junk + " zzqv"),
      (col("doc_id") % 97).cast("string"))
    Tables.documents(s, d).select(
      col("doc_id"),
      (col("doc_id") % 2 === 0).as("label_good"),
      tokens(when(col("doc_id") % 2 === 1, junkText)
        .otherwise(col("text"))).as("toks"))
  }

  /** One trained [[QualityModel.Model]] per (session, dataset), trained
    * on the 80% id-hash train split ONLY — the 20% holdout stays unseen
    * for the q184c accuracy certificate. Memoized like SharedAnn so the
    * gate query and the certificate score the SAME weights. */
  private val qualityModels =
    scala.collection.concurrent.TrieMap.empty[(Int, String), QualityModel.Model]
  private[queries] def qualityModel(s: SparkSession, d: String): QualityModel.Model =
    qualityModels.getOrElseUpdate((System.identityHashCode(s), d),
      QualityModel.train(
        qualityLabeled(s, d).filter(col("doc_id") % 10 < 8),
        "label_good", col("toks"), "doc_id"))

  /** q184: MODEL-BASED quality filtering (operators.QualityModel) — the
    * fastText-style hashed-ngram logistic regression every large
    * curation pipeline runs after the heuristic filters: train on the
    * 80% split (driver-side SGD over a capped, hash-ordered sample
    * pool; deterministic), then score the WHOLE corpus — including the
    * 20% the model never saw — as one codegen mean-pooled dot product
    * (weights are a single array literal; shuffle-free scan). The
    * planted good/junk construction is closed-form separable, so every
    * document's predicted side sits under the driver's hash: one
    * misclassification anywhere, train or holdout, flips the gate. */
  private val q184 = NamedQuery(
    "q184_quality_classifier",
    (s, d) => {
      val m = qualityModel(s, d)
      qualityLabeled(s, d).select(
        col("doc_id"), col("label_good"),
        (QualityModel.logitCol(col("toks"), m) > 0).as("pred_good"))
    },
    Some("""SELECT doc_id, (doc_id % 2 = 0) AS label_good,
        (doc_id % 2 = 0) AS pred_good
      FROM documents"""))

  val all: Seq[NamedQuery] =
    Seq(q60, q61, q62, q63, q64, q65, q66, q67, q68, q69, q75, q76, q87,
      q121, q122, q131,
      q107, q139, q161, q162, q165, q166, q166b, q170, q171, q172, q179,
      q182, q184)
}
