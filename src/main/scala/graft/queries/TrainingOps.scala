package graft.queries

import graft.{NamedQuery, Tables}
import graft.Compat._
import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-corpus assembly operators (SURVEY.md §2.10 — the steps between
  * "clean documents" and "token batches"): sequence packing, deterministic
  * stratified sampling for source mixing, PII scrubbing, and intra-document
  * repetition scoring. All pure expression trees with 1:1 ANSI SQL mirrors,
  * so each sits under the full hash gate.
  */
object TrainingOps {

  private val toksSql =
    """string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')"""

  /** q100: fixed-budget sequence packing, per source shard. Documents pack
    * contiguously (doc_id order) into 512-token sequences: seq_id =
    * tokens-before-this-doc div budget — the straddle-style packing of
    * training pipelines, as ONE window over the shard. Scale shape: the
    * window partitions by source, so shards pack in parallel and no global
    * sort exists; all arithmetic is integer (exact in any engine). */
  private val q100 = NamedQuery(
    "q100_sequence_packing",
    (s, d) => {
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(tokens(col("text"))).cast(LongType).as("n_tokens"))
        .withColumn("cum_before",
          coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          expr("cum_before div 512").as("seq_id"))
    },
    Some(s"""WITH t AS (SELECT doc_id, source,
        CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents),
      c AS (SELECT doc_id, source, n_tokens,
        CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS cum_before
        FROM t)
      SELECT doc_id, source, n_tokens, cum_before // 512 AS seq_id FROM c"""))

  /** q101: deterministic stratified sampling — the source-mixing primitive.
    * A multiplicative integer hash of doc_id lands in [0, 1024); a document
    * survives when its bucket clears the per-language rate (en 50%, rest
    * 10%). Stateless filter → pushes to the scan, reproducible across runs
    * and engines (pure integer arithmetic, no RNG). */
  private val q101 = NamedQuery(
    "q101_stratified_sample",
    (s, d) => Tables.documents(s, d)
      .withColumn("bucket", (col("doc_id") * lit(2654435761L)) % 1024)
      .filter(col("bucket") <
        when(col("lang") === "en", lit(512L)).otherwise(lit(102L)))
      .select(col("doc_id"), col("lang"), col("source"), col("bucket")),
    Some("""SELECT doc_id, lang, source,
        (doc_id * 2654435761) % 1024 AS bucket
      FROM documents
      WHERE (doc_id * 2654435761) % 1024 <
        CASE WHEN lang = 'en' THEN 512 ELSE 102 END"""))

  /** q102: PII scrubbing. The fixture text is synthetic, so deterministic
    * synthetic PII (an email and a phone derived from doc_id) is appended
    * first, then both patterns redact — email before phone in both
    * engines, so overlaps resolve identically. Redaction counts ride
    * along. Pure regexp_replace/regexp_count: codegen'd, scan-parallel. */
  private val q102 = NamedQuery(
    "q102_pii_scrub",
    (s, d) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\+?[0-9][0-9-]{7,}"
      Tables.documents(s, d)
        .withColumn("aug", concat(col("text"), lit(" contact user"),
          col("doc_id"), lit("@mail.example.com or +1-555-"),
          lpad((col("doc_id") % 10000).cast(StringType), 4, "0")))
        .select(col("doc_id"),
          regexp_count(col("aug"), lit(emailRe)).as("n_emails"),
          regexp_count(col("aug"), lit(phoneRe)).as("n_phones"),
          regexp_replace(regexp_replace(col("aug"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>").as("scrubbed"))
    },
    Some("""WITH a AS (SELECT doc_id,
        text || ' contact user' || doc_id || '@mail.example.com or +1-555-' ||
          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(aug, '\+?[0-9][0-9-]{7,}')) AS BIGINT) AS n_phones,
        regexp_replace(regexp_replace(aug,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\+?[0-9][0-9-]{7,}', '<PHONE>', 'g') AS scrubbed
      FROM a"""))

  /** q103: intra-document 3-gram repetition ratio (the Gopher/C4-style
    * repetitiveness quality filter): 1 − distinct/total shingles. Columnar
    * per row — no explode, no shuffle; documents under 3 tokens drop (no
    * shingles exist). */
  private val q103 = NamedQuery(
    "q103_ngram_repetition",
    (s, d) => {
      val toks = tokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          (size(toks) - 2).cast(LongType).as("n_total"),
          size(array_distinct(shingles(toks, 3))).cast(LongType)
            .as("n_distinct"))
        .filter(col("n_total") > 0)
        .select(col("doc_id"), col("n_total"), col("n_distinct"),
          r6(lit(1.0) - col("n_distinct").cast(DoubleType) / col("n_total"))
            .as("repetition"))
    },
    Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
      sh AS (SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
             FROM t, UNNEST(generate_series(1, len(toks)-2)) AS u(i)),
      a AS (SELECT doc_id, COUNT(*) AS n_total,
              COUNT(DISTINCT shingle) AS n_distinct
            FROM sh GROUP BY 1)
      SELECT doc_id, n_total, n_distinct,
        ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_total, 6) AS repetition
      FROM a"""))

  /** q108: overlapping document chunking (context-window preprocessing):
    * fixed 200-char windows at a 150-char stride, with char offsets kept
    * for provenance. One generate-and-substring projection per row — no
    * shuffle, no UDF; chunk counts derive from length arithmetic. */
  private val q108 = NamedQuery(
    "q108_doc_chunking",
    (s, d) => {
      val win = 200; val stride = 150
      val nChunks = greatest(
        ceil((length(col("text")) - lit(win)).cast(DoubleType) / stride)
          .cast(LongType) + 1, lit(1L))
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          (col("chunk_idx") * stride + 1).as("start_pos"),
          substring(col("text"), (col("chunk_idx") * stride + 1).cast("int"),
            lit(win)).as("chunk"))
        .withColumn("chunk_len", length(col("chunk")).cast(LongType))
    },
    Some("""WITH d AS (SELECT doc_id, text,
        GREATEST(CAST(CEIL(CAST(LENGTH(text) - 200 AS DOUBLE) / 150) AS BIGINT) + 1, 1) AS nc
        FROM documents),
      c AS (SELECT doc_id, text, u.i AS chunk_idx
            FROM d, UNNEST(generate_series(0, nc - 1)) AS u(i))
      SELECT doc_id, chunk_idx, chunk_idx * 150 + 1 AS start_pos,
        substr(text, CAST(chunk_idx * 150 + 1 AS INTEGER), 200) AS chunk,
        CAST(LENGTH(substr(text, CAST(chunk_idx * 150 + 1 AS INTEGER), 200)) AS BIGINT) AS chunk_len
      FROM c"""))

  /** q164: GRAPHEME-budgeted document chunking — q108's window/stride
    * policy re-budgeted in user-perceived characters
    * (TextFunctions.chunkByGraphemes): a decomposed accent is 2
    * codepoints but 1 grapheme, and a window must never split base from
    * combining mark, so real truncation policies count clusters, not
    * codepoints. The fixture text is pure ASCII (grapheme ≡ codepoint —
    * nothing to test), so each row DECORATES a 16-char prefix with a
    * combining acute after every third character; the Spark side then
    * runs the GENERAL BreakIterator walk (5-grapheme windows, stride 3,
    * codepoint provenance offsets) while the oracle reconstructs the
    * same chunks from the planted structure's closed form (grapheme g
    * starts at codepoint g + ⌊(g+2)/3⌋) and re-counts each chunk with
    * DuckDB's native `length_grapheme` — a UAX #29 disagreement, an
    * off-by-one in the boundary walk, or a split cluster all flip the
    * hash. */
  private val q164 = NamedQuery(
    "q164_grapheme_chunking",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 16).as("b"))
        .transform(graft.operators.Scale.fanOut(_, "doc_id"))
        .as[(Long, String)]
        .flatMap { case (id, b) =>
          val sb = new StringBuilder
          var i = 0
          while (i < b.length) {
            sb.append(b.charAt(i))
            if (i % 3 == 0) sb.append('\u0301') // after 1-based chars 1,4,7,…
            i += 1
          }
          graft.functions.TextFunctions.chunkByGraphemes(sb.toString, 5, 3)
            .map { case (k, pos, chunk, glen) => (id, k, pos, chunk, glen) }
        }
        .toDF("doc_id", "chunk_idx", "start_pos", "chunk", "chunk_glen")
    },
    Some("""WITH d AS (SELECT doc_id, substr(text, 1, 16) AS b FROM documents),
      dec AS (SELECT doc_id, length(b) AS ng,
            string_agg(substr(b, CAST(u.i AS INTEGER), 1) ||
              CASE WHEN u.i % 3 = 1 THEN chr(769) ELSE '' END, '' ORDER BY u.i) AS s
          FROM d, UNNEST(generate_series(1, length(b))) AS u(i)
          GROUP BY doc_id, b),
      c AS (SELECT doc_id, ng, s, u.k AS chunk_idx,
            u.k * 3 AS gs, LEAST(u.k * 3 + 5, ng) AS ge
          FROM dec, UNNEST(generate_series(0,
            GREATEST(CAST(CEIL(CAST(ng - 5 AS DOUBLE) / 3) AS BIGINT), 0))) AS u(k)),
      p AS (SELECT doc_id, chunk_idx,
            gs + (gs + 2) // 3 + 1 AS start_pos,
            substr(s, CAST(gs + (gs + 2) // 3 + 1 AS INTEGER),
              CAST(ge + (ge + 2) // 3 - gs - (gs + 2) // 3 AS INTEGER)) AS chunk
          FROM c)
      SELECT doc_id, chunk_idx, CAST(start_pos AS BIGINT) AS start_pos, chunk,
        CAST(length_grapheme(chunk) AS BIGINT) AS chunk_glen
      FROM p"""))

  /** q111: Z-order spatial keys — interleave, then deinterleave back;
    * the round trip is the bijection certificate and the whole chain is
    * one codegen'd integer projection. Coordinates derive from fixture
    * keys; the same generated shift/mask SQL runs in both engines. */
  private val q111 = NamedQuery(
    "q111_zorder_keys",
    (s, d) => {
      import graft.functions.SpatialKeys._
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_partkey") % 256).as("x"), (col("l_suppkey") % 256).as("y"))
        .withColumn("z", expr(zorderSql("x", "y")))
        .withColumn("x_back", expr(deinterleaveXSql("z")))
        .withColumn("y_back", expr(deinterleaveYSql("z")))
    },
    Some(s"""WITH c AS (SELECT l_orderkey, l_linenumber,
        l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem),
      zt AS (SELECT *, ${graft.functions.SpatialKeys.zorderSql("x", "y")} AS z
             FROM c)
      SELECT l_orderkey, l_linenumber, x, y, z,
        ${graft.functions.SpatialKeys.deinterleaveXSql("z")} AS x_back,
        ${graft.functions.SpatialKeys.deinterleaveYSql("z")} AS y_back
      FROM zt"""))

  /** q118: REAL BPE tokenization under the hash gate. Merges are trained
    * on the corpus itself (one distributed word count + the driver-side
    * merge loop over the bounded frequency table), every document is
    * encoded with the broadcast ranks, and the certificate is
    * LOSSLESSNESS: concatenating each document's tokens must reproduce
    * its text byte-for-byte (the oracle simply selects the original).
    * Compression/merge quality is BpeSpec's planted-corpus territory —
    * this gate pins the end-to-end tokenize→detokenize contract on real
    * data. */
  private val q118 = NamedQuery(
    "q118_bpe_roundtrip",
    (s, d) => {
      val merges = graft.functions.Bpe.train(
        Tables.documents(s, d), "text", nMerges = 100, maxWords = 20000)
      graft.functions.Bpe.encode(Tables.documents(s, d), "doc_id", "text",
          merges)
        .select(col("doc_id"),
          concat_ws("", col("tokens")).as("reconstructed"))
    },
    Some("SELECT doc_id, text AS reconstructed FROM documents"))

  /** q129: temperature-weighted mixture sampling — the source-rebalancing
    * step of a multi-source training mix (weight ∝ √count, i.e.
    * temperature τ=2 upsampling of small sources relative to their raw
    * share, the multilingual-mix standard). Integer-exact end to end so
    * the hash gate holds: per-source weight w = ⌊√n_s⌋, per-source quota
    * = w·⌊T/2⌋ div Σw over the total T, and each quota takes the docs
    * with the smallest salted multiplicative hash — a deterministic
    * reservoir any engine reproduces bit-for-bit. Scale shape: one
    * count aggregation (a handful of source rows, broadcast back) + one
    * rank window per source partition; no global sort, no RNG. */
  private val q129 = NamedQuery(
    "q129_mixture_sample",
    (s, d) => {
      val hashed = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          ((col("doc_id") * lit(1000003L) + lit(17L)) % 1048576L)
            .as("bucket"))
      val bySource = hashed.groupBy(col("source"))
        .agg(count(lit(1)).as("n_s"))
        .withColumn("w",
          floor(sqrt(col("n_s").cast(DoubleType))).cast(LongType))
      val totals = bySource
        .agg(sum(col("n_s")).as("n_total"), sum(col("w")).as("sum_w"))
      val quotas = bySource.crossJoin(broadcast(totals))
        .select(col("source"),
          expr("w * (n_total div 2) div sum_w").as("quota"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("bucket"), col("doc_id"))
      hashed.join(broadcast(quotas), Seq("source"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= col("quota"))
        .select(col("doc_id"), col("source"), col("bucket"), col("rk"),
          col("quota"))
    },
    Some("""WITH h AS (SELECT doc_id, source,
        (doc_id * 1000003 + 17) % 1048576 AS bucket FROM documents),
      s AS (SELECT source, COUNT(*) AS n_s,
              CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS w
            FROM h GROUP BY 1),
      t AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_total,
              CAST(SUM(w) AS BIGINT) AS sum_w FROM s),
      q AS (SELECT source,
              CAST(w * (n_total // 2) // sum_w AS BIGINT) AS quota
            FROM s CROSS JOIN t),
      r AS (SELECT h.doc_id, h.source, h.bucket, q.quota,
              ROW_NUMBER() OVER (PARTITION BY h.source
                ORDER BY h.bucket, h.doc_id) AS rk
            FROM h JOIN q USING (source))
      SELECT doc_id, source, bucket, rk, quota FROM r WHERE rk <= quota"""))

  /** q130: deterministic shard assignment — how a 100 TB corpus is
    * globally "shuffled" without a global sort: a salted multiplicative
    * hash decorrelates doc order from storage order, shard = h mod 64
    * bucket-partitions the write (64 independent partitions, each
    * sortable in memory), and the within-shard position ranks over the
    * shard partition only. Shard size rides along as a window count so
    * the balance audit is IN the result, not a side channel. */
  private val q130 = NamedQuery(
    "q130_training_shards",
    (s, d) => {
      val wPos = Window.partitionBy(col("shard"))
        .orderBy(col("h"), col("doc_id"))
      val wCnt = Window.partitionBy(col("shard"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          ((col("doc_id") * lit(2654435761L) + lit(104729L)) % 1048576L)
            .as("h"))
        .withColumn("shard", col("h") % 64)
        .withColumn("pos", row_number().over(wPos))
        .withColumn("shard_size", count(lit(1)).over(wCnt))
        .select(col("doc_id"), col("source"), col("shard"), col("pos"),
          col("shard_size"))
    },
    Some("""WITH h AS (SELECT doc_id, source,
        (doc_id * 2654435761 + 104729) % 1048576 AS h FROM documents)
      SELECT doc_id, source, h % 64 AS shard,
        ROW_NUMBER() OVER (PARTITION BY h % 64 ORDER BY h, doc_id) AS pos,
        COUNT(*) OVER (PARTITION BY h % 64) AS shard_size
      FROM h"""))

  /** q178: deterministic epoch shuffle with CONTIGUOUS global sample ids
    * (Layout.contiguousIds) — the step that turns a curated corpus into a
    * replayable training order: a multiplicative-hash shuffle key gives a
    * seeded pseudo-random permutation (pure integer arithmetic — the same
    * order on any engine, any partitioning, any rerun), and every example
    * gets a DENSE id 0..n−1 in that order, which is what checkpoint-
    * resumable loaders ("skip the first k samples") and curriculum
    * schedules key on. q130's shard `pos` is per-shard (64 bounded window
    * groups); this is the GLOBAL numbering, whose naive plan —
    * `row_number() OVER (ORDER BY key)` — is a single-partition sort.
    * Scale shape: one sampled range exchange + per-partition numbering +
    * a one-row-per-partition offset window broadcast back. */
  private val q178 = NamedQuery(
    "q178_epoch_shuffle_ids",
    (s, d) => {
      val keyed = Tables.documents(s, d)
        .select(col("doc_id"),
          ((col("doc_id") * lit(2654435761L)) % lit(4294967296L))
            .as("shuffle_key"))
      graft.operators.Layout.contiguousIds(
        keyed, Seq(col("shuffle_key"), col("doc_id")), 32)
    },
    Some("""WITH k AS (SELECT doc_id,
          (doc_id * 2654435761) % 4294967296 AS shuffle_key
        FROM documents)
      SELECT doc_id, shuffle_key,
        ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) - 1 AS sample_id
      FROM k"""))

  val all: Seq[NamedQuery] =
    Seq(q100, q101, q102, q103, q108, q111, q118, q129, q130, q164, q178)
}
