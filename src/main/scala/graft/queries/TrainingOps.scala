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

  val all: Seq[NamedQuery] =
    Seq(q100, q101, q102, q103, q108, q111, q118)
}
