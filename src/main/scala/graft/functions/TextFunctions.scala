package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline surface
  * (SURVEY.md §2.10): tokenization, shingling, stopword heuristics, quality
  * signals, rolling-hash fingerprints. All pure Catalyst expression trees
  * (no UDFs) so they stay inside whole-stage codegen; every formula has a
  * 1:1 ANSI SQL mirror used by the oracle queries.
  */
object TextFunctions {

  /** Whitespace-normalized lowercase tokens. The explicit collapse-then-
    * split keeps Spark `split` and DuckDB `string_split` in exact agreement
    * on empty-token edge cases. */
  def tokens(text: Column): Column =
    split(regexp_replace(trim(lower(text)), "\\s+", " "), " ")

  /** Scala-side replica of [[tokens]] for typed flatMap operators
    * (shingling, substring windows): SQL `trim` strips SPACES only, and
    * the collapse-then-split keeps leading/trailing empty tokens — a plain
    * `String.trim.split("\\s+")` diverges on text with leading/trailing
    * non-space whitespace and would shift oracle-visible positions. */
  def tokenizeLikeSql(text: String): Array[String] = {
    val collapsed = text.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("^ +| +$", "")
      .replaceAll("\\s+", " ")
    collapsed.split(" ", -1)
  }

  /** Word n-gram shingles (space-joined), as an array; distinct-ified by
    * callers that need set semantics. element_at composition instead of
    * slice+concat_ws: no per-shingle array allocation in the lambda. */
  def shingles(toks: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(0))),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*))

  /** Occurrence count of function-word tokens — the language-ID /
    * quality-score building block. */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(stopwords)))

  /** Deterministic rolling polynomial fingerprint over the first `maxChars`
    * characters: acc ← (acc·31 + ascii(c)) mod 1e9+7. Engine-independent
    * (document fingerprinting, §2.10). */
  def rollingFingerprint(text: Column, maxChars: Int): Column =
    aggregate(
      sequence(lit(1), least(length(text), lit(maxChars))),
      lit(0L),
      (acc, i) => (acc * lit(31L) + ascii(text.substr(i, lit(1)))) % lit(1000000007L))
}
