package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based document quality filtering — the C4 cleaning rules (Raffel
  * et al. 2020, "Exploring the Limits of Transfer Learning", §2.2) and the
  * Gopher document-shape rules (Rae et al. 2021, "Scaling Language Models",
  * §A.1.1) as ONE named, attributable stage. These published heuristics are
  * the standard first gate of every large-scale LLM corpus build (C4, MassiveText,
  * RefinedWeb, FineWeb all start here); they complement the statistical
  * scorers already registered (q65 heuristic scores, q139 LM perplexity,
  * q184 trained classifier) with the deterministic rule tier that runs FIRST
  * because it is the cheapest.
  *
  * Scale posture: every rule is a pure Catalyst expression chain over
  * higher-order array functions (split/filter/transform/aggregate) — no
  * UDFs, no joins, no shuffle; the whole stage is a codegen'd scan
  * projection, so at 100 TB it is embarrassingly parallel and the filter
  * itself can sit directly on the parquet scan. Attribution (`first_fail`)
  * is a when-chain over the same flags, so a curation report costs one
  * map-side-partial count per reason ([[attritionReport]]), never a second
  * pass over the text.
  *
  * Reference counterpart: none (the reference pipeline has no text-curation
  * stage) — this is part of the LLM-data surface the builder contract asks
  * for beyond the reference's own operators.
  */
object HeuristicFilters {

  /** Gopher's required-stopword list (Rae et al. 2021 §A.1.1): a document
    * must contain at least [[RuleParams.minStopwords]] DISTINCT entries. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Thresholds, with the published defaults. Corpus-specific tuning is a
    * parameter, not a fork: the fixture queries run with `minWords = 20`
    * because the synthetic documents are short, exactly as a deployment
    * would tune for its own corpus. */
  final case class RuleParams(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletRatio: Double = 0.9,
      maxEllipsisRatio: Double = 0.3,
      minAlphaRatio: Double = 0.8,
      minStopwords: Int = 2,
      minSentences: Int = 3,
      minLineWords: Int = 5,
      badwords: Seq[String] = Nil,
      stopwords: Seq[String] = GopherStopwords)

  /** Rule names in evaluation order — the canonical order [[rules]]
    * emits, `first_fail` attributes by, and the oracle SQL mirrors
    * (HeuristicFiltersSpec asserts the two stay in sync). */
  val ruleNames: Seq[String] = Seq(
    "g_word_count", "g_mean_word_len", "g_symbol_ratio", "g_bullet_ratio",
    "g_ellipsis_ratio", "g_alpha_ratio", "g_stopwords",
    "c4_no_lorem", "c4_no_brace", "c4_no_badword", "c4_min_sentences")

  /** Lines of the raw page, empties preserved (ratios are over ALL lines,
    * as Gopher counts them). */
  private def lines(text: Column): Column = split(text, "\n", -1)

  /** Whitespace-collapsed lowercase word tokens of the full page —
    * identical to TextFunctions.tokens (duplicated here only to keep the
    * operator self-contained; the formula and its SQL mirror are the
    * corpus-wide standard). */
  private def toks(text: Column): Column =
    split(regexp_replace(trim(lower(text)), "\\s+", " "), " ")

  /** C4's line-keep predicate: terminal punctuation, at least
    * `minLineWords` words, and no "javascript" (the boilerplate tell). */
  private def lineKeep(l: Column, minLineWords: Int): Column = {
    val lt = trim(l)
    lt.rlike("[.!?\"]$") &&
      size(split(regexp_replace(lt, "\\s+", " "), " ", -1)) >= minLineWords &&
      !lower(l).contains("javascript")
  }

  /** The C4 line filter: kept lines of the page, original order/bytes. */
  def cleanLines(text: Column, p: RuleParams = RuleParams()): Column =
    filter(lines(text), l => lineKeep(l, p.minLineWords))

  /** The ordered rule list as (name, pass-flag) pairs over `text`.
    * Document-shape (Gopher) rules first, content (C4) rules after —
    * [[annotate]]'s `first_fail` and [[attritionReport]]'s attribution
    * follow this order. All flags are evaluated on the RAW page except
    * `c4_min_sentences`, which counts sentence terminators in the
    * line-filtered text (C4 applies its sentence floor after its line
    * filter). */
  def rules(text: Column, p: RuleParams = RuleParams()): Seq[(String, Column)] = {
    val t = toks(text)
    val n = size(t).cast("double")
    val ls = lines(text)
    val nl = size(ls).cast("double")
    val meanLen = aggregate(transform(t, w => length(w)), lit(0),
      (a, x) => a + x).cast("double") / n
    val symbols = size(regexp_extract_all(text, lit("#|\\.\\.\\.|…"), lit(0)))
      .cast("double")
    val bullets = size(filter(ls, l => trim(l).rlike("^[-*•] "))).cast("double")
    val ellipsis = size(filter(ls, l => trim(l).rlike("(\\.\\.\\.|…)$")))
      .cast("double")
    val alphaWords = size(filter(t, w => w.rlike("[a-z]"))).cast("double")
    val stopHits = size(filter(
      array(p.stopwords.map(lit): _*), sw => array_contains(t, sw)))
    val sentences = size(regexp_extract_all(
      array_join(cleanLines(text, p), "\n"), lit("[.!?]"), lit(0)))
    val noBad =
      if (p.badwords.isEmpty) lit(true)
      else !exists(t, w => w.isInCollection(p.badwords))
    Seq(
      "g_word_count" -> (size(t) >= p.minWords && size(t) <= p.maxWords),
      "g_mean_word_len" ->
        (meanLen >= p.minMeanWordLen && meanLen <= p.maxMeanWordLen),
      "g_symbol_ratio" -> (symbols / n <= p.maxSymbolRatio),
      "g_bullet_ratio" -> (bullets / nl <= p.maxBulletRatio),
      "g_ellipsis_ratio" -> (ellipsis / nl <= p.maxEllipsisRatio),
      "g_alpha_ratio" -> (alphaWords / n >= p.minAlphaRatio),
      "g_stopwords" -> (stopHits >= p.minStopwords),
      "c4_no_lorem" -> !lower(text).contains("lorem ipsum"),
      "c4_no_brace" -> !text.contains("{"),
      "c4_no_badword" -> noBad,
      "c4_min_sentences" -> (sentences >= p.minSentences))
  }

  /** First failing rule name in declared order, NULL when all pass. */
  def firstFail(stages: Seq[(String, Column)]): Column =
    coalesce(stages.map { case (name, pass) =>
      when(!pass, lit(name)) } :+ lit(null).cast("string"): _*)

  /** Annotate `df` with the line-filtered text, every rule flag, the
    * combined `keep`, and `first_fail` attribution. One codegen'd scan
    * projection — the text is read once per rule family (Catalyst CSE
    * collapses the shared token/line subtrees). */
  def annotate(df: DataFrame, textCol: String,
      p: RuleParams = RuleParams()): DataFrame = {
    val rs = rules(col(textCol), p)
    val flagged = rs.foldLeft(df) { case (acc, (name, pass)) =>
      acc.withColumn(name, pass)
    }
    flagged
      .withColumn("text_clean", array_join(cleanLines(col(textCol), p), "\n"))
      .withColumn("keep", rs.map(r => col(r._1)).reduce(_ && _))
      .withColumn("first_fail",
        coalesce(rs.map { case (name, _) =>
          when(!col(name), lit(name)) } :+ lit(null).cast("string"): _*))
  }

  /** Funnel attrition accounting: each document is charged to the FIRST
    * stage whose pass-flag is false (stages in pipeline order), survivors
    * to the terminal "kept" bucket — so the per-stage removal counts sum
    * exactly to the corpus size and a document removed by two stages is
    * counted once, at the stage that actually removed it. One tiny
    * hash aggregation with map-side partials; the stage label is an
    * expression, so no second pass over the text. */
  def attritionReport(df: DataFrame,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "attritionReport needs at least one stage")
    val stage = coalesce(stages.map { case (name, pass) =>
      when(!pass, lit(name)) } :+ lit("kept"): _*)
    df.groupBy(stage.as("stage")).agg(count(lit(1)).as("n_docs"))
  }
}
