package graft.queries

import graft.{NamedQuery, Tables}
import graft.operators.HeuristicFilters
import graft.operators.HeuristicFilters.RuleParams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Rule-based quality filtering (operators.HeuristicFilters) — the C4 +
  * Gopher heuristic gate and its attrition accounting. The fixture plants
  * twelve page shapes closed-form in doc_id, one per rule (a good page, a
  * lorem-ipsum page, a code page, a badword page, a bullet list, an
  * ellipsis-heavy page, a too-short page, a long-words page, a symbol-spam
  * page, a numeric page, a stopword-free page, and a good page wrapped in
  * junk lines the C4 line filter must strip), plus planted exact duplicates
  * among the survivors — so every rule, the line filter, the first-fail
  * attribution, and the per-stage attrition counts are all under the
  * driver's hash at both SFs, two-sided (each rule has pages that pass it
  * and pages that fail it).
  */
object RuleFilterOps {

  /** Fixture thresholds: published defaults except `minWords` (the
    * synthetic pages are short) and the planted badword. */
  private val P = RuleParams(minWords = 20, badwords = Seq("badstuff"))

  /** Planted pages, closed-form in doc_id. Docs with doc_id % 26 == 0
    * (half the good-page variant, since 26 = 2 × 13) share one constant
    * body so the attrition funnel's exact-dedup stage has guaranteed
    * survivors AND guaranteed removals at every SF. */
  private def planted(s: SparkSession, d: String): DataFrame = {
    val b1raw = translate(substring(col("text"), 1, 24), " ", "_")
    val b1 = when(col("doc_id") % 26 === 0, lit("a_shared_page_body_token"))
      .otherwise(b1raw)
    val l1 = concat(lit("The quality of this page is fine and "), b1,
      lit(" appears."))
    val l2 = lit("We have that report to be sure of it.")
    val l3 = lit("It ends with the final word done.")
    val nl = lit("\n")
    val good = concat(l1, nl, l2, nl, l3)
    val v = col("doc_id") % 13
    val page = when(v === 0, good)
      .when(v === 1, concat(l1, nl,
        lit("We have that lorem ipsum dolor sit amet passage."), nl, l3))
      .when(v === 2, concat(good, nl,
        lit("function f() { return "), b1, lit("; }")))
      .when(v === 3, concat(l1, nl,
        lit("We have that badstuff report to be sure of it."), nl, l3))
      .when(v === 4, concat(
        lit("- the bullet item number one of "), b1,
        lit(" list.\n- the bullet item number two of "), b1,
        lit(" list.\n- the bullet item number three of "), b1,
        lit(" list.\n- the bullet item number four of "), b1, lit(" list.")))
      .when(v === 5, concat(lit("The first part of "), b1, lit(
        " goes on...\nThe second part of the report goes on...\n" +
        "We keep the rest of it here safely done.\n" +
        "The last line has the usual ending today.")))
      .when(v === 6, lit("Tiny page the end."))
      .when(v === 7, lit(LongWordsPage))
      .when(v === 8, concat(good, nl,
        lit("# # # # # end of the tally here.")))
      .when(v === 9, concat(good, nl, lit("1 2 3 4 5 6 7 8 9 10 11 12.")))
      .when(v === 10, lit(NoStopwordPage))
      .when(v === 11, concat(good, nl, lit(
        "short line\nclick here for the javascript menu links now.\ntiny one.")))
      .otherwise(lit(TwoSentencePage))
    Tables.documents(s, d).select(col("doc_id"), page.as("page"))
  }

  /** Mean word length 21+ chars — fails ONLY the Gopher mean-length rule
    * (21 words, 2 distinct stopwords, three 7-word terminal-punct lines). */
  private val LongWordsPage: String = Seq(
    "incomprehensibilities deinstitutionalization counterrevolutionaries " +
      "electroencephalographically the incomprehensibilities deinstitutionalization.",
    "deinstitutionalization incomprehensibilities electroencephalographically " +
      "counterrevolutionaries of electroencephalographically incomprehensibilities.",
    "counterrevolutionaries electroencephalographically deinstitutionalization " +
      "incomprehensibilities electroencephalographically deinstitutionalization " +
      "incomprehensibilities.").mkString("\n")

  /** 21 ordinary words, none from the Gopher stopword list — fails ONLY
    * the required-stopword rule. */
  private val NoStopwordPage: String = Seq(
    "Plain words appear here during review cycles.",
    "Vendors ship updates while users compile code.",
    "Final gates remain green under heavy load.").mkString("\n")

  /** 26 words but only TWO sentences survive the line filter — fails ONLY
    * C4's minimum-sentence rule (so the attrition report exercises every
    * removal reason, not just every flag). */
  private val TwoSentencePage: String = Seq(
    "The opening line of this page carries all of the needed words today.",
    "The closing line of this page carries all of the needed words too.")
    .mkString("\n")

  /** The oracle's closed-form reconstruction of [[planted]] plus the full
    * rule mirror — shared by q187 and q188. Ends with the `ann` CTE:
    * (doc_id, n_words, n_lines, n_lines_kept, n_sentences, 11 flags,
    * keep, first_fail, text_clean). */
  private val annSql: String = {
    val ruleCols = HeuristicFilters.ruleNames.mkString(", ")
    val longSql = LongWordsPage.split("\n")
      .mkString("'", "' || chr(10) || '", "'")
    val noStopSql = NoStopwordPage.split("\n")
      .mkString("'", "' || chr(10) || '", "'")
    val twoSentSql = TwoSentencePage.split("\n")
      .mkString("'", "' || chr(10) || '", "'")
    s"""WITH bb AS (SELECT doc_id, doc_id % 13 AS v,
        CASE WHEN doc_id % 26 = 0 THEN 'a_shared_page_body_token'
             ELSE replace(substr(text, 1, 24), ' ', '_') END AS b1
      FROM documents),
    pl AS (SELECT doc_id, v, b1,
        'The quality of this page is fine and ' || b1 || ' appears.' AS l1,
        'We have that report to be sure of it.' AS l2,
        'It ends with the final word done.' AS l3
      FROM bb),
    pg AS (SELECT doc_id,
        CASE v
          WHEN 0 THEN l1 || chr(10) || l2 || chr(10) || l3
          WHEN 1 THEN l1 || chr(10) || 'We have that lorem ipsum dolor sit amet passage.' || chr(10) || l3
          WHEN 2 THEN l1 || chr(10) || l2 || chr(10) || l3 || chr(10) || 'function f() { return ' || b1 || '; }'
          WHEN 3 THEN l1 || chr(10) || 'We have that badstuff report to be sure of it.' || chr(10) || l3
          WHEN 4 THEN '- the bullet item number one of ' || b1 || ' list.' || chr(10) || '- the bullet item number two of ' || b1 || ' list.' || chr(10) || '- the bullet item number three of ' || b1 || ' list.' || chr(10) || '- the bullet item number four of ' || b1 || ' list.'
          WHEN 5 THEN 'The first part of ' || b1 || ' goes on...' || chr(10) || 'The second part of the report goes on...' || chr(10) || 'We keep the rest of it here safely done.' || chr(10) || 'The last line has the usual ending today.'
          WHEN 6 THEN 'Tiny page the end.'
          WHEN 7 THEN $longSql
          WHEN 8 THEN l1 || chr(10) || l2 || chr(10) || l3 || chr(10) || '# # # # # end of the tally here.'
          WHEN 9 THEN l1 || chr(10) || l2 || chr(10) || l3 || chr(10) || '1 2 3 4 5 6 7 8 9 10 11 12.'
          WHEN 10 THEN $noStopSql
          WHEN 11 THEN l1 || chr(10) || l2 || chr(10) || l3 || chr(10) || 'short line' || chr(10) || 'click here for the javascript menu links now.' || chr(10) || 'tiny one.'
          ELSE $twoSentSql
        END AS page
      FROM pl),
    fx AS (SELECT doc_id, page,
        string_split(regexp_replace(trim(lower(page)), '\\s+', ' ', 'g'), ' ') AS toks,
        string_split(page, chr(10)) AS ls,
        list_filter(string_split(page, chr(10)), l ->
          regexp_matches(trim(l), '[.!?"]$$')
          AND len(string_split(regexp_replace(trim(l), '\\s+', ' ', 'g'), ' ')) >= 5
          AND NOT contains(lower(l), 'javascript')) AS kept
      FROM pg),
    fl AS (SELECT doc_id, page, toks, ls, kept,
        COALESCE(array_to_string(kept, chr(10)), '') AS text_clean,
        len(toks) >= 20 AND len(toks) <= 100000 AS g_word_count,
        CAST(list_sum(list_transform(toks, w -> LENGTH(w))) AS DOUBLE) / len(toks) >= 3.0
          AND CAST(list_sum(list_transform(toks, w -> LENGTH(w))) AS DOUBLE) / len(toks) <= 10.0 AS g_mean_word_len,
        CAST(len(regexp_extract_all(page, '#|\\.\\.\\.|…')) AS DOUBLE) / len(toks) <= 0.1 AS g_symbol_ratio,
        CAST(len(list_filter(ls, l -> regexp_matches(trim(l), '^[-*•] '))) AS DOUBLE) / len(ls) <= 0.9 AS g_bullet_ratio,
        CAST(len(list_filter(ls, l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$$'))) AS DOUBLE) / len(ls) <= 0.3 AS g_ellipsis_ratio,
        CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len(toks) >= 0.8 AS g_alpha_ratio,
        len(list_filter(['the','be','to','of','and','that','have','with'], sw -> list_contains(toks, sw))) >= 2 AS g_stopwords,
        NOT contains(lower(page), 'lorem ipsum') AS c4_no_lorem,
        NOT contains(page, '{') AS c4_no_brace,
        len(list_filter(toks, w -> w IN ('badstuff'))) = 0 AS c4_no_badword,
        len(regexp_extract_all(COALESCE(array_to_string(kept, chr(10)), ''), '[.!?]')) >= 3 AS c4_min_sentences
      FROM fx),
    ann AS (SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_words,
        CAST(len(ls) AS BIGINT) AS n_lines,
        CAST(len(kept) AS BIGINT) AS n_lines_kept,
        CAST(len(regexp_extract_all(text_clean, '[.!?]')) AS BIGINT) AS n_sentences,
        $ruleCols,
        (g_word_count AND g_mean_word_len AND g_symbol_ratio AND g_bullet_ratio
          AND g_ellipsis_ratio AND g_alpha_ratio AND g_stopwords AND c4_no_lorem
          AND c4_no_brace AND c4_no_badword AND c4_min_sentences) AS keep,
        CASE WHEN NOT g_word_count THEN 'g_word_count'
             WHEN NOT g_mean_word_len THEN 'g_mean_word_len'
             WHEN NOT g_symbol_ratio THEN 'g_symbol_ratio'
             WHEN NOT g_bullet_ratio THEN 'g_bullet_ratio'
             WHEN NOT g_ellipsis_ratio THEN 'g_ellipsis_ratio'
             WHEN NOT g_alpha_ratio THEN 'g_alpha_ratio'
             WHEN NOT g_stopwords THEN 'g_stopwords'
             WHEN NOT c4_no_lorem THEN 'c4_no_lorem'
             WHEN NOT c4_no_brace THEN 'c4_no_brace'
             WHEN NOT c4_no_badword THEN 'c4_no_badword'
             WHEN NOT c4_min_sentences THEN 'c4_min_sentences'
             ELSE NULL END AS first_fail,
        text_clean
      FROM fl)"""
  }

  /** q187: the C4 + Gopher rule gate itself — every flag, the line-filtered
    * text, the combined keep, and the first-fail attribution per document.
    * Pure codegen scan projection (no joins, no shuffle). */
  private val q187 = NamedQuery(
    "q187_c4_gopher_rules",
    (s, d) => {
      val ann = HeuristicFilters.annotate(planted(s, d), "page", P)
      val ruleCols = HeuristicFilters.ruleNames.map(col)
      ann.select(Seq(
        col("doc_id"),
        size(split(regexp_replace(trim(lower(col("page"))), "\\s+", " "), " "))
          .cast(LongType).as("n_words"),
        size(split(col("page"), "\n", -1)).cast(LongType).as("n_lines"),
        size(HeuristicFilters.cleanLines(col("page"), P)).cast(LongType)
          .as("n_lines_kept"),
        size(regexp_extract_all(col("text_clean"), lit("[.!?]"), lit(0)))
          .cast(LongType).as("n_sentences")) ++
        ruleCols ++ Seq(col("keep"), col("first_fail"), col("text_clean")): _*)
    },
    Some(s"""$annSql SELECT * FROM ann"""))

  /** q188: funnel attrition accounting — each document charged to the first
    * stage that removed it (the 11 rules in order, then exact dedup on the
    * line-filtered text among rule survivors), survivors to "kept"; counts
    * sum exactly to the corpus size. One content-key groupBy for the dedup
    * stage + one tiny reason aggregation with map-side partials. */
  private val q188 = NamedQuery(
    "q188_curation_attrition",
    (s, d) => {
      val ann = HeuristicFilters.annotate(planted(s, d), "page", P)
      val surv = ann.filter(col("keep")).groupBy(col("text_clean"))
        .agg(min(col("doc_id")).as("_surv"))
      val flagged = ann.join(surv, Seq("text_clean"), "left")
        .withColumn("pass_dup",
          !(col("keep") && col("doc_id") =!= col("_surv")))
      HeuristicFilters.attritionReport(flagged,
        HeuristicFilters.ruleNames.map(n => n -> col(n)) :+
          ("exact_dup" -> col("pass_dup")))
    },
    Some(s"""$annSql,
      sv AS (SELECT text_clean, MIN(doc_id) AS surv
             FROM ann WHERE keep GROUP BY text_clean)
      SELECT COALESCE(first_fail,
               CASE WHEN ann.doc_id <> sv.surv THEN 'exact_dup'
                    ELSE 'kept' END) AS stage,
             COUNT(*) AS n_docs
      FROM ann LEFT JOIN sv USING (text_clean)
      GROUP BY 1"""))

  def all: Seq[NamedQuery] = Seq(q187, q188)
}
