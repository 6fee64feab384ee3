package graft.operators

import graft.SparkSpec
import graft.operators.HeuristicFilters.RuleParams
import org.apache.spark.sql.functions._

/** HeuristicFilters beyond the q187/q188 fixture: each rule isolated on a
  * hand-planted page, the C4 line filter's keep/drop cases, first-fail
  * ordering, attrition accounting, and the rule-name/rule-order sync the
  * oracle SQL depends on. */
class HeuristicFiltersSpec extends SparkSpec {
  import spark.implicits._

  private val P = RuleParams(minWords = 10, badwords = Seq("badstuff"))

  private def annotate1(text: String): org.apache.spark.sql.Row =
    HeuristicFilters.annotate(Seq((1L, text)).toDF("doc_id", "page"), "page", P)
      .select((Seq(col("keep"), col("first_fail"), col("text_clean")) ++
        HeuristicFilters.ruleNames.map(col)): _*)
      .head()

  private val Good =
    "The quality of this page is quite fine and steady it seems today.\n" +
      "We have that report to be sure of it here.\n" +
      "It ends with the final word done and checked."

  test("ruleNames matches rules() order (the oracle-SQL contract)") {
    assert(HeuristicFilters.rules(lit("x"), P).map(_._1) ===
      HeuristicFilters.ruleNames)
  }

  test("a good page passes every rule") {
    val r = annotate1(Good)
    assert(r.getBoolean(0), "keep")
    assert(r.isNullAt(1), "first_fail null")
    assert(r.getString(2) === Good, "clean text unchanged")
  }

  test("each planted defect fails exactly its own rule") {
    def firstFail(text: String): String = {
      val r = annotate1(text)
      assert(!r.getBoolean(0))
      r.getString(1)
    }
    assert(firstFail("Tiny page the end.") === "g_word_count")
    assert(firstFail(
      ("incomprehensibilities deinstitutionalization the of " +
        "counterrevolutionaries electroencephalographically " +
        "incomprehensibilities deinstitutionalization " +
        "electroencephalographically counterrevolutionaries " +
        "incomprehensibilities.")) === "g_mean_word_len")
    assert(firstFail(
      "# # # # the counting of hashmark symbols here is of noteworthy scale.")
      === "g_symbol_ratio")
    assert(firstFail(
      "- the first bullet item of the page list.\n" +
        "- the second bullet item of the page list.") === "g_bullet_ratio")
    assert(firstFail(
      "The first line of the page runs on and on...\n" +
        "The second line of the page also trails away and off...")
      === "g_ellipsis_ratio")
    assert(firstFail(
      "1 2 3 4 5 6 the numerical values dominate this entire page fully.")
      === "g_alpha_ratio")
    assert(firstFail(
      "Plain words appear here during review cycles near final gates today.")
      === "g_stopwords")
    assert(firstFail(Good + "\nWe have that lorem ipsum passage of filler.")
      === "c4_no_lorem")
    assert(firstFail(Good + "\nconfig = { the width of it is 3 }.")
      === "c4_no_brace")
    assert(firstFail(Good + "\nWe have that badstuff word in the page here.")
      === "c4_no_badword")
    assert(firstFail(
      "The single long sentence of this page has all the usual words today.")
      === "c4_min_sentences")
  }

  test("C4 line filter: terminal punctuation, 5 words, javascript") {
    val r = annotate1(Good +
      "\nno terminal punctuation here\n" + // dropped: no [.!?"] ending
      "Too few words.\n" + // dropped: < minLineWords
      "Enable javascript to see the menu of this site.\n" + // dropped
      "A perfectly ordinary closing sentence stays in place.") // kept
    assert(r.getBoolean(0), "page still kept")
    assert(r.getString(2) === Good +
      "\nA perfectly ordinary closing sentence stays in place.")
  }

  test("first_fail honors declared order (word count before sentences)") {
    // fails BOTH g_word_count and c4_min_sentences; attribution = first
    assert(annotate1("Tiny page the end.").getString(1) === "g_word_count")
  }

  test("attritionReport: first failing stage wins, counts sum to corpus") {
    val df = Seq(
      (1L, true, true), // kept
      (2L, false, true), // stage a
      (3L, false, false), // stage a (first fail wins)
      (4L, true, false) // stage b
    ).toDF("id", "a", "b")
    val rep = HeuristicFilters
      .attritionReport(df, Seq("a" -> col("a"), "b" -> col("b")))
      .as[(String, Long)].collect().toMap
    assert(rep === Map("kept" -> 1L, "a" -> 2L, "b" -> 1L))
    assert(rep.values.sum === 4L)
  }

  test("empty and whitespace-only pages do not divide by zero") {
    val r = HeuristicFilters.annotate(
      Seq((1L, ""), (2L, "   \n  ")).toDF("doc_id", "page"), "page", P)
      .select(col("keep"), col("first_fail"))
      .collect()
    assert(r.forall(!_.getBoolean(0)))
    assert(r.forall(_.getString(1) === "g_word_count"))
  }
}
