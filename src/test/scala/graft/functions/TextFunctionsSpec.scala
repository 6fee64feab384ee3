package graft.functions

import graft.SparkSpec
import graft.multimodal.IntVec
import org.apache.spark.sql.functions._

/** Parity between the SQL `tokens` column and its Scala-side replica
  * `tokenizeLikeSql` — the typed flatMap operators (shingling, substring
  * windows) assume the two produce IDENTICAL token arrays, so any
  * divergence silently shifts shingles and window starts. */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "Plain ASCII Words",
    "  leading and trailing  ",
    "\ttab\nnewlinevtab mixed\r\n",
    "", " ", "\n",
    // non-ASCII: exercises UTF8String.toLowerCaseSlow (default-locale
    // String.toLowerCase) vs the replica's fallback — the round-5 advice
    // divergence. Dotted/dotless I, sharp s, Greek final sigma, fullwidth.
    "İstanbul I ı TITLE",
    "Straße GROSS ΣΟΦΟΣ ΟΔΥΣΣΕΥΣ",
    "ＦＵＬＬＷＩＤＴＨ ＡＳＣＩＩ",
    "mixed İ ascii TAIL",
    " nbsp is not sql-space ")

  test("tokenizeLikeSql matches the SQL tokens column, incl. non-ASCII") {
    val sql = cases.toDF("t")
      .select(TextFunctions.tokens(col("t")).as("toks"))
      .collect().map(_.getSeq[String](0).toArray)
    val scala2 = cases.map(TextFunctions.tokenizeLikeSql)
    for (((s, q), c) <- scala2.zip(sql).zip(cases))
      assert(s.toSeq === q.toSeq, s"case '$c'")
  }

  test("IntVec: growth, slice append, exact toArray") {
    val v = new IntVec(2)
    (0 until 1000).foreach(i => v += i * 3)
    v.addSlice(Array(7, 8, 9, 10), 3)
    assert(v.length === 1003)
    assert(!v.isEmpty)
    val a = v.toArray
    assert(a.length === 1003)
    assert(a(0) === 0 && a(999) === 2997 && a.takeRight(3).toSeq === Seq(7, 8, 9))
    assert((new IntVec()).isEmpty)
  }
}
