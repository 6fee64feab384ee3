package graft

/** Driver-contract smoke: entry returns rows, every query runs at sf0.001,
  * every oracle key names a registered query. */
class EntrySmokeSpec extends SparkSpec {

  test("entry produces rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val qk = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qk)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, "/root/testdata/sf0.001").count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
