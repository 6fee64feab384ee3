package graft.functions

import graft.SparkSpec

/** Misra–Gries guarantees: heavy hitters always survive, counts
  * underestimate by at most n/(k+1), and the guarantee holds through the
  * distributed partial/merge path (many partitions). */
class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  test("heavy hitters survive; counts underestimate within n/(k+1)") {
    // planted zipf-ish stream: token "hot_i" appears (40 - 3i) times over
    // a noise floor of unique singletons
    val hot = (0 until 8).flatMap(i => Seq.fill(40 - 3 * i)(s"hot_$i"))
    val noise = (0 until 300).map(i => s"noise_$i")
    val stream = scala.util.Random.javaRandomToRandom(
      new java.util.Random(3)).shuffle(hot ++ noise)
    val n = stream.length
    val k = 10
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sketch = stream.toDS().repartition(13)
      .select(new FrequentItems(k).toColumn).head()
    assert(sketch.size <= k)
    val bound = n.toDouble / (k + 1)
    exact.foreach { case (tok, c) =>
      if (c > bound)
        assert(sketch.contains(tok), s"heavy hitter $tok (count $c) evicted")
    }
    sketch.foreach { case (tok, est) =>
      val truth = exact.getOrElse(tok, 0L)
      assert(est <= truth, s"$tok overestimated: $est > $truth")
      assert(truth - est <= bound + 1e-9,
        s"$tok underestimated beyond bound: $truth - $est > $bound")
    }
  }

  test("driver certificate: q110's containment checks all pass") {
    val rows = graft.SparkEntry.queries("q110_heavy_hitters")(
      spark, "/root/testdata/sf0.001")
      .as[(String, Double, Boolean)].collect()
    assert(rows.map(_._1).toSet ===
      Set("mg_heavy_hitters_nonempty", "mg_containment"))
    assert(rows.forall(_._3), s"guarantee violated: ${rows.filterNot(_._3).toSeq}")
  }
}
