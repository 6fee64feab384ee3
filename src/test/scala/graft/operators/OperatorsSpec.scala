package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpatialJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def randomPoints(n: Int, seed: Int, idOffset: Int = 0) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i + idOffset, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
      .toDF("id", "x", "y")
  }

  test("grid-bucketed NN join equals brute force") {
    val a = randomPoints(200, 1)
    val b = randomPoints(60, 2, 1000)
    val radius = 7.0
    val got = SpatialJoins.nearestNeighbor(a, "id", "x", "y", b, "id", "x", "y", radius)
      .select("left_id", "right_id").as[(Int, Int)].collect().toSet
    // brute force
    val as = a.as[(Int, Double, Double)].collect()
    val bs = b.as[(Int, Double, Double)].collect()
    val expect = as.flatMap { case (ai, ax, ay) =>
      val withDist = bs.map { case (bi, bx, by) =>
        (bi, math.sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by)))
      }
      val (bi, d) = withDist.minBy { case (i, d) => (d, i) }
      if (d < radius) Some((ai, bi)) else None
    }.toSet
    assert(got === expect)
  }

  test("NN join radius edge: farther-than-radius candidates excluded") {
    val a = Seq((1, 0.0, 0.0)).toDF("id", "x", "y")
    val b = Seq((10, 5.0, 0.0), (11, 30.0, 0.0)).toDF("id", "x", "y")
    val got = SpatialJoins.nearestNeighbor(a, "id", "x", "y", b, "id", "x", "y", 20.0)
      .select("right_id").as[Int].collect()
    assert(got.toSeq === Seq(10))
    val none = SpatialJoins.nearestNeighbor(a, "id", "x", "y",
      Seq((11, 30.0, 0.0)).toDF("id", "x", "y"), "id", "x", "y", 20.0).count()
    assert(none === 0)
  }

  test("crowding anti-join drops exactly the crowded points") {
    // cluster of 3 within r, plus 2 isolated
    val pts = Seq((1, 0.0, 0.0), (2, 1.0, 0.0), (3, 0.0, 1.0),
      (4, 50.0, 50.0), (5, 80.0, 10.0)).toDF("id", "x", "y")
    val kept = SpatialJoins.crowdingAnti(pts, "id", "x", "y", 5.0)
      .select("id").as[Int].collect().toSet
    assert(kept === Set(4, 5))
  }
}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("latest at-or-before row matches; no-match yields null") {
    val left = Seq((100L, 1L, ts(50)), (101L, 1L, ts(5)), (102L, 2L, ts(50)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 1L, ts(10), 1.0), (11L, 1L, ts(40), 2.0),
      (12L, 1L, ts(60), 3.0), (13L, 3L, ts(1), 9.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id",
      Seq("event_id", "value"))
      .select("event_id", "asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(100L) === Some(11L)) // ts 40 is latest <= 50
    assert(out(101L) === None)      // nothing at or before 5
    assert(out(102L) === None)      // user 2 has no right rows
  }

  test("inclusive at equal timestamps, largest id wins ties") {
    val left = Seq((100L, 1L, ts(10))).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 1L, ts(10), 1.0), (11L, 1L, ts(10), 2.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id",
      Seq("event_id")).select("asof_event_id").as[Long].head()
    assert(out === 11L)
  }

  test("forward direction takes the next at-or-after row") {
    val left = Seq((100L, 1L, ts(50)), (101L, 1L, ts(70)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 1L, ts(10)), (11L, 1L, ts(60)))
      .toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id",
      Seq("event_id"), "forward", None)
      .select("event_id", "asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(100L) === Some(11L)) // next at-or-after 50 is 60
    assert(out(101L) === None)      // nothing after 70
  }

  test("nearest picks the closer side, backward on exact ties") {
    val left = Seq((100L, 1L, ts(50)), (101L, 1L, ts(58)), (102L, 1L, ts(45)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 1L, ts(40)), (11L, 1L, ts(60)))
      .toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id",
      Seq("event_id"), "nearest", None)
      .select("event_id", "asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(100L) === Some(10L)) // |50-40| == |50-60| → backward wins
    assert(out(101L) === Some(11L)) // 60 closer than 40
    assert(out(102L) === Some(10L)) // 40 closer than 60
  }

  test("tolerance nulls matches beyond the bound but keeps left rows") {
    val left = Seq((100L, 1L, ts(50)), (101L, 1L, ts(500)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 1L, ts(40))).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id",
      Seq("event_id"), "backward", Some(20e6)) // 20 s in µs
      .select("event_id", "asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(100L) === Some(10L)) // 10 s back, inside tolerance
    assert(out(101L) === None)      // 460 s back, outside
  }
}

class RankTrimSpec extends SparkSpec {
  import spark.implicits._

  private def group(n: Int, g: String) =
    (1 to n).map(i => (g, i, i.toDouble * 10)).toDF("g", "id", "flux")

  test("trim fires only above the 10-row threshold (core.py:339)") {
    val at10 = RankTrim.trim(group(10, "a"), Seq($"g"), $"flux", Seq($"id"), 5, 10)
    assert(at10.count() === 10) // untouched at exactly 10
    val at11 = RankTrim.trim(group(11, "b"), Seq($"g"), $"flux", Seq($"id"), 5, 10)
    val kept = at11.select("id").as[Int].collect().toSet
    assert(kept === Set(6)) // 5 brightest (7..11) and 5 dimmest (1..5) removed
  }

  test("groups trim independently") {
    val df = group(10, "a").union(group(20, "b"))
    val out = RankTrim.trim(df, Seq($"g"), $"flux", Seq($"id"), 5, 10)
    assert(out.filter($"g" === "a").count() === 10)
    assert(out.filter($"g" === "b").count() === 10)
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again today"), // near dup
    (4L, "completely different content about spark engines and data pipelines here"),
    (5L, "another unrelated document mentioning databases and queries only once")
  ).toDF("doc_id", "text")

  test("exact dedup keeps deterministic survivor with copy count") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(out(1L) === 2L)
    assert(!out.contains(2L))
    assert(out(3L) === 1L)
  }

  test("keepBest keeps max-quality survivor, min-id on ties, NFC grouping") {
    val copies = Seq(
      (10L, "same page text", 2.0),
      (11L, "same page text", 7.0),   // highest quality → survivor
      (12L, "same page text", 7.0),   // quality tie with 11 → higher id loses
      (20L, "café menu", 1.0),   // precomposed é …
      (21L, "café menu", 3.0),  // … decomposed: same NFC cluster, wins
      (30L, "unique doc", 5.0)
    ).toDF("doc_id", "text", "q")
    val out = Dedup.keepBest(copies, "doc_id", "text", "q")
      .select("keep_id", "n_copies", "best_quality")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet === Set(11L, 21L, 30L))
    assert(out(11L) === ((11L, 3L, 7.0)))
    assert(out(21L) === ((21L, 2L, 3.0)))
    assert(out(30L) === ((30L, 1L, 5.0)))
  }

  test("lineDedup drops corpus-frequent lines, keeps order, counts both sides") {
    val pages = Seq(
      (1L, "alpha one\nboiler\nbody a\ntail 1"),
      (2L, "alpha two\nboiler\nbody b\ntail 2"),
      (3L, "alpha three\nboiler\nbody c"),
      (4L, "boiler\nboiler\nonly boiler doc"), // within-doc repeat: both dropped
      (5L, "boiler") // all-boilerplate doc survives with empty text
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(pages, "doc_id", "text", maxDocFreq = 2)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size === 5)
    assert(out(1L) === ((1L, "alpha one\nbody a\ntail 1", 3L, 1L)))
    assert(out(2L) === ((2L, "alpha two\nbody b\ntail 2", 3L, 1L)))
    assert(out(4L) === ((4L, "only boiler doc", 1L, 2L)))
    assert(out(5L) === ((5L, "", 0L, 1L)))
  }

  test("lineDedupNormalized collapses reformatted/decomposed boilerplate; " +
      "survivors keep original bytes") {
    // the footer appears in 3 raw spellings (composed, decomposed, extra
    // whitespace) — raw df is 1 each (kept by lineDedup) but the shared
    // normalized key has df 3 (> 2 → dropped by the normalized form)
    val pages = Seq(
      (1L, "body  one\ncaf\u00e9 footer"),
      (2L, "body two\ncafe\u0301 footer"),
      (3L, "body three\n\tcaf\u00e9  footer ") // tab-led, respaced variant
    ).toDF("doc_id", "text")
    val raw = Dedup.lineDedup(pages, "doc_id", "text", maxDocFreq = 2)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(raw(1L)._4 === 0L) // raw keys: every footer spelling unique
    val out = Dedup.lineDedupNormalized(pages, "doc_id", "text", maxDocFreq = 2)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // footers dropped via the shared normalized key; surviving body lines
    // keep their ORIGINAL bytes (doc 1's double space intact)
    assert(out(1L) === ((1L, "body  one", 1L, 1L)))
    assert(out(2L) === ((2L, "body two", 1L, 1L)))
    assert(out(3L) === ((3L, "body three", 1L, 1L)))
  }

  test("row-local bandKeys equal the batch groupBy band signatures") {
    import org.apache.spark.sql.functions._
    val (n, k, bands) = (3, 32, 8)
    // the batch recipe, restated: per-doc minhash via groupBy over the
    // exploded distinct shingles, then the same per-band XOR fold
    val sh = Dedup.shingleSet(docs, "doc_id", "text", n)
    val minCols = (0 until k).map(h =>
      min(xxhash64(lit(h), col("shingle"))).as(s"mh$h"))
    val sig = sh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    val expected = (0 until bands).flatMap { b =>
      val members = (0 until k).filter(_ % bands == b)
      sig.select(col("doc_id"),
        members.map(h => xxhash64(lit(h), col(s"mh$h")))
          .reduce(_.bitwiseXOR(_)).as("band_sig"))
        .as[(Long, Long)].collect().map { case (d, s) => (d, b, s) }
    }.toSet
    val got = Dedup.bandKeys(docs, "doc_id", "text", n, k, bands)
      .as[(Long, Int, Long)].collect().toSet
    assert(got === expected)
  }

  test("verifyCandidates keeps only true-Jaccard pairs from a candidate superset") {
    import org.apache.spark.sql.functions.col
    // a superset of candidates incl. junk: exact-verify must keep exactly
    // the >= 0.9 pairs (1,2 identical) and drop the rest
    val cands = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = Dedup.verifyCandidates(docs, cands, "doc_id", "text", 3, 0.9)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(kept === Set((1L, 2L)))
  }

  test("ngram jaccard finds exact and near dup pairs only") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => b == 4L || b == 5L || a == 4L })
  }

  test("containment catches a quoted document that Jaccard misses") {
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val filler = (1 to 60).map(i => s"filler$i").mkString(" ")
    val docs = Seq(
      (1L, quote),                       // the short original
      (2L, s"$filler $quote"),           // quoted inside a long doc
      (3L, "totally unrelated content about something else entirely here"))
      .toDF("doc_id", "text")
    // symmetric Jaccard at a dedup-grade threshold: the pair is invisible
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(!jac.contains((1L, 2L)), "Jaccard unexpectedly flagged the quote")
    // containment: every shingle of doc 1 appears in doc 2 → C(1→2) = 1.0
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.9)
      .as[(Long, Long, Long, Double)].collect()
    assert(cont.exists(r => r._1 == 1L && r._2 == 2L && r._4 == 1.0),
      s"containment missed the quoted doc: ${cont.toSeq}")
    // the reverse direction is diluted by the filler and must NOT fire
    assert(!cont.exists(r => r._1 == 2L && r._2 == 1L))
    assert(!cont.exists(r => r._1 == 3L || r._2 == 3L))
  }

  test("splitLeakage reports only near-dup pairs that cross the boundary") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today", "train"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today", "eval"),  // dup of 1, crossing
      (3L, "the quick brown fox jumps over the lazy dog again and again today", "train"), // dup of 1, same side
      (4L, "completely different content about spark engines and data pipelines here", "eval"),
      (5L, "another unrelated document mentioning databases and queries only once", "train")
    ).toDF("doc_id", "text", "split")
    val out = Dedup.splitLeakage(corpus, "doc_id", "text", "split", 3, 32, 8, 0.9)
      .select("id_a", "id_b", "split_a", "split_b")
      .as[(Long, Long, String, String)].collect().toSet
    // (1,2) and (2,3) cross; (1,3) is train-train and must NOT appear
    assert(out === Set((1L, 2L, "train", "eval"), (2L, 3L, "eval", "train")))
  }

  test("minhash LSH recovers the high-similarity pairs of exact jaccard") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 8, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh === exact)
    assert(exact.contains((1L, 2L)))
  }

  test("decontamination flags corpus docs overlapping the benchmark set") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val flagged = Dedup.contaminationPairs(docs, bench, "doc_id", "text", 3, 4)
      .as[(Long, Long, Long)].collect()
    // docs 1-3 share the long fox prefix; 4 and 5 share nothing
    assert(flagged.map(_._1).toSet === Set(1L, 2L, 3L))
    assert(flagged.forall(_._2 === 100L))
    assert(flagged.forall(_._3 >= 4L))
  }

  test("near-dup clusters: components get min-id labels, isolated docs stand alone") {
    val clusters = Dedup.nearDupClusters(docs, "doc_id", "text", 3, 0.5)
      .as[(Long, Long)].collect().toMap
    assert(clusters(1L) === 1L && clusters(2L) === 1L && clusters(3L) === 1L)
    assert(clusters(4L) === 4L && clusters(5L) === 5L)
  }

  test("df-capped pair generation keeps exact Jaccard for surviving pairs") {
    // every doc shares the hot phrase; only 1-2 are true near-dups
    val hotDocs = Seq(
      (1L, "common stop phrase here plus alpha beta gamma delta epsilon zeta"),
      (2L, "common stop phrase here plus alpha beta gamma delta epsilon eta"),
      (3L, "common stop phrase here plus totally different tail words now one"),
      (4L, "common stop phrase here plus yet another unrelated ending clause x")
    ).toDF("doc_id", "text")
    val exact = Dedup.ngramJaccardPairs(hotDocs, "doc_id", "text", 3, 0.3)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // cap df at 3: the 4-doc hot shingles stop generating pairs, but the
    // (1,2) pair still surfaces through its non-hot common shingles, with
    // the SAME exact Jaccard value
    val capped = Dedup.ngramJaccardPairs(hotDocs, "doc_id", "text", 3, 0.3, dfCap = 3)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(capped.contains((1L, 2L)))
    assert(capped((1L, 2L)) === exact((1L, 2L)))
    assert(capped.keySet.subsetOf(exact.keySet))
  }

  test("star contraction: 1000-node path graph converges in O(log n) rounds") {
    // the planted worst case for min-label propagation (O(diameter) = 999
    // rounds); large-star/small-star must fold it logarithmically
    val edges = (0L until 999L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = Dedup.starContract(edges)
    assert(rounds <= 16, s"took $rounds rounds — not O(log n)")
    val got = labels.as[(Long, Long)].collect()
    assert(got.length === 1000)
    assert(got.forall(_._2 == 0L), "every path node labels to the min (0)")
  }

  test("star contraction labels equal brute-force union-find on random graphs") {
    val rnd = new scala.util.Random(7)
    val n = 60
    val es = (0 until 80)
      .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2)
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    es.foreach { case (a, b) =>
      val ra = find(a.toInt); val rb = find(b.toInt)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val present = es.flatMap(e => Seq(e._1, e._2)).distinct
    val minOfComp = present.groupBy(v => find(v.toInt))
      .flatMap { case (_, vs) => vs.map(_ -> vs.min) }
    val (labels, _) = Dedup.starContract(es.toDF("src", "dst"))
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got === minOfComp.toMap)
  }

  test("deep near-dup chains exceed propagation rounds and fall back exactly") {
    // 120 docs, each a 40-token sliding window shifted by 1: at J ≥ 0.9
    // only ±1/±2 neighbors connect, so the component's diameter (~60)
    // exceeds the propagation round budget (50) — the cluster op must
    // fall back to star contraction rather than ship truncated labels
    val words = (0 until 220).map(i => s"w$i")
    val chain = (0 until 120).map { i =>
      (i.toLong + 1, words.slice(i, i + 40).mkString(" "))
    }.toDF("doc_id", "text")
    val clusters = Dedup.nearDupClusters(chain, "doc_id", "text", 3, 0.9)
      .as[(Long, Long)].collect().toMap
    assert(clusters.size === 120)
    assert(clusters.values.toSet === Set(1L), "one chain, min-id label")
  }

  test("duplicate spans: planted verbatim repeats merge into maximal regions") {
    // docs 10/11 share a 12-token verbatim passage (planted mid-text);
    // doc 12 repeats a passage WITHIN itself; doc 13 is all-unique
    val passage = "zero one two three four five six seven eight nine ten eleven"
    val docs = Seq(
      (10L, s"aa bb cc $passage dd ee ff gg hh ii jj kk"),
      (11L, s"mm nn $passage oo pp qq rr ss tt uu vv ww xx"),
      (12L, s"s1 s2 s3 s4 rep1 rep2 rep3 rep4 rep5 mid1 mid2 mid3 rep1 rep2 rep3 rep4 rep5 s5 s6 s7 s8"),
      (13L, (1 to 40).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val n = 5
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", n)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).groupBy(_._1)
    // cross-doc passage: 12 tokens → one maximal span of length 12 each
    assert(spans(10L).map(_._2).toSeq === Seq((3L, 15L)))
    assert(spans(11L).map(_._2).toSeq === Seq((2L, 14L)))
    // within-doc repeat: the 5-token block at 4 and at 12
    assert(spans(12L).map(_._2).toSet === Set((4L, 9L), (12L, 17L)))
    // unique doc: no spans at all
    assert(!spans.contains(13L))
  }

  test("hashed duplicate spans equal the exact form on the fixture docs") {
    val n = 3
    val exact = Dedup.duplicateSpans(docs, "doc_id", "text", n)
      .as[(Long, Long, Long, Long)].collect().toSet
    val hashed = Dedup.duplicateSpansHashed(docs, "doc_id", "text", n)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(exact === hashed)
    assert(exact.nonEmpty) // docs 1-3 share long verbatim prefixes
  }

  test("simhash: identical docs at hamming 0; pairs symmetric-free (a<b)") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect()
    val h12 = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(h12.exists(_._3 === 0L))
    assert(pairs.forall(p => p._1 < p._2))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val emb = (0 until 100).map { i =>
    val base = Array.fill(16)(rnd.nextGaussian().toFloat)
    (i.toLong, base, i % 4)
  }.toDF("vec_id", "embedding", "label")

  test("brute-force top-k excludes self, ranks by cosine desc") {
    val probes = emb.filter($"vec_id" < 3)
    val out = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      probes, "vec_id", "embedding", 5)
    val rows = out.as[(Long, Long, Double, Long)].collect()
    assert(rows.length === 15)
    assert(rows.forall(r => r._1 != r._2))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._3).sliding(2).forall(s => s.length < 2 || s(0) >= s(1)))
    }
  }

  test("IVF with nprobe=all equals brute force; fewer probes keep recall") {
    val probes = emb.filter($"vec_id" < 5)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      probes, "vec_id", "embedding", 3)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivfAll = Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
      probes, "vec_id", "embedding", 3, 4)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(ivfAll === brute)
    val ivf2 = Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
      probes, "vec_id", "embedding", 3, 2)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = ivf2.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("trained IVF quantizer recovers planted clusters; nprobe=1 recall 1.0") {
    // 3 well-separated planted clusters: after 2 Lloyd rounds, trained
    // cells must align with the true clusters (each planted cluster maps
    // to exactly one cell), so probing ONE cell finds every true neighbor
    val crnd = new scala.util.Random(11)
    val centers = Seq(
      Array.fill(16)(0.0).updated(0, 10.0),
      Array.fill(16)(0.0).updated(5, 10.0),
      Array.fill(16)(0.0).updated(11, -10.0))
    val clustered = (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(v => (v + crnd.nextGaussian() * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
    val cells = Similarity.trainCells(clustered, "vec_id", "embedding",
      nCells = 3, iters = 2)
    val byCluster = cells.as[(Long, Int)].collect().groupBy(_._1 % 3)
    byCluster.values.foreach { members =>
      assert(members.map(_._2).toSet.size === 1,
        s"planted cluster split across cells: ${members.toSeq}")
    }
    assert(byCluster.values.map(_.head._2).toSet.size === 3,
      "distinct planted clusters merged into one cell")
    // determinism: a second training run yields identical assignments
    val again = Similarity.trainCells(clustered, "vec_id", "embedding", 3, 2)
      .as[(Long, Int)].collect().sortBy(_._1)
    assert(again.toSeq === cells.as[(Long, Int)].collect().sortBy(_._1).toSeq)
    // single-probe search within the trained cells: full recall, because
    // true neighbors share the probe's cell
    val probes = clustered.filter($"vec_id" < 3)
    val withCell = clustered.join(cells, Seq("vec_id"))
    val brute = Similarity.bruteForceTopK(clustered, "vec_id", "embedding",
      probes, "vec_id", "embedding", 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf1 = Similarity.ivfTopK(withCell, "vec_id", "embedding", "cell",
      probes, "vec_id", "embedding", 5, 1)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(ivf1 === brute, "nprobe=1 on trained cells missed true neighbors")
  }

  test("IVF spill: widens recall over single assignment, no duplicate hits") {
    val probes = emb.filter($"vec_id" < 5)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      probes, "vec_id", "embedding", 3)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    def recallAt(spill: Int): Double = {
      val got = Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
        probes, "vec_id", "embedding", 3, 2, spill = spill)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      got.intersect(brute).size.toDouble / brute.size
    }
    assert(recallAt(2) >= recallAt(1),
      "spill=2 must not lose candidates vs single assignment")
    // output shape survives the redundant index: ≤k rows and unique
    // (q_id, vec_id) pairs per probe
    val out = Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
      probes, "vec_id", "embedding", 3, 2, spill = 2)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.map(r => (r._1, r._2)).distinct.length === out.length)
    assert(out.groupBy(_._1).values.forall(_.length <= 3))
  }

  test("on-disk IVF spill: rows duplicated across cells, probe dedups") {
    val dir = graft.TempDirs.create("graft-ivf-spill")
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", dir,
      nCells = 4, iters = 2, spill = 2)
    // every vector is indexed in exactly `spill` cell partitions
    val indexed = spark.read.parquet(dir)
    assert(indexed.count() === 200)
    assert(indexed.groupBy("vec_id").count()
      .filter($"count" =!= 2).count() === 0)
    val probes = emb.filter($"vec_id" < 3)
    val out = Similarity.probeIvfIndex(spark, dir, probes,
      "vec_id", "embedding", 3, nprobe = 2)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.map(r => (r._1, r._2)).distinct.length === out.length,
      "spilled index must not surface a candidate twice")
    assert(out.groupBy(_._1).values.forall(_.length <= 3))
  }

  test("trainCells on an empty corpus returns an empty assignment") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.trainCells(empty, "vec_id", "embedding", 4).count() === 0)
  }

  test("on-disk IVF index: cell-partitioned layout, pruned probe scan") {
    val crnd = new scala.util.Random(13)
    val centers = Seq(
      Array.fill(16)(0.0).updated(0, 10.0),
      Array.fill(16)(0.0).updated(5, 10.0),
      Array.fill(16)(0.0).updated(11, -10.0))
    val clustered = (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(v => (v + crnd.nextGaussian() * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
    val dir = graft.TempDirs.create("graft-ivf-index")
    Similarity.writeIvfIndex(clustered, "vec_id", "embedding", dir, nCells = 3)
    // physical layout: one directory per cell + the centroid sidecar
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(subdirs.count(_.startsWith("cell=")) === 3, s"layout: $subdirs")
    assert(subdirs.contains("_centroids"))
    // probing one cell prunes the scan to that partition BEFORE any I/O
    val probes = clustered.filter($"vec_id" < 3)
    val out = Similarity.probeIvfIndex(spark, dir, probes,
      "vec_id", "embedding", 5, nprobe = 1)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition pruning:\n$plan")
    // well-separated clusters + nprobe=1: the pruned scan still achieves
    // full recall vs brute force (true neighbors share the probe's cell)
    val brute = Similarity.bruteForceTopK(clustered, "vec_id", "embedding",
      probes, "vec_id", "embedding", 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val got = out.select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(got === brute, "pruned index probe missed true neighbors")
  }

  test("IVF append: saved-model placement, no history rewrite, compact parity") {
    val dir = graft.TempDirs.create("graft-ivf-append")
    val base = emb.filter($"vec_id" % 4 =!= 0)
    Similarity.writeIvfIndex(base, "vec_id", "embedding", dir,
      nCells = 4, iters = 2, spill = 2)
    val cellDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cell=")).toSet
    val baseFiles = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(d => d.listFiles().map(f => d.getName + "/" + f.getName))
      .toSet
    Similarity.appendIvfIndex(emb.filter($"vec_id" % 8 === 0),
      "vec_id", "embedding", dir, spill = 2)
    Similarity.appendIvfIndex(emb.filter($"vec_id" % 8 === 4),
      "vec_id", "embedding", dir, spill = 2)
    // appends only ADD files inside existing cell partitions
    val afterDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cell=")).toSet
    assert(afterDirs === cellDirs, "append must not invent new cells")
    val afterFiles = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(d => d.listFiles().map(f => d.getName + "/" + f.getName))
      .toSet
    assert(baseFiles.subsetOf(afterFiles), "append rewrote history files")
    // every vector (old and appended) indexed in exactly `spill` cells
    val indexed = spark.read.parquet(dir)
    assert(indexed.select("vec_id").distinct().count() === 100)
    assert(indexed.groupBy("vec_id").count()
      .filter($"count" =!= 2).count() === 0)
    // compaction to a fresh dir preserves the (vec_id, cell) multiset and
    // the centroid sidecar; a probe sees identical candidates
    val out = graft.TempDirs.create("graft-ivf-compacted")
    Similarity.compactIvfIndex(spark, dir, out)
    val a = spark.read.parquet(dir).select("vec_id", "cell")
      .as[(Long, Int)].collect().sorted
    val b = spark.read.parquet(out).select("vec_id", "cell")
      .as[(Long, Int)].collect().sorted
    assert(a.toSeq === b.toSeq, "compaction changed index contents")
    val probes = emb.filter($"vec_id" < 3)
    val pa = Similarity.probeIvfIndex(spark, dir, probes,
      "vec_id", "embedding", 5, nprobe = 2)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val pb = Similarity.probeIvfIndex(spark, out, probes,
      "vec_id", "embedding", 5, nprobe = 2)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(pa === pb, "compacted probe differs from appended probe")
    // retraining compaction: the spill-duplicated rows must collapse back
    // to the unique corpus before the refit — each vector again lands in
    // exactly `spill` DISTINCT cells, not spill² copies of its top cell
    val retrained = graft.TempDirs.create("graft-ivf-retrained")
    Similarity.compactIvfIndex(spark, dir, retrained, retrain = 2, spill = 2)
    val rt = spark.read.parquet(retrained)
    assert(rt.select("vec_id").distinct().count() === 100)
    assert(rt.groupBy("vec_id").count().filter($"count" =!= 2).count() === 0,
      "retrained index must hold each vector exactly spill times")
    assert(rt.select("vec_id", "cell").distinct().count() === 200,
      "spill placements must be distinct cells, not duplicates of the top cell")
  }

  test("LSH near-dup pairs: subset of exact pairs with identical cosines") {
    val exact = graft.operators.Dedup
      .embeddingNearDup(emb, "vec_id", "embedding", 0.5)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val lsh = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.5,
      dims = 16, nBits = 16, nBands = 8)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // precision 1.0: every LSH pair is a true pair with the same cosine
    assert(lsh.keySet.subsetOf(exact.keySet))
    lsh.foreach { case (k, c) => assert(c === exact(k), s"cosine differs at $k") }
    // decent recall at these band settings on gaussian vectors
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.5, s"LSH near-dup recall too low: $recall")
    }
  }

  test("sign-LSH ANN: exact-verified candidates, decent recall, top-k shape") {
    val probes = emb.filter($"vec_id" < 5)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      probes, "vec_id", "embedding", 3)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding",
      probes, "vec_id", "embedding", 3, dims = 16, nBits = 16, nBands = 8)
    val rows = lsh.as[(Long, Long, Double, Long)].collect()
    assert(rows.forall(r => r._1 != r._2))
    assert(rows.groupBy(_._1).values.forall(_.length <= 3))
    val recall = rows.map(r => (r._1, r._2)).toSet.intersect(brute).size.toDouble /
      brute.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
    // determinism: same seed, same result
    val again = Similarity.lshTopK(emb, "vec_id", "embedding",
      probes, "vec_id", "embedding", 3, dims = 16, nBits = 16, nBands = 8)
      .as[(Long, Long, Double, Long)].collect()
    assert(again.sortBy(r => (r._1, r._4)).toSeq ===
      rows.sortBy(r => (r._1, r._4)).toSeq)
  }
}

/** Round-13 near-dup scale-path operators: the cell-partitioned pair
  * relation q88 registers, the anchored exact arm q97's certificate uses,
  * and the corpus-sized LSH auto-banding (with its moderate-threshold
  * refusal). */
class CellNearDupSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated clusters with planted near-copies (ids 100..)
  private def jitter(v: Array[Double], eps: Double, seed: Int): Array[Double] =
    v.zipWithIndex.map { case (x, i) =>
      x + eps * math.sin(seed * 12.9898 + i * 78.233)
    }
  private def base(cluster: Int): Array[Double] = {
    val v = Array.fill(8)(0.05); v(cluster) = 1.0; v
  }
  private val originals = (0 until 40).map { i =>
    (i.toLong, jitter(base(i % 2), 0.15, i).map(_.toFloat).toSeq)
  }
  private val dups = (0 until 10).map { i =>
    (100L + i, jitter(base(i % 2), 0.15, i).map(x => (x * 1.0001).toFloat).toSeq)
  }
  private val emb = (originals ++ dups).toDF("vec_id", "embedding")

  test("cellNearDupPairs: exact-verified subset, planted pairs recalled") {
    val exact = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.999)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val cells = Dedup.cellNearDupPairsAuto(emb, "vec_id", "embedding", 0.999)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // precision 1.0 with identical cosines
    assert(cells.keySet.subsetOf(exact.keySet))
    cells.foreach { case (k, c) => assert(c === exact(k), s"cosine differs at $k") }
    // every planted (original, copy) pair lands in one shared cell
    (0 until 10).foreach { i =>
      assert(cells.contains((i.toLong, 100L + i)), s"planted pair $i missed")
    }
    // deterministic: same corpus, same pairs
    val again = Dedup.cellNearDupPairsAuto(emb, "vec_id", "embedding", 0.999)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(again === cells)
  }

  test("anchored exact arm: full corpus when n <= cap, anchor-filtered otherwise") {
    val full = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    val anchoredAll = Dedup.embeddingNearDupAnchored(emb, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(anchoredAll === full, "cap >= n must reproduce the all-pairs set")
    // small cap: exactly the exact pairs touching the hash-anchor subset
    val n = emb.count()
    val sub = Dedup.embeddingNearDupAnchored(emb, "vec_id", "embedding", 0.9, cap = 8)
      .as[(Long, Long, Double)].collect().toSet
    val expected = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.9)
      .filter(Dedup.anchorTouches(n, col("id_a"), col("id_b"), cap = 8))
      .as[(Long, Long, Double)].collect().toSet
    assert(sub === expected)
    assert(sub.nonEmpty && sub.size < full.size,
      s"cap=8 should strictly subset (${sub.size} of ${full.size})")
  }

  test("lshNearDupPairsAuto: corpus-sized bands recall planted high-cos pairs") {
    val exact = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.999)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    val auto = Similarity.lshNearDupPairsAuto(emb, "vec_id", "embedding",
      0.999, dims = 8)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(auto.subsetOf(exact))
    // p1 at cos 0.999 is ~0.99: the sizing rule keeps recall ~1 here
    val recall = auto.size.toDouble / exact.size
    assert(recall >= 0.9, s"auto-banded recall too low: $recall")
  }

  test("lshNearDupPairsAuto refuses the moderate-threshold regime") {
    // cos 0.45 with 6-bit bands needs ~90 bands for recall 0.999 — over
    // the cap; the rule must throw and point at the cell path, not ship a
    // degenerate config
    val e = intercept[IllegalArgumentException] {
      Similarity.lshNearDupPairsAuto(emb, "vec_id", "embedding", 0.45,
        dims = 8, targetBucket = 1, recallTarget = 0.999)
    }
    assert(e.getMessage.contains("cellNearDupPairsAuto"))
  }
}
