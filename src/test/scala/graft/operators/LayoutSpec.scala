package graft.operators

import graft.{SparkSpec, TempDirs}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Layout operators: Z-order keys (bit-exact + the file-pruning effect
  * they exist for), the range-partitioned prefix sum vs the naive global
  * window, compaction binning vs an independent driver-side greedy scan,
  * and SemDeDup (planted duplicates recovered; drop set ⊆ exact). */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var b = 0
    while (b < bits) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }

  test("zorderKey matches a bit-twiddling reference on exhaustive 6-bit grid") {
    val rows = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorderKey(col("x"), col("y"), 6).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === mortonRef(x, y, 6), s"($x,$y)") }
    // the interleave is a bijection on the grid
    assert(got.map(_._3).distinct.length === 64 * 64)
  }

  test("zorderKeySql generates the same values through Spark's SQL parser") {
    val rows = (0L until 256L).map(i => (i * 37 % 256, i * 101 % 256))
    rows.toDF("x", "y").createOrReplaceTempView("zin")
    val viaSql = spark.sql(
      s"SELECT x, y, ${Layout.zorderKeySql("x", "y", 8)} AS z FROM zin")
      .as[(Long, Long, Long)].collect()
    viaSql.foreach { case (x, y, z) => assert(z === mortonRef(x, y, 8)) }
  }

  test("z-ordered layout prunes a 2-D box to few files; 1-D sort cannot") {
    // 2-D uniform grid, written 16 ways; per-file min/max of both dims
    // stand in for parquet footer stats at fixture scale
    val n = 1 << 14
    val df = (0 until n).map { i =>
      (((i * 2654435761L) >>> 3) % 256, ((i * 40503L) >>> 2) % 256)
    }.toDF("x", "y")

    def overlappingBuckets(written: org.apache.spark.sql.DataFrame): Long = {
      // box predicate [64,96)²: a bucket (file group) can be skipped iff
      // its min/max envelope misses the box on either dimension
      written.groupBy(col("b"))
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .filter(col("x1") >= 64 && col("x0") < 96 &&
          col("y1") >= 64 && col("y0") < 96)
        .count()
    }

    // 16 explicit layout buckets per scheme (repartitionByRange would
    // express the same layout, but its range-bound sampling is seeded by
    // RDD ids, making file boundaries suite-order-sensitive): z buckets
    // are the Morton key's top 4 bits = 64×64 tiles; x buckets are
    // 16-wide stripes covering all of y
    val zdir = TempDirs.create("graft_layout_z")
    df.withColumn("b",
        shiftright(Layout.zorderKey(col("x"), col("y"), 8), 12))
      .write.partitionBy("b").mode("overwrite").parquet(zdir)
    val xdir = TempDirs.create("graft_layout_x")
    df.withColumn("b", shiftright(col("x"), 4))
      .write.partitionBy("b").mode("overwrite").parquet(xdir)

    val zHit = overlappingBuckets(spark.read.parquet(zdir))
    val xHit = overlappingBuckets(spark.read.parquet(xdir))
    // the box is 1/64 of the plane and sits inside ONE 64×64 z-tile
    // ([64,96)² ⊂ [64,128)²), while the x-stripe layout leaves every
    // stripe covering all y, so stripes 4 and 5 both overlap
    assert(zHit === 1, s"z-order box overlap: $zHit buckets of 16")
    assert(xHit === 2, s"x-stripe box overlap: $xHit buckets of 16")
  }

  test("withHilbertKey matches the scalar reference on the exhaustive 6-bit grid") {
    val rows = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val got = Layout.withHilbertKey(rows.toDF("x", "y"), col("x"), col("y"), 6, "h")
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) =>
      assert(h === Layout.hilbertIndex(6, x, y), s"($x,$y)")
    }
    assert(got.map(_._3).distinct.length === 64 * 64)
  }

  test("hilbert consecutive keys are grid neighbours; z-order teleports") {
    val m = (for (x <- 0L until 64L; y <- 0L until 64L)
      yield (Layout.hilbertIndex(6, x, y), x, y)).sortBy(_._1).toVector
    assert(m.map(_._1) === (0L until 4096L).toVector) // bijection onto the grid
    // the defining locality property: the curve NEVER teleports
    m.zip(m.tail).foreach { case ((_, x0, y0), (h, x1, y1)) =>
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) === 1L, s"jump before h=$h")
    }
    // contrast: Morton order jumps at every quadrant seam
    val zm = (for (x <- 0L until 64L; y <- 0L until 64L)
      yield (mortonRef(x, y, 6), x, y)).sortBy(_._1).toVector
    val zJumps = zm.zip(zm.tail).count { case ((_, x0, y0), (_, x1, y1)) =>
      math.abs(x1 - x0) + math.abs(y1 - y0) != 1L
    }
    assert(zJumps > 1000, s"expected many z-order seam jumps, got $zJumps")
  }

  test("hilbert box queries span fewer contiguous key ranges than z-order") {
    // the read-side payoff: a range-pruned scan fetches one contiguous
    // key range per curve segment crossing the box, so fewer segments =
    // fewer file-range seeks for the same 2-D predicate. Quadrant-aligned
    // boxes tie (both curves fill quadrants); UNALIGNED boxes — the
    // common case — are where Z-order's seam teleports fragment the range
    def segments(keys: Iterator[Long]): Int = {
      val ks = keys.toArray.sorted
      1 + ks.indices.tail.count(i => ks(i) != ks(i - 1) + 1)
    }
    def box(x0: Int, x1: Int, y0: Int, y1: Int)(key: (Long, Long) => Long) =
      segments(for (x <- (x0 until x1).iterator; y <- y0 until y1)
        yield key(x.toLong, y.toLong))
    val bits = 8
    for ((x0, x1, y0, y1) <- Seq((60, 100, 60, 100), (10, 50, 100, 200))) {
      val h = box(x0, x1, y0, y1)(Layout.hilbertIndex(bits, _, _))
      val z = box(x0, x1, y0, y1)(mortonRef(_, _, bits))
      assert(h < z, s"box ($x0,$x1)x($y0,$y1): hilbert $h vs z-order $z")
    }
    // aligned quadrant: both are a single range — no false superiority
    val ha = box(64, 128, 64, 128)(Layout.hilbertIndex(bits, _, _))
    val za = box(64, 128, 64, 128)(mortonRef(_, _, bits))
    assert(ha === 1 && za === 1)
  }

  test("prefixSum equals the single-partition global window") {
    val df = (1L to 5000L).map(i => (i, (i * 7919) % 1000)).toDF("k", "v")
    val naive = df.withColumn("cumsum",
        sum("v").over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cumsum").as[(Long, Long)].collect().toMap
    val scaled = Layout.prefixSum(df, "k", "v", numPartitions = 7)
      .select("k", "cumsum").as[(Long, Long)].collect().toMap
    assert(scaled === naive)
    // and the plan actually fans out: >1 range partition carried the data
    val nParts = Layout.prefixSum(df, "k", "v", 7)
      .select(spark_partition_id()).distinct().count()
    assert(nParts > 1, "prefix sum collapsed to one partition")
  }

  test("contiguousIds assigns dense 0..n-1 ids in order, any partitioning") {
    // permuted insert order + a non-monotonic key so range placement works
    val rows = scala.util.Random.shuffle(
      (0L until 3000L).map(i => (i, (i * 2654435761L) % 4294967296L)).toList)
    val df = rows.toDF("id", "k").repartition(11)
    val expect = rows.sortBy { case (id, k) => (k, id) }
      .zipWithIndex.map { case ((id, _), rank) => id -> rank.toLong }.toMap
    for (np <- Seq(1, 7, 32)) {
      val got = Layout.contiguousIds(df, Seq(col("k"), col("id")), np)
        .select("id", "sample_id").as[(Long, Long)].collect().toMap
      assert(got === expect, s"numPartitions=$np")
    }
    // ids are dense: exactly 0..n-1, no gaps or repeats
    val ids = Layout.contiguousIds(df, Seq(col("k"), col("id")), 7)
      .select("sample_id").as[Long].collect().sorted
    assert(ids === (0L until 3000L).toArray)
    // regression (the Verify-dump shape): a downstream coalesce(1) merges
    // every range partition into ONE task — runtime-partition-id-based
    // numbering scrambles here; zipWithIndex's per-partition metadata
    // offsets must not
    val coalesced = Layout.contiguousIds(df, Seq(col("k"), col("id")), 32)
      .coalesce(1).select("id", "sample_id").as[(Long, Long)].collect().toMap
    assert(coalesced === expect)
  }

  test("compactionBins matches an independent greedy driver scan") {
    val target = 1000L
    val sizes = (1L to 400L).map(i => (i, 1L + (i * 613) % 700))
    val got = Layout.compactionBins(sizes.toDF("path", "bytes"),
        "path", "bytes", target, numPartitions = 5)
      .select("path", "bin").as[(Long, Long)].collect().toMap
    var cum = 0L
    sizes.foreach { case (p, b) =>
      val bin = cum / target // exclusive prefix / target
      cum += b
      assert(got(p) === bin, s"file $p")
    }
    // bins are contiguous runs in path order and every bin closes within
    // one file of the target (greedy invariant)
    val byBin = sizes.map { case (p, b) => (got(p), p, b) }.groupBy(_._1)
    byBin.foreach { case (bin, fs) =>
      val paths = fs.map(_._2).sorted
      assert(paths.last - paths.head + 1 === paths.length, s"bin $bin not contiguous")
      if (bin < byBin.keys.max) {
        val bytes = fs.map(_._3).sum
        assert(bytes >= target - 700 && bytes < target + 700, s"bin $bin size $bytes")
      }
    }
  }

  test("semanticDedup drops planted in-cluster duplicates, never a non-dup") {
    // two well-separated clusters; ids 100.. are near-copies of ids 0..
    val dim = 8
    def base(cluster: Int): Array[Double] = {
      val v = Array.fill(dim)(0.05)
      v(cluster) = 1.0
      v
    }
    def jitter(v: Array[Double], eps: Double, seed: Int): Array[Double] =
      v.zipWithIndex.map { case (x, i) =>
        x + eps * math.sin(seed * 12.9898 + i * 78.233)
      }
    val originals = (0 until 40).map { i =>
      (i.toLong, jitter(base(i % 2), 0.15, i).map(_.toFloat).toSeq)
    }
    val dups = (0 until 10).map { i =>
      (100L + i, jitter(base(i % 2), 0.15, i).map(x => (x * 1.0001).toFloat).toSeq)
    }
    val emb = (originals ++ dups).toDF("vec_id", "embedding")

    val dropped = Dedup.semanticDedup(emb, "vec_id", "embedding",
      nCells = 2, tau = 0.999).as[Long].collect().toSet
    // every planted near-copy (higher id of its pair) is dropped
    (0 until 10).foreach(i => assert(dropped.contains(100L + i), s"dup $i kept"))
    // and nothing outside the exact all-pairs drop set ever is
    val exactDrop = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.999)
      .select("id_b").as[Long].collect().toSet
    assert(dropped.subsetOf(exactDrop))
  }
}
