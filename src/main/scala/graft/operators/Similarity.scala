package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.10). Brute-force cosine top-k is the exact baseline; the
  * IVF (inverted-file) variant prunes to the `nprobe` closest coarse cells
  * and is the 100 TB scale path: the corpus is partitioned by cell id, a
  * probe only touches nprobe partitions, and the candidate set shrinks by
  * ~|cells|/nprobe.
  */
object Similarity {

  /** Exact top-k by cosine for each probe vector (self-match excluded).
    * Probes are broadcast; ranking is a per-probe window with deterministic
    * (cosine desc, id) ordering. */
  def bruteForceTopK(corpus: DataFrame, id: String, vec: String,
      probes: DataFrame, probeId: String, probeVec: String, k: Int): DataFrame = {
    // the streamed corpus side of the broadcast join carries the n·|probes|
    // dot products — widen it past the unsplittable scan (guide §2.5)
    val c = Scale.fanOut(corpus.select(col(id).as("vec_id"),
      normalized(toDouble(col(vec))).as("e")), "vec_id")
    val p = probes.select(col(probeId).as("q_id"),
      normalized(toDouble(col(probeVec))).as("qe"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_raw").desc, col("vec_id").asc)
    c.join(broadcast(p), col("q_id") =!= col("vec_id"))
      .withColumn("cos_raw", dot(col("qe"), col("e")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), round(col("cos_raw"), 6).as("cosine"),
        col("rank"))
  }

  /** IVF coarse cells from a partition column (e.g. a cluster label):
    * centroid = elementwise mean per cell. */
  def centroids(corpus: DataFrame, cell: String, vec: String): DataFrame =
    corpus.select(col(cell).as("cell"), posexplode(toDouble(col(vec))))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("col")).as("v"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
        s => s.getField("v")).as("centroid"))

  /** IVF top-k: rank cells by probe↔centroid cosine, search only the top
    * `nprobe` cells, then exact top-k within the candidate set. Approximate:
    * a true neighbor outside the probed cells is missed — recall is tested
    * against bruteForceTopK and certified driver-visibly (q95/q106).
    *
    * `spill` > 1 turns on redundant assignment: each corpus vector is
    * indexed under its `spill` closest cells by centroid cosine (one
    * broadcast scan — the cell column only seeds the centroids), the
    * standard recall fix for boundary points that sit near a cell edge.
    * Index size grows ×spill; probe cost is unchanged (`nprobe` cells). */
  def ivfTopK(corpus: DataFrame, id: String, vec: String, cell: String,
      probes: DataFrame, probeId: String, probeVec: String,
      k: Int, nprobe: Int, spill: Int = 1): DataFrame = {
    val cents = centroids(corpus, cell, vec)
    val p = probes.select(col(probeId).as("q_id"), toDouble(col(probeVec)).as("qe"))
    val wCell = Window.partitionBy(col("q_id"))
      .orderBy(col("cell_cos").desc, col("cell").asc)
    val probeCells = p.crossJoin(broadcast(cents))
      .withColumn("cell_cos", cosine(col("qe"), col("centroid")))
      .withColumn("cell_rank", row_number().over(wCell))
      .filter(col("cell_rank") <= nprobe)
      .select(col("q_id"), col("qe"), col("cell"))
    val base = corpus.select(col(id).as("vec_id"), col(cell).as("cell"),
      normalized(toDouble(col(vec))).as("e"))
    val c = if (spill <= 1) base else spillAssign(base, cents, spill)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_raw").desc, col("vec_id").asc)
    val joined = c.join(broadcast(probeCells), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("qe"), col("vec_id"), col("e"))
    // only a spilled vector can be met through several probed cells;
    // without spill the dedup would be a pure extra exchange. The cosine
    // is pair-deterministic, so one candidate row survives.
    val cands =
      if (spill > 1) joined.dropDuplicates("q_id", "vec_id") else joined
    cands
      .withColumn("cos_raw", dot(col("qe"), col("e")) / norm(col("qe")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), round(col("cos_raw"), 6).as("cosine"),
        col("rank"))
  }

  /** Redundant (spill) assignment: re-index each vector of `base`
    * (vec_id, cell, e) under its top-`spill` cells by centroid cosine —
    * one broadcast scan, index size ×spill, the standard recall fix for
    * vectors sitting near a cell boundary. When the centroids derive from
    * the same assignment, a vector's own cell is its top-1, so spilling
    * strictly widens coverage. */
  private[operators] def spillAssign(base: DataFrame, cents: DataFrame,
      spill: Int): DataFrame = {
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("a_cos").desc, col("a_cell").asc)
    base.drop("cell").crossJoin(broadcast(cents
        .select(col("cell").as("a_cell"), col("centroid"))))
      .withColumn("a_cos", cosine(col("e"), col("centroid")))
      .withColumn("a_rank", row_number().over(wAssign))
      .filter(col("a_rank") <= spill)
      .select(col("vec_id"), col("a_cell").as("cell"), col("e"))
  }

  /** Train an IVF coarse quantizer: `iters` Lloyd rounds over a bounded
    * deterministic hash-sampled pool (driver-side, FAISS-practice — see
    * the in-body note), then ONE distributed broadcast argmax scan
    * (max_by aggregate — no window sort) assigns the full corpus under
    * the trained model. Returns (vec_id, cell) assignments whose cells
    * track the VECTOR GEOMETRY — the right cells when no meaningful
    * pre-clustering column exists. The centroid table (nCells × dims) is
    * a bounded model object, collected like the EPSF grid. Linear in
    * corpus size, no pairwise shuffle, no per-round cluster jobs. */
  def trainCells(corpus: DataFrame, id: String, vec: String, nCells: Int,
      iters: Int = 2): DataFrame =
    trainCellsWithCentroids(corpus, id, vec, nCells, iters)._1

  /** As [[trainCells]], additionally returning the trained centroids —
    * the coarse-quantizer MODEL. The assignment is one argmax scan under
    * exactly these centroids (not a re-derived per-cell mean, which would
    * be an extra half-Lloyd-step the probe-side ranking never saw). */
  def trainCellsWithCentroids(corpus: DataFrame, id: String, vec: String,
      nCells: Int, iters: Int = 2): (DataFrame, Seq[(Int, Seq[Double])]) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // fan out the unsplittable scan BEFORE the checkpoint: the pinned
    // blocks feed the pool collect and every per-iteration assign scan
    // (a broadcast argmax over the full corpus) — one partition would
    // serialize them all (guide §2.5; no-op at scale)
    val c = Scale.fanOut(corpus.select(col(id).as("vid"),
      normalized(toDouble(col(vec))).as("e")), "vid").localCheckpoint()
    // deterministic SPREAD seeding: hash-sample a bounded candidate pool
    // (one scan), then greedy farthest-point on the pool driver-side —
    // two seeds landing in one tight cluster is the classic way Lloyd
    // strands an empty cell, and hash order alone can do exactly that.
    // Pool coverage: clusters holding < 1/(64·nCells) of the corpus can
    // be missed; acceptable for a coarse quantizer.
    val pool: Array[Seq[Double]] = c
      .withColumn("hk", pmod(col("vid") * lit(2654435761L), lit(1000000007L)))
      .orderBy(col("hk"), col("vid")).limit(64 * nCells)
      .select(col("e")).as[Seq[Double]].collect()
    // empty corpus: empty assignment, not a seed-selection crash
    if (pool.isEmpty)
      return (c.select(col("vid").as("vec_id"),
        lit(0).cast("int").as("cell")).limit(0), Seq.empty)
    def d2(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // incremental farthest-point: dmin(i) = min distance to any current
    // seed, argmax with first-index tie-break — element-for-element the
    // naive maxBy(min-over-seeds) rescan, at O(nCells·pool) not O(nCells²·pool)
    val nSeeds = math.min(nCells, pool.length)
    val seeds = scala.collection.mutable.ArrayBuffer(pool.head)
    val dmin = pool.map(p => d2(p, seeds.head))
    while (seeds.size < nSeeds) {
      var best = 0; var i = 1
      while (i < dmin.length) {
        if (dmin(i) > dmin(best)) best = i
        i += 1
      }
      val s = pool(best)
      seeds += s
      i = 0
      while (i < dmin.length) {
        val d = d2(pool(i), s)
        if (d < dmin(i)) dmin(i) = d
        i += 1
      }
    }
    var cents: Seq[(Int, Seq[Double])] =
      seeds.zipWithIndex.map { case (e, i) => (i, e) }.toSeq
    def assign(): DataFrame = {
      val centDf = broadcast(cents.toDF("cell", "centroid"))
      c.crossJoin(centDf)
        // deterministic tie-break toward the lower cell id
        .withColumn("score",
          cosine(col("e"), col("centroid")) - col("cell") * lit(1e-12))
        .groupBy(col("vid"))
        .agg(max_by(col("cell"), col("score")).as("cell"))
    }
    // Lloyd rounds run DRIVER-SIDE over the same bounded pool (round 7 —
    // the FAISS-practice shape, matching Pq.train): quantizer models are
    // tiny and train on a sample; a 100 TB corpus never pays per-round
    // distributed jobs for them. Assignment scoring mirrors the
    // distributed assign() exactly: cosine, tie toward the lower cell id.
    // The full corpus is touched once more by the final assign() scan.
    def cosineD(a: Seq[Double], b: Seq[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dp / math.sqrt(na * nb)
    }
    val dims = pool.head.length
    var round = 0
    while (round < iters) {
      // parallel order-preserving pure map — bit-identical at any
      // thread count (same pattern as Pq.trainOnPool)
      val assigned = {
        import scala.collection.parallel.CollectionConverters._
        val centsNow = cents
        pool.par.map { v =>
          var best = 0; var bestScore = Double.NegativeInfinity
          centsNow.foreach { case (i, ce) =>
            val s = cosineD(v, ce) - i * 1e-12
            if (s > bestScore) { bestScore = s; best = i }
          }
          best
        }.toArray
      }
      // a cell that lost every member keeps its previous centroid (it can
      // re-acquire points) instead of silently vanishing from the model
      cents = cents.map { case (i, old) =>
        val members = pool.indices.filter(assigned(_) == i)
        if (members.isEmpty) (i, old)
        else {
          val mean = new Array[Double](dims)
          members.foreach { mi =>
            var d = 0
            while (d < dims) { mean(d) += pool(mi)(d); d += 1 }
          }
          (i, mean.map(_ / members.size).toSeq)
        }
      }
      round += 1
    }
    (assign().select(col("vid").as("vec_id"), col("cell")), cents)
  }

  /** Persist the corpus as an on-disk IVF index: parquet PARTITIONED BY
    * the trained cell id, with the centroid model in a `_centroids`
    * sidecar (underscore-prefixed: invisible to readers of the data
    * tree). This is the I/O half of the IVF scale story: a probe's scan
    * lists only its nprobe cell directories — partition pruning happens
    * before any file is opened, so probe cost is |corpus|·nprobe/nCells
    * of I/O, not a full scan. */
  def writeIvfIndex(corpus: DataFrame, id: String, vec: String, dir: String,
      nCells: Int, iters: Int = 2, spill: Int = 1): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // placement derives from the centroid MODEL alone: top-1 cell is the
    // assignment, top-`spill` is redundant placement (a vector's row in
    // its spill closest cell partitions — ×spill index size for
    // boundary-point recall; listing-time pruning unchanged), so the
    // training assignment pass is never re-run here
    val cents = trainCellsWithCentroids(corpus, id, vec, nCells, iters)._2
    val raw = corpus.select(col(id).as("vec_id"),
      toDouble(col(vec)).as("embedding"))
    val base = raw.select(col("vec_id"), lit(0).as("cell"),
      normalized(col("embedding")).as("e"))
    raw.join(
        spillAssign(base, cents.toDF("cell", "centroid"), math.max(1, spill))
          .select(col("vec_id"), col("cell")),
        Seq("vec_id"))
      // co-locate each cell before the partitioned write: one writer task
      // per cell directory instead of every task spraying every cell
      .repartition(nCells, col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    cents.toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$dir/_centroids")
  }

  /** Append new vectors to an existing on-disk IVF index WITHOUT
    * retraining: each vector is placed by the SAVED centroid model (same
    * top-`spill` placement as [[writeIvfIndex]]) and its rows land as new
    * files inside the matching `cell=` partition directories — the
    * KeyedParquetSink shape: an append touches only the cells it writes,
    * never rewrites history, and listing-time pruning keeps working
    * because the partition column is unchanged. A 100 TB embedding corpus
    * grows by micro-batch this way; the centroid model only drifts, so
    * recall after appends must be re-certified (q127) and a periodic
    * [[compactIvfIndex]] folds the accumulated small files (optionally
    * retraining) back into one tight index. */
  def appendIvfIndex(newVecs: DataFrame, id: String, vec: String,
      dir: String, spill: Int = 1): Unit = {
    val spark = newVecs.sparkSession
    import spark.implicits._
    val cents = spark.read.parquet(s"$dir/_centroids")
      .select(col("cell"), col("centroid"))
      .as[(Int, Seq[Double])].collect().toSeq
    val raw = newVecs.select(col(id).as("vec_id"),
      toDouble(col(vec)).as("embedding"))
    val base = raw.select(col("vec_id"), lit(0).as("cell"),
      normalized(col("embedding")).as("e"))
    raw.join(
        spillAssign(base, cents.toDF("cell", "centroid"), math.max(1, spill))
          .select(col("vec_id"), col("cell")),
        Seq("vec_id"))
      .repartition(cents.length, col("cell"))
      .write.mode("append").partitionBy("cell").parquet(dir)
  }

  /** Compact an appended IVF index into `outDir`: coalesce each cell's
    * accumulated per-batch files into one writer task per cell and copy
    * the centroid sidecar unchanged. Writing to a NEW directory is
    * deliberate — an in-place rewrite would race readers, and on a real
    * deployment the dir swap is the catalog's atomic pointer flip, not a
    * filesystem trick. Pass `retrain > 0` to also refit the quantizer
    * (retrain Lloyd iterations) on the compacted corpus, folding
    * append-drift back out of the model. */
  def compactIvfIndex(spark: SparkSession, dir: String, outDir: String,
      retrain: Int = 0, spill: Int = 1): Unit = {
    val data = spark.read.parquet(dir)
    if (retrain > 0) {
      // a spill>1 index stores each vector in `spill` cells; refitting on
      // the raw rows would tie-break every duplicate onto the same top
      // cell (losing spill placement) and multiply the output spill-fold —
      // dedup back to the unique corpus first
      writeIvfIndex(
        data.select(col("vec_id"), col("embedding")).dropDuplicates("vec_id"),
        "vec_id", "embedding",
        outDir, nCells = spark.read.parquet(s"$dir/_centroids").count().toInt,
        iters = retrain, spill = spill)
    } else {
      val nCells = spark.read.parquet(s"$dir/_centroids").count().toInt
      data.repartition(nCells, col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(outDir)
      copySidecarDir(spark, s"$dir/_centroids", s"$outDir/_centroids")
    }
  }

  /** File-level copy of a model sidecar directory (`_centroids`,
    * `_codebooks`, `_rotation`): byte-identical to the former Spark
    * read→coalesce(1)→write round trip, but ZERO jobs — sidecars are
    * bounded model artifacts whose re-encoding through a plan bought
    * nothing and cost two jobs per sidecar per compaction (guide §1.2:
    * remove work before tuning it). */
  private[operators] def copySidecarDir(spark: SparkSession, src: String,
      dst: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcP = new org.apache.hadoop.fs.Path(src)
    val dstP = new org.apache.hadoop.fs.Path(dst)
    val fs = srcP.getFileSystem(conf)
    fs.delete(dstP, true)
    require(org.apache.hadoop.fs.FileUtil.copy(fs, srcP, fs, dstP,
      false, true, conf), s"sidecar copy failed: $src -> $dst")
  }

  /** Probe the on-disk IVF index: rank cells by probe↔centroid cosine,
    * then scan ONLY the top `nprobe` cell partitions (the filter is on
    * the partition column, so pruning is a listing-time decision) and
    * exact-rank within the candidates. */
  def probeIvfIndex(spark: SparkSession, dir: String, probes: DataFrame,
      probeId: String, probeVec: String, k: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = broadcast(spark.read.parquet(s"$dir/_centroids"))
    val p = probes.select(col(probeId).as("q_id"),
      toDouble(col(probeVec)).as("qe"))
    val wCell = Window.partitionBy(col("q_id"))
      .orderBy(col("cell_cos").desc, col("cell").asc)
    val probeCells = p.crossJoin(cents)
      .withColumn("cell_cos", cosine(col("qe"), col("centroid")))
      .withColumn("cell_rank", row_number().over(wCell))
      .filter(col("cell_rank") <= nprobe)
      .select(col("q_id"), col("qe"), col("cell"))
    // the probed cell set is bounded (≤ probes × nprobe): collect it so
    // the scan filter is a LITERAL IN over the partition column
    val wanted = probeCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val c = spark.read.parquet(dir)
      .filter(col("cell").isin(wanted.map(_.asInstanceOf[Any]): _*))
      .select(col("vec_id"), col("cell"), normalized(col("embedding")).as("e"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_raw").desc, col("vec_id").asc)
    c.join(broadcast(probeCells), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      // a spill-indexed vector lives in several probed partitions; the
      // cosine is pair-deterministic so one candidate row survives
      .select(col("q_id"), col("qe"), col("vec_id"), col("e"))
      .dropDuplicates("q_id", "vec_id")
      .withColumn("cos_raw", dot(col("qe"), col("e")) / norm(col("qe")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), round(col("cos_raw"), 6).as("cosine"),
        col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH: `nBits` planes
    * of `dims` weights in [-0.5, 0.5), seeded — a tiny model object
    * embedded as literals (broadcast by the plan). */
  private def hyperplanes(nBits: Int, dims: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dims)(rnd.nextDouble() - 0.5))
  }

  /** Sign-random-projection LSH ANN: signature bit i = sign(v·h_i); the
    * signature splits into `nBands` band keys and a candidate is any corpus
    * vector sharing ≥1 band with the probe. Candidates are exact-verified
    * by cosine and ranked top-k — precision never degrades, only recall.
    *
    * The 100 TB shape: corpus signatures are computed in one scan (nBits
    * codegen'd dot products against literal planes — no shuffle), the
    * corpus is bucketed by band key, and each probe touches only its
    * nBands buckets instead of the full corpus. */
  def lshTopK(corpus: DataFrame, id: String, vec: String,
      probes: DataFrame, probeId: String, probeVec: String,
      k: Int, dims: Int, nBits: Int = 48, nBands: Int = 12,
      seed: Long = 42L): DataFrame = {
    require(nBits % nBands == 0, "nBits must split evenly into bands")
    val planes = hyperplanes(nBits, dims, seed)
    val bitsPerBand = nBits / nBands
    def bandKeys(v: Column): Column = {
      val bits = planes.map(h => when(dot(v, lit(h)) > 0, 1L).otherwise(0L))
      val bands = (0 until nBands).map { b =>
        val key = (0 until bitsPerBand)
          .map(i => bits(b * bitsPerBand + i) * lit(1L << i))
          .reduce(_ + _)
        struct(lit(b).as("band"), key.as("key"))
      }
      array(bands: _*)
    }
    val c = corpus.select(col(id).as("vec_id"),
        normalized(toDouble(col(vec))).as("e"))
      .withColumn("bk", explode(bandKeys(col("e"))))
    val p = probes.select(col(probeId).as("q_id"),
        normalized(toDouble(col(probeVec))).as("qe"))
      .withColumn("bk", explode(bandKeys(col("qe"))))
    // cosine computed at the band join (deterministic per pair) so the
    // candidate dedup shuffles 3 scalars, not two 64-dim vectors
    val cands = c.join(broadcast(p), Seq("bk"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        dot(col("qe"), col("e")).as("cos_raw"))
      .dropDuplicates("q_id", "vec_id")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_raw").desc, col("vec_id").asc)
    cands
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), round(col("cos_raw"), 6).as("cosine"),
        col("rank"))
  }

  /** Embedding near-dup pairs via sign-LSH band buckets: the band
    * self-join generates candidates (linear shuffle, never the n² cross
    * product), then exact cosine verifies, so precision never degrades —
    * only recall trades against nBits/nBands.
    *
    * THIS IS A HIGH-THRESHOLD-REGIME TOOL, and the bands must be SIZED
    * TO THE CORPUS — prefer [[lshNearDupPairsAuto]], which does both
    * checks for you. A band has 2^(nBits/nBands) buckets, a count that
    * does not grow with the data: once the corpus outgrows it, per-bucket
    * self-joins degenerate toward all-pairs (the round-12 registered q88
    * config — 4 bits × 16 bands at cos 0.45 — measured growth slope 3.0
    * on the sf1→sf10 decade, which is why q88 is now registered on
    * [[graft.operators.Dedup.cellNearDupPairsAuto]]). And at MODERATE
    * thresholds no banding works: per-bit agreement p₁ = 1−θ/π is ~0.65
    * at cos 0.45, so bands long enough to reject random pairs need
    * exponentially many copies to hold recall (ρ = ln p₁ / ln ½ ≈ 0.62 →
    * candidates ~n^1.6 at best). Banding is right where p₁ is high —
    * cos ≥ ~0.8, the regime of q62's J ≥ 0.9 MinHash bands. The
    * all-pairs exact form lives in Dedup.embeddingNearDup. */
  def lshNearDupPairs(corpus: DataFrame, id: String, vec: String,
      threshold: Double, dims: Int, nBits: Int = 64, nBands: Int = 16,
      seed: Long = 42L): DataFrame = {
    require(nBits % nBands == 0, "nBits must split evenly into bands")
    val planes = hyperplanes(nBits, dims, seed)
    val bitsPerBand = nBits / nBands
    val bits = planes.map(h => when(dot(col("e"), lit(h)) > 0, 1L).otherwise(0L))
    val bands = (0 until nBands).map { b =>
      val key = (0 until bitsPerBand)
        .map(i => bits(b * bitsPerBand + i) * lit(1L << i))
        .reduce(_ + _)
      struct(lit(b).as("band"), key.as("key"))
    }
    val sigs = corpus
      .select(col(id).as("vid"), normalized(toDouble(col(vec))).as("e"))
      .withColumn("bk", explode(array(bands: _*)))
    // the cosine is deterministic per pair, so it's computed AT the band
    // join (where both vectors already sit) and the threshold filter runs
    // BEFORE the pair dedup: the dedup exchange then shuffles only
    // (id_a, id_b, cosine) scalars for surviving near-dups — never the
    // vector payloads, and never the sub-threshold candidate majority.
    // Duplicate candidates (pairs sharing >1 band) carry bit-identical
    // cosines, so dropDuplicates keeps an arbitrary but identical row.
    sigs.as("a").join(sigs.as("b"),
        col("a.bk") === col("b.bk") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        dot(col("a.e"), col("b.e")).as("cosine_raw"))
      .filter(col("cosine_raw") >= threshold)
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("cosine_raw"), 6).as("cosine"))
  }

  /** [[lshNearDupPairs]] with the banding SIZED TO THE CORPUS AND THE
    * THRESHOLD — the registration-safe form:
    *
    *  - bits/band b = max(4, ⌈log₂(n / targetBucket)⌉), so the expected
    *    per-band bucket population stays ≤ targetBucket as the corpus
    *    grows (the fixed-bucket degeneration the round-12 sweep caught
    *    cannot happen);
    *  - bands L = ⌈ln(1−recallTarget) / ln(1−p₁ᵇ)⌉ with p₁ = 1−θ/π, the
    *    smallest band count whose amplified collision probability still
    *    meets `recallTarget` AT the threshold (higher above it).
    *
    * The two rules interact: growing b (forced by corpus growth) shrinks
    * p₁ᵇ, which inflates L — geometrically in b when p₁ is small. The
    * method REFUSES (IllegalArgumentException) when L would exceed
    * `maxBands`: that is the ρ-limit telling you banding cannot hold
    * both recall and subquadratic candidates at this (threshold, n) —
    * use [[graft.operators.Dedup.cellNearDupPairsAuto]] (the moderate-
    * threshold scale path q88 registers) instead of silently shipping a
    * config that degenerates. At cos 0.85 (p₁ ≈ 0.82) the rule yields
    * e.g. b=7/L=12 at 100 k vectors — comfortably inside the cap. */
  def lshNearDupPairsAuto(corpus: DataFrame, id: String, vec: String,
      threshold: Double, dims: Int, targetBucket: Int = 256,
      recallTarget: Double = 0.95, maxBands: Int = 64,
      seed: Long = 42L): DataFrame = {
    require(threshold > 0 && threshold < 1, "cosine threshold in (0,1)")
    val n = corpus.count()
    val p1 = 1.0 - math.acos(threshold) / math.Pi
    val b = math.max(4, math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2)).toInt)
    val pBand = math.pow(p1, b)
    val l = math.ceil(math.log1p(-recallTarget) / math.log1p(-pBand)).toInt
    require(l >= 1 && l <= maxBands,
      s"sign-LSH cannot hold recall $recallTarget at cos >= $threshold for " +
        s"n=$n without $l bands (> $maxBands): per-bit agreement p1=" +
        f"$p1%.3f is too weak for banding — use Dedup.cellNearDupPairsAuto " +
        "(the moderate-threshold cell-partitioned scale path) instead")
    lshNearDupPairs(corpus, id, vec, threshold, dims,
      nBits = b * l, nBands = l, seed = seed)
  }
}
