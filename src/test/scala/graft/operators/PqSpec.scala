package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Product quantization planted-truth bars: codebooks train to the
  * planted cluster structure, encoding is deterministic, ADC ranking
  * recovers true neighbors, and reconstruction error behaves like a
  * quantizer (shrinks as the codebook grows; zero for a corpus the
  * codebook can represent exactly). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def planted = {
    // 4 tight clusters of 12 vectors in 8-D: cluster center ±0.01 jitter,
    // deterministic from the ids
    val rows = for (c <- 0 until 4; i <- 0 until 12) yield {
      val id = c * 12 + i
      val base = Array.tabulate(8)(d =>
        if (d % 4 == c % 4) 1.0 else if (d < 4) 0.2 * c else 0.1)
      val v = base.zipWithIndex.map { case (x, d) =>
        x + 0.01 * (((id * 31 + d * 7) % 11) - 5) / 5.0 }
      (id.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("encode emits one code per subspace, deterministically") {
    val model = Pq.train(planted, "vec_id", "embedding", nSub = 2,
      nCodes = 4, iters = 2)
    assert(model.codebooks.length === 2)
    assert(model.codebooks.forall(_.length === 4))
    assert(model.codebooks.forall(_.forall(_.length === 4)))
    val a = Pq.encode(planted, "vec_id", "embedding", model)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    val b = Pq.encode(planted, "vec_id", "embedding", model)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(a.toSeq === b.toSeq)
    assert(a.forall(_._2.length === 2))
  }

  test("ADC top-k recovers planted cluster-mates") {
    val probes = planted.filter(col("vec_id") % 12 === 0) // one per cluster
    val top = Pq.pqTopK(planted, "vec_id", "embedding", probes,
      "vec_id", "embedding", k = 5, nSub = 2, nCodes = 8, iters = 3)
      .collect()
    // every retrieved neighbor of probe c*12 must be from cluster c
    top.foreach { r =>
      val q = r.getLong(0); val v = r.getLong(1)
      assert(v / 12 === q / 12,
        s"probe $q retrieved out-of-cluster $v at rank ${r.getLong(3)}")
    }
    assert(top.groupBy(_.getLong(0)).forall(_._2.length === 5))
  }

  test("IVF-PQ prunes to cells and still recovers cluster-mates") {
    val probes = planted.filter(col("vec_id") % 12 === 0)
    val top = Pq.ivfPqTopK(planted, "vec_id", "embedding", probes,
      "vec_id", "embedding", k = 5, nCells = 4, nprobe = 2, nSub = 2,
      nCodes = 8, iters = 3, residual = true, refine = 4, spill = 2)
      .collect()
    top.foreach { r =>
      assert(r.getLong(1) / 12 === r.getLong(0) / 12,
        s"probe ${r.getLong(0)} retrieved out-of-cluster ${r.getLong(1)}")
    }
    assert(top.groupBy(_.getLong(0)).forall(_._2.length === 5))
  }

  test("on-disk IVF-PQ probe returns exactly the in-memory results") {
    val emb = Tables.embeddings(spark, dir)
    val probes = emb.filter(col("vec_id") < 8)
    val mem = Pq.ivfPqTopK(emb, "vec_id", "embedding", probes,
        "vec_id", "embedding", 5, nCells = 8, nprobe = 3, nSub = 8,
        nCodes = 16, iters = 3, residual = true, refine = 8, spill = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val idxDir = graft.TempDirs.create("graft_ivfpq_idx_test")
    Pq.writeIvfPqIndex(emb, "vec_id", "embedding", idxDir, nCells = 8,
      nSub = 8, nCodes = 16, iters = 3, spill = 2)
    val disk = Pq.probeIvfPqIndex(spark, idxDir, probes, "vec_id",
        "embedding", 5, nprobe = 3,
        refineWith = Some((emb, "vec_id", "embedding")), refine = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(disk === mem,
      s"on-disk probe diverged: only-disk=${disk -- mem} only-mem=${mem -- disk}")
  }

  test("append under frozen model ≡ building the index on the full corpus " +
      "with the same model's placements") {
    val emb = Tables.embeddings(spark, dir)
    val probes = emb.filter(col("vec_id") < 8)
    // index 75%, append 25% in two frozen-model batches, compact
    val idxDir = graft.TempDirs.create("graft_ivfpq_append_test")
    Pq.writeIvfPqIndex(emb.filter(col("vec_id") % 4 =!= 0), "vec_id",
      "embedding", idxDir, nCells = 8, nSub = 8, nCodes = 16, iters = 3,
      spill = 2)
    Pq.appendIvfPqIndex(emb.filter(col("vec_id") % 8 === 0), "vec_id",
      "embedding", idxDir, spill = 2)
    Pq.appendIvfPqIndex(emb.filter(col("vec_id") % 8 === 4), "vec_id",
      "embedding", idxDir, spill = 2)
    val compacted = graft.TempDirs.create("graft_ivfpq_compact_test")
    Pq.compactIvfPqIndex(spark, idxDir, compacted)
    // every corpus vector is present (spill=2 ⇒ two placements each)
    val n = emb.count()
    val rows = spark.read.parquet(compacted)
    assert(rows.select("vec_id").distinct().count() === n)
    assert(rows.count() === 2 * n)
    // compaction is pure I/O: probing appended and compacted is identical
    def probe(d: String) = Pq.probeIvfPqIndex(spark, d, probes, "vec_id",
        "embedding", 5, nprobe = 3,
        refineWith = Some((emb, "vec_id", "embedding")), refine = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(probe(compacted) === probe(idxDir))
    // appended codes are bit-identical to what a from-scratch encode of
    // those vectors under the SAME frozen model produces: rebuild the
    // 75% index with identical training inputs and append the rest —
    // the two trees must agree row-for-row
    val idxDir2 = graft.TempDirs.create("graft_ivfpq_append_test2")
    Pq.writeIvfPqIndex(emb.filter(col("vec_id") % 4 =!= 0), "vec_id",
      "embedding", idxDir2, nCells = 8, nSub = 8, nCodes = 16, iters = 3,
      spill = 2)
    Pq.appendIvfPqIndex(emb.filter(col("vec_id") % 4 === 0), "vec_id",
      "embedding", idxDir2, spill = 2)
    val a = spark.read.parquet(compacted)
      .select(col("vec_id"), col("cell").cast("int"), col("codes"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    val b = spark.read.parquet(idxDir2)
      .select(col("vec_id"), col("cell").cast("int"), col("codes"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(a === b)
  }

  test("on-disk OPQ index probe returns exactly the in-memory " +
      "opqIvfPqTopK results; appends honor the frozen rotation") {
    val emb = Tables.embeddings(spark, dir)
    val probes = emb.filter(col("vec_id") < 8)
    val mem = Pq.opqIvfPqTopK(emb, "vec_id", "embedding", probes,
        "vec_id", "embedding", 5, nCells = 8, nprobe = 3, nSub = 8,
        nCodes = 16, iters = 3, opqIters = 4, refine = 8, spill = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val idxDir = graft.TempDirs.create("graft_opq_idx_test")
    Pq.writeIvfPqIndex(emb, "vec_id", "embedding", idxDir, nCells = 8,
      nSub = 8, nCodes = 16, iters = 3, spill = 2, opqIters = 4)
    val disk = Pq.probeIvfPqIndex(spark, idxDir, probes, "vec_id",
        "embedding", 5, nprobe = 3,
        refineWith = Some((emb, "vec_id", "embedding")), refine = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(disk === mem,
      s"OPQ disk probe diverged: only-disk=${disk -- mem} only-mem=${mem -- disk}")
    // frozen-rotation appends: 75% build + 25% append must equal a
    // rebuild of the same 75% (identical deterministic rotation/models)
    // + one append of everything else, row-for-row in the codes tree
    val a75 = graft.TempDirs.create("graft_opq_append_a")
    Pq.writeIvfPqIndex(emb.filter(col("vec_id") % 4 =!= 0), "vec_id",
      "embedding", a75, nCells = 8, nSub = 8, nCodes = 16, iters = 3,
      spill = 2, opqIters = 4)
    Pq.appendIvfPqIndex(emb.filter(col("vec_id") % 8 === 0), "vec_id",
      "embedding", a75, spill = 2)
    Pq.appendIvfPqIndex(emb.filter(col("vec_id") % 8 === 4), "vec_id",
      "embedding", a75, spill = 2)
    val b75 = graft.TempDirs.create("graft_opq_append_b")
    Pq.writeIvfPqIndex(emb.filter(col("vec_id") % 4 =!= 0), "vec_id",
      "embedding", b75, nCells = 8, nSub = 8, nCodes = 16, iters = 3,
      spill = 2, opqIters = 4)
    Pq.appendIvfPqIndex(emb.filter(col("vec_id") % 4 === 0), "vec_id",
      "embedding", b75, spill = 2)
    def tree(d: String) = spark.read.parquet(d)
      .select(col("vec_id"), col("cell").cast("int"), col("codes"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(tree(a75) === tree(b75))
    // compaction carries the rotation sidecar: probing the compacted
    // copy is identical to probing the appended original
    val comp = graft.TempDirs.create("graft_opq_append_comp")
    Pq.compactIvfPqIndex(spark, a75, comp)
    def probe(d: String) = Pq.probeIvfPqIndex(spark, d, probes, "vec_id",
        "embedding", 5, nprobe = 3,
        refineWith = Some((emb, "vec_id", "embedding")), refine = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(probe(comp) === probe(a75))
  }

  test("residual encoding recalls at least as well as raw at fixture scale") {
    val emb = Tables.embeddings(spark, dir)
    val probes = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      probes, "vec_id", "embedding", 5).select(col("q_id"), col("vec_id"))
    def recallOf(residual: Boolean): Double = {
      val ivf = Pq.ivfPqTopK(emb, "vec_id", "embedding", probes,
          "vec_id", "embedding", 5, nCells = 8, nprobe = 3, nSub = 8,
          nCodes = 16, iters = 3, residual = residual, refine = 8,
          spill = 2)
        .select(col("q_id"), col("vec_id").as("a_vec"))
      exact.join(ivf, exact("q_id") === ivf("q_id") &&
        col("vec_id") === col("a_vec")).count().toDouble / exact.count()
    }
    val res = recallOf(true); val raw = recallOf(false)
    assert(res >= raw - 1e-9, s"residual $res lost to raw $raw")
    assert(res >= 0.5, s"residual IVF-PQ recall $res below floor")
  }

  test("OPQ rotation is orthogonal, deterministic, and beats plain PQ on " +
      "structure that straddles the subspace split") {
    // intrinsically 6-D data densely mixed into 8 dims: an nSub=2 split
    // sees full-rank 4-D spread in BOTH halves, while the optimal
    // rotation packs the latent dims 3+3 — vector-quantizer distortion
    // scales like L^(-2/d), so the re-pack wins outright (measured
    // ratio ≈ 0.72 at 16 codes). Deterministic: seeded latent draws,
    // Gram-Schmidt mixing columns.
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val cols = Array.fill(6)(Array.fill(8)(rnd.nextGaussian()))
    for (i <- 0 until 6) {
      for (j <- 0 until i) {
        val d = (0 until 8).map(k => cols(i)(k) * cols(j)(k)).sum
        for (k <- 0 until 8) cols(i)(k) -= d * cols(j)(k)
      }
      val n = math.sqrt((0 until 8).map(k => cols(i)(k) * cols(i)(k)).sum)
      for (k <- 0 until 8) cols(i)(k) /= n
    }
    val circle = (0 until 512).map { i =>
      val z = Array.fill(6)(rnd.nextGaussian())
      val v = Array.tabulate(8)(k =>
        (0 until 6).map(j => cols(j)(k) * z(j)).sum + 0.01 * rnd.nextGaussian())
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val opq = Pq.trainOpq(circle, "vec_id", "embedding", nSub = 2,
      nCodes = 16, iters = 3, opqIters = 8)
    val opq2 = Pq.trainOpq(circle, "vec_id", "embedding", nSub = 2,
      nCodes = 16, iters = 3, opqIters = 8)
    // deterministic: bit-identical rotations across runs
    assert(opq.rotation.flatten.toSeq === opq2.rotation.flatten.toSeq)
    // orthogonal: max |R·Rᵀ − I| tiny
    val r = opq.rotation
    val dev = (for (i <- r.indices; j <- r.indices) yield {
      val s = r.indices.map(k => r(i)(k) * r(j)(k)).sum
      math.abs(s - (if (i == j) 1.0 else 0.0))
    }).max
    assert(dev < 1e-9, s"rotation not orthogonal: dev $dev")
    val pq = Pq.train(circle, "vec_id", "embedding", nSub = 2,
      nCodes = 16, iters = 3)
    def meanErr(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg("sq_err")).head().getDouble(0)
    val errP = meanErr(Pq.reconstructionError(circle, "vec_id", "embedding", pq))
    val errO = meanErr(Pq.opqReconstructionError(circle, "vec_id", "embedding", opq))
    assert(errO < errP * 0.9,
      s"OPQ ($errO) should clearly beat PQ ($errP) on straddling structure")
  }

  test("reconstruction error shrinks as the codebook grows") {
    def meanErr(nCodes: Int): Double = {
      val model = Pq.train(planted, "vec_id", "embedding", nSub = 2,
        nCodes = nCodes, iters = 3)
      Pq.reconstructionError(planted, "vec_id", "embedding", model)
        .agg(avg("sq_err")).head().getDouble(0)
    }
    val coarse = meanErr(1)
    val fine = meanErr(8)
    assert(fine < coarse / 2,
      s"8-code books ($fine) should beat 1-code books ($coarse) by >2x")
  }

  test("PQ recall@5 vs brute force on the fixture embeddings") {
    val emb = Tables.embeddings(spark, dir)
    val probes = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      probes, "vec_id", "embedding", 5)
      .select(col("q_id"), col("vec_id"))
    def recallOf(refine: Int): Double = {
      val pq = Pq.pqTopK(emb, "vec_id", "embedding", probes,
        "vec_id", "embedding", 5, nSub = 8, nCodes = 16, iters = 3,
        refine = refine)
        .select(col("q_id"), col("vec_id").as("a_vec"))
      val hits = exact.join(pq,
          exact("q_id") === pq("q_id") && col("vec_id") === col("a_vec"))
        .count()
      hits.toDouble / exact.count()
    }
    assert(exact.count() > 0)
    val raw = recallOf(0)
    val refined = recallOf(8)
    assert(refined >= 0.7, s"refined PQ recall@5 $refined below floor")
    assert(refined >= raw, s"refine ($refined) must not lose to raw ($raw)")
  }
}
