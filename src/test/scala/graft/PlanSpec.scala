package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan guards over the fixture queries (SURVEY.md §4): the
  * 100 TB story rests on Catalyst doing the right thing — filters reaching
  * the parquet scan, projections pruning the read schema, small dims
  * broadcast, top-k planned as TakeOrderedAndProject, aggregates running
  * partial+final. These assert the shapes so a regression (e.g. a UDF
  * blocking pushdown) fails loudly instead of silently costing a scan.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(df: DataFrame): String = {
    df.collect() // finalize AQE so the executed plan is the real one
    df.queryExecution.executedPlan.toString
  }

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  test("selective scan pushes predicates and prunes columns (q02)") {
    val plan = finalPlan(q("q02_revenue_filter"))
    assert(plan.contains("PushedFilters: ["), s"no pushdown:\n$plan")
    assert(!plan.contains("PushedFilters: []"), s"empty pushdown:\n$plan")
    // the revenue query touches 4 lineitem columns; the scan must not read
    // the full 11-column schema
    assert(!plan.contains("l_orderkey"), s"read schema not pruned:\n$plan")
  }

  test("global top-k plans as TakeOrderedAndProject, not a full sort (q10)") {
    val plan = finalPlan(q("q10_topk_orders"))
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k operator:\n$plan")
  }

  test("small dimension join broadcasts (q04)") {
    val plan = finalPlan(q("q04_join_revenue_nation"))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("hash aggregation runs partial+final (q01)") {
    val plan = finalPlan(q("q01_pricing_summary"))
    val hashAggs = "HashAggregate".r.findAllIn(plan).length
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n$plan")
    assert(plan.contains("partial_"), s"no partial aggregation:\n$plan")
  }

  test("columnar text scoring plans with zero exchanges (q103)") {
    // repetition scoring is per-row arithmetic on the tokenized text — if
    // an Exchange appears, someone turned a projection into a shuffle
    val plan = finalPlan(q("q103_ngram_repetition"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("sequence packing shuffles only by the shard key (q100)") {
    // one window partitioned by source — every exchange in the (adaptive)
    // plan must key on the shard column, nothing else, so shards pack in
    // parallel with no global sort
    val plan = finalPlan(q("q100_sequence_packing"))
    val keys = "Exchange hashpartitioning\\((\\w+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(keys.nonEmpty && keys.forall(_.startsWith("source")),
      s"non-shard exchange keys $keys:\n$plan")
    assert(plan.contains("Window"), s"no window:\n$plan")
  }

  test("per-row media gates shuffle only the narrow id fan-out (q152–q160)") {
    // codec round-trips, spectral bins, resampling, cropping, keyframe
    // sampling, the composed funnels and unicode normalization are pure
    // per-row CPU. The ONLY admissible exchange is Scale.fanOut's
    // repartition of the scalar pre-payload columns (doc_id + a couple of
    // longs) that widens the unsplittable single-row-group fixture scan —
    // an exchange keyed on anything else, or appearing in queries that
    // never fan out, means the embarrassingly-parallel 100 TB path picked
    // up a real shuffle of payload bytes.
    for (name <- Seq("q152_audio_in_mp4", "q153_spectral_bands",
        "q154_audio_resample", "q155_center_crop", "q156_letterbox_pad",
        "q157_keyframe_sampling", "q158_vision_funnel",
        "q159_audio_funnel", "q160_sinc_resample",
        "q161_unicode_normalize", "q163_sinc_funnel",
        "q170_html_extract", "q171_html_main_content",
        "q172_warc_ingest")) {
      val plan = finalPlan(q(name))
      // every hash exchange must be EXACTLY the fan-out shape: one key,
      // that key doc_id, explicit-count repartition origin
      // (REPARTITION_BY_NUM) — a payload shuffle (join keyed on doc_id,
      // or hashpartitioning(doc_id, payload)) would not match (ADVICE r15)
      val exchanges =
        "Exchange hashpartitioning\\(([^)]*)\\), (\\w+)".r
          .findAllMatchIn(plan)
          .map(m => (m.group(1), m.group(2))).toSeq
      exchanges.foreach { case (args, origin) =>
        // args = "key1#id, key2#id, ..., numPartitions" — exactly one key
        val keys = args.split(",").map(_.trim).dropRight(1)
        assert(keys.length == 1 && keys.head.startsWith("doc_id"),
          s"non-fan-out exchange keys [${keys.mkString(",")}] in $name:\n$plan")
        assert(origin == "REPARTITION_BY_NUM",
          s"fan-out exchange origin $origin != REPARTITION_BY_NUM in $name:\n$plan")
      }
      // the fan-out is hash-keyed; a range/single-partition/round-robin
      // exchange would be a global sort or collapse sneaking in
      assert(!plan.contains("Exchange rangepartitioning") &&
        !plan.contains("Exchange SinglePartition") &&
        !plan.contains("RoundRobinPartitioning"),
        s"non-hash exchange in $name:\n$plan")
    }
  }

  test("hilbert key chain is one shuffle-free codegen stage (q167)") {
    // the unrolled quadrant-digit + rotate levels must stay NAMED
    // per-level projections (CollapseProject inlining them would blow the
    // expression tree up exponentially) fused into a single
    // WholeStageCodegen pass with no exchange before the summary agg
    import org.apache.spark.sql.functions.col
    val keyed = graft.operators.Layout.withHilbertKey(
      graft.Tables.lineitem(spark, dir).select(
        (col("l_partkey") % 64).as("x"), (col("l_suppkey") % 64).as("y")),
      col("x"), col("y"), 6, "h")
    val plan = finalPlan(keyed)
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    val stages = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet
    assert(stages.size === 1, s"key chain split across codegen stages:\n$plan")
    assert(plan.length < 20000, s"expression blow-up (${plan.length} chars)")
  }

  test("PII scrub is a pure projection — zero exchanges (q102)") {
    val plan = finalPlan(q("q102_pii_scrub"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("stratified sampling is a stateless scan filter (q101)") {
    val plan = finalPlan(q("q101_stratified_sample"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(plan.contains("Filter"), s"no filter:\n$plan")
  }

  test("mixture sampling shuffles only by source; quotas broadcast (q129)") {
    // the per-source quota table is a handful of rows — it must reach the
    // corpus as a broadcast, and every exchange must key on source (the
    // rank window's partition), never a global repartition
    val plan = finalPlan(q("q129_mixture_sample"))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"quota join not broadcast:\n$plan")
    val keys = "Exchange hashpartitioning\\((\\w+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(keys.forall(_.startsWith("source")),
      s"non-source exchange keys $keys:\n$plan")
  }

  test("shard assignment shuffles once, keyed on the shard only (q130)") {
    val plan = finalPlan(q("q130_training_shards"))
    val keys = "Exchange hashpartitioning\\((\\w+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(keys.nonEmpty && keys.forall(_.startsWith("shard")),
      s"non-shard exchange keys $keys:\n$plan")
  }

  test("bloom decontamination broadcasts the bench side (q131)") {
    // the corpus side must meet the bench shingles through a broadcast
    // equi-join — a shuffled join here would defeat the prefilter's point
    val plan = finalPlan(q("q131_bloom_decontamination"))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("no scalar UDF in any oracle-gated query plan") {
    // scalar UDFs are codegen black boxes that block pushdown and
    // vectorization; every hash-gated query must plan with native
    // expressions only (typed Aggregators / mapGroups are fine — they're
    // deliberate whole-operator extension points, not scalar functions)
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.filter { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      var found = false
      df.queryExecution.analyzed.foreach { p =>
        p.expressions.foreach(_.foreach {
          case _: ScalaUDF => found = true
          case _ => ()
        })
      }
      found
    }
    assert(offenders.isEmpty, s"scalar UDFs in oracle-gated plans: $offenders")
  }

  test("PQ ADC scan broadcasts probe LUTs; no cartesian product (q136)") {
    // the codes-walk side is the corpus scan; the per-probe LUT table is
    // tiny and must reach it as a broadcast (nested-loop on the
    // self-exclusion predicate, or hash on the refine re-join) — a
    // CartesianProduct here would shuffle the corpus against every probe
    // q136's REGISTERED result is SharedAnn's localCheckpoint (a
    // materialized RDD scan by design) — fence the underlying operator
    // plan it pins, built with the identical model and configuration
    val emb = Tables.embeddings(spark, dir)
    // twin plan built from SharedAnn.Cfg — the same constants the
    // registered builder reads, so fence and build cannot drift
    val C = queries.SharedAnn.Cfg
    val plan = finalPlan(operators.Pq.searchWithModel(
      emb, "vec_id", "embedding",
      queries.SharedAnn.probes(spark, dir),
      "vec_id", "embedding", C.K,
      queries.SharedAnn.pqModel(spark, dir), refine = C.PqRefine))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), s"probe side not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
  }

  test("no scalar UDF in any oracle-free (cert / ANN / sketch) plan either") {
    // the oracle-free class (ANN composites, solver certificates) must meet
    // the same native-expression bar as the hash-gated queries — a UDF
    // regression here would silently cost codegen on the scale paths
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    val offenders = SparkEntry.oracleFree.keys.toSeq.sorted.filter { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      var found = false
      df.queryExecution.analyzed.foreach { p =>
        p.expressions.foreach(_.foreach {
          case _: ScalaUDF => found = true
          case _ => ()
        })
      }
      found
    }
    assert(offenders.isEmpty, s"scalar UDFs in oracle-free plans: $offenders")
  }

  test("IVF-PQ ADC shortlist ranks under WindowGroupLimit; refine join " +
      "broadcasts the probe side (q138)") {
    // as with q136: the registered result is the pinned checkpoint —
    // fence the underlying ivfPqTopK plan at q138's configuration
    val emb = Tables.embeddings(spark, dir)
    val C = queries.SharedAnn.Cfg
    val plan = finalPlan(operators.Pq.ivfPqTopK(
      emb, "vec_id", "embedding",
      queries.SharedAnn.probes(spark, dir),
      "vec_id", "embedding", C.K, nCells = C.NCells, nprobe = C.Nprobe,
      nSub = C.NSub, nCodes = C.NCodes, iters = C.Iters,
      residual = true, refine = C.Refine, spill = C.Spill))
    // the rank-<=shortlist filter must prune each probe's group before the
    // sort — without it the ADC scan sorts every candidate row
    assert(plan.contains("WindowGroupLimit"), s"no window group limit:\n$plan")
    // probe LUTs and the refine probe table are bounded → broadcast, and
    // nothing in the composition may fall back to a cartesian product
    assert(plan.contains("BroadcastHashJoin"), s"refine join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
  }

  test("on-disk IVF-PQ probe prunes the codes tree at listing time") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 3 well-separated clusters → 3 cells; one probe with nprobe=1 must
    // open exactly one cell=* directory of the codes tree
    val crnd = new scala.util.Random(7)
    val centers = Seq(
      Array.fill(16)(0.0).updated(1, 10.0),
      Array.fill(16)(0.0).updated(6, 10.0),
      Array.fill(16)(0.0).updated(11, -10.0))
    val clustered = (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(v => v + crnd.nextGaussian() * 0.3).toSeq)
    }.toDF("vec_id", "embedding")
    val idxDir = graft.TempDirs.create("graft-planspec-ivfpq")
    graft.operators.Pq.writeIvfPqIndex(clustered, "vec_id", "embedding",
      idxDir, nCells = 3, nSub = 4, nCodes = 8, iters = 3)
    val out = graft.operators.Pq.probeIvfPqIndex(spark, idxDir,
      clustered.filter(col("vec_id") === 0), "vec_id", "embedding",
      5, nprobe = 1)
    val plan = finalPlan(out)
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition pruning on the codes tree:\n$plan")
    // listing-time proof: of the 3 cell directories written, every
    // executed scan of the codes tree selected exactly 1 partition
    // (Dataset.inputFiles reads the UNPRUNED logical relation, so the
    // check must look at the executed FileSourceScanExec nodes)
    val cellsWritten = new java.io.File(idxDir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellsWritten === 3)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case qs: QueryStageExec => allScans(qs.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => (other.children ++ other.subqueries).flatMap(allScans)
    }
    val codesScans = allScans(out.queryExecution.executedPlan).filter { s =>
      s.metadata.get("Location").exists(_.contains("planspec-ivfpq")) &&
        !s.metadata.get("Location").exists(_.contains("_centroids")) &&
        !s.metadata.get("Location").exists(_.contains("_codebooks"))
    }
    assert(codesScans.nonEmpty, "no codes-tree scan found in executed plan")
    codesScans.foreach { s =>
      val parts = s.metrics.get("numPartitions").map(_.value)
        .getOrElse(s.metrics("numFiles").value)
      assert(parts === 1L,
        s"codes scan read $parts partitions, wanted 1 of $cellsWritten:\n$s")
    }
  }

  test("PQ encode's staging projections survive optimization (the 37× fence)") {
    // Pq.encode references each subvector nCodes times and the
    // normalized vector nSub·nCodes times; if CollapseProject ever
    // inlines those stages (e.g. someone hands codesCol a computed
    // expression again), the optimized plan explodes into hundreds of
    // duplicated slice/transform subtrees and encode regresses ~37×
    // (round-8 incident). Count the duplication classes directly.
    import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, Slice}
    val emb = Tables.embeddings(spark, dir)
    val model = graft.operators.Pq.train(emb, "vec_id", "embedding",
      nSub = 16, nCodes = 16, iters = 1)
    val df = graft.operators.Pq.encode(emb, "vec_id", "embedding", model)
    var slices = 0; var transforms = 0
    df.queryExecution.optimizedPlan.foreach { p =>
      p.expressions.foreach(_.foreach {
        case _: Slice => slices += 1
        case _: ArrayTransform => transforms += 1
        case _ => ()
      })
    }
    // healthy: ≤ nSub slices (one per subvector stage) and a handful of
    // transforms (normalize + zip_with folds); collapsed: 256+ of each
    assert(slices <= 16, s"$slices Slice nodes — staging collapsed")
    assert(transforms < 64, s"$transforms ArrayTransform nodes — staging collapsed")
  }

  test("flagship q22 pre-prunes the window input map-side; counts broadcast") {
    // the round-13 bounded-sort rewrite: the rank filter sits directly over
    // a single-function window, so InferWindowGroupLimit must plan a
    // Partial WindowGroupLimit BEFORE the exchange (each input partition
    // prunes to its local top-35 per group — the window's post-shuffle
    // input is ≤ 35·|groups| rows per input partition, never the full
    // table), and the trim's group counts must arrive as a broadcast-
    // joined aggregate, not a second full-partition window
    val plan = finalPlan(q("q22_catalog_trim"))
    assert(plan.contains("row_number(), 35, Partial"),
      s"no map-side partial window group limit:\n$plan")
    assert(plan.contains("row_number(), 35, Final"),
      s"no final window group limit:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"group counts not broadcast-joined:\n$plan")
    // exactly one window function remains (rnd); cnt must NOT be a window
    assert("windowspecdefinition".r.findAllIn(plan).length <= 2,
      s"count window crept back in:\n$plan")
  }

  test("q84's percentile bounds aggregate and broadcast — no window sort") {
    // the zscale bounds must arrive as a grouped aggregate joined back,
    // never an unbounded-frame window over the 3-value key (which would
    // sort the full table in |groups| tasks — the q22 ceiling)
    val plan = finalPlan(q("q84_zscale_stretch"))
    assert(!plan.contains("Window"), s"percentile window crept back:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"bounds not broadcast-joined:\n$plan")
    assert(plan.contains("partial_percentile"),
      s"percentile not partial+final:\n$plan")
  }

  test("pure rank top-k gets WindowGroupLimit pushdown") {
    // q11 itself computes percent_rank/ntile (full-partition functions), so
    // group-limit pruning is rightly blocked there; the pure ranking shape
    // must prune each group to k rows before the sort
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc)
    val topk = Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    val plan = finalPlan(topk)
    assert(plan.contains("WindowGroupLimit"), s"no window group limit:\n$plan")
  }

  test("q178 global numbering never plans a single-partition sort") {
    // contiguous sample ids must come from the two-pass form: a sampled
    // RANGE exchange (parallel per-partition numbering) + the one-row-
    // per-partition offsets broadcast back — the naive row_number() OVER
    // (ORDER BY …) plan would surface as Exchange SinglePartition
    // The numbering itself is RDD.zipWithIndex over the sorted stage
    // (offsets in partition METADATA — immune to downstream coalesce /
    // AQE stage merges, see Layout.contiguousIds scaladoc), so the fence
    // is on the order-establishing stage: a sampled RANGE exchange with
    // parallel per-partition sorts, no single-partition stage, no
    // row_number window anywhere.
    import org.apache.spark.sql.functions.col
    val sorted = graft.operators.Layout.rangeSorted(
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          ((col("doc_id") * 2654435761L) % 4294967296L).as("shuffle_key")),
      Seq(col("shuffle_key"), col("doc_id")), 32)
    val plan = finalPlan(sorted)
    assert(plan.contains("rangepartitioning"),
      s"order not established by a range exchange:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"order stage collapsed to one partition:\n$plan")
    assert(!plan.contains("row_number()"),
      s"numbering planned as a window:\n$plan")
  }

  test("q173 canonicalization is a shuffle-free codegen'd projection") {
    // URL canonicalization + eTLD+1 are pure string expression chains; an
    // Exchange here means someone turned a scan projection into a shuffle
    val plan = finalPlan(q("q173_url_canonicalize"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF crept into the canonicalization chain:\n$plan")
  }

  test("q174 domain cap pre-prunes map-side; blocklist broadcasts") {
    // a flooding domain must ship `cap` rows per map partition into the
    // exchange (Partial WindowGroupLimit), and the blocklist anti-join
    // must broadcast the small curated side
    val plan = finalPlan(q("q174_domain_curation"))
    assert(plan.contains("row_number(), 10, Partial"),
      s"no map-side partial window group limit:\n$plan")
    assert(plan.contains("row_number(), 10, Final"),
      s"no final window group limit:\n$plan")
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"),
      s"blocklist not a broadcast anti-join:\n$plan")
  }

  test("q184 classifier scoring is a shuffle-free literal-weights scan") {
    // the forward pass is bias + avg(weights[idx]) with the weights as
    // one array literal: an Exchange means scoring started joining a
    // weights table per document; a UDF means the codegen chain broke
    val plan = finalPlan(q("q184_quality_classifier"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF crept into the scoring chain:\n$plan")
  }

  test("q183 PSL suffix joins all broadcast; big side shuffles once (cap)") {
    // one broadcast left join per suffix depth — a SortMergeJoin here
    // means the suffix table stopped broadcasting and the corpus is being
    // shuffled per depth; the ONLY exchange allowed on the corpus side is
    // the domain cap's, with its map-side partial group limit
    val plan = finalPlan(q("q183_psl_registrable_domain"))
    assert(!plan.contains("SortMergeJoin"),
      s"PSL join degraded to a shuffle join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(plan.contains("row_number(), 3, Partial"),
      s"no map-side partial window group limit:\n$plan")
    // count in the FINAL plan only — AQE's toString appends the Initial
    // Plan section, which repeats the same exchange
    val finalSection = plan.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(finalSection).size
    assert(exchanges == 1, s"expected exactly 1 corpus exchange, got " +
      s"$exchanges:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF crept into the PSL chain:\n$plan")
  }

  test("q187 rule gate is a shuffle-free codegen'd projection") {
    // all 11 C4/Gopher rules are higher-order array expressions over one
    // scan; an Exchange means a rule turned into a join or aggregation,
    // a UDF means the codegen chain broke
    val plan = finalPlan(q("q187_c4_gopher_rules"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF crept into the rule chain:\n$plan")
  }

  test("q188 attrition aggregates map-side; rules add no extra shuffle") {
    // the funnel costs exactly: the dedup stage's content-key exchange
    // (with a partial_min below it), the survivors join, and the tiny
    // reason rollup (partial+final count) — the 11 rule flags themselves
    // must not add exchanges beyond those
    val plan = finalPlan(q("q188_curation_attrition"))
    val finalSection = plan.split("== Initial Plan ==").head
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      s"no map-side partial aggregation:\n$plan")
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(finalSection).size
    assert(exchanges <= 3, s"rule flags added exchanges, got " +
      s"$exchanges:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF crept into the attrition chain:\n$plan")
  }
}
