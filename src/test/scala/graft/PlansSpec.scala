package graft

import org.apache.spark.sql.functions._

/** Catalyst plan-level extensions (graft.plans). */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("range-join rewrite: theta join plans as bucketed equi join, identical results") {
    GraftExtensions.register(spark)
    val points = (1L to 2000L).toDF("p")
    val iv = Seq((1, 0L, 10L), (2, 60L, 70L), (3, 100L, 600L),
      (4, 5000L, 6000L), (5, 1990L, 2500L)).toDF("iv", "lo", "hi")

    def thetaJoin() = points.join(iv,
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select("iv", "p")

    val rewritten = thetaJoin()
    // the rewrite replaced the nested-loop plan with an equi join
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    val got = rewritten.as[(Int, Long)].collect().toSet

    // kill-switch off → the naive plan; results must be identical
    spark.conf.set("spark.graft.rangeJoin.enabled", "false")
    val want =
      try thetaJoin().as[(Int, Long)].collect().toSet
      finally spark.conf.set("spark.graft.rangeJoin.enabled", "true")
    assert(got == want && want.nonEmpty)

    // an extra cross-side conjunct rides along as residual
    val extra = points.join(iv,
        col("p") >= col("lo") && col("p") <= col("hi") && col("p") =!= col("hi"))
      .select("iv", "p").as[(Int, Long)].collect().toSet
    assert(extra == want.filterNot { case (i, p) =>
      Seq((1, 10L), (2, 70L), (3, 600L), (4, 6000L), (5, 2500L)).contains((i, p)) })
  }

  test("go_gaf idmapping join: broadcast only under Catalyst's size threshold") {
    // The idmapping sidecar is ~10 GB unpruned in production, so the
    // source must NOT force a broadcast hint: a small (test/per-taxon
    // pruned) dimension should broadcast via size stats alone, and
    // disabling auto-broadcast must yield a shuffle join — which a
    // forced hint would bypass.
    val in = graft.engine.GoGafSource.read(
      spark, "src/test/resources/golden/go_gaf/input")
    def planOf(): String = graft.engine.GoGafSource
      .transform(spark, in, Nil).queryExecution.executedPlan.toString
    val auto = planOf()
    assert(auto.contains("BroadcastHashJoin"), auto.take(800))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val gated = planOf()
      assert(!gated.contains("BroadcastHashJoin"), gated.take(800))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("range-join rewrite leaves equi joins and non-range thetas alone") {
    GraftExtensions.register(spark)
    val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val b = Seq((1L, 5L), (2L, 30L)).toDF("k2", "w")
    // equi join: untouched (no Generate in the plan)
    val eq = a.join(b, col("k") === col("k2"))
    assert(!eq.queryExecution.optimizedPlan.toString.contains("explode"))
    // one-sided bounds (no bracketing pair): untouched nested loop
    val oneSided = a.join(b, col("v") >= col("w"))
    assert(!oneSided.queryExecution.optimizedPlan.toString.contains("explode"))
    assert(oneSided.count() == 2) // (10>=5), (20>=5)
  }

  test("scan widen guard: spreads a 1-split scan and blocks filter sink-back") {
    import graft.operators.ScanStats
    val dir = java.nio.file.Files.createTempDirectory("graft-widen").toString
    spark.range(10000).toDF("id").coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/t.parquet")
    val narrow = spark.read.parquet(s"$dir/t.parquet")
    assert(ScanStats.estimatedScanPartitions(narrow) <
      spark.sparkContext.defaultParallelism)

    val wide = ScanStats.widen(narrow)
    assert(wide.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)

    // a downstream filter must STAY above the exchange — without the
    // barrier the optimizer sinks it (with its whole expression subtree)
    // onto the single-split scan side, re-serializing the work
    val filtered = wide.filter(col("id") % 7 === 0)
    val optimized = filtered.queryExecution.optimizedPlan
    var sawRepartition = false
    var filterBelowExchange = false
    optimized.foreach {
      case _: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation =>
        sawRepartition = true
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if sawRepartition && f.condition.deterministic =>
        filterBelowExchange = true
      case _ =>
    }
    assert(sawRepartition, optimized.toString.take(500))
    assert(!filterBelowExchange,
      "deterministic filter sank below the widen exchange:\n" +
        optimized.toString.take(800))
    assert(filtered.count() == 10000 / 7 + 1)

    // already-wide inputs are untouched: no second exchange, pushdown free
    val rewiden = ScanStats.widen(wide)
    val reps = rewiden.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation => r
    }
    assert(reps.size == 1, s"widen re-shuffled an already-wide input: $reps")
  }

  /** Count shuffle Exchange nodes in the physical plan string — the
    * scale-posture metric the round-7 ops lock. String-based because an
    * AQE root hides its children from `SparkPlan.collect` until
    * execution; `\bExchange\b` matches the shuffle node but not
    * BroadcastExchange (no word boundary mid-token). */
  private def planStr(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    "\\bExchange\\b".r.findAllIn(planStr(df)).size

  test("a/v sync plans ONE shuffle (union+window, no join)") {
    import graft.operators.Multimodal
    val frames = Seq((1L, 0L, 0L)).toDF("doc_id", "frame_no", "frame_pts")
    val chunks = Seq((1L, 0L, 5L)).toDF("doc_id", "chunk_no", "chunk_pts")
    val plan = Multimodal.avSync(frames, chunks, "doc_id")
    assert(shuffles(plan) == 1, planStr(plan).take(800))
    // and no join operator anywhere — the as-of is a window, linear in
    // |frames|+|chunks|, never |frames|×|chunks| candidates
    assert(!planStr(plan).contains("Join"), planStr(plan).take(800))
  }

  test("chunk dedup plans its two inherent shuffles, nothing more") {
    import graft.operators.TextOps
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val plan = TextOps.chunkDedup(docs, "doc_id", "text", chunkWords = 2)
    // chunk-content window + per-doc regroup (+ the totals branch reuses
    // the regroup key); the totals join is on the doc id both sides
    // already hash on, so AQE/EnsureRequirements adds no extra exchange
    // beyond one per aggregation side
    assert(shuffles(plan) <= 4, planStr(plan).take(800))
    // partial (map-side) aggregation present on the regroup
    assert(planStr(plan).contains("partial_count"), planStr(plan).take(800))
  }

  test("url dedup: canonicalization is map-side, one agg shuffle total") {
    import graft.operators.TextOps
    val urls = Seq((1L, "http://A.b/c?x=1")).toDF("doc_id", "url")
    val plan = urls
      .select(col("doc_id"), TextOps.urlCanonicalize(col("url")).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_variants"))
    assert(shuffles(plan) == 1, planStr(plan).take(800))
    assert(planStr(plan).contains("partial_min"), planStr(plan).take(800))
  }

  test("containment pairs: df cap filters BOTH sides below the candidate self-join") {
    import graft.operators.Dedup
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    // cache=false: the production operator persists the pruned relation,
    // which collapses the visible plan into an InMemoryRelation; the
    // uncached build has the identical topology and stays auditable
    val plan = Dedup.containmentPairsImpl(docs, "doc_id", "text",
      n = 3, threshold = 0.9, maxDf = 5, cache = false)
    // the candidate join is the one on the hashed shingle column; every
    // such join must see df-capped inputs on BOTH sides — the cap is the
    // operator's only bound on the inverted-index blow-up, so a plan
    // where it slid above the join is a scale regression
    // (condition references both "sh" and "id" — the sh⋈freq join that
    // PRODUCES the df column matches "sh" alone and is not a candidate)
    val shingleJoins = plan.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.exists(c =>
        c.references.exists(_.name == "sh") &&
          c.references.exists(_.name == "id")) => j
    }
    assert(shingleJoins.nonEmpty)
    shingleJoins.foreach { j =>
      Seq(j.left, j.right).foreach { side =>
        val capped = side.collect {
          case f: Filter if f.condition.references.exists(_.name == "df") => true
        }
        assert(capped.nonEmpty,
          s"df cap not below the shingle join:\n${j.toString.take(800)}")
      }
    }
  }

  test("leak-free split: one left join, bucket/split map-side (no extra shuffle)") {
    import graft.operators.Dedup
    val universe = (1L to 100L).toDF("id")
    val cl = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster")
    val plan = Dedup.leakFreeSplit(universe, "id", cl,
      seed = "s", pctTrain = 80, pctVal = 10)
    // the md5-arithmetic bucket and the split CASE are projections over
    // the join output — at most the join's own shuffle appears (zero
    // when AQE broadcasts the cluster relation, which is ≪ corpus)
    assert(shuffles(plan) <= 1, planStr(plan).take(800))
    assert("\\bJoin\\b".r.findAllIn(planStr(plan)).size <= 1 ||
      planStr(plan).contains("BroadcastHashJoin"), planStr(plan).take(800))
    assert(!planStr(plan).contains("Window"), planStr(plan).take(800))
  }

  test("repetition signals plan: two hash aggregates, no windows, no joins") {
    import graft.operators.TextOps
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextOps.repetitionSignals(docs, "doc_id", "text")
    // (id,n,gram) count + (id,n) rollup + (id) pivot — hash-partitioned
    // aggregates only (+1 widen exchange); a Window or Join here would
    // be a scale regression on the per-doc metric
    assert(!planStr(plan).contains("Window"), planStr(plan).take(800))
    assert(!planStr(plan).contains("Join"), planStr(plan).take(800))
    assert(planStr(plan).contains("partial_count"), planStr(plan).take(800))
    assert(shuffles(plan) <= 4, planStr(plan).take(800))
  }

  test("bpe pair counts plan: map-side partials + TakeOrdered, no global sort") {
    import graft.operators.TextOps
    val docs = Seq((1L, "abc de")).toDF("doc_id", "text")
    val plan = TextOps.bpePairCounts(docs, "text", k = 5)
    // the |alphabet|²-bounded aggregate collapses map-side; the top-k is
    // TakeOrdered over the survivors, never a full Sort of the pair space
    assert(planStr(plan).contains("partial_count"), planStr(plan).take(800))
    assert(planStr(plan).contains("TakeOrderedAndProject"), planStr(plan).take(800))
  }

  test("priority keep plans ONE shuffle: the content-digest window") {
    import graft.operators.Dedup
    val docs = Seq((1L, "t", "crawl")).toDF("doc_id", "text", "source")
    val plan = Dedup.priorityKeep(docs, "doc_id", "text",
      when(col("source") === "curated", 1).otherwise(2))
    // rank + copy-count share one Window over the digest — a plan that
    // grew a second exchange would double the recipe's dedup cost
    assert(shuffles(plan) == 1, planStr(plan).take(800))
    assert(!planStr(plan).contains("Join"), planStr(plan).take(800))
  }

  test("interleaved pack plans ONE shuffle (union+window, no join)") {
    import graft.operators.Multimodal
    val frames = Seq((1L, 0L, 0L)).toDF("doc_id", "frame_no", "frame_pts")
    val chunks = Seq((1L, 0L, 0L, 5L)).toDF("doc_id", "chunk_no", "chunk_pts", "n_tokens")
    val plan = Multimodal.interleavedPack(frames, chunks, "doc_id",
      imageTokens = 16, budget = 64)
    assert(shuffles(plan) == 1, planStr(plan).take(800))
    assert(!planStr(plan).contains("Join"), planStr(plan).take(800))
  }

  test("bpe encode plans: dictionary path folds the vocab once; direct path map-only") {
    import graft.operators.TextOps
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    // dictionary (default): the merge fold sits on the DISTINCT-word
    // relation joined back to occurrences — duplication-free CPU
    val dict = TextOps.bpeEncode(docs, "doc_id", "text", Seq(("a", "b")))
    assert(planStr(dict).contains("Join"), planStr(dict).take(800))
    assert(!planStr(dict).contains("Window"), planStr(dict).take(800))
    // direct: one projection over the scan (+1 widen exchange at most) —
    // a shuffle here would mean the model leaked into the data path
    val direct = TextOps.bpeEncode(docs, "doc_id", "text", Seq(("a", "b")),
      dictionary = false)
    assert(shuffles(direct) <= 1, planStr(direct).take(800))
    assert(!planStr(direct).contains("Join"), planStr(direct).take(800))
    assert(!planStr(direct).contains("Window"), planStr(direct).take(800))
  }

  test("pii redact plan: pure projection — zero shuffles") {
    import graft.operators.TextOps
    val docs = Seq((1L, "a@b.co")).toDF("doc_id", "text")
    val plan = TextOps.piiRedact(docs, "doc_id", "text")
    assert(shuffles(plan) == 0, planStr(plan).take(800))
    assert(!planStr(plan).contains("Join"), planStr(plan).take(800))
  }

  test("quality rules plan: pure projection — zero shuffles") {
    import graft.operators.TextOps
    val docs = Seq((1L, "the a cat")).toDF("doc_id", "text")
    val plan = TextOps.qualityRules(docs, "doc_id", "text")
    assert(shuffles(plan) == 0, planStr(plan).take(800))
    assert(!planStr(plan).contains("Join"), planStr(plan).take(800))
  }

  test("duplicate span removal plan: fp-partitioned window, no global funnel") {
    import graft.operators.Dedup
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val plan = Dedup.removeDuplicateSpans(docs, "doc_id", "text", w = 5)
    // "fingerprint in ≥2 docs" is ONE window over the fp partition
    // (min(id) ≠ max(id)) — hash-partitioned by the high-cardinality
    // fingerprint, so nothing serializes; the former groupBy(fp) +
    // join-back shuffled the |tokens|-sized wins relation twice. The
    // serialization hazard a window can introduce is a GLOBAL
    // (unpartitioned) sort — pin its absence via SinglePartition.
    assert(planStr(plan).contains("Window"), planStr(plan).take(1200))
    assert(!planStr(plan).contains("SinglePartition"), planStr(plan).take(1200))
    assert(planStr(plan).contains("LeftAnti"), planStr(plan).take(1200))
    assert(planStr(plan).contains("partial_count"), planStr(plan).take(1200))
  }

  test("Bench.fullCount forces every output column (count() does not)") {
    // a poisoned projection: assert_true throws IFF the column is
    // actually evaluated. Bare count() prunes it (and with it, any
    // final unique-keyed left join — the d23 under-measurement);
    // fullCount hashes every column, so the poison must fire.
    val poison = spark.range(3).toDF("id")
      .selectExpr("id", "assert_true(id < 2) AS probe")
    assert(poison.count() == 3) // pruned: no evaluation, no error
    intercept[Exception] { graft.Bench.fullCount(poison) }
  }

  test("t34 token-id plan: vocabulary ranked on the driver, no global window") {
    // the vocab rank used to be row_number() over an UNPARTITIONED
    // window — a single-task funnel for the whole vocab relation; the
    // driver-ranked broadcast-join form must plan with no Window node
    // and no single-partition exchange anywhere
    val df = SparkEntry.queries("t34_bpe_token_ids")(spark, sf)
    val plan = planStr(df)
    assert(!plan.contains("Window"), plan.take(1200))
    assert(!plan.contains("SinglePartition"), plan.take(1200))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(df.count() > 0)
  }

  test("PQ encode plans map-only: one vec_pq_codes projection, no join or aggregate") {
    // the encode stage of every index build: scan → vec_pq_codes
    // projection → explode — no ×ks codebook join, no (id, sub)-keyed
    // aggregate, no exchange below the search tail (the 109 s → 5.3 s
    // build fix; this pins the shape so it cannot quietly regress)
    val emb = Tables.embeddings(spark, sf)
    val q = graft.operators.Similarity.pqTopK(emb,
      emb.filter($"vec_id" < 3), "vec_id", "embedding",
      dim = 64, k = 3, m = 4, ks = 16)
    val plan = planStr(q)
    assert(plan.contains("vec_pq_codes"), plan.take(1200))
    // the only aggregate in the whole query is the ADC (qid, nid) sum —
    // an encode argmin aggregate would add partial_min lines
    assert(!plan.contains("partial_min"), plan.take(1200))
  }

  test("Bench.fullCount survives duplicate column names and map columns") {
    // post-join relations can carry duplicate output names, and map
    // columns reject xxhash64 — neither shape may degrade a bench run
    // into a recorded query error
    val a = spark.range(4).toDF("id")
    val dup = a.join(a.withColumnRenamed("id", "k"), $"id" === $"k")
      .select($"id", $"k".as("id")) // two columns literally named "id"
    assert(graft.Bench.fullCount(dup) == 4)
    val mapped = spark.range(3).toDF("id")
      .selectExpr("id", "map('k', id) AS m",
        "named_struct('inner', map('x', id)) AS s")
    assert(graft.Bench.fullCount(mapped) == 3)
  }
}
