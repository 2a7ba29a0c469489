package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Plan audits for the persisted-index query paths: the claim is that
  * the PQ/IVFADC code tables' bucket layout feeds the query-time
  * joins/aggregations without re-shuffling corpus-sized relations, and
  * that the cell-bucketed indexes engage BUCKET PRUNING at query time —
  * a query batch's scan reads only its probed cells' bucket files, not
  * the whole codes table. These tests pin the executed plans to that
  * shape, including across appends (the serving posture: build once,
  * append batches, query forever).
  */
class IndexPlanSpec extends SparkSpec {
  import spark.implicits._

  /** `SelectedBucketsCount: x out of y` — emitted by FileSourceScanExec
    * exactly when bucket pruning produced a bucket subset. Returns
    * (selected, total) of the FIRST pruned scan in the plan. */
  private def selectedBuckets(plan: String): Option[(Int, Int)] =
    """SelectedBucketsCount: (\d+) out of (\d+)""".r
      .findFirstMatchIn(plan).map(m => (m.group(1).toInt, m.group(2).toInt))

  test("s12 indexed PQ query: code-side aggregation reuses the bucket layout") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-plan").toString
    Similarity.writePqIndex(emb, "vec_id", "embedding",
      "graft_pq_plan", s"$dir/idx", dim = 64, m = 4, ks = 16, buckets = 4)
    val q = Similarity.pqTopKIndexed(spark, "graft_pq_plan",
      emb.filter($"vec_id" < 5), "vec_id", "embedding", dim = 64, k = 3,
      m = 4)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), plan.take(1200))
    // the codes side must NOT hash-exchange on its way into the
    // (qid, nid) aggregation: bucketing by nid already clusters it, so
    // the only exchanges allowed are the query-side broadcasts and the
    // k-row window's final single-partition step
    val exchangeLines = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!exchangeLines.exists(_.contains("nid")),
      s"codes re-shuffled at query time:\n${exchangeLines.mkString("\n")}")
    spark.sql("DROP TABLE IF EXISTS graft_pq_plan")
    spark.sql("DROP TABLE IF EXISTS graft_pq_plan_codebook")
  }

  test("s14 indexed IVFADC query: probed-buckets-only scan, no corpus-wide exchange") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-adc-plan").toString
    Similarity.writeIvfadcIndex(emb, "vec_id", "embedding",
      "graft_adc_plan", s"$dir/idx", dim = 64, nlist = 8, m = 4, ks = 16,
      buckets = 4)
    val q = Similarity.ivfadcTopKIndexed(spark, "graft_adc_plan",
      emb.filter($"vec_id" < 5), "vec_id", "embedding", dim = 64, k = 3,
      nprobe = 4, m = 4)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), plan.take(1200))
    // probes and ADC tables broadcast; the codes relation streams from
    // its buckets into the joins — no assignment or encode stage (the
    // encode's distinctive vec_pq_codes projection must be absent)
    assert(!plan.contains("vec_pq_codes"),
      s"encode ran at query time:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    // the probed-cell literal In filter must reach the scan and PRUNE
    // BUCKET FILES, not just rows: SelectedBucketsCount appears exactly
    // when FileSourceStrategy produced a bucket subset
    assert(selectedBuckets(plan).isDefined,
      s"no bucket pruning at query time:\n${plan.take(1500)}")
    // and the pushed filter itself is visible on the scan
    assert(plan.contains("cell#") && plan.contains("PushedFilters"),
      plan.take(1500))
    spark.sql("DROP TABLE IF EXISTS graft_adc_plan")
    spark.sql("DROP TABLE IF EXISTS graft_adc_plan_codebook")
    spark.sql("DROP TABLE IF EXISTS graft_adc_plan_centroids")
  }

  test("s07 indexed IVF query: probed-buckets-only scan of the cell-bucketed index") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-plan").toString
    Similarity.writeIvfIndex(emb, "vec_id", "embedding",
      "graft_ivf_plan", s"$dir/idx", nlist = 8, buckets = 8)
    val q = Similarity.ivfTopKIndexed(spark, "graft_ivf_plan",
      emb.filter($"vec_id" === 1), "vec_id", "embedding", k = 3, nprobe = 2)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), plan.take(1200))
    // one query probing 2 of 8 cells over 8 buckets: the scan must
    // select a strict subset of bucket files
    val sel = selectedBuckets(plan)
    assert(sel.isDefined, s"no bucket pruning:\n${plan.take(1500)}")
    val (selected, total) = sel.get
    assert(selected < total,
      s"pruning selected all buckets ($selected of $total):\n${plan.take(1500)}")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_plan")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_plan_centroids")
  }

  test("s19 indexed residual IVFADC: bucket-pruned probed-cell scan, no encode/assign") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-res-plan").toString
    Similarity.writeIvfadcResidualIndex(emb, "vec_id", "embedding",
      "graft_res_plan", s"$dir/idx", dim = 64, nlist = 8, m = 4, ks = 16,
      buckets = 4)
    val q = Similarity.ivfadcResidualTopKIndexed(spark, "graft_res_plan",
      emb.filter($"vec_id" < 5), "vec_id", "embedding", dim = 64, k = 3,
      nprobe = 4, m = 4)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), plan.take(1200))
    assert(selectedBuckets(plan).isDefined,
      s"no bucket pruning on the residual index:\n${plan.take(1500)}")
    // neither the residual computation (vec_sub), the encode
    // (vec_pq_codes) nor the assignment (vec_best_cell) may run at
    // query time — all three are build-time passes
    for (marker <- Seq("vec_pq_codes", "vec_sub", "vec_best_cell"))
      assert(!plan.contains(marker),
        s"$marker ran at query time:\n${plan.take(1500)}")
    Seq("graft_res_plan", "graft_res_plan_codebook", "graft_res_plan_centroids")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("appended PQ index: bucket layout and no-encode plan survive appends; batch-associative") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-app").toString
    val qs = emb.filter($"vec_id" < 5)
    // index A: one append; index B: the same second batch split in two —
    // the codebook is batch-1's in both, so query results must be
    // IDENTICAL (append is batch-associative) and must include
    // neighbours from appended batches
    Similarity.writePqIndex(emb.filter($"vec_id" < 200), "vec_id",
      "embedding", "graft_pq_app_a", s"$dir/a", dim = 64, m = 4, ks = 16,
      buckets = 4)
    Similarity.appendPqIndex(spark, emb.filter($"vec_id" >= 200),
      "vec_id", "embedding", "graft_pq_app_a", dim = 64, m = 4, buckets = 4)
    Similarity.writePqIndex(emb.filter($"vec_id" < 200), "vec_id",
      "embedding", "graft_pq_app_b", s"$dir/b", dim = 64, m = 4, ks = 16,
      buckets = 4)
    Similarity.appendPqIndex(spark,
      emb.filter($"vec_id" >= 200 && $"vec_id" % 2 === 0),
      "vec_id", "embedding", "graft_pq_app_b", dim = 64, m = 4, buckets = 4)
    Similarity.appendPqIndex(spark,
      emb.filter($"vec_id" >= 200 && $"vec_id" % 2 === 1),
      "vec_id", "embedding", "graft_pq_app_b", dim = 64, m = 4, buckets = 4)
    assert(spark.table("graft_pq_app_a").count() ==
      spark.table("graft_pq_app_b").count())
    val qa = Similarity.pqTopKIndexed(spark, "graft_pq_app_a", qs,
      "vec_id", "embedding", dim = 64, k = 3, m = 4)
    val qb = Similarity.pqTopKIndexed(spark, "graft_pq_app_b", qs,
      "vec_id", "embedding", dim = 64, k = 3, m = 4)
    val a = qa.as[(Long, Long, Double, Int)].collect().toSet
    assert(a.nonEmpty && a == qb.as[(Long, Long, Double, Int)].collect().toSet,
      "append must be batch-associative")
    assert(a.exists(_._2 >= 200), "appended vectors never surfaced as neighbours")
    // the plan over the APPENDED table keeps the fresh-index shape:
    // still bucketed, still no nid exchange, still no encode stage
    qa.collect()
    val plan = qa.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"),
      s"append dropped the bucket layout:\n${plan.take(1200)}")
    val exchangeLines = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!exchangeLines.exists(_.contains("nid")),
      s"appended codes re-shuffled at query time:\n${exchangeLines.mkString("\n")}")
    assert(!plan.contains("vec_pq_codes"),
      s"encode ran at query time over the appended index:\n${plan.take(1500)}")
    Seq("graft_pq_app_a", "graft_pq_app_a_codebook",
        "graft_pq_app_b", "graft_pq_app_b_codebook")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("appended IVFADC index: bucket pruning survives appends; batch-associative") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-adc-app").toString
    val qs = emb.filter($"vec_id" < 5)
    Similarity.writeIvfadcIndex(emb.filter($"vec_id" < 200), "vec_id",
      "embedding", "graft_adc_app_a", s"$dir/a", dim = 64, nlist = 8,
      m = 4, ks = 16, buckets = 4)
    Similarity.appendIvfadcIndex(spark, emb.filter($"vec_id" >= 200),
      "vec_id", "embedding", "graft_adc_app_a", dim = 64, m = 4, buckets = 4)
    Similarity.writeIvfadcIndex(emb.filter($"vec_id" < 200), "vec_id",
      "embedding", "graft_adc_app_b", s"$dir/b", dim = 64, nlist = 8,
      m = 4, ks = 16, buckets = 4)
    Similarity.appendIvfadcIndex(spark,
      emb.filter($"vec_id" >= 200 && $"vec_id" % 2 === 0),
      "vec_id", "embedding", "graft_adc_app_b", dim = 64, m = 4, buckets = 4)
    Similarity.appendIvfadcIndex(spark,
      emb.filter($"vec_id" >= 200 && $"vec_id" % 2 === 1),
      "vec_id", "embedding", "graft_adc_app_b", dim = 64, m = 4, buckets = 4)
    val qa = Similarity.ivfadcTopKIndexed(spark, "graft_adc_app_a", qs,
      "vec_id", "embedding", dim = 64, k = 3, nprobe = 4, m = 4)
    val qb = Similarity.ivfadcTopKIndexed(spark, "graft_adc_app_b", qs,
      "vec_id", "embedding", dim = 64, k = 3, nprobe = 4, m = 4)
    val a = qa.as[(Long, Long, Double, Int)].collect().toSet
    assert(a.nonEmpty && a == qb.as[(Long, Long, Double, Int)].collect().toSet,
      "append must be batch-associative")
    qa.collect()
    val plan = qa.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"),
      s"append dropped the bucket layout:\n${plan.take(1200)}")
    assert(selectedBuckets(plan).isDefined,
      s"bucket pruning lost after append:\n${plan.take(1500)}")
    assert(!plan.contains("vec_pq_codes"),
      s"encode ran at query time over the appended index:\n${plan.take(1500)}")
    Seq("graft_adc_app_a", "graft_adc_app_a_codebook", "graft_adc_app_a_centroids",
        "graft_adc_app_b", "graft_adc_app_b_codebook", "graft_adc_app_b_centroids")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("filtered indexed IVF: predicate composes with bucket pruning") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-fplan").toString
    Similarity.writeIvfIndex(emb, "vec_id", "embedding",
      "graft_ivf_fplan", s"$dir/idx", nlist = 8, buckets = 8)
    val q = Similarity.ivfTopKIndexed(spark, "graft_ivf_fplan",
      emb.filter($"vec_id" === 1), "vec_id", "embedding", k = 3,
      nprobe = 2, pred = col("nid") % 3 === 0)
    val rows = q.as[(Long, Long, Double, Int)].collect()
    // the attribute slice holds on every result, and restricting
    // candidates must not disturb the bucket-pruned scan shape
    assert(rows.nonEmpty && rows.forall(_._2 % 3 == 0))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), plan.take(1200))
    val sel = selectedBuckets(plan)
    assert(sel.isDefined && sel.get._1 < sel.get._2,
      s"bucket pruning lost under the filter:\n${plan.take(1500)}")
    Seq("graft_ivf_fplan", "graft_ivf_fplan_centroids")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("filtered indexed IVFADC (the serving shape): filter and bucket pruning share one scan") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-adc-fplan").toString
    Similarity.writeIvfadcIndex(emb, "vec_id", "embedding",
      "graft_adc_fplan", s"$dir/idx", dim = 64, nlist = 8, m = 4,
      ks = 16, buckets = 8)
    val q = Similarity.ivfadcTopKIndexed(spark, "graft_adc_fplan",
      emb.filter($"vec_id" < 5), "vec_id", "embedding", dim = 64, k = 3,
      nprobe = 4, m = 4, pred = col("nid") % 3 === 0)
    val rows = q.as[(Long, Long, Double, Int)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 % 3 == 0))
    val plan = q.queryExecution.executedPlan.toString
    // the r13 gap: `pred` existed only on the 4×-larger raw-vector
    // index — on the CODE-TABLE path the attribute slice must compose
    // with the probed-cell bucket pruning in the SAME FileSourceScan
    val scanLine = plan.linesIterator
      .filter(_.contains("FileScan"))
      .find(_.contains("SelectedBucketsCount"))
    assert(scanLine.isDefined, s"no bucket-pruned scan:\n${plan.take(1500)}")
    assert(scanLine.get.contains("nid"),
      s"attribute filter missing from the pruned codes scan:\n${scanLine.get}")
    val sel = selectedBuckets(plan)
    assert(sel.isDefined && sel.get._1 < sel.get._2,
      s"bucket pruning lost under the filter:\n${plan.take(1500)}")
    // still no encode/assignment at query time
    for (marker <- Seq("vec_pq_codes", "vec_best_cell"))
      assert(!plan.contains(marker), s"$marker ran at query time")
    Seq("graft_adc_fplan", "graft_adc_fplan_codebook",
        "graft_adc_fplan_centroids")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("indexed BM25: term-bucket-pruned postings scan, no corpus term explode") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-plan").toString
    // 32 term buckets against a SINGLE 8-token query: ≤ 8 distinct
    // probed terms can select at most 8 buckets, so a pruned subset is
    // guaranteed (3 queries × 8 tokens against 8 buckets covered all of
    // them — pruning held but the subset assertion was vacuous)
    graft.operators.Retrieval.writeBm25Index(docs, "doc_id", "text",
      "graft_bm25_plan", s"$dir/idx", buckets = 32)
    val qs = docs.filter($"doc_id" < 1)
      .select($"doc_id",
        concat_ws(" ", slice(split($"text", " "), 1, 8)).as("qtext"))
    val q = graft.operators.Retrieval.bm25TopKIndexed(spark,
      "graft_bm25_plan", qs, "doc_id", "qtext", k = 5)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // positive control: a corpus term explode plans as Generate — the
    // marker whose absence below is the claim must be live
    val sessionPlan = docs.select($"doc_id",
        explode(graft.operators.TextOps.words($"text")).as("term"))
      .queryExecution.executedPlan.toString
    assert(sessionPlan.contains("Generate explode"),
      s"positive control lost:\n${sessionPlan.take(1200)}")
    // the indexed plan never explodes or re-aggregates the corpus: the
    // only Generate is the 8-token query side
    val generates = plan.linesIterator
      .filter(_.contains("Generate explode")).toSeq
    assert(generates.forall(_.contains("qtext")),
      s"corpus explode at query time:\n${generates.mkString("\n")}")
    // the query-term literal In reaches the postings scan and prunes
    // term buckets
    val sel = selectedBuckets(plan)
    assert(sel.isDefined && sel.get._1 < sel.get._2,
      s"no term-bucket pruning:\n${plan.take(1500)}")
    Seq("graft_bm25_plan", "graft_bm25_plan_dl", "graft_bm25_plan_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  /** part-* data files under a catalog table's current location. */
  private def dataFiles(table: String): Seq[String] = {
    val loc = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table)).location
    val d = new java.io.File(loc)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("part-")).map(_.getName).toSeq
  }

  test("compacted index: value-identical, ≤ buckets files, pruned no-encode plan intact") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-adc-cmp").toString
    val qs = emb.filter($"vec_id" < 5)
    val buckets = 4
    Similarity.writeIvfadcIndex(emb.filter($"vec_id" < 150), "vec_id",
      "embedding", "graft_adc_cmp", s"$dir/idx", dim = 64, nlist = 8,
      m = 4, ks = 16, buckets = buckets)
    // three append batches: each adds a file per non-empty bucket, the
    // recurring-crawl growth compaction exists to undo
    for ((lo, hi) <- Seq((150, 250), (250, 350), (350, Int.MaxValue)))
      Similarity.appendIvfadcIndex(spark,
        emb.filter($"vec_id" >= lo && $"vec_id" < hi),
        "vec_id", "embedding", "graft_adc_cmp", dim = 64, m = 4,
        buckets = buckets)
    assert(dataFiles("graft_adc_cmp").size > buckets,
      s"appends should multiply files, got ${dataFiles("graft_adc_cmp")}")
    def query() = Similarity.ivfadcTopKIndexed(spark, "graft_adc_cmp", qs,
      "vec_id", "embedding", dim = 64, k = 3, nprobe = 4, m = 4)
    val before = query().as[(Long, Long, Double, Int)].collect().toSeq.sorted
    assert(before.nonEmpty)

    Similarity.compactIndex(spark, "graft_adc_cmp")
    assert(dataFiles("graft_adc_cmp").size <= buckets,
      s"compaction left ${dataFiles("graft_adc_cmp").size} files for $buckets buckets")
    val q2 = query()
    assert(q2.as[(Long, Long, Double, Int)].collect().toSeq.sorted == before,
      "compaction changed query results")
    // the query-plan contract survives: bucketed scan, probed-cell
    // bucket pruning, no encode/assignment stage
    q2.collect()
    val plan = q2.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), plan.take(1200))
    assert(selectedBuckets(plan).isDefined,
      s"bucket pruning lost after compaction:\n${plan.take(1500)}")
    for (marker <- Seq("vec_pq_codes", "vec_best_cell"))
      assert(!plan.contains(marker),
        s"$marker ran at query time after compaction:\n${plan.take(1500)}")

    // compaction is idempotent and re-runnable: the staging suffix
    // ping-pongs instead of growing, a second append+compact cycle
    // stays value-identical
    Similarity.compactIndex(spark, "graft_adc_cmp")
    assert(dataFiles("graft_adc_cmp").size <= buckets)
    assert(query().as[(Long, Long, Double, Int)].collect().toSeq.sorted == before,
      "re-compaction changed query results")
    val loc = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("graft_adc_cmp"))
      .location.toString
    assert(loc.endsWith("__c1") || loc.endsWith("__c2"),
      s"staging suffix should ping-pong, got $loc")
    Seq("graft_adc_cmp", "graft_adc_cmp_codebook", "graft_adc_cmp_centroids")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
