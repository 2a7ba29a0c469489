package graft

import org.apache.spark.sql.functions._

import graft.operators._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join ≡ naive theta join") {
    val points = Seq(1L, 5L, 64L, 65L, 128L, 500L, 1000L).toDF("p")
    val intervals = Seq((1, 0L, 10L), (2, 60L, 70L), (3, 100L, 600L))
      .toDF("iv", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 64)
      .select("iv", "p").as[(Int, Long)].collect().toSet
    val want = intervals.crossJoin(points)
      .where(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("iv", "p").as[(Int, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("range semi joins ≡ naive, inverted intervals dropped, dup points kept once") {
    // p=64 appears twice (semi keeps each row once per input row);
    // (9, 700, 600) is inverted — must not match and must not blow up
    val points = Seq(1L, 5L, 64L, 64L, 65L, 128L, 500L, 1000L).toDF("p")
    val intervals = Seq((1, 0L, 10L), (2, 60L, 70L), (3, 100L, 600L), (9, 700L, 600L))
      .toDF("iv", "lo", "hi")
    val gotPts = RangeJoin.pointsInAnyInterval(points, intervals, "p", "lo", "hi", 64)
      .as[Long].collect().toSeq.sorted
    val wantPts = points.join(intervals,
        col("p") >= col("lo") && col("p") <= col("hi"), "left_semi")
      .as[Long].collect().toSeq.sorted
    assert(gotPts == wantPts && gotPts.count(_ == 64L) == 2)
    val gotIvs = RangeJoin.intervalsWithAnyPoint(intervals, points, "p", "lo", "hi", 64)
      .select("iv").as[Int].collect().toSet
    val wantIvs = intervals.join(points,
        col("p") >= col("lo") && col("p") <= col("hi"), "left_semi")
      .select("iv").as[Int].collect().toSet
    assert(gotIvs == wantIvs && !gotIvs.contains(9))
  }

  test("exact dedup groups: only duplicated digests, canonical keeper") {
    val docs = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("doc_id", "text")
    val got = Dedup.exactGroups(docs, "doc_id", "text")
      .select("n", "keep").as[(Long, Long)].collect().toSeq
    assert(got == Seq((3L, 1L)))
  }

  test("minhash LSH finds injected near-duplicates, skips distinct docs") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val near = base.replace("far", "quite")
    val other = "completely different words entirely unrelated content nothing shared here at all whatsoever ok then"
    val docs = Seq((1L, base), (2L, near), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", numPerm = 32,
      bands = 16, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs at hamming 0; pairs verified by popcount") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    val sigs = Dedup.simhash64(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("ngram jaccard: identical docs at 1.0") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w v u"))
      .toDF("doc_id", "text")
    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 1.0)))
  }

  test("prefix-filtered jaccard ≡ naive inverted-index join on real docs") {
    val docs = Tables.documents(spark, sf)
    val fast = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6)
      .as[(Long, Long, Double)].collect().toSet
    val naive = Dedup.ngramJaccardPairsNaive(docs, "doc_id", "text", 3, 0.6)
      .as[(Long, Long, Double)].collect().toSet
    assert(fast == naive)
    assert(naive.nonEmpty, "sf0.001 documents should contain near-dups at 0.6")
  }

  test("cosine: self-similarity 1.0, orthogonal 0.0") {
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 2.0f)), (3L, Seq(2.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(df, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 3L)))
    val top = Similarity.bruteForceTopK(df, df.filter($"vec_id" === 1), "vec_id",
      "embedding", 2).select("nid", "rank").as[(Long, Int)].collect().toSet
    assert(top == Set((3L, 1), (2L, 2)))
  }

  test("LSH topk is a subset of brute-force candidates with same scoring") {
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter($"vec_id" < 3)
    val lsh = Similarity.lshTopK(emb, qs, "vec_id", "embedding", 64, 3, nbits = 4)
      .select("qid", "nid", "sim").as[(Long, Long, Double)].collect()
    val brute = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 2000)
      .select("qid", "nid", "sim").as[(Long, Long, Double)].collect().toSet
    assert(lsh.nonEmpty)
    assert(lsh.forall(brute.contains), "LSH scores must agree with exact scores")
  }

  test("IVF topk: scores agree with exact cosine; probing recalls most of top-k") {
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter($"vec_id" < 5)
    val k = 3
    val ivf = Similarity.ivfTopK(emb, qs, "vec_id", "embedding", k,
      nlist = 8, nprobe = 4)
      .select("qid", "nid", "sim").as[(Long, Long, Double)].collect()
    val brute = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 2000)
      .select("qid", "nid", "sim").as[(Long, Long, Double)].collect().toSet
    assert(ivf.nonEmpty)
    assert(ivf.forall(brute.contains), "IVF scores must agree with exact scores")
    // recall floor: with half the cells probed, most true top-k survive
    val trueTop = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val hit = ivf.map(r => (r._1, r._2)).count(trueTop.contains)
    assert(hit >= trueTop.size / 2,
      s"IVF recall too low: $hit of ${trueTop.size}")
    // every corpus vector lands in exactly one cell
    val nCells = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8).count()
    assert(nCells == 8)
  }

  test("LSH near-dup pairs ⊆ exact near-dup pairs, with identical scores") {
    val emb = Tables.embeddings(spark, sf)
    // 0.3: low enough that the sf0.001 corpus has pairs AND the banded
    // LSH keeps some of them (recall < 1 is expected and documented)
    val exact = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
      dim = 64, threshold = 0.3, nbits = 4, bands = 8)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty, "corpus should contain pairs above 0.3")
    assert(lsh.nonEmpty, "banded LSH should retain some pairs")
    assert(lsh.subsetOf(exact), "LSH pairs must carry exact cosine scores")
  }

  test("IVF index round-trip: indexed search ≡ in-query search, bucketed scan") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.writeIvfIndex(emb, "vec_id", "embedding",
      "graft_ivf_spec", s"$dir/idx", nlist = 8, buckets = 4)
    val qs = emb.filter($"vec_id" < 5)
    val indexed = Similarity.ivfTopKIndexed(spark, "graft_ivf_spec", qs,
      "vec_id", "embedding", k = 3, nprobe = 4)
    val direct = Similarity.ivfTopK(emb, qs, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 4)
    val a = indexed.as[(Long, Long, Double, Int)].collect().toSet
    val b = direct.as[(Long, Long, Double, Int)].collect().toSet
    assert(a.nonEmpty && a == b,
      "index round-trip must reproduce the in-query IVF results exactly")
    // the probe join reads the bucketed layout (no corpus-side exchange)
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), s"index scan not bucketed:\n$plan")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_spec")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_spec_centroids")
  }

  test("PQ index round-trip: indexed ADC ≡ in-query pqTopK, no encode at query time") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    Similarity.writePqIndex(emb, "vec_id", "embedding",
      "graft_pq_spec", s"$dir/idx", dim = 64, m = 4, ks = 16, buckets = 4)
    val qs = emb.filter($"vec_id" < 5)
    val indexed = Similarity.pqTopKIndexed(spark, "graft_pq_spec", qs,
      "vec_id", "embedding", dim = 64, k = 3, m = 4)
    val direct = Similarity.pqTopK(emb, qs, "vec_id", "embedding",
      dim = 64, k = 3, m = 4, ks = 16)
    val a = indexed.as[(Long, Long, Double, Int)].collect().toSet
    val b = direct.as[(Long, Long, Double, Int)].collect().toSet
    assert(a.nonEmpty && a == b,
      "PQ index round-trip must reproduce the in-query ADC results exactly")
    val plan = indexed.queryExecution.executedPlan.toString
    // the code relation reads the bucketed layout...
    assert(plan.contains("Bucketed: true"), s"code scan not bucketed:\n$plan")
    // ...and the query plan contains NO corpus-encode stage: encoding is
    // an argmin-over-codebook aggregate keyed by (id, sub) — the only
    // aggregates at query time are the ADC (qid, nid) sum and the probe
    // prep; assert the encode stage's distinctive vec_pq_codes
    // projection is absent
    assert(!plan.contains("vec_pq_codes"),
      s"corpus encode ran at query time:\n$plan")
    // positive control: the same pattern MUST match the in-query path's
    // plan (which does encode) — a renamed encode column would otherwise
    // turn the absence assertion above into a vacuous pass
    val directPlan = direct.queryExecution.executedPlan.toString
    assert(directPlan.contains("vec_pq_codes"),
      s"encode-stage marker not found in the direct plan — pattern stale:\n${directPlan.take(1500)}")
    spark.sql("DROP TABLE IF EXISTS graft_pq_spec")
    spark.sql("DROP TABLE IF EXISTS graft_pq_spec_codebook")
  }

  test("BPE driver-dictionary trainer ≡ distributed fold, byte for byte") {
    val docs = Tables.documents(spark, sf)
    val fast = TextOps.bpeMerges(docs, "text", nMerges = 6)
      .as[(Int, String, String, Long)].collect().toSeq
    val dist = TextOps.bpeMerges(docs, "text", nMerges = 6,
      maxDriverVocab = 0) // force the distributed fold
      .as[(Int, String, String, Long)].collect().toSeq
    assert(fast == dist, s"fast=$fast\ndist=$dist")
    assert(fast.length == 6)
    // overlap + tie-break corner: 'aaa' counts (a,a) twice; ties order
    // by UTF-8 bytes of (l, r)
    val tiny = Seq((1L, "aaa bb bb"), (2L, "ab ab")).toDF("doc_id", "text")
    val f2 = TextOps.bpeMerges(tiny, "text", nMerges = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    val d2 = TextOps.bpeMerges(tiny, "text", nMerges = 3, maxDriverVocab = 0)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(f2 == d2, s"fast=$f2\ndist=$d2")
  }

  test("IVFADC: probing every cell reproduces plain PQ ADC; restricted probe sane") {
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter($"vec_id" < 5)
    // nprobe = nlist → the cell restriction is vacuous and IVFADC must
    // equal pqTopK exactly (same codebook, same ADC scores, same ties)
    val full = Similarity.ivfadcTopK(emb, qs, "vec_id", "embedding",
        dim = 64, k = 3, nlist = 8, nprobe = 8, m = 4, ks = 16)
      .as[(Long, Long, Double, Int)].collect().toSet
    val pq = Similarity.pqTopK(emb, qs, "vec_id", "embedding",
        dim = 64, k = 3, m = 4, ks = 16)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full.nonEmpty && full == pq,
      "nprobe=nlist IVFADC must equal unrestricted PQ ADC")
    // a restricted probe returns ≤ k per query and ADC-consistent scores
    val narrow = Similarity.ivfadcTopK(emb, qs, "vec_id", "embedding",
        dim = 64, k = 3, nlist = 8, nprobe = 2, m = 4, ks = 16)
      .as[(Long, Long, Double, Int)].collect()
    assert(narrow.nonEmpty)
    assert(narrow.groupBy(_._1).values.forall(_.length <= 3))
    val pqSims = Similarity.pqTopK(emb, qs, "vec_id", "embedding",
        dim = 64, k = 1000, m = 4, ks = 16)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(narrow.forall(r => pqSims(r._1 -> r._2) == r._3),
      "cell restriction must filter candidates, never change ADC scores")
  }

  test("IVFADC index round-trip: indexed ≡ in-session, cell-bucketed, no rebuild") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfadc").toString
    Similarity.writeIvfadcIndex(emb, "vec_id", "embedding",
      "graft_ivfadc_spec", s"$dir/idx", dim = 64, nlist = 8, m = 4, ks = 16,
      buckets = 4)
    val qs = emb.filter($"vec_id" < 5)
    val indexed = Similarity.ivfadcTopKIndexed(spark, "graft_ivfadc_spec",
      qs, "vec_id", "embedding", dim = 64, k = 3, nprobe = 4, m = 4)
    val direct = Similarity.ivfadcTopK(emb, qs, "vec_id", "embedding",
      dim = 64, k = 3, nlist = 8, nprobe = 4, m = 4, ks = 16)
    val a = indexed.as[(Long, Long, Double, Int)].collect().toSet
    val b = direct.as[(Long, Long, Double, Int)].collect().toSet
    assert(a.nonEmpty && a == b,
      "IVFADC index round-trip must reproduce the in-session results")
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), s"code scan not bucketed:\n$plan")
    // no assignment (vec_best_cell argmax) and no encode (vec_pq_codes)
    // stage may appear at query time — both are build-time passes
    assert(!plan.contains("vec_pq_codes"),
      s"corpus encode ran at query time:\n$plan")
    spark.sql("DROP TABLE IF EXISTS graft_ivfadc_spec")
    spark.sql("DROP TABLE IF EXISTS graft_ivfadc_spec_codebook")
    spark.sql("DROP TABLE IF EXISTS graft_ivfadc_spec_centroids")
  }

  test("residual IVFADC: cosine-bounded scores, recall ≥ non-residual, indexed ≡ in-session") {
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter($"vec_id" < 10)
    val k = 5
    val resDf = Similarity.ivfadcResidualTopK(emb, qs, "vec_id", "embedding",
      dim = 64, k = k, nlist = 8, nprobe = 8, m = 4, ks = 16)
    val res = resDf.as[(Long, Long, Double, Int)].collect()
    assert(res.nonEmpty)
    // the residual score IS cos(q, centroid + r̂) — a true cosine, so
    // |sim| ≤ 1 (+fp slack); the non-residual global-codebook ADC
    // score has no such bound
    assert(res.forall(r => math.abs(r._3) <= 1.0 + 1e-9),
      s"reconstruction cosine out of [-1,1]: ${res.filter(r => math.abs(r._3) > 1.0 + 1e-9).mkString(",")}")
    // residuals spend the code budget on within-cell structure: recall
    // vs the exact top-k must not fall below the non-residual encoding
    // at identical (nlist, nprobe, m, ks) — the property that makes
    // by_residual the FAISS default (soft margin: tiny corpus)
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k)
    val plain = Similarity.ivfadcTopK(emb, qs, "vec_id", "embedding",
      dim = 64, k = k, nlist = 8, nprobe = 8, m = 4, ks = 16)
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(exact, approx)
        .agg(org.apache.spark.sql.functions.avg("recall")).head().getDouble(0)
    // score recall from the ALREADY-collected rows — re-executing the
    // residual pipeline here would double the suite's slowest operator
    val (rRes, rPlain) = (meanRecall(
      res.toSeq.toDF("qid", "nid", "sim", "rank")), meanRecall(plain))
    assert(rRes >= rPlain - 0.05,
      s"residual recall $rRes fell below non-residual $rPlain")
    // persisted index reproduces the in-session results bit-for-bit
    val dir = java.nio.file.Files.createTempDirectory("graft-adc-res").toString
    Similarity.writeIvfadcResidualIndex(emb, "vec_id", "embedding",
      "graft_adc_res_spec", s"$dir/idx", dim = 64, nlist = 8, m = 4,
      ks = 16, buckets = 4)
    val indexed = Similarity.ivfadcResidualTopKIndexed(spark,
      "graft_adc_res_spec", qs, "vec_id", "embedding", dim = 64, k = k,
      nprobe = 8, m = 4)
    assert(indexed.as[(Long, Long, Double, Int)].collect().toSet == res.toSet,
      "residual index round-trip must reproduce the in-session results")
    Seq("graft_adc_res_spec", "graft_adc_res_spec_codebook",
        "graft_adc_res_spec_centroids")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("refined-centroid IVF: scores are exact cosines, k per query, deterministic") {
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter($"vec_id" < 5)
    def run() = Similarity.ivfTopK(emb, qs, "vec_id", "embedding", k = 3,
        nlist = 8, nprobe = 4, refineIters = 2)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val got = run()
    assert(got.nonEmpty && got == run(),
      "refined-centroid IVF must be deterministic")
    assert(got.groupBy(_._1).values.forall(_.length <= 3))
    // probed-cell restriction filters candidates but never changes the
    // score: every returned sim is the exact cosine of its pair
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding",
        k = 1000).as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.forall(r => exact(r._1 -> r._2) == r._3),
      "refined IVF must score with exact cosine")
  }

  test("trained PQ codebook: deterministic across runs, recall not below sampled") {
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter($"vec_id" < 10)
    val k = 5
    // determinism: two independent trainings produce byte-equal results
    // (seeded init, fixed iters, 6dp-pinned means)
    def run() = Similarity.pqTopK(emb, qs, "vec_id", "embedding",
        dim = 64, k = k, m = 4, ks = 16, trainIters = 2)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val a = run()
    assert(a.nonEmpty && a == run(), "trained PQ must be deterministic")
    // Lloyd rounds move codewords toward the data: recall vs exact must
    // not fall below the sampled-codebook init (soft margin: tiny corpus)
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k)
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(exact, approx)
        .agg(org.apache.spark.sql.functions.avg("recall")).head().getDouble(0)
    val rTrained = meanRecall(Similarity.pqTopK(emb, qs, "vec_id",
      "embedding", dim = 64, k = k, m = 4, ks = 16, trainIters = 2))
    val rSampled = meanRecall(Similarity.pqTopK(emb, qs, "vec_id",
      "embedding", dim = 64, k = k, m = 4, ks = 16))
    assert(rTrained >= rSampled - 0.05,
      s"trained recall $rTrained fell below sampled $rSampled")
  }

  test("residual IVFADC append: batch-associative, appended rows retrievable") {
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter($"vec_id" < 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-adc-res-app").toString
    Similarity.writeIvfadcResidualIndex(emb.filter($"vec_id" < 200),
      "vec_id", "embedding", "graft_res_app_a", s"$dir/a", dim = 64,
      nlist = 8, m = 4, ks = 16, buckets = 4)
    Similarity.appendIvfadcResidualIndex(spark, emb.filter($"vec_id" >= 200),
      "vec_id", "embedding", "graft_res_app_a", dim = 64, m = 4, buckets = 4)
    Similarity.writeIvfadcResidualIndex(emb.filter($"vec_id" < 200),
      "vec_id", "embedding", "graft_res_app_b", s"$dir/b", dim = 64,
      nlist = 8, m = 4, ks = 16, buckets = 4)
    Similarity.appendIvfadcResidualIndex(spark,
      emb.filter($"vec_id" >= 200 && $"vec_id" % 2 === 0),
      "vec_id", "embedding", "graft_res_app_b", dim = 64, m = 4, buckets = 4)
    Similarity.appendIvfadcResidualIndex(spark,
      emb.filter($"vec_id" >= 200 && $"vec_id" % 2 === 1),
      "vec_id", "embedding", "graft_res_app_b", dim = 64, m = 4, buckets = 4)
    val qa = Similarity.ivfadcResidualTopKIndexed(spark, "graft_res_app_a",
      qs, "vec_id", "embedding", dim = 64, k = 3, nprobe = 8, m = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    val qb = Similarity.ivfadcResidualTopKIndexed(spark, "graft_res_app_b",
      qs, "vec_id", "embedding", dim = 64, k = 3, nprobe = 8, m = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(qa.nonEmpty && qa == qb, "residual append must be batch-associative")
    assert(qa.exists(_._2 >= 200), "appended vectors never surfaced")
    Seq("graft_res_app_a", "graft_res_app_a_codebook", "graft_res_app_a_centroids",
        "graft_res_app_b", "graft_res_app_b_codebook", "graft_res_app_b_centroids")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("text normalize: typographic folds, fold count, idempotent") {
    val docs = Seq(
      (1L, "a \u201Cquoted\u201D word"),
      (2L, "dash \u2014 here \u2013 too"),
      (3L, "nb\u00A0sp zw\u200Bsp be\u0007ll"),
      (4L, "already   plain  text "),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextOps.normalizeText(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "a \"quoted\" word", 2L)))
    assert(got(2L) == ((2L, "dash - here - too", 2L)))
    assert(got(3L) == ((3L, "nb sp zwsp bell", 3L)))
    assert(got(4L) == ((4L, "already plain text", 0L)))
    assert(got(5L) == ((5L, "", 0L)))
    // idempotent: a normalized corpus re-normalizes to itself
    val once = TextOps.normalizeText(docs, "doc_id", "text")
      .withColumnRenamed("norm_text", "text")
    val twice = TextOps.normalizeText(once, "id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    got.foreach { case (k, v) =>
      assert(twice(k)._2 == v._2 && twice(k)._3 == 0L) }
  }

  test("PQ incremental append: batched appends ≡ one append, codes complete") {
    val emb = Tables.embeddings(spark, sf)
    def build(name: String,
              appends: Seq[org.apache.spark.sql.DataFrame])
        : Set[(Long, Long, Double, Int)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-pqinc").toString
      Similarity.writePqIndex(emb.filter($"vec_id" < 250), "vec_id",
        "embedding", name, s"$dir/idx", dim = 64, m = 4, ks = 16, buckets = 4)
      appends.foreach(b => Similarity.appendPqIndex(spark, b, "vec_id",
        "embedding", name, dim = 64, m = 4, buckets = 4))
      val r = Similarity.pqTopKIndexed(spark, name,
          emb.filter($"vec_id" < 5), "vec_id", "embedding", dim = 64,
          k = 3, m = 4)
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(spark.table(name).count() == emb.count() * 4,
        "codes table must cover every vector x subspace")
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_codebook")
      r
    }
    val one = build("graft_pqinc_a",
      Seq(emb.filter($"vec_id" >= 250)))
    val two = build("graft_pqinc_b",
      Seq(emb.filter($"vec_id" >= 250 && $"vec_id" < 375),
        emb.filter($"vec_id" >= 375)))
    assert(one.nonEmpty && one == two,
      "append must be associative: same codebook, same codes")
  }

  test("IVFADC incremental append: batched ≡ one append, cells+codes complete") {
    val emb = Tables.embeddings(spark, sf)
    def build(name: String,
              appends: Seq[org.apache.spark.sql.DataFrame])
        : Set[(Long, Long, Double, Int)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-adcinc").toString
      Similarity.writeIvfadcIndex(emb.filter($"vec_id" < 250), "vec_id",
        "embedding", name, s"$dir/idx", dim = 64, nlist = 8, m = 4,
        ks = 16, buckets = 4)
      appends.foreach(b => Similarity.appendIvfadcIndex(spark, b,
        "vec_id", "embedding", name, dim = 64, m = 4, buckets = 4))
      val r = Similarity.ivfadcTopKIndexed(spark, name,
          emb.filter($"vec_id" < 5), "vec_id", "embedding", dim = 64,
          k = 3, nprobe = 8, m = 4)
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(spark.table(name).count() == emb.count() * 4,
        "every vector x subspace must carry a (cell, code) row")
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_codebook")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_centroids")
      r
    }
    val one = build("graft_adcinc_a", Seq(emb.filter($"vec_id" >= 250)))
    val two = build("graft_adcinc_b",
      Seq(emb.filter($"vec_id" >= 250 && $"vec_id" < 375),
        emb.filter($"vec_id" >= 375)))
    assert(one.nonEmpty && one == two,
      "append must be associative: fixed centroids + codebook")
  }

  test("quality apply: bins partition the corpus, stats sane, partition-stable") {
    val docs = Tables.documents(spark, sf)
    val w = Seq(-0.1, 0.2, 0.05, -0.3, 0.15, 0.1)
    val r = TextOps.applyQualityScore(docs, "doc_id", "text", w, nBins = 10)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(r.map(_._2).sum == docs.count(), "bins must partition the corpus")
    assert(r.forall(b => b._1 >= 0 && b._1 <= 9))
    assert(r.forall(b => b._3 <= b._2 && b._4 >= 0.0 && b._4 <= 1.0))
    // decimal mean sums + pinned bin arithmetic → identical at any
    // partitioning
    val r17 = TextOps.applyQualityScore(docs.repartition(17), "doc_id",
        "text", w, nBins = 10)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(r.sortBy(_._1).toSeq == r17.sortBy(_._1).toSeq)
  }

  test("kmeans refine: k cells survive, centroids move toward members, deterministic") {
    val emb = Tables.embeddings(spark, sf)
    val k = 4
    val refined = Similarity.kmeansRefine(emb, "vec_id", "embedding",
      k = k, iters = 2)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(refined.length == k)
    assert(refined.forall(_._2.length == 64))
    // deterministic: a second run yields bit-identical centroids
    val again = Similarity.kmeansRefine(emb, "vec_id", "embedding",
      k = k, iters = 2)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(refined.toSeq == again.toSeq)
    // refinement changes the seed (the seed vectors are corpus rows;
    // a coordinate mean over >1 member moves off the seed)
    val seeds = Similarity.ivfCentroids(emb, "vec_id", "embedding", k)
      .as[(Long, Seq[Float])].collect().toMap
    assert(refined.exists { case (cid, cv) =>
      seeds.get(cid).exists(sv =>
        sv.map(_.toDouble).zip(cv).exists { case (a, b) => math.abs(a - b) > 1e-4 }) })
  }

  test("duplicate spans: cross-doc windows counted, within-doc repeats not") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "again the quick brown fox jumps over a different dog"),
      // repeats ITS OWN 5-gram twice but shares nothing with 1/2
      (3L, "aa bb cc dd ee aa bb cc dd ee"),
      (4L, "too short")).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "doc_id", "text", w = 5)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // docs 1 and 2 share exactly one 5-token window:
    // "the quick brown fox jumps" (and the shifted "quick brown fox
    // jumps over") -> 2 duplicated windows each
    assert(out(1L)._1 == 2 && out(1L)._2 == 6)
    assert(out(2L)._1 == 2 && out(2L)._2 == 6)
    assert(out(1L)._3 == 0.3333)
    // doc 3's internal repetition is NOT a cross-document span
    assert(out(3L)._1 == 0 && out(3L)._2 == 6)
    // doc 4 has no full window at all -> absent
    assert(!out.contains(4L))
  }

  test("SemDeDup: within-cell pairs ⊆ exact pairs; drop side nearer its centroid") {
    val emb = Tables.embeddings(spark, sf)
    val sem = Similarity.semanticDedup(emb, "vec_id", "embedding",
      nlist = 4, threshold = 0.3)
      .select("cell", "keep_id", "drop_id", "sim")
      .as[(Long, Long, Long, Double)].collect()
    val exact = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.3)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s0) => (Set(a, b), s0) }.toMap
    assert(sem.nonEmpty, "corpus should contain within-cell pairs at 0.3")
    // every reported pair is a true near-dup with the exact cosine
    assert(sem.forall { case (_, k, dr, s0) =>
      exact.get(Set(k, dr)).contains(s0) })
    // cross-cell pairs are missed BY DESIGN: with few cells some pairs
    // survive, and the reported count never exceeds the exact count
    assert(sem.length <= exact.size)
    // the drop side is the member nearer its centroid (keep outliers):
    // recompute each member's centroid similarity and check orientation
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 4)
      .as[(Long, Seq[Float])].collect()
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    def centroidSim(id: Long): Double =
      cents.map { case (_, cv) => cos(vecs(id), cv) }.max
    sem.foreach { case (_, keep, drop, _) =>
      val (ck, cd) = (centroidSim(keep), centroidSim(drop))
      assert(cd > ck || (cd == ck && drop > keep),
        s"drop=$drop (csim $cd) must be nearer its centroid than keep=$keep ($ck)")
    }
  }

  test("int8 quantization: reconstruction within scale/2, search agrees with exact") {
    val emb = Tables.embeddings(spark, sf)
    // per-element: |x - q*scale| <= scale/2 (half-up rounding bound)
    val bad = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .join(emb.select(col("vec_id").as("id"), col("embedding")), "id")
      .select(explode(zip_with(col("embedding"),
        zip_with(col("qv"), array_repeat(col("qscale"), size(col("qv"))),
          (q, s) => q.cast("double") * s),
        (x, r) => abs(x.cast("double") - r) > col("qscale") * 0.5 + 1e-12)).as("viol"))
      .filter(col("viol")).count()
    assert(bad == 0L)
    // quantized top-1 mostly matches exact top-1 (64-dim, int8: tiny error)
    val exact = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 1)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    val quant = Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 1)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    assert(exact.keySet == quant.keySet)
    val agree = exact.count { case (q, n) => quant(q) == n }
    assert(agree >= exact.size - 2, s"quantized top-1 agreement $agree/${exact.size}")
  }

  test("PQ ANN: deterministic, k per query, picks beat random on true cosine") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 10)
    val pq = Similarity.pqTopK(emb, q, "vec_id", "embedding",
      dim = 64, k = 5, m = 4, ks = 16)
      .select("qid", "nid", "sim").as[(Long, Long, Double)].collect()
    assert(pq.nonEmpty && pq.forall { case (_, _, s) => s >= -1.5 && s <= 1.5 })
    // every query returns exactly k candidates, deterministically
    val byQ = pq.groupBy(_._1)
    assert(byQ.values.forall(_.length == 5))
    val again = Similarity.pqTopK(emb, q, "vec_id", "embedding",
      dim = 64, k = 5, m = 4, ks = 16)
      .select("qid", "nid", "sim").as[(Long, Long, Double)].collect()
    assert(pq.toSet == again.toSet)
    // PQ picks must beat random pairing on TRUE cosine: the corpus here
    // is uniform-random 64-dim (mean pair cosine ≈ 0), the worst case
    // for quantization — exact-recall assertions are meaningless, but a
    // working ADC still ranks genuinely-closer vectors higher on average
    val exactSim = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding",
        k = emb.count().toInt - 1)
      .select("qid", "nid", "sim").as[(Long, Long, Double)].collect()
      .map { case (a, b, s2) => (a, b) -> s2 }.toMap
    val pickedMean = pq.map { case (a, b, _) => exactSim(a -> b) }.sum / pq.length
    val corpusMean = exactSim.values.sum / exactSim.size
    assert(pickedMean > corpusMean + 0.02,
      s"PQ picks no better than random: picked=$pickedMean corpus=$corpusMean")
  }

  test("salted aggregation and join ≡ unsalted on skewed data") {
    // 90% of rows share one hot key
    val skewed = spark.range(10000)
      .selectExpr("CASE WHEN id % 10 < 9 THEN 0 ELSE id END AS k",
        "CAST(id AS DOUBLE) AS v")
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("n"))
      .as[(Long, Double, Long)].collect().toSet
    val salted = Salt.saltedSumCount(skewed, Seq("k"), "v", buckets = 8)
      .as[(Long, Double, Long)].collect().toSet
    assert(salted == direct)

    val dim = spark.range(20).selectExpr("id AS k", "concat('n', id) AS name")
    val j1 = skewed.join(dim, "k").agg(count(lit(1)), sum("v"))
      .as[(Long, Double)].head()
    val j2 = Salt.saltedJoin(skewed, dim, "k", buckets = 8)
      .agg(count(lit(1)), sum("v")).as[(Long, Double)].head()
    assert(j1 == j2)
  }

  test("clusters: transitive chains collapse to the component minimum") {
    // a 40-node path — pure one-hop propagation would need 39 rounds, so
    // converging inside the 25-round cap proves the pointer jumping works
    val path = (0L until 39L).map(i => (i, i + 1))
    val extra = Seq((100L, 101L), (101L, 102L), (200L, 201L))
    val pairs = (path ++ extra).toDF("id_a", "id_b")
    // driverSolveMaxEdges=0 forces the distributed rounds — the driver
    // union-find fast path is cross-validated against it below
    val got = Dedup.clusters(pairs, "id_a", "id_b", driverSolveMaxEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert((0L to 40L).forall(i => !got.contains(i) || got(i) == 0L))
    assert((0L to 39L).forall(i => got(i) == 0L))
    assert(Seq(100L, 101L, 102L).forall(got(_) == 100L))
    assert(Seq(200L, 201L).forall(got(_) == 200L))
    assert(got.size == 45) // every node appearing in a pair is labeled
  }

  test("clusters over real near-dup pairs: labels are closed under pairs") {
    val emb = Tables.embeddings(spark, sf)
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.3)
    val labels = Dedup.clusters(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val ps = pairs.select("id_a", "id_b").as[(Long, Long)].collect()
    assert(ps.nonEmpty)
    // both endpoints of every pair share a label, and labels are members
    assert(ps.forall { case (a, b) => labels(a) == labels(b) })
    assert(labels.values.toSet.subsetOf(labels.keySet))
    // each cluster's label is its minimum member
    labels.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keys.min == lbl)
    }
  }

  test("clusters is id-type generic: string ids (content digests) work") {
    val pairs = Seq(("d_b", "d_a"), ("d_b", "d_c"), ("d_x", "d_y"))
      .toDF("id_a", "id_b")
    val got = Dedup.clusters(pairs, "id_a", "id_b")
      .as[(String, String)].collect().toMap
    assert(got == Map("d_a" -> "d_a", "d_b" -> "d_a", "d_c" -> "d_a",
      "d_x" -> "d_x", "d_y" -> "d_x"))
    // the distributed rounds agree on string ids too
    val dist = Dedup.clusters(pairs, "id_a", "id_b", driverSolveMaxEdges = 0)
      .as[(String, String)].collect().toMap
    assert(dist == got)
  }

  test("clusters: driver union-find fast path ≡ distributed rounds") {
    val path = (0L until 39L).map(i => (i, i + 1))
    val extra = Seq((100L, 101L), (101L, 102L), (200L, 201L))
    val pairs = (path ++ extra).toDF("id_a", "id_b")
    val fast = Dedup.clusters(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.clusters(pairs, "id_a", "id_b", driverSolveMaxEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(fast == dist && fast.size == 45)
  }

  test("decontamination: only train docs sharing an eval n-gram flagged") {
    val train = Seq(
      (1L, "alpha beta gamma delta"),       // shares "alpha beta gamma"
      (2L, "epsilon zeta eta theta"),       // no overlap
      (3L, "x alpha beta gamma y"))         // shares, mid-document
      .toDF("doc_id", "text")
    val eval_ = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val got = Dedup.contaminated(train, eval_, "doc_id", "text", 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 3L -> 1L))
  }

  test("boilerplate strip: near-universal terms removed per group") {
    val docs = Seq(
      (1L, "nav a b", "g1"), (2L, "nav c d", "g1"), (3L, "nav e f", "g1"),
      (4L, "x y z", "g2"), (5L, "x q r", "g2"), (6L, "p q s", "g2"))
      .toDF("doc_id", "text", "source")
    val got = TextOps.boilerplateStrip(docs, "doc_id", "text", "source",
        dfFrac = 0.9)
      .select("doc_id", "n_tokens", "n_kept", "clean_text")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    // g1: "nav" in 3/3 docs > 0.9 → stripped; g2: "x" only 2/3 → kept
    assert(got(0) == ((1L, 3, 2, "a b")))
    assert(got(1) == ((2L, 3, 2, "c d")))
    assert(got(2) == ((3L, 3, 2, "e f")))
    assert(got(3) == ((4L, 3, 3, "x y z")))
    assert(got.map(_._2).sum == 18)
  }

  test("text ops: shingles, token counts, fingerprint stability") {
    val df = Seq((1L, "a  b c d"), (2L, "A  B c D")).toDF("doc_id", "text")
    val sh = df.select(TextOps.wordShingles($"text", 3).as("sh"))
      .as[Seq[String]].collect()
    assert(sh(0).size == 3) // 5 raw tokens ("a","","b","c","d") → 3 shingles
    val counts = df.select(TextOps.wsTokenCount($"text").as("n"))
      .as[Int].collect().toSeq
    assert(counts == Seq(4, 4))
    val fps = df.select(TextOps.fingerprint($"text").as("f")).as[String].collect()
    assert(fps(0) == fps(1)) // case+whitespace normalization
  }

  test("multimodal: payload schema + partition-batched stub decode") {
    import Multimodal._
    val docs = Tables.documents(spark, sf).limit(10)
    val media = withBinaryPayload(docs, "doc_id", "text")
    assert(media.schema.fieldNames.toSet == Set("doc_id", "payload", "meta"))
    assert(media.schema("payload").dataType.typeName == "binary")
    val rows = media.select($"doc_id".as("id"), $"payload").as[MediaRow]
    val feats = extractFeatures(spark, rows, dim = 8).collect()
    assert(feats.length == 10 && feats.forall(_.features.length == 8))
    // deterministic stub
    val again = extractFeatures(spark, rows, dim = 8).collect()
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("asof backward ≡ naive latest-at-or-before; left rows kept") {
    val left = Seq((1L, "u1", 10L), (2L, "u1", 20L), (3L, "u1", 5L),
      (4L, "u2", 50L), (5L, "u3", 7L))
      .toDF("event_id", "key", "t").withColumn("ts", timestamp_seconds($"t")).drop("t")
    val right = Seq(("u1", 10L, 1.0), ("u1", 15L, 2.0), ("u2", 60L, 3.0))
      .toDF("key", "rt", "price").withColumn("rts", timestamp_seconds($"rt")).drop("rt")
    val got = AsofJoin.asof(left, right, Seq("key"), "ts", "rts")
      .select($"event_id", $"price").as[(Long, Option[Double])].collect().toSet
    // naive oracle: per left row, max right ts <= left ts
    val want = left.as("l").join(right.as("r"),
        $"l.key" === $"r.key" && $"r.rts" <= $"l.ts", "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"l.event_id").orderBy($"r.rts".desc_nulls_last)))
      .filter($"rk" === 1)
      .select($"l.event_id", $"r.price").as[(Long, Option[Double])].collect().toSet
    assert(got == want && got.size == 5)
    assert(got.contains((1L, Some(1.0))))   // tie: rts == ts matches
    assert(got.contains((3L, None)))        // nothing at-or-before
    assert(got.contains((5L, None)))        // key absent on right
  }

  test("asof forward picks the earliest right row at-or-after") {
    val left = Seq((1L, "u1", 12L), (2L, "u1", 16L)).toDF("event_id", "key", "t")
      .withColumn("ts", timestamp_seconds($"t")).drop("t")
    val right = Seq(("u1", 15L, 2.0), ("u1", 10L, 1.0))
      .toDF("key", "rt", "price").withColumn("rts", timestamp_seconds($"rt")).drop("rt")
    val got = AsofJoin.asof(left, right, Seq("key"), "ts", "rts", "forward")
      .select($"event_id", $"price").as[(Long, Option[Double])].collect().toSet
    assert(got == Set((1L, Some(2.0)), (2L, None)))
  }

  test("frame sampling: exact frame fan-out, byte-accurate slices") {
    import Multimodal._
    val docs = Seq((1L, "a" * 130), (2L, "b" * 64), (3L, "c")).toDF("doc_id", "text")
    val frames = frameSample(withBinaryPayload(docs, "doc_id", "text"),
        "doc_id", "payload", frameBytes = 64, every = 2)
      .select($"doc_id", $"frame_no", length($"frame").as("len"))
      .as[(Long, Long, Int)].collect().toSet
    // doc1: frames 0,1,2 (64+64+2 bytes) sampled every 2 -> 0 and 2
    assert(frames == Set((1L, 0L, 64), (1L, 2L, 2), (2L, 0L, 64), (3L, 0L, 1)))
    val rs = resizeStub(Array.tabulate(100)(_.toByte), 10)
    assert(rs.length == 10 && rs(0) == 0 && rs(1) == 10)
    assert(resizeStub(Array[Byte](1, 2), 10).toSeq == Seq[Byte](1, 2))
  }

  test("PII scrub: redacts emails/IPs/phones, leaves clean text alone") {
    val docs = Seq(
      (1L, "write bob.smith+x@mail.example.org from 10.0.0.7 or +1-555-0142"),
      (2L, "no pii here just words and 3.14 decimals"),
      (3L, "two mails a@b.co c@d.io one ip 192.168.1.1")).toDF("doc_id", "text")
    val got = docs.select($"doc_id", TextOps.piiScrub($"text").as("c"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "write <EMAIL> from <IP> or <PHONE>")
    assert(got(2L) == "no pii here just words and 3.14 decimals")
    assert(got(3L) == "two mails <EMAIL> <EMAIL> one ip <IP>")
  }

  test("URL host extraction") {
    val urls = Seq("https://a.example.org/p/1", "http://b.net/x.js",
      "https://nopath.io").toDF("url")
    val hosts = urls.select(TextOps.urlHost($"url")).as[String].collect().toSeq
    assert(hosts == Seq("a.example.org", "b.net", "nopath.io"))
  }

  test("transitive closure: chain, diamond, cycle; no leaked cache blocks") {
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (11L, 13L), (12L, 13L),
      (20L, 21L), (21L, 20L)).toDF("src", "dst")
    val result = Closure.transitive(edges, "src", "dst")
    val got = result.as[(Long, Long)].collect().toSet
    val chain = Set((1L,2L),(1L,3L),(1L,4L),(1L,5L),(2L,3L),(2L,4L),(2L,5L),
      (3L,4L),(3L,5L),(4L,5L))
    val diamond = Set((10L,11L),(10L,12L),(10L,13L),(11L,13L),(12L,13L))
    val cycle = Set((20L,21L),(21L,20L),(20L,20L),(21L,21L))
    assert(got == chain ++ diamond ++ cycle)
    // the loop's per-round caches must all be released; only the returned
    // result's own persist may remain, and the caller can drop it
    result.unpersist(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.size == persistedBefore,
      "Closure.transitive leaked persisted blocks")
  }

  test("chunking: full coverage, overlap, short-doc single chunk") {
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")), (2L, "a b"))
      .toDF("doc_id", "text")
    val got = TextOps.chunkTokens(docs, "doc_id", "text", chunkSize = 4, overlap = 2)
      .select($"id", $"chunk_no", $"chunk_text").as[(Long, Int, String)]
      .collect().toSet
    assert(got == Set(
      (1L, 0, "w1 w2 w3 w4"), (1L, 1, "w3 w4 w5 w6"), (1L, 2, "w5 w6 w7 w8"),
      (1L, 3, "w7 w8 w9 w10"), (1L, 4, "w9 w10"),
      (2L, 0, "a b")))
  }

  test("bloom join ≡ plain join (long and string keys); pruning is a superset") {
    val fact = (1L to 2000L).map(k => (k, s"v$k")).toDF("fk", "payload")
    val dim = Seq((10L, "a"), (500L, "b"), (1999L, "c")).toDF("dk", "label")
    val got = BloomJoin.join(fact, "fk", dim, "dk", expectedItems = 1024)
      .select("fk", "label").as[(Long, String)].collect().toSet
    val want = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "label").as[(Long, String)].collect().toSet
    assert(got == want && want.size == 3)

    // pruned fact ⊇ matching fact, ⊊ fact (the filter actually prunes)
    val pruned = BloomJoin.pruneFact(fact, "fk", dim, "dk", 1024, fpp = 0.01)
    val n = pruned.count()
    assert(n >= 3 && n < 2000)

    // string keys probe the same UTF-8 bytes putString inserts
    val sfact = Seq("alpha", "beta", "gamma", "delta").toDF("sk")
    val sdim = Seq("beta", "delta").toDF("dk2")
    val sgot = BloomJoin.join(sfact, "sk", sdim, "dk2", expectedItems = 16)
      .select("sk").as[String].collect().toSet
    assert(sgot == Set("beta", "delta"))
  }

  test("bloom probe stays native: no false negatives on 10k keys") {
    val dim = (0L until 10000L by 7L).toDF("k")
    val bf = BloomJoin.keyBloom(dim, "k", expectedItems = 4096)
    (0L until 10000L by 7L).foreach(k => assert(bf.mightContainLong(k)))
  }

  test("bigram log-prob: word salad scores lower than repeated phrases") {
    // doc 1 repeats one bigram; doc 2 has the same unigrams shuffled into
    // unique bigrams — unigram LM can't tell them apart, bigram LM can
    val docs = Seq((1L, "the cat the cat the cat"),
      (2L, "the the cat cat the cat")).toDF("doc_id", "text")
    val bi = TextOps.bigramLogProb(docs, "doc_id", "text")
      .select($"id", $"logprob").as[(Long, Double)].collect().toMap
    val uni = TextOps.unigramLogProb(docs, "doc_id", "text")
      .select($"id", $"logprob").as[(Long, Double)].collect().toMap
    assert(math.abs(uni(1L) - uni(2L)) < 1e-9) // same unigram profile
    assert(bi(1L) > bi(2L))                    // bigram LM separates them
    // documents under 2 words are excluded
    val short = TextOps.bigramLogProb(
      Seq((3L, "one")).toDF("doc_id", "text"), "doc_id", "text")
    assert(short.count() == 0)
  }

  test("unigram log-prob: common-word docs score higher than rare-word docs") {
    // 'the' appears in every doc; doc 3 is all rare singleton words
    val docs = Seq((1L, "the the the"), (2L, "the the cat"),
      (3L, "axolotl quine zeugma")).toDF("doc_id", "text")
    val got = TextOps.unigramLogProb(docs, "doc_id", "text")
      .select($"id", $"logprob").as[(Long, Double)].collect().toMap
    // p(the)=5/9, p(cat)=1/9, p(rare)=1/9 each
    assert(got(1L) > got(2L) && got(2L) > got(3L))
    assert(math.abs(got(1L) - math.log(5.0 / 9.0)) < 1e-3)
    assert(math.abs(got(3L) - math.log(1.0 / 9.0)) < 1e-3)
  }

  test("incremental dedup: re-delivered content dropped, new content kept") {
    val old = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val fresh = Seq((10L, "alpha beta"),   // re-delivery of 1 under a new id
      (11L, "epsilon zeta"), (12L, "gamma delta"), (13L, "eta theta"))
      .toDF("doc_id", "text")
    val kept = Dedup.incrementalNew(old, fresh, "text", expectedOld = 1024)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 13L))
    // ≡ plain anti join (the bloom prune must not change results)
    val anti = fresh.join(old.select(md5($"text").as("h")).distinct(),
      md5(fresh("text")) === col("h"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == anti)
  }

  test("ANN recall audit: identical inputs → recall 1, disjoint → 0") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("qid", "nid")
    val same = Similarity.recallAtK(exact, exact)
      .select("qid", "recall").as[(Long, Double)].collect().toMap
    assert(same == Map(1L -> 1.0, 2L -> 1.0))
    val approx = Seq((1L, 11L), (1L, 99L), (2L, 98L), (2L, 97L))
      .toDF("qid", "nid")
    val got = Similarity.recallAtK(exact, approx)
      .select("qid", "n_exact", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1L, 0.5), (2L, 2L, 0L, 0.0)))
  }

  test("minhash incremental ≡ cross-slice minhashPairs; batch-only signatures") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val near = base.replace("far", "quite")
    val other = "completely different words entirely unrelated content nothing shared here at all whatsoever ok then"
    val old = Seq((1L, base), (2L, other)).toDF("doc_id", "text")
    val fresh = Seq((10L, near), (11L, "brand new unseen material with zero overlap against anything indexed before now")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("mh-idx").toString
    Dedup.writeMinhashIndex(old, "doc_id", "text", "mh_spec_idx", path,
      numPerm = 32, bands = 16)
    val got = Dedup.minhashIncremental(spark, "mh_spec_idx", fresh,
        "doc_id", "text", numPerm = 32, bands = 16, threshold = 0.3)
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L)))
    // ≡ in-query minhashPairs over the union, restricted to cross-slice
    val allPairs: Set[(Long, Long)] =
      Dedup.minhashPairs(old.unionByName(fresh), "doc_id", "text",
        numPerm = 32, bands = 16, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val all = allPairs.filter(p => p._1 < 10 && p._2 >= 10).map(p => (p._2, p._1))
    assert(got == all)
    spark.sql("DROP TABLE IF EXISTS mh_spec_idx")
  }

  test("deterministic shuffle: total order, partitioning-invariant, seed-sensitive") {
    val docs = (1L to 200L).toDF("doc_id")
    val a = TextOps.deterministicShuffle(docs, "doc_id", "s1", buckets = 8)
      .select("id", "global_pos").as[(Long, Long)].collect().toMap
    // a total order: 200 distinct positions
    assert(a.values.toSet.size == 200)
    // invariant under input partitioning (the training-resume property)
    val b = TextOps.deterministicShuffle(docs.repartition(13), "doc_id", "s1",
        buckets = 8)
      .select("id", "global_pos").as[(Long, Long)].collect().toMap
    assert(a == b)
    // a different seed produces a different order
    val c = TextOps.deterministicShuffle(docs, "doc_id", "s2", buckets = 8)
      .select("id", "global_pos").as[(Long, Long)].collect().toMap
    assert(a != c)
    // round-robin interleave: global_pos ≡ bucket (mod buckets)
    val rows = TextOps.deterministicShuffle(docs, "doc_id", "s1", buckets = 8)
      .select("bucket", "global_pos").as[(Long, Long)].collect()
    assert(rows.forall { case (bk, gp) => gp % 8 == bk })
  }

  test("duplicate frames: digests shared across payloads only") {
    val docs = Seq(
      (1L, "AAAABBBB"), // frames AAAA, BBBB
      (2L, "AAAACCCC"), // shares AAAA with doc 1
      (3L, "DDDDDDDD")) // self-repeats DDDD twice — NOT cross-doc
      .toDF("doc_id", "text")
    val frames = Multimodal.frameSample(
      Multimodal.withBinaryPayload(docs, "doc_id", "text"),
      "doc_id", "payload", frameBytes = 4, every = 1)
    val dup = Multimodal.duplicateFrames(frames, "doc_id")
      .select("n_docs", "n_frames", "first_doc")
      .as[(Long, Long, Long)].collect().toSeq
    assert(dup == Seq((2L, 2L, 1L))) // AAAA across docs 1,2; DDDD excluded
  }

  test("DSIR weights: target-like docs outweigh off-target docs") {
    // target = lang 'en' rows; doc 4 repeats target vocabulary, doc 5
    // repeats vocabulary that never appears in the target slice
    val docs = Seq(
      (1L, "the cat sat", "en"), (2L, "the dog ran", "en"),
      (3L, "le chat noir", "fr"),
      (4L, "the the cat", "xx"), (5L, "le le chat", "xx"))
      .toDF("doc_id", "text", "lang")
    val w = TextOps.dsirWeights(docs, "doc_id", "text",
        isTarget = $"lang" === "en", buckets = 32)
      .select($"id", $"log_weight").as[(Long, Double)].collect().toMap
    assert(w(4L) > w(5L))
    assert(w(1L) > w(3L))
    // every doc scored, token counts preserved
    assert(w.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("URL canonicalization: case, scheme, tracking params, trailing slash") {
    val urls = Seq(
      "HTTP://Site1.Example.ORG/page/9?utm_source=a#x",
      "http://site1.example.org/page/9/",
      "https://site1.example.org/page/9?fbclid=123&utm_campaign=c",
      "https://other.net/Path/Case",         // path case preserved
      "https://bare.io",                      // no path at all
      "https://bare.io/?utm_source=z").toDF("url")
    val got = urls.select(TextOps.urlCanonicalize($"url")).as[String].collect().toSeq
    assert(got(0) == "https://site1.example.org/page/9")
    assert(got(1) == "https://site1.example.org/page/9")
    assert(got(2) == "https://site1.example.org/page/9")
    assert(got(3) == "https://other.net/Path/Case")
    assert(got(4) == "https://bare.io")
    assert(got(5) == "https://bare.io")
  }

  test("chunk dedup: first corpus-order occurrence survives, docs reassemble") {
    val docs = Seq(
      (1L, "a b c d e f"),   // chunks "a b c", "d e f"
      (2L, "a b c x y z"),   // "a b c" is a dup of doc 1's first chunk
      (3L, "d e f a b c"),   // both chunks duplicated -> empty survivor
      (4L, "q r")            // short doc: single partial chunk
    ).toDF("doc_id", "text")
    val got = TextOps.chunkDedup(docs, "doc_id", "text", chunkWords = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 2L, "a b c d e f")))
    assert(got(2L) == ((2L, 1L, "x y z")))
    assert(got(3L) == ((2L, 0L, ""))) // fully-duplicated doc kept, emptied
    assert(got(4L) == ((1L, 1L, "q r")))
  }

  test("soft dedup weights: cluster members 1/|C|, singletons 1.0") {
    val universe = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b") // {1,2,3} + singles
    val got = Dedup.softWeights(universe, "id", Dedup.clusters(pairs, "id_a", "id_b"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((1L, 3L, 0.333333)))
    assert(got(2L) == ((1L, 3L, 0.333333)))
    assert(got(3L) == ((1L, 3L, 0.333333)))
    assert(got(4L) == ((4L, 1L, 1.0)))
    assert(got(5L) == ((5L, 1L, 1.0)))
    // total mass = number of distinct contents (2 clusters + ... here 1+2)
    assert(math.abs(got.values.map(_._3).sum - 2.999999) < 1e-6)
  }

  test("URL canonicalization is idempotent over randomized URL noise") {
    // one Spark pass over 200 seeded variants: canon(canon(x)) == canon(x)
    val rnd = new scala.util.Random(42)
    val urls = (0 until 200).map { i =>
      val scheme = if (rnd.nextBoolean()) "http" else "HTTPS"
      val host = s"H${rnd.nextInt(10)}.ExAmple.${if (rnd.nextBoolean()) "org" else "NET"}"
      val path = if (rnd.nextBoolean()) s"/P${rnd.nextInt(100)}/x" else ""
      val slash = if (rnd.nextBoolean()) "/" else ""
      val query = if (rnd.nextBoolean()) s"?utm_source=${rnd.nextInt(9)}&id=$i" else ""
      val frag = if (rnd.nextBoolean()) s"#s${rnd.nextInt(9)}" else ""
      s"$scheme://$host$path$slash$query$frag"
    }.toDF("url")
    val bad = urls.select(
        TextOps.urlCanonicalize($"url").as("c1"),
        TextOps.urlCanonicalize(TextOps.urlCanonicalize($"url")).as("c2"))
      .filter($"c1" =!= $"c2").count()
    assert(bad == 0)
  }

  test("chunk dedup conservation: survivors = distinct chunks, exactly once") {
    // random small-vocab corpus -> heavy chunk collisions; invariants:
    // every distinct chunk content survives exactly once corpus-wide,
    // and per-doc counts are consistent
    val rnd = new scala.util.Random(7)
    val vocab = Seq("a", "b", "c", "d", "e")
    val docs = (0L until 50L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.chunkDedup(docs, "doc_id", "text", chunkWords = 2)
      .as[(Long, Long, Long, String)].collect()
    assert(out.length == 50) // every doc present, even fully-duplicated ones
    assert(out.forall { case (_, nc, nk, _) => nk <= nc && nk >= 0 })
    // rebuild surviving chunks from each clean_text (2-word regrouping is
    // exact because survivors concatenate whole chunks in order; a doc's
    // final chunk may be 1 word — handled by grouped())
    val survivors = out.flatMap { case (_, _, nk, txt) =>
      if (txt.isEmpty) Nil
      else txt.split(" ").toSeq.grouped(2).map(_.mkString(" ")).toSeq
    }
    val allChunks = docs.as[(Long, String)].collect().flatMap { case (_, t) =>
      t.split(" ").toSeq.grouped(2).map(_.mkString(" ")).toSeq
    }
    assert(survivors.length == out.map(_._3).sum)
    // exactly-once: survivor multiset == distinct chunk set...
    assert(survivors.toSet == allChunks.toSet)
    // ...except chunk contents can legitimately repeat across a chunk
    // boundary only if they were distinct chunk instances; first-owner
    // uniqueness means no content appears twice among survivors
    assert(survivors.length == survivors.toSet.size)
  }

  test("priority dedup: most trusted copy survives, ties break on id") {
    val docs = Seq(
      (1L, "same content", "crawl"),
      (2L, "same content", "curated"),   // rank 1 -> the keeper
      (3L, "same content", "mirror"),
      (4L, "other content", "crawl"),
      (5L, "tie content", "crawl"),
      (6L, "tie content", "crawl")       // same rank as 5 -> id tie-break
    ).toDF("doc_id", "text", "source")
    val prio = when($"source" === "curated", 1)
      .when($"source" === "crawl", 2).otherwise(3)
    val got = Dedup.priorityKeep(docs, "doc_id", "text", prio)
      .select($"doc_id", $"priority", $"n_copies")
      .as[(Long, Int, Long)].collect().toSet
    assert(got == Set((2L, 1, 3L), (4L, 2, 1L), (5L, 2, 2L)))
  }

  test("training shards: one file per shard, deterministic membership") {
    val docs = (0L until 100L).map(i => (i, s"text$i", "en")).toDF("doc_id", "text", "lang")
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    graft.sinks.TrainingShards.writeJsonlShards(docs, "doc_id",
      Seq("text", "lang"), out, seed = "s1", shardRows = 25, buckets = 8)
    // one JSONL part file per shard directory
    val shardDirs = new java.io.File(out).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { dir =>
      val parts = dir.listFiles.filter(_.getName.endsWith(".json"))
      assert(parts.length == 1, s"${dir.getName}: ${parts.length} files")
    }
    // read-back: all rows present once, shard = pos/25, sizes bounded
    val back = spark.read.json(out)
      .select($"doc_id".cast("long"), $"global_pos".cast("long"),
        $"shard".cast("long"))
      .as[(Long, Long, Long)].collect()
    assert(back.length == 100 && back.map(_._1).toSet == (0L until 100L).toSet)
    assert(back.forall { case (_, pos, sh) => pos / 25 == sh })
    val expected = TextOps.deterministicShuffle(docs, "doc_id", "s1", buckets = 8)
      .select($"id", $"global_pos").as[(Long, Long)].collect().toMap
    assert(back.forall { case (id, pos, _) => expected(id) == pos })
    assert(back.groupBy(_._3).values.forall(_.length <= 25))
    // idempotent re-write (mode overwrite): same manifest
    val m1 = graft.sinks.TrainingShards.manifest(spark, out)
      .as[(Long, Long, Long, Long)].collect().toSet
    graft.sinks.TrainingShards.writeJsonlShards(docs, "doc_id",
      Seq("text", "lang"), out, seed = "s1", shardRows = 25, buckets = 8)
    val m2 = graft.sinks.TrainingShards.manifest(spark, out)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(m1 == m2)
  }

  test("A/V sync: chunks attach the latest frame at-or-before, leaders null") {
    val frames = Seq((7L, 0L, 0L), (7L, 2L, 80L), (8L, 2L, 80L))
      .toDF("doc_id", "frame_no", "frame_pts")
    val chunks = Seq((7L, 0L, 0L), (7L, 3L, 69L), (7L, 4L, 92L), (8L, 0L, 0L))
      .toDF("doc_id", "chunk_no", "chunk_pts")
    val got = Multimodal.avSync(frames, chunks, "doc_id")
      .select($"doc_id", $"chunk_no", $"frame_no")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(got == Set(
      (7L, 0L, Some(0L)),   // tie at pts 0 matches (>= semantics)
      (7L, 3L, Some(0L)),   // 69 < 80: still frame 0
      (7L, 4L, Some(2L)),   // 92 >= 80: frame 2
      (8L, 0L, None)))      // chunk precedes doc 8's first frame
  }

  test("containment: true substring scores 1.0 even with the df cap active") {
    // doc 2 is a strict prefix of doc 1; docs 10..16 are pure boilerplate
    // ("p q r" — its shingle's df is 9 > maxDf=5, so it is pruned from
    // docs 1 and 2 as well). Scoring over the PRUNED space keeps the
    // substring at 1.0; the pre-fix unpruned denominator would have
    // scored it 5/6 ≈ 0.83 and dropped a true containment.
    val docs = (Seq(
      (1L, "p q r a b c d e f"),
      (2L, "p q r a b c d e"),
      (3L, "x y z w v u")) ++
      (10L to 16L).map(i => (i, "p q r"))).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.9, maxDf = 5)
      .as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((2L, 1L, 1.0))) // contained=2 (smaller side)
    // invariant sweep at threshold 0: scores all in (0,1], and the
    // all-boilerplate docs (empty pruned shingle set) produce no pairs
    val all = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.0, maxDf = 5)
      .as[(Long, Long, Double)].collect()
    assert(all.forall { case (_, _, c) => c > 0.0 && c <= 1.0 })
    assert(all.forall { case (a, b, _) => a < 10L && b < 10L })
  }

  test("null-text rows survive incremental dedup and chunk dedup") {
    // left_anti semantics: a null key never matches, so a null-text row
    // is NEW — it must come through the bloom split, not vanish in the
    // null-probe gap between filter(p) and filter(!p)
    val oldDocs = Seq((1L, "seen before"), (2L, "also seen")).toDF("id", "text")
    val newDocs = Seq((3L, "seen before"), (4L, "fresh"), (5L, null))
      .toDF("id", "text")
    val kept = Dedup.incrementalNew(oldDocs, newDocs, "text", expectedOld = 10)
      .select($"id").as[Long].collect().toSet
    assert(kept == Set(4L, 5L))
    // chunkDedup promises a row for EVERY input doc — null text folds to
    // the empty-text shape instead of dying at the posexplode
    val out = TextOps.chunkDedup(
        Seq((1L, "a b"), (2L, null)).toDF("doc_id", "text"),
        "doc_id", "text", chunkWords = 2)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(2L)._2 == 1L) // one (empty) chunk, like text=""
  }

  test("containment ≡ brute force on a random corpus (uncapped df)") {
    // 30 seeded small-vocab docs (heavy shingle collisions); with the df
    // cap disabled the operator must equal the set-theoretic definition
    // C = |S(a) ∩ S(b)| / min(|S(a)|, |S(b)|) computed directly in Scala
    val rnd = new scala.util.Random(11)
    val vocab = Seq("a", "b", "c", "d", "e", "f")
    val raw = (0L until 30L).map(i =>
      (i, Seq.fill(4 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val docs = raw.toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxDf = 1000000)
      .as[(Long, Long, Double)].collect().toSet
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val want = (for {
      (ia, ta) <- raw; (ib, tb) <- raw if ia < ib
      sa = shingles(ta); sb = shingles(tb) if sa.nonEmpty && sb.nonEmpty
      c = (sa & sb).size.toDouble / math.min(sa.size, sb.size) if c >= 0.5
    } yield {
      val (small, big) = if (sa.size < sb.size || (sa.size == sb.size)) (ia, ib) else (ib, ia)
      (small, big, math.rint(c * 1e6) / 1e6)
    }).toSet
    assert(got == want && want.nonEmpty)
  }

  test("bpe pair counts: overlapping adjacent pairs, rank ties on pair") {
    val docs = Seq((1L, "aaab ab"), (2L, "aaab")).toDF("doc_id", "text")
    // aaab×2 → aa,aa,ab each; ab×1 → ab: aa=4, ab=3
    val got = TextOps.bpePairCounts(docs, "text", k = 5)
      .as[(String, Long, Int)].collect().toSeq
    assert(got == Seq(("aa", 4L, 1), ("ab", 3L, 2)))
  }

  test("bpe merges: greedy non-overlapping fold, hand-computed 3 steps") {
    val docs = Seq((1L, "aaab aaab"), (2L, "ab")).toDF("doc_id", "text")
    // step1: aa(4) wins; aaab→[aa,a,b] (greedy takes pos 1, consumes 2)
    // step2: (a,b)=3 beats (aa,a)=2; [aa,a,b]→[aa,ab], [a,b]→[ab]
    // step3: (aa,ab)=2
    val got = TextOps.bpeMerges(docs, "text", nMerges = 3)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1, "a", "a", 4L), (2, "a", "b", 3L), (3, "aa", "ab", 2L)))
    // single-char words must not blow up the pair probe (sequence(1,0)
    // is descending in Spark — the corner the size guard covers)
    val tiny = TextOps.bpeMerges(Seq((1L, "a b a b")).toDF("doc_id", "text"),
      "text", nMerges = 1).as[(Int, String, String, Long)].collect()
    assert(tiny.isEmpty) // all words are single symbols: no pairs, no merges
  }

  test("prototype prune: per-cell drop counts, ranks, full coverage") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val total = emb.count()
    val kept = Similarity.prototypePrune(emb, "vec_id", "embedding",
        nlist = 4, dropFrac = 0.25)
      .as[(Long, Long, Double, Int, Long)].collect()
    val byCell = kept.groupBy(_._2)
    // every kept rank sits strictly past the dropped prototypical head,
    // and each cell keeps exactly n - floor(0.25 n)
    byCell.values.foreach { cell =>
      val n = cell.head._5
      assert(cell.length == n - math.floor(0.25 * n).toLong)
      assert(cell.forall(r => r._4 > math.floor(0.25 * n) && r._4 <= n))
      assert(cell.map(_._4).distinct.length == cell.length)
    }
    assert(byCell.values.map(_.head._5).sum >= total) // cells partition the corpus
    // dropFrac 0 keeps everything
    assert(Similarity.prototypePrune(emb, "vec_id", "embedding", 4, 0.0)
      .count() == total)
  }

  test("random projection: components are the hyperplane dot products") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = Similarity.randomProject(emb, "vec_id", "embedding",
        dim = 64, k = 4)
      .as[(Long, Seq[Double])].collect().map(r => r._1 -> r._2).toMap
    val raw = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toMap
    assert(got.nonEmpty && got.keySet == raw.keySet)
    got.foreach { case (id, pv) =>
      assert(pv.length == 4)
      pv.zipWithIndex.foreach { case (c, j) =>
        val plane = Similarity.hyperplane(j, 64)
        val want = raw(id).zip(plane).map { case (x, p) => x.toDouble * p }.sum
        assert(math.abs(c - math.rint(want * 1e4) / 1e4) < 1e-9, s"id=$id j=$j")
      }
    }
  }

  test("minhash containment estimate tracks exact containment (seeded corpus)") {
    // 40 base docs + a 60%-prefix variant of each: true containment 1.0
    // at near-dup scale (J ≈ 0.55-0.6 — inside banding recall). Grade
    // d21's estimate against d19's exact score pair-by-pair.
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 50).map(i => s"t$i")
    val base = (0L until 40L).map { i =>
      (i, Seq.fill(20 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docs = (base ++ base.map { case (i, t) =>
      (i + 1000, t.split(" ").take((t.split(" ").length * 0.6).toInt).mkString(" "))
    }).toDF("doc_id", "text")
    val exact = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.0, maxDf = 1000000)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val est = Dedup.containmentMinhashPairs(docs, "doc_id", "text",
        numPerm = 128, bands = 32, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(est.length >= 30) // the planted prefixes are recalled
    val errs = est.flatMap { case (a, b, c) =>
      exact.get((a, b)).orElse(exact.get((b, a))).map(e => math.abs(c - e))
    }
    assert(errs.length == est.length) // every estimated pair is a real pair
    // 128-perm estimates sit close to truth; mean error well under 0.1
    assert(errs.sum / errs.length < 0.1, f"mean err ${errs.sum / errs.length}%.3f")
    assert(errs.max < 0.3, f"max err ${errs.max}%.3f")
  }

  test("pair audit: precision/recall against an exact pair set") {
    val exact = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val approx = Seq((1L, 2L), (2L, 3L), (6L, 7L), (6L, 7L)).toDF("id_a", "id_b")
    val got = Dedup.pairAudit(exact, approx)
      .as[(Long, Long, Long, Double, Double)].collect()
    // approx dup row counted once; both = {(1,2),(2,3)}
    assert(got.toSeq == Seq((4L, 3L, 2L, 0.666667, 0.5)))
    val perfect = Dedup.pairAudit(exact, exact)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(perfect.toSeq == Seq((4L, 4L, 4L, 1.0, 1.0)))
  }

  test("minhash containment estimate: exact copy = 1.0, prefix ≈ 1, unrelated absent") {
    val docs = Seq(
      (1L, (0 until 40).map(i => s"w$i").mkString(" ")),
      (2L, (0 until 40).map(i => s"w$i").mkString(" ")), // exact copy of 1
      (3L, (0 until 34).map(i => s"w$i").mkString(" ")), // strict prefix of 1
      (4L, (0 until 40).map(i => s"x$i").mkString(" "))  // disjoint vocabulary
    ).toDF("doc_id", "text")
    val got = Dedup.containmentMinhashPairs(docs, "doc_id", "text",
        numPerm = 64, bands = 16, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // exact copy: every signature slot agrees, sizes tie → (id_a, id_b)
    assert(got((1L, 2L)) == 1.0)
    // true containment of the prefix is 1.0; the estimate must land near
    // it (Ĵ ≈ 0.84 → Ĉ ≈ 1 via the size correction), and the smaller
    // side is the contained one
    Seq((3L, 1L), (3L, 2L)).foreach { k =>
      assert(got.contains(k) && got(k) >= 0.8 && got(k) <= 1.0, got.toString)
    }
    // disjoint doc shares no 4-row band → never a candidate
    assert(!got.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("leak-free split: clusters atomic, buckets deterministic, cuts honored") {
    val universe = (1L to 200L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cl = Dedup.clusters(pairs, "id_a", "id_b")
    def run() = Dedup.leakFreeSplit(universe, "id", cl,
        seed = "s", pctTrain = 80, pctVal = 10)
      .as[(Long, Long, Long, String)].collect()
    val got = run()
    assert(got.length == 200 && got.map(_._1).toSet == (1L to 200L).toSet)
    val byId = got.map(r => r._1 -> r).toMap
    // every cluster member shares the representative AND the split
    assert(Seq(1L, 2L, 3L).map(byId(_)._2).toSet == Set(1L))
    assert(Seq(1L, 2L, 3L).map(byId(_)._4).toSet.size == 1)
    assert(Seq(10L, 11L).map(byId(_)._2).toSet == Set(10L))
    assert(Seq(10L, 11L).map(byId(_)._4).toSet.size == 1)
    // singletons represent themselves
    assert(byId(50L)._2 == 50L)
    // bucket is the documented md5 device; split honors the cut points
    got.foreach { case (_, rep, bucket, split) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(("s" + rep).getBytes("UTF-8")).map("%02x".format(_)).mkString
      val want = java.lang.Long.parseLong(hex.take(8), 16) % 100
      assert(bucket == want)
      assert(split == (if (bucket < 80) "train"
                       else if (bucket < 90) "val" else "test"))
    }
    // reproducible end to end
    assert(run().sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }

  test("interleaved pack: pts order, image-before-text ties, budget cuts") {
    val frames = Seq((1L, 0L, 0L), (1L, 2L, 80L))
      .toDF("doc_id", "frame_no", "frame_pts")
    val chunks = Seq((1L, 0L, 0L, 10L), (1L, 1L, 50L, 20L), (1L, 2L, 100L, 30L))
      .toDF("doc_id", "chunk_no", "chunk_pts", "n_tokens")
    val got = Multimodal.interleavedPack(frames, chunks, "doc_id",
        imageTokens = 16, budget = 32)
      .select($"kind", $"item_no", $"pts", $"n_tokens", $"seq_no")
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._3, r._1, r._2))
    // running token count BEFORE each item ÷ 32: 0,16,26,46,62
    assert(got.toSeq == Seq(
      ("image", 0L, 0L, 16L, 0L),   // 0/32 = 0; tie at pts 0: image first
      ("text", 0L, 0L, 10L, 0L),    // 16/32 = 0
      ("text", 1L, 50L, 20L, 0L),   // 26/32 = 0
      ("image", 2L, 80L, 16L, 1L),  // 46/32 = 1
      ("text", 2L, 100L, 30L, 1L))) // 62/32 = 1
    // invariant: seq_no is monotone non-decreasing along the stream order
    assert(got.map(_._5).sliding(2).forall(w => w(0) <= w(1)))
  }

  test("repetition signals: dup-word/top-bigram/dup-trigram fractions, edge docs") {
    val docs = Seq(
      (1L, "a a a a"),       // 3/4 dup words, "a a"×3/3 bigrams, "a a a"×2 → 1/2 dup trigrams
      (2L, "a b c d e"),     // all distinct; 4 unique bigrams → top 1/4
      (3L, "z"),             // no bigrams/trigrams → fractions 0
      (4L, "")               // splits to [""] → one word, fractions 0
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionSignals(docs, "doc_id", "text")
      .select($"doc_id", $"n_words", $"dup_word_frac", $"top_bigram_frac",
        $"dup_trigram_frac", $"keep")
      .as[(Long, Long, Double, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 0.75, 1.0, 0.5, false)))
    assert(got(2L) == ((2L, 5L, 0.0, 0.25, 0.0, false))) // 0.25 > 0.2 cut
    assert(got(3L) == ((3L, 1L, 0.0, 0.0, 0.0, true)))
    assert(got(4L) == ((4L, 1L, 0.0, 0.0, 0.0, true)))
  }

  test("pair audit: empty pair sets give the 1.0 conventions, never NULL") {
    val some = Seq((1L, 2L)).toDF("id_a", "id_b")
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    // no approx pairs → no false positives → precision 1.0; recall 0
    val p = Dedup.pairAudit(some, none)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(p.toSeq == Seq((1L, 0L, 0L, 1.0, 0.0)))
    // no exact pairs → nothing to find → recall 1.0; precision 0
    val r = Dedup.pairAudit(none, some)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(r.toSeq == Seq((0L, 1L, 0L, 0.0, 1.0)))
    val b = Dedup.pairAudit(none, none)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(b.toSeq == Seq((0L, 0L, 0L, 1.0, 1.0)))
  }

  test("repetition signals: Gopher min-word floor gates short docs on length") {
    val docs = Seq(
      (1L, "tiny clean doc"), // 3 words, repetition-free
      (2L, (0 until 60).map(i => s"w$i").mkString(" ")) // 60 distinct words
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionSignals(docs, "doc_id", "text", minWords = 50)
      .select($"doc_id", $"ok_min_words", $"keep")
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, false, false))) // gated on length, not repetition
    assert(got(2L) == ((2L, true, true)))
    // default floor 0 = gate off: the 3-word doc still fails the bigram
    // rule (top bigram share 0.5 > 0.2) — the documented spurious fail
    // the Gopher floor exists to pre-empt
    val dflt = TextOps.repetitionSignals(docs, "doc_id", "text")
      .select($"doc_id", $"ok_min_words", $"ok_top_bigram", $"keep")
      .as[(Long, Boolean, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(dflt(1L) == ((1L, true, false, false)))
    assert(dflt(2L) == ((2L, true, true, true)))
  }

  test("bpe encode: ordered merges applied greedily, indices addressable") {
    val docs = Seq((1L, "aaab ab"), (2L, "")).toDF("doc_id", "text")
    val got = TextOps.bpeEncode(docs, "doc_id", "text",
        Seq(("a", "a"), ("aa", "b")))
      .as[(Long, Long, Long, String)].collect().toSet
    // "aaab": a|a|a|b → merge(a,a) greedy left-to-right → aa|a|b;
    // merge(aa,b) finds no adjacency (aa,a)(a,b) → aa|a|b stands.
    // "ab": neither merge applies. Empty doc → no words, no rows.
    assert(got == Set(
      (1L, 0L, 0L, "aa"), (1L, 0L, 1L, "a"), (1L, 0L, 2L, "b"),
      (1L, 1L, 0L, "a"), (1L, 1L, 1L, "b")))
    // no merges = plain character split
    val raw = TextOps.bpeEncode(docs, "doc_id", "text", Seq.empty)
      .filter($"word_idx" === 1).as[(Long, Long, Long, String)]
      .collect().toSet
    assert(raw == Set((1L, 1L, 0L, "a"), (1L, 1L, 1L, "b")))
    // the direct (map-only) path is row-for-row the dictionary path
    val direct = TextOps.bpeEncode(docs, "doc_id", "text",
        Seq(("a", "a"), ("aa", "b")), dictionary = false)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(direct == got)
  }

  test("pii redact: staged email→ip→phone, no double counting, null-safe") {
    val docs = Seq(
      (1L, "mail bob@x.io or +4912345678 from 192.168.0.1 ok"),
      (2L, "a+12345678@x.com has a phone-looking local part"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextOps.piiRedact(docs, "doc_id", "text")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L,
      "mail <EMAIL> or <PHONE> from <IP> ok", 1L, 1L, 1L)))
    // the +digits inside the email local part is consumed by the email
    // stage and must not be re-counted as a phone
    assert(got(2L) == ((2L,
      "<EMAIL> has a phone-looking local part", 1L, 0L, 0L)))
    assert(got(3L) == ((3L, "", 0L, 0L, 0L)))
  }

  test("duplicate span removal: shared boilerplate cut from every copy, unique prose kept") {
    val boiler = "subscribe to our newsletter for more stuff" // 7 words
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler"),
      (2L, s"$boiler delta epsilon zeta"),
      (3L, "nothing shared here at all today")
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(docs, "doc_id", "text", w = 5)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // every 5-window inside the 7-word boilerplate occurs in both docs,
    // so all 7 boilerplate positions are covered in each; unique words
    // survive in order
    assert(got(1L) == ((1L, "alpha beta gamma", 10L, 7L)))
    assert(got(2L) == ((2L, "delta epsilon zeta", 10L, 7L)))
    assert(got(3L) == ((3L, "nothing shared here at all today", 6L, 0L)))
  }

  test("duplicate span removal ≡ in-memory reference on random corpora") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 3) {
      val docs = (1L to 12L).map(i =>
        (i, Seq.fill(rnd.nextInt(12) + 1)(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")))
      val w = 3
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val wins = toks.toSeq.flatMap { case (id, ws) =>
        if (ws.size >= w)
          (0 to ws.size - w).map(p => (id, p, ws.slice(p, p + w).mkString(" ")))
        else Nil
      }
      val dupFps = wins.groupBy(_._3)
        .filter(_._2.map(_._1).distinct.size >= 2).keySet
      val covered = wins.filter(x => dupFps(x._3))
        .flatMap(x => (x._2 until x._2 + w).map(p => (x._1, p))).toSet
      val want = toks.map { case (id, ws) =>
        val kept = ws.zipWithIndex
          .filterNot { case (_, i) => covered((id, i)) }.map(_._1)
        (id, kept.mkString(" "), ws.size.toLong,
          ws.indices.count(i => covered((id, i))).toLong)
      }.toSet
      val got = Dedup.removeDuplicateSpans(
          docs.toDF("doc_id", "text"), "doc_id", "text", w = 3)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("quality rules: each rule gates independently, ratios on the 4dp grid") {
    val fifty = (0 until 50).map(i => s"the a word$i").mkString(" ") // 150 words, 2 distinct stops
    val docs = Seq(
      (1L, fifty),                                  // passes everything
      (2L, "too short to pass the length floor"),   // < 50 words
      (3L, (0 until 60).map(i => s"####$i ...").mkString(" ")) // symbol storm
    ).toDF("doc_id", "text")
    val got = TextOps.qualityRules(docs, "doc_id", "text")
      .select($"doc_id", $"ok_words", $"ok_symbol", $"ok_stops", $"keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, true, true, true, true)))
    assert(got(2L) == ((2L, false, true, true, false)))
    assert(got(3L)._3 == false && got(3L)._5 == false) // symbol rule trips
  }

  test("quality classifier: deterministic weights, separable labels learned") {
    val docs = Seq.tabulate(40) { i =>
      // half the corpus passes the rules (long, stop-bearing, clean),
      // half fails on length — linearly separable on x1
      if (i % 2 == 0)
        (i.toLong, (0 until 30).map(j => s"the a and word$j").mkString(" "))
      else (i.toLong, "short junk")
    }.toDF("doc_id", "text")
    val r1 = TextOps.trainQualityClassifier(docs, "doc_id", "text",
      epochs = 3, lr = 1.0).collect()
    val r2 = TextOps.trainQualityClassifier(docs, "doc_id", "text",
      epochs = 3, lr = 1.0).collect()
    assert(r1.toSeq == r2.toSeq) // 6dp-rounded per-epoch weights are stable
    assert(r1.length == 3)
    // the n_words feature separates the classes → its weight moves
    // positive and accuracy reaches the separable optimum by epoch 3
    val last = r1.last
    assert(last.getDouble(2) > 0.0) // w1 (n_words/100)
    assert(last.getDouble(7) >= 0.9) // accuracy on the pre-step weights
  }

  test("quality classifier holdout: leak-free split, val column, partition-stable") {
    val docs = Tables.documents(spark, sf)
    val r = TextOps.trainQualityClassifier(docs, "doc_id", "text",
      epochs = 2, lr = 1.0, holdout = true).collect()
    assert(r.length == 2)
    assert(r.head.schema.fieldNames.toSeq ==
      Seq("epoch", "w0", "w1", "w2", "w3", "w4", "w5", "accuracy",
        "val_accuracy"))
    // decimal gradient sums are exact → identical weights at ANY
    // partitioning of the feature relation (the ADVICE flake class)
    val r1 = TextOps.trainQualityClassifier(docs.repartition(1), "doc_id",
      "text", epochs = 2, lr = 1.0, holdout = true).collect()
    val r17 = TextOps.trainQualityClassifier(docs.repartition(17), "doc_id",
      "text", epochs = 2, lr = 1.0, holdout = true).collect()
    assert(r1.map(_.toSeq).toSeq == r17.map(_.toSeq).toSeq)
    assert(r.map(_.toSeq).toSeq == r1.map(_.toSeq).toSeq)
    // exact duplicates land in one split: replicate the corpus with new
    // ids — every copy's split must equal its original's
    val slim = docs.select($"doc_id", $"text")
    val dup = slim.select(($"doc_id" + 100000).as("doc_id"), $"text")
    val both = TextOps.trainQualityClassifier(slim.unionByName(dup),
      "doc_id", "text", epochs = 1, lr = 1.0, holdout = true).collect()
    assert(both.length == 1) // runs clean; split reps are text-keyed
  }

  test("pq rerank: exact scores within the candidate set, candidates from ADC") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 5)
    val rer = Similarity.pqRerankTopK(emb, queries, "vec_id", "embedding",
        dim = 64, k = 3, kCand = 8)
      .as[(Long, Long, Double, Int)].collect()
    val cand = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
        dim = 64, k = 8).select("qid", "nid")
      .as[(Long, Long)].collect().toSet
    // every reranked pair came from the ADC candidate stage
    assert(rer.forall { case (q, n, _, _) => cand((q, n)) } && rer.nonEmpty)
    // the reranked score is the EXACT cosine (brute-force agreement)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", k = 1000)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(rer.forall { case (q, n, s, _) => brute((q, n)) == s })
    // ranks are dense 1..3 per query in descending sim
    rer.groupBy(_._1).values.foreach { rs =>
      assert(rs.sortBy(_._4).map(_._4).toSeq == Seq(1, 2, 3))
    }
  }

  test("verify scalar lint refuses the array-column shape that broke s10") {
    import org.apache.spark.sql.types._
    val bad = StructType(Seq(StructField("vec_id", LongType),
      StructField("pv", ArrayType(DoubleType))))
    val e = intercept[IllegalArgumentException] {
      Verify.assertScalarSchema("s10_random_projection", bad)
    }
    assert(e.getMessage.contains("pv: array<double>"))
    intercept[IllegalArgumentException] {
      Verify.assertScalarSchema("m", StructType(Seq(
        StructField("kv", MapType(StringType, LongType)))))
    }
    intercept[IllegalArgumentException] {
      Verify.assertScalarSchema("st", StructType(Seq(
        StructField("s", StructType(Seq(StructField("a", LongType)))))))
    }
    // a plain scalar row passes (the whole-gate sweep is its own test)
    Verify.assertScalarSchema("ok", StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", DoubleType), StructField("d", BooleanType))))
  }

  test("every registered driver query has a scalar output schema") {
    // the pre-commit pin the s10 regression lacked: building each gate
    // query's plan at sf0.001 and linting its schema means a future
    // array/map/struct output fails `sbt test`, not a driver round
    SparkEntry.queries.foreach { case (name, fn) =>
      Verify.assertScalarSchema(name,
        fn(spark, "/root/testdata/sf0.001").schema)
    }
  }

  test("balancedIvfCentroids: splits hot cells, conserves members, exact when probing all") {
    import graft.functions.VecExpressions.{vec_dot, vec_norm}
    // power-law corpus: cluster sizes 700/150/100/50 around four nearly
    // orthogonal directions — the heavy-tailed shape real embedding
    // corpora have and the md5-sampled seed cannot balance
    val dim = 8
    val corpus = spark.range(1000).select(col("id").as("vec_id"))
      .withColumn("c",
        when(col("vec_id") < 700, 0).when(col("vec_id") < 850, 1)
          .when(col("vec_id") < 950, 2).otherwise(3))
      .withColumn("embedding", array((0 until dim).map(i =>
        when(col("c") === i % 4, lit(10.0)).otherwise(lit(0.0)) +
          (pmod(hash(col("vec_id"), lit(i)), lit(7)) - lit(3))
            .cast("double") * 0.05): _*))
      .drop("c")
    import org.apache.spark.sql.expressions.Window
    def occupancy(cents: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val cn = cents.withColumn("cn", vec_norm(col("cv")))
      val w = Window.partitionBy("vec_id")
        .orderBy(col("csim").desc, col("cid").asc)
      corpus.crossJoin(broadcast(cn))
        .withColumn("csim", vec_dot(col("embedding"), col("cv")) /
          (vec_norm(col("embedding")) * col("cn")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy("cid").count()
        .as[(Long, Long)].collect().toMap
    }
    val nlist = 8
    val seed = Similarity.ivfCentroids(corpus, "vec_id", "embedding", nlist)
      .select(col("cid").cast("long").as("cid"),
        col("cv").cast("array<double>").as("cv"))
    val balanced = Similarity.balancedIvfCentroids(corpus, "vec_id",
      "embedding", nlist, maxFactor = 1.5, maxRounds = 8)
    val occSeed = occupancy(seed)
    val occBal = occupancy(balanced)
    // every vector lands in exactly one cell both ways
    assert(occSeed.values.sum == 1000 && occBal.values.sum == 1000,
      s"members lost/duplicated: seed=${occSeed.values.sum} bal=${occBal.values.sum}")
    // splitting happened and the hot cell shrank materially
    val nCells = balanced.select("cid").distinct().count()
    assert(nCells > nlist, s"no cells were split (still $nCells)")
    assert(occBal.values.max < occSeed.values.max,
      s"hot cell not reduced: ${occSeed.values.max} -> ${occBal.values.max}")
    // converged runs respect the cap (1.5 × mean over the final cells)
    assert(occBal.values.max <= (1.5 * 1000.0 / nCells).ceil.toLong,
      s"cap violated: max=${occBal.values.max} cells=$nCells")
    // the full entry point with every cell probed is EXACT — a vector
    // lost by a split round would surface here
    val qs = corpus.filter(col("vec_id") % 250 === 0)
    val bal = Similarity.ivfTopK(corpus, qs, "vec_id", "embedding",
        k = 3, nlist = nlist, nprobe = 4096, balanceFactor = 1.5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val exact = Similarity.bruteForceTopK(corpus, qs, "vec_id", "embedding",
        k = 3).as[(Long, Long, Double, Int)].collect().toSet
    assert(bal.nonEmpty && bal == exact)
  }

  test("balanced IVFADC index: probe-all ≡ unrestricted PQ ADC") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-adc-bal").toString
    Similarity.writeIvfadcIndex(emb, "vec_id", "embedding",
      "graft_adc_bal", s"$dir/idx", dim = 64, nlist = 8, m = 4, ks = 16,
      buckets = 4, balanceFactor = 1.5)
    val qs = emb.filter($"vec_id" < 5)
    // probing every (post-split) cell makes the cell restriction a
    // no-op: the balanced index must reproduce plain PQ ADC exactly —
    // a vector lost or double-indexed by the split would surface here
    val got = Similarity.ivfadcTopKIndexed(spark, "graft_adc_bal", qs,
        "vec_id", "embedding", dim = 64, k = 3, nprobe = 4096, m = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    val want = Similarity.pqTopK(emb, qs, "vec_id", "embedding",
        dim = 64, k = 3, m = 4, ks = 16)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got.nonEmpty && got == want)
    Seq("graft_adc_bal", "graft_adc_bal_codebook", "graft_adc_bal_centroids")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("bm25TopK ranks are dense/positive/monotone; rrfFuse matches hand arithmetic") {
    val docs = Tables.documents(spark, sf)
    val qs = docs.filter($"doc_id" < 3)
      .select($"doc_id",
        concat_ws(" ", slice(split($"text", " "), 1, 8)).as("qtext"))
    val res = Retrieval.bm25TopK(docs, qs, "doc_id", "text",
        "doc_id", "qtext", k = 5)
      .as[(Long, Long, Double, Int)].collect()
    assert(res.nonEmpty)
    res.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._4).toSeq
      assert(sorted.map(_._4) == (1 to rs.size).toList && rs.size <= 5)
      // BM25 scores are positive (the +1 inside Lucene's idf log) and
      // non-increasing with rank
      assert(sorted.forall(_._3 > 0))
      assert(sorted.sliding(2).forall {
        case Seq(a, b) => a._3 >= b._3; case _ => true })
    }
    // plan shape: the query-term set and query-bounded df reach the
    // postings via BROADCAST joins (nothing dictionary-sized shuffles
    // to the query side; the only corpus-keyed shuffle is the doc-length
    // join and the tf/dl aggregates themselves)
    val plan = Retrieval.bm25TopK(docs, qs, "doc_id", "text",
      "doc_id", "qtext", k = 5).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    // RRF hand arithmetic: doc 10 in both runs (ranks 1, 2) must beat
    // the single-run rank-1 docs; absent docs contribute nothing
    val runA = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("qid", "nid", "rank")
    val runB = Seq((0L, 10L, 2), (0L, 12L, 1)).toDF("qid", "nid", "rank")
    val fused = Retrieval.rrfFuse(Seq(runA, runB), k = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(fused.map(_._2).toSeq == Seq(10L, 12L, 11L))
    assert(math.abs(fused.head._3 - (1.0 / 61 + 1.0 / 62)) < 1e-6)
  }

  test("sq8TopK: near-exact recall, constant dims and truncated ranges handled") {
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 5)
    val sq = Similarity.sq8TopK(emb, qs, "vec_id", "embedding", dim = 64, k = 5)
    val rec = Similarity.recallAtK(exact, sq)
      .agg(avg("recall")).head().getDouble(0)
    // 8 bits per dim is near-exact by design (the FAISS SQ8 claim)
    assert(rec >= 0.8, s"SQ8 recall@5 too low: $rec")
    // persisted byte-code index: decode(encode(v)) ≡ recon(v), so the
    // indexed query must be bit-identical to the in-session one
    val dir = java.nio.file.Files.createTempDirectory("graft-sq8").toString
    Similarity.writeSq8Index(emb, "vec_id", "embedding",
      "graft_sq8_spec", s"$dir/idx", dim = 64, buckets = 4)
    val idx = Similarity.sq8TopKIndexed(spark, "graft_sq8_spec", qs,
        "vec_id", "embedding", dim = 64, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(idx == sq.as[(Long, Long, Double, Int)].collect().toSet)
    Seq("graft_sq8_spec", "graft_sq8_spec_ranges")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    // a constant dimension has delta = 0 — must reconstruct to its min,
    // not divide by zero
    val emb2 = emb.select($"vec_id",
      concat($"embedding", array(lit(1.0f))).as("embedding"))
    val sq2 = Similarity.sq8TopK(emb2, emb2.filter($"vec_id" < 3),
      "vec_id", "embedding", dim = 65, k = 3)
    assert(sq2.count() > 0)
  }

  test("localizeProbes: driver gate is byte-aware, not row-only (ADVICE r12)") {
    val probes = spark.range(64).select(
      col("id").as("qid"), (col("id") % 4).as("cell"),
      array((0 until 16).map(i => (col("id") + i).cast("double")): _*).as("qv"))
    // comfortably inside the default gate: localized relation + the
    // distinct probed cells, zero further jobs
    val ok = Similarity.localizeProbes(probes)
    assert(ok.df.count() == 64)
    assert(ok.cells.map(_.asInstanceOf[Long]).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    // the same 64 rows carry ~16 doubles each — a 1 KB byte gate must
    // trip even though the row bound (2^16 for array schemas) is far off
    val e = intercept[IllegalArgumentException] {
      Similarity.localizeProbes(probes, maxBytes = 1024L)
    }
    assert(e.getMessage.contains("bytes"), e.getMessage)
  }

  test("vector entry points accept non-float numeric embeddings (ADVICE r12)") {
    // array<int> corpora went through toDoubleVec/cast before the native
    // expressions landed; the isFloatArray contract must not regress the
    // public surface — numVec cast-widens exactly (int→double is exact)
    val ints = spark.range(50).select(col("id").as("vec_id"),
      array((0 until 8).map(i =>
        ((col("id") * 7 + i * 3) % 11 - 5).cast("int")): _*).as("embedding"))
    val dbls = ints.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val qi = ints.filter(col("vec_id") < 5)
    val qd = dbls.filter(col("vec_id") < 5)
    val ivfI = Similarity.ivfTopK(ints, qi, "vec_id", "embedding",
        k = 3, nlist = 4, nprobe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    val ivfD = Similarity.ivfTopK(dbls, qd, "vec_id", "embedding",
        k = 3, nlist = 4, nprobe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(ivfI.nonEmpty && ivfI == ivfD)
    val pqI = Similarity.pqTopK(ints, qi, "vec_id", "embedding",
        dim = 8, k = 3, m = 2, ks = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    val pqD = Similarity.pqTopK(dbls, qd, "vec_id", "embedding",
        dim = 8, k = 3, m = 2, ks = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(pqI.nonEmpty && pqI == pqD)
    val bfI = Similarity.bruteForceTopK(ints, qi, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    val bfD = Similarity.bruteForceTopK(dbls, qd, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(bfI.nonEmpty && bfI == bfD)
  }

  test("derby seed time accrues only on successful seeding") {
    import graft.engine.MgiDb
    MgiDb.drainSeedNanos() // clear anything a prior suite accrued
    intercept[Throwable] {
      MgiDb.conf(spark, "/nonexistent/graft-no-such-dir")
    }
    // a failed seed must leave the accumulator empty — Bench drains it
    // into the NEXT query's diag, so residue would misattribute harness
    // failure time to engine work
    assert(MgiDb.drainSeedNanos() == 0L)
  }

  test("persisted BM25 index: build+append ≡ in-session; corpus cache released") {
    spark.sharedState.cacheManager.clearCache()
    val docs = Tables.documents(spark, sf)
    val qs = docs.filter($"doc_id" < 3)
      .select($"doc_id",
        concat_ws(" ", slice(split($"text", " "), 1, 8)).as("qtext"))
    val want0 = Retrieval.bm25TopK(docs, qs, "doc_id", "text",
      "doc_id", "qtext", k = 5)
    val want = want0.as[(Long, Long, Double, Int)].collect().toSet
    // the corpus-sized inverted-index cache is RELEASED before return
    // (ADVICE r13: it used to leak one MEMORY_AND_DISK entry per call
    // for the session lifetime); only the |q|·k result stays persisted,
    // and dropping that leaves the cache manager empty
    want0.unpersist()
    assert(spark.sharedState.cacheManager.isEmpty,
      "bm25TopK left a lingering cache entry")
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-idx").toString
    Retrieval.writeBm25Index(docs.filter($"doc_id" < 250), "doc_id", "text",
      "graft_bm25_spec", s"$dir/idx", buckets = 4)
    Retrieval.appendBm25Index(spark, docs.filter($"doc_id" >= 250),
      "doc_id", "text", "graft_bm25_spec", buckets = 4)
    // stats recompute exactly across the append (integer-valued dl →
    // order-independent sums), df derives from the probed postings —
    // so the indexed scores are bit-identical to the in-session run
    // over the union corpus
    val q = Retrieval.bm25TopKIndexed(spark, "graft_bm25_spec", qs,
      "doc_id", "qtext", k = 5)
    assert(q.as[(Long, Long, Double, Int)].collect().toSet == want)
    Seq("graft_bm25_spec", "graft_bm25_spec_dl", "graft_bm25_spec_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("deleteFromBm25Index: scores ≡ an index built without the deleted docs") {
    val docs = Tables.documents(spark, sf)
    val qs = docs.filter($"doc_id" < 3)
      .select($"doc_id",
        concat_ws(" ", slice(split($"text", " "), 1, 8)).as("qtext"))
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-del").toString
    // reference: a fresh index that never saw the deleted docs — the
    // strong form of delete correctness, because BM25 deletes must
    // leave the SCORING model (df, N, avgdl), not just the candidates
    Retrieval.writeBm25Index(docs.filter($"doc_id" % 4 =!= 0), "doc_id",
      "text", "graft_bm25_ref", s"$dir/ref", buckets = 4)
    val want = Retrieval.bm25TopKIndexed(spark, "graft_bm25_ref", qs,
        "doc_id", "qtext", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val refStats = spark.table("graft_bm25_ref_stats")
      .as[(Double, Double)].head()
    // the full index with the same docs deleted afterwards
    Retrieval.writeBm25Index(docs, "doc_id", "text",
      "graft_bm25_d2", s"$dir/full", buckets = 4)
    Retrieval.deleteFromBm25Index(spark, "graft_bm25_d2",
      docs.filter($"doc_id" % 4 === 0).select("doc_id"), "doc_id")
    def query() = Retrieval.bm25TopKIndexed(spark, "graft_bm25_d2", qs,
        "doc_id", "qtext", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(query() == want, "pending-tombstone path diverged from the reduced build")
    assert(spark.table("graft_bm25_d2_stats").as[(Double, Double)].head()
      == refStats, "delete did not correct the corpus statistics")
    // physical apply: postings AND the _dl sidecar rewrite, tombstones
    // truncate, scores unchanged
    Retrieval.compactBm25Index(spark, "graft_bm25_d2")
    assert(spark.table("graft_bm25_d2_tombstones").isEmpty)
    assert(spark.table("graft_bm25_d2").filter($"doc" % 4 === 0).isEmpty)
    assert(spark.table("graft_bm25_d2_dl").filter($"doc" % 4 === 0).isEmpty)
    assert(query() == want, "post-compaction path diverged")
    Seq("graft_bm25_ref", "graft_bm25_ref_dl", "graft_bm25_ref_stats",
        "graft_bm25_d2", "graft_bm25_d2_dl", "graft_bm25_d2_stats",
        "graft_bm25_d2_tombstones")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("deleteFromIndex: tombstoned ids vanish pre- and post-compaction (FAISS remove_ids)") {
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter($"vec_id" < 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-del").toString
    Similarity.writePqIndex(emb, "vec_id", "embedding",
      "graft_pq_delspec", s"$dir/idx", dim = 64, m = 4, ks = 16, buckets = 4)
    def query(pred: org.apache.spark.sql.Column = lit(true)) =
      Similarity.pqTopKIndexed(spark, "graft_pq_delspec", qs,
          "vec_id", "embedding", dim = 64, k = 3, m = 4, pred = pred)
        .as[(Long, Long, Double, Int)].collect().toSet
    // FAISS remove_ids semantics: the trained quantizer is untouched,
    // the ids' rows stop being candidates — i.e. exactly the filtered
    // search over the undeleted index
    val want = query($"nid" % 5 =!= 0)
    assert(want.nonEmpty && want != query())
    Similarity.deleteFromIndex(spark, "graft_pq_delspec",
      emb.filter($"vec_id" % 5 === 0).select("vec_id"), "vec_id")
    assert(query() == want, "query-time anti-join path")
    // compaction applies the tombstones physically and truncates them;
    // results unchanged, no anti-join needed afterwards
    Similarity.compactIndex(spark, "graft_pq_delspec")
    assert(spark.table("graft_pq_delspec_tombstones").isEmpty,
      "tombstones must truncate once physically applied")
    assert(spark.table("graft_pq_delspec").filter($"nid" % 5 === 0).isEmpty,
      "compaction must drop tombstoned rows physically")
    assert(query() == want, "post-compaction path")
    // a second delete batch stacks on the compacted index
    Similarity.deleteFromIndex(spark, "graft_pq_delspec",
      emb.filter($"vec_id" % 5 === 1).select("vec_id"), "vec_id")
    val got = query()
    assert(got == query($"nid" % 5 =!= 0 && $"nid" % 5 =!= 1))
    assert(got.forall(r => r._2 % 5 != 0 && r._2 % 5 != 1))
    Seq("graft_pq_delspec", "graft_pq_delspec_codebook",
        "graft_pq_delspec_tombstones")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("tombstones are honored by the SQ8 and IVFADC families; a rebuild clears them") {
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter($"vec_id" < 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-del-fam").toString
    // SQ8: delete ≡ the filtered search that excludes the same ids
    Similarity.writeSq8Index(emb, "vec_id", "embedding",
      "graft_sq8_del", s"$dir/sq8", dim = 64, buckets = 4)
    def sq8(pred: org.apache.spark.sql.Column = lit(true)) =
      Similarity.sq8TopKIndexed(spark, "graft_sq8_del", qs,
          "vec_id", "embedding", dim = 64, k = 3, pred = pred)
        .as[(Long, Long, Double, Int)].collect().toSet
    val sqAll = sq8()
    val sqWant = sq8($"nid" % 5 =!= 0)
    Similarity.deleteFromIndex(spark, "graft_sq8_del",
      emb.filter($"vec_id" % 5 === 0).select("vec_id"), "vec_id")
    assert(sq8() == sqWant && sqWant != sqAll)
    // a REBUILD drops stale tombstones — the fresh index serves every id
    Similarity.writeSq8Index(emb, "vec_id", "embedding",
      "graft_sq8_del", s"$dir/sq8", dim = 64, buckets = 4)
    assert(sq8() == sqAll, "rebuild must clear stale tombstones")
    // IVFADC serving shape honors the same lifecycle
    Similarity.writeIvfadcIndex(emb, "vec_id", "embedding",
      "graft_adc_del", s"$dir/adc", dim = 64, nlist = 8, m = 4,
      ks = 16, buckets = 4)
    def adc(pred: org.apache.spark.sql.Column = lit(true)) =
      Similarity.ivfadcTopKIndexed(spark, "graft_adc_del", qs,
          "vec_id", "embedding", dim = 64, k = 3, nprobe = 4, m = 4,
          pred = pred)
        .as[(Long, Long, Double, Int)].collect().toSet
    val adcWant = adc($"nid" % 5 =!= 0)
    Similarity.deleteFromIndex(spark, "graft_adc_del",
      emb.filter($"vec_id" % 5 === 0).select("vec_id"), "vec_id")
    assert(adc() == adcWant && adcWant.nonEmpty)
    // ... and the by-residual serving path
    Similarity.writeIvfadcResidualIndex(emb, "vec_id", "embedding",
      "graft_res_del", s"$dir/res", dim = 64, nlist = 8, m = 4,
      ks = 16, buckets = 4)
    def res(pred: org.apache.spark.sql.Column = lit(true)) =
      Similarity.ivfadcResidualTopKIndexed(spark, "graft_res_del", qs,
          "vec_id", "embedding", dim = 64, k = 3, nprobe = 4, m = 4,
          pred = pred)
        .as[(Long, Long, Double, Int)].collect().toSet
    val resWant = res($"nid" % 5 =!= 0)
    Similarity.deleteFromIndex(spark, "graft_res_del",
      emb.filter($"vec_id" % 5 === 0).select("vec_id"), "vec_id")
    assert(res() == resWant && resWant.nonEmpty)
    Seq("graft_sq8_del", "graft_sq8_del_ranges", "graft_sq8_del_tombstones",
        "graft_adc_del", "graft_adc_del_codebook", "graft_adc_del_centroids",
        "graft_adc_del_tombstones", "graft_res_del",
        "graft_res_del_codebook", "graft_res_del_centroids",
        "graft_res_del_tombstones")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("filtered BM25 keeps Lucene filter-query semantics: scores unchanged inside the slice") {
    val docs = Tables.documents(spark, sf)
    val qs = docs.filter($"doc_id" < 3)
      .select($"doc_id",
        concat_ws(" ", slice(split($"text", " "), 1, 8)).as("qtext"))
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-filt").toString
    Retrieval.writeBm25Index(docs, "doc_id", "text",
      "graft_bm25_fspec", s"$dir/idx", buckets = 4)
    // unfiltered at a large k — the slice's docs appear with their
    // corpus-wide scores
    val full = Retrieval.bm25TopKIndexed(spark, "graft_bm25_fspec", qs,
        "doc_id", "qtext", k = 10000)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val filt = Retrieval.bm25TopKIndexed(spark, "graft_bm25_fspec", qs,
        "doc_id", "qtext", k = 5, pred = $"doc" % 3 === 0)
      .as[(Long, Long, Double, Int)].collect()
    assert(filt.nonEmpty && filt.forall(_._2 % 3 == 0))
    // the filter restricts candidates WITHOUT re-scoring: every
    // filtered hit carries exactly its unfiltered (corpus-wide) score
    assert(filt.forall(r => full.get((r._1, r._2)).contains(r._3)),
      "filtered search re-scored a doc (df/N/avgdl must stay corpus-wide)")
    Seq("graft_bm25_fspec", "graft_bm25_fspec_dl", "graft_bm25_fspec_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("conjunctive BM25 and linear fusion: AND semantics, min-max weighting") {
    import graft.operators.Retrieval
    val dir = java.nio.file.Files.createTempDirectory("graft-conj").toString
    // the max-score fixture's df split: stopwords everywhere, rare
    // terms in 5 docs each — rare3 docs are ids ≡ 3 (mod 80)
    val docs = spark.range(400).select($"id".as("doc_id"),
      concat_ws(" ", lit("the"), lit("of"), lit("and"),
        concat(lit("rare"), ($"id" % 80).cast("string")),
        concat(lit("tok"), ($"id" % 40).cast("string"))).as("text"))
    Retrieval.writeBm25Index(docs, "doc_id", "text", "graft_conj",
      s"$dir/idx", buckets = 8)
    def ask(q: String) = {
      val qs = spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(0L, q)),
        new org.apache.spark.sql.types.StructType()
          .add("qid", org.apache.spark.sql.types.LongType)
          .add("qtext", org.apache.spark.sql.types.StringType))
      Retrieval.bm25TopKIndexed(spark, "graft_conj", qs, "qid", "qtext",
          k = 100, matchAll = true)
        .as[(Long, Long, Double, Int)].collect()
    }
    // docs matching ALL of {the, rare3}: exactly the five rare3 docs
    val hits = ask("the rare3")
    assert(hits.map(_._2).toSet == Set(3L, 83L, 163L, 243L, 323L), hits.toSeq)
    // conjunctive scores are the SAME BM25 sums the disjunctive mode
    // assigns those docs
    val qs2 = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(0L, "the rare3")),
      new org.apache.spark.sql.types.StructType()
        .add("qid", org.apache.spark.sql.types.LongType)
        .add("qtext", org.apache.spark.sql.types.StringType))
    val disj = Retrieval.bm25TopKIndexed(spark, "graft_conj", qs2,
        "qid", "qtext", k = 10000)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(hits.forall(h => disj(h._2) == h._3),
      "conjunctive mode re-scored a doc")
    // no doc holds two distinct rare terms → empty; absent term → empty
    assert(ask("rare3 rare11").isEmpty)
    assert(ask("the zzznotaword").isEmpty)
    // linear fusion: hand-checkable two-run fixture
    def run(rows: Seq[(Long, Long, Double)]) = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3)): _*),
      new org.apache.spark.sql.types.StructType()
        .add("qid", org.apache.spark.sql.types.LongType)
        .add("nid", org.apache.spark.sql.types.LongType)
        .add("score", org.apache.spark.sql.types.DoubleType))
    val a = run(Seq((0L, 1L, 10.0), (0L, 2L, 5.0), (0L, 3L, 0.0)))
    val b = run(Seq((0L, 2L, 0.9), (0L, 4L, 0.4)))
    val fused = Retrieval.linearFuse(Seq((a, 0.5), (b, 0.5)), k = 4)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => r._2 -> (r._3, r._4)).toMap
    // a-norms: 1→1.0, 2→0.5, 3→0.0; b-norms: 2→1.0, 4→0.0
    assert(fused(2L)._1 == 0.75 && fused(2L)._2 == 1) // 0.5*0.5 + 0.5*1.0
    assert(fused(1L)._1 == 0.5 && fused(1L)._2 == 2)  // beats nid 4's tie? no:
    // nid 1 = 0.5, nid 4 = 0.0, nid 3 = 0.0 → ranks 2, then 3 ties 4 by nid
    assert(fused(3L)._2 == 3 && fused(4L)._2 == 4)
    // degenerate run (all scores equal) normalizes to 1.0, not NaN
    val c = run(Seq((0L, 7L, 2.0), (0L, 8L, 2.0)))
    val f2 = Retrieval.linearFuse(Seq((c, 1.0)), k = 2)
      .as[(Long, Long, Double, Int)].collect()
    assert(f2.forall(_._3 == 1.0) && f2.length == 2)
    Seq("graft_conj", "graft_conj_dl", "graft_conj_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("maintainBm25Index: healthy no-op, decayed layout compacts, deletes apply") {
    import graft.operators.Retrieval
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-mt").toString
    Retrieval.writeBm25Index(docs.filter($"doc_id" < 250), "doc_id",
      "text", "graft_bm25_mt", s"$dir/idx", buckets = 4)
    def layout() = {
      val loc = spark.sessionState.catalog
        .getTableMetadata(spark.sessionState.sqlParser
          .parseTableIdentifier("graft_bm25_mt")).location.getPath
      (loc, new java.io.File(loc).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toSet)
    }
    val fresh = layout()
    assert(Retrieval.maintainBm25Index(spark, "graft_bm25_mt")
      .startsWith("healthy"))
    assert(layout() == fresh, "the healthy tick rewrote the index")
    // an append decays the layout → the policy compacts
    Retrieval.appendBm25Index(spark, docs.filter($"doc_id" >= 250),
      "doc_id", "text", "graft_bm25_mt", buckets = 4)
    assert(Retrieval.maintainBm25Index(spark, "graft_bm25_mt")
      .startsWith("compacted"))
    assert(Retrieval.maintainBm25Index(spark, "graft_bm25_mt")
      .startsWith("healthy"))
    // pending deletes take the compaction branch (physical apply) and
    // the next tick is healthy again, with results = reduced corpus
    Retrieval.deleteFromBm25Index(spark, "graft_bm25_mt",
      docs.filter($"doc_id" >= 400).select("doc_id"), "doc_id")
    assert(Retrieval.maintainBm25Index(spark, "graft_bm25_mt")
      .startsWith("compacted"))
    assert(Retrieval.maintainBm25Index(spark, "graft_bm25_mt")
      .startsWith("healthy"))
    val qs = docs.filter($"doc_id" < 3)
      .select($"doc_id",
        concat_ws(" ", slice(split($"text", " "), 1, 8)).as("qtext"))
    val got = Retrieval.bm25TopKIndexed(spark, "graft_bm25_mt", qs,
        "doc_id", "qtext", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    Retrieval.writeBm25Index(docs.filter($"doc_id" < 400), "doc_id",
      "text", "graft_bm25_mt2", s"$dir/idx2", buckets = 4)
    val want = Retrieval.bm25TopKIndexed(spark, "graft_bm25_mt2", qs,
        "doc_id", "qtext", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == want && got.nonEmpty)
    Seq("graft_bm25_mt", "graft_bm25_mt_dl", "graft_bm25_mt_stats",
        "graft_bm25_mt_tombstones", "graft_bm25_mt2", "graft_bm25_mt2_dl",
        "graft_bm25_mt2_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("retrainSq8Index: range-drift repair ≡ fresh build on the union") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-sq8-rt").toString
    // SQ8's drift mode is RANGE drift: the build fixes (lo, Δ) per
    // dim, and an appended batch outside those ranges CLAMPS to the
    // edge levels (correct FAISS add() semantics, degraded
    // reconstruction) — the 3×-scaled second half here
    val scaled = emb.filter($"vec_id" >= 250)
      .select($"vec_id",
        expr("transform(embedding, x -> x * cast(3.0 as float))")
          .as("embedding"))
    Similarity.writeSq8Index(emb.filter($"vec_id" < 250), "vec_id",
      "embedding", "graft_sq8_rt", s"$dir/a", dim = 64, buckets = 4)
    Similarity.appendSq8Index(spark, scaled, "vec_id", "embedding",
      "graft_sq8_rt", dim = 64, buckets = 4)
    val union = emb.filter($"vec_id" < 250)
      .select($"vec_id", $"embedding").unionByName(scaled)
    Similarity.retrainSq8Index(spark, "graft_sq8_rt", union,
      "vec_id", "embedding", dim = 64)
    // ≡ a fresh build over the union: ranges, codes, and results
    Similarity.writeSq8Index(union, "vec_id", "embedding",
      "graft_sq8_fresh", s"$dir/b", dim = 64, buckets = 4)
    assert(spark.table("graft_sq8_rt_ranges")
        .as[(Int, Double, Double)].collect().toSet ==
      spark.table("graft_sq8_fresh_ranges")
        .as[(Int, Double, Double)].collect().toSet,
      "retrained ranges differ from a fresh build on the union")
    val codesRt = spark.table("graft_sq8_rt")
      .as[(Long, Array[Byte])].collect()
      .map(r => r._1 -> r._2.toSeq).toMap
    val codesFresh = spark.table("graft_sq8_fresh")
      .as[(Long, Array[Byte])].collect()
      .map(r => r._1 -> r._2.toSeq).toMap
    assert(codesRt == codesFresh,
      "retrained codes differ from a fresh build on the union")
    val qs = emb.filter($"vec_id" < 3)
    assert(
      Similarity.sq8TopKIndexed(spark, "graft_sq8_rt", qs,
          "vec_id", "embedding", dim = 64, k = 3)
        .as[(Long, Long, Double, Int)].collect().toSet ==
      Similarity.sq8TopKIndexed(spark, "graft_sq8_fresh", qs,
          "vec_id", "embedding", dim = 64, k = 3)
        .as[(Long, Long, Double, Int)].collect().toSet)
    Seq("graft_sq8_rt", "graft_sq8_rt_ranges",
        "graft_sq8_fresh", "graft_sq8_fresh_ranges")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("filtered hybrid fusion: the SAME slice threads both persisted runs") {
    import graft.operators.Retrieval
    val emb = Tables.embeddings(spark, sf)
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-hybf").toString
    Similarity.writeIvfIndex(emb, "vec_id", "embedding",
      "graft_hybf_sivf", s"$dir/v", nlist = 8, buckets = 4)
    Retrieval.writeBm25Index(docs, "doc_id", "text", "graft_hybf_sbm",
      s"$dir/l", buckets = 4)
    val qs = docs.filter($"doc_id" < 3)
      .select($"doc_id",
        concat_ws(" ", slice(split($"text", " "), 1, 8)).as("qtext"))
    val vec = Similarity.ivfTopKIndexed(spark, "graft_hybf_sivf",
        emb.filter($"vec_id" < 3), "vec_id", "embedding", k = 10,
        nprobe = 8, pred = $"nid" % 3 === 0)
      .select($"qid", $"nid", $"rank")
    val lex = Retrieval.bm25TopKIndexed(spark, "graft_hybf_sbm", qs,
        "doc_id", "qtext", k = 10, pred = $"doc" % 3 === 0)
      .select($"qid", $"doc_id".as("nid"), $"rank")
    val fused = Retrieval.rrfFuse(Seq(vec, lex), k = 5)
      .as[(Long, Long, Double, Int)].collect()
    // every fused hit is on-slice — possible only if BOTH runs saw
    // the same predicate (an unsliced run would fuse off-slice nids
    // in: its top-10 at this fixture contains them)
    assert(fused.nonEmpty && fused.forall(_._2 % 3 == 0))
    // control: dropping the slice from one run DOES admit off-slice
    // nids — the assertion above is not vacuous
    val vecAll = Similarity.ivfTopKIndexed(spark, "graft_hybf_sivf",
        emb.filter($"vec_id" < 3), "vec_id", "embedding", k = 10,
        nprobe = 8)
      .select($"qid", $"nid", $"rank")
    assert(Retrieval.rrfFuse(Seq(vecAll, lex), k = 5)
      .as[(Long, Long, Double, Int)].collect().exists(_._2 % 3 != 0))
    Seq("graft_hybf_sivf", "graft_hybf_sivf_centroids",
        "graft_hybf_sbm", "graft_hybf_sbm_dl", "graft_hybf_sbm_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("BM25 max-score pruning: exact vs unpruned, engages on stopword-heavy queries") {
    import graft.operators.Retrieval
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-ms").toString
    // a corpus with a REAL df split: three stopwords in every doc
    // (Lucene idf → ~0), mid-frequency and rare discriminative terms —
    // the shape ProfBm25 showed dominates the steady-state floor
    // (common-term posting mass); the natural documents fixture has no
    // such split (31 terms, nearly all common), so it exercises only
    // the fallback
    val docs = spark.range(400).select($"id".as("doc_id"),
      concat_ws(" ", lit("the"), lit("of"), lit("and"), lit("the"),
        lit("of"), concat(lit("rare"), ($"id" % 80).cast("string")),
        concat(lit("mid"), ($"id" % 8).cast("string")),
        concat(lit("tok"), ($"id" % 40).cast("string"))).as("text"))
    Retrieval.writeBm25Index(docs, "doc_id", "text", "graft_bm25_ms",
      s"$dir/idx", buckets = 8)
    val qs = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(0L, "the of rare3 tok7"),
        org.apache.spark.sql.Row(1L, "and mid2 rare11"),
        org.apache.spark.sql.Row(2L, "the of and")), // all-common → fallback
      new org.apache.spark.sql.types.StructType()
        .add("qid", org.apache.spark.sql.types.LongType)
        .add("qtext", org.apache.spark.sql.types.StringType))
    val (prunedDf, prunedQids) = Retrieval.bm25TopKIndexedPruned(spark,
      "graft_bm25_ms", qs, "qid", "qtext", k = 5)
    val got = prunedDf.as[(Long, Long, Double, Int)].collect().toSet
    val want = Retrieval.bm25TopKIndexed(spark, "graft_bm25_ms", qs,
        "qid", "qtext", k = 5, maxScore = false)
      .as[(Long, Long, Double, Int)].collect().toSet
    // EXACT: max-score is a pruning of work, never of results
    assert(got == want && got.nonEmpty)
    // ...and it actually engaged for the mixed queries (not vacuous)
    assert(prunedQids.toSet == Set(0L, 1L),
      s"expected queries 0,1 pruned, got $prunedQids")
    // the natural fixture (no df split → fallback everywhere) stays
    // exact through the same entry point
    val nat = Tables.documents(spark, sf)
    Retrieval.writeBm25Index(nat, "doc_id", "text", "graft_bm25_ms2",
      s"$dir/idx2", buckets = 8)
    val nqs = nat.filter($"doc_id" < 3)
      .select($"doc_id",
        concat_ws(" ", slice(split($"text", " "), 1, 8)).as("qtext"))
    assert(
      Retrieval.bm25TopKIndexed(spark, "graft_bm25_ms2", nqs,
          "doc_id", "qtext", k = 5)
        .as[(Long, Long, Double, Int)].collect().toSet ==
      Retrieval.bm25TopKIndexed(spark, "graft_bm25_ms2", nqs,
          "doc_id", "qtext", k = 5, maxScore = false)
        .as[(Long, Long, Double, Int)].collect().toSet)
    Seq("graft_bm25_ms", "graft_bm25_ms_dl", "graft_bm25_ms_stats",
        "graft_bm25_ms2", "graft_bm25_ms2_dl", "graft_bm25_ms2_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("maintainIvfIndex: re-skewed index triggers rebalance, healthy index compacts") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-maint").toString
    Similarity.writeIvfIndex(emb, "vec_id", "embedding",
      "graft_ivf_maint", s"$dir/idx", nlist = 8, buckets = 4,
      balanceFactor = 2.0)
    // a hot append: 300 jittered near-copies of one vector — they all
    // assign to its cell, blowing the occupancy bound (the "new hot
    // topic" crawl shape from ProfRebalance, in miniature)
    val hot = emb.filter($"vec_id" === 0)
      .crossJoin(spark.range(300).select($"id".as("copy")))
      .select(($"copy" + 100000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> " +
          "cast(x + 0.001d * (pmod(hash(copy, i), 7) - 3) as float))")
          .as("embedding"))
    Similarity.appendIvfIndex(spark, hot, "vec_id", "embedding",
      "graft_ivf_maint", buckets = 4)
    def occBound() = {
      val c = spark.table("graft_ivf_maint").groupBy("cell").count()
        .orderBy($"count".desc).collect().map(_.getLong(1))
      c.head.toDouble / c(c.length / 2)
    }
    val before = occBound()
    assert(before > 4.0, s"fixture failed to re-skew: $before")
    val action = Similarity.maintainIvfIndex(spark, "graft_ivf_maint",
      nlist = 8, maxFactor = 2.0, rebalanceAbove = 4.0)
    assert(action.startsWith("rebalanced"), action)
    assert(occBound() < before, "rebalance did not restore the bound")
    // conservation through the policy path: probe-all ≡ exact on union
    val union = emb.select($"vec_id", $"embedding").unionByName(hot)
    val qs = emb.filter($"vec_id" < 3)
    val got = Similarity.ivfTopKIndexed(spark, "graft_ivf_maint", qs,
        "vec_id", "embedding", k = 3, nprobe = 4096)
      .as[(Long, Long, Double, Int)].collect().toSet
    val want = Similarity.bruteForceTopK(union, qs,
        "vec_id", "embedding", k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == want)
    // a healthy index (the rebalance just restored one file per
    // bucket, no pending deletes) is a NO-OP — r14 verdict #2: the
    // old policy paid a full-index rewrite (~half a build) on every
    // healthy tick; now it costs one aggregate + one dir listing
    def layout() = {
      val loc = spark.sessionState.catalog
        .getTableMetadata(spark.sessionState.sqlParser
          .parseTableIdentifier("graft_ivf_maint")).location.getPath
      (loc, new java.io.File(loc).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toSet)
    }
    val before2 = layout()
    val action2 = Similarity.maintainIvfIndex(spark, "graft_ivf_maint",
      nlist = 8, maxFactor = 2.0, rebalanceAbove = 4.0)
    assert(action2.startsWith("healthy"), action2)
    assert(layout() == before2,
      "the healthy branch rewrote the index (location or files changed)")
    // decay the layout with one append → the policy compacts (not
    // rebalances: the appended rows land in existing cells)
    Similarity.appendIvfIndex(spark,
      emb.filter($"vec_id" === 1)
        .select(($"vec_id" + 200000L).as("vec_id"), $"embedding"),
      "vec_id", "embedding", "graft_ivf_maint", buckets = 4)
    val action3 = Similarity.maintainIvfIndex(spark, "graft_ivf_maint",
      nlist = 8, maxFactor = 2.0, rebalanceAbove = 4.0)
    assert(action3.startsWith("compacted"), action3)
    Seq("graft_ivf_maint", "graft_ivf_maint_centroids")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("rebalanceIvfIndex: drifted index ≡ fresh balanced build on the union") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-reb").toString
    // the drift posture: build on the first half, append the second —
    // appended vectors assign to the FIXED build-time centroids
    Similarity.writeIvfIndex(emb.filter($"vec_id" < 250), "vec_id",
      "embedding", "graft_ivf_reb", s"$dir/a", nlist = 8, buckets = 4)
    Similarity.appendIvfIndex(spark, emb.filter($"vec_id" >= 250),
      "vec_id", "embedding", "graft_ivf_reb", buckets = 4)
    Similarity.rebalanceIvfIndex(spark, "graft_ivf_reb", nlist = 8,
      maxFactor = 1.5)
    // the fresh balanced build over the SAME union corpus — the
    // rebalanced index must be indistinguishable from it
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", "graft_ivf_fresh",
      s"$dir/b", nlist = 8, buckets = 4, balanceFactor = 1.5)
    val cReb = spark.table("graft_ivf_reb_centroids")
      .as[(Long, Seq[Double])].collect().toSet
    val cFresh = spark.table("graft_ivf_fresh_centroids")
      .as[(Long, Seq[Double])].collect().toSet
    assert(cReb == cFresh, "rebalanced centroids differ from a fresh balanced build")
    val aReb = spark.table("graft_ivf_reb").select("nid", "cell")
      .as[(Long, Long)].collect().toSet
    val aFresh = spark.table("graft_ivf_fresh").select("nid", "cell")
      .as[(Long, Long)].collect().toSet
    assert(aReb == aFresh && aReb.size == emb.count(),
      "rebalanced assignments differ from a fresh balanced build")
    // oracle-identity through the swap: probe-all ≡ exact (no vector
    // lost or duplicated by the rebalance rewrite)
    val qs = emb.filter($"vec_id" < 5)
    val got = Similarity.ivfTopKIndexed(spark, "graft_ivf_reb", qs,
        "vec_id", "embedding", k = 3, nprobe = 4096)
      .as[(Long, Long, Double, Int)].collect().toSet
    val want = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == want)
    Seq("graft_ivf_reb", "graft_ivf_reb_centroids",
        "graft_ivf_fresh", "graft_ivf_fresh_centroids")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("rebalanceIvfadcIndex: cells ≡ fresh balanced build, codes conserve, probe-all invariant") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-adc-reb").toString
    // drift posture on the SERVING shape: build on the first half,
    // append the second (assigns to fixed centroids, encodes against
    // the fixed codebook) — the r14 verdict's billion-vector gap: the
    // codes table had appends but no rebalance path
    Similarity.writeIvfadcIndex(emb.filter($"vec_id" < 250), "vec_id",
      "embedding", "graft_adc_reb", s"$dir/a", dim = 64, nlist = 8,
      m = 4, ks = 16, buckets = 4)
    Similarity.appendIvfadcIndex(spark, emb.filter($"vec_id" >= 250),
      "vec_id", "embedding", "graft_adc_reb", dim = 64, m = 4, buckets = 4)
    val codesBefore = spark.table("graft_adc_reb")
      .select("nid", "nsub", "code", "codeN2")
      .as[(Long, Int, Int, Double)].collect().toSet
    val qs = emb.filter($"vec_id" < 5)
    val resBefore = Similarity.ivfadcTopKIndexed(spark, "graft_adc_reb",
        qs, "vec_id", "embedding", dim = 64, k = 3, nprobe = 4096, m = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    // retrain from the raw-vector store (the ivfadcRerankTopKIndexed
    // stage-2 relation a deployment keeps beside the codes)
    Similarity.rebalanceIvfadcIndex(spark, "graft_adc_reb", emb,
      "vec_id", "embedding", nlist = 8, maxFactor = 1.5)
    // (a) coarse cells ≡ a fresh balanced build over the union — the
    // centroid table AND every row's assignment
    Similarity.writeIvfadcIndex(emb, "vec_id", "embedding",
      "graft_adc_fresh", s"$dir/b", dim = 64, nlist = 8, m = 4, ks = 16,
      buckets = 4, balanceFactor = 1.5)
    assert(spark.table("graft_adc_reb_centroids")
        .as[(Long, Seq[Double])].collect().toSet ==
      spark.table("graft_adc_fresh_centroids")
        .as[(Long, Seq[Double])].collect().toSet,
      "rebalanced coarse centroids differ from a fresh balanced build")
    assert(spark.table("graft_adc_reb").select("nid", "cell").distinct()
        .as[(Long, Long)].collect().toSet ==
      spark.table("graft_adc_fresh").select("nid", "cell").distinct()
        .as[(Long, Long)].collect().toSet,
      "rebalanced cell assignments differ from a fresh balanced build")
    // (b) the PQ codes CONSERVE exactly — the codebook is the retained
    // model artifact and global-codebook codes are cell-independent
    // (a fresh build would retrain the codebook on the union instead;
    // rebalance deliberately does not churn the model appends were
    // encoded against)
    assert(spark.table("graft_adc_reb")
        .select("nid", "nsub", "code", "codeN2")
        .as[(Long, Int, Int, Double)].collect().toSet == codesBefore,
      "rebalance changed the PQ codes — only cells may move")
    // (c) probe-ALL results are therefore bit-invariant through the
    // rebalance (ADC scores depend on codes + codebook only)
    val resAfter = Similarity.ivfadcTopKIndexed(spark, "graft_adc_reb",
        qs, "vec_id", "embedding", dim = 64, k = 3, nprobe = 4096, m = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(resAfter == resBefore && resAfter.nonEmpty,
      "probe-all ADC results changed through the rebalance swap")
    Seq("graft_adc_reb", "graft_adc_reb_centroids", "graft_adc_reb_codebook",
        "graft_adc_fresh", "graft_adc_fresh_centroids",
        "graft_adc_fresh_codebook")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("rebalanceIvfadcResidualIndex: re-encode against retained codebook, new cells") {
    import graft.functions.VecExpressions.vec_norm
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-res-reb").toString
    Similarity.writeIvfadcResidualIndex(emb.filter($"vec_id" < 250),
      "vec_id", "embedding", "graft_res_reb", s"$dir/a", dim = 64,
      nlist = 8, m = 4, ks = 16, buckets = 4)
    Similarity.appendIvfadcResidualIndex(spark,
      emb.filter($"vec_id" >= 250), "vec_id", "embedding",
      "graft_res_reb", dim = 64, m = 4, buckets = 4)
    Similarity.rebalanceIvfadcResidualIndex(spark, "graft_res_reb", emb,
      "vec_id", "embedding", dim = 64, nlist = 8, m = 4, maxFactor = 1.5)
    // (a) coarse cells ≡ fresh balanced centroids over the union
    Similarity.writeIvfadcResidualIndex(emb, "vec_id", "embedding",
      "graft_res_fresh", s"$dir/b", dim = 64, nlist = 8, m = 4, ks = 16,
      buckets = 4, balanceFactor = 1.5)
    assert(spark.table("graft_res_reb_centroids")
        .as[(Long, Seq[Double])].collect().toSet ==
      spark.table("graft_res_fresh_centroids")
        .as[(Long, Seq[Double])].collect().toSet,
      "rebalanced coarse centroids differ from a fresh balanced build")
    // (b) the committed table is BIT-IDENTICAL to re-encoding the
    // union against (new centroids, RETAINED codebook) — residual
    // codes depend on the cell, so unlike the non-residual shape the
    // codes must re-derive, and this pins the whole artifact
    val cents = broadcast(spark.table("graft_res_reb_centroids")
      .withColumn("cn", vec_norm($"cv")))
    val expected = Similarity.residualCodes(
        Similarity.residualVectors(
          emb.select($"vec_id".as("nid"), $"embedding".as("rv0")),
          "nid", "rv0", cents),
        spark.table("graft_res_reb_codebook"), cents, dim = 64, m = 4)
      .as[(Long, Long, Int, Int, Double, Double)].collect().toSet
    val got = spark.table("graft_res_reb")
      .select("nid", "cell", "nsub", "code", "codeN2", "codeCdot")
      .as[(Long, Long, Int, Int, Double, Double)].collect().toSet
    assert(got == expected && got.nonEmpty,
      "rebalanced residual codes differ from re-encoding the union " +
        "against (new centroids, retained codebook)")
    // query path stays sound through the swap (reconstruction cosine)
    val res = Similarity.ivfadcResidualTopKIndexed(spark, "graft_res_reb",
        emb.filter($"vec_id" < 3), "vec_id", "embedding", dim = 64,
        k = 3, nprobe = 2, m = 4)
      .as[(Long, Long, Double, Int)].collect()
    assert(res.nonEmpty && res.forall(r => math.abs(r._3) <= 1.0))
    Seq("graft_res_reb", "graft_res_reb_centroids", "graft_res_reb_codebook",
        "graft_res_fresh", "graft_res_fresh_centroids",
        "graft_res_fresh_codebook")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("rebalance two-swap window fails LOUD, re-run repairs (r14 verdict #3)") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-gen").toString
    Similarity.writeIvfIndex(emb.filter($"vec_id" < 250), "vec_id",
      "embedding", "graft_gen_idx", s"$dir/a", nlist = 8, buckets = 4)
    Similarity.appendIvfIndex(spark, emb.filter($"vec_id" >= 250),
      "vec_id", "embedding", "graft_gen_idx", buckets = 4)
    val qs = emb.filter($"vec_id" < 3)
    // crash simulation: the rebalance dies AFTER the centroid
    // sidecar's swap but BEFORE the assignment table's commit — the
    // exact window the r14 verdict flagged as silently-wrong (new
    // centroids probed against old assignments → short/empty results)
    Similarity.stageIvfRebalance(spark, "graft_gen_idx", nlist = 8,
      maxFactor = 1.5)
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopKIndexed(spark, "graft_gen_idx", qs,
        "vec_id", "embedding", k = 3, nprobe = 4).collect()
    }
    assert(e.getMessage.contains("mid-maintenance"), e.getMessage)
    // appends compose the same two artifacts — they must refuse too
    val e2 = intercept[IllegalArgumentException] {
      Similarity.appendIvfIndex(spark,
        emb.filter($"vec_id" === 0)
          .select(($"vec_id" + 300000L).as("vec_id"), $"embedding"),
        "vec_id", "embedding", "graft_gen_idx", buckets = 4)
    }
    assert(e2.getMessage.contains("mid-maintenance"), e2.getMessage)
    // re-running the full rebalance repairs: both artifacts land at
    // ONE new generation and the index answers exactly again
    Similarity.rebalanceIvfIndex(spark, "graft_gen_idx", nlist = 8,
      maxFactor = 1.5)
    val got = Similarity.ivfTopKIndexed(spark, "graft_gen_idx", qs,
        "vec_id", "embedding", k = 3, nprobe = 4096)
      .as[(Long, Long, Double, Int)].collect().toSet
    val want = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding",
        k = 3).as[(Long, Long, Double, Int)].collect().toSet
    assert(got == want)
    Seq("graft_gen_idx", "graft_gen_idx_centroids")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("balanced-split driver gate is byte-aware (r13 verdict #7)") {
    // the gate arithmetic, driven directly: 4096 oversized cells at a
    // synthetic dim of 2^20 estimate ~34 GB of farthest-member arrays —
    // far past the 256 MB ceiling a row-only bound would admit
    val e = intercept[IllegalArgumentException] {
      Similarity.requireDriverBytes("balanced-split farthest-member batch",
        rows = 4096, dim = 1 << 20)
    }
    assert(e.getMessage.contains("bytes"), e.getMessage)
    // the real shapes stay comfortably inside: 4096 cells × dim 4096
    Similarity.requireDriverBytes("balanced-split centroid batch",
      rows = 4096, dim = 4096)
  }

  test("writeSq8Index fails fast on corpus/dim mismatch; filtered SQ8 serving path") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-sq8-filt").toString
    // ADVICE r13: a 65-coordinate corpus under dim=64 used to WRITE a
    // 65-row range sidecar that every subsequent query/append then
    // rejected — the build must refuse what its query path would
    val emb65 = emb.select($"vec_id",
      concat($"embedding", array(lit(1.0f))).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.writeSq8Index(emb65, "vec_id", "embedding",
        "graft_sq8_bad", s"$dir/bad", dim = 64, buckets = 4)
    }
    assert(e.getMessage.contains("65"), e.getMessage)
    // filtered search on the SQ8 serving path ≡ exact cosine over the
    // reconstructed-and-filtered corpus (bruteForceTopK shares the
    // vec_dot/vec_norm arithmetic with the sq8 search tail)
    Similarity.writeSq8Index(emb, "vec_id", "embedding",
      "graft_sq8_filt", s"$dir/idx", dim = 64, buckets = 4)
    val qs = emb.filter($"vec_id" < 5)
    val got = Similarity.sq8TopKIndexed(spark, "graft_sq8_filt", qs,
        "vec_id", "embedding", dim = 64, k = 3, pred = $"nid" % 3 === 0)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got.nonEmpty && got.forall(_._2 % 3 == 0))
    val rows = spark.table("graft_sq8_filt_ranges")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val mins = rows.map(_._2)
    val deltas = rows.map(_._3)
    val recon = spark.table("graft_sq8_filt")
      .filter($"nid" % 3 === 0)
      .select($"nid".as("vec_id"),
        graft.functions.VecExpressions.vec_sq8_decode(
          $"code", mins, deltas).as("embedding"))
    val want = Similarity.bruteForceTopK(recon, qs, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == want)
    // the rerank serving path honours the slice end to end
    val dir2 = java.nio.file.Files.createTempDirectory("graft-adc-filt2").toString
    Similarity.writeIvfadcIndex(emb, "vec_id", "embedding",
      "graft_adc_filt2", s"$dir2/idx", dim = 64, nlist = 8, m = 4,
      ks = 16, buckets = 4)
    val rr = Similarity.ivfadcRerankTopKIndexed(spark, "graft_adc_filt2",
        emb, qs, "vec_id", "embedding", dim = 64, k = 3, kCand = 10,
        nprobe = 4, m = 4, pred = $"nid" % 3 === 0)
      .as[(Long, Long, Double, Int)].collect()
    assert(rr.nonEmpty && rr.forall(_._2 % 3 == 0))
    Seq("graft_sq8_filt", "graft_sq8_filt_ranges", "graft_adc_filt2",
        "graft_adc_filt2_codebook", "graft_adc_filt2_centroids")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
