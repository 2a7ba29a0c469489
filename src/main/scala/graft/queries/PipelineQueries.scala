package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.Tables
import graft.operators.{Dedup, Multimodal, Similarity, TextOps}

/** Training-data-pipeline operator coverage: deduplication, similarity
  * search, text analysis, multimodal plumbing — over `documents` and
  * `embeddings`. Every query is value-checked against a DuckDB oracle:
  * the hash-family queries (d03 MinHash, d04 SimHash) run their
  * md5-arithmetic oracle families here — the xxhash64 production
  * defaults keep ScalaTest coverage — and s02's hyperplane buckets are
  * plane-literal-reproducible like d06's.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  private def stops(lang: String): Seq[String] =
    TextOps.stopwords.toMap.apply(lang)

  val queries: ListMap[String, Q] = ListMap(

    // Exact dedup: content-digest groupBy, canonical keeper per group.
    // The corpus ∪ a re-ingested shard (doc_id < 50) models the classic
    // duplicated-delivery scenario; the corpus alone has no exact dups.
    "d01_dedup_exact" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.exactGroups(docs.union(docs.filter(col("doc_id") < 50)),
        "doc_id", "text")
    }),

    // Exact n-gram Jaccard near-dup pairs (inverted-index equi-join).
    "d02_dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, threshold = 0.8)),

    // MinHash+LSH banding near-dup (the linear-cost scale path). Runs
    // the md5-arithmetic permutation family so the WHOLE pipeline
    // (shingles → 32 permutation minima → band buckets → candidate join
    // → signature-estimated Jaccard) is value-checked against DuckDB;
    // the xxhash64 production family keeps its ScalaTest coverage.
    "d03_dedup_minhash" -> ((s, d) =>
      Dedup.minhashPairs(Tables.documents(s, d), "doc_id", "text",
        numPerm = 32, bands = 8, threshold = 0.5, family = "md5")),

    // SimHash fingerprint near-dup (chunk-banded candidates). Runs the
    // md5 oracle family (60-bit fingerprints) so the bit-sum vote, chunk
    // banding, and Hamming verification are all value-checked against
    // DuckDB; the 64-bit xxhash64 production family keeps ScalaTest
    // coverage.
    "d04_dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text",
        maxHamming = 3, family = "md5")),

    // Embedding-cosine near-dup pairs (exact, double-precision).
    // 0.45 is calibrated to this corpus (max pairwise cosine ≈ 0.51/0.60
    // at sf0.01/sf0.1 — the synthetic embeddings have no true near-dups,
    // so a 0.9x threshold would be vacuously empty).
    "d05_dedup_embedding" -> ((s, d) =>
      Similarity.nearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
        threshold = 0.45)),

    // LSH-bucketed embedding near-dup (the scale path twin of d05):
    // candidates only from random-hyperplane band collisions, exact
    // cosine verification. Deterministic planes → the oracle replicates
    // the bucketing bit-for-bit (see lshOracleSql).
    "d06_dedup_embedding_lsh" -> ((s, d) =>
      Similarity.lshNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
        dim = 64, threshold = 0.45, nbits = 8, bands = 4)),

    // Cross-document duplicated-span detection (Lee et al. exact-substring
    // dedup signal): positional w-token window fingerprints, duplicated
    // when ≥2 distinct documents share one; per-document dup fraction.
    "d13_duplicate_spans" -> ((s, d) =>
      Dedup.duplicateSpans(Tables.documents(s, d), "doc_id", "text", w = 5)),

    // SemDeDup semantic dedup (the clustered scale path next to d05/d06):
    // deterministic coarse cells, within-cell pair search, drop the pair
    // member nearer its centroid (keep cluster outliers). Fully
    // oracle-checked — centroids, assignment, and the drop policy are
    // all re-derived in SQL.
    "d12_semantic_dedup" -> ((s, d) =>
      Similarity.semanticDedup(Tables.embeddings(s, d), "vec_id", "embedding",
        nlist = 8, threshold = 0.45)),

    // Dedup cluster formation: connected components over near-dup pairs
    // (min-label propagation + pointer jumping), cluster label = minimum
    // member id = the canonical keeper. Pairs here are the exact cosine
    // pairs at 0.35 (a transitive graph — 75 components at sf0.01, the
    // largest 59 nodes deep); at corpus scale the same operator consumes
    // lshNearDupPairs/minhashPairs output unchanged.
    "d07_dedup_clusters" -> ((s, d) =>
      Dedup.clusters(
        Similarity.nearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
          threshold = 0.35),
        "id_a", "id_b")),

    // Boilerplate removal: per-source document-frequency term stripping
    // (df > 0.9 of the source's docs → navigation-chrome-style token),
    // broadcast vocabularies, map-only strip.
    "d08_boilerplate_strip" -> ((s, d) =>
      TextOps.boilerplateStrip(Tables.documents(s, d), "doc_id", "text",
        "source", dfFrac = 0.9)),

    // Brute-force cosine top-3 for query vectors vec_id < 10 (exact ANN
    // baseline; broadcast query side).
    "s01_ann_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 3)
    }),

    // LSH-bucketed ANN (approximate scale path; same query set).
    "s02_ann_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, k = 3, nbits = 8)
    }),

    // IVF ANN (the other classic scale path): deterministic coarse
    // centroids → one cell per corpus vector → nprobe-cell search with
    // exact cosine. Fully oracle-checked — the centroid sample, cell
    // assignment, and probing are all reproducible in SQL.
    "s03_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 3, nlist = 16, nprobe = 4)
    }),

    // Persisted-index IVF: build the cell-bucketed index once, then
    // answer the same query set from the index — identical results to
    // s03 (same oracle), with no assignment pass and no corpus shuffle
    // at query time. The repeated-query posture for a 100 TB ANN corpus.
    "s07_ann_ivf_indexed" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_idx/" +
        graft.core.Digest.md5IdScala(d)
      Similarity.writeIvfIndex(emb, "vec_id", "embedding",
        "graft_ivf_index", path, nlist = 16, buckets = 8)
      Similarity.ivfTopKIndexed(s, "graft_ivf_index",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 3, nprobe = 4)
    }),

    // FILTERED vector search — the attribute-restricted query every
    // production vector service exposes (and every training-data
    // curation query runs: "nearest neighbours among docs that passed
    // the quality filter"). The predicate lands on the index scan next
    // to the probed-cell In filter: bucket pruning + attribute
    // pushdown compose in one FileSourceScan.
    "s27_ann_ivf_filtered" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_filt_idx/" +
        graft.core.Digest.md5IdScala(d)
      Similarity.writeIvfIndex(emb, "vec_id", "embedding",
        "graft_ivf_filt", path, nlist = 16, buckets = 8)
      Similarity.ivfTopKIndexed(s, "graft_ivf_filt",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 3, nprobe = 4, pred = col("nid") % 3 === 0)
    }),

    // BM25 lexical retrieval (Okapi, Lucene idf) — queries are the
    // first 8 tokens of docs 0-2, so the oracle re-derives the exact
    // query term sets; corpus stats (N, avgdl) are two driver scalars.
    "t37_bm25_topk" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 8)).as("qtext"))
      graft.operators.Retrieval.bm25TopK(docs, qs, "doc_id", "text",
        "doc_id", "qtext", k = 5)
    }),

    // Persisted BM25 inverted index — the lexical serving posture
    // (r13 verdict #1): term-bucketed postings with dl denormalized
    // into the row, built on the initial half, APPENDED with the
    // second half (stats recompute exactly — integer-valued dl sums
    // are order-independent), then queried with NO corpus-wide term
    // explode: the query-term literal-In bucket-prunes the postings
    // scan and df derives from just those postings. Hash-matches the
    // in-session t37 formula over the full corpus (same oracle).
    "t38_bm25_indexed" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_bm25_idx/" +
        graft.core.Digest.md5IdScala(d)
      graft.operators.Retrieval.writeBm25Index(
        docs.filter(col("doc_id") < 250), "doc_id", "text",
        "graft_bm25_index", path, buckets = 8)
      graft.operators.Retrieval.appendBm25Index(s,
        docs.filter(col("doc_id") >= 250), "doc_id", "text",
        "graft_bm25_index", buckets = 8)
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 8)).as("qtext"))
      graft.operators.Retrieval.bm25TopKIndexed(s, "graft_bm25_index",
        qs, "doc_id", "qtext", k = 5)
    }),

    // BM25 index deletes — the decontamination RETRACTION: benchmark
    // docs that already got indexed must leave BOTH the candidate set
    // AND the scoring model (df self-corrects via the pre-df
    // anti-join; N/avgdl recompute from _dl minus tombstones). The
    // row exercises both tombstone halves like s30: the first batch
    // is physically applied by compactBm25Index (postings + _dl
    // staged rewrites, tombstones truncate), the second stays pending.
    // Scores must equal an index BUILT on the reduced corpus — the
    // oracle is the t37 formula over documents WHERE doc_id < 400.
    "t39_bm25_deleted" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_bm25_del_idx/" +
        graft.core.Digest.md5IdScala(d)
      graft.operators.Retrieval.writeBm25Index(docs, "doc_id", "text",
        "graft_bm25_del", path, buckets = 8)
      graft.operators.Retrieval.deleteFromBm25Index(s, "graft_bm25_del",
        docs.filter(col("doc_id") >= 450).select("doc_id"), "doc_id")
      graft.operators.Retrieval.compactBm25Index(s, "graft_bm25_del")
      graft.operators.Retrieval.deleteFromBm25Index(s, "graft_bm25_del",
        docs.filter(col("doc_id") >= 400 && col("doc_id") < 450)
          .select("doc_id"), "doc_id")
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 8)).as("qtext"))
      graft.operators.Retrieval.bm25TopKIndexed(s, "graft_bm25_del",
        qs, "doc_id", "qtext", k = 5)
    }),

    // Filtered lexical search — the BM25 twin of s27/s29's attribute
    // slice, with Lucene's filter-query semantics: the predicate
    // restricts CANDIDATES only (df/N/avgdl stay corpus-wide, so a
    // doc's score is identical inside and outside the slice); deletes
    // (t39) are the corpus-changing counterpart. The slice lands on
    // the postings scan next to the term-bucket pruning.
    "t40_bm25_filtered" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_bm25_filt_idx/" +
        graft.core.Digest.md5IdScala(d)
      graft.operators.Retrieval.writeBm25Index(docs, "doc_id", "text",
        "graft_bm25_filt", path, buckets = 8)
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 8)).as("qtext"))
      graft.operators.Retrieval.bm25TopKIndexed(s, "graft_bm25_filt",
        qs, "doc_id", "qtext", k = 5, pred = col("doc") % 3 === 0)
    }),

    // Conjunctive (Lucene AND) lexical search — the precision mode
    // next to t38's disjunctive default: only docs containing EVERY
    // distinct query term are candidates, scores are the same BM25
    // sums; the engine prunes to the rarest term's postings first
    // (the classic AND optimization).
    "t41_bm25_conjunctive" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_bm25_conj_idx/" +
        graft.core.Digest.md5IdScala(d)
      graft.operators.Retrieval.writeBm25Index(docs, "doc_id", "text",
        "graft_bm25_conj", path, buckets = 8)
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 8)).as("qtext"))
      graft.operators.Retrieval.bm25TopKIndexed(s, "graft_bm25_conj",
        qs, "doc_id", "qtext", k = 5, matchAll = true)
    }),

    // Weighted linear hybrid — the convex-combination fusion mode
    // next to s28's RRF: per-(query, run) min-max normalization puts
    // BM25's unbounded sums and cosine's [-1, 1] on one scale, then
    // score = 0.7·vec + 0.3·lex. Probe-all keeps the vector oracle
    // exact; both runs' scores are the engine's own rounded outputs,
    // so the oracle normalizes the identical values.
    "s33_hybrid_linear" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val docs = Tables.documents(s, d)
      val vpath = s"${sys.props("java.io.tmpdir")}/graft_hyblin_ivf_idx/" +
        graft.core.Digest.md5IdScala(d)
      Similarity.writeIvfIndex(emb, "vec_id", "embedding",
        "graft_hyblin_ivf", vpath, nlist = 16, buckets = 8)
      val vec = Similarity.ivfTopKIndexed(s, "graft_hyblin_ivf",
          emb.filter(col("vec_id") < 3), "vec_id", "embedding",
          k = 10, nprobe = 16)
        .select(col("qid"), col("nid"), col("sim").as("score"))
      val lpath = s"${sys.props("java.io.tmpdir")}/graft_hyblin_bm25_idx/" +
        graft.core.Digest.md5IdScala(d)
      graft.operators.Retrieval.writeBm25Index(docs, "doc_id", "text",
        "graft_hyblin_bm25", lpath, buckets = 8)
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 8)).as("qtext"))
      val lex = graft.operators.Retrieval.bm25TopKIndexed(s,
          "graft_hyblin_bm25", qs, "doc_id", "qtext", k = 10)
        .select(col("qid"), col("doc_id").as("nid"), col("score"))
      graft.operators.Retrieval.linearFuse(
        Seq((vec, 0.7), (lex, 0.3)), k = 5)
    }),

    // Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009)
    // of the lexical and vector runs — recomposed over the SERVING
    // shapes (r13 verdict #1): the vector run answers from the
    // persisted IVF index probing ALL cells (probe-all ≡ exact, the
    // s24 device, so the oracle stays the brute-force run) and the
    // lexical run from the persisted BM25 inverted index. The fusion
    // relation is query-bounded — both runs arrive top-10'd.
    "s28_hybrid_rrf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val docs = Tables.documents(s, d)
      val vpath = s"${sys.props("java.io.tmpdir")}/graft_hyb_ivf_idx/" +
        graft.core.Digest.md5IdScala(d)
      Similarity.writeIvfIndex(emb, "vec_id", "embedding",
        "graft_hyb_ivf", vpath, nlist = 16, buckets = 8)
      val vec = Similarity.ivfTopKIndexed(s, "graft_hyb_ivf",
          emb.filter(col("vec_id") < 3), "vec_id", "embedding",
          k = 10, nprobe = 16)
        .select(col("qid"), col("nid"), col("rank"))
      val lpath = s"${sys.props("java.io.tmpdir")}/graft_hyb_bm25_idx/" +
        graft.core.Digest.md5IdScala(d)
      graft.operators.Retrieval.writeBm25Index(docs, "doc_id", "text",
        "graft_hyb_bm25", lpath, buckets = 8)
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 8)).as("qtext"))
      val lex = graft.operators.Retrieval.bm25TopKIndexed(s,
          "graft_hyb_bm25", qs, "doc_id", "qtext", k = 10)
        .select(col("qid"), col("doc_id").as("nid"), col("rank"))
      graft.operators.Retrieval.rrfFuse(Seq(vec, lex), k = 5)
    }),

    // Lloyd k-means refinement of the IVF seed centroids (the
    // production-IVF training step): two deterministic assign/mean
    // rounds, per-iteration rounding pins the distributed-mean floats.
    // Fully oracle-checked — the SQL unrolls both iterations. The
    // array-valued centroid is exploded to scalar (cell, dim, value)
    // rows for the artifact: array columns defeat the driver's
    // sort-then-hash comparator, and the exploded shape carries the
    // identical information (dim is 1-based to match SQL list indexing).
    "s06_kmeans_refine" -> ((s, d) =>
      Similarity.kmeansRefine(Tables.embeddings(s, d), "vec_id", "embedding",
        k = 8, iters = 2)
        .select(col("cell"),
          posexplode(col("centroid")).as(Seq("pos", "value")))
        .select(col("cell"), (col("pos") + 1).cast("long").as("dim"),
          col("value"))),

    // Int8-quantized ANN: per-vector symmetric quantization (4× smaller
    // candidate state at scale), then the exact top-k machinery over the
    // quantized values — scales cancel in cosine. Deterministic
    // arithmetic end-to-end, so the oracle reproduces the quantization
    // bit-for-bit in SQL.
    "s04_ann_quantized" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 3)
    }),

    // PQ ANN (the third classic scale path): per-subspace codebooks from
    // a deterministic sample, corpus state = m one-byte codes per vector,
    // asymmetric-distance scoring via broadcast query tables. Fully
    // oracle-checked — codebooks, encoding argmin, and ADC sums are all
    // reproducible in SQL.
    "s05_ann_pq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, k = 3, m = 4, ks = 16)
    }),

    // Two-stage retrieval (the production ANN serving shape): the same
    // PQ ADC machinery yields 10 candidates per query, then ONLY those
    // pairs re-score with exact cosine over the full vectors — top-3
    // exact-within-candidates, candidate-bounded refine cost.
    "s11_ann_pq_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqRerankTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, k = 3, kCand = 10, m = 4, ks = 16)
    }),

    // Persisted-PQ serving shape: the corpus encodes ONCE into a
    // bucketed (nid, nsub, code) table + codebook; the query batch
    // reads codes back and runs ADC only — bit-identical to s05's
    // in-session pqTopK, with no corpus-encode stage at query time
    // (PlansSpec pins that) and the (qid, nid) aggregation riding the
    // on-disk bucket partitioning.
    "s12_ann_pq_indexed" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_pq_idx/" +
        graft.core.Digest.md5IdScala(d)
      Similarity.writePqIndex(emb, "vec_id", "embedding",
        "graft_pq_index", path, dim = 64, m = 4, ks = 16, buckets = 8)
      Similarity.pqTopKIndexed(s, "graft_pq_index",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, k = 3, m = 4)
    }),

    // IVFADC — the composed billion-vector serving index (IVF cells
    // pick WHICH codes to scan, PQ ADC scores them): per-query cost is
    // the probed cells' code rows only. Oracle = the s03 cell/probe
    // machinery ∘ the s05 ADC machinery.
    "s13_ann_ivfadc" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfadcTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, k = 3, nlist = 16, nprobe = 4,
        m = 4, ks = 16)
    }),

    // Persisted IVFADC serving index (the s07/s12 persistence device on
    // the composed index): cells + codes land as ONE cell-bucketed
    // table built once; the query batch probes its cells' bucket files
    // and ADC-scores codes — no assignment pass, no encode pass, no
    // raw-vector scan at query time. Bit-identical to s13.
    "s14_ann_ivfadc_indexed" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_ivfadc_idx/" +
        graft.core.Digest.md5IdScala(d)
      Similarity.writeIvfadcIndex(emb, "vec_id", "embedding",
        "graft_ivfadc_index", path, dim = 64, nlist = 16, m = 4, ks = 16,
        buckets = 8)
      Similarity.ivfadcTopKIndexed(s, "graft_ivfadc_index",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, k = 3, nprobe = 4, m = 4)
    }),

    // Incremental raw-IVF append (FAISS add() on the coarse
    // quantizer — completes the gate-covered append family across all
    // five index kinds): build on the first half, append the second
    // against the FIXED centroids, then probe EVERY cell — probe-all
    // ≡ exact (the s24 device), so a vector lost or duplicated
    // anywhere in the append path breaks the hash against the exact
    // oracle.
    "s31_ann_ivf_incremental" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_inc_idx/" +
        graft.core.Digest.md5IdScala(d)
      Similarity.writeIvfIndex(emb.filter(col("vec_id") < 250),
        "vec_id", "embedding", "graft_ivf_inc", path, nlist = 16,
        buckets = 8)
      Similarity.appendIvfIndex(s, emb.filter(col("vec_id") >= 250),
        "vec_id", "embedding", "graft_ivf_inc", buckets = 8)
      Similarity.ivfTopKIndexed(s, "graft_ivf_inc",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 3, nprobe = 4096)
    }),

    // Filtered vector search on the SERVING shape (r13 verdict #2):
    // the attribute slice lands on the CODE-TABLE scan of the
    // persisted IVFADC index — next to the probed-cell In filter, so
    // bucket pruning and the attribute pushdown compose in one
    // FileSourceScan (IndexPlanSpec pins they coexist). A deployment
    // serving from codes can now run "nearest among docs passing the
    // filter" without falling back to the 4×-larger raw index (s27).
    "s29_ann_ivfadc_filtered" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_adc_filt_idx/" +
        graft.core.Digest.md5IdScala(d)
      Similarity.writeIvfadcIndex(emb, "vec_id", "embedding",
        "graft_adc_filt", path, dim = 64, nlist = 16, m = 4, ks = 16,
        buckets = 8)
      Similarity.ivfadcTopKIndexed(s, "graft_adc_filt",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, k = 3, nprobe = 4, m = 4, pred = col("nid") % 3 === 0)
    }),

    // FILTERED hybrid retrieval (r14 verdict #6) — the curation query
    // a release pipeline actually runs: "best docs passing the quality
    // gate, lexical + vector". The SAME attribute slice threads
    // through BOTH persisted runs (the s29/t40 pred devices compose)
    // before RRF fusion; the vector run probes ALL cells so probe-all
    // ≡ exact keeps the oracle (the s28 device), and the lexical
    // slice keeps corpus-wide scoring (Lucene filter-query
    // semantics). A mismatched slice would admit off-slice nids into
    // the fusion — the oracle's sliced runs pin consistency.
    "s32_hybrid_filtered" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val docs = Tables.documents(s, d)
      val vpath = s"${sys.props("java.io.tmpdir")}/graft_hybf_ivf_idx/" +
        graft.core.Digest.md5IdScala(d)
      Similarity.writeIvfIndex(emb, "vec_id", "embedding",
        "graft_hybf_ivf", vpath, nlist = 16, buckets = 8)
      val vec = Similarity.ivfTopKIndexed(s, "graft_hybf_ivf",
          emb.filter(col("vec_id") < 3), "vec_id", "embedding",
          k = 10, nprobe = 16, pred = col("nid") % 3 === 0)
        .select(col("qid"), col("nid"), col("rank"))
      val lpath = s"${sys.props("java.io.tmpdir")}/graft_hybf_bm25_idx/" +
        graft.core.Digest.md5IdScala(d)
      graft.operators.Retrieval.writeBm25Index(docs, "doc_id", "text",
        "graft_hybf_bm25", lpath, buckets = 8)
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 8)).as("qtext"))
      val lex = graft.operators.Retrieval.bm25TopKIndexed(s,
          "graft_hybf_bm25", qs, "doc_id", "qtext", k = 10,
          pred = col("doc") % 3 === 0)
        .select(col("qid"), col("doc_id").as("nid"), col("rank"))
      graft.operators.Retrieval.rrfFuse(Seq(vec, lex), k = 5)
    }),

    // Index deletes — FAISS remove_ids() on the persisted indexes
    // (r13 verdict #3: the engine's own dedup keep-lists could never
    // retract an indexed near-dup short of a full rebuild). One row
    // exercises BOTH halves of the tombstone lifecycle: the first
    // delete batch is PHYSICALLY applied by compactIndex (deletes
    // ride the rewrite free, tombstones truncate), the second stays
    // pending and is anti-joined out at query time. The oracle scores
    // the full-corpus codebook and drops the deleted ids.
    "s30_ann_pq_deleted" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_pq_del_idx/" +
        graft.core.Digest.md5IdScala(d)
      Similarity.writePqIndex(emb, "vec_id", "embedding",
        "graft_pq_del", path, dim = 64, m = 4, ks = 16, buckets = 8)
      Similarity.deleteFromIndex(s, "graft_pq_del",
        emb.filter(col("vec_id") >= 450).select("vec_id"), "vec_id")
      Similarity.compactIndex(s, "graft_pq_del")
      Similarity.deleteFromIndex(s, "graft_pq_del",
        emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
          .select("vec_id"), "vec_id")
      Similarity.pqTopKIndexed(s, "graft_pq_del",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, k = 3, m = 4)
    }),

    // Incremental IVFADC append — s15's posture on the composed index:
    // the batch assigns to the EXISTING centroids and encodes against
    // the EXISTING codebook (no recluster, no retrain), its rows insert
    // into the cell-bucketed table, and the query sees both halves.
    "s17_ann_ivfadc_incremental" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_adc_inc_idx/" +
        graft.core.Digest.md5IdScala(d)
      Similarity.writeIvfadcIndex(emb.filter(col("vec_id") < 250),
        "vec_id", "embedding", "graft_adc_inc", path, dim = 64,
        nlist = 16, m = 4, ks = 16, buckets = 8)
      Similarity.appendIvfadcIndex(s, emb.filter(col("vec_id") >= 250),
        "vec_id", "embedding", "graft_adc_inc", dim = 64, m = 4,
        buckets = 8)
      Similarity.ivfadcTopKIndexed(s, "graft_adc_inc",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, k = 3, nprobe = 4, m = 4)
    }),

    // By-residual IVFADC (FAISS by_residual=true, its actual default):
    // codes quantize v − centroid(cell), so the m×ks budget spends its
    // precision on what distinguishes neighbours WITHIN a cell; the
    // score is the exact reconstruction cosine cos(q, centroid + r̂)
    // via build-time cross terms. The round-12 tuning tier measured
    // non-residual recall stuck at 0.16–0.25 regardless of ks/nprobe —
    // this is the knob that moves it.
    "s18_ann_ivfadc_residual" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfadcResidualTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, k = 3, nlist = 16, nprobe = 4,
        m = 4, ks = 16)
    }),

    // Persisted by-residual index — the s14 serving layout (one
    // cell-bucketed codes table, bucket-pruned probed-cell scans) with
    // residual codes + precomputed reconstruction cross terms.
    // Bit-identical to s18.
    "s19_ann_ivfadc_residual_indexed" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_adc_res_idx/" +
        graft.core.Digest.md5IdScala(d)
      Similarity.writeIvfadcResidualIndex(emb, "vec_id", "embedding",
        "graft_adc_res", path, dim = 64, nlist = 16, m = 4, ks = 16,
        buckets = 8)
      Similarity.ivfadcResidualTopKIndexed(s, "graft_adc_res",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, k = 3, nprobe = 4, m = 4)
    }),

    // Lloyd-TRAINED PQ codebook (what FAISS's ProductQuantizer always
    // does — the md5 sample is only the k-means init): two rounds of
    // assign → per-(subspace, code, coordinate) mean (6 dp-pinned, the
    // kmeansRefine device), then the standard ADC search against the
    // trained codebook. The recall knob the round-12 tuning tier
    // showed ks alone cannot turn.
    "s20_ann_pq_trained" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, k = 3, m = 4, ks = 16,
        trainIters = 2)
    }),

    // IVF search over Lloyd-REFINED coarse centroids (the trained
    // coarse quantizer FAISS pairs with its trained PQ — s06's
    // kmeansRefine feeding s03's probe search in one operator):
    // assignment and probes run against the round-2 centroids.
    "s22_ann_ivf_refined" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 3, nlist = 8, nprobe = 4,
        refineIters = 2)
    }),

    // Two-stage retrieval over the PERSISTED index — the serving
    // recipe: ADC candidates from the s14 code table (bucket-pruned
    // probed-cell scan), exact cosine re-rank of the |q|·kCand pairs
    // against the raw-vector store. Recall ≈ IVF-exact at code-table
    // scan cost.
    "s21_ann_ivfadc_rerank_indexed" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_adc_rr_idx/" +
        graft.core.Digest.md5IdScala(d)
      Similarity.writeIvfadcIndex(emb, "vec_id", "embedding",
        "graft_adc_rr", path, dim = 64, nlist = 16, m = 4, ks = 16,
        buckets = 8)
      Similarity.ivfadcRerankTopKIndexed(s, "graft_adc_rr", emb,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, k = 3, kCand = 10, nprobe = 4, m = 4)
    }),

    // Recall audit for the composed index (s08's device on s13): how
    // much of the exact top-3 does IVFADC retain at this (nlist,
    // nprobe, m)? The tuning readout a deployment reads before raising
    // nprobe or refining with s11's exact re-rank.
    "s16_ann_ivfadc_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
      Similarity.recallAtK(
        Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 3),
        Similarity.ivfadcTopK(emb, q, "vec_id", "embedding",
          dim = 64, k = 3, nlist = 16, nprobe = 4, m = 4, ks = 16))
    }),

    // Incremental PQ append — the recurring-crawl serving posture: the
    // index builds on the initial half of the corpus (codebook trained
    // there, FAISS add() semantics), the second half APPENDS encoding
    // against that fixed codebook, and the query sees both. Append
    // cost is |batch|; nothing re-encodes.
    "s15_ann_pq_incremental" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_pq_inc_idx/" +
        graft.core.Digest.md5IdScala(d)
      Similarity.writePqIndex(emb.filter(col("vec_id") < 250),
        "vec_id", "embedding", "graft_pq_inc", path, dim = 64, m = 4,
        ks = 16, buckets = 8)
      Similarity.appendPqIndex(s, emb.filter(col("vec_id") >= 250),
        "vec_id", "embedding", "graft_pq_inc", dim = 64, m = 4,
        buckets = 8)
      Similarity.pqTopKIndexed(s, "graft_pq_inc",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, k = 3, m = 4)
    }),

    // Index compaction — the maintenance pass the recurring-crawl
    // posture (s15/s17/s19) needs: every append adds a file per bucket,
    // so a year of daily batches turns each bucket-pruned probed-cell
    // scan into thousands of tiny-file opens. compactIndex rewrites the
    // bucketed code table to ONE file per bucket (same murmur3-pmod
    // residency, catalog entry swapped atomically) — results must stay
    // bit-identical to the uncompacted index, which is s15's oracle.
    "s23_ann_index_compacted" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_pq_cmp_idx/" +
        graft.core.Digest.md5IdScala(d)
      Similarity.writePqIndex(emb.filter(col("vec_id") < 250),
        "vec_id", "embedding", "graft_pq_cmp", path, dim = 64, m = 4,
        ks = 16, buckets = 8)
      Similarity.appendPqIndex(s, emb.filter(col("vec_id") >= 250),
        "vec_id", "embedding", "graft_pq_cmp", dim = 64, m = 4,
        buckets = 8)
      Similarity.compactIndex(s, "graft_pq_cmp")
      Similarity.pqTopKIndexed(s, "graft_pq_cmp",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, k = 3, m = 4)
    }),

    // Balanced-cell IVF — the FAISS oversized-cell split for
    // heavy-tailed corpora (a hot cell = one bucket = one straggler
    // task; ProfAnnSkew measures the histograms). Probing EVERY cell
    // makes the result exact, so the gate pins the split/reassign
    // plumbing end-to-end (a vector lost or duplicated by a split
    // round would break the hash) against the s01 exact oracle.
    "s24_ann_ivf_balanced" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 3, nlist = 8, nprobe = 4096,
        balanceFactor = 1.5)
    }),

    // Scalar-quantized (SQ8) search — FAISS IndexScalarQuantizer's
    // QT_8bit, the production encoding next to PQ (4× compression, no
    // codebook training): per-dim corpus min/max ranges, one byte per
    // coordinate, exact cosine against the reconstructed vectors
    // (asymmetric — the query side stays full-precision). The oracle
    // re-derives every reconstructed coordinate bit-for-bit.
    "s25_ann_sq8" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.sq8TopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, k = 3)
    }),

    // Incremental persisted SQ8 index — byte codes bucketed by id,
    // ranges trained on the initial half and FIXED across appends
    // (out-of-range coordinates clamp to the edge levels; FAISS add()
    // semantics on the scalar quantizer). The oracle re-derives the
    // subset ranges and every clamped reconstruction.
    "s26_ann_sq8_incremental" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_sq8_inc_idx/" +
        graft.core.Digest.md5IdScala(d)
      Similarity.writeSq8Index(emb.filter(col("vec_id") < 250),
        "vec_id", "embedding", "graft_sq8_inc", path, dim = 64,
        buckets = 8)
      Similarity.appendSq8Index(s, emb.filter(col("vec_id") >= 250),
        "vec_id", "embedding", "graft_sq8_inc", dim = 64, buckets = 8)
      Similarity.sq8TopKIndexed(s, "graft_sq8_inc",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, k = 3)
    }),

    // BPE token-ID encoding — the final artifact a tokenizer pipeline
    // ships: t29's tokens mapped through a frequency-ranked vocabulary
    // to integer ids (what the training shards actually store). The
    // vocabulary is BOUNDED BY CONSTRUCTION (every encoded token is a
    // single character or one of the nMerges merge outputs — a model
    // artifact like the merge table, which is driver-collected anyway),
    // so the rank is computed on the driver and broadcast-joined back:
    // no single-partition global window anywhere in the plan. The
    // driver sort uses the UTF-8 byte comparator so ties match a
    // distributed `orderBy(token asc)` bit-for-bit.
    "t34_bpe_token_ids" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val merges = TextOps.bpeMerges(docs, "text", nMerges = 4)
        .orderBy("step").select("left", "right")
        .as[(String, String)].collect().toSeq
      // two consumers (the vocab aggregate collect, the token-id join) —
      // persist lazily so the per-token merge fold runs once
      val enc = TextOps.bpeEncode(docs, "doc_id", "text", merges)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val vocabLocal = enc.groupBy(col("token"))
        .agg(count(lit(1)).as("freq"))
        .as[(String, Long)].collect()
        .sortWith((x, y) =>
          x._2 > y._2 || (x._2 == y._2 && TextOps.utf8Lt(x._1, y._1)))
        .zipWithIndex.map { case ((t, _), i) => (t, i + 1L) }
      val vocab = broadcast(vocabLocal.toSeq.toDF("token", "token_id"))
      enc.join(vocab, "token")
        .select(col("id").as("doc_id"), col("word_idx"), col("token_idx"),
          col("token"), col("token_id"))
    }),

    // Deterministic text normalization (typographic folds, the
    // documented RE2∩Java subset of NFKC) over text salted with every
    // fold class so the gate exercises real folds on every row.
    "t35_text_normalize" -> ((s, d) => {
      val salted = Tables.documents(s, d).select(col("doc_id"),
        concat(coalesce(col("text"), lit("")),
          // salt via \u escapes: curly quotes, em dash, NBSP,
          // ZWSP, a control char — every fold class on every row
          lit(" \u201Cq\u201D \u2018s\u2019 \u2014 a\u00A0b\u200Bc\u0007d"))
          .as("text"))
      TextOps.normalizeText(salted, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // Train → apply calibration round trip (the t27→t29 pattern for the
    // quality classifier): epoch-3 weights score the full corpus,
    // equal-width logit bins grade score mass against the rule labels —
    // the inspect-before-you-filter table a production quality gate
    // reads before choosing its threshold. Width bins, not ntile: the
    // quantile variant needs a global rank (a full sort at 100 TB).
    "t33_quality_apply" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val w = TextOps.trainQualityClassifier(docs, "doc_id", "text",
          epochs = 3, lr = 1.0, holdout = true)
        .filter(col("epoch") === 3).head()
      TextOps.applyQualityScore(docs, "doc_id", "text",
        (1 to 6).map(w.getDouble), nBins = 10)
    }),

    // Dedup release audit: the cluster-size histogram of the exact
    // content-digest relation (how much mass sits at which duplication
    // depth) — the one-aggregate readout that decides whether a corpus
    // needs keep-best dedup before anything heavier runs.
    // contention forced (the q42 device): every 5th doc gains one
    // mirror and every 25th a second, so the histogram has real mass
    // at sizes 1, 2 AND 3 instead of the all-unique corpus's one row
    "d24_dedup_audit" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val m1 = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 600000).as("doc_id"), col("text"))
      val m2 = docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 700000).as("doc_id"), col("text"))
      docs.unionByName(m1).unionByName(m2)
        .groupBy(md5(col("text")).as("h")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_docs"))
    }),

    // Streaming keep-best, BATCH-TWIN gate row: keepBestStream's
    // flatMapGroupsWithState executes in batch mode with empty state,
    // where the contract ("last emitted row per digest == keep-best
    // over everything seen") degenerates to exactly the batch
    // priorityKeep answer — the convention that lets the stateful
    // streaming operator itself (not a lookalike) be value-checked by
    // the DuckDB gate. Contention is forced: the corpus unions a
    // shifted-id mirror so every digest has ≥2 contenders.
    "q42_keepbest_stream_batch" -> ((s, d) => {
      import s.implicits._
      val base = Tables.documents(s, d).select(
        md5(col("text")).as("digest"), col("doc_id"),
        (col("doc_id") % 3).cast("int").as("priority"), col("text"))
      val mirror = Tables.documents(s, d).select(
        md5(col("text")).as("digest"),
        (col("doc_id") + 500000).as("doc_id"),
        ((col("doc_id") + 500000) % 3).cast("int").as("priority"),
        col("text"))
      graft.streaming.EventStream.keepBestStream(
        base.unionByName(mirror).as[graft.streaming.EventStream.KeepBestDoc])
        .toDF()
    }),

    // Streaming windowed top-k, BATCH-TWIN gate row: the watermarked
    // tumbling-window counts + sink-edge rank run on the batch events
    // relation (withWatermark is a no-op in batch), so the exact
    // operator pair StreamingSpec proves stream≡batch for is also
    // value-checked against DuckDB.
    "q43_windowed_topk_batch" -> ((s, d) =>
      graft.streaming.EventStream.topKPerWindow(
        graft.streaming.EventStream.windowedTypeCounts(
          Tables.events(s, d), windowMinutes = 60, horizon = "2 hours"),
        k = 3)),

    // Stopword-bank language ID with deterministic argmax tie-break.
    "t01_langid" -> ((s, d) => {
      val t = col("text")
      val en = TextOps.stopwordCount(t, stops("en"))
      val es = TextOps.stopwordCount(t, stops("es"))
      val de = TextOps.stopwordCount(t, stops("de"))
      val fr = TextOps.stopwordCount(t, stops("fr"))
      Tables.documents(s, d).select(
        col("doc_id"), en.as("en_n"), es.as("es_n"), de.as("de_n"), fr.as("fr_n"),
        when(en >= es && en >= de && en >= fr, "en")
          .when(es >= de && es >= fr, "es")
          .when(de >= fr, "de").otherwise("fr").as("pred_lang"))
    }),

    // Quality scoring: length/stopword/uppercase ratios + composite.
    "t02_quality_score" -> ((s, d) => {
      val t = col("text")
      val nWords = size(split(t, " "))
      val avgWlen = round(length(t).cast("double") / nWords, 4)
      val stopRatio = round(TextOps.stopwordCount(t, stops("en")).cast("double") / nWords, 4)
      val upperRatio = round(
        length(regexp_replace(t, "[^A-Z]", "")).cast("double") / length(t), 4)
      Tables.documents(s, d)
        .select(col("doc_id"), nWords.as("n_words"), avgWlen.as("avg_wlen"),
          stopRatio.as("stop_ratio"), upperRatio.as("upper_ratio"))
        // 7dp: every component terminates at ≤6 decimals (4dp inputs ×
        // {0.4, 0.03} effective weights), so 7dp rounding never sits on a
        // half-boundary where Spark's and DuckDB's rounding could split.
        .withColumn("quality",
          round(lit(0.4) * col("stop_ratio")
            + lit(0.3) * least(col("avg_wlen") / 10.0, lit(1.0))
            + lit(0.3) * (lit(1.0) - col("upper_ratio")), 7))
    }),

    // Token counting: whitespace tokens + BPE-ish regex tokens.
    "t03_token_count" -> ((s, d) => {
      val t = col("text")
      Tables.documents(s, d).select(
        col("doc_id"),
        TextOps.wsTokenCount(t).as("ws_tokens"),
        TextOps.bpeTokenCount(t).as("bpe_tokens"))
    }),

    // Document fingerprinting: normalized-content md5 + min shingle hash.
    // words PROJECTED below the shingle transform (the shinglesOfWords
    // discipline): the raw-text form re-splits inside the interpreted
    // HOF lambda — 6.4 s -> honest sub-second once projected
    "t04_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          TextOps.words(col("text")).as("__w"))
        .select(
          col("doc_id"),
          TextOps.fingerprint(col("text")).as("fp"),
          TextOps.minShingleHashOfWords(col("__w"), 3).as("min_shingle"))),

    // Vocabulary building: corpus-level top-k terms by frequency — the
    // standard first pass of tokenizer training. The top-k runs as a
    // distributed TakeOrderedAndProject after the frequency aggregate
    // (map-side partial counts); only the k survivors see the rank window.
    "t05_vocab_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val freq = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("freq"))
      freq.orderBy(col("freq").desc, col("term").asc).limit(100)
        // post-limit: the unpartitioned window ranks only the 100
        // survivors — bounded by design
        .withColumn("rank", row_number()
          .over(Window.orderBy(col("freq").desc, col("term").asc)))
    }),

    // Benchmark decontamination: training docs (99% of the corpus)
    // sharing any distinct 3-gram with the held-out eval slice
    // (doc_id % 97 = 0) — broadcast eval shingle set, map-side join.
    "d09_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.contaminated(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 3)
        .withColumnRenamed("id", "doc_id")
    }),

    // Repetition ratio (Gopher-style quality signal): duplicated-3-gram
    // fraction per document; high values mark low-quality repetitive text.
    "t07_repetition_ratio" -> ((s, d) => {
      // words PROJECTED first — inlining the split expression into the
      // shingle HOF re-splits the document per element (interpreted
      // lambda, no CSE): the honest bench showed 12 s for what is a
      // sub-second projection over the bound array
      val w = col("__w")
      val total = greatest(size(w) - 2, lit(0))
      val dct = size(TextOps.shinglesOfWords(w, 3))
      Tables.documents(s, d)
        .select(col("doc_id"), TextOps.words(col("text")).as("__w"))
        .select(col("doc_id"),
          total.as("n_3grams"), dct.as("n_distinct"),
          round(when(total > 0,
            lit(1.0) - dct.cast("double") / total.cast("double"))
            .otherwise(lit(0.0)), 6).as("rep_ratio"))
    }),

    // Deterministic content-hash sampling: md5-derived bucket < 10 of 100
    // (~10% sample). Content-hashed, so the sample is stable across
    // partitioning, retries, and cluster size — the property
    // rand()-based sampling loses at 100 TB.
    "t08_deterministic_sample" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          (conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long") % 100)
            .as("bucket"))
        .filter(col("bucket") < 10)),

    // Dedup APPLY — the 100 TB pipeline end to end: LSH-bucketed
    // candidate pairs (linear, no all-pairs) → exact-cosine verify →
    // connected components → keep-list left join against the corpus
    // (a vector survives iff it is its cluster's canonical minimum or
    // was never paired). d07 exercises the component machinery on the
    // rich exact-pairs graph; this is the composition a real corpus runs.
    "d10_dedup_apply" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cl = Dedup.clusters(
        Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
          dim = 64, threshold = 0.45, nbits = 8, bands = 4),
        "id_a", "id_b")
      emb.join(broadcast(cl), emb("vec_id") === cl("id"), "left")
        .filter(col("cluster").isNull || col("cluster") === col("vec_id"))
        .select(col("vec_id"), col("label"))
    }),

    // Stratified (per-group quota) sampling: deterministic top-50 per
    // language by content-hash order — the data-mixing primitive for
    // balancing sources/languages. Rank-limit windows compile to
    // WindowGroupLimit, so each group is cut map-side before the sort.
    "t09_stratified_sample" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("text")), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 50)
        .select(col("doc_id"), col("lang"), col("rk"))
    }),

    // Percentile-band length filter: drop documents outside the exact
    // [P05, P95] whitespace-token-count band — the standard outlier-length
    // cut of a training-data pipeline. Exact `percentile` here so the
    // oracle reproduces it bit-for-bit; at 100 TB the same plan runs with
    // `approx_percentile` (documented mode switch, like VoID's).
    "t06_length_percentile_filter" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), TextOps.wsTokenCount(col("text")).as("ws_tokens"))
      val bounds = docs.agg(
        expr("percentile(ws_tokens, 0.05)").as("p05"),
        expr("percentile(ws_tokens, 0.95)").as("p95"))
      docs.crossJoin(broadcast(bounds))
        .filter(col("ws_tokens") >= col("p05") && col("ws_tokens") <= col("p95"))
        .select("doc_id", "ws_tokens")
    }),

    // PII scrubbing: count + redact emails / IPv4s / phone-shaped tokens.
    // The synthetic corpus carries no PII, so each row is salted with
    // deterministic doc_id-derived PII tokens FIRST (same expression in
    // the oracle — both engines see identical dirty text); the scrub
    // chain then has real work to do on every row. Map-only, codegen'd.
    "t10_pii_scrub" -> ((s, d) => {
      val dirty = concat(col("text"),
        lit(" user"), col("doc_id").cast("string"), lit("@example.com 203.0.113."),
        (col("doc_id") % 256).cast("string"), lit(" +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      Tables.documents(s, d)
        .select(col("doc_id"), dirty.as("dirty"))
        .select(col("doc_id"),
          regexp_count(col("dirty"), lit(TextOps.emailRe)).as("n_emails"),
          regexp_count(col("dirty"), lit(TextOps.ipv4Re)).as("n_ips"),
          regexp_count(col("dirty"), lit(TextOps.phoneRe)).as("n_phones"),
          TextOps.piiScrub(col("dirty")).as("clean"))
    }),

    // URL extraction + domain blocklist filtering: pull URLs out of the
    // text, take the host, keep only blocklisted hosts (the removal set).
    // The blocklist is a parameter table — tiny by construction — so the
    // join is an explicit broadcast; the corpus side stays map-only.
    // URLs are doc_id-salted like t10 (corpus text carries none).
    "t11_url_blocklist" -> ((s, d) => {
      import s.implicits._
      val dirty = concat(col("text"),
        lit(" https://site"), (col("doc_id") % 20).cast("string"),
        lit(".example.org/p/"), col("doc_id").cast("string"),
        lit(" http://cdn"), (col("doc_id") % 7).cast("string"),
        lit(".assets.net/x.js"))
      val blocklist = Seq("site0.example.org", "site1.example.org",
        "site2.example.org", "cdn0.assets.net").toDF("host")
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(regexp_extract_all(dirty, lit(TextOps.urlRe), lit(0))).as("url"))
        .select(col("doc_id"), col("url"), TextOps.urlHost(col("url")).as("host"))
        .join(broadcast(blocklist), "host")
        .select(col("doc_id"), col("host"), col("url"))
    }),

    // Mean unigram log-probability under the corpus's own unigram LM —
    // the cheap language-model quality proxy (one vocab shuffle + one
    // re-join; vocabulary relation ≪ corpus).
    "t12_unigram_logprob" -> ((s, d) =>
      TextOps.unigramLogProb(Tables.documents(s, d), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // Bigram-LM quality proxy — mean conditional ln p(w2|w1); the signal
    // that separates word salad from text with normal word frequencies.
    "t18_bigram_logprob" -> ((s, d) =>
      TextOps.bigramLogProb(Tables.documents(s, d), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // Context-window chunking: overlapping 64-token windows, stride 48 —
    // the packing primitive before tokenization. Map-only generator.
    "t13_chunk_windows" -> ((s, d) =>
      TextOps.chunkTokens(Tables.documents(s, d), "doc_id", "text",
        chunkSize = 64, overlap = 16)
        .withColumnRenamed("id", "doc_id")),

    // tf·idf top-3 terms per document (rank ties broken on the term;
    // ranking runs on the 4dp-rounded score so both engines order
    // identically even where two tf/df combinations are mathematically
    // equal but differ in the last float bit).
    "t14_tfidf_topk" -> ((s, d) =>
      TextOps.tfidfTopK(Tables.documents(s, d), "doc_id", "text", k = 3)
        .withColumnRenamed("id", "doc_id")),

    // Temperature-flattened source mixing (alpha = 0.5): per-source
    // sampling weight and resampled document budget.
    "t15_mixing_weights" -> ((s, d) =>
      TextOps.mixingWeights(Tables.documents(s, d), "source", alpha = 0.5)),

    // Weighted mix APPLY — t15's temperature-flattened weights driving
    // t08's deterministic content-hash sampling, per source: the total
    // training budget is 60% of the corpus, split by the flattened
    // weights; accept a doc iff its md5 bucket falls under the source's
    // resulting rate (capped at 1 — upsampling of rare sources is a
    // repeat pass, not a filter). Broadcast rate dim; stable across
    // partitioning/retries — the composition that actually builds a
    // training mix at 100 TB.
    "t17_weighted_mix_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val rates = TextOps.mixingWeights(docs, "source", alpha = 0.5)
        .select(col("source"),
          least(lit(1.0),
            lit(0.6) * col("target_n").cast("double") / col("n_docs")).as("rate"))
      docs.join(broadcast(rates), "source")
        .filter((conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
          % 1000000).cast("double") < col("rate") * 1000000d)
        .select(col("doc_id"), col("source"))
    }),

    // Token-budget packing: assign documents to fixed-budget training
    // bins per source, in deterministic doc_id order — running token
    // count before each doc, integer-divided by the budget. One shuffle
    // (the per-source window); bins are stable across partitioning
    // because the order key is total.
    "t16_token_budget_packing" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextOps.wsTokenCount(col("text")).as("n_tokens"))
        .withColumn("bin",
          (coalesce(sum(col("n_tokens")).over(w), lit(0)) / 1000).cast("long"))
    }),

    // Text dedup APPLY, exact-pair flavor: n-gram Jaccard pairs (exact,
    // PPJoin-filtered) → connected components → keep-list anti-filter on
    // the corpus. The document-side twin of d10 whose every stage an
    // external oracle reproduces (d10's pair source is LSH-bucketed).
    "d11_dedup_apply_text" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cl = Dedup.clusters(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8),
        "id_a", "id_b")
      docs.join(broadcast(cl), docs("doc_id") === cl("id"), "left")
        .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
        .select(col("doc_id"), col("source"))
    }),

    // Multimodal plumbing: binary payload + typed metadata projection
    // (decode STUB exercised via mapPartitions in the test suite).
    "m01_multimodal_meta" -> ((s, d) =>
      Multimodal.withBinaryPayload(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
          col("meta.checksum").as("checksum"), col("meta.mime").as("mime"))),

    // Multimodal frame sampling: every 2nd 64-byte frame of each payload,
    // identified by content digest. The documents corpus is ASCII, so the
    // DuckDB oracle's character slicing coincides with the engine's byte
    // slicing (verified: octet_length == length for every row).
    "m02_frame_sample" -> ((s, d) =>
      Multimodal.frameSample(
          Multimodal.withBinaryPayload(Tables.documents(s, d), "doc_id", "text"),
          "doc_id", "payload", frameBytes = 64, every = 2)
        .select(col("doc_id"), col("frame_no"),
          md5(col("frame")).as("frame_md5"),
          length(col("frame")).cast("long").as("frame_bytes"))),

    // ANN recall audit: per-query recall@3 of the IVF scale path (s03
    // parameters) against the exact baseline (s01) — the tuning loop a
    // production ANN deployment runs on every index build. Both sides
    // are k·|queries| rows, so the audit costs one bounded shuffle
    // regardless of corpus size.
    "s08_ann_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
      Similarity.recallAtK(
        Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 3),
        Similarity.ivfTopK(emb, q, "vec_id", "embedding",
          k = 3, nlist = 16, nprobe = 4))
    }),

    // Snapshot-incremental exact dedup: a fresh crawl batch (the last
    // doc_id decile + a re-delivered shard under remapped ids) deduped
    // against the prior corpus by content digest — Bloom-pruned before
    // the anti join, so only probable re-deliveries shuffle. Survivors
    // are exactly the genuinely-new rows.
    "d14_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val old = docs.filter(col("doc_id") % 10 < 8)
      val fresh = docs.filter(col("doc_id") % 10 >= 8)
        .union(docs.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 100000))
      Dedup.incrementalNew(old, fresh, "text", expectedOld = 1L << 20)
        .select(col("doc_id"), col("source"), col("n_chars"))
    }),

    // DSIR importance weights: hashed-unigram target/raw likelihood
    // ratio per document (target = the corpus's English slice), the
    // importance-resampling score for building a training mix that
    // matches a curated distribution.
    "t19_dsir_weights" -> ((s, d) =>
      TextOps.dsirWeights(Tables.documents(s, d), "doc_id", "text",
          isTarget = col("lang") === "en", buckets = 64)
        .withColumnRenamed("id", "doc_id")),

    // Deterministic training-order shuffle: reproducible pseudo-random
    // global positions from (seed, id) only — per-bucket windows, no
    // global sort, so any cluster size reconstructs the same order.
    "t20_deterministic_shuffle" -> ((s, d) =>
      TextOps.deterministicShuffle(Tables.documents(s, d), "doc_id",
          seed = "epoch0", buckets = 16)
        .withColumnRenamed("id", "doc_id")),

    // Cross-payload duplicated-frame detection: frame digests shared by
    // ≥2 payloads (reused-footage signal) over the m02 frame sample —
    // the shuffle moves 16-byte digests, never frame bytes.
    "m03_duplicate_frames" -> ((s, d) =>
      Multimodal.duplicateFrames(
        Multimodal.frameSample(
          Multimodal.withBinaryPayload(Tables.documents(s, d), "doc_id", "text"),
          "doc_id", "payload", frameBytes = 64, every = 1),
        "doc_id")),

    // Persisted-MinHash incremental near-dup (the text twin of s07's
    // persisted IVF): the prior corpus's band buckets live in a bucketed
    // index table built once; a fresh batch (last doc_id decile + a
    // re-delivered shard under remapped ids) probes it — only the batch
    // computes signatures, only the batch shuffles. md5 permutation
    // family so the whole incremental pipeline is value-checked.
    "d15_minhash_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val old = docs.filter(col("doc_id") % 10 < 8)
      val fresh = docs.filter(col("doc_id") % 10 >= 8)
        .union(docs.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 100000))
      val path = s"${sys.props("java.io.tmpdir")}/graft_mh_idx/" +
        graft.core.Digest.md5IdScala(d)
      Dedup.writeMinhashIndex(old, "doc_id", "text", "graft_mh_index", path,
        numPerm = 32, bands = 8, family = "md5")
      Dedup.minhashIncremental(s, "graft_mh_index", fresh, "doc_id", "text",
        numPerm = 32, bands = 8, threshold = 0.5, family = "md5")
    }),

    // MinHash index append-conservation (the s31 device on the dedup
    // side): build the band index on 60% of the corpus, append the
    // next 20% as a crawl batch (deterministic signatures → the
    // appended index is row-identical to a fresh build over the
    // union), then probe with d15's fresh batch — the oracle IS d15's
    // (its index side covers doc_id % 10 < 8 either way).
    "d25_minhash_index_append" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val fresh = docs.filter(col("doc_id") % 10 >= 8)
        .union(docs.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 100000))
      val path = s"${sys.props("java.io.tmpdir")}/graft_mh_app_idx/" +
        graft.core.Digest.md5IdScala(d)
      Dedup.writeMinhashIndex(docs.filter(col("doc_id") % 10 < 6),
        "doc_id", "text", "graft_mh_app", path,
        numPerm = 32, bands = 8, family = "md5")
      Dedup.appendMinhashIndex(s,
        docs.filter(col("doc_id") % 10 >= 6 && col("doc_id") % 10 < 8),
        "doc_id", "text", "graft_mh_app",
        numPerm = 32, bands = 8, family = "md5")
      Dedup.minhashIncremental(s, "graft_mh_app", fresh, "doc_id", "text",
        numPerm = 32, bands = 8, threshold = 0.5, family = "md5")
    }),

    // URL-canonicalization dedup: crawl-level keep-first by canonical
    // URL — tracking params/fragments stripped, host lowercased, http
    // folded to https — so the 20 delivery variants of each page
    // collapse to one keeper. URLs are doc_id-salted like t10/t11 (the
    // corpus text carries none), with case noise and utm junk varied per
    // doc so the canonicalizer has real work on every row. Map-only
    // canonicalization + one groupBy on the canonical key.
    "d16_url_dedup" -> ((s, d) => {
      val salted = concat(
        when(col("doc_id") % 2 === 0, lit("HTTP://Site")).otherwise(lit("http://site")),
        (col("doc_id") % 20).cast("string"),
        when(col("doc_id") % 3 === 0, lit(".Example.ORG/page/")).otherwise(lit(".example.org/page/")),
        (col("doc_id") % 50).cast("string"),
        when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=s"), col("doc_id").cast("string"),
        lit("&utm_campaign=c"), (col("doc_id") % 5).cast("string"),
        lit("#frag"), (col("doc_id") % 7).cast("string"))
      Tables.documents(s, d)
        .select(col("doc_id"), TextOps.urlCanonicalize(salted).as("canon_url"))
        .groupBy(col("canon_url"))
        .agg(min(col("doc_id")).as("keep_doc_id"),
          count(lit(1)).as("n_variants"))
    }),

    // Corpus-wide chunk dedup with reassembly (paragraph dedup): each
    // 3-word chunk survives only at its first corpus-order occurrence;
    // documents come back reassembled from surviving chunks. chunkWords=3
    // at test SF so the synthetic vocabulary actually collides; the
    // operator's shape (chunk-hash window + per-doc regroup) is
    // unchanged at paragraph-sized chunks.
    "t21_chunk_dedup" -> ((s, d) =>
      TextOps.chunkDedup(Tables.documents(s, d), "doc_id", "text",
          chunkWords = 3)
        .withColumnRenamed("id", "doc_id")),

    // Soft dedup: near-dup cluster members down-weighted to 1/|cluster|
    // instead of dropped (duplication-aware reweighting — each distinct
    // content contributes unit mass to the training mix). Clusters are
    // d07's connected components over the exact cosine pairs; unpaired
    // rows are singletons at weight 1.
    "d17_soft_dedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Dedup.softWeights(emb, "vec_id",
        Dedup.clusters(
          Similarity.nearDupPairs(emb, "vec_id", "embedding", threshold = 0.35),
          "id_a", "id_b"))
        .withColumnRenamed("id", "vec_id")
    }),

    // Audio↔video alignment: every audio chunk (256-byte framing of the
    // payload, 23 ms tick) attached to the most recent sampled video
    // frame (64-byte frames, every 2nd kept, 40 ms tick) of the SAME
    // payload — the as-of join a multimodal pair builder runs. Chunks
    // before the first kept frame keep nulls (A/V leader visibility).
    "m04_av_sync" -> ((s, d) => {
      val media = Multimodal.withBinaryPayload(Tables.documents(s, d), "doc_id", "text")
      val frames = Multimodal.frameSample(media, "doc_id", "payload",
          frameBytes = 64, every = 2)
        .select(col("doc_id"), col("frame_no"),
          (col("frame_no") * 40L).as("frame_pts"))
      val chunks = media
        .filter(col("meta.n_bytes") > 0) // guard the descending-sequence corner
        .select(col("doc_id"),
          explode(sequence(lit(0L),
            floor((col("meta.n_bytes") - 1) / 256).cast("long"))).as("chunk_no"))
        .select(col("doc_id"), col("chunk_no"),
          (col("chunk_no") * 23L).as("chunk_pts"))
      Multimodal.avSync(frames, chunks, "doc_id")
        .select(col("doc_id"), col("chunk_no"), col("chunk_pts"),
          col("frame_no"), col("frame_pts"))
    }),

    // Source-priority dedup (keep-best): the doc_id%7 slice re-arrives
    // from an untrusted mirror under remapped ids; per content digest
    // the most trusted copy survives (trusted original rank 1, mirror
    // rank 2; ties by id). The keep-best twin of d01's keep-first.
    "d18_priority_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val mirrored = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 200000)
        .withColumn("source", concat(lit("mirror_"), col("source")))
      Dedup.priorityKeep(docs.unionByName(mirrored), "doc_id", "text",
          when(col("source").startsWith("mirror_"), lit(2)).otherwise(lit(1)))
        .select(col("doc_id"), col("source"), col("priority"), col("n_copies"))
    }),

    // Deterministic training-shard writer: the corpus lands as JSONL
    // shards of ≤128 docs in t20's reproducible training order (one
    // hash repartition on the shard id — one file per shard, no global
    // sort); the driver-checked output is the manifest read BACK from
    // the written files, so the whole sink round-trips through the gate.
    "t22_training_shards" -> ((s, d) => {
      val out = s"${sys.props("java.io.tmpdir")}/graft_shards/" +
        graft.core.Digest.md5IdScala(d)
      graft.sinks.TrainingShards.writeJsonlShards(
        Tables.documents(s, d), "doc_id", Seq("text", "lang", "source"),
        out, seed = "epoch0", shardRows = 128, buckets = 16)
      graft.sinks.TrainingShards.manifest(s, out)
    }),

    // Containment near-dup pairs (excerpt/quote suppression): the corpus
    // ∪ a 12-word excerpt of every 10th doc (id+300000) — the shape
    // Jaccard provably misses (the union term dilutes a short quote
    // inside a long doc). Scored over the informative (df ≤ maxDf)
    // shingle space, so true excerpts hit containment 1.0 even with the
    // boilerplate cap active; maxDf=5 genuinely prunes at this SF (max
    // corpus shingle df is 7).
    "d19_containment" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val excerpts = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 300000).as("doc_id"),
          array_join(slice(TextOps.words(col("text")), 1, 12), " ").as("text"))
      Dedup.containmentPairs(
        docs.select("doc_id", "text").unionByName(excerpts),
        "doc_id", "text", n = 3, threshold = 0.9, maxDf = 5)
    }),

    // Containment APPLY — detection and suppression as separate ops (the
    // d10/d11 pattern): containment pairs → connected components →
    // keep-list (survive iff never clustered or the cluster's canonical
    // minimum). Every planted excerpt dies (its cluster representative
    // is the original's lower id); chained containments collapse to one
    // keeper per component.
    "d20_containment_apply" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val excerpts = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 300000).as("doc_id"),
          array_join(slice(TextOps.words(col("text")), 1, 12), " ").as("text"),
          lit("excerpt").as("source"))
      val all = docs.select("doc_id", "text", "source").unionByName(excerpts)
      val cl = Dedup.clusters(
        Dedup.containmentPairs(all, "doc_id", "text",
          n = 3, threshold = 0.9, maxDf = 5),
        "contained_id", "container_id")
      all.join(broadcast(cl), all("doc_id") === cl("id"), "left")
        .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
        .select(col("doc_id"), col("source"))
    }),

    // Leak-free train/val/test split: every member of a near-dup cluster
    // (d07's connected components over exact cosine pairs) lands in the
    // SAME split — no near-duplicate of a val/test doc can sit in train.
    // The split hashes the cluster REPRESENTATIVE (min member id;
    // singletons represent themselves), so it is reproducible on any
    // cluster size and stable under re-runs.
    "t23_leakfree_split" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Dedup.leakFreeSplit(emb, "vec_id",
        Dedup.clusters(
          Similarity.nearDupPairs(emb, "vec_id", "embedding", threshold = 0.35),
          "id_a", "id_b"),
        seed = "split0", pctTrain = 80, pctVal = 10)
        .withColumnRenamed("id", "vec_id")
    }),

    // Interleaved multimodal sequence packing: each media item's sampled
    // video frames (every 2nd 64-byte frame, 40 ms tick, 16 image
    // tokens) and text chunks (256-byte framing, 23 ms tick, varying
    // n_tokens) merge into one pts-ordered stream cut into 64-token
    // training sequences — the Flamingo/MM1-style interleaved layout.
    // One shuffle: the per-id running-token window.
    "m05_interleaved_pack" -> ((s, d) => {
      val media = Multimodal.withBinaryPayload(Tables.documents(s, d), "doc_id", "text")
      val frames = Multimodal.frameSample(media, "doc_id", "payload",
          frameBytes = 64, every = 2)
        .select(col("doc_id"), col("frame_no"),
          (col("frame_no") * 40L).as("frame_pts"))
      val chunks = media
        .filter(col("meta.n_bytes") > 0)
        .select(col("doc_id"),
          explode(sequence(lit(0L),
            floor((col("meta.n_bytes") - 1) / 256).cast("long"))).as("chunk_no"))
        .select(col("doc_id"), col("chunk_no"),
          (col("chunk_no") * 23L).as("chunk_pts"),
          (col("chunk_no") % 13 + 1).as("n_tokens"))
      Multimodal.interleavedPack(frames, chunks, "doc_id",
        imageTokens = 16, budget = 64)
    }),

    // The corpus-release recipe as ONE gated row: d18's keep-best exact
    // dedup over corpus ∪ untrusted mirror, near-dup clusters (exact
    // PPJoin Jaccard pairs at 0.8 — the LSH twin swaps in unchanged at
    // scale), 1/|C| soft weights, and the leak-free split, all from one
    // composition (graft.operators.CorpusRelease.plan). The oracle
    // re-derives every stage in SQL.
    "t24_corpus_release" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val mirrored = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 200000)
        .withColumn("source", concat(lit("mirror_"), col("source")))
      graft.operators.CorpusRelease.plan(
          docs.unionByName(mirrored), "doc_id", "text",
          when(col("source").startsWith("mirror_"), lit(2)).otherwise(lit(1)),
          seed = "rel0", n = 3, threshold = 0.8,
          pctTrain = 80, pctVal = 10)
        .select(col("doc_id"), col("source"), col("n_copies"), col("cluster"),
          col("cluster_size"), col("weight"), col("bucket"), col("split"))
    }),

    // t24's scale path made real: the SAME release recipe with the
    // banded MinHash+LSH estimate (d03's device) swapped in as the
    // near-dup pair source — proof the pairSource seam carries the
    // production configuration, gated with its own banded-estimate
    // oracle replaying signatures/bands/threshold over the survivors.
    "t28_corpus_release_lsh" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val mirrored = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 200000)
        .withColumn("source", concat(lit("mirror_"), col("source")))
      graft.operators.CorpusRelease.plan(
          docs.unionByName(mirrored), "doc_id", "text",
          when(col("source").startsWith("mirror_"), lit(2)).otherwise(lit(1)),
          seed = "rel0", pctTrain = 80, pctVal = 10,
          pairSource = Some(surv => Dedup.minhashPairs(surv, "doc_id",
            "text", numPerm = 32, bands = 8, threshold = 0.5,
            family = "md5")))
        .select(col("doc_id"), col("source"), col("n_copies"), col("cluster"),
          col("cluster_size"), col("weight"), col("bucket"), col("split"))
    }),

    // The release DATASHEET (the data card every public corpus ships —
    // Pile/ROOTS/Dolma publish exactly this table): per (source, split)
    // document, token and soft-weight mass of the t24 release plan.
    // One aggregate over the plan relation; weights sum as decimal
    // (the s15 lesson — never rank or publish a float sum).
    "t36_release_report" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(30, 12)
      val docs = Tables.documents(s, d)
      val mirrored = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 200000)
        .withColumn("source", concat(lit("mirror_"), col("source")))
      val all = docs.unionByName(mirrored)
      val rel = graft.operators.CorpusRelease.plan(all, "doc_id", "text",
        when(col("source").startsWith("mirror_"), lit(2)).otherwise(lit(1)),
        seed = "rel0", n = 3, threshold = 0.8, pctTrain = 80, pctVal = 10)
      rel.select(col("doc_id"), col("source"), col("split"), col("weight"))
        .join(all.select(col("doc_id"),
          size(TextOps.words(col("text"))).cast("long").as("toks")),
          "doc_id")
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
          round(sum(col("weight").cast(dec)).cast("double"), 6)
            .as("total_weight"))
    }),

    // Prototype-based corpus pruning (Sorscher et al. "Beyond neural
    // scaling laws"): rank every vector by cosine to its own IVF-cell
    // centroid, drop the most prototypical 25% of each cell — the
    // near-centroid redundant mass; the kept tail carries the
    // information. The pruning twin of d12's near-dup drop.
    "s09_prototype_prune" -> ((s, d) =>
      Similarity.prototypePrune(Tables.embeddings(s, d), "vec_id", "embedding",
          nlist = 8, dropFrac = 0.25)
        .withColumnRenamed("id", "vec_id")),

    // Random projection to k dims (Johnson-Lindenstrauss sketch over the
    // deterministic ±1 hyperplane family s02/d06 share): the dimension-
    // reduction pre-pass a billion-vector ANN build runs before
    // clustering. Map-only; plane literals replayed by the oracle. The
    // operator returns (id, pv: array<double>); the gate query
    // posexplodes to scalar (vec_id, component, value) rows because the
    // driver checker sorts with pandas and cannot order array columns.
    "s10_random_projection" -> ((s, d) =>
      Similarity.randomProject(Tables.embeddings(s, d), "vec_id", "embedding",
          dim = 64, k = 8)
        .withColumnRenamed("id", "vec_id")
        .selectExpr("vec_id", "posexplode(pv) AS (component, value)")
        .withColumn("component", col("component").cast("long"))),

    // BPE merge-candidate table: corpus-wide adjacent character-pair
    // frequencies, top-20 (one training step's candidate ranking).
    "t26_bpe_pair_counts" -> ((s, d) =>
      TextOps.bpePairCounts(Tables.documents(s, d), "text", k = 20)),

    // Four iterations of BPE training: per round the most frequent
    // adjacent symbol pair (ties on the pair) merges greedily
    // left-to-right in every word. The oracle replays each round
    // positionally: candidate positions → greedy odd-rank take within
    // consecutive runs → rebuild, so the fold semantics (a fresh merge
    // never re-matches as LEFT in the same round) are value-checked.
    "t27_bpe_merges" -> ((s, d) =>
      TextOps.bpeMerges(Tables.documents(s, d), "text", nMerges = 4)),

    // BPE ENCODING — the trained 4-merge table applied back to the
    // corpus (train → encode round trip in one gated row): every word
    // occurrence's final tokenization, one scalar row per token. The
    // oracle replays the same positional fold machinery as t27 with
    // (doc_id, word_idx) carried through every round.
    "t29_bpe_encode" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val merges = TextOps.bpeMerges(docs, "text", nMerges = 4)
        .orderBy("step").select("left", "right")
        .as[(String, String)].collect().toSeq
      TextOps.bpeEncode(docs, "doc_id", "text", merges)
        .withColumnRenamed("id", "doc_id")
    }),

    // PII redaction over the corpus with deterministically planted
    // contacts (one email + phone + IPv4 per doc, derived from doc_id,
    // appended identically by engine and oracle) so the redaction does
    // real work on every row instead of no-op'ing on synthetic text.
    "t30_pii_redact" -> ((s, d) => {
      // coalesce: concat null-propagates, so a NULL text row would
      // otherwise redact to ("",0,0,0) while the oracle keeps NULL
      val salted = Tables.documents(s, d).select(col("doc_id"),
        concat(coalesce(col("text"), lit("")),
          lit(" contact u"), col("doc_id").cast("string"),
          lit("@example.com or +4915123"),
          lpad((col("doc_id") % 1000).cast("string"), 4, "0"),
          lit(" at 10.1.2."), (col("doc_id") % 256).cast("string")
        ).as("text"))
      TextOps.piiRedact(salted, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // Dedup recall audit (the text twin of s08's ANN audit): one summary
    // row grading the MinHash+LSH banded estimate against the exact
    // PPJoin Jaccard pairs at the same 0.5 threshold — the tuning loop a
    // production near-dup deployment runs when picking numPerm/bands.
    // Audit cost is two pair distincts + one semi join, a fraction of
    // either dedup pass it grades.
    "d22_dedup_recall_audit" -> ((s, d) =>
      // one shared tokenize+shingle pass feeds both graded passes
      // (r16; each pass's own shuffles and output are unchanged)
      Dedup.recallAudit(Tables.documents(s, d), "doc_id", "text",
        n = 3, exactThreshold = 0.5, numPerm = 32, bands = 8,
        approxThreshold = 0.5, family = "md5")),

    // MinHash-estimated containment (the linear-cost scale twin of d19's
    // exact inverted-index containment): corpus ∪ tail-truncated
    // variants of every 5th doc (last 6 words dropped, id+400000) —
    // near-dup-scale containment, where signature banding recalls the
    // pair and Ĉ = Ĵ(|A|+|B|)/((1+Ĵ)·min) estimates it from the
    // signatures + the exact sizes riding the same aggregate. md5
    // permutation family → the oracle reproduces every signature slot.
    "d21_containment_minhash" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val ws = TextOps.words(col("text"))
      val truncated = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 400000).as("doc_id"),
          array_join(slice(ws, lit(1), greatest(size(ws) - 6, lit(1))), " ")
            .as("text"))
      Dedup.containmentMinhashPairs(
        docs.select("doc_id", "text").unionByName(truncated),
        "doc_id", "text", numPerm = 32, bands = 8, threshold = 0.7,
        family = "md5")
    }),

    // Gopher-rules within-document repetition signals: duplicate-word /
    // top-bigram / duplicate-trigram occurrence fractions + keep flags —
    // the repetition family qualityRules (t04) doesn't cover. Default
    // thresholds split THIS corpus on the dup-word rule (median 0.54 vs
    // the 0.5 cut), so both keep outcomes are exercised.
    "t25_repetition_signals" -> ((s, d) =>
      TextOps.repetitionSignals(Tables.documents(s, d), "doc_id", "text",
        minWords = 5)),

    // Duplicate-span REMOVAL (Lee et al.'s actual transform — d13 is the
    // signal, this cuts the spans): cross-document 5-token windows with
    // ≥2-doc fingerprints mark their positions covered; docs rebuild
    // from uncovered tokens.
    "d23_duplicate_span_removal" -> ((s, d) =>
      Dedup.removeDuplicateSpans(Tables.documents(s, d), "doc_id", "text",
        w = 5)),

    // The Gopher/C4-style length-symbol-stopword rule battery, previously
    // spec-less and gate-less (the round-8 unvalidated-code lesson
    // applied to the one operator that slipped through).
    "t31_quality_rules" -> ((s, d) =>
      TextOps.qualityRules(Tables.documents(s, d), "doc_id", "text")),

    // Logistic-regression quality classifier distilling t31's rule
    // verdict into a smooth scorer: leak-free 80/20 holdout, 3
    // full-batch GD epochs over the train split, weights rounded to
    // 6dp per epoch with EXACT decimal gradient sums (partition-order
    // independent), train + held-out accuracy per epoch; the oracle
    // replays every epoch as a chained CTE.
    "t32_quality_classifier" -> ((s, d) =>
      TextOps.trainQualityClassifier(Tables.documents(s, d), "doc_id",
        "text", epochs = 3, lr = 1.0, holdout = true))
  )

  /** DuckDB twin of [[Similarity.lshNearDupPairs]]: the deterministic
    * SplitMix64 ±1 hyperplanes are interpolated as literal DOUBLE[] so the
    * oracle reproduces the exact bucket ids (both engines evaluate the
    * dot product as a sequential left-to-right sum — identical fp result),
    * then the same collide-in-≥1-band candidate rule + exact cosine. */
  private def lshNearDupOracle(dim: Int, threshold: Double,
                               nbits: Int, bands: Int): String = {
    def planeLit(p: Int): String =
      graft.operators.Similarity.hyperplane(p, dim)
        .map(v => if (v > 0) "1" else "-1").mkString("[", ",", "]::DOUBLE[]")
    val bucketExprs = (0 until bands).map { b =>
      (0 until nbits).map { j =>
        s"(CASE WHEN list_dot_product(v, ${planeLit(b * nbits + j)}) > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ") + s" AS bucket_$b"
    }.mkString(",\n           ")
    val collide = (0 until bands).map(b => s"a.bucket_$b = c.bucket_$b")
      .mkString(" OR ")
    s"""WITH b AS (
           SELECT vec_id, embedding::DOUBLE[] AS v,
           $bucketExprs
           FROM embeddings),
         cand AS (
           SELECT a.vec_id AS id_a, c.vec_id AS id_b,
                  list_dot_product(a.v, c.v)
                    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
           FROM b a JOIN b c ON a.vec_id < c.vec_id AND ($collide))
         SELECT id_a, id_b, round(sim, 6) AS sim FROM cand WHERE sim > $threshold"""
  }

  /** d03 oracle: the md5-arithmetic permutation family — one md5 per
    * shingle reduced mod 2^31−1, then the engine's exact
    * [[graft.operators.Dedup.minhashCoeffs]] (aᵢ·h+bᵢ) mod p
    * permutations as generated literals, band buckets as joined decimal
    * values, estimated Jaccard over the signature lists. */
  private def minhashOracle(numPerm: Int, bands: Int,
                            threshold: Double): String =
    s"""WITH ${minhashEstCtes("documents", numPerm, bands)}
         SELECT id_a, id_b, round(ej, 6) AS est_jaccard
         FROM mh_est WHERE ej >= $threshold"""

  /** The banded-MinHash estimate as a spliceable CTE chain over `src`
    * (doc_id, text) — exposes `mh_est` (id_a, id_b, ej). Shared by the
    * d03/d22 oracles (src = documents) and the t28 release oracle
    * (src = the exact-dedup survivors). */
  private def minhashEstCtes(src: String, numPerm: Int, bands: Int): String = {
    val rows = numPerm / bands
    val mins = (0 until numPerm).map { i =>
      val (a, b) = graft.operators.Dedup.minhashCoeffs(i)
      s"min(($a*h0+$b)%2147483647) AS h$i"
    }.mkString(",\n                  ")
    val sigList = (0 until numPerm).map(i => s"h$i").mkString("[", ",", "]")
    s"""mh_w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM $src),
         mh_sh AS (SELECT DISTINCT doc_id,
                  ws[n]||' '||ws[n+1]||' '||ws[n+2] AS sh
                FROM (SELECT doc_id, ws,
                        unnest(generate_series(1, greatest(len(ws)-2, 0))) AS n
                      FROM mh_w) t),
         mh_base AS (SELECT doc_id,
                    ('0x'||substr(md5(sh),1,15))::BIGINT % 2147483647 AS h0
                  FROM mh_sh),
         mh_hs AS (SELECT doc_id,
                  $mins
                FROM mh_base GROUP BY 1),
         mh_sig AS (SELECT doc_id, $sigList AS sig FROM mh_hs),
         mh_bnd AS (SELECT doc_id, sig, b,
                  array_to_string(list_slice(sig, b*$rows+1, b*$rows+$rows),
                    '|') AS bh
                 FROM mh_sig, (SELECT unnest(range(0, $bands)) AS b) bb),
         mh_cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                    a.sig AS sa, b.sig AS sb
                  FROM mh_bnd a JOIN mh_bnd b
                    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
         mh_est AS (SELECT id_a, id_b,
                   len(list_filter(range(1, ${numPerm + 1}),
                     i -> sa[i] = sb[i]))/$numPerm.0 AS ej
                 FROM mh_cand)"""
  }

  /** t28 oracle: the t24 release oracle with its exact pair stage
    * replaced by the banded-MinHash estimate over the survivors —
    * every other stage (keep-best rank, connected components, weights,
    * bucket/split) replayed identically. */
  private def corpusReleaseLshOracle(numPerm: Int, bands: Int,
                                     threshold: Double): String =
    s"""WITH RECURSIVE
         all_docs AS (
           SELECT doc_id, text, source FROM documents
           UNION ALL
           SELECT doc_id + 200000, text, 'mirror_' || source
           FROM documents WHERE doc_id % 7 = 0),
         ranked AS (
           SELECT doc_id, text, source,
                  row_number() OVER (PARTITION BY md5(text)
                    ORDER BY (CASE WHEN starts_with(source, 'mirror_') THEN 2 ELSE 1 END), doc_id) AS rk,
                  count(*) OVER (PARTITION BY md5(text)) AS n_copies
           FROM all_docs),
         surv AS (SELECT doc_id, text, source, n_copies FROM ranked WHERE rk = 1),
         ${minhashEstCtes("surv", numPerm, bands)},
         pairs AS (SELECT id_a, id_b FROM mh_est WHERE ej >= $threshold),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach(id, lbl) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id),
         cl AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id),
         sz2 AS (SELECT cluster, count(*) AS cluster_size FROM cl GROUP BY cluster),
         rel AS (SELECT s.doc_id, s.source, s.n_copies,
                        coalesce(cl.cluster, s.doc_id) AS cluster,
                        coalesce(sz2.cluster_size, 1) AS cluster_size,
                        round(1.0 / coalesce(sz2.cluster_size, 1), 6) AS weight
                 FROM surv s
                 LEFT JOIN cl ON s.doc_id = cl.id
                 LEFT JOIN sz2 ON cl.cluster = sz2.cluster),
         b AS (SELECT *,
                      ('0x'||substr(md5('rel0' || cluster::varchar), 1, 8))::BIGINT % 100 AS bucket
               FROM rel)
       SELECT doc_id, source, n_copies, cluster, cluster_size, weight, bucket,
              CASE WHEN bucket < 80 THEN 'train'
                   WHEN bucket < 90 THEN 'val'
                   ELSE 'test' END AS split
       FROM b"""

  /** d15 oracle: the [[minhashOracle]] machinery over an old/fresh
    * two-slice corpus with the band join restricted to fresh × old —
    * exactly what probing the persisted index computes. */
  private def minhashIncrementalOracle(numPerm: Int, bands: Int,
                                       threshold: Double): String = {
    val rows = numPerm / bands
    val mins = (0 until numPerm).map { i =>
      val (a, b) = graft.operators.Dedup.minhashCoeffs(i)
      s"min(($a*h0+$b)%2147483647) AS h$i"
    }.mkString(",\n                  ")
    val sigList = (0 until numPerm).map(i => s"h$i").mkString("[", ",", "]")
    s"""WITH docs2 AS (
           SELECT doc_id, text, 0 AS side FROM documents WHERE doc_id % 10 < 8
           UNION ALL
           SELECT doc_id, text, 1 FROM documents WHERE doc_id % 10 >= 8
           UNION ALL
           SELECT doc_id + 100000, text, 1 FROM documents WHERE doc_id % 10 = 0),
         w AS (SELECT doc_id, side, string_split(text, ' ') AS ws FROM docs2),
         sh AS (SELECT DISTINCT doc_id, side,
                  ws[n]||' '||ws[n+1]||' '||ws[n+2] AS sh
                FROM (SELECT doc_id, side, ws,
                        unnest(generate_series(1, greatest(len(ws)-2, 0))) AS n
                      FROM w) t),
         base AS (SELECT doc_id, side,
                    ('0x'||substr(md5(sh),1,15))::BIGINT % 2147483647 AS h0
                  FROM sh),
         hs AS (SELECT doc_id, side,
                  $mins
                FROM base GROUP BY 1, 2),
         sig AS (SELECT doc_id, side, $sigList AS sig FROM hs),
         bnd AS (SELECT doc_id, side, sig, b,
                  array_to_string(list_slice(sig, b*$rows+1, b*$rows+$rows),
                    '|') AS bh
                 FROM sig, (SELECT unnest(range(0, $bands)) AS b) bb),
         cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id,
                    a.sig AS sa, b.sig AS sb
                  FROM bnd a JOIN bnd b
                    ON a.b = b.b AND a.bh = b.bh
                   AND a.side = 1 AND b.side = 0),
         est AS (SELECT new_id, old_id,
                   len(list_filter(range(1, ${numPerm + 1}),
                     i -> sa[i] = sb[i]))/$numPerm.0 AS ej
                 FROM cand)
         SELECT new_id, old_id, round(ej, 6) AS est_jaccard
         FROM est WHERE ej >= $threshold"""
  }

  /** s02 oracle: the single-band hyperplane bucket (same SplitMix64
    * planes the engine ships as literals), bucket-equality candidates,
    * exact cosine, per-query top-k. */
  private def lshTopKOracle(dim: Int, k: Int, nbits: Int): String = {
    def planeLit(p: Int): String =
      graft.operators.Similarity.hyperplane(p, dim)
        .map(v => if (v > 0) "1" else "-1").mkString("[", ",", "]::DOUBLE[]")
    val bucketExpr = (0 until nbits).map { j =>
      s"(CASE WHEN list_dot_product(v, ${planeLit(j)}) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH b AS (
           SELECT vec_id, embedding::DOUBLE[] AS v,
                  $bucketExpr AS bucket
           FROM embeddings),
         q AS (SELECT * FROM b WHERE vec_id < 10),
         sims AS (
           SELECT q.vec_id AS qid, c.vec_id AS nid,
                  list_dot_product(q.v, c.v)
                    / (sqrt(list_dot_product(q.v, q.v))
                       * sqrt(list_dot_product(c.v, c.v))) AS sim
           FROM q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id)
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid)
                  AS rank
         FROM sims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid)
           <= $k"""
  }

  val oracles: ListMap[String, String] = ListMap(
    "s02_ann_lsh" -> lshTopKOracle(64, 3, 8),
    "d04_dedup_simhash" ->
      """WITH terms AS (
           SELECT doc_id, w, count(*) AS cnt
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                 FROM documents) t
           GROUP BY 1, 2),
         h AS (SELECT doc_id, cnt,
                 ('0x'||substr(md5(w),1,15))::BIGINT AS h
               FROM terms),
         bits AS (
           SELECT doc_id, j,
                  sum(CASE WHEN (h >> j) & 1 = 1 THEN cnt ELSE -cnt END) AS s
           FROM h, (SELECT unnest(range(0, 64)) AS j) jj
           GROUP BY 1, 2),
         sig AS (
           SELECT doc_id,
                  sum(CASE WHEN s > 0 THEN 1::BIGINT << j ELSE 0 END)
                    AS simhash
           FROM bits GROUP BY 1),
         chunks AS (
           SELECT doc_id, simhash, c, (simhash >> (c*16)::int) & 65535 AS cv
           FROM sig, (SELECT unnest(range(0, 4)) AS c) cc),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.simhash AS sa, b.simhash AS sb
           FROM chunks a JOIN chunks b
             ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id)
         SELECT id_a, id_b, bit_count(xor(sa, sb)) AS hamming
         FROM cand WHERE bit_count(xor(sa, sb)) <= 3""",
    "d06_dedup_embedding_lsh" -> lshNearDupOracle(64, 0.45, 8, 4),
    "d13_duplicate_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         wins AS (
           SELECT doc_id, ws,
                  unnest(generate_series(1, len(ws) - 4)) AS p
           FROM t WHERE len(ws) >= 5),
         fps AS (
           SELECT doc_id, md5(array_to_string(ws[p : p + 4], ' ')) AS fp
           FROM wins),
         perfp AS (SELECT fp, count(DISTINCT doc_id) AS ndocs
                   FROM fps GROUP BY fp),
         tot AS (SELECT doc_id, count(*) AS total_windows
                 FROM fps GROUP BY doc_id),
         dups AS (SELECT doc_id, count(*) AS dup_windows
                  FROM fps JOIN perfp USING (fp)
                  WHERE ndocs >= 2 GROUP BY doc_id)
         SELECT t.doc_id, coalesce(d.dup_windows, 0) AS dup_windows,
                t.total_windows,
                round(coalesce(d.dup_windows, 0)::DOUBLE / t.total_windows, 4)
                  AS dup_fraction
         FROM tot t LEFT JOIN dups d USING (doc_id)""",
    "d12_semantic_dedup" ->
      """WITH c AS (
           SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
           FROM embeddings ORDER BY md5('ivf'||vec_id::varchar), vec_id LIMIT 8),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         asgn AS (
           SELECT e.vec_id AS id, e.v, c.cid,
                  list_dot_product(e.v, c.cv)
                    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS csim
           FROM e, c),
         cells AS (
           SELECT id, v, cid AS cell, csim FROM (
             SELECT id, v, cid, csim,
                    row_number() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS rn
             FROM asgn) t WHERE rn = 1),
         pairs AS (
           SELECT a.cell, a.id AS id_a, b.id AS id_b, a.csim AS ca, b.csim AS cb,
                  list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
           FROM cells a JOIN cells b ON a.cell = b.cell AND a.id < b.id)
         SELECT cell, CASE WHEN ca > cb THEN id_b ELSE id_a END AS keep_id,
                CASE WHEN ca > cb THEN id_a ELSE id_b END AS drop_id,
                round(sim, 6) AS sim
         FROM pairs WHERE sim > 0.45""",
    "t10_pii_scrub" ->
      """WITH dirty AS (
           SELECT doc_id,
                  text || ' user' || doc_id::VARCHAR || '@example.com 203.0.113.'
                       || (doc_id % 256)::VARCHAR || ' +1-555-'
                       || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS dirty
           FROM documents)
         SELECT doc_id,
                len(regexp_extract_all(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
                len(regexp_extract_all(dirty, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ips,
                len(regexp_extract_all(dirty, '\+1-[0-9]{3}-[0-9]{4}')) AS n_phones,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(dirty,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
                  '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
         FROM dirty""",
    "t11_url_blocklist" ->
      """WITH dirty AS (
           SELECT doc_id,
                  text || ' https://site' || (doc_id % 20)::VARCHAR
                       || '.example.org/p/' || doc_id::VARCHAR
                       || ' http://cdn' || (doc_id % 7)::VARCHAR
                       || '.assets.net/x.js' AS dirty
           FROM documents),
         urls AS (
           SELECT doc_id, unnest(regexp_extract_all(dirty, 'https?://[^ ]+')) AS url
           FROM dirty)
         SELECT doc_id, regexp_extract(url, 'https?://([^/ ]+)', 1) AS host, url
         FROM urls
         WHERE regexp_extract(url, 'https?://([^/ ]+)', 1) IN
               ('site0.example.org', 'site1.example.org',
                'site2.example.org', 'cdn0.assets.net')""",
    "t13_chunk_windows" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         starts AS (
           SELECT doc_id, ws,
                  unnest(generate_series(1, greatest(len(ws), 1), 48)) AS start
           FROM ws)
         SELECT doc_id, (start - 1) // 48 AS chunk_no,
                len(ws[start : start + 63]) AS n_tokens,
                array_to_string(ws[start : start + 63], ' ') AS chunk_text
         FROM starts""",
    "t14_tfidf_topk" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                    FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
         df AS (SELECT term, count(DISTINCT doc_id) AS df FROM w GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (
           SELECT doc_id, tf.term, tf,
                  round(tf * ln(n_docs::DOUBLE / df), 4) AS score
           FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
         ranked AS (
           SELECT *, row_number() OVER (
             PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
           FROM scored)
         SELECT doc_id, term, tf, score, rank FROM ranked WHERE rank <= 3""",
    "t15_mixing_weights" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
         t AS (SELECT sum(n_docs) AS n_total,
                      sum(pow(n_docs::DOUBLE, 0.5)) AS z FROM c)
         SELECT source, n_docs,
                round(pow(n_docs::DOUBLE, 0.5) / z, 6) AS weight,
                round(pow(n_docs::DOUBLE, 0.5) / z * n_total)::BIGINT AS target_n
         FROM c CROSS JOIN t""",
    "t16_token_budget_packing" ->
      """SELECT doc_id, source, len(regexp_split_to_array(text, ' +')) AS n_tokens,
              (coalesce(sum(len(regexp_split_to_array(text, ' +'))) OVER (
                PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 1000
                )::BIGINT AS bin
         FROM documents""",
    "d11_dedup_apply_text" ->
      """WITH RECURSIVE
         w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                  ws[n]||' '||ws[n+1]||' '||ws[n+2] AS sh
                FROM (SELECT doc_id, ws,
                        unnest(generate_series(1, greatest(len(ws)-2, 0))) AS n
                      FROM w) t),
         sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                   FROM sh a JOIN sh b ON a.sh=b.sh AND a.doc_id<b.doc_id
                   GROUP BY 1, 2),
         pairs AS (SELECT id_a, id_b FROM inter
                   JOIN sizes sa ON sa.doc_id=id_a
                   JOIN sizes sb ON sb.doc_id=id_b
                   WHERE i::double / (sa.sz + sb.sz - i) > 0.8),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach(id, lbl) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id),
         cl AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id)
         SELECT doc_id, source FROM documents LEFT JOIN cl ON doc_id = cl.id
         WHERE cluster IS NULL OR cluster = doc_id""",
    "t12_unigram_logprob" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                    FROM documents),
         freq AS (SELECT w, count(*) AS wn FROM w GROUP BY 1),
         tot AS (SELECT sum(wn) AS tot FROM freq)
         SELECT doc_id, count(*) AS n_words,
                round(avg(ln(wn::DOUBLE / tot)), 4) AS logprob
         FROM w JOIN freq USING (w) CROSS JOIN tot
         GROUP BY doc_id""",
    "t18_bigram_logprob" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
                       FROM documents),
         bg AS (SELECT doc_id,
                       unnest(list_transform(range(1, len(w)),
                         i -> w[i] || ' ' || w[i + 1])) AS bg
                FROM toks WHERE len(w) >= 2),
         freq AS (SELECT bg, count(*) AS bn,
                         string_split(bg, ' ')[1] AS w1
                  FROM bg GROUP BY 1),
         pref AS (SELECT w1, sum(bn) AS pn FROM freq GROUP BY 1)
         SELECT doc_id, count(*) AS n_bigrams,
                round(avg(ln(bn::DOUBLE / pn)), 4) AS logprob
         FROM bg JOIN freq USING (bg) JOIN pref USING (w1)
         GROUP BY doc_id""",
    "d01_dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keep
         FROM (SELECT * FROM documents
               UNION ALL SELECT * FROM documents WHERE doc_id < 50) t
         GROUP BY md5(text) HAVING count(*) > 1""",
    "d02_dedup_ngram_jaccard" -> jaccardOracle(threshold = 0.8),
    "d03_dedup_minhash" -> minhashOracle(numPerm = 32, bands = 8,
      threshold = 0.5),
    "d07_dedup_clusters" ->
      """WITH RECURSIVE
           pairs AS (
             SELECT a.vec_id AS id_a, b.vec_id AS id_b
             FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35),
           edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                     UNION SELECT id_b, id_a FROM pairs),
           reach(id, lbl) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id)
         SELECT id, min(lbl) AS cluster FROM reach GROUP BY id""",
    "d08_boilerplate_strip" ->
      """WITH terms AS (
           SELECT DISTINCT doc_id, source, unnest(string_split(text, ' ')) AS w
           FROM documents),
         dfreq AS (SELECT source, w, count(*) AS df FROM terms GROUP BY 1, 2),
         nd AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
         boiler AS (
           SELECT dfreq.source, list(w ORDER BY w) AS bw
           FROM dfreq JOIN nd ON dfreq.source = nd.source
           WHERE df > 0.9 * n GROUP BY 1),
         stripped AS (
           SELECT doc_id, string_split(text, ' ') AS ws,
                  list_filter(string_split(text, ' '),
                    x -> NOT list_contains(coalesce(bw, []), x)) AS kept
           FROM documents LEFT JOIN boiler ON documents.source = boiler.source)
         SELECT doc_id, len(ws) AS n_tokens, len(kept) AS n_kept,
                array_to_string(kept, ' ') AS clean_text
         FROM stripped""",
    "d10_dedup_apply" ->
      s"""WITH RECURSIVE
           pairs AS (${lshNearDupOracle(64, 0.45, 8, 4)}),
           edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                     UNION SELECT id_b, id_a FROM pairs),
           reach(id, lbl) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id),
           cl AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id)
         SELECT e.vec_id, e.label
         FROM embeddings e LEFT JOIN cl ON e.vec_id = cl.id
         WHERE cl.cluster IS NULL OR cl.cluster = e.vec_id""",
    "t09_stratified_sample" ->
      """SELECT doc_id, lang,
              row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rk
         FROM documents
         QUALIFY row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) <= 50""",
    "d09_decontaminate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         sh AS (SELECT DISTINCT doc_id, ws[n]||' '||ws[n+1]||' '||ws[n+2] AS sh
                FROM (SELECT doc_id, ws,
                        unnest(generate_series(1, greatest(len(ws)-2, 0))) AS n
                      FROM w) t),
         ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0)
         SELECT s.doc_id, count(*) AS n_shared
         FROM sh s JOIN ev ON s.sh = ev.sh
         WHERE s.doc_id % 97 <> 0 GROUP BY 1""",
    "t07_repetition_ratio" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         c AS (SELECT doc_id, greatest(len(ws)-2, 0) AS n3 FROM w),
         sh AS (SELECT doc_id, count(DISTINCT ws[n]||' '||ws[n+1]||' '||ws[n+2]) AS nd
                FROM (SELECT doc_id, ws,
                        unnest(generate_series(1, greatest(len(ws)-2, 0))) AS n
                      FROM w) t GROUP BY doc_id)
         SELECT c.doc_id, n3 AS n_3grams, coalesce(nd, 0) AS n_distinct,
                round(CASE WHEN n3 > 0
                           THEN 1.0 - coalesce(nd, 0)::double / n3
                           ELSE 0.0 END, 6) AS rep_ratio
         FROM c LEFT JOIN sh ON c.doc_id = sh.doc_id""",
    "t08_deterministic_sample" ->
      """SELECT doc_id,
              ('0x'||substr(md5(text), 1, 8))::BIGINT % 100 AS bucket
         FROM documents
         WHERE ('0x'||substr(md5(text), 1, 8))::BIGINT % 100 < 10""",
    "t17_weighted_mix_sample" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
         t AS (SELECT sum(n_docs) AS n_total,
                      sum(pow(n_docs::DOUBLE, 0.5)) AS z FROM c),
         r AS (SELECT source,
                      least(1.0,
                        0.6 * (round(pow(n_docs::DOUBLE, 0.5) / z * n_total)::BIGINT)::DOUBLE
                          / n_docs) AS rate
               FROM c CROSS JOIN t)
         SELECT doc_id, source
         FROM documents JOIN r USING (source)
         WHERE (('0x'||substr(md5(text), 1, 8))::BIGINT % 1000000)::DOUBLE
               < rate * 1000000""",
    "t06_length_percentile_filter" ->
      """WITH c AS (
           SELECT doc_id, len(regexp_split_to_array(text, ' +')) AS ws_tokens
           FROM documents),
         b AS (SELECT quantile_cont(ws_tokens, 0.05) AS p05,
                      quantile_cont(ws_tokens, 0.95) AS p95 FROM c)
         SELECT doc_id, ws_tokens FROM c, b
         WHERE ws_tokens >= p05 AND ws_tokens <= p95""",
    "d05_dedup_embedding" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.45""",
    "s03_ann_ivf" ->
      """WITH c AS (
           SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
           FROM embeddings ORDER BY md5('ivf'||vec_id::varchar), vec_id LIMIT 16),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         asgn AS (
           SELECT e.vec_id AS id, e.v, c.cid,
                  list_dot_product(e.v, c.cv)
                    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS csim
           FROM e, c),
         cells AS (
           SELECT id AS nid, v AS nv, cid AS cell FROM (
             SELECT id, v, cid,
                    row_number() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS rn
             FROM asgn) t WHERE rn = 1),
         probes AS (
           SELECT id AS qid, v AS qv, cid AS cell FROM (
             SELECT id, v, cid,
                    row_number() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS rn
             FROM asgn WHERE id < 10) t WHERE rn <= 4),
         sims AS (
           SELECT p.qid, s.nid,
                  list_dot_product(p.qv, s.nv)
                    / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(s.nv, s.nv))) AS sim
           FROM probes p JOIN cells s ON p.cell = s.cell AND s.nid != p.qid)
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM sims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    // identical semantics to s03 by construction (the index stores the
    // same assignment the in-query path computes) — same oracle
    "s07_ann_ivf_indexed" ->
      """WITH c AS (
           SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
           FROM embeddings ORDER BY md5('ivf'||vec_id::varchar), vec_id LIMIT 16),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         asgn AS (
           SELECT e.vec_id AS id, e.v, c.cid,
                  list_dot_product(e.v, c.cv)
                    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS csim
           FROM e, c),
         cells AS (
           SELECT id AS nid, v AS nv, cid AS cell FROM (
             SELECT id, v, cid,
                    row_number() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS rn
             FROM asgn) t WHERE rn = 1),
         probes AS (
           SELECT id AS qid, v AS qv, cid AS cell FROM (
             SELECT id, v, cid,
                    row_number() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS rn
             FROM asgn WHERE id < 10) t WHERE rn <= 4),
         sims AS (
           SELECT p.qid, s.nid,
                  list_dot_product(p.qv, s.nv)
                    / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(s.nv, s.nv))) AS sim
           FROM probes p JOIN cells s ON p.cell = s.cell AND s.nid != p.qid)
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM sims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    // s07's oracle restricted to the attribute slice (nid % 3 = 0):
    // the filter composes with the cell restriction, never changes
    // scores of surviving candidates
    "s27_ann_ivf_filtered" ->
      """WITH c AS (
           SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
           FROM embeddings ORDER BY md5('ivf'||vec_id::varchar), vec_id LIMIT 16),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         asgn AS (
           SELECT e.vec_id AS id, e.v, c.cid,
                  list_dot_product(e.v, c.cv)
                    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS csim
           FROM e, c),
         cells AS (
           SELECT id AS nid, v AS nv, cid AS cell FROM (
             SELECT id, v, cid,
                    row_number() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS rn
             FROM asgn) t WHERE rn = 1),
         probes AS (
           SELECT id AS qid, v AS qv, cid AS cell FROM (
             SELECT id, v, cid,
                    row_number() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS rn
             FROM asgn WHERE id < 10) t WHERE rn <= 4),
         sims AS (
           SELECT p.qid, s.nid,
                  list_dot_product(p.qv, s.nv)
                    / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(s.nv, s.nv))) AS sim
           FROM probes p JOIN cells s ON p.cell = s.cell AND s.nid != p.qid
           WHERE s.nid % 3 = 0)
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM sims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    // BM25 with Lucene idf; the constants are written as the same
    // double expressions the engine computes ((1.2 + 1), 1 - 0.75)
    "t37_bm25_topk" -> bm25Oracle,
    // the persisted-index path is arithmetic-identical over the same
    // (build ∪ appended) corpus: stats recompute exactly (integer-
    // valued dl), df derives from the probed terms' postings, the
    // score Column is shared — so the oracle IS the in-session one
    "t38_bm25_indexed" -> bm25Oracle,
    // deletes leave the scoring model too (df/N/avgdl), so the oracle
    // is BM25 over the reduced corpus — not a post-hoc row filter
    "t39_bm25_deleted" -> bm25Oracle("WHERE doc_id < 400"),
    // filters restrict candidates ONLY (Lucene filter-query
    // semantics): a doc scores identically inside and outside the
    // slice, so the oracle filters the scored join, not the corpus
    "t40_bm25_filtered" -> bm25Oracle("", "WHERE tf.doc % 3 = 0"),
    // RRF of the top-10 BM25 run and the top-10 exact-cosine run
    "s28_hybrid_rrf" ->
      """WITH w AS (SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term
                    FROM documents),
         tf AS (SELECT doc, term, count(*) AS tf FROM w GROUP BY 1, 2),
         dl AS (SELECT doc, count(*)::DOUBLE AS dl FROM w GROUP BY 1),
         stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
         df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
         qt AS (SELECT DISTINCT qid, term FROM (
                  SELECT doc_id AS qid,
                         unnest(list_slice(string_split(text, ' '), 1, 8)) AS term
                  FROM documents WHERE doc_id < 3)),
         scored AS (
           SELECT qt.qid, tf.doc,
                  ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) *
                    (tf.tf * (1.2 + 1)) /
                    (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS sc
           FROM qt JOIN tf USING (term) JOIN df USING (term)
                JOIN dl ON tf.doc = dl.doc CROSS JOIN stats s),
         agg AS (SELECT qid, doc AS nid, sum(sc) AS score
                 FROM scored GROUP BY 1, 2),
         bmr AS (SELECT qid, nid, row_number() OVER (
                   PARTITION BY qid ORDER BY score DESC, nid) AS rank
                 FROM agg
                 QUALIFY row_number() OVER (
                   PARTITION BY qid ORDER BY score DESC, nid) <= 10),
         q2 AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                FROM embeddings WHERE vec_id < 3),
         vsims AS (SELECT qid, e.vec_id AS nid,
                     list_cosine_similarity(qv, e.embedding::DOUBLE[]) AS sim
                   FROM q2, embeddings e WHERE e.vec_id != qid),
         vrr AS (SELECT qid, nid, row_number() OVER (
                   PARTITION BY qid ORDER BY sim DESC, nid) AS rank
                 FROM vsims
                 QUALIFY row_number() OVER (
                   PARTITION BY qid ORDER BY sim DESC, nid) <= 10),
         fused AS (SELECT qid, nid, sum(1.0 / (60 + rank)) AS score
                   FROM (SELECT * FROM vrr UNION ALL SELECT * FROM bmr)
                   GROUP BY 1, 2)
         SELECT qid, nid, round(score, 6) AS score,
                row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rank
         FROM fused
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) <= 5""",
    // conjunctive semantics: same per-(qid, doc) sums, kept only when
    // the matched-term count equals the query's distinct term count
    "t41_bm25_conjunctive" ->
      """WITH w AS (SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term
                    FROM documents),
         tf AS (SELECT doc, term, count(*) AS tf FROM w GROUP BY 1, 2),
         dl AS (SELECT doc, count(*)::DOUBLE AS dl FROM w GROUP BY 1),
         stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
         df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
         qt AS (SELECT DISTINCT qid, term FROM (
                  SELECT doc_id AS qid,
                         unnest(list_slice(string_split(text, ' '), 1, 8)) AS term
                  FROM documents WHERE doc_id < 3)),
         need AS (SELECT qid, count(*) AS need FROM qt GROUP BY 1),
         scored AS (
           SELECT qt.qid, tf.doc,
                  ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) *
                    (tf.tf * (1.2 + 1)) /
                    (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS sc
           FROM qt JOIN tf USING (term) JOIN df USING (term)
                JOIN dl ON tf.doc = dl.doc CROSS JOIN stats s),
         agg AS (SELECT qid, doc AS doc_id, sum(sc) AS score,
                        count(*) AS nt
                 FROM scored GROUP BY 1, 2),
         conj AS (SELECT agg.qid, doc_id, score
                  FROM agg JOIN need ON agg.qid = need.qid
                  WHERE agg.nt = need.need)
         SELECT qid, doc_id, round(score, 6) AS score,
                row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
         FROM conj
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) <= 5""",
    // weighted linear fusion over the same two runs as s28: both runs
    // are the engine's own ROUNDED top-10 outputs, so the min-max
    // normalization here operates on identical doubles
    "s33_hybrid_linear" ->
      """WITH w AS (SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term
                    FROM documents),
         tf AS (SELECT doc, term, count(*) AS tf FROM w GROUP BY 1, 2),
         dl AS (SELECT doc, count(*)::DOUBLE AS dl FROM w GROUP BY 1),
         stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
         df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
         qt AS (SELECT DISTINCT qid, term FROM (
                  SELECT doc_id AS qid,
                         unnest(list_slice(string_split(text, ' '), 1, 8)) AS term
                  FROM documents WHERE doc_id < 3)),
         scored AS (
           SELECT qt.qid, tf.doc,
                  ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) *
                    (tf.tf * (1.2 + 1)) /
                    (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS sc
           FROM qt JOIN tf USING (term) JOIN df USING (term)
                JOIN dl ON tf.doc = dl.doc CROSS JOIN stats s),
         agg AS (SELECT qid, doc AS nid, sum(sc) AS score
                 FROM scored GROUP BY 1, 2),
         bmr AS (SELECT qid, nid, round(score, 6) AS score FROM (
                   SELECT qid, nid, score, row_number() OVER (
                     PARTITION BY qid ORDER BY score DESC, nid) AS rn
                   FROM agg) t
                 WHERE rn <= 10),
         bmm AS (SELECT qid, min(score) AS mn, max(score) AS mx
                 FROM bmr GROUP BY 1),
         bn AS (SELECT b.qid, nid,
                       (CASE WHEN mx = mn THEN 1.0
                             ELSE (score - mn) / (mx - mn) END) * 0.3 AS ws
                FROM bmr b JOIN bmm ON b.qid = bmm.qid),
         q2 AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                FROM embeddings WHERE vec_id < 3),
         vsims AS (SELECT qid, e.vec_id AS nid,
                     list_cosine_similarity(qv, e.embedding::DOUBLE[]) AS sim
                   FROM q2, embeddings e WHERE e.vec_id != qid),
         vrr AS (SELECT qid, nid, round(sim, 6) AS score FROM vsims
                 QUALIFY row_number() OVER (
                   PARTITION BY qid ORDER BY sim DESC, nid) <= 10),
         vmm AS (SELECT qid, min(score) AS mn, max(score) AS mx
                 FROM vrr GROUP BY 1),
         vn AS (SELECT v.qid, nid,
                       (CASE WHEN mx = mn THEN 1.0
                             ELSE (score - mn) / (mx - mn) END) * 0.7 AS ws
                FROM vrr v JOIN vmm ON v.qid = vmm.qid),
         fused AS (SELECT qid, nid, sum(ws) AS score
                   FROM (SELECT * FROM vn UNION ALL SELECT * FROM bn)
                   GROUP BY 1, 2)
         SELECT qid, nid, round(score, 6) AS score,
                row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rank
         FROM fused
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) <= 5""",
    // the s28 fusion with the SAME attribute slice on BOTH runs: the
    // lexical run keeps corpus-wide df/N/avgdl and slices candidates
    // (t40 semantics — WHERE on the scored join), the vector run
    // slices its exact-cosine candidates (probe-all ≡ exact, s27
    // semantics)
    "s32_hybrid_filtered" ->
      """WITH w AS (SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term
                    FROM documents),
         tf AS (SELECT doc, term, count(*) AS tf FROM w GROUP BY 1, 2),
         dl AS (SELECT doc, count(*)::DOUBLE AS dl FROM w GROUP BY 1),
         stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
         df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
         qt AS (SELECT DISTINCT qid, term FROM (
                  SELECT doc_id AS qid,
                         unnest(list_slice(string_split(text, ' '), 1, 8)) AS term
                  FROM documents WHERE doc_id < 3)),
         scored AS (
           SELECT qt.qid, tf.doc,
                  ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) *
                    (tf.tf * (1.2 + 1)) /
                    (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS sc
           FROM qt JOIN tf USING (term) JOIN df USING (term)
                JOIN dl ON tf.doc = dl.doc CROSS JOIN stats s
           WHERE tf.doc % 3 = 0),
         agg AS (SELECT qid, doc AS nid, sum(sc) AS score
                 FROM scored GROUP BY 1, 2),
         bmr AS (SELECT qid, nid, row_number() OVER (
                   PARTITION BY qid ORDER BY score DESC, nid) AS rank
                 FROM agg
                 QUALIFY row_number() OVER (
                   PARTITION BY qid ORDER BY score DESC, nid) <= 10),
         q2 AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                FROM embeddings WHERE vec_id < 3),
         vsims AS (SELECT qid, e.vec_id AS nid,
                     list_cosine_similarity(qv, e.embedding::DOUBLE[]) AS sim
                   FROM q2, embeddings e
                   WHERE e.vec_id != qid AND e.vec_id % 3 = 0),
         vrr AS (SELECT qid, nid, row_number() OVER (
                   PARTITION BY qid ORDER BY sim DESC, nid) AS rank
                 FROM vsims
                 QUALIFY row_number() OVER (
                   PARTITION BY qid ORDER BY sim DESC, nid) <= 10),
         fused AS (SELECT qid, nid, sum(1.0 / (60 + rank)) AS score
                   FROM (SELECT * FROM vrr UNION ALL SELECT * FROM bmr)
                   GROUP BY 1, 2)
         SELECT qid, nid, round(score, 6) AS score,
                row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rank
         FROM fused
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) <= 5""",
    "s06_kmeans_refine" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         c0 AS (
           SELECT vec_id AS cid,
                  list_transform(embedding::DOUBLE[], x -> round(x, 6)) AS cv
           FROM embeddings ORDER BY md5('ivf'||vec_id::varchar), vec_id LIMIT 8),
         dims AS (SELECT unnest(range(1, 65)) AS dim),
         a1 AS (
           SELECT e.id, e.v, c.cid,
                  list_dot_product(e.v, c.cv)
                    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS csim
           FROM e, c0 c),
         s1 AS (SELECT id, v, cid AS cell FROM (
                  SELECT id, v, cid, row_number() OVER (
                    PARTITION BY id ORDER BY csim DESC, cid) AS rn
                  FROM a1) t WHERE rn = 1),
         m1 AS (SELECT cell, dim, round(avg(v[dim]), 6) AS m
                FROM s1, dims GROUP BY cell, dim),
         c1v AS (SELECT cell AS cid, list(m ORDER BY dim) AS cv
                 FROM m1 GROUP BY cell),
         c1 AS (SELECT c0.cid, coalesce(c1v.cv, c0.cv) AS cv
                FROM c0 LEFT JOIN c1v ON c0.cid = c1v.cid),
         a2 AS (
           SELECT e.id, e.v, c.cid,
                  list_dot_product(e.v, c.cv)
                    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS csim
           FROM e, c1 c),
         s2 AS (SELECT id, v, cid AS cell FROM (
                  SELECT id, v, cid, row_number() OVER (
                    PARTITION BY id ORDER BY csim DESC, cid) AS rn
                  FROM a2) t WHERE rn = 1),
         m2 AS (SELECT cell, dim, round(avg(v[dim]), 6) AS m
                FROM s2, dims GROUP BY cell, dim),
         c2v AS (SELECT cell AS cid, list(m ORDER BY dim) AS cv
                 FROM m2 GROUP BY cell),
         c2 AS (SELECT c1.cid, coalesce(c2v.cv, c1.cv) AS cv
                FROM c1 LEFT JOIN c2v ON c1.cid = c2v.cid)
         SELECT cid AS cell, dims.dim AS dim, cv[dims.dim] AS value
         FROM c2, dims""",
    "s01_ann_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                    FROM embeddings WHERE vec_id < 10),
         sims AS (SELECT qid, e.vec_id AS nid,
                    list_cosine_similarity(qv, e.embedding::DOUBLE[]) AS sim
                  FROM q, embeddings e WHERE e.vec_id != qid)
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM sims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    "s05_ann_pq" ->
      s"""WITH $pqAdcCtes
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM sims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    "s13_ann_ivfadc" -> ivfadcOracle,
    // deletes: the codebook samples the FULL corpus (build precedes
    // the deletes), ADC scores are per-(qid, nid) independent, so the
    // delete set drops with a post-scoring filter — equivalent to the
    // engine's pre-scoring anti-join/compaction
    "s30_ann_pq_deleted" ->
      s"""WITH $pqAdcCtes
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM sims WHERE nid < 400
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    // filtered serving-shape search: same independence argument — the
    // attribute slice commutes with ADC scoring
    "s29_ann_ivfadc_filtered" ->
      s"""WITH $ivfadcCtes
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM csims WHERE nid % 3 = 0
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    "s18_ann_ivfadc_residual" -> ivfadcResidualOracle,
    "s19_ann_ivfadc_residual_indexed" -> ivfadcResidualOracle,
    "s20_ann_pq_trained" -> pqTrainedOracle(iters = 2),
    // the s06 Lloyd chain (k=8, 2 rounds → c2) feeding the s03 probe
    // search — assignment, probes and exact in-cell scoring against
    // the refined centroid table
    "s22_ann_ivf_refined" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         c0 AS (
           SELECT vec_id AS cid,
                  list_transform(embedding::DOUBLE[], x -> round(x, 6)) AS cv
           FROM embeddings ORDER BY md5('ivf'||vec_id::varchar), vec_id LIMIT 8),
         dims AS (SELECT unnest(range(1, 65)) AS dim),
         a1 AS (
           SELECT e.id, e.v, c.cid,
                  list_dot_product(e.v, c.cv)
                    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS csim
           FROM e, c0 c),
         s1 AS (SELECT id, v, cid AS cell FROM (
                  SELECT id, v, cid, row_number() OVER (
                    PARTITION BY id ORDER BY csim DESC, cid) AS rn
                  FROM a1) t WHERE rn = 1),
         m1 AS (SELECT cell, dim, round(avg(v[dim]), 6) AS m
                FROM s1, dims GROUP BY cell, dim),
         c1v AS (SELECT cell AS cid, list(m ORDER BY dim) AS cv
                 FROM m1 GROUP BY cell),
         c1 AS (SELECT c0.cid, coalesce(c1v.cv, c0.cv) AS cv
                FROM c0 LEFT JOIN c1v ON c0.cid = c1v.cid),
         a2 AS (
           SELECT e.id, e.v, c.cid,
                  list_dot_product(e.v, c.cv)
                    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS csim
           FROM e, c1 c),
         s2 AS (SELECT id, v, cid AS cell FROM (
                  SELECT id, v, cid, row_number() OVER (
                    PARTITION BY id ORDER BY csim DESC, cid) AS rn
                  FROM a2) t WHERE rn = 1),
         m2 AS (SELECT cell, dim, round(avg(v[dim]), 6) AS m
                FROM s2, dims GROUP BY cell, dim),
         c2v AS (SELECT cell AS cid, list(m ORDER BY dim) AS cv
                 FROM m2 GROUP BY cell),
         c2 AS (SELECT c1.cid, coalesce(c2v.cv, c1.cv) AS cv
                FROM c1 LEFT JOIN c2v ON c1.cid = c2v.cid),
         fa AS (
           SELECT e.id, e.v, c.cid,
                  list_dot_product(e.v, c.cv)
                    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS csim
           FROM e, c2 c),
         cells AS (
           SELECT id AS nid, v AS nv, cid AS cell FROM (
             SELECT id, v, cid, row_number() OVER (
               PARTITION BY id ORDER BY csim DESC, cid) AS rn
             FROM fa) t WHERE rn = 1),
         probes AS (
           SELECT id AS qid, v AS qv, cid AS cell FROM (
             SELECT id, v, cid, row_number() OVER (
               PARTITION BY id ORDER BY csim DESC, cid) AS rn
             FROM fa WHERE id < 10) t WHERE rn <= 4),
         sims AS (
           SELECT p.qid, s.nid,
                  list_dot_product(p.qv, s.nv)
                    / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(s.nv, s.nv))) AS sim
           FROM probes p JOIN cells s ON p.cell = s.cell AND s.nid != p.qid)
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM sims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",

    // the s11 rerank device over the s13/s14 candidate machinery
    "s21_ann_ivfadc_rerank_indexed" ->
      s"""WITH $ivfadcCtes,
         cand AS (
           SELECT qid, nid FROM (
             SELECT qid, nid, row_number() OVER (
               PARTITION BY qid ORDER BY sim DESC, nid) AS rn
             FROM csims) t WHERE rn <= 10),
         ex AS (
           SELECT c.qid, c.nid,
                  list_cosine_similarity(q.embedding::DOUBLE[],
                                         n.embedding::DOUBLE[]) AS sim
           FROM cand c
           JOIN embeddings q ON q.vec_id = c.qid
           JOIN embeddings n ON n.vec_id = c.nid)
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM ex
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    // the persisted index must be bit-identical to the in-session
    // composition — one shared oracle
    "s14_ann_ivfadc_indexed" -> ivfadcOracle,
    // centroids + codebook from the build half; assignment/encode/query
    // over the full corpus — exactly what append-without-retrain means
    "s17_ann_ivfadc_incremental" ->
      s"""WITH ${ivfadcCtes("WHERE vec_id < 250")}
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM csims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    "s16_ann_ivfadc_recall" ->
      s"""WITH xq AS (SELECT vec_id AS xqid, embedding::DOUBLE[] AS xqv
                    FROM embeddings WHERE vec_id < 10),
         exact AS (
           SELECT xqid AS qid, nid FROM (
             SELECT xqid, e.vec_id AS nid,
                    row_number() OVER (PARTITION BY xqid ORDER BY
                      list_cosine_similarity(xqv, e.embedding::DOUBLE[]) DESC,
                      e.vec_id) AS rank
             FROM xq, embeddings e WHERE e.vec_id != xqid) t
           WHERE rank <= 3),
         $ivfadcCtes,
         adc AS (
           SELECT qid, nid FROM (
             SELECT qid, nid, row_number() OVER (
               PARTITION BY qid ORDER BY sim DESC, nid) AS rank
             FROM csims) t WHERE rank <= 3)
         SELECT exact.qid, count(*) AS n_exact,
                count(adc.nid) AS n_hit,
                round(count(adc.nid)::double / count(*), 6) AS recall
         FROM exact
         LEFT JOIN adc ON adc.qid = exact.qid AND adc.nid = exact.nid
         GROUP BY exact.qid""",
    // codebook trained on the initial batch only (vec_id < 250, the
    // engine's build half); encode/query replay over the full corpus
    "s15_ann_pq_incremental" ->
      s"""WITH ${pqAdcCtes("WHERE vec_id < 250")}
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM sims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    // SQ8: re-derive the per-dim ranges and the clamped-floor
    // reconstruction, then exact cosine — the same arithmetic the
    // vec_sq8_recon expression runs (floor/clamp on doubles is
    // bit-deterministic on both engines)
    "s25_ann_sq8" ->
      """WITH dims AS (SELECT unnest(generate_series(1, 64)) AS i),
         coords AS (SELECT e.vec_id, d.i, e.embedding[d.i]::DOUBLE AS x
                    FROM embeddings e, dims d),
         rng AS (SELECT i, min(x) AS lo,
                        (max(x) - min(x)) / 256.0 AS delta
                 FROM coords GROUP BY i),
         recon AS (SELECT c.vec_id, c.i,
                     CASE WHEN r.delta <= 0 THEN r.lo
                          ELSE r.lo + (least(greatest(
                              floor((c.x - r.lo) / r.delta), 0), 255)
                            + 0.5) * r.delta END AS v
                   FROM coords c JOIN rng r USING (i)),
         rv AS (SELECT vec_id, list(v ORDER BY i) AS nv
                FROM recon GROUP BY vec_id),
         q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 10),
         sims AS (SELECT qid, rv.vec_id AS nid,
                    list_cosine_similarity(qv, nv) AS sim
                  FROM q, rv WHERE rv.vec_id != qid)
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM sims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    // incremental SQ8: ranges from the build half only, clamped
    // reconstruction over the full corpus
    "s26_ann_sq8_incremental" ->
      """WITH dims AS (SELECT unnest(generate_series(1, 64)) AS i),
         coords AS (SELECT e.vec_id, d.i, e.embedding[d.i]::DOUBLE AS x
                    FROM embeddings e, dims d),
         rng AS (SELECT i, min(x) AS lo,
                        (max(x) - min(x)) / 256.0 AS delta
                 FROM coords WHERE vec_id < 250 GROUP BY i),
         recon AS (SELECT c.vec_id, c.i,
                     CASE WHEN r.delta <= 0 THEN r.lo
                          ELSE r.lo + (least(greatest(
                              floor((c.x - r.lo) / r.delta), 0), 255)
                            + 0.5) * r.delta END AS v
                   FROM coords c JOIN rng r USING (i)),
         rv AS (SELECT vec_id, list(v ORDER BY i) AS nv
                FROM recon GROUP BY vec_id),
         q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 10),
         sims AS (SELECT qid, rv.vec_id AS nid,
                    list_cosine_similarity(qv, nv) AS sim
                  FROM q, rv WHERE rv.vec_id != qid)
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM sims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    // balanced IVF probing every cell is exact: same oracle as s01
    // append conservation: probing every cell of the appended index
    // must reproduce the exact top-k over the union corpus
    "s31_ann_ivf_incremental" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                    FROM embeddings WHERE vec_id < 10),
         sims AS (SELECT qid, e.vec_id AS nid,
                    list_cosine_similarity(qv, e.embedding::DOUBLE[]) AS sim
                  FROM q, embeddings e WHERE e.vec_id != qid)
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM sims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    "s24_ann_ivf_balanced" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                    FROM embeddings WHERE vec_id < 10),
         sims AS (SELECT qid, e.vec_id AS nid,
                    list_cosine_similarity(qv, e.embedding::DOUBLE[]) AS sim
                  FROM q, embeddings e WHERE e.vec_id != qid)
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM sims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    // compaction must be invisible to results: same oracle as s15
    "s23_ann_index_compacted" ->
      s"""WITH ${pqAdcCtes("WHERE vec_id < 250")}
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM sims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    "t34_bpe_token_ids" ->
      s"""WITH e AS (${bpeEncodeOracle(nMerges = 4)}),
         ids AS (
           SELECT token,
                  row_number() OVER (ORDER BY count(*) DESC, token)::BIGINT
                    AS token_id
           FROM e GROUP BY token)
         SELECT e.doc_id, e.word_idx, e.token_idx, e.token, ids.token_id
         FROM e JOIN ids USING (token)""",
    "t35_text_normalize" -> textNormalizeOracle,
    "t33_quality_apply" -> qualityApplyOracle(epochs = 3, lr = 1.0),
    "d24_dedup_audit" ->
      """WITH rows AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 600000, text FROM documents WHERE doc_id % 5 = 0
           UNION ALL
           SELECT doc_id + 700000, text FROM documents WHERE doc_id % 25 = 0),
         g AS (SELECT md5(text) AS h, count(*) AS sz
               FROM rows GROUP BY 1)
         SELECT sz AS cluster_size, count(*) AS n_clusters,
                sum(sz)::BIGINT AS n_docs
         FROM g GROUP BY sz""",
    "q42_keepbest_stream_batch" ->
      """WITH rows AS (
           SELECT md5(text) AS digest, doc_id,
                  (doc_id % 3)::INT AS priority, text
           FROM documents
           UNION ALL
           SELECT md5(text), doc_id + 500000,
                  ((doc_id + 500000) % 3)::INT, text
           FROM documents)
         SELECT digest, doc_id, priority, text FROM rows
         QUALIFY row_number() OVER (
           PARTITION BY digest ORDER BY priority, doc_id) = 1""",
    "q43_windowed_topk_batch" ->
      """WITH c AS (
           SELECT strftime(date_trunc('hour', ts),
                           '%Y-%m-%d %H:%M:%S') AS win,
                  event_type, count(*) AS n
           FROM events GROUP BY 1, 2)
         SELECT win, event_type, n,
                row_number() OVER (
                  PARTITION BY win ORDER BY n DESC, event_type) AS rank
         FROM c
         QUALIFY row_number() OVER (
           PARTITION BY win ORDER BY n DESC, event_type) <= 3""",
    // same ADC machinery as s05/s11 — the INDEXED path must be
    // bit-identical to the in-session one, so the oracle is shared
    "s12_ann_pq_indexed" ->
      s"""WITH $pqAdcCtes
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM sims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    "s11_ann_pq_rerank" ->
      s"""WITH $pqAdcCtes,
         cand AS (
           SELECT qid, nid FROM (
             SELECT qid, nid, row_number() OVER (
               PARTITION BY qid ORDER BY sim DESC, nid) AS rn
             FROM sims) t WHERE rn <= 10),
         ex AS (
           SELECT c.qid, c.nid,
                  list_cosine_similarity(q.embedding::DOUBLE[],
                                         n.embedding::DOUBLE[]) AS sim
           FROM cand c
           JOIN embeddings q ON q.vec_id = c.qid
           JOIN embeddings n ON n.vec_id = c.nid)
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM ex
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    "s04_ann_quantized" ->
      """WITH s AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS sc
              FROM embeddings),
         q8 AS (SELECT vec_id,
                CASE WHEN sc = 0 THEN list_transform(v, x -> 0.0)
                     ELSE list_transform(v, x -> floor(x / sc + 0.5)) END AS qv
              FROM s),
         q AS (SELECT vec_id AS qid, qv AS qqv FROM q8 WHERE vec_id < 10),
         sims AS (SELECT qid, e.vec_id AS nid,
                    list_cosine_similarity(qqv, e.qv) AS sim
                  FROM q, q8 e WHERE e.vec_id != qid)
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM sims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3""",
    "t01_langid" ->
      """WITH s AS (
           SELECT doc_id,
             length(list_filter(string_split(text,' '), x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], x))) AS en_n,
             length(list_filter(string_split(text,' '), x -> list_contains(['el','la','de','que','y','en','un','una','es','por'], x))) AS es_n,
             length(list_filter(string_split(text,' '), x -> list_contains(['der','die','das','und','ist','von','ein','eine','zu','mit'], x))) AS de_n,
             length(list_filter(string_split(text,' '), x -> list_contains(['le','la','de','et','un','une','est','pour','que','dans'], x))) AS fr_n
           FROM documents)
         SELECT doc_id, en_n, es_n, de_n, fr_n,
           CASE WHEN en_n >= es_n AND en_n >= de_n AND en_n >= fr_n THEN 'en'
                WHEN es_n >= de_n AND es_n >= fr_n THEN 'es'
                WHEN de_n >= fr_n THEN 'de' ELSE 'fr' END AS pred_lang
         FROM s""",
    "t02_quality_score" ->
      """WITH s AS (
           SELECT doc_id,
             len(string_split(text,' ')) AS n_words,
             round(length(text)::double / len(string_split(text,' ')), 4) AS avg_wlen,
             round(length(list_filter(string_split(text,' '), x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], x)))::double
                   / len(string_split(text,' ')), 4) AS stop_ratio,
             round(length(regexp_replace(text, '[^A-Z]', '', 'g'))::double / length(text), 4) AS upper_ratio
           FROM documents)
         SELECT doc_id, n_words, avg_wlen, stop_ratio, upper_ratio,
                round(0.4*stop_ratio + 0.3*least(avg_wlen/10.0, 1.0)
                      + 0.3*(1.0 - upper_ratio), 7) AS quality
         FROM s""",
    "t03_token_count" ->
      """SELECT doc_id,
              len(regexp_split_to_array(text, ' +')) AS ws_tokens,
              len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_tokens
         FROM documents""",
    "t04_fingerprint" ->
      """WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
         sh AS (SELECT doc_id, ws[n]||' '||ws[n+1]||' '||ws[n+2] AS sh
                FROM (SELECT doc_id, ws,
                        unnest(generate_series(1, greatest(len(ws)-2, 0))) AS n
                      FROM w) t)
         SELECT w.doc_id,
                md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS fp,
                (SELECT min(md5(sh)) FROM sh WHERE sh.doc_id = w.doc_id) AS min_shingle
         FROM w""",
    "t05_vocab_topk" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
         f AS (SELECT term, count(*) AS freq FROM t GROUP BY term)
         SELECT term, freq,
                row_number() OVER (ORDER BY freq DESC, term) AS rank
         FROM f
         QUALIFY row_number() OVER (ORDER BY freq DESC, term) <= 100""",
    "m01_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
              md5(text) AS checksum, 'text/plain' AS mime
         FROM documents""",
    "m02_frame_sample" ->
      """SELECT d.doc_id, t.range AS frame_no,
              md5(substring(d.text, (t.range * 64 + 1)::INT, 64)) AS frame_md5,
              length(substring(d.text, (t.range * 64 + 1)::INT, 64))::BIGINT AS frame_bytes
         FROM documents d CROSS JOIN range(0, 4096, 2) t
         WHERE t.range * 64 < length(d.text) AND length(d.text) > 0""",
    // s01's exact top-3 and s03's IVF top-3 recombined into a per-query
    // recall: the audit is exact iff both constituents are.
    "s08_ann_recall" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                    FROM embeddings WHERE vec_id < 10),
         exact AS (
           SELECT qid, nid FROM (
             SELECT qid, e.vec_id AS nid,
                    row_number() OVER (PARTITION BY qid ORDER BY
                      list_cosine_similarity(qv, e.embedding::DOUBLE[]) DESC,
                      e.vec_id) AS rank
             FROM q, embeddings e WHERE e.vec_id != qid) t
           WHERE rank <= 3),
         c AS (
           SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
           FROM embeddings ORDER BY md5('ivf'||vec_id::varchar), vec_id LIMIT 16),
         e2 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         asgn AS (
           SELECT e2.vec_id AS id, e2.v, c.cid,
                  list_dot_product(e2.v, c.cv)
                    / (sqrt(list_dot_product(e2.v, e2.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS csim
           FROM e2, c),
         cells AS (
           SELECT id AS nid, v AS nv, cid AS cell FROM (
             SELECT id, v, cid,
                    row_number() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS rn
             FROM asgn) t WHERE rn = 1),
         probes AS (
           SELECT id AS qid, v AS qv, cid AS cell FROM (
             SELECT id, v, cid,
                    row_number() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS rn
             FROM asgn WHERE id < 10) t WHERE rn <= 4),
         ivf AS (
           SELECT qid, nid FROM (
             SELECT p.qid, s.nid,
                    row_number() OVER (PARTITION BY p.qid ORDER BY
                      list_dot_product(p.qv, s.nv)
                        / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(s.nv, s.nv))) DESC,
                      s.nid) AS rank
             FROM probes p JOIN cells s ON p.cell = s.cell AND s.nid != p.qid) t
           WHERE rank <= 3)
         SELECT exact.qid, count(*) AS n_exact, count(ivf.nid) AS n_hit,
                round(count(ivf.nid)::DOUBLE / count(*), 6) AS recall
         FROM exact LEFT JOIN ivf
           ON exact.qid = ivf.qid AND exact.nid = ivf.nid
         GROUP BY exact.qid""",
    "d14_incremental_dedup" ->
      """WITH old AS (SELECT text FROM documents WHERE doc_id % 10 < 8),
         fresh AS (
           SELECT doc_id, text, source, n_chars FROM documents
           WHERE doc_id % 10 >= 8
           UNION ALL
           SELECT doc_id + 100000, text, source, n_chars FROM documents
           WHERE doc_id % 10 = 0),
         oldh AS (SELECT DISTINCT md5(text) AS h FROM old)
         SELECT f.doc_id, f.source, f.n_chars
         FROM fresh f LEFT JOIN oldh ON md5(f.text) = oldh.h
         WHERE oldh.h IS NULL""",
    "t19_dsir_weights" ->
      """WITH toks AS (SELECT doc_id, lang = 'en' AS t,
                              unnest(string_split(text, ' ')) AS w
                       FROM documents),
         tb AS (SELECT doc_id, t,
                       ('0x'||substr(md5(w),1,15))::BIGINT % 64 AS b
                FROM toks),
         counts AS (SELECT b, count(*) AS cs,
                           sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct
                    FROM tb GROUP BY 1),
         tot AS (SELECT sum(cs) AS ts, sum(ct) AS tt FROM counts),
         lm AS (SELECT b, ln((ct + 1)::DOUBLE / (tt + 64)) AS lt,
                       ln((cs + 1)::DOUBLE / (ts + 64)) AS ls
                FROM counts CROSS JOIN tot)
         SELECT doc_id, count(*) AS n_tokens,
                round(sum(lt - ls), 4) AS log_weight
         FROM tb JOIN lm USING (b)
         GROUP BY doc_id""",
    // append conservation: build(60%) + append(20%) ≡ fresh build over
    // the 80% — the probe result is d15's oracle exactly
    "d25_minhash_index_append" -> minhashIncrementalOracle(numPerm = 32,
      bands = 8, threshold = 0.5),
    "d15_minhash_incremental" -> minhashIncrementalOracle(numPerm = 32,
      bands = 8, threshold = 0.5),
    "t20_deterministic_shuffle" ->
      """WITH h AS (
           SELECT doc_id,
                  ('0x'||substr(md5('epoch0'||doc_id::varchar),1,15))::BIGINT AS h
           FROM documents),
         b AS (SELECT doc_id AS id, h, h % 16 AS bucket FROM h),
         r AS (SELECT id, bucket,
                      row_number() OVER (PARTITION BY bucket
                        ORDER BY h, id) - 1 AS rank_in_bucket
               FROM b)
         SELECT id AS doc_id, bucket, rank_in_bucket,
                rank_in_bucket * 16 + bucket AS global_pos
         FROM r""",
    "m03_duplicate_frames" ->
      """WITH frames AS (
           SELECT d.doc_id, md5(substring(d.text, (t.range * 64 + 1)::INT, 64)) AS frame_md5
           FROM documents d CROSS JOIN range(0, 4096, 1) t
           WHERE t.range * 64 < length(d.text) AND length(d.text) > 0)
         SELECT frame_md5, count(DISTINCT doc_id) AS n_docs,
                count(*) AS n_frames, min(doc_id) AS first_doc
         FROM frames
         GROUP BY frame_md5
         HAVING count(DISTINCT doc_id) >= 2""",
    "d16_url_dedup" ->
      """WITH u AS (
           SELECT doc_id,
                  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://Site' ELSE 'http://site' END)
                  || (doc_id % 20)
                  || (CASE WHEN doc_id % 3 = 0 THEN '.Example.ORG/page/' ELSE '.example.org/page/' END)
                  || (doc_id % 50)
                  || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
                  || '?utm_source=s' || doc_id
                  || '&utm_campaign=c' || (doc_id % 5)
                  || '#frag' || (doc_id % 7) AS url
           FROM documents),
         bare AS (
           SELECT doc_id,
                  regexp_replace(regexp_replace(url, '[?#].*$', ''), '/$', '') AS b
           FROM u),
         canon AS (
           SELECT doc_id,
                  regexp_replace(
                    lower(regexp_extract(b, '^((?i)https?://[^/]+)', 1)),
                    '^http://', 'https://')
                  || regexp_extract(b, '^(?i)https?://[^/]+(/.*)?$', 1) AS canon_url
           FROM bare)
         SELECT canon_url, min(doc_id) AS keep_doc_id, count(*) AS n_variants
         FROM canon GROUP BY canon_url""",
    "t21_chunk_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         ch AS (SELECT doc_id, (n - 1) // 3 AS chunk_no,
                       array_to_string(ws[n : n + 2], ' ') AS chunk
                FROM (SELECT doc_id, ws,
                        unnest(generate_series(1, greatest(len(ws), 1), 3)) AS n
                      FROM w) t),
         marked AS (SELECT doc_id, chunk_no, chunk,
                           row_number() OVER (PARTITION BY chunk
                             ORDER BY doc_id, chunk_no) AS rk
                    FROM ch),
         ka AS (SELECT doc_id, count(*) AS n_kept,
                       string_agg(chunk, ' ' ORDER BY chunk_no) AS clean_text
                FROM marked WHERE rk = 1 GROUP BY doc_id),
         tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY doc_id)
         SELECT tot.doc_id, n_chunks,
                coalesce(n_kept, 0) AS n_kept,
                coalesce(clean_text, '') AS clean_text
         FROM tot LEFT JOIN ka ON tot.doc_id = ka.doc_id""",
    "d17_soft_dedup" ->
      """WITH RECURSIVE
           pairs AS (
             SELECT a.vec_id AS id_a, b.vec_id AS id_b
             FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35),
           edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                     UNION SELECT id_b, id_a FROM pairs),
           reach(id, lbl) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id),
           cl AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id),
           sz AS (SELECT cluster, count(*) AS cluster_size FROM cl GROUP BY cluster)
         SELECT e.vec_id,
                coalesce(cl.cluster, e.vec_id) AS cluster,
                coalesce(sz.cluster_size, 1) AS cluster_size,
                round(1.0 / coalesce(sz.cluster_size, 1), 6) AS weight
         FROM embeddings e
         LEFT JOIN cl ON e.vec_id = cl.id
         LEFT JOIN sz ON cl.cluster = sz.cluster""",
    "m04_av_sync" ->
      """WITH m AS (SELECT doc_id, length(text) AS n_bytes
                    FROM documents WHERE length(text) > 0),
         fr AS (SELECT doc_id, n AS frame_no, n * 40 AS frame_pts
                FROM (SELECT doc_id,
                        unnest(generate_series(0, (n_bytes - 1) // 64, 2)) AS n
                      FROM m) t),
         ck AS (SELECT doc_id, n AS chunk_no, n * 23 AS chunk_pts
                FROM (SELECT doc_id,
                        unnest(generate_series(0, (n_bytes - 1) // 256)) AS n
                      FROM m) t)
         SELECT ck.doc_id, ck.chunk_no, ck.chunk_pts,
                max(fr.frame_no) AS frame_no,
                max(fr.frame_pts) AS frame_pts
         FROM ck LEFT JOIN fr
           ON ck.doc_id = fr.doc_id AND fr.frame_pts <= ck.chunk_pts
         GROUP BY 1, 2, 3""",
    "d18_priority_dedup" ->
      """WITH all_docs AS (
           SELECT doc_id, text, source FROM documents
           UNION ALL
           SELECT doc_id + 200000, text, 'mirror_' || source
           FROM documents WHERE doc_id % 7 = 0),
         ranked AS (
           SELECT doc_id, source,
                  CASE WHEN starts_with(source, 'mirror_') THEN 2 ELSE 1 END AS priority,
                  row_number() OVER (PARTITION BY md5(text)
                    ORDER BY (CASE WHEN starts_with(source, 'mirror_') THEN 2 ELSE 1 END), doc_id) AS rk,
                  count(*) OVER (PARTITION BY md5(text)) AS n_copies
           FROM all_docs)
         SELECT doc_id, source, priority, n_copies
         FROM ranked WHERE rk = 1""",
    "t22_training_shards" ->
      """WITH h AS (
           SELECT doc_id,
                  ('0x'||substr(md5('epoch0'||doc_id::varchar),1,15))::BIGINT AS h
           FROM documents),
         b AS (SELECT doc_id AS id, h, h % 16 AS bucket FROM h),
         r AS (SELECT id, bucket,
                      row_number() OVER (PARTITION BY bucket
                        ORDER BY h, id) - 1 AS rank_in_bucket
               FROM b),
         p AS (SELECT id, rank_in_bucket * 16 + bucket AS global_pos FROM r)
         SELECT global_pos // 128 AS shard, count(*) AS n_rows,
                min(global_pos) AS min_pos, max(global_pos) AS max_pos
         FROM p GROUP BY 1""",
    "d19_containment" ->
      s"""WITH ${containmentPairsCte(maxDf = 5, threshold = 0.9)}
         SELECT contained_id, container_id,
                round(containment, 6) AS containment
         FROM cpairs""",
    "d20_containment_apply" ->
      s"""WITH RECURSIVE
           ${containmentPairsCte(maxDf = 5, threshold = 0.9)},
           edges AS (SELECT contained_id AS src, container_id AS dst FROM cpairs
                     UNION SELECT container_id, contained_id FROM cpairs),
           reach(id, lbl) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id),
           cl AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id)
         SELECT u.doc_id, u.source
         FROM (SELECT doc_id, source FROM documents
               UNION ALL
               SELECT doc_id + 300000, 'excerpt'
               FROM documents WHERE doc_id % 10 = 0) u
         LEFT JOIN cl ON u.doc_id = cl.id
         WHERE cl.cluster IS NULL OR cl.cluster = u.doc_id""",
    "t23_leakfree_split" ->
      """WITH RECURSIVE
           pairs AS (
             SELECT a.vec_id AS id_a, b.vec_id AS id_b
             FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35),
           edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                     UNION SELECT id_b, id_a FROM pairs),
           reach(id, lbl) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id),
           cl AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id),
           s AS (SELECT e.vec_id, coalesce(cl.cluster, e.vec_id) AS rep
                 FROM embeddings e LEFT JOIN cl ON e.vec_id = cl.id),
           b AS (SELECT vec_id, rep,
                        ('0x'||substr(md5('split0' || rep::varchar), 1, 8))::BIGINT % 100 AS bucket
                 FROM s)
         SELECT vec_id, rep, bucket,
                CASE WHEN bucket < 80 THEN 'train'
                     WHEN bucket < 90 THEN 'val'
                     ELSE 'test' END AS split
         FROM b""",
    "m05_interleaved_pack" ->
      """WITH m AS (SELECT doc_id, length(text) AS n_bytes
                    FROM documents WHERE length(text) > 0),
         fr AS (SELECT doc_id, n AS frame_no, n * 40 AS frame_pts
                FROM (SELECT doc_id,
                        unnest(generate_series(0, (n_bytes - 1) // 64, 2)) AS n
                      FROM m) t),
         ck AS (SELECT doc_id, n AS chunk_no, n * 23 AS chunk_pts,
                       n % 13 + 1 AS n_tokens
                FROM (SELECT doc_id,
                        unnest(generate_series(0, (n_bytes - 1) // 256)) AS n
                      FROM m) t),
         u AS (SELECT doc_id, 'image' AS kind, frame_no AS item_no,
                      frame_pts AS pts, 16::BIGINT AS n_tokens
               FROM fr
               UNION ALL
               SELECT doc_id, 'text', chunk_no, chunk_pts, n_tokens FROM ck)
         SELECT doc_id, kind, item_no, pts, n_tokens,
                (coalesce(sum(n_tokens) OVER (PARTITION BY doc_id
                  ORDER BY pts, kind, item_no
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  // 64)::BIGINT AS seq_no
         FROM u""",
    "t24_corpus_release" -> corpusReleaseOracle,
    "t36_release_report" ->
      s"""WITH rel AS ($corpusReleaseOracle),
         all2 AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 200000, text FROM documents WHERE doc_id % 7 = 0),
         toks AS (SELECT doc_id,
                         len(string_split(text, ' '))::BIGINT AS toks
                  FROM all2)
         SELECT r.source, r.split, count(*) AS n_docs,
                sum(t.toks)::BIGINT AS n_tokens,
                round(sum(r.weight::DECIMAL(30,12))::DOUBLE, 6)
                  AS total_weight
         FROM rel r JOIN toks t USING (doc_id)
         GROUP BY r.source, r.split""",
    "t28_corpus_release_lsh" -> corpusReleaseLshOracle(numPerm = 32,
      bands = 8, threshold = 0.5),
    "t25_repetition_signals" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         g AS (
           SELECT doc_id, 1 AS n, ws[i] AS g
           FROM (SELECT doc_id, ws,
                   unnest(generate_series(1, len(ws))) AS i FROM w) t
           UNION ALL
           SELECT doc_id, 2, ws[i]||' '||ws[i+1]
           FROM (SELECT doc_id, ws,
                   unnest(generate_series(1, greatest(len(ws)-1, 0))) AS i FROM w) t
           UNION ALL
           SELECT doc_id, 3, ws[i]||' '||ws[i+1]||' '||ws[i+2]
           FROM (SELECT doc_id, ws,
                   unnest(generate_series(1, greatest(len(ws)-2, 0))) AS i FROM w) t),
         pg AS (SELECT doc_id, n, g, count(*) AS c FROM g GROUP BY 1, 2, 3),
         pd AS (SELECT doc_id, n, sum(c) AS occ, count(*) AS dis, max(c) AS top
                FROM pg GROUP BY 1, 2),
         wide AS (
           SELECT doc_id,
                  sum(CASE WHEN n=1 THEN occ END)::BIGINT AS n_words,
                  round(coalesce(sum(CASE WHEN n=1 THEN occ - dis END)::double
                    / sum(CASE WHEN n=1 THEN occ END), 0), 6) AS dup_word_frac,
                  round(coalesce(sum(CASE WHEN n=2 THEN top END)::double
                    / sum(CASE WHEN n=2 THEN occ END), 0), 6) AS top_bigram_frac,
                  round(coalesce(sum(CASE WHEN n=3 THEN occ - dis END)::double
                    / sum(CASE WHEN n=3 THEN occ END), 0), 6) AS dup_trigram_frac
           FROM pd GROUP BY doc_id)
         SELECT doc_id, n_words, dup_word_frac, top_bigram_frac, dup_trigram_frac,
                n_words >= 5 AS ok_min_words,
                dup_word_frac <= 0.5 AS ok_dup_word,
                top_bigram_frac <= 0.2 AS ok_top_bigram,
                dup_trigram_frac <= 0.3 AS ok_dup_trigram,
                (n_words >= 5 AND dup_word_frac <= 0.5 AND top_bigram_frac <= 0.2
                  AND dup_trigram_frac <= 0.3) AS keep
         FROM wide""",
    "d21_containment_minhash" -> containmentMinhashOracle(numPerm = 32,
      bands = 8, threshold = 0.7),
    "d22_dedup_recall_audit" -> {
      val exact = jaccardOracle(threshold = 0.5)
      val approx = minhashOracle(numPerm = 32, bands = 8, threshold = 0.5)
      s"""SELECT e.n_exact, a.n_approx, b.n_both,
             CASE WHEN a.n_approx > 0
               THEN round(b.n_both::double / a.n_approx, 6) ELSE 1.0 END AS precision,
             CASE WHEN e.n_exact > 0
               THEN round(b.n_both::double / e.n_exact, 6) ELSE 1.0 END AS recall
         FROM (SELECT count(*) AS n_exact FROM ($exact) t) e,
              (SELECT count(*) AS n_approx FROM ($approx) t) a,
              (SELECT count(*) AS n_both FROM ($exact) x JOIN ($approx) y
                 ON x.id_a = y.id_a AND x.id_b = y.id_b) b"""
    },
    "s09_prototype_prune" ->
      """WITH c AS (
           SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
           FROM embeddings ORDER BY md5('ivf'||vec_id::varchar), vec_id LIMIT 8),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         asgn AS (
           SELECT e.vec_id AS id, c.cid,
                  list_dot_product(e.v, c.cv)
                    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS csim
           FROM e, c),
         cells AS (
           SELECT id, cid AS cell, csim FROM (
             SELECT id, cid, csim,
                    row_number() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS rn
             FROM asgn) t WHERE rn = 1),
         r AS (SELECT id, cell, csim,
                      row_number() OVER (PARTITION BY cell
                        ORDER BY csim DESC, id) AS rank,
                      count(*) OVER (PARTITION BY cell) AS cell_n
               FROM cells)
         SELECT id AS vec_id, cell, round(csim, 6) AS csim, rank, cell_n
         FROM r WHERE rank > floor(0.25 * cell_n)""",
    "s10_random_projection" -> randomProjectionOracle(dim = 64, k = 8),
    "t26_bpe_pair_counts" ->
      """WITH wds AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         p AS (SELECT substring(w, i, 2) AS pair
               FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
                     FROM wds WHERE len(w) >= 2) t),
         f AS (SELECT pair, count(*) AS freq FROM p GROUP BY pair)
         SELECT pair, freq,
                row_number() OVER (ORDER BY freq DESC, pair ASC) AS rank
         FROM f ORDER BY freq DESC, pair ASC LIMIT 20""",
    "t27_bpe_merges" -> bpeMergesOracle(nMerges = 4),
    "t29_bpe_encode" -> bpeEncodeOracle(nMerges = 4),
    "t30_pii_redact" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ip = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
      val phone = "\\+[0-9]{7,15}"
      s"""WITH salted AS (
           SELECT doc_id,
                  coalesce(text, '') || ' contact u' || doc_id::VARCHAR ||
                    '@example.com or +4915123' ||
                    lpad((doc_id % 1000)::VARCHAR, 4, '0') ||
                    ' at 10.1.2.' || (doc_id % 256)::VARCHAR AS text
           FROM documents),
         s1 AS (SELECT doc_id,
                  len(regexp_extract_all(text, '$email'))::BIGINT AS n_emails,
                  regexp_replace(text, '$email', '<EMAIL>', 'g') AS t1
                FROM salted),
         s2 AS (SELECT doc_id, n_emails,
                  len(regexp_extract_all(t1, '$ip'))::BIGINT AS n_ips,
                  regexp_replace(t1, '$ip', '<IP>', 'g') AS t2
                FROM s1)
         SELECT doc_id,
                regexp_replace(t2, '$phone', '<PHONE>', 'g') AS clean_text,
                n_emails, n_ips,
                len(regexp_extract_all(t2, '$phone'))::BIGINT AS n_phones
         FROM s2"""
    },
    "d23_duplicate_span_removal" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         wins AS (
           SELECT doc_id, p,
                  md5(array_to_string(list_slice(ws, p, p + 4), ' ')) AS fp
           FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS p
                 FROM t WHERE len(ws) >= 5) x),
         dup AS (SELECT fp FROM (SELECT fp, count(DISTINCT doc_id) AS nd
                                 FROM wins GROUP BY fp) g WHERE nd >= 2),
         dwin AS (SELECT w.doc_id, w.p FROM wins w JOIN dup USING (fp)),
         cov AS (SELECT DISTINCT doc_id, p + k AS pos
                 FROM dwin, unnest(generate_series(0, 4)) AS s(k)),
         toks AS (SELECT doc_id, i AS pos, ws[i] AS tok
                  FROM t, unnest(generate_series(1, len(ws))) AS s(i)),
         kept AS (SELECT tk.doc_id, tk.pos, tk.tok FROM toks tk
                  WHERE NOT EXISTS (SELECT 1 FROM cov c
                                    WHERE c.doc_id = tk.doc_id
                                      AND c.pos = tk.pos)),
         reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
                 FROM kept GROUP BY doc_id),
         rem AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id)
         SELECT t.doc_id, coalesce(reb.clean_text, '') AS clean_text,
                len(t.ws)::BIGINT AS n_tokens,
                coalesce(rem.n_removed, 0)::BIGINT AS n_removed
         FROM t LEFT JOIN reb ON t.doc_id = reb.doc_id
                LEFT JOIN rem ON t.doc_id = rem.doc_id""",
    "t31_quality_rules" -> qualityRulesOracle,
    "t32_quality_classifier" -> qualityClassifierOracle(epochs = 3, lr = 1.0)
  )

  /** s10 oracle: the deterministic ±1 hyperplanes as DOUBLE[] literals
    * (the lshNearDupOracle device), dot products replayed
    * component-for-component, then unnested to scalar
    * (vec_id, component, value) rows via a generate_series subscript
    * (this DuckDB lacks WITH ORDINALITY) to mirror the gate query's
    * posexplode. */
  private def randomProjectionOracle(dim: Int, k: Int): String = {
    def planeLit(p: Int): String =
      graft.operators.Similarity.hyperplane(p, dim)
        .map(v => if (v > 0) "1" else "-1").mkString("[", ",", "]::DOUBLE[]")
    val comps = (0 until k)
      .map(j => s"round(list_dot_product(v, ${planeLit(j)}), 4)")
      .mkString("[", ",\n             ", "]")
    s"""WITH proj AS (
         SELECT vec_id, $comps AS pv
         FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) t)
       SELECT vec_id, j - 1 AS component, pv[j] AS value
       FROM proj, unnest(generate_series(1, len(pv))) AS s(j)"""
  }

  /** t27 oracle: `nMerges` chained rounds, each replayed POSITIONALLY —
    * candidate positions where (sym[i], sym[i+1]) equals the round's top
    * pair, greedy non-overlap as odd ranks within consecutive candidate
    * runs (overlap only occurs when left = right), then a positional
    * rebuild that drops consumed slots. Exactly the engine fold: a
    * freshly merged symbol never re-matches as LEFT in the same round. */
  /** The chained per-round BPE CTEs (p/t/cand/take/w per step) shared by
    * the t27 (training) and t29 (encoding) oracles. `extraKeys` are w0
    * columns beyond (wid, sym) carried through every rebuild — t29
    * threads (doc_id, word_idx) so the final tokenization stays
    * addressable. */
  private def bpeStepCtes(nMerges: Int, extraKeys: Seq[String]): String = {
    val xsel = extraKeys.map(k => s", p.$k").mkString
    val xcarry = extraKeys.map(k => s", $k").mkString
    (1 to nMerges).map { k =>
      s"""p$k AS (SELECT sym[i] AS l, sym[i+1] AS r, count(*) AS freq
             FROM (SELECT sym, unnest(generate_series(1, len(sym) - 1)) AS i
                   FROM w${k - 1}) t
             GROUP BY 1, 2),
         t$k AS (SELECT l, r, freq FROM p$k
                 ORDER BY freq DESC, l ASC, r ASC LIMIT 1),
         cand$k AS (SELECT wid, i
                    FROM (SELECT wid, sym,
                            unnest(generate_series(1, len(sym) - 1)) AS i
                          FROM w${k - 1}) t, t$k
                    WHERE sym[i] = t$k.l AND sym[i+1] = t$k.r),
         take$k AS (SELECT wid, i FROM (
                      SELECT wid, i,
                             row_number() OVER (PARTITION BY wid, grp
                               ORDER BY i) AS rn
                      FROM (SELECT wid, i,
                              i - row_number() OVER (PARTITION BY wid
                                ORDER BY i) AS grp
                            FROM cand$k) g) t
                    WHERE rn % 2 = 1),
         w$k AS (
           SELECT p.wid$xsel,
                  list(CASE WHEN tk.i IS NOT NULL THEN t$k.l || t$k.r
                            ELSE p.sym[p.j] END ORDER BY p.j) AS sym
           FROM (SELECT wid$xcarry, sym,
                   unnest(generate_series(1, len(sym))) AS j
                 FROM w${k - 1}) p
           CROSS JOIN t$k
           LEFT JOIN take$k tk ON tk.wid = p.wid AND tk.i = p.j
           LEFT JOIN take$k cons ON cons.wid = p.wid AND cons.i = p.j - 1
           WHERE cons.i IS NULL
           GROUP BY p.wid$xsel, t$k.l, t$k.r)"""
    }.mkString(",\n         ")
  }

  private def bpeMergesOracle(nMerges: Int): String = {
    val out = (1 to nMerges).map(k =>
      s"""SELECT $k AS step, l AS "left", r AS "right", freq FROM t$k""")
      .mkString("\n         UNION ALL ")
    s"""WITH w0 AS (
           SELECT row_number() OVER () AS wid, string_split(w, '') AS sym
           FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
           WHERE len(w) >= 1),
         ${bpeStepCtes(nMerges, Seq.empty)}
         $out"""
  }

  /** The s05 PQ-ADC machinery (codebook sample → per-subspace encode →
    * broadcast ADC tables → per-pair score) as a spliceable CTE chain
    * exposing `sims` (qid, nid, sim) — shared by the s05 oracle
    * (rank-cut) and s11 (candidate cut → exact cosine re-rank).
    * Constants pin the gate configuration: dim 64, m 4 (sub 16),
    * ks 16, queries vec_id < 10. */
  /** t37/t38 oracle: full-corpus Okapi BM25 with Lucene idf over the
    * 8-token query prefixes of docs 0-2. t39 passes a corpus WHERE —
    * only the w CTE (the indexed corpus) filters; the queries are
    * given externally and stay unfiltered. */
  private def bm25Oracle: String = bm25Oracle("")

  private def bm25Oracle(corpusWhere: String): String =
    bm25Oracle(corpusWhere, "")

  /** `candWhere` is the t40 filtered-search slice: it restricts the
    * scored CANDIDATES only (Lucene filter-query semantics) — df/dl/
    * stats stay corpus-wide, unlike `corpusWhere` (deletes). */
  private def bm25Oracle(corpusWhere: String, candWhere: String): String =
    s"""WITH w AS (SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term
                  FROM documents $corpusWhere),
       tf AS (SELECT doc, term, count(*) AS tf FROM w GROUP BY 1, 2),
       dl AS (SELECT doc, count(*)::DOUBLE AS dl FROM w GROUP BY 1),
       stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
       df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
       qt AS (SELECT DISTINCT qid, term FROM (
                SELECT doc_id AS qid,
                       unnest(list_slice(string_split(text, ' '), 1, 8)) AS term
                FROM documents WHERE doc_id < 3)),
       scored AS (
         SELECT qt.qid, tf.doc,
                ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) *
                  (tf.tf * (1.2 + 1)) /
                  (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS sc
         FROM qt JOIN tf USING (term) JOIN df USING (term)
              JOIN dl ON tf.doc = dl.doc CROSS JOIN stats s $candWhere),
       agg AS (SELECT qid, doc AS doc_id, sum(sc) AS score
               FROM scored GROUP BY 1, 2)
       SELECT qid, doc_id, round(score, 6) AS score,
              row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
       FROM agg
       QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) <= 5"""

  private def pqAdcCtes: String = pqAdcCtes("")

  /** `sampWhere` restricts the codebook SAMPLE relation (e.g.
    * "WHERE vec_id < 250" for the incremental-append oracle, whose
    * codebook was trained on the initial batch only); encode/query
    * CTEs always run over the full corpus. */
  private def pqAdcCtes(sampWhere: String): String =
    s"""samp AS (
           SELECT vec_id AS sid, embedding::DOUBLE[] AS sv,
                  row_number() OVER (
                    ORDER BY md5('pq'||vec_id::varchar), vec_id) AS cid
           FROM embeddings $sampWhere
           ORDER BY md5('pq'||vec_id::varchar), vec_id LIMIT 16),
         cb AS (
           SELECT cid, g.sub,
                  list_slice(sv, g.sub*16 + 1, g.sub*16 + 16) AS cv
           FROM samp, (SELECT unnest(range(0, 4)) AS sub) g),
         cb2 AS (SELECT cid, sub, cv,
                        list_inner_product(cv, cv) AS cn2 FROM cb),
         enc0 AS (
           SELECT e.vec_id AS nid, c.sub AS nsub, c.cid, c.cn2,
                  c.cn2 - 2 * list_inner_product(
                    list_slice(e.embedding::DOUBLE[], c.sub*16 + 1, c.sub*16 + 16),
                    c.cv) AS d2
           FROM embeddings e CROSS JOIN cb2 c),
         enc AS (
           SELECT nid, nsub, cid AS code, cn2 AS coden2
           FROM (SELECT *, row_number() OVER (
                   PARTITION BY nid, nsub ORDER BY d2, cid) AS rn
                 FROM enc0)
           WHERE rn = 1),
         qt AS (
           SELECT q.vec_id AS qid,
                  sqrt(list_inner_product(q.embedding::DOUBLE[],
                                          q.embedding::DOUBLE[])) AS qn,
                  c.sub AS nsub, c.cid AS code,
                  list_inner_product(
                    list_slice(q.embedding::DOUBLE[], c.sub*16 + 1, c.sub*16 + 16),
                    c.cv) AS pdot
           FROM embeddings q CROSS JOIN cb2 c WHERE q.vec_id < 10),
         sims AS (
           SELECT qid, nid,
                  sum(pdot::DECIMAL(30,12))::DOUBLE
                    / (max(qn) * sqrt(sum(coden2::DECIMAL(30,12))::DOUBLE))
                    AS sim
           FROM enc JOIN qt USING (nsub, code)
           WHERE nid != qid
           GROUP BY qid, nid)"""

  /** t31 oracle: the qualityRules battery replayed column-for-column at
    * the engine's 4 dp ratio grid and default thresholds. Shared by t32
    * as its feature/label subquery. */
  private def qualityRulesOracle: String =
    """WITH s AS (SELECT doc_id, text, string_split(text, ' ') AS ws
                  FROM documents),
       f AS (
         SELECT doc_id,
                len(ws)::BIGINT AS n_words,
                round(list_sum(list_transform(ws, x -> length(x)))::double
                      / len(ws), 4) AS mean_wlen,
                round(len(regexp_extract_all(text, '#|\.\.\.|…|•|‣|▪'))::double
                      / len(ws), 4) AS symbol_ratio,
                round(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))::double
                      / len(ws), 4) AS alpha_frac,
                len(list_intersect(list_distinct(ws),
                  ['the','a','and','of','to','in','is','it','that','for']))::BIGINT
                  AS n_stop_distinct
         FROM s)
       SELECT doc_id, n_words, mean_wlen, symbol_ratio, alpha_frac,
              n_stop_distinct,
              (n_words >= 50 AND n_words <= 100000) AS ok_words,
              (mean_wlen >= 3.0 AND mean_wlen <= 10.0) AS ok_wlen,
              symbol_ratio <= 0.1 AS ok_symbol,
              alpha_frac >= 0.8 AS ok_alpha,
              n_stop_distinct >= 2 AS ok_stops,
              (n_words >= 50 AND n_words <= 100000
               AND mean_wlen >= 3.0 AND mean_wlen <= 10.0
               AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
               AND n_stop_distinct >= 2) AS keep
       FROM f"""

  /** t32 oracle: every GD epoch as a chained CTE over the t31 features —
    * z is written LEFT-ASSOCIATIVE to match the engine's fold order
    * (IEEE addition order is part of the contract), per-row gradient
    * contributions cast to DECIMAL(30,12) and summed exactly (the
    * engine's partition-order-independent decimal-sum contract),
    * weights round to 6 dp per epoch, accuracies compare z > 0 (no
    * libm boundary). The leak-free 80/20 split replays the engine's
    * splitBucket: md5(seed || min-doc_id-per-exact-text) arithmetic. */
  private def qualityClassifierOracle(epochs: Int, lr: Double,
                                      seed: String = "qsplit",
                                      pctTrain: Int = 80): String = {
    val out = (1 to epochs).map(k =>
      s"SELECT $k AS epoch, w0, w1, w2, w3, w4, w5, acc AS accuracy, " +
        s"vacc AS val_accuracy FROM e$k")
      .mkString("\n       UNION ALL ")
    s"""WITH ${qualityClassifierCtes(epochs, lr, seed, pctTrain)}
       $out"""
  }

  /** The shared split/feature/epoch CTE chain of the t32 oracle —
    * factored out so t33's apply-calibration oracle can read the SAME
    * e{epochs} weights the engine's train→apply round trip uses. */
  private def qualityClassifierCtes(epochs: Int, lr: Double,
                                    seed: String, pctTrain: Int): String = {
    val feats = s"""cl AS (
         SELECT doc_id,
                min(doc_id) OVER (PARTITION BY md5(text)) AS rep
         FROM documents),
       sp AS (
         SELECT doc_id,
                ('0x'||substr(md5('$seed'||rep::VARCHAR), 1, 8))::BIGINT
                  % 100 < $pctTrain AS tr
         FROM cl),
       feats AS (
         SELECT 1.0 AS x0,
                n_words::double / 100.0 AS x1,
                mean_wlen / 10.0 AS x2,
                symbol_ratio AS x3,
                alpha_frac AS x4,
                n_stop_distinct::double / 10.0 AS x5,
                CASE WHEN keep THEN 1.0 ELSE 0.0 END AS y,
                sp.tr AS tr
         FROM ($qualityRulesOracle) q JOIN sp USING (doc_id))"""
    val e0 = "e0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, " +
      "0.0 AS w3, 0.0 AS w4, 0.0 AS w5)"
    val nTr = "sum(CASE WHEN f.tr THEN 1.0 ELSE 0.0 END)"
    val nVa = "sum(CASE WHEN f.tr THEN 0.0 ELSE 1.0 END)"
    val eks = (1 to epochs).map { k =>
      val z = (0 until 6).map(j => s"e.w$j * f.x$j").mkString(" + ")
      val ws = (0 until 6).map(j =>
        s"round(min(e.w$j) - $lr * sum(CASE WHEN f.tr THEN " +
          s"((1.0/(1.0 + exp(-($z))) - f.y) * f.x$j)::DECIMAL(30,12) " +
          s"ELSE 0::DECIMAL(30,12) END)::DOUBLE / $nTr, 6) AS w$j")
        .mkString(",\n                ")
      val hit = s"(($z) > 0.0) = (f.y > 0.5)"
      s"""e$k AS (
         SELECT $ws,
                round(sum(CASE WHEN f.tr AND $hit
                          THEN 1.0 ELSE 0.0 END) / $nTr, 6) AS acc,
                round(sum(CASE WHEN (NOT f.tr) AND $hit
                          THEN 1.0 ELSE 0.0 END) / $nVa, 6) AS vacc
         FROM feats f, e${k - 1} e)"""
    }.mkString(",\n       ")
    s"""$feats,
       $e0,
       $eks"""
  }

  /** s13/s14 oracle: the s03 cell/probe machinery composed with the
    * s05 ADC machinery — ADC scores restricted to probed cells. Shared
    * by the in-session composition and the persisted index (their
    * results are bit-identical by construction). */
  private def ivfadcOracle: String =
    s"""WITH $ivfadcCtes
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM csims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3"""

  /** The IVFADC CTE chain without its final SELECT — s13/s14 rank it
    * directly; s16's recall audit joins it against the exact top-k;
    * s17 passes `sampWhere` so centroids AND codebook come from the
    * build half only (the append batch never retrains either). */
  private def ivfadcCtes: String = ivfadcCtes("")

  private def ivfadcCtes(sampWhere: String): String =
    s"""c AS (
           SELECT vec_id AS ccid, embedding::DOUBLE[] AS ccv
           FROM embeddings $sampWhere
           ORDER BY md5('ivf'||vec_id::varchar), vec_id LIMIT 16),
         ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         asgn AS (
           SELECT ev.vec_id AS id, c.ccid,
                  list_dot_product(ev.v, c.ccv)
                    / (sqrt(list_dot_product(ev.v, ev.v))
                       * sqrt(list_dot_product(c.ccv, c.ccv))) AS csim
           FROM ev, c),
         cells AS (
           SELECT id AS nid, ccid AS cell FROM (
             SELECT id, ccid,
                    row_number() OVER (
                      PARTITION BY id ORDER BY csim DESC, ccid) AS rn
             FROM asgn) t WHERE rn = 1),
         probes AS (
           SELECT id AS qid, ccid AS cell FROM (
             SELECT id, ccid,
                    row_number() OVER (
                      PARTITION BY id ORDER BY csim DESC, ccid) AS rn
             FROM asgn WHERE id < 10) t WHERE rn <= 4),
         ${pqAdcCtes(sampWhere)},
         csims AS (
           SELECT t.qid, e.nid,
                  sum(t.pdot::DECIMAL(30,12))::DOUBLE
                    / (max(t.qn) * sqrt(sum(e.coden2::DECIMAL(30,12))::DOUBLE))
                    AS sim
           FROM enc e
           JOIN cells cl ON cl.nid = e.nid
           JOIN probes p ON p.cell = cl.cell
           JOIN qt t ON t.nsub = e.nsub AND t.code = e.code
                    AND t.qid = p.qid
           WHERE e.nid != t.qid
           GROUP BY t.qid, e.nid)"""

  /** s18/s19 oracle: by-residual IVFADC replayed end to end — cell
    * assignment, residual vectors, residual codebook (md5 'pq' sample
    * of RESIDUALS), residual argmin encode, the precomputed
    * centroid⋅code cross terms, and the reconstruction-cosine score
    * cos(q, centroid + r̂) with DECIMAL(30,12) partial sums. Shared by
    * the in-session composition and the persisted index (bit-identical
    * by construction). */
  private def ivfadcResidualOracle: String =
    s"""WITH c AS (
           SELECT vec_id AS ccid, embedding::DOUBLE[] AS ccv
           FROM embeddings
           ORDER BY md5('ivf'||vec_id::varchar), vec_id LIMIT 16),
         ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         asgn AS (
           SELECT ev.vec_id AS id, c.ccid,
                  list_dot_product(ev.v, c.ccv)
                    / (sqrt(list_dot_product(ev.v, ev.v))
                       * sqrt(list_dot_product(c.ccv, c.ccv))) AS csim
           FROM ev, c),
         cells AS (
           SELECT id AS nid, ccid AS cell FROM (
             SELECT id, ccid,
                    row_number() OVER (
                      PARTITION BY id ORDER BY csim DESC, ccid) AS rn
             FROM asgn) t WHERE rn = 1),
         probes AS (
           SELECT id AS qid, ccid AS cell FROM (
             SELECT id, ccid,
                    row_number() OVER (
                      PARTITION BY id ORDER BY csim DESC, ccid) AS rn
             FROM asgn WHERE id < 10) t WHERE rn <= 4),
         rv AS (
           SELECT cl.nid, cl.cell,
                  list_transform(range(1, 65), i -> e.v[i] - c.ccv[i]) AS rv
           FROM cells cl
           JOIN ev e ON e.vec_id = cl.nid
           JOIN c ON c.ccid = cl.cell),
         samp AS (
           SELECT nid AS sid, rv AS sv,
                  row_number() OVER (
                    ORDER BY md5('pq'||nid::varchar), nid) AS cid
           FROM rv
           ORDER BY md5('pq'||nid::varchar), nid LIMIT 16),
         cb AS (
           SELECT cid, g.sub,
                  list_slice(sv, g.sub*16 + 1, g.sub*16 + 16) AS cv
           FROM samp, (SELECT unnest(range(0, 4)) AS sub) g),
         cb2 AS (SELECT cid, sub, cv,
                        list_inner_product(cv, cv) AS cn2 FROM cb),
         encr0 AS (
           SELECT r.nid, b.sub AS nsub, b.cid, b.cn2,
                  b.cn2 - 2 * list_inner_product(
                    list_slice(r.rv, b.sub*16 + 1, b.sub*16 + 16),
                    b.cv) AS d2
           FROM rv r CROSS JOIN cb2 b),
         encr AS (
           SELECT nid, nsub, cid AS code, cn2 AS coden2
           FROM (SELECT *, row_number() OVER (
                   PARTITION BY nid, nsub ORDER BY d2, cid) AS rn
                 FROM encr0)
           WHERE rn = 1),
         ccd AS (
           SELECT en.nid, cl.cell, en.nsub, en.code, en.coden2,
                  list_inner_product(
                    list_slice(c.ccv, en.nsub*16 + 1, en.nsub*16 + 16),
                    b.cv) AS codecdot
           FROM encr en
           JOIN cells cl ON cl.nid = en.nid
           JOIN c ON c.ccid = cl.cell
           JOIN cb2 b ON b.sub = en.nsub AND b.cid = en.code),
         qc AS (
           SELECT p.qid, p.cell,
                  list_inner_product(q.v, c.ccv) AS qcdot,
                  list_inner_product(c.ccv, c.ccv) AS cn2
           FROM probes p
           JOIN ev q ON q.vec_id = p.qid
           JOIN c ON c.ccid = p.cell),
         qt AS (
           SELECT q.vec_id AS qid,
                  sqrt(list_inner_product(q.v, q.v)) AS qn,
                  b.sub AS nsub, b.cid AS code,
                  list_inner_product(
                    list_slice(q.v, b.sub*16 + 1, b.sub*16 + 16),
                    b.cv) AS pdot
           FROM ev q CROSS JOIN cb2 b WHERE q.vec_id < 10),
         rsims AS (
           SELECT t.qid, en.nid,
                  (max(qc.qcdot) + sum(t.pdot::DECIMAL(30,12))::DOUBLE)
                    / (max(t.qn) * sqrt(max(qc.cn2)
                        + 2 * sum(en.codecdot::DECIMAL(30,12))::DOUBLE
                        + sum(en.coden2::DECIMAL(30,12))::DOUBLE)) AS sim
           FROM ccd en
           JOIN qc ON qc.cell = en.cell
           JOIN qt t ON t.nsub = en.nsub AND t.code = en.code
                    AND t.qid = qc.qid
           WHERE en.nid != t.qid
           GROUP BY t.qid, en.nid)
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM rsims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3"""

  /** s20 oracle: Lloyd-trained PQ replayed round by round — rounded
    * sampled init, `iters` rounds of argmin-assign + 6 dp-rounded
    * per-(subspace, code, coordinate) means (empty codes keep their
    * centroid), then the standard ADC search against the final
    * codebook with DECIMAL(30,12) partial sums. */
  private def pqTrainedOracle(iters: Int): String = {
    val rounds = (1 to iters).map { r =>
      s"""enc${r}0 AS (
           SELECT e.vec_id AS nid, b.sub AS nsub, b.cid,
                  b.cn2 - 2 * list_inner_product(
                    list_slice(e.v, b.sub*16 + 1, b.sub*16 + 16),
                    b.cv) AS d2
           FROM ev e CROSS JOIN cbn${r - 1} b),
         enc$r AS (
           SELECT nid, nsub, cid AS code
           FROM (SELECT *, row_number() OVER (
                   PARTITION BY nid, nsub ORDER BY d2, cid) AS rn
                 FROM enc${r}0)
           WHERE rn = 1),
         mm$r AS (
           SELECT x.nsub, c.code, x.j, round(avg(x.x), 6) AS mx
           FROM xj x JOIN enc$r c ON c.nid = x.nid AND c.nsub = x.nsub
           GROUP BY 1, 2, 3),
         cb${r}v AS (
           SELECT nsub AS sub, code AS cid, list(mx ORDER BY j) AS cv
           FROM mm$r GROUP BY 1, 2),
         cb$r AS (
           SELECT p.cid, p.sub, coalesce(n.cv, p.cv) AS cv
           FROM cbn${r - 1} p
           LEFT JOIN cb${r}v n ON n.sub = p.sub AND n.cid = p.cid),
         cbn$r AS (SELECT cid, sub, cv,
                          list_inner_product(cv, cv) AS cn2 FROM cb$r)"""
    }.mkString(",\n         ")
    s"""WITH samp AS (
           SELECT vec_id AS sid, embedding::DOUBLE[] AS sv,
                  row_number() OVER (
                    ORDER BY md5('pq'||vec_id::varchar), vec_id) AS cid
           FROM embeddings
           ORDER BY md5('pq'||vec_id::varchar), vec_id LIMIT 16),
         cb0 AS (
           SELECT cid, g.sub,
                  list_transform(
                    list_slice(sv, g.sub*16 + 1, g.sub*16 + 16),
                    x -> round(x, 6)) AS cv
           FROM samp, (SELECT unnest(range(0, 4)) AS sub) g),
         cbn0 AS (SELECT cid, sub, cv,
                         list_inner_product(cv, cv) AS cn2 FROM cb0),
         ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         xj AS (
           SELECT e.vec_id AS nid, ((d.dim - 1) // 16)::INT AS nsub,
                  ((d.dim - 1) % 16)::INT AS j, e.v[d.dim] AS x
           FROM ev e, (SELECT unnest(range(1, 65)) AS dim) d),
         $rounds,
         encf0 AS (
           SELECT e.vec_id AS nid, b.sub AS nsub, b.cid, b.cn2,
                  b.cn2 - 2 * list_inner_product(
                    list_slice(e.v, b.sub*16 + 1, b.sub*16 + 16),
                    b.cv) AS d2
           FROM ev e CROSS JOIN cbn$iters b),
         encf AS (
           SELECT nid, nsub, cid AS code, cn2 AS coden2
           FROM (SELECT *, row_number() OVER (
                   PARTITION BY nid, nsub ORDER BY d2, cid) AS rn
                 FROM encf0)
           WHERE rn = 1),
         qt AS (
           SELECT q.vec_id AS qid,
                  sqrt(list_inner_product(q.v, q.v)) AS qn,
                  b.sub AS nsub, b.cid AS code,
                  list_inner_product(
                    list_slice(q.v, b.sub*16 + 1, b.sub*16 + 16),
                    b.cv) AS pdot
           FROM ev q CROSS JOIN cbn$iters b WHERE q.vec_id < 10),
         sims AS (
           SELECT qid, nid,
                  sum(pdot::DECIMAL(30,12))::DOUBLE
                    / (max(qn) * sqrt(sum(coden2::DECIMAL(30,12))::DOUBLE))
                    AS sim
           FROM encf JOIN qt USING (nsub, code)
           WHERE nid != qid
           GROUP BY qid, nid)
         SELECT qid, nid, round(sim, 6) AS sim,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         FROM sims
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 3"""
  }

  /** t24 oracle (the exact-pair release recipe over the mirrored
    * corpus) — factored out so t36's per-(source, split) report can
    * wrap the SAME plan replay as a subquery. */
  private def corpusReleaseOracle: String =
      """WITH RECURSIVE
           all_docs AS (
             SELECT doc_id, text, source FROM documents
             UNION ALL
             SELECT doc_id + 200000, text, 'mirror_' || source
             FROM documents WHERE doc_id % 7 = 0),
           ranked AS (
             SELECT doc_id, text, source,
                    row_number() OVER (PARTITION BY md5(text)
                      ORDER BY (CASE WHEN starts_with(source, 'mirror_') THEN 2 ELSE 1 END), doc_id) AS rk,
                    count(*) OVER (PARTITION BY md5(text)) AS n_copies
             FROM all_docs),
           surv AS (SELECT doc_id, text, source, n_copies FROM ranked WHERE rk = 1),
           w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM surv),
           sh AS (SELECT DISTINCT doc_id, ws[n]||' '||ws[n+1]||' '||ws[n+2] AS sh
                  FROM (SELECT doc_id, ws,
                          unnest(generate_series(1, greatest(len(ws)-2, 0))) AS n
                        FROM w) t),
           sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
           inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                     FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                     GROUP BY 1, 2),
           pairs AS (SELECT id_a, id_b FROM inter
                     JOIN sizes sa ON sa.doc_id = id_a
                     JOIN sizes sb ON sb.doc_id = id_b
                     WHERE i::double / (sa.sz + sb.sz - i) > 0.8),
           edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                     UNION SELECT id_b, id_a FROM pairs),
           reach(id, lbl) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id),
           cl AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id),
           sz2 AS (SELECT cluster, count(*) AS cluster_size FROM cl GROUP BY cluster),
           rel AS (SELECT s.doc_id, s.source, s.n_copies,
                          coalesce(cl.cluster, s.doc_id) AS cluster,
                          coalesce(sz2.cluster_size, 1) AS cluster_size,
                          round(1.0 / coalesce(sz2.cluster_size, 1), 6) AS weight
                   FROM surv s
                   LEFT JOIN cl ON s.doc_id = cl.id
                   LEFT JOIN sz2 ON cl.cluster = sz2.cluster),
           b AS (SELECT *,
                        ('0x'||substr(md5('rel0' || cluster::varchar), 1, 8))::BIGINT % 100 AS bucket
                 FROM rel)
         SELECT doc_id, source, n_copies, cluster, cluster_size, weight, bucket,
                CASE WHEN bucket < 80 THEN 'train'
                     WHEN bucket < 90 THEN 'val'
                     ELSE 'test' END AS split
         FROM b"""

  /** t35 oracle: [[graft.operators.TextOps.normalizeText]]'s staged
    * fold chain replayed with the SAME \x{...} classes (RE2 parses
    * them identically to Java regex), the same planted salt (chr()
    * codepoints — no invisible characters in source), and 'g' on
    * every replace (DuckDB defaults to first-match). */
  private def textNormalizeOracle: String = {
    val quotes = "[\\x{2018}\\x{2019}\\x{201A}\\x{201B}]"
    val dquotes = "[\\x{201C}\\x{201D}\\x{201E}\\x{201F}]"
    val dashes = "[\\x{2012}\\x{2013}\\x{2014}\\x{2015}\\x{2212}]"
    val spaces = "[\\x{00A0}\\x{2007}\\x{2009}\\x{202F}\\x{3000}]"
    val zwsp = "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]"
    val ctl = "[\\x{0001}-\\x{0008}\\x{000B}-\\x{001F}\\x{007F}-\\x{009F}]"
    val salt = "' ' || chr(8220) || 'q' || chr(8221) || ' ' || " +
      "chr(8216) || 's' || chr(8217) || ' ' || chr(8212) || ' a' || " +
      "chr(160) || 'b' || chr(8203) || 'c' || chr(7) || 'd'"
    s"""WITH salted AS (
           SELECT doc_id, coalesce(text, '') || $salt AS text
           FROM documents),
         s1 AS (
           SELECT doc_id,
                  len(regexp_extract_all(text,
                    '$quotes|$dquotes|$dashes|$spaces|$zwsp|$ctl'))::BIGINT
                    AS n_folds,
                  regexp_replace(regexp_replace(regexp_replace(
                    regexp_replace(regexp_replace(regexp_replace(text,
                      '$quotes', '''', 'g'),
                      '$dquotes', '"', 'g'),
                      '$dashes', '-', 'g'),
                      '$spaces', ' ', 'g'),
                      '$zwsp', '', 'g'),
                      '$ctl', '', 'g') AS t1
           FROM salted)
         SELECT doc_id,
                trim(regexp_replace(t1, ' +', ' ', 'g')) AS norm_text,
                n_folds
         FROM s1"""
  }

  /** t33 oracle: the t32 CTE chain supplies the trained epoch-N
    * weights; the full (unsplit) feature relation scores z = w·x
    * left-associatively, equal-width logit bins via the pinned
    * (z−zmin)·nBins/(zmax−zmin) arithmetic, per-bin label stats with
    * the DECIMAL(30,12) exact-sum mean. */
  private def qualityApplyOracle(epochs: Int, lr: Double,
                                 nBins: Int = 10,
                                 seed: String = "qsplit",
                                 pctTrain: Int = 80): String = {
    val z = (0 until 6).map(j => s"e.w$j * f.x$j").mkString(" + ")
    s"""WITH ${qualityClassifierCtes(epochs, lr, seed, pctTrain)},
       af AS (
         SELECT doc_id, 1.0 AS x0,
                n_words::double / 100.0 AS x1,
                mean_wlen / 10.0 AS x2,
                symbol_ratio AS x3,
                alpha_frac AS x4,
                n_stop_distinct::double / 10.0 AS x5,
                CASE WHEN keep THEN 1.0 ELSE 0.0 END AS y
         FROM ($qualityRulesOracle) q),
       sc AS (SELECT f.doc_id, ($z) AS z, f.y FROM af f, e$epochs e),
       rng AS (SELECT min(z) AS zmin, max(z) AS zmax FROM sc),
       bn AS (
         SELECT (CASE WHEN r.zmax = r.zmin THEN 0
                 ELSE least(floor((z - r.zmin) * ${nBins}.0
                                  / (r.zmax - r.zmin)), ${nBins - 1})
                 END)::BIGINT AS bin,
                z, y
         FROM sc, rng r)
       SELECT bin, count(*) AS n_docs, sum(y)::BIGINT AS n_rule_keep,
              round(sum(y) / count(*), 6) AS keep_rate,
              round(sum(z::DECIMAL(30,12))::DOUBLE / count(*), 6)
                AS mean_logit
       FROM bn GROUP BY bin"""
  }

  /** t29 oracle: the t27 fold machinery with (doc_id, word_idx) carried
    * through every round, final symbols unnested to one row per token
    * (generate_series subscript — no WITH ORDINALITY here). */
  private def bpeEncodeOracle(nMerges: Int): String =
    s"""WITH w0 AS (
           SELECT doc_id::VARCHAR || ':' || wi::VARCHAR AS wid,
                  doc_id, wi - 1 AS word_idx,
                  string_split(ws[wi], '') AS sym
           FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t,
                unnest(generate_series(1, len(ws))) AS s(wi)
           WHERE len(ws[wi]) >= 1),
         ${bpeStepCtes(nMerges, Seq("doc_id", "word_idx"))}
         SELECT doc_id, word_idx, j - 1 AS token_idx, sym[j] AS token
         FROM w$nMerges, unnest(generate_series(1, len(sym))) AS s(j)"""

  /** d02's oracle with the threshold parameterized (d22's audit reuses
    * it at 0.5): distinct 3-word shingles, inverted-index pair join,
    * exact Jaccard. */
  private def jaccardOracle(threshold: Double): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                  ws[n]||' '||ws[n+1]||' '||ws[n+2] AS sh
                FROM (SELECT doc_id, ws,
                        unnest(generate_series(1, greatest(len(ws)-2, 0))) AS n
                      FROM w) t),
         sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                   FROM sh a JOIN sh b ON a.sh=b.sh AND a.doc_id<b.doc_id
                   GROUP BY 1, 2)
         SELECT id_a, id_b,
                round(i::double / (sa.sz + sb.sz - i), 6) AS jaccard
         FROM inter
         JOIN sizes sa ON sa.doc_id=id_a
         JOIN sizes sb ON sb.doc_id=id_b
         WHERE i::double / (sa.sz + sb.sz - i) > $threshold"""

  /** d21 oracle: the [[minhashOracle]] signature machinery (same md5
    * permutation literals) over corpus ∪ tail-truncated variants, with
    * the exact distinct-shingle count joined in and the containment
    * estimate Ĉ = Ĵ(sa+sb)/((1+Ĵ)·min(sa,sb)) replayed slot for slot. */
  private def containmentMinhashOracle(numPerm: Int, bands: Int,
                                       threshold: Double): String = {
    val rows = numPerm / bands
    val mins = (0 until numPerm).map { i =>
      val (a, b) = graft.operators.Dedup.minhashCoeffs(i)
      s"min(($a*h0+$b)%2147483647) AS h$i"
    }.mkString(",\n                  ")
    val sigList = (0 until numPerm).map(i => s"h$i").mkString("[", ",", "]")
    val ej = s"(len(list_filter(range(1, ${numPerm + 1}), i -> sga[i] = sgb[i]))/$numPerm.0)"
    s"""WITH all_docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 400000,
                  array_to_string(list_slice(string_split(text, ' '), 1,
                    greatest(len(string_split(text, ' ')) - 6, 1)), ' ')
           FROM documents WHERE doc_id % 5 = 0),
         w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM all_docs),
         sh AS (SELECT DISTINCT doc_id,
                  ws[n]||' '||ws[n+1]||' '||ws[n+2] AS sh
                FROM (SELECT doc_id, ws,
                        unnest(generate_series(1, greatest(len(ws)-2, 0))) AS n
                      FROM w) t),
         base AS (SELECT doc_id,
                    ('0x'||substr(md5(sh),1,15))::BIGINT % 2147483647 AS h0
                  FROM sh),
         hs AS (SELECT doc_id,
                  $mins,
                  count(*) AS sz
                FROM base GROUP BY 1),
         sig AS (SELECT doc_id, $sigList AS sig, sz FROM hs),
         bnd AS (SELECT doc_id, sig, sz, b,
                  array_to_string(list_slice(sig, b*$rows+1, b*$rows+$rows),
                    '|') AS bh
                 FROM sig, (SELECT unnest(range(0, $bands)) AS b) bb),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                    a.sig AS sga, b.sig AS sgb, a.sz AS sa, b.sz AS sb
                  FROM bnd a JOIN bnd b
                    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
         est AS (SELECT id_a, id_b, sa, sb,
                   round(least(1.0, $ej * (sa + sb)
                     / (($ej + 1.0) * least(sa, sb))), 6) AS ec
                 FROM cand)
         SELECT CASE WHEN sa < sb THEN id_a
                     WHEN sb < sa THEN id_b ELSE id_a END AS contained_id,
                CASE WHEN sa < sb THEN id_b
                     WHEN sb < sa THEN id_a ELSE id_b END AS container_id,
                ec AS est_containment
         FROM est WHERE ec >= $threshold"""
  }

  /** Shared pairs CTE for the d19/d20 oracles: corpus ∪ 12-word excerpts
    * (doc_id+300000 for every 10th doc), 3-word shingles, df-capped
    * informative shingle space, containment = |∩| / min pruned size.
    * Mirrors [[graft.operators.Dedup.containmentPairs]] over string
    * shingles (the engine's xxhash64 projection conflates nothing at
    * test SF — same equivalence d02 relies on). Ends with `cpairs`
    * (contained_id, container_id, containment ≥ threshold). */
  private def containmentPairsCte(maxDf: Int, threshold: Double): String =
    s"""all_docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 300000, array_to_string((string_split(text,' '))[1:12], ' ')
           FROM documents WHERE doc_id % 10 = 0),
         w AS (SELECT doc_id, string_split(text,' ') AS ws FROM all_docs),
         sh AS (SELECT DISTINCT doc_id, ws[n]||' '||ws[n+1]||' '||ws[n+2] AS sh
                FROM (SELECT doc_id, ws,
                        unnest(generate_series(1, greatest(len(ws)-2, 0))) AS n
                      FROM w) t),
         freq AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
         pruned AS (SELECT doc_id, s.sh FROM sh s JOIN freq USING (sh)
                    WHERE df <= $maxDf),
         sizes AS (SELECT doc_id, count(*) AS sz FROM pruned GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                   FROM pruned a JOIN pruned b
                     ON a.sh = b.sh AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         cpairs AS (
           SELECT CASE WHEN sa.sz < sb.sz THEN id_a
                       WHEN sb.sz < sa.sz THEN id_b ELSE id_a END AS contained_id,
                  CASE WHEN sa.sz < sb.sz THEN id_b
                       WHEN sb.sz < sa.sz THEN id_a ELSE id_b END AS container_id,
                  i::double / least(sa.sz, sb.sz) AS containment
           FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE i::double / least(sa.sz, sb.sz) >= $threshold)"""
}
