package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, language-ID scoring, quality ratios, and
  * document fingerprinting. All pure builtin Column expressions — fully
  * whole-stage-codegen'd, no UDFs, so a 100 TB documents scan stays one
  * map-only stage.
  */
object TextOps {

  def words(text: Column): Column = split(text, " ")

  /** Distinct n-gram shingles over a PRE-SPLIT words array — the unit for
    * Jaccard / MinHash dedup. Empty array when the document has fewer than
    * n words (guards Spark's descending `sequence(1,0)` corner).
    *
    * Takes the words array, not the raw text, so the O(L) tokenization
    * runs ONCE per document in a codegen'd projection below the explode.
    * Inlining `split(text)` here instead is an O(L²)-per-document trap:
    * `GenerateExec` evaluates generator expressions interpreted (no
    * whole-stage codegen, no common-subexpression elimination), so every
    * `element_at` of every shingle re-splits the whole document — measured
    * as the intermittent 30-110 s single-task stall in the d03 bench. */
  def shinglesOfWords(w: Column, n: Int = 3): Column =
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(1), size(w) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(k => element_at(w, i + lit(k))): _*))))
      .otherwise(array().cast("array<string>"))

  /** Distinct word n-gram shingles from raw text. Fine as a single
    * projected column; when feeding `explode`, prefer projecting
    * [[words]] first and exploding [[shinglesOfWords]] (see there). */
  def wordShingles(text: Column, n: Int = 3): Column =
    shinglesOfWords(words(text), n)

  /** Occurrence count of tokens from a fixed stopword list. */
  def stopwordCount(text: Column, stops: Seq[String]): Column =
    size(filter(words(text), x => array_contains(typedLit(stops), x)))

  /** Small per-language stopword banks for the n-gram/stopword language
    * heuristic (langid over `documents`). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "eine", "zu", "mit"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "pour", "que", "dans"))

  /** Whitespace token count (any run of spaces = one separator). */
  def wsTokenCount(text: Column): Column = size(split(text, " +"))

  /** BPE-ish subword count: letter runs, digit runs, and single
    * punctuation marks each count as one token. */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(bpeTokenPattern))

  /** Canonical whitespace/case normalization (the reference collapses
    * literal whitespace the same way, RDFGraph.py:110-111). */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), " +", " "))

  /** Content fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Winnowing-style minimum shingle hash (stable under reordering of
    * everything but the minimal window). Prefer [[minShingleHashOfWords]]
    * over a PROJECTED words column — this raw-text form inlines the
    * split into the transform lambda, where HOFs evaluate interpreted
    * with no subexpression elimination (the shinglesOfWords trap). */
  def minShingleHash(text: Column, n: Int = 3): Column =
    array_min(transform(wordShingles(text, n), s => md5(s)))

  /** [[minShingleHash]] over a pre-split words column — the words array
    * binds as an attribute, so the tokenization runs once per document
    * instead of once per element inside the interpreted HOF lambda
    * (measured 30× on t04 when the raw-text form reached the bench). */
  def minShingleHashOfWords(w: Column, n: Int = 3): Column =
    array_min(transform(shinglesOfWords(w, n), s => md5(s)))

  /** PII patterns for corpus scrubbing. Deliberately written in the
    * common subset of Java regex and RE2 (no lookaround, no
    * backreferences) so an external engine can replay the scrub
    * byte-for-byte — the property that makes redaction auditable.
    * The generalized form of the reference's scrubbing pre-pass
    * (dipper/sources/Source.py scrub hooks), aimed at the pass every
    * training-data pipeline runs before releasing a corpus. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phoneRe = "\\+1-[0-9]{3}-[0-9]{4}"

  /** Redact emails, IPv4 addresses, and phone-shaped tokens, in that
    * order (email first: its local part may contain digits that the
    * narrower patterns would otherwise bite into). Pure builtin
    * regexp_replace chain — map-only, whole-stage codegen'd. */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** URL occurrences (scheme-anchored, space-delimited). */
  val urlRe = "https?://[^ ]+"
  /** Host component of a URL — regex-extracted (not parse_url) so the
    * exact same expression replays in any RE2-compatible engine. */
  def urlHost(url: Column): Column =
    regexp_extract(url, "https?://([^/ ]+)", 1)

  /** Canonical form of a URL for crawl-level dedup: query string and
    * fragment dropped (tracking params — utm_*, fbclid, session ids —
    * all live there), trailing slash stripped, scheme+host lowercased
    * (path case preserved: it is significant per RFC 3986), and http
    * folded into https (crawls see both for the same page). Pure
    * regexp_replace/regexp_extract chain — map-only, codegen'd, and
    * replayable verbatim in any RE2-compatible engine. */
  def urlCanonicalize(url: Column): Column = {
    val bare = regexp_replace(regexp_replace(url, "[?#].*$", ""), "/$", "")
    val schemeHost = lower(regexp_extract(bare, "^((?i)https?://[^/]+)", 1))
    val path = regexp_extract(bare, "^(?i)https?://[^/]+(/.*)?$", 1)
    concat(regexp_replace(schemeHost, "^http://", "https://"), path)
  }

  /** Corpus-wide first-occurrence chunk dedup with document reassembly
    * (the CCNet/Gopher paragraph-dedup shape): every document splits into
    * fixed `chunkWords`-word chunks, each chunk content survives only at
    * its first occurrence in corpus order (doc id, then position), and
    * each document is reassembled from its surviving chunks. Returns
    * (id, n_chunks, n_kept, clean_text) for EVERY input document — a doc
    * whose text is entirely duplicated elsewhere comes back with
    * n_kept=0 and empty clean_text, not silently dropped.
    *
    * Scale shape: two inherent shuffles — the dedup decision (one window
    * partitioned by the chunk content, i.e. hash-partitioned on the dedup
    * key; each partition sorts only its own chunk group) and the per-doc
    * reassembly groupBy. No corpus-wide sort, no driver state; the
    * collect_list is bounded by a single document's chunk count. The
    * real-corpus setting is chunkWords ≈ a paragraph (50–200); tests use
    * small values so the synthetic vocabulary actually collides. */
  def chunkDedup(docs: DataFrame, idCol: String, textCol: String,
                 chunkWords: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(chunkWords >= 1, "chunkWords must be >= 1")
    // null text folds to "" (one empty chunk) — a null-text doc must
    // still come back, not vanish at the posexplode of a null array
    val chunks = docs
      .select(col(idCol).as("id"),
        words(coalesce(col(textCol), lit(""))).as("ws"))
      .select(col("id"), col("ws"),
        posexplode(sequence(lit(1), greatest(size(col("ws")), lit(1)),
          lit(chunkWords))).as(Seq("chunk_no", "start")))
      .select(col("id"), col("chunk_no"),
        array_join(slice(col("ws"), col("start"), lit(chunkWords)), " ")
          .as("chunk"))
      // two consumers (the keep-first window chain, the per-doc chunk
      // counts) — persist lazily so the tokenize + chunk explode runs
      // once (released with the session/bench cache clear)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val firstWin = Window.partitionBy(col("chunk"))
      .orderBy(col("id").asc, col("chunk_no").asc)
    val kept = chunks
      .withColumn("rk", row_number().over(firstWin))
      .filter(col("rk") === 1)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("chunk_no"), col("chunk")))),
            x => x.getField("chunk")), " ").as("clean_text"))
    chunks.groupBy(col("id")).agg(count(lit(1)).as("n_chunks"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Per-document mean unigram log-probability under the corpus's own
    * unigram distribution — the classic cheap LM-quality proxy (docs of
    * rare/garbled vocabulary score low, template-like docs score high).
    *
    * Scale shape: one corpus-wide word count (shuffle on word), then the
    * vocabulary relation — bounded by |vocab|, far below corpus size —
    * joins back to the exploded corpus. The join key is the word itself;
    * at 100 TB the vocabulary still fits a broadcast after a min-count
    * floor, but the hint is left out so AQE picks broadcast exactly when
    * the built relation is small enough. Returns (id, n_words, logprob).
    */
  /** Deterministic training-order shuffle: every row gets a reproducible
    * pseudo-random global position derived only from (seed, id) — the
    * property a training run needs to resume, re-shard, or replay
    * byte-identically on any cluster size (a `rand()`-based orderBy is
    * neither stable across retries nor across partitionings).
    *
    * Scale shape: NO global sort and NO unpartitioned window. Rows hash
    * into `buckets` pseudo-random buckets (md5 arithmetic, oracle-
    * reproducible), rank within their bucket by the same hash (per-bucket
    * window — each partition sorts only its slice), and interleave
    * round-robin: `global_pos = rank_in_bucket · buckets + bucket`.
    * The result is a total order that any reader can reconstruct
    * independently. Collisions break ties by id, so the order is total
    * and deterministic even for duplicate hashes. */
  def deterministicShuffle(docs: DataFrame, idCol: String, seed: String,
                           buckets: Int = 16): DataFrame = {
    val h = conv(substring(md5(concat(lit(seed), col(idCol).cast("string"))),
      1, 15), 16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(col("h"), col("id"))
    docs.select(col(idCol).as("id"), h.as("h"))
      .withColumn("bucket", pmod(col("h"), lit(buckets.toLong)))
      .withColumn("rank_in_bucket", row_number().over(w).cast("long") - 1)
      .select(col("id"), col("bucket"), col("rank_in_bucket"),
        (col("rank_in_bucket") * buckets + col("bucket")).as("global_pos"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each document by
    * `Σ_tokens [ln p_target(bucket(tok)) − ln p_raw(bucket(tok))]` over a
    * hashed feature space of `buckets` cells with add-one smoothing —
    * high weight ⇒ the document looks like the target distribution and
    * should up-sample in the training mix. `isTarget` marks the rows that
    * define the target distribution (a curated slice, a quality cut).
    *
    * Scale shape: one tokenize+hash pass; the two LMs come from a single
    * groupBy over the hashed buckets (bounded at `buckets` rows, so the
    * joined-back LM relation broadcasts no matter the corpus size); the
    * per-doc weight is one more aggregate of the same exploded relation.
    * The bucket hash is the md5-arithmetic family (first 15 hex chars
    * base-16), DuckDB-reproducible like d03's. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int = 64): DataFrame = {
    // widen + project the words array BELOW the explode: the per-token
    // md5 bucketing is the CPU-heavy stage and a 1-2-split scan would
    // serialize it (bench diag showed wall ≈ proc-CPU, the 1-core tell)
    val toks = ScanStats.widen(docs
        .select(col(idCol).as("id"), isTarget.as("__t"),
          words(col(textCol)).as("__ws")))
      .select(col("id"), col("__t"), explode(col("__ws")).as("w"))
      .withColumn("b", pmod(
        conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long"),
        lit(buckets.toLong)))
      .select("id", "__t", "b")
    val counts = toks.groupBy("b").agg(
      count(lit(1)).as("cs"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("ct"))
    val totals = counts.agg(sum("cs").as("ts"), sum("ct").as("tt"))
    val lm = broadcast(counts.crossJoin(totals).select(col("b"),
      log((col("ct") + 1).cast("double") / (col("tt") + buckets)).as("lt"),
      log((col("cs") + 1).cast("double") / (col("ts") + buckets)).as("ls")))
    toks.join(lm, "b")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("lt") - col("ls")), 4).as("log_weight"))
  }

  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Shape deliberately kept as dictionary-aggregate + join-back (NOT a
    // count window over the token relation): the r15 optimization round
    // tried the window form and MEASURED it slower in-bench (0.82 →
    // 1.33 s at sf0.1) — AQE broadcast-joins the dictionary aggregate at
    // runtime, so this shape shuffles only map-side-combined dictionary
    // rows, never the full token relation; the window form forces a
    // token-relation exchange + sort (guide §1.1: empirical beats the
    // "ideal" plan).
    val w = docs.select(col(idCol).as("id"), explode(words(col(textCol))).as("w"))
    val freq = w.groupBy("w").agg(count(lit(1)).as("wn"))
    val total = freq.agg(sum("wn").as("tot"))
    w.join(freq, "w")
      .crossJoin(broadcast(total))
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"),
        round(avg(log(col("wn").cast("double") / col("tot"))), 4).as("logprob"))
  }

  /** Bigram-LM quality proxy — the conditional upgrade of
    * [[unigramLogProb]]: mean ln p(w₂|w₁) over a document's bigrams,
    * with p(w₂|w₁) = c(w₁w₂)/c(w₁·) from corpus bigram counts (observed
    * bigrams are self-included, so no zero probabilities). Catches
    * word-salad documents whose unigram distribution looks normal.
    * Same scale shape as the unigram version: one generate pass, the
    * bigram-frequency relation joins back (AQE broadcasts it when it
    * fits). Documents with fewer than 2 words are excluded.
    * Returns (id, n_bigrams, logprob). */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("id"), words(col(textCol)).as("w"))
      .filter(size(col("w")) >= 2)
    val bg = base.select(col("id"),
      explode(transform(sequence(lit(1), size(col("w")) - 1),
        i => concat_ws(" ", element_at(col("w"), i),
          element_at(col("w"), i + 1)))).as("bg"))
    // Shape deliberately kept as dictionary aggregates + join-back (see
    // unigramLogProb — the r15 window form measured slower in-bench:
    // AQE broadcasts both dictionary relations at runtime, so the
    // bigram relation itself is never shuffled).
    val freq = bg.groupBy("bg").agg(count(lit(1)).as("bn"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    val pref = freq.groupBy("w1").agg(sum("bn").as("pn"))
    bg.join(freq, "bg").join(pref, "w1")
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(col("bn").cast("double") / col("pn"))), 4).as("logprob"))
  }

  /** Split each document into overlapping token windows — the packing /
    * context-window-preparation primitive of a training pipeline. Chunk k
    * starts at token 1 + k·(chunkSize − overlap) and carries up to
    * `chunkSize` tokens; every token of the document appears in at least
    * one chunk. Map-only: one projected tokenization below a generator,
    * no shuffle — a 100 TB corpus chunks in a single scan.
    * Returns (id, chunk_no, n_tokens, chunk_text). */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap < chunkSize, "overlap must be smaller than chunkSize")
    val stride = chunkSize - overlap
    docs.select(col(idCol).as("id"), words(col(textCol)).as("ws"))
      .select(col("id"), col("ws"),
        posexplode(sequence(lit(1), greatest(size(col("ws")), lit(1)), lit(stride)))
          .as(Seq("chunk_no", "start")))
      // a trailing start that would yield a pure-overlap tail (start+
      // overlap beyond the end) still counts: slice() clamps to the end
      .select(col("id"), col("chunk_no"),
        slice(col("ws"), col("start"), lit(chunkSize)).as("chunk"))
      .select(col("id"), col("chunk_no"),
        size(col("chunk")).as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Top-k terms per document by tf·idf (idf = ln(N/df), raw counts —
    * the textbook form). Two corpus-wide aggregates (term-in-doc counts,
    * document frequencies) and one rank window per document; the df
    * relation is vocabulary-sized, so its join back is broadcastable at
    * any corpus scale. Ties break on the term for determinism.
    * Returns (id, term, tf, score, rank). */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Shape deliberately kept as distinct + dictionary aggregate +
    // join-back (see unigramLogProb — the r15 window-over-term form
    // measured slower in-bench, 1.44 → 1.68 s: AQE broadcasts df).
    val w = docs.select(col(idCol).as("id"), explode(words(col(textCol))).as("term"))
    val tf = w.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df = w.select("id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val win = Window.partitionBy("id")
      .orderBy(col("score").desc, col("term").asc)
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select("id", "term", "tf", "score", "rank")
  }

  /** Temperature-flattened source mixing weights (the multilingual /
    * multi-source data-mixing recipe: sample source s proportionally to
    * (n_s/N)^alpha, alpha<1 upsampling the tail). One tiny aggregate —
    * the output is one row per source. Returns (source, n_docs, weight,
    * target_n): `weight` the normalized sampling probability, `target_n`
    * the resampled per-source document count at unchanged corpus size. */
  def mixingWeights(docs: DataFrame, groupCol: String,
                    alpha: Double = 0.5): DataFrame = {
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum("n_docs").as("n_total"),
      sum(pow(col("n_docs").cast("double"), alpha)).as("z"))
    counts.crossJoin(broadcast(tot))
      .withColumn("weight",
        round(pow(col("n_docs").cast("double"), alpha) / col("z"), 6))
      .withColumn("target_n",
        round(pow(col("n_docs").cast("double"), alpha) / col("z")
          * col("n_total")).cast("long"))
      .select(col(groupCol), col("n_docs"), col("weight"), col("target_n"))
  }

  /** Cross-document boilerplate removal by document frequency: a term
    * that appears in more than `dfFrac` of the documents of its group
    * (site / source / domain — the unit boilerplate repeats within) is
    * stripped from every document of that group. This is the standard
    * web-corpus cleaning pass for navigation chrome / license banners,
    * at the token granularity this corpus supports.
    *
    * Scale shape: one shuffle for the per-group document frequencies
    * over the DISTINCT (group, term, doc) relation, one tiny aggregate
    * for group sizes, then the per-group boilerplate vocabularies —
    * bounded by `vocab × groups`, small by construction since only
    * near-universal terms qualify — come back as a BROADCAST join; the
    * strip itself is map-only over the corpus. The `filter` lambda here
    * is the legitimate HOF use (reducing an array the data carries, a
    * few dozen elements per row), not a fixed emission pattern.
    *
    * Returns (id, n_tokens, n_kept, clean_text). */
  def boilerplateStrip(docs: DataFrame, idCol: String, textCol: String,
                       groupCol: String, dfFrac: Double = 0.9): DataFrame = {
    val terms = docs
      .select(col(groupCol).as("g"), col(idCol).as("id"),
        explode(array_distinct(words(col(textCol)))).as("w"))
    val dfreq = terms.groupBy("g", "w").agg(count(lit(1)).as("df"))
    val groupSizes = docs.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"))
    val boilerVocab = dfreq.join(groupSizes, "g")
      .filter(col("df") > lit(dfFrac) * col("n"))
      .groupBy("g").agg(sort_array(collect_set(col("w"))).as("bw"))
    val emptyArr = array().cast("array<string>")
    docs
      .join(broadcast(boilerVocab), docs(groupCol) === boilerVocab("g"), "left")
      .select(col(idCol), words(col(textCol)).as("ws"),
        coalesce(col("bw"), emptyArr).as("bw"))
      .select(col(idCol), col("ws"),
        filter(col("ws"), w => !array_contains(col("bw"), w)).as("kept"))
      .select(col(idCol), size(col("ws")).as("n_tokens"),
        size(col("kept")).as("n_kept"),
        array_join(col("kept"), " ").as("clean_text"))
  }

  /** Gopher-style rule-set quality filter (Rae et al. 2021, §A1.1.2 —
    * public): each document gets one boolean flag PER RULE plus the
    * overall keep verdict, so a pipeline can audit which rule fired
    * before committing to a drop — the decision-table twin of the
    * composite score `t02` computes. Rules: word count in
    * [minWords, maxWords]; mean word length in [minMeanLen, maxMeanLen];
    * symbol-to-word ratio ('#' chars + '...' runs) ≤ maxSymbolRatio;
    * fraction of words containing an alphabetic char ≥ minAlphaFrac;
    * ≥ minStops DISTINCT stopwords present.
    *
    * Scale shape: pure columnar projection over the scan — no shuffle,
    * no UDF, whole-stage codegen'd end-to-end; at 100 TB this is a
    * map-only pass whose output is as partitioned as its input.
    * Ratios round to 4dp so the flag comparisons sit on the same
    * grid in every engine. Returns (id, n_words, mean_wlen,
    * symbol_ratio, alpha_frac, n_stop_distinct, ok_* flags, keep). */
  def qualityRules(docs: DataFrame, idCol: String, textCol: String,
                   minWords: Int = 50, maxWords: Int = 100000,
                   minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                   maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
                   stops: Seq[String] = stopwords.head._2,
                   minStops: Int = 2): DataFrame = {
    val w = col("__qr_ws")
    val nw = size(w).cast("double")
    docs
      .withColumn("__qr_ws", words(col(textCol)))
      .withColumn("n_words", size(w).cast("long"))
      .withColumn("mean_wlen", round(
        aggregate(w, lit(0L), (acc, x) => acc + length(x)).cast("double") / nw, 4))
      // Gopher's symbol-to-word screen, full symbol set: '#', ASCII
      // '...' AND the Unicode ellipsis '…', plus bullet glyphs
      // ('•', '‣', '▪') — the characters templated/SEO pages lean on.
      // One alternation so an ASCII run and its Unicode twin can't
      // double-count the same span.
      .withColumn("symbol_ratio", round(
        regexp_count(col(textCol), lit("#|\\.\\.\\.|…|•|‣|▪"))
          .cast("double") / nw, 4))
      .withColumn("alpha_frac", round(
        size(filter(w, x => x.rlike("[A-Za-z]"))).cast("double") / nw, 4))
      .withColumn("n_stop_distinct",
        size(array_intersect(array_distinct(w), typedLit(stops))).cast("long"))
      .withColumn("ok_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("ok_wlen",
        col("mean_wlen") >= minMeanLen && col("mean_wlen") <= maxMeanLen)
      .withColumn("ok_symbol", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("ok_alpha", col("alpha_frac") >= minAlphaFrac)
      .withColumn("ok_stops", col("n_stop_distinct") >= minStops)
      .withColumn("keep", col("ok_words") && col("ok_wlen")
        && col("ok_symbol") && col("ok_alpha") && col("ok_stops"))
      .select(col(idCol), col("n_words"), col("mean_wlen"),
        col("symbol_ratio"), col("alpha_frac"), col("n_stop_distinct"),
        col("ok_words"), col("ok_wlen"), col("ok_symbol"), col("ok_alpha"),
        col("ok_stops"), col("keep"))
  }

  /** Within-document repetition signals — the Gopher-rules repetition
    * family (Rae et al. 2021, Table A1; carried by RefinedWeb/Dolma/
    * FineWeb): a document that repeats itself (templated listings, SEO
    * keyword stuffing, boilerplate loops) is low-quality even when its
    * length/symbol/stopword stats ([[qualityRules]]) look fine. Word-
    * occurrence analogue of the paper's character fractions:
    *
    *  - `dup_word_frac`  = (occurrences − distinct) / occurrences, words
    *  - `top_bigram_frac` = most common bigram's share of all bigram
    *    occurrences
    *  - `dup_trigram_frac` = (occurrences − distinct) / occurrences,
    *    trigrams
    *
    * plus per-rule flags and the composite `keep`. Single-word docs have
    * no bigrams/trigrams → those fractions are 0 (nothing repeats).
    *
    * `minWords` (Gopher's document-length floor, 50 in the paper) adds
    * an `ok_min_words` flag ANDed into `keep`: the repetition fractions
    * are statistically meaningless on very short docs (a repetition-free
    * 2-word doc has top_bigram_frac = 1.0 and would fail the bigram rule
    * spuriously), so Gopher drops sub-floor docs on length before the
    * repetition rules ever matter. Default 0 = gate off (every doc has
    * ≥ 0 words; callers that pre-gate on [[qualityRules]]' n_words keep
    * the old behavior).
    *
    * Scale shape: grams explode map-side below a (id, gram) hash
    * aggregate with map-side partials (the t21 chunk-dedup key shape),
    * then one (id) rollup — two hash-partitioned shuffles, no windows,
    * no driver state; both keys carry the doc id so skew follows doc
    * length, which the explode already bounded. */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String,
                        maxDupWordFrac: Double = 0.5,
                        maxTopBigramFrac: Double = 0.2,
                        maxDupTrigramFrac: Double = 0.3,
                        minWords: Int = 0): DataFrame = {
    // gram arrays are PROJECTED below their explode (the shingleRel
    // discipline: generator expressions evaluate interpreted inside
    // GenerateExec) and the scan is widened first — a narrow 1-2-split
    // scan runs this CPU-heavy map stage on 1-2 cores (measured: the
    // 10× corpus dropped 28.3 s → 10.3 s with the widen+split)
    val grams = ScanStats.widen(
        docs.select(col(idCol).as("id"),
          words(coalesce(col(textCol), lit(""))).as("ws")))
      .select(col("id"), col("ws"),
        explode(array(lit(1), lit(2), lit(3))).as("n"))
      .select(col("id"), col("n"),
        shinglesWithRepeats(col("ws"), col("n")).as("gs"))
      .select(col("id"), col("n"), explode(col("gs")).as("g"))
    val perGram = grams.groupBy("id", "n", "g")
      .agg(count(lit(1)).as("c"))
    val perDoc = perGram.groupBy("id", "n")
      .agg(sum("c").as("occ"), count(lit(1)).as("dis"), max("c").as("top"))
    val wide = perDoc.groupBy("id").agg(
      sum(when(col("n") === 1, col("occ"))).as("n_words"),
      round(coalesce(
        sum(when(col("n") === 1, col("occ") - col("dis"))).cast("double") /
          sum(when(col("n") === 1, col("occ"))), lit(0.0)), 6).as("dup_word_frac"),
      round(coalesce(
        sum(when(col("n") === 2, col("top"))).cast("double") /
          sum(when(col("n") === 2, col("occ"))), lit(0.0)), 6).as("top_bigram_frac"),
      round(coalesce(
        sum(when(col("n") === 3, col("occ") - col("dis"))).cast("double") /
          sum(when(col("n") === 3, col("occ"))), lit(0.0)), 6).as("dup_trigram_frac"))
    wide
      .withColumn("ok_min_words", col("n_words") >= minWords)
      .withColumn("ok_dup_word", col("dup_word_frac") <= maxDupWordFrac)
      .withColumn("ok_top_bigram", col("top_bigram_frac") <= maxTopBigramFrac)
      .withColumn("ok_dup_trigram", col("dup_trigram_frac") <= maxDupTrigramFrac)
      .withColumn("keep",
        col("ok_min_words") && col("ok_dup_word") && col("ok_top_bigram") &&
          col("ok_dup_trigram"))
      .withColumnRenamed("id", idCol)
  }

  /** n-gram array WITH repeats (unlike [[shinglesOfWords]]'s distinct
    * set) — repetition metrics need every occurrence. Empty array when
    * the document has fewer than n words. */
  private def shinglesWithRepeats(w: Column, n: Column): Column =
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - n + 1),
        i => concat_ws(" ", slice(w, i, n))))
      .otherwise(array().cast("array<string>"))

  /** Adjacent symbol-pair frequencies — the merge-candidate table of one
    * BPE training step (Sennrich et al. 2016). Every occurrence of every
    * word contributes its length−1 adjacent character pairs (overlapping,
    * the textbook count); the top-k pairs by frequency are the first
    * merge candidates. Ties break on the pair string.
    *
    * Scale shape: tokenize + per-word pair explode is map-only; the
    * count is one hash aggregate over a key space bounded by |alphabet|²
    * (map-side partials collapse it early), and only the k survivors see
    * the rank window — same TakeOrderedAndProject posture as `t05`.
    * Returns (pair, freq, rank). */
  def bpePairCounts(docs: DataFrame, textCol: String, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // widen + project the pair array below its explode (the t25/shingle
    // discipline: narrow scans serialize the CPU-heavy stage, and
    // generator expressions evaluate interpreted inside GenerateExec)
    val pairs = ScanStats.widen(docs.select(col(textCol).as("__t")))
      .select(explode(words(col("__t"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2))).as("ps"))
      .select(explode(col("ps")).as("pair"))
    val freq = pairs.groupBy("pair").agg(count(lit(1)).as("freq"))
    freq.orderBy(col("freq").desc, col("pair").asc).limit(k)
      // post-limit: the unpartitioned window ranks only the k
      // survivors — the WindowExec single-partition warning is
      // bounded by design, not a corpus-sized sort
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("freq").desc, col("pair").asc)))
  }

  /** `nMerges` iterations of BPE training: each round counts adjacent
    * symbol pairs corpus-wide, picks the most frequent (ties on the pair
    * string), and applies the merge greedily left-to-right inside every
    * word — the `aggregate` fold is the standard non-overlapping single
    * pass (a freshly merged symbol never re-matches as the LEFT side in
    * the same round). Returns the merge table (step, left, right, freq).
    *
    * The driver loop is over nMerges (a model hyperparameter, tens to
    * thousands — NOT data-sized); each iteration is one distributed
    * aggregate over a key space bounded by the growing symbol vocabulary,
    * so the pattern survives any corpus size. State is the DISTINCT-word
    * dictionary (syms, count) — Sennrich's vocabulary form — so the
    * per-round fold costs |vocabulary| regardless of corpus duplication.
    * The dictionary is carried across iterations via per-round persist
    * (localCheckpoint every few rounds in production). */
  def bpeMerges(docs: DataFrame, textCol: String, nMerges: Int,
                maxDriverVocab: Int = 2000000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // widen: the per-round fold is the CPU-heavy stage and must not run
    // on a 1-2-split scan; persist each round's tokenization or round k
    // replays all k-1 prior folds (measured 54 s → the cached form at
    // sf0.1; the scaladoc's production localCheckpoint note, made real)
    // Sennrich's dictionary form: fold over DISTINCT words weighted by
    // their occurrence count (pair freq = Σ count(w)·pairs-in(w)) — the
    // CPU-heavy per-round fold then costs |vocabulary|, not |corpus|, so
    // corpus duplication is free (a 10×-replicated corpus runs the same
    // per-round work over the same dictionary, only this one groupBy
    // scan sees the extra rows). Merging never changes the underlying
    // word string, so the dictionary keying is stable across rounds.
    var syms = ScanStats.widen(docs.select(col(textCol).as("__t")))
      .select(explode(words(col("__t"))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(split(col("w"), "").as("syms"), col("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Driver-dictionary fast path (the Dedup.driverSolve device): the
    // dictionary is VOCABULARY-sized, not corpus-sized — natural
    // language saturates at a few million distinct words no matter the
    // corpus bytes — so when it fits the driver, collect it once and
    // run the classic incremental merge trainer locally. A production
    // 32k-merge vocabulary is then one Spark aggregation + a local
    // loop instead of 32k sequential distributed folds (each a full
    // dictionary pass with a stage barrier). The distributed fold
    // below stays as the fallback for typo-tail vocabularies past the
    // gate. Byte-for-byte identical output: same pair counting, same
    // freq-desc/(l,r)-asc-in-UTF8-bytes tie-break, same greedy
    // left-to-right fuse.
    // gate on ESTIMATED DRIVER BYTES, not just rows: each dictionary
    // word explodes into per-character String objects (~64 B apiece
    // with array slot + header), so 2 M long words could be several GB
    // where 2 M short ones are hundreds of MB. One aggregate yields
    // both bounds; the distributed fold below is the fallback.
    val (dictRows, dictSyms) = {
      val r = syms.agg(count(lit(1)), sum(size(col("syms")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val estBytes = dictSyms * 64L + dictRows * 120L
    if (dictRows <= maxDriverVocab && estBytes <= (1L << 30)) {
      val dict = syms.as[(Seq[String], Long)].collect()
      syms.unpersist(false)
      return bpeTrainLocal(spark, dict, nMerges)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (step <- 1 to nMerges) {
      // size>=2 guard: sequence(1, 0) is DESCENDING in Spark, so a
      // single-symbol word would probe element_at(syms, 2) and throw
      val top = syms
        .filter(size(col("syms")) >= 2)
        .select(col("n"),
          explode(transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("l"),
              element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("freq"))
        .orderBy(col("freq").desc, col("l").asc, col("r").asc)
        .limit(1).as[(String, String, Long)].collect()
      top.headOption.foreach { case (l, r, f) =>
        out += ((step, l, r, f))
        // greedy left-to-right: append, or fuse with the accumulator's
        // tail when (tail, current) is exactly the merge pair
        val next = syms
          .select(mergePass(col("syms"), l, r).as("syms"), col("n"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count()
        syms.unpersist(false)
        syms = next
      }
    }
    syms.unpersist(false)
    out.toSeq.toDF("step", "left", "right", "freq")
  }

  /** UTF-8 unsigned-byte string order = Spark's UTF8String binary
    * collation — the comparator every driver-side rank/tie-break must
    * use to stay bit-compatible with a distributed `orderBy(asc)`
    * (Java's String.compareTo orders by UTF-16 code unit, which
    * diverges on supplementary-plane characters). */
  def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** The classic incremental BPE trainer (Sennrich et al. 2016's
    * dictionary algorithm) over a driver-collected vocabulary: pair
    * counts maintained in a hash map, an inverted pair→words index so
    * each merge touches only the words that CONTAIN the merged pair
    * (subtract their old pairs, fuse, add the new ones) — per-merge
    * cost proportional to the affected words, not the dictionary.
    * Semantics pinned to the distributed fold: every adjacent pair
    * counts (overlaps included), best = max freq then (l, r) ascending
    * in UTF-8 byte order (Spark's string sort), fuse greedily
    * left-to-right with a fresh merge never re-matching as LEFT. */
  private def bpeTrainLocal(spark: org.apache.spark.sql.SparkSession,
                            dict: Array[(Seq[String], Long)],
                            nMerges: Int): DataFrame = {
    import spark.implicits._
    val wordsArr = dict.map(_._1.toArray)
    val counts = dict.map(_._2)
    val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val p2w = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    def addPairs(wi: Int, sign: Long): Unit = {
      val s = wordsArr(wi); val c = counts(wi) * sign
      var i = 0
      while (i < s.length - 1) {
        val key = (s(i), s(i + 1))
        val nv = pc.getOrElse(key, 0L) + c
        if (nv == 0L) { pc.remove(key); () } else pc(key) = nv
        if (sign > 0L) {
          p2w.getOrElseUpdate(key,
            scala.collection.mutable.Set.empty[Int]) += wi
          ()
        }
        i += 1
      }
    }
    var wi = 0
    while (wi < wordsArr.length) { addPairs(wi, 1L); wi += 1 }
    def fuse(s: Array[String], l: String, r: String): Array[String] = {
      val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
      var i = 0
      while (i < s.length) {
        if (out.nonEmpty && out.last == l && s(i) == r)
          out(out.length - 1) = l + r
        else out += s(i)
        i += 1
      }
      out.toArray
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var step = 1
    var dry = false
    while (step <= nMerges && !dry) {
      if (pc.isEmpty) dry = true
      else {
        var best: ((String, String), Long) = null
        pc.foreach { kv =>
          if (best == null || kv._2 > best._2 ||
            (kv._2 == best._2 && (utf8Lt(kv._1._1, best._1._1) ||
              (kv._1._1 == best._1._1 && utf8Lt(kv._1._2, best._1._2)))))
            best = kv
        }
        val ((l, r), freq) = best
        out += ((step, l, r, freq))
        // stale inverted-index entries (words merged past the pair in a
        // prior round) subtract and re-add identical pair sets — a
        // no-op; the contains check below skips most of them
        val affected = p2w.remove((l, r)).map(_.toArray).getOrElse(Array())
        var a = 0
        while (a < affected.length) {
          val w = affected(a); val s = wordsArr(w)
          var has = false; var i = 0
          while (!has && i < s.length - 1) {
            has = s(i) == l && s(i + 1) == r; i += 1
          }
          if (has) {
            addPairs(w, -1L)
            wordsArr(w) = fuse(s, l, r)
            addPairs(w, 1L)
          }
          a += 1
        }
      }
      step += 1
    }
    out.toSeq.toDF("step", "left", "right", "freq")
  }

  /** One greedy left-to-right merge pass (the [[bpeMerges]] fold) as a
    * reusable column expression: fuse every non-overlapping (l, r)
    * adjacency in `syms` into l+r. */
  private def mergePass(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(
        size(acc) > 0 && element_at(acc, -1) === l && s === r,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))

  /** BPE ENCODING — apply a trained, ordered merge table to tokenize
    * text (the inference twin of [[bpeMerges]]; Sennrich et al. 2016
    * §3: apply merges in learned order). Every word occurrence splits
    * to characters, then each merge fuses greedily left-to-right —
    * byte-for-byte the training fold, so encode(corpus) reproduces the
    * final training-state tokenization.
    *
    * Scale shape: `merges` is a MODEL artifact (driver-side literal
    * list, hyperparameter-sized — tens to thousands). The default
    * `dictionary = true` path folds each DISTINCT word once and joins
    * the tokenization back to the occurrence relation — the same
    * Zipf discipline as [[bpeMerges]]' training state, so the
    * CPU-heavy merge fold costs |vocabulary| regardless of corpus
    * duplication; the join side is the vocabulary relation, which AQE
    * broadcasts when it fits (natural-language vocabularies saturate;
    * it is NOT force-broadcast because a 100 TB web corpus's typo-tail
    * vocabulary may not fit an executor). `dictionary = false` is the
    * ONE map-only projection per word occurrence — no shuffle at all —
    * which wins when the corpus is near-deduplicated already.
    * Returns (id, word_idx, token_idx, token), indices 0-based. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)],
                dictionary: Boolean = true): DataFrame = {
    val base = ScanStats.widen(
        docs.select(col(idCol).as("id"), col(textCol).as("__t")))
      .select(col("id"), posexplode(words(coalesce(col("__t"), lit("")))))
      .withColumnRenamed("pos", "word_idx").withColumnRenamed("col", "w")
      .filter(length(col("w")) >= 1)
      .select(col("id"), col("word_idx").cast("long").as("word_idx"),
        col("w"))
    // the fold is PROJECTED below the token explode either way (the
    // shingleRel discipline: generator expressions evaluate interpreted)
    val folded = merges.foldLeft(split(col("w"), "")) {
      case (acc, (l, r)) => mergePass(acc, l, r)
    }
    val withSyms =
      if (dictionary) {
        val vocab = base.select(col("w")).distinct()
          .select(col("w"), folded.as("syms"))
        base.join(vocab, "w")
      } else base.withColumn("syms", folded)
    withSyms.select(col("id"), col("word_idx"), posexplode(col("syms")))
      .select(col("id"), col("word_idx"),
        col("pos").cast("long").as("token_idx"), col("col").as("token"))
  }

  /** Train a logistic-regression quality classifier over the
    * [[qualityRules]] signals, distilling the boolean rule verdict into
    * a smooth scorer — the linear form of the classifier-training step
    * public pipelines run (fastText quality filters in CCNet/LLaMA,
    * FineWeb-Edu's scorer): features
    * x = (1, n_words/100, mean_wlen/10, symbol_ratio, alpha_frac,
    * n_stop_distinct/10), label y = the rules' `keep`, `epochs`
    * full-batch gradient steps at rate `lr`, starting from w = 0.
    *
    * Determinism pin: weights round to 6 dp at every epoch boundary
    * (HALF_UP, the cross-engine grid); the per-epoch accuracy compares
    * z > 0 — not sigmoid(z) > 0.5 — so the only libm call (exp) sits
    * strictly inside a rounded sum where a 1-ulp difference cannot move
    * the result; and the gradient sums are EXACT: each per-row
    * contribution is cast to DECIMAL(30,12) (HALF_UP at the 12 dp grid,
    * absorbing the per-row exp ulp) and summed as decimal, which both
    * Spark and DuckDB accumulate exactly — so the sum is independent of
    * partition count and accumulation order, not merely 6dp-close.
    *
    * With `holdout = true` the features first take a leak-free 80/20
    * train/val split ([[graft.operators.Dedup.leakFreeSplit]] with
    * exact-text clusters, so byte-identical documents land in the same
    * split): gradients and `accuracy` are train-side only and a
    * `val_accuracy` column grades the same pre-step weights on the
    * held-out rows — the honest generalization readout a rule-distilled
    * scorer needs before it gates a corpus.
    *
    * Scale shape: the driver loop is over `epochs` (a hyperparameter);
    * each epoch is ONE map-side-combined aggregate producing 6 decimal
    * gradient sums + 2 hit counts — the model is driver-state by
    * design, as any 6-weight model should be. The feature relation is
    * computed once and persisted. Returns one row per epoch:
    * (epoch, w0..w5, accuracy[, val_accuracy]) where accuracy grades
    * the PRE-step weights. */
  def trainQualityClassifier(docs: DataFrame, idCol: String,
                             textCol: String, epochs: Int = 3,
                             lr: Double = 1.0, holdout: Boolean = false,
                             seed: String = "qsplit",
                             pctTrain: Int = 80): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(30, 12)
    val rules = qualityRules(docs, idCol, textCol)
    val split =
      if (holdout) {
        // exact-text clusters: byte-identical docs share one split
        val clusterOf = docs
          .groupBy(md5(col(textCol)).as("__h"))
          .agg(min(col(idCol)).as("cluster"))
          .join(docs.select(col(idCol).as("id"), md5(col(textCol)).as("__h")),
            "__h")
          .select(col("id"), col("cluster"))
        graft.operators.Dedup.leakFreeSplit(docs, idCol, clusterOf, seed,
            pctTrain, 100 - pctTrain)
          .select(col("id"), (col("split") === "train").as("tr"))
      } else docs.select(col(idCol).as("id"), lit(true).as("tr"))
    val feats = rules
      .join(split, rules(idCol) === split("id"))
      .select(lit(1.0).as("x0"),
        (col("n_words").cast("double") / 100.0).as("x1"),
        (col("mean_wlen") / 10.0).as("x2"),
        col("symbol_ratio").as("x3"),
        col("alpha_frac").as("x4"),
        (col("n_stop_distinct").cast("double") / 10.0).as("x5"),
        col("keep").cast("int").cast("double").as("y"),
        col("tr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one aggregate action for both split sizes (two filter+count jobs
    // would each pass the cache; this is also the action that fills it)
    val cnts = feats.agg(
      sum(when(col("tr"), 1L).otherwise(0L)),
      sum(when(!col("tr"), 1L).otherwise(0L))).head()
    val nTrain = cnts.getLong(0).toDouble
    val nVal = cnts.getLong(1).toDouble
    require(nTrain > 0, "quality classifier: empty training split")
    require(!holdout || nVal > 0,
      "quality classifier: empty validation split — corpus too small " +
        "for a held-out readout at this seed/pctTrain")
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    var wts = Array.fill(6)(0.0)
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    for (ep <- 1 to epochs) {
      // z built LEFT-ASSOCIATIVE to match the oracle's textual sum —
      // IEEE addition order is part of the cross-engine contract
      val z = (0 until 6).map(j => col(s"x$j") * lit(wts(j)))
        .reduceLeft(_ + _)
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val hit = (z > 0.0) === (col("y") > 0.5)
      val aggCols =
        (0 until 6).map(j =>
          sum(when(col("tr"), (p - col("y")) * col(s"x$j"))
            .otherwise(lit(0.0)).cast(dec)).as(s"g$j")) ++
          Seq(sum(when(col("tr") && hit, 1.0).otherwise(0.0)).as("hits"),
            sum(when(!col("tr") && hit, 1.0).otherwise(0.0)).as("vhits"))
      val row = feats.agg(aggCols.head, aggCols.tail: _*).head()
      val acc = round6(row.getDouble(6) / nTrain)
      wts = Array.tabulate(6) { j =>
        // the exact decimal sum → nearest double is engine-independent
        round6(wts(j) - lr * row.getDecimal(j).doubleValue / nTrain)
      }
      val base: Seq[Any] = Seq(ep) ++ wts.toSeq :+ acc
      out += (if (holdout) base :+ round6(row.getDouble(7) / nVal) else base)
    }
    feats.unpersist(false)
    val cols = Seq("epoch", "w0", "w1", "w2", "w3", "w4", "w5", "accuracy") ++
      (if (holdout) Seq("val_accuracy") else Nil)
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("epoch",
        org.apache.spark.sql.types.IntegerType) +:
      cols.tail.map(c => org.apache.spark.sql.types.StructField(c,
        org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        out.toSeq.map(org.apache.spark.sql.Row.fromSeq), 1),
      schema)
  }

  /** Deterministic text normalization — the canonicalization pre-pass
    * public corpus pipelines run before hashing/dedup (C4 strips
    * boilerplate punctuation; CCNet lowercases+strips for its hashes;
    * every dedup stack folds typographic variants so smart-quoted
    * copies hash together). This is an explicitly DOCUMENTED SUBSET of
    * Unicode normalization — typographic folds expressible identically
    * in Java regex and RE2, NOT full NFKC (no decomposition tables in
    * SQL): curly single/double quotes → ASCII quotes, en/em/horizontal
    * dashes and minus → '-', NBSP/thin/zero-width spaces → space (ZWSP
    * drops), C0/C1 control chars (except \t\n) → removed, then
    * whitespace runs collapse to one space and the result trims.
    * Map-only, codegen'd; returns (id, norm_text, n_folds) where
    * n_folds counts folded/removed code points (the audit column).
    * Order of stages is pinned — counts depend on it. */
  def normalizeText(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // \\x{...} escapes parse identically in Java regex and RE2 — no
    // invisible characters in source or oracle SQL
    val quotes = "[\\x{2018}\\x{2019}\\x{201A}\\x{201B}]"
    val dquotes = "[\\x{201C}\\x{201D}\\x{201E}\\x{201F}]"
    val dashes = "[\\x{2012}\\x{2013}\\x{2014}\\x{2015}\\x{2212}]"
    val spaces = "[\\x{00A0}\\x{2007}\\x{2009}\\x{202F}\\x{3000}]"
    val zwsp = "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]"
    val ctl = "[\\x{0001}-\\x{0008}\\x{000B}-\\x{001F}\\x{007F}-\\x{009F}]"
    val foldable = s"$quotes|$dquotes|$dashes|$spaces|$zwsp|$ctl"
    val t0 = coalesce(col(textCol), lit(""))
    docs.select(col(idCol).as("id"), t0.as("__t"))
      .withColumn("n_folds", regexp_count(col("__t"), lit(foldable)).cast("long"))
      .withColumn("__t1",
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(col("__t"),
            quotes, "'"), dquotes, "\""), dashes, "-"),
            spaces, " "), zwsp, ""), ctl, ""))
      .select(col("id"),
        trim(regexp_replace(col("__t1"), " +", " ")).as("norm_text"),
        col("n_folds"))
  }

  /** Apply a trained quality classifier ([[trainQualityClassifier]]'s
    * weight vector) to the corpus and report a CALIBRATION table: the
    * logit z = w·x per document, bucketed into `nBins` equal-width
    * logit bins, each bin graded against the rule labels — the
    * inspect-before-you-filter step a production quality gate runs
    * (does the score actually separate rule-good from rule-bad mass,
    * and where does the threshold sit?).
    *
    * Scale shape: ONE feature projection (map-only, [[qualityRules]]),
    * one 2-double min/max aggregate broadcast back, one map-side bin
    * assignment, one `nBins`-row aggregate — no global sort, no
    * window: equal-WIDTH bins were chosen over ntile deciles precisely
    * because quantile binning needs a global rank (a full sort at
    * 100 TB) while width binning is two passes of partial aggregates.
    * Determinism: z is products/left-assoc sums of exact doubles (no
    * libm), the bin arithmetic is pinned, and per-bin mean logits sum
    * as DECIMAL(30,12) — partition-order independent (the t32
    * contract). Returns one row per non-empty bin:
    * (bin, n_docs, n_rule_keep, keep_rate, mean_logit). */
  def applyQualityScore(docs: DataFrame, idCol: String, textCol: String,
                        weights: Seq[Double], nBins: Int = 10): DataFrame = {
    require(weights.length == 6, "six weights: bias + five signals")
    val dec = org.apache.spark.sql.types.DecimalType(30, 12)
    val feats = qualityRules(docs, idCol, textCol)
      .select(col(idCol).as("id"),
        lit(1.0).as("x0"),
        (col("n_words").cast("double") / 100.0).as("x1"),
        (col("mean_wlen") / 10.0).as("x2"),
        col("symbol_ratio").as("x3"),
        col("alpha_frac").as("x4"),
        (col("n_stop_distinct").cast("double") / 10.0).as("x5"),
        col("keep").cast("int").cast("double").as("y"))
    // z LEFT-ASSOCIATIVE (the t32 cross-engine contract)
    val z = (0 until 6).map(j => col(s"x$j") * lit(weights(j)))
      .reduceLeft(_ + _)
    val scored = feats.select(col("id"), z.as("z"), col("y"))
    val range = scored.agg(min(col("z")).as("zmin"), max(col("z")).as("zmax"))
    scored.crossJoin(broadcast(range))
      .withColumn("bin",
        when(col("zmax") === col("zmin"), lit(0L))
          .otherwise(least(
            floor((col("z") - col("zmin")) * lit(nBins.toDouble) /
              (col("zmax") - col("zmin"))),
            lit(nBins - 1L))))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("y")).cast("long").as("n_rule_keep"),
        round(sum(col("y")) / count(lit(1)), 6).as("keep_rate"),
        round(sum(col("z").cast(dec)).cast("double") / count(lit(1)), 6)
          .as("mean_logit"))
  }

  /** PII scrubbing (the redaction pass public corpus releases run —
    * BigScience ROOTS, FineWeb): replace emails, bare IPv4 literals,
    * and international-format phone numbers with typed placeholder
    * tokens and count each class. The three patterns are restricted to
    * a subset that evaluates identically under Java regex (Spark's
    * codegen'd regexp_replace) and RE2 (the DuckDB oracle): no
    * lookaround, no backreferences. Redaction is staged email → IPv4 →
    * phone, each count taken AFTER the previous stage's replacement,
    * so a `+digits` inside an email local part is never double-counted
    * as a phone. Map-only; returns (id, clean_text, n_emails, n_ips,
    * n_phones). */
  def piiRedact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val phone = "\\+[0-9]{7,15}"
    docs.select(col(idCol).as("id"),
        coalesce(col(textCol), lit("")).as("__t"))
      .withColumn("n_emails", regexp_count(col("__t"), lit(email)).cast("long"))
      .withColumn("__t1", regexp_replace(col("__t"), email, "<EMAIL>"))
      .withColumn("n_ips", regexp_count(col("__t1"), lit(ip)).cast("long"))
      .withColumn("__t2", regexp_replace(col("__t1"), ip, "<IP>"))
      .withColumn("n_phones", regexp_count(col("__t2"), lit(phone)).cast("long"))
      .select(col("id"),
        regexp_replace(col("__t2"), phone, "<PHONE>").as("clean_text"),
        col("n_emails"), col("n_ips"), col("n_phones"))
  }
}
