package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Lexical and hybrid retrieval over the `documents` corpus — the
  * query-side tools a training-data pipeline uses for decontamination
  * probes, curation queries and hybrid (lexical + vector) search.
  *
  * The reference has no retrieval surface (its queries are ingest
  * pipelines); these follow the standard public formulations: Okapi
  * BM25 with Lucene's idf (Robertson et al.; the +1 inside the log
  * keeps idf positive for df > N/2) and reciprocal-rank fusion
  * (Cormack, Clarke & Buettcher 2009).
  */
object Retrieval {

  /** BM25 top-k documents per query.
    *
    * score(q, d) = Σ_{t ∈ distinct(q)} idf(t) · tf·(k1+1) /
    * (tf + k1·(1 − b + b·dl/avgdl)), idf = ln(1 + (N − df + 0.5) /
    * (df + 0.5)). Query-term frequency is ignored (standard
    * short-query BM25); ties break on ascending doc id.
    *
    * Scale shape: tf/dl/df are one aggregate each over the term
    * explode (map-side partial combine); N and avgdl are two driver
    * scalars (corpus statistics — the codebook contract); the DISTINCT
    * query-term set broadcasts onto the postings FIRST, so everything
    * after the tf aggregate is bounded by the query terms' postings,
    * never the corpus dictionary. One (qid, doc) aggregation, one
    * per-query top-k window. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, idCol: String,
               textCol: String, qidCol: String, qtextCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val w = docs.select(col(idCol).as("doc"),
      explode(TextOps.words(col(textCol))).as("term"))
    // tf IS the inverted index — persist it for its four consumers
    // (corpus stats, dl, df, the scored join); without the cache each
    // one replays the corpus-wide term explode. A production
    // deployment materializes this relation once, term-bucketed, like
    // the ANN code tables.
    val tf = w.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-doc length = Σ tf — same values as counting the explode,
    // one corpus pass cheaper
    val dl = tf.groupBy("doc").agg(sum(col("tf")).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double"), avg(col("dl"))).head()
    val nDocs = stats.getDouble(0)
    val avgdl = stats.getDouble(1)
    val qt = queries.select(col(qidCol).as("qid"),
        explode(TextOps.words(col(qtextCol))).as("term"))
      .distinct()
    val qTerms = broadcast(qt.select("term").distinct())
    val dfq = broadcast(tf.join(qTerms, "term")
      .groupBy("term").agg(count(lit(1)).cast("double").as("df")))
    val scored = tf.join(qTerms, "term")
      .join(dl, "doc")
      .join(dfq, "term")
      .join(broadcast(qt), "term")
      .select(col("qid"), col("doc"),
        (log(lit(1.0) + (lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl))).as("s"))
    val agg = scored.groupBy("qid", "doc").agg(sum(col("s")).as("score"))
    val win = Window.partitionBy("qid").orderBy(col("score").desc, col("doc").asc)
    agg.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("qid"), col("doc").as("doc_id"),
        round(col("score"), 6).as("score"), col("rank"))
  }

  /** Reciprocal-rank fusion of ranked runs (Cormack et al. 2009):
    * score(q, d) = Σ over the runs containing d of 1/(k0 + rank). Each
    * run is (qid, nid, rank); a document absent from a run simply
    * contributes nothing (the standard outer-union semantics). Ties
    * break on ascending nid. k0 = 60 is the paper's constant.
    *
    * Scale shape: runs are already top-k'd (|q|·k rows each) — the
    * union + (qid, nid) aggregate + per-query window all operate on
    * query-bounded relations, never a corpus. */
  def rrfFuse(runs: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(runs.nonEmpty, "rrfFuse needs at least one run")
    val all = runs.map(_.select(col("qid"), col("nid"), col("rank")))
      .reduce(_ unionByName _)
    val scored = all.groupBy("qid", "nid")
      .agg(sum(lit(1.0) / (lit(k0) + col("rank"))).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), round(col("score"), 6).as("score"),
        col("rank"))
  }
}
