package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.core.CurieMap
import graft.sinks.TripleSinks

/** Structured-Streaming form of the engine's pipelines.
  *
  * The reference's only streaming mode is constant-memory serialization
  * (`StreamedGraph`, SURVEY §2.10) — re-expressed here as `readStream` →
  * transform → `foreachBatch` NT write with per-batch dedup. Watermarked
  * event-time windowing over `events` is the documented *extension*
  * beyond the reference (real event-time semantics the reference lacks).
  */
object EventStream {

  /** Windowed event-time aggregation with a watermark (tumbling window).
    * Same semantics as the batch q24 query when the input is replayed. */
  def hourlyCounts(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("total"))

  /** File-source stream over a parquet directory. */
  def readEvents(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserState(events: Long, total: Double)
  final case class UserTotals(user_id: Long, events: Long, total: Double)

  /** Custom per-key state via `mapGroupsWithState` — running event count
    * and value total per user. This is the arbitrary-stateful tier beyond
    * windowed aggregation (an extension over the reference, which has no
    * stateful streaming at all — documented per SURVEY §2.10). */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserTotals](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.events
          var t = prev.total
          batch.foreach { e => n += 1; t += e.value }
          state.update(UserState(n, t))
          UserTotals(uid, n, t)
      }
  }

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class OpenSession(startUs: Long, endUs: Long, n: Long)
  final case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
                                 n_events: Long)

  /** Gap-based sessionization with custom state — the streaming twin of
    * the batch q29 query, via `flatMapGroupsWithState` (the zero-or-many-
    * outputs tier of arbitrary state: a batch of events can close several
    * sessions at once, which `mapGroupsWithState`'s exactly-one-output
    * contract cannot express). A session closes when a later event of the
    * same user arrives more than `gapMinutes` of event time after it, or
    * when the watermark passes its idle timeout (`hasTimedOut` branch) —
    * so state per user is one open session, bounded regardless of stream
    * length. Timestamps ride as epoch micros, matching the batch query's
    * microsecond gap arithmetic exactly. */
  def gapSessions(events: Dataset[SessionEvent], gapMinutes: Int = 30,
                  horizon: String = "2 hours"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    events
      .withWatermark("ts", horizon)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(uid, s.startUs, s.endUs, s.n))
          } else {
            // arrival order within a micro-batch is arbitrary: order by
            // event time before folding into sessions
            val ts = batch.map(e => micros(e.ts)).toArray
            java.util.Arrays.sort(ts)
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var open = state.getOption.orNull
            ts.foreach { t =>
              if (open == null) open = OpenSession(t, t, 1L)
              else if (t - open.endUs > gapUs) {
                closed += ClosedSession(uid, open.startUs, open.endUs, open.n)
                open = OpenSession(t, t, 1L)
              } else open = OpenSession(open.startUs, math.max(open.endUs, t),
                open.n + 1L)
            }
            if (open != null) {
              state.update(open)
              state.setTimeoutTimestamp(open.endUs / 1000L + gapMinutes * 60L * 1000L)
            }
            closed.iterator
          }
      }
  }

  /** Streaming exact dedup — the streaming twin of
    * [[graft.operators.Dedup.exactGroups]] for continuous ingest: keep the
    * first arrival of each content digest, drop every later duplicate.
    * State is bounded by the watermark: a duplicate arriving more than
    * `horizon` of event time after the original passes through (the state
    * store evicts expired digests), which is the standard
    * bounded-state/unbounded-lookback trade — at 100 TB/day an unbounded
    * digest store is itself a dataset; cross-horizon dedup belongs in a
    * periodic batch compaction with [[graft.operators.Dedup.exactGroups]].
    * Rows need an event-time column `tsCol`; the digest is computed on
    * `textCol`, so semantics match the batch operator exactly within the
    * horizon. */
  def dedupedStream(docs: DataFrame, textCol: String, tsCol: String,
                    horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("__digest", md5(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Streaming snapshot-incremental dedup — the streaming twin of
    * [[graft.operators.Dedup.incrementalNew]]: a continuous batch of new
    * documents anti-joined against a STATIC prior-corpus digest relation
    * (stream-static anti joins are stateless in Structured Streaming —
    * the static side is re-read per micro-batch, so a bucketed/cached
    * digest table keeps it cheap). Combine with [[dedupedStream]]
    * upstream to also drop within-stream duplicates; this stage only
    * guarantees no row matching the prior corpus survives. */
  def incrementalDedupStream(newDocs: DataFrame, oldDigests: DataFrame,
                             textCol: String): DataFrame =
    newDocs
      .withColumn("__digest", md5(col(textCol)))
      .join(oldDigests.select(col("h").as("__digest")).distinct(),
        Seq("__digest"), "left_anti")
      .drop("__digest")

  final case class KeepBestDoc(digest: String, doc_id: Long, priority: Int,
                               text: String)
  final case class BestState(priority: Int, docId: Long)

  /** Streaming source-priority dedup — the streaming twin of
    * [[graft.operators.Dedup.priorityKeep]]: per content digest, keep
    * the most trusted delivery seen so far (priority asc, id asc ties),
    * carried across micro-batches in keyed state. Append mode cannot
    * retract, so the contract is "last emitted row per digest == the
    * batch keep-best over everything replayed so far": a batch's winner
    * is emitted only when it strictly beats the stored best, so a
    * consumer folding by digest (keep last) converges to the batch
    * answer. Unbounded state by design at this tier — the digest store
    * IS the dedup index; horizon-bounded variants compose
    * [[dedupedStream]]'s watermark instead. */
  def keepBestStream(docs: Dataset[KeepBestDoc]): Dataset[KeepBestDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.digest)
      .flatMapGroupsWithState[BestState, KeepBestDoc](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_, batch: Iterator[KeepBestDoc], state: GroupState[BestState]) =>
          var best = state.getOption
          var winner: Option[KeepBestDoc] = None
          batch.foreach { r =>
            val better = best.forall(b => r.priority < b.priority ||
              (r.priority == b.priority && r.doc_id < b.docId))
            if (better) {
              best = Some(BestState(r.priority, r.doc_id))
              winner = Some(r)
            }
          }
          best.foreach(state.update)
          winner.iterator
      }
  }

  /** Streaming trending-terms, aggregation half: watermarked tumbling-
    * window (window, event_type) counts — stream-composable, partial-agg
    * friendly. Streaming cannot RANK these in-flight (a rank over an
    * aggregate is a second stateful stage append mode cannot retract —
    * the same reasoning as [[streamTriplesToNt]]'s sink-side dedup), so
    * the top-k cut runs at the sink edge via [[topKPerWindow]] inside
    * foreachBatch / over the complete-mode sink table. */
  def windowedTypeCounts(stream: DataFrame,
                         windowMinutes: Int = 60,
                         horizon: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", horizon)
      .groupBy(window(col("ts"), s"$windowMinutes minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("win"), col("event_type"), col("n"))

  /** Streaming trending-terms, rank half: per-window top-k by count
    * (ties on the term) — a batch transform applied to each trigger's
    * snapshot. StreamingSpec pins stream-then-rank ≡ rank-over-batch. */
  def topKPerWindow(counts: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("win").orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** StreamedGraph-equivalent sink: incremental triple batches land as
    * deduplicated NT files (per-batch dedup; cross-batch dedup is the
    * downstream `sort -u` contract, same as the reference). */
  def streamTriplesToNt(triples: DataFrame, outDir: String,
                        checkpoint: String,
                        cm: CurieMap = CurieMap.default): StreamingQuery =
    triples.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        TripleSinks.toNtLines(batch.dropDuplicates(), cm)
          .write.mode("append").text(outDir)
      }
      .start()

  /** Streaming crawl DEDUP ingest — the loop a recurring crawl runs
    * against the persisted MinHash band index: per micro-batch,
    *
    *  1. probe the batch against the index
    *     ([[graft.operators.Dedup.minhashIncremental]] — only the
    *     batch computes signatures, the index side streams its
    *     co-located buckets);
    *  2. drop batch docs that near-dup the index OR a SMALLER-ID doc
    *     of the same batch (greedy-by-id — deterministic regardless
    *     of partitioning or trigger boundaries, the keep-first rule
    *     of the d16 crawl dedup);
    *  3. append only the ACCEPTED docs' band rows
    *     ([[graft.operators.Dedup.appendMinhashIndex]]), so batch
    *     N+1 dedups against batch N's survivors;
    *  4. record (id, kept, dup_of) verdicts in `table`_verdicts —
    *     the audit relation a release pipeline joins.
    *
    * At-least-once redelivery is a no-op via the scoped applied-batch
    * ledger; a redelivered batch neither duplicates index rows nor
    * re-emits verdicts. */
  def minhashDedupIngest(docs: DataFrame, idCol: String, textCol: String,
                         table: String, checkpoint: String,
                         numPerm: Int = 32, bands: Int = 8,
                         threshold: Double = 0.5, shingleN: Int = 3,
                         family: String = "xxhash64",
                         buckets: Int = 8): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        idempotentMinhashDedup(batch, id, checkpoint, idCol, textCol,
          table, numPerm, bands, threshold, shingleN, family, buckets)
        ()
      }
      .start()

  private[graft] def idempotentMinhashDedup(batch: DataFrame, batchId: Long,
                                            scope: String, idCol: String,
                                            textCol: String, table: String,
                                            numPerm: Int, bands: Int,
                                            threshold: Double, shingleN: Int,
                                            family: String,
                                            buckets: Int): Boolean =
    idempotentAppend(batch, batchId, scope, table) { spark =>
      import graft.operators.Dedup
      // both helpers return |batch|-bounded PERSISTED results (the
      // finalized() convention) — release them per trigger or a
      // long-running stream accumulates one cache entry per batch
      val vsIndex0 = Dedup.minhashIncremental(spark, table, batch,
        idCol, textCol, numPerm, bands, threshold, shingleN, family)
      val intra0 = Dedup.minhashPairs(batch, idCol, textCol, numPerm,
        bands, threshold, shingleN, family)
      val vsIndex = vsIndex0
        .select(col("new_id").as("id"), col("old_id").as("dup_of"))
      val intra = intra0
        .select(col("id_b").as("id"), col("id_a").as("dup_of"))
      // one row per dropped id; dup_of = its smallest matching doc
      // (deterministic evidence pointer)
      val drops = vsIndex.unionByName(intra)
        .groupBy("id").agg(min(col("dup_of")).as("dup_of"))
      // the verdicts WRITE comes FIRST and becomes the batch's durable
      // record: the index append below calls refreshTable, which
      // invalidates every cached plan derived from the index — a lazy
      // consumer evaluating the probe AFTER the append would see the
      // batch matching ITSELF and verdict everything a duplicate. The
      // accepted set is then re-read from the written parquet, so no
      // plan downstream of the append references the pre-append probe.
      val verdicts = batch.select(col(idCol).as("id"))
        .join(drops, Seq("id"), "left")
        .select(col("id"), col("dup_of").isNull.as("kept"),
          col("dup_of"))
      val vt = s"${table}_verdicts"
      if (spark.catalog.tableExists(vt))
        verdicts.write.mode("append").format("parquet").saveAsTable(vt)
      else
        verdicts.write.mode("overwrite").format("parquet")
          .option("path",
            s"${graft.operators.Similarity.indexBasePath(spark, table)}_verdicts")
          .saveAsTable(vt)
      vsIndex0.unpersist(); intra0.unpersist()
      val accepted = batch.join(
        spark.table(vt).filter(col("kept")).select(col("id").as(idCol)),
        Seq(idCol), "left_semi")
      Dedup.appendMinhashIndex(spark, accepted, idCol, textCol, table,
        numPerm, bands, shingleN, family, buckets)
    }

  /** Recurring-crawl ANN ingest: every micro-batch of new vectors
    * appends to a persisted PQ index
    * ([[graft.operators.Similarity.appendPqIndex]] — encode against
    * the FIXED codebook, insert into the bucketed code table; the
    * streaming form of the daily-batch s15 posture, FAISS add() at the
    * end of a stream). Append cost per trigger is |batch|; the
    * codebook/centroid model artifacts never change mid-stream, so a
    * query against the index between triggers is always consistent.
    * Idempotent under foreachBatch's at-least-once redelivery (ADVICE
    * r13) via [[idempotentPqAppend]]. StreamingSpec proves the drained
    * stream ≡ the batch build+append and that a redelivered batch id
    * is a no-op. */
  def pqIndexIngest(vectors: DataFrame, idCol: String, vecCol: String,
                    table: String, dim: Int, m: Int = 4,
                    buckets: Int = 8, checkpoint: String,
                    compactEvery: Int = 0): StreamingQuery =
    vectors.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val applied = idempotentPqAppend(batch, id, checkpoint, idCol,
          vecCol, table, dim, m, buckets)
        if (applied) maintainEvery(batch.sparkSession, table, checkpoint,
          compactEvery)(s => graft.operators.Similarity.compactIndex(s, table))
      }
      .start()

  /** Apply one micro-batch to the PQ index EXACTLY ONCE per batch id:
    * foreachBatch is at-least-once — a failure between the index
    * append and the checkpoint commit redelivers the batch on restart,
    * which would duplicate (nid, code) rows and change top-k output
    * (ADVICE r13). Applied batch ids are recorded in a `_batches`
    * sidecar table checked BEFORE appending, so a redelivered id is a
    * no-op; the unprotected window shrinks to a crash between the
    * index append and the one-row sidecar write (the residual gap any
    * non-transactional two-table commit has — Spark's own foreachBatch
    * docs prescribe exactly this batchId-dedup discipline; a
    * transactional store is the upgrade path). */
  private[graft] def idempotentPqAppend(batch: DataFrame, batchId: Long,
                                        scope: String,
                                        idCol: String, vecCol: String,
                                        table: String, dim: Int, m: Int,
                                        buckets: Int): Boolean =
    idempotentAppend(batch, batchId, scope, table) { spark =>
      graft.operators.Similarity.appendPqIndex(spark, batch, idCol,
        vecCol, table, dim, m, buckets)
    }

  /** Recurring-crawl LEXICAL ingest — the BM25 twin of
    * [[pqIndexIngest]]: every micro-batch of new documents appends to
    * a persisted BM25 inverted index
    * ([[graft.operators.Retrieval.appendBm25Index]] — postings + dl
    * rows insert, corpus stats recompute exactly per trigger), so a
    * decontamination/curation query between triggers always scores
    * against the up-to-date corpus. Same batch-id idempotence as the
    * ANN side. */
  def bm25IndexIngest(docs: DataFrame, idCol: String, textCol: String,
                      table: String, buckets: Int = 8,
                      checkpoint: String,
                      compactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val applied = idempotentBm25Append(batch, id, checkpoint, idCol,
          textCol, table, buckets)
        if (applied) maintainEvery(batch.sparkSession, table, checkpoint,
          compactEvery)(s => graft.operators.Retrieval.compactBm25Index(s, table))
      }
      .start()

  private[graft] def idempotentBm25Append(batch: DataFrame, batchId: Long,
                                          scope: String,
                                          idCol: String, textCol: String,
                                          table: String,
                                          buckets: Int): Boolean =
    idempotentAppend(batch, batchId, scope, table) { spark =>
      graft.operators.Retrieval.appendBm25Index(spark, batch, idCol,
        textCol, table, buckets)
    }

  /** In-stream index maintenance (r14 verdict #4): without this the
    * ingest streams decay their own bucket-pruned layout forever — one
    * file per bucket per micro-batch, ~3,000 files/bucket after a
    * month of 15-minute triggers, and nothing inside the stream ever
    * restores it. Every `compactEvery`-th APPLIED batch (counted from
    * this stream's rows of the `_batches` ledger — deterministic under
    * redelivery, which never reaches here) runs the index's compaction:
    * the crash-safe staged swap, so queries between triggers stay
    * consistent and the ledger sidecar — its own table — survives.
    * 0 disables (the operator owns the cadence instead). */
  private def maintainEvery(spark: SparkSession, table: String,
                            scope: String, compactEvery: Int)
                           (compact: SparkSession => Unit): Unit =
    if (compactEvery > 0) {
      val applied = spark.table(s"${table}_batches")
        .filter(col("scope") === scope).count()
      if (applied % compactEvery == 0) compact(spark)
    }

  /** Shared at-least-once guard: run `apply` exactly once per
    * (table, scope, batchId), recording applied ids in the `_batches`
    * sidecar checked BEFORE applying — a redelivered id is a no-op.
    * Returns whether the batch applied (false = redelivery skip /
    * empty batch). The dedup key is SCOPED by the stream's checkpoint
    * path (ADVICE r14): a bare batchId collides the moment a second
    * stream — or a fresh-checkpoint restart after a rebuild — feeds
    * the same table, since Structured Streaming numbers each query's
    * batches from 0; the checkpoint is precisely the identity that
    * owns that numbering (stable across restarts of the SAME stream,
    * distinct for a new one; rebuilds additionally drop the ledger via
    * [[graft.operators.Similarity.dropIndexSidecars]]). The
    * unprotected window shrinks to a crash between the apply and the
    * one-row sidecar write (the residual gap any non-transactional
    * two-table commit has — Spark's own foreachBatch docs prescribe
    * exactly this batchId-dedup discipline; a transactional store is
    * the upgrade path). */
  private def idempotentAppend(batch: DataFrame, batchId: Long,
                               scope: String, table: String)
                              (apply: SparkSession => Unit): Boolean = {
    if (batch.isEmpty) return false
    val spark = batch.sparkSession
    import spark.implicits._
    val sidecar = s"${table}_batches"
    val applied = spark.catalog.tableExists(sidecar) &&
      !spark.table(sidecar)
        .filter(col("scope") === scope && col("batch_id") === batchId)
        .isEmpty
    if (!applied) {
      apply(spark)
      val row = Seq((scope, batchId)).toDF("scope", "batch_id")
      if (spark.catalog.tableExists(sidecar))
        row.write.mode("append").format("parquet").saveAsTable(sidecar)
      else {
        val base = graft.operators.Similarity.indexBasePath(spark, table)
        row.write.mode("overwrite").format("parquet")
          .option("path", s"${base}_batches").saveAsTable(sidecar)
      }
    }
    !applied
  }
}
