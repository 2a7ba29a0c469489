package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.core.Triple
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked hourly window agg over a replayed stream ≡ batch q24") {
    val dir = Files.createTempDirectory("graft-stream").toString
    // materialize events (micros timestamps) as the stream source
    Tables.events(spark, sf).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    val stream = EventStream.readEvents(spark, s"$dir/in", schema)
    val q = EventStream.hourlyCounts(stream).writeStream
      .outputMode("complete").format("memory").queryName("hourly_out").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.sql("SELECT * FROM hourly_out")
      .as[(String, String, Long, Double)].collect().toSet
    val batch = SparkEntry.queries("q24_window_hourly")(spark, sf)
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming windowed top-k terms ≡ batch rank over the same replay") {
    val dir = Files.createTempDirectory("graft-topk").toString
    Tables.events(spark, sf).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    val stream = EventStream.readEvents(spark, s"$dir/in", schema)
    val q = EventStream.windowedTypeCounts(stream).writeStream
      .outputMode("complete").format("memory").queryName("topk_counts")
      .start()
    q.processAllAvailable(); q.stop()

    val streamed = EventStream.topKPerWindow(
        spark.sql("SELECT * FROM topk_counts"), k = 2)
      .as[(String, String, Long, Int)].collect().toSet
    val batchCounts = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "60 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("win"), col("event_type"), col("n"))
    val batch = EventStream.topKPerWindow(batchCounts, k = 2)
      .as[(String, String, Long, Int)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
    // dense per-window ranks, cut at k
    assert(streamed.groupBy(_._1).values
      .forall(rs => rs.map(_._4).toSeq.sorted == (1 to rs.size).toList
        && rs.size <= 2))
  }

  test("mapGroupsWithState running per-user totals ≡ batch aggregation") {
    import graft.streaming.EventStream.{UserEvent, UserTotals}
    val dir = Files.createTempDirectory("graft-state").toString
    Tables.events(spark, sf).select("user_id", "value").write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    val stream = spark.readStream.schema(schema).parquet(s"$dir/in").as[UserEvent]
    val q = EventStream.runningUserTotals(stream).writeStream
      .outputMode("update").format("memory").queryName("user_totals").start()
    q.processAllAvailable(); q.stop()

    // single replay batch → final state row per user
    val streamed = spark.sql(
      "SELECT user_id, events, round(total, 2) AS total FROM user_totals")
      .as[(Long, Long, Double)].collect().toSet
    val batch = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("events"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum("value"), 2).as("total"))
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming exact dedup keeps first arrival per digest within the watermark") {
    val dir = Files.createTempDirectory("graft-stream-dedup").toString
    // three docs, one exact duplicate ("alpha" twice) within the horizon
    Seq(
      (1L, "alpha text", java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (2L, "beta text",  java.sql.Timestamp.valueOf("2026-01-01 10:05:00")),
      (3L, "alpha text", java.sql.Timestamp.valueOf("2026-01-01 10:10:00")))
      .toDF("doc_id", "text", "ts").write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = EventStream.dedupedStream(stream, "text", "ts", "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    q.processAllAvailable(); q.stop()
    // exactly one survivor per content digest (docs 1 and 3 share content;
    // which of the two survives within a single replay batch is an
    // arbitrary-but-single pick, so assert on the deduplicated content)
    val kept = spark.sql("SELECT doc_id, text FROM dedup_out")
      .as[(Long, String)].collect()
    assert(kept.length == 2)
    assert(kept.map(_._2).toSet == Set("alpha text", "beta text"))
    assert(kept.map(_._1).toSet.subsetOf(Set(1L, 2L, 3L)))
    // schema passes through unchanged (helper column dropped)
    assert(spark.sql("SELECT * FROM dedup_out").columns.toSeq ==
      Seq("doc_id", "text", "ts"))
  }

  test("streaming incremental dedup ≡ batch incrementalNew against a static corpus") {
    val dir = Files.createTempDirectory("graft-stream-incr").toString
    val old = Seq((1L, "alpha text"), (2L, "beta text")).toDF("doc_id", "text")
    val oldDigests = old.select(org.apache.spark.sql.functions.md5($"text").as("h"))
    Seq((10L, "alpha text"),   // re-delivery — must drop
        (11L, "gamma text"),   // genuinely new — must survive
        (12L, "beta text"))    // re-delivery — must drop
      .toDF("doc_id", "text").write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = EventStream.incrementalDedupStream(stream, oldDigests, "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("incr_out").start()
    q.processAllAvailable(); q.stop()
    val kept = spark.sql("SELECT doc_id FROM incr_out").as[Long].collect().toSet
    assert(kept == Set(11L))
    // ≡ the batch operator on the same inputs
    val batch = graft.operators.Dedup.incrementalNew(old,
        spark.read.parquet(s"$dir/in"), "text", expectedOld = 1024)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == batch)
  }

  test("streaming keep-best dedup converges to batch priorityKeep across batches") {
    import graft.streaming.EventStream.KeepBestDoc
    val dir = Files.createTempDirectory("graft-stream-best").toString
    def row(id: Long, text: String, prio: Int) =
      KeepBestDoc(java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString,
        id, prio, text)
    // batch 1: crawl + curated deliveries of "same"; one "other" crawl
    Seq(row(1L, "same", 2), row(2L, "same", 1), row(3L, "other", 2))
      .toDF.write.parquet(s"$dir/in/b1")
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in/*")
      .as[KeepBestDoc]
    val q = graft.streaming.EventStream.keepBestStream(stream)
      .toDF.writeStream.outputMode("append").format("memory")
      .queryName("best_out").start()
    q.processAllAvailable()
    // batch 2: a TIE on "same" (same priority, higher id — must not emit)
    // and a strictly better "other" delivery (must emit)
    Seq(row(4L, "same", 1), row(5L, "other", 1))
      .toDF.write.parquet(s"$dir/in/b2")
    q.processAllAvailable(); q.stop()
    val emitted = spark.sql("SELECT digest, doc_id FROM best_out")
      .as[(String, Long)].collect()
    // improvements only: doc2 + doc3 from batch1, doc5 from batch2
    assert(emitted.map(_._2).toSet == Set(2L, 3L, 5L))
    // fold keep-last per digest == batch priorityKeep over the replay
    val last = emitted.groupBy(_._1).map { case (d, rs) => d -> rs.last._2 }
    val all = Seq((1L, "same", "crawl"), (2L, "same", "curated"),
      (3L, "other", "crawl"), (4L, "same", "curated"), (5L, "other", "curated"))
      .toDF("doc_id", "text", "source")
    val batch = graft.operators.Dedup.priorityKeep(all, "doc_id", "text",
        when($"source" === "curated", 1).otherwise(2))
      .select(md5($"text"), $"doc_id").as[(String, Long)].collect().toMap
    assert(last == batch)
  }

  test("flatMapGroupsWithState gap sessions ≡ batch sessionization (closed)") {
    import graft.streaming.EventStream.SessionEvent
    import org.apache.spark.sql.expressions.Window
    val dir = Files.createTempDirectory("graft-sessions").toString
    Tables.events(spark, sf).select("user_id", "ts").write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    // horizon far beyond the corpus span: the watermark never passes any
    // session's idle timeout, so emissions are exactly the GAP-closed
    // sessions and each user's final session stays open in state — a
    // deterministic oracle (timeout-closed sessions would depend on the
    // no-data batch's watermark).
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in").as[SessionEvent]
    val q = EventStream.gapSessions(stream, gapMinutes = 30, horizon = "3650 days")
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT * FROM sessions_out")
      .as[(Long, Long, Long, Long)].collect().toSet

    // batch oracle (q29 in micros), minus each user's last (open) session
    val w = Window.partitionBy("user_id").orderBy("us")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lagUs = lag(col("us"), 1).over(w)
    val sess = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("us"))
      .withColumn("nw", when(lagUs.isNull || $"us" - lagUs > 1800L * 1000000L, 1)
        .otherwise(0))
      .withColumn("session", sum("nw").over(run))
      .groupBy("user_id", "session")
      .agg(min("us").as("start_us"), max("us").as("end_us"),
        count(lit(1)).as("n_events"))
    val closed = sess
      .join(sess.groupBy("user_id").agg(max("session").as("last")), "user_id")
      .filter($"session" < $"last")
      .select($"user_id", $"start_us", $"end_us", $"n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == closed && closed.nonEmpty)
  }

  test("StreamedGraph-equivalent: triple batches → deduplicated NT files") {
    val dir = Files.createTempDirectory("graft-stream-nt").toString
    Seq(
      Triple.res("HP:1", "rdf:type", "owl:Class"),
      Triple.res("HP:1", "rdf:type", "owl:Class"),
      Triple.str("HP:2", "rdfs:label", "two")).toDF()
      .write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = EventStream.streamTriplesToNt(stream, s"$dir/out", s"$dir/ckpt")
    q.processAllAvailable(); q.stop()
    val lines = spark.read.text(s"$dir/out").as[String].collect().toSeq
    assert(lines.size == 2) // per-batch dedup collapsed the duplicate
    assert(lines.forall(_.endsWith(" .")))
  }

  test("streaming ANN index ingest ≡ batch build+append (s15's posture as a stream)") {
    import graft.operators.Similarity
    val dir = Files.createTempDirectory("graft-sidx").toString
    val emb = Tables.embeddings(spark, sf)
    // base index on the first half — the codebook trains there and is
    // FIXED for every appended micro-batch (FAISS add() semantics)
    Similarity.writePqIndex(emb.filter($"vec_id" < 250), "vec_id",
      "embedding", "graft_sidx", s"$dir/idx", dim = 64, m = 4, ks = 16,
      buckets = 4)
    // the second half arrives as two files = two micro-batches
    emb.filter($"vec_id" >= 250 && $"vec_id" % 2 === 0)
      .coalesce(1).write.parquet(s"$dir/in")
    emb.filter($"vec_id" >= 250 && $"vec_id" % 2 === 1)
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val q = EventStream.pqIndexIngest(stream, "vec_id", "embedding",
      "graft_sidx", dim = 64, m = 4, buckets = 4,
      checkpoint = s"$dir/ckpt")
    q.processAllAvailable(); q.stop()
    val qs = emb.filter($"vec_id" < 5)
    val streamed = Similarity.pqTopKIndexed(spark, "graft_sidx", qs,
        "vec_id", "embedding", dim = 64, k = 3, m = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    // batch twin: the s15 shape on a second table
    Similarity.writePqIndex(emb.filter($"vec_id" < 250), "vec_id",
      "embedding", "graft_sidx_twin", s"$dir/twin", dim = 64, m = 4,
      ks = 16, buckets = 4)
    Similarity.appendPqIndex(spark, emb.filter($"vec_id" >= 250),
      "vec_id", "embedding", "graft_sidx_twin", dim = 64, m = 4,
      buckets = 4)
    val batch = Similarity.pqTopKIndexed(spark, "graft_sidx_twin", qs,
        "vec_id", "embedding", dim = 64, k = 3, m = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.exists(_._2 >= 250),
      "streamed vectors never surfaced as neighbours")
    // at-least-once redelivery (ADVICE r13): foreachBatch may replay a
    // micro-batch after a failure between the index append and the
    // checkpoint commit — a REDELIVERED batch id must be a no-op, not
    // a duplicate set of (nid, code) rows
    val rowsBefore = spark.table("graft_sidx").count()
    val redelivered = emb.filter($"vec_id" >= 250 && $"vec_id" % 2 === 0)
    EventStream.idempotentPqAppend(redelivered, batchId = 0L,
      scope = s"$dir/ckpt",
      "vec_id", "embedding", "graft_sidx", dim = 64, m = 4, buckets = 4)
    assert(spark.table("graft_sidx").count() == rowsBefore,
      "redelivered batch id duplicated index rows")
    assert(Similarity.pqTopKIndexed(spark, "graft_sidx", qs,
        "vec_id", "embedding", dim = 64, k = 3, m = 4)
      .as[(Long, Long, Double, Int)].collect().toSet == streamed,
      "redelivery changed top-k output")
    // ... while a genuinely NEW batch id still applies
    EventStream.idempotentPqAppend(
      emb.filter($"vec_id" === 0)
        .select(($"vec_id" + 10000).as("vec_id"), $"embedding"),
      batchId = 99L, scope = s"$dir/ckpt",
      "vec_id", "embedding", "graft_sidx", dim = 64, m = 4, buckets = 4)
    assert(spark.table("graft_sidx").count() > rowsBefore,
      "a new batch id failed to apply")
    Seq("graft_sidx", "graft_sidx_codebook", "graft_sidx_batches",
        "graft_sidx_twin", "graft_sidx_twin_codebook")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("streaming BM25 index ingest ≡ batch build+append, redelivery no-op") {
    import graft.operators.Retrieval
    val dir = Files.createTempDirectory("graft-bidx").toString
    val docs = Tables.documents(spark, sf)
    Retrieval.writeBm25Index(docs.filter($"doc_id" < 250), "doc_id",
      "text", "graft_bidx", s"$dir/idx", buckets = 4)
    docs.filter($"doc_id" >= 250 && $"doc_id" % 2 === 0)
      .coalesce(1).write.parquet(s"$dir/in")
    docs.filter($"doc_id" >= 250 && $"doc_id" % 2 === 1)
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val q = EventStream.bm25IndexIngest(stream, "doc_id", "text",
      "graft_bidx", buckets = 4, checkpoint = s"$dir/ckpt")
    q.processAllAvailable(); q.stop()
    val qs = docs.filter($"doc_id" < 3)
      .select($"doc_id",
        concat_ws(" ", slice(split($"text", " "), 1, 8)).as("qtext"))
    val streamed = Retrieval.bm25TopKIndexed(spark, "graft_bidx", qs,
        "doc_id", "qtext", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    // batch twin: per-trigger stats recompute lands on the same exact
    // (integer-dl) aggregate, so the drained stream is bit-identical
    Retrieval.writeBm25Index(docs.filter($"doc_id" < 250), "doc_id",
      "text", "graft_bidx_twin", s"$dir/twin", buckets = 4)
    Retrieval.appendBm25Index(spark, docs.filter($"doc_id" >= 250),
      "doc_id", "text", "graft_bidx_twin", buckets = 4)
    val batch = Retrieval.bm25TopKIndexed(spark, "graft_bidx_twin", qs,
        "doc_id", "qtext", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    // a redelivered batch id is a no-op
    val before = spark.table("graft_bidx").count()
    EventStream.idempotentBm25Append(
      docs.filter($"doc_id" >= 250 && $"doc_id" % 2 === 0), 0L,
      s"$dir/ckpt", "doc_id", "text", "graft_bidx", 4)
    assert(spark.table("graft_bidx").count() == before,
      "redelivered batch id duplicated postings")
    Seq("graft_bidx", "graft_bidx_dl", "graft_bidx_stats",
        "graft_bidx_batches", "graft_bidx_twin", "graft_bidx_twin_dl",
        "graft_bidx_twin_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("streaming crawl dedup ingest: cross-index, intra-batch and cross-batch dups drop") {
    import graft.operators.Dedup
    val dir = Files.createTempDirectory("graft-mh-stream").toString
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    // base index over the first half of the corpus
    Dedup.writeMinhashIndex(docs.filter($"doc_id" < 250), "doc_id",
      "text", "graft_mh_ing", s"$dir/idx", buckets = 4)
    def copyOf(src: Long, as: Long) = docs.filter($"doc_id" === src)
      .select(lit(as).as("doc_id"), $"text")
    // batch 1: fresh docs 250-299 + a copy of an INDEXED doc (drops
    // vs index) + a copy of a batch-mate (drops intra-batch, greedy
    // by id); batch 2: a copy of a batch-1 doc — drops only if the
    // stream appended batch 1's survivors (the cross-batch loop)
    docs.filter($"doc_id" >= 250 && $"doc_id" < 300)
      .unionByName(copyOf(10L, 100010L))
      .unionByName(copyOf(250L, 100250L))
      .coalesce(1).write.parquet(s"$dir/in")
    copyOf(260L, 100260L)
      .unionByName(docs.filter($"doc_id" >= 300 && $"doc_id" < 320))
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val q = EventStream.minhashDedupIngest(stream, "doc_id", "text",
      "graft_mh_ing", checkpoint = s"$dir/ckpt", buckets = 4)
    q.processAllAvailable(); q.stop()
    val verdicts = spark.table("graft_mh_ing_verdicts")
      .as[(Long, Boolean, Option[Long])].collect()
    assert(verdicts.length == 73, s"expected 73 verdicts, ${verdicts.length}")
    val kept = verdicts.filter(_._2).map(_._1).toSet
    // every planted duplicate dropped, whatever its source's own fate
    assert(!kept(100010L) && !kept(100250L) && !kept(100260L))
    // the index grew by exactly the accepted docs: its id set is the
    // base ∪ kept, and its rows are IDENTICAL to a fresh build over
    // those docs (deterministic signatures — append conservation)
    val idxIds = spark.table("graft_mh_ing").select("id").distinct()
      .as[Long].collect().toSet
    assert(idxIds == (0L until 250L).toSet ++ kept)
    val keptDocs = docs.filter($"doc_id" < 250)
      .unionByName(docs.filter($"doc_id" >= 250 && $"doc_id" < 320)
        .filter($"doc_id".isin(kept.toSeq: _*)))
    Dedup.writeMinhashIndex(keptDocs, "doc_id", "text",
      "graft_mh_ing_twin", s"$dir/twin", buckets = 4)
    assert(spark.table("graft_mh_ing").select("id", "band", "bh")
        .as[(Long, Int, String)].collect().toSet ==
      spark.table("graft_mh_ing_twin").select("id", "band", "bh")
        .as[(Long, Int, String)].collect().toSet,
      "streamed index rows differ from a fresh build over base+kept")
    // redelivered batch id: neither index rows nor verdicts duplicate
    val (ni, nv) = (spark.table("graft_mh_ing").count(),
      spark.table("graft_mh_ing_verdicts").count())
    EventStream.idempotentMinhashDedup(
      docs.filter($"doc_id" >= 250 && $"doc_id" < 300), batchId = 0L,
      scope = s"$dir/ckpt", "doc_id", "text", "graft_mh_ing",
      numPerm = 32, bands = 8, threshold = 0.5, shingleN = 3,
      family = "xxhash64", buckets = 4)
    assert(spark.table("graft_mh_ing").count() == ni &&
      spark.table("graft_mh_ing_verdicts").count() == nv,
      "redelivered batch re-applied")
    Seq("graft_mh_ing", "graft_mh_ing_verdicts", "graft_mh_ing_batches",
        "graft_mh_ing_twin")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("batch ledger: scoped per stream, dropped by a rebuild (ADVICE r14)") {
    import graft.operators.Similarity
    val dir = Files.createTempDirectory("graft-ledger").toString
    val emb = Tables.embeddings(spark, sf)
    Similarity.writePqIndex(emb.filter($"vec_id" < 250), "vec_id",
      "embedding", "graft_lidx", s"$dir/idx", dim = 64, m = 4, ks = 16,
      buckets = 4)
    // stream A applies its batch 0
    EventStream.idempotentPqAppend(
      emb.filter($"vec_id" >= 250 && $"vec_id" < 300), batchId = 0L,
      scope = s"$dir/ckptA",
      "vec_id", "embedding", "graft_lidx", dim = 64, m = 4, buckets = 4)
    val afterA = spark.table("graft_lidx").count()
    // a SECOND stream feeding the same table also numbers its batches
    // from 0 — the scoped key must not collide with stream A's
    EventStream.idempotentPqAppend(
      emb.filter($"vec_id" >= 300 && $"vec_id" < 350), batchId = 0L,
      scope = s"$dir/ckptB",
      "vec_id", "embedding", "graft_lidx", dim = 64, m = 4, buckets = 4)
    assert(spark.table("graft_lidx").count() > afterA,
      "two streams' batch 0 collided on the bare batch id")
    // a rebuild invalidates the ledger: a fresh-checkpoint stream
    // restarts at batch 0 and must NOT be skipped by stale entries
    Similarity.writePqIndex(emb.filter($"vec_id" < 250), "vec_id",
      "embedding", "graft_lidx", s"$dir/idx2", dim = 64, m = 4, ks = 16,
      buckets = 4)
    assert(!spark.catalog.tableExists("graft_lidx_batches"),
      "rebuild left the stale applied-batch ledger behind")
    val afterRebuild = spark.table("graft_lidx").count()
    EventStream.idempotentPqAppend(
      emb.filter($"vec_id" >= 250 && $"vec_id" < 300), batchId = 0L,
      scope = s"$dir/ckptA",
      "vec_id", "embedding", "graft_lidx", dim = 64, m = 4, buckets = 4)
    assert(spark.table("graft_lidx").count() > afterRebuild,
      "post-rebuild batch 0 was silently skipped — index data loss")
    Seq("graft_lidx", "graft_lidx_codebook", "graft_lidx_batches")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("in-stream maintenance: compactEvery restores the layout, ledger survives") {
    import graft.operators.Similarity
    val dir = Files.createTempDirectory("graft-smaint").toString
    val emb = Tables.embeddings(spark, sf)
    Similarity.writePqIndex(emb.filter($"vec_id" < 200), "vec_id",
      "embedding", "graft_midx", s"$dir/idx", dim = 64, m = 4, ks = 16,
      buckets = 4)
    // four input files = four micro-batches; without in-stream
    // compaction the table ends at up to 5 files per bucket
    (0 until 4).foreach { i =>
      emb.filter($"vec_id" >= 200 + i * 75 && $"vec_id" < 275 + i * 75)
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
    }
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val q = EventStream.pqIndexIngest(stream, "vec_id", "embedding",
      "graft_midx", dim = 64, m = 4, buckets = 4,
      checkpoint = s"$dir/ckpt", compactEvery = 2)
    q.processAllAvailable(); q.stop()
    // layout restored: the 4th applied batch triggered the final
    // compaction, so the live location holds ≤ one file per bucket
    val loc = new java.net.URI(spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("graft_midx"))
      .location.toString).getPath
    val files = new java.io.File(loc).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    assert(files.size <= 4,
      s"in-stream compaction left ${files.size} files for 4 buckets")
    // results ≡ the batch twin over the same union
    val qs = emb.filter($"vec_id" < 5)
    val streamed = Similarity.pqTopKIndexed(spark, "graft_midx", qs,
        "vec_id", "embedding", dim = 64, k = 3, m = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    Similarity.writePqIndex(emb.filter($"vec_id" < 200), "vec_id",
      "embedding", "graft_midx_twin", s"$dir/twin", dim = 64, m = 4,
      ks = 16, buckets = 4)
    Similarity.appendPqIndex(spark, emb.filter($"vec_id" >= 200),
      "vec_id", "embedding", "graft_midx_twin", dim = 64, m = 4,
      buckets = 4)
    val batch = Similarity.pqTopKIndexed(spark, "graft_midx_twin", qs,
        "vec_id", "embedding", dim = 64, k = 3, m = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    // the applied-batch ledger survived the mid-stream compactions:
    // all four batch ids are recorded and a redelivery is still a no-op
    assert(spark.table("graft_midx_batches").count() == 4)
    val before = spark.table("graft_midx").count()
    EventStream.idempotentPqAppend(
      emb.filter($"vec_id" >= 200 && $"vec_id" < 275), batchId = 0L,
      scope = s"$dir/ckpt",
      "vec_id", "embedding", "graft_midx", dim = 64, m = 4, buckets = 4)
    assert(spark.table("graft_midx").count() == before,
      "post-compaction redelivery duplicated index rows")
    Seq("graft_midx", "graft_midx_codebook", "graft_midx_batches",
        "graft_midx_twin", "graft_midx_twin_codebook")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
