package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located joins via bucketed tables — the shuffle-elimination tool
  * for the repeated fact⋈fact joins a 100 TB deployment runs daily.
  *
  * A join between two tables bucketed on the join key with the same
  * bucket count is planned WITHOUT an Exchange on either side: each task
  * reads bucket i of both tables and joins locally (and `sortBy` makes it
  * a zero-sort merge join). At 100 TB the dominant cost of a fact⋈fact
  * join is shuffling both inputs across the cluster every run; paying one
  * bucketed write once moves that cost out of every subsequent query.
  * This is the persistent-storage complement to `repartition`-based
  * co-location (which helps only within one plan) — the reference has no
  * analogue (its joins are in-memory dicts, SURVEY §2.5), so this is part
  * of the engine's scale posture, not reference semantics.
  *
  * Bucket pruning: equality filters on the bucket key scan only the
  * matching bucket file per partition, so `keys`-selective point lookups
  * skip (buckets-1)/buckets of the data without a partition-column
  * directory scheme.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted external parquet table
    * registered in the session catalog (bucket metadata lives in the
    * catalog, which is why this is `saveAsTable` and not a bare
    * `parquet(path)`; on a real cluster the catalog is the metastore and
    * the layout outlives the session).
    *
    * The pre-write `repartition(buckets, keys)` is the
    * [[stageCompaction]] discipline applied at BUILD time: Spark's
    * bucketed writer emits one file per bucket PER TASK, so writing
    * from a pipeline's natural partitioning (e.g. 32 aggregate
    * partitions) yields up to 32 files per bucket from birth — every
    * bucket-pruned point scan then opens dozens of files, and the
    * maintenance policy's "minimal layout" state would be unreachable
    * without an immediate compaction. The explicit murmur3-pmod
    * shuffle aligns task i with bucket i: exactly one file per
    * non-empty bucket, the layout a compaction restores, present from
    * the first write. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    keys: Seq[String], buckets: Int): Unit = {
    import org.apache.spark.sql.functions.col
    require(keys.nonEmpty && buckets > 0)
    df.repartition(buckets, keys.map(col): _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .saveAsTable(table)
  }

  /** Append a batch to an existing bucketed table under the same
    * minimal-layout discipline as [[writeBucketed]]: the explicit
    * repartition makes the batch add at most ONE file per non-empty
    * bucket instead of one per task — a 32-partition daily append
    * otherwise multiplies the file count 32× per batch, eroding the
    * bucket-pruned scan 32× faster than the compaction cadence
    * assumes. (Spark validates the bucket spec against the catalog, so
    * `keys`/`buckets` must match the original build.) */
  def appendBucketed(df: DataFrame, table: String,
                     keys: Seq[String], buckets: Int): Unit = {
    import org.apache.spark.sql.functions.col
    require(keys.nonEmpty && buckets > 0)
    df.repartition(buckets, keys.map(col): _*)
      .write.mode("append").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog,
    * so this must be a table read, not a path read — `spark.read.parquet`
    * on the same files would silently lose the co-location). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Rewrite a bucketed table into the MINIMUM file layout — one file
    * per (non-empty) bucket — and swap the catalog entry.
    *
    * Why this exists: `mode("append").bucketBy(...)` (the index append
    * paths) adds one file per bucket PER BATCH, so the recurring-crawl
    * posture — daily appends for a year — turns every bucket-pruned
    * point scan into hundreds of tiny-file opens and erodes exactly
    * the scan-minimality the literal-In pruning buys. Periodic
    * compaction is how every bucketed/bucket-like store (Hive,
    * Iceberg's rewrite_data_files, FAISS index merges) restores the
    * layout; this is the Spark-native version.
    *
    * Mechanics: read the table, `repartition(numBuckets, bucketKeys)` —
    * HashPartitioning with the SAME murmur3-pmod arithmetic the bucket
    * writer uses, so every task holds exactly one bucket's rows and
    * the bucketed writer emits exactly one file per non-empty bucket —
    * rewrite into a staging path (ping-ponged `__c1`/`__c2` suffix so
    * repeated compactions don't grow the path), then swap.
    *
    * Crash- and reader-safety (ADVICE r13): the swap is ONE catalog
    * operation — `alterTable` re-points the EXISTING entry at the
    * staged location — so there is no instant at which the table is
    * unregistered (the previous dropTable→renameTable pair could crash
    * between the two and strand the data under a staging name). A
    * crash before the alter leaves the old generation live and the
    * staging dir reclaimable; after it, the new generation is live.
    * The superseded directory is RETAINED, not deleted — an in-flight
    * reader that resolved the old file list finishes its scan (at
    * production scan durations an eager delete is a mid-query
    * FileNotFoundException) — and is reclaimed by the NEXT
    * compaction's overwrite of the ping-pong sibling, or explicitly by
    * [[vacuumSuperseded]] once no reader can still hold the old list
    * (the Iceberg expire_snapshots discipline).
    *
    * `transform` rewrites rows on the way through (identity by
    * default) — the seam physical deletes ride
    * ([[graft.operators.Similarity.compactIndex]] anti-joins the
    * tombstone set here, so deletes cost nothing beyond the rewrite
    * compaction already pays). Values and bucket residency are
    * byte-identical under the identity transform — only the file
    * count changes. */
  def compactBucketed(spark: SparkSession, table: String,
                      transform: DataFrame => DataFrame = identity): Unit = {
    stageCompaction(spark, table, transform)
    swapToStaged(spark, table)
  }

  /** The ping-pong staging path for `loc`'s next generation. */
  private def stagingFor(loc: String): String =
    if (loc.endsWith("__c1")) loc.dropRight(4) + "__c2"
    else if (loc.endsWith("__c2")) loc.dropRight(4) + "__c1"
    else loc + "__c1"

  /** Phase 1 of [[compactBucketed]]: write the compacted generation at
    * the staging sibling path (via a `__compacting` scratch catalog
    * entry). Leaves the live table untouched — a crash anywhere in
    * here is invisible to readers and the next attempt overwrites the
    * partial staging output. Exposed private[graft] so the spec can
    * simulate exactly that crash. */
  private[graft] def stageCompaction(spark: SparkSession, table: String,
                                     transform: DataFrame => DataFrame = identity): Unit = {
    import org.apache.spark.sql.functions.col
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = catalog.getTableMetadata(ident)
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$table is not bucketed — nothing to compact"))
    val loc = meta.location.toString.stripSuffix("/")
    val staging = stagingFor(loc)
    val tmp = ident.copy(table = ident.table + "__compacting")
    // a stray scratch entry from a crashed run is dropped catalog-only
    // (purge=false: external entries never delete data, and after an
    // alter-then-crash the scratch may point at the LIVE directory)
    catalog.dropTable(tmp, ignoreIfNotExists = true, purge = false)
    val keyCols = spec.bucketColumnNames.map(col)
    // read the data files by PATH, not via spark.table: against the
    // catalog's bucketed relation the planner elides the explicit
    // repartition (the scan claims the bucket partitioning) yet may
    // still disable the bucketed scan layout, leaving size-packed
    // splits that write several buckets per task — the path read
    // forces the real murmur3-pmod shuffle, so task i holds exactly
    // bucket i and the writer emits one file per non-empty bucket
    var w = transform(spark.read.schema(meta.schema).parquet(loc))
      .repartition(spec.numBuckets, keyCols: _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(spec.numBuckets, spec.bucketColumnNames.head,
        spec.bucketColumnNames.tail: _*)
    if (spec.sortColumnNames.nonEmpty)
      w = w.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
    w.option("path", staging).saveAsTable(tmp.unquotedString)
  }

  /** Phase 2 of [[compactBucketed]]: the single-catalog-op swap —
    * re-point the live entry's location at the staged generation, then
    * drop the scratch entry (catalog-only). The table resolves at
    * every instant: old location before the alter, new after.
    *
    * `props` merge into the entry's table properties IN THE SAME
    * alterTable call — the device that lets a two-artifact index swap
    * (assignments table + `_centroids` sidecar,
    * [[graft.operators.Similarity.rebalanceIvfIndex]]) flip its
    * generation stamp atomically with the data it describes: there is
    * no instant at which the new location carries the old stamp. */
  private[graft] def swapToStaged(spark: SparkSession, table: String,
                                  props: Map[String, String] = Map.empty): Unit = {
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = catalog.getTableMetadata(ident)
    val staging = stagingFor(meta.location.toString.stripSuffix("/"))
    catalog.alterTable(meta.copy(
      storage = meta.storage.copy(
        locationUri = Some(new java.net.URI(staging))),
      properties = meta.properties ++ props))
    catalog.dropTable(ident.copy(table = ident.table + "__compacting"),
      ignoreIfNotExists = true, purge = false)
    spark.catalog.refreshTable(table)
  }

  /** Staged in-place rewrite of a NON-bucketed external table through
    * the same crash-safe single-catalog-op swap as [[compactBucketed]]
    * — for sidecar tables that must rewrite alongside their bucketed
    * primary (the BM25 `_dl` sidecar when deletes apply physically).
    * Same guarantees: the table resolves at every instant, the
    * superseded generation is retained for in-flight readers and
    * reclaimed by the next rewrite or [[vacuumSuperseded]]. */
  def rewriteTable(spark: SparkSession, table: String,
                   transform: DataFrame => DataFrame,
                   props: Map[String, String] = Map.empty): Unit = {
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = catalog.getTableMetadata(ident)
    require(meta.bucketSpec.isEmpty,
      s"$table is bucketed — use compactBucketed, which keeps the layout")
    val loc = meta.location.toString.stripSuffix("/")
    val tmp = ident.copy(table = ident.table + "__compacting")
    catalog.dropTable(tmp, ignoreIfNotExists = true, purge = false)
    transform(spark.read.schema(meta.schema).parquet(loc))
      .write.mode("overwrite").format("parquet")
      .option("path", stagingFor(loc)).saveAsTable(tmp.unquotedString)
    swapToStaged(spark, table, props)
  }

  /** Reclaim the superseded generation(s) of a compacted table —
    * deletes every ping-pong sibling directory of the CURRENT
    * location. Call it once no in-flight reader can still hold the old
    * file list (operator-decided retention, the expire_snapshots
    * seam); [[compactBucketed]] itself never deletes under readers. */
  def vacuumSuperseded(spark: SparkSession, table: String): Unit = {
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = catalog.getTableMetadata(ident).location.toString
      .stripSuffix("/")
    val base =
      if (loc.endsWith("__c1") || loc.endsWith("__c2")) loc.dropRight(4)
      else loc
    val hconf = spark.sparkContext.hadoopConfiguration
    Seq(base, base + "__c1", base + "__c2").filterNot(_ == loc).foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(hconf)
      if (fs.exists(hp)) { fs.delete(hp, true); () }
    }
  }
}
