package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.engine.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact⋈fact join plans with no shuffle exchange, same result") {
    val dir = Files.createTempDirectory("graft-buckets").toString
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    Bucketing.writeBucketed(li, "li_bucketed", s"$dir/li", Seq("l_orderkey"), 4)
    Bucketing.writeBucketed(ord, "ord_bucketed", s"$dir/ord", Seq("o_orderkey"), 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = Bucketing.readBucketed(spark, "li_bucketed")
        .join(Bucketing.readBucketed(spark, "ord_bucketed"),
          $"l_orderkey" === $"o_orderkey")
      assert(!bucketed.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucketed join must not shuffle either side")

      val plain = li.join(ord, $"l_orderkey" === $"o_orderkey")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"),
        "sanity: the same join without buckets does shuffle")

      assert(bucketed.count() == plain.count() && plain.count() > 0)

      // bucket pruning: a point lookup touches one bucket, not all four.
      // (autoBucketedScan hides the bucketed layout from plain scans where
      // no join needs it; turn it off so the pruned scan is visible.)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val pruned = Bucketing.readBucketed(spark, "li_bucketed")
        .filter($"l_orderkey" === 1L)
      assert(pruned.queryExecution.executedPlan.toString
        .contains("SelectedBucketsCount: 1 out of 4"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("compactBucketed: appended table back to ≤ buckets files, co-location kept") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    Bucketing.writeBucketed(li.filter($"l_orderkey" % 3 === 0),
      "li_cmp", s"$dir/li", Seq("l_orderkey"), 4)
    for (r <- Seq(1, 2))
      li.filter($"l_orderkey" % 3 === r)
        .write.mode("append").format("parquet")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_cmp")
    def files() = {
      val loc = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("li_cmp")).location
      Option(new java.io.File(loc).listFiles()).getOrElse(Array.empty)
        .count(_.getName.startsWith("part-"))
    }
    assert(files() > 4, s"appends should multiply files, got ${files()}")
    val before = spark.table("li_cmp").as[(Long, Double)].collect().sorted.toSeq

    Bucketing.compactBucketed(spark, "li_cmp")
    assert(files() <= 4, s"compaction left ${files()} files for 4 buckets")
    assert(spark.table("li_cmp").as[(Long, Double)].collect().sorted.toSeq
      == before, "compaction changed table contents")

    // the rewritten table still carries the bucket spec: a point lookup
    // bucket-prunes exactly as before
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val pruned = spark.table("li_cmp").filter($"l_orderkey" === 3L)
      assert(pruned.queryExecution.executedPlan.toString
        .contains("SelectedBucketsCount: 1 out of 4"))
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS li_cmp")
    }
    // a non-bucketed table is rejected, not silently rewritten
    spark.range(10).write.mode("overwrite")
      .option("path", s"$dir/flat").saveAsTable("flat_cmp")
    intercept[IllegalArgumentException] {
      Bucketing.compactBucketed(spark, "flat_cmp")
    }
    spark.sql("DROP TABLE IF EXISTS flat_cmp")
  }

  test("compaction swap is crash-safe and never deletes under readers") {
    val dir = Files.createTempDirectory("graft-crash").toString
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    Bucketing.writeBucketed(li, "li_crash", s"$dir/li", Seq("l_orderkey"), 4)
    li.limit(7).write.mode("append").format("parquet")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_crash")
    val before = spark.table("li_crash").as[(Long, Double)]
      .collect().sorted.toSeq
    def loc() = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("li_crash"))
      .location.toString.stripSuffix("/")
    val origLoc = loc()
    try {
      // CRASH BEFORE THE SWAP: phase 1 (staging write) completes but the
      // single-catalog-op swap never runs — the live table is untouched
      // and fully readable (the old dropTable→renameTable pair had a
      // window with NO entry registered at all)
      Bucketing.stageCompaction(spark, "li_crash")
      assert(loc() == origLoc, "a crash before the swap must leave the old generation live")
      assert(spark.table("li_crash").as[(Long, Double)].collect().sorted.toSeq
        == before, "table must stay fully readable after a staged-only crash")
      // recovery is just re-running the compaction (staging overwrites)
      Bucketing.compactBucketed(spark, "li_crash")
      assert(loc() == origLoc + "__c1")
      assert(spark.table("li_crash").as[(Long, Double)].collect().sorted.toSeq
        == before, "compaction after crash recovery changed contents")
      // READER SAFETY: the superseded generation is RETAINED — an
      // in-flight query that resolved the old file list finishes its
      // scan instead of dying with FileNotFoundException mid-scan
      assert(new java.io.File(new java.net.URI(origLoc)).exists(),
        "superseded directory must be retained after the swap")
      // ... and reclaimed only by the explicit vacuum seam
      Bucketing.vacuumSuperseded(spark, "li_crash")
      assert(!new java.io.File(new java.net.URI(origLoc)).exists(),
        "vacuumSuperseded must reclaim the superseded generation")
      assert(spark.table("li_crash").as[(Long, Double)].collect().sorted.toSeq
        == before, "vacuum must not touch the live generation")
      // the transform hook rewrites rows through the compaction (the
      // seam tombstone deletes ride)
      Bucketing.compactBucketed(spark, "li_crash",
        df => df.filter($"l_orderkey" =!= before.head._1))
      assert(spark.table("li_crash").as[(Long, Double)].collect().sorted.toSeq
        == before.filter(_._1 != before.head._1),
        "transform hook must rewrite rows physically")
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_crash")
      spark.sql("DROP TABLE IF EXISTS li_crash__compacting")
    }
  }
}
