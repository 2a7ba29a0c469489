package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.collection.immutable.ListMap

import graft.Tables
import graft.core.{CurieMap, Digest, TranslationTable}
import graft.operators.{BloomJoin, RangeJoin, Salt}

/** Relational operator coverage (SURVEY.md §2.3, §2.5–§2.9) over the driver
  * test corpus. Every query has a DuckDB oracle with identical column
  * aliases; computed floating-point aggregates are rounded on BOTH sides so
  * partial-aggregation order can't flip low bits; raw column passthroughs
  * are never rounded (bit-identical by construction).
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  val queries: ListMap[String, Q] = ListMap(

    // §2.6 aggregation: full-scan group-by with sums/avgs/counts (pricing
    // summary — the engine's q1 flagship aggregation).
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          count(lit(1)).as("count_order"))
    }),

    // §2.3 projection + filters incl. negation filter (`<> 'NOT'` pattern,
    // HPOAnnotations.py:225-226) and threshold filter (StringDB.py:188-192).
    "q02_filter_project" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderstatus") =!= "F" &&
                col("o_totalprice") > 400000 &&
                col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    }),

    // §2.5 multiway join: fact ⋈ fact ⋈ dim ⋈ dim ⋈ dim with explicit
    // broadcast of the small dimensions (nation/region), agg by nation.
    "q03_join_region_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
             countDistinct("o_orderkey").as("n_orders"))
    }),

    // §2.5 dimension joins both sides of the fact (STRING protein→gene
    // pattern, StringDB.py:151-210: probe two endpoints of each row).
    "q04_join_part_supplier" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
             round(sum("l_quantity"), 2).as("qty"),
             round(avg("p_retailprice"), 4).as("avg_retail"))
    }),

    // §2.5 semi join (test-id semijoin filter pattern).
    "q05_semijoin_exists" -> ((s, d) => {
      Tables.nation(s, d)
        .join(Tables.customer(s, d).filter(col("c_acctbal") > 9000),
              col("n_nationkey") === col("c_nationkey"), "left_semi")
        .select("n_nationkey", "n_name")
    }),

    // §2.5 anti join (STRING missing-key drop / ZFIN set-difference).
    "q06_antijoin" -> ((s, d) => {
      Tables.part(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_quantity") > 45),
              col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
    }),

    // §2.6/§2.7 top-k per group via window (Bgee top-20-per-gene,
    // Bgee.py:196-200) with a deterministic tie-break.
    "q07_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      Tables.part(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    }),

    // §2.6 grouped mean/σ + |z|>2 outlier classification (MPD
    // strain-abnormality calls, MPD.py:33-37,138,326-594).
    "q08_zscore_outliers" -> ((s, d) => {
      val e = Tables.events(s, d)
      val st = e.groupBy("event_type")
        .agg(avg("value").as("mu"), stddev_samp("value").as("sigma"))
      e.join(broadcast(st), "event_type")
        .filter(abs((col("value") - col("mu")) / col("sigma")) > 2)
        .select("event_id", "event_type", "value")
    }),

    // §2.6 group-collect (ZFIN fish→set(affectors), ZFIN.py:577-589) as a
    // canonical sorted set rendering.
    "q09_group_collect_set" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(array_join(array_sort(collect_set(col("l_suppkey").cast("string"))), ",").as("supps"))
    }),

    // §2.8 set difference (ZFIN extrinsic = affectors − intrinsic).
    "q10_set_except" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_returnflag") === "R").select("l_partkey", "l_suppkey")
        .except(li.filter(col("l_returnflag") === "A").select("l_partkey", "l_suppkey"))
    }),

    // §2.8 distinct / dedup (rdflib store set semantics).
    "q11_distinct_dedup" -> ((s, d) =>
      Tables.customer(s, d).select("c_mktsegment", "c_nationkey").distinct()),

    // §2.3 pipe-list split + explode (CTD PubMedIDs, CTD.py:464-489).
    "q12_explode_split" -> ((s, d) => {
      Tables.part(s, d)
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
    }),

    // §2.3 deterministic digest ids (Source.hash_id; md5 form so the
    // oracle can reproduce it — sha1 form covered by unit tests).
    "q13_digest_id" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
                Digest.md5Id(concat(lit("ORDER+"), col("o_orderkey").cast("string"))).as("digest"))
    }),

    // §2.3 translation-table lookup with default + aspect/branch dispatch
    // (Source.resolve + HPOA aspect routing).
    "q14_translation_lookup" -> ((s, d) => {
      val tt = TranslationTable.globalOnly(Map(
        "1-URGENT" -> "prio:urgent", "2-HIGH" -> "prio:high"))
      Tables.orders(s, d).select(
        col("o_orderkey"),
        tt.resolveCol(col("o_orderpriority"), Some("prio:other")).as("prio_term"),
        when(col("o_orderstatus") === "F", "closed").otherwise("open").as("state"))
    }),

    // §2.3 CURIE → IRI expansion (CurieUtil.get_uri) as pure builtins.
    "q15_curie_expand" -> ((s, d) => {
      Tables.part(s, d)
        .withColumn("curie", concat(lit("HP:"), col("p_partkey").cast("string")))
        .select(col("p_partkey"), col("curie"),
                CurieMap.default.expandCol(col("curie")).as("iri"))
    }),

    // §2.5 range join (UDP variant-position ∈ gene-interval) via the
    // bucketed equi-join operator (no nested-loop cross product).
    "q16_range_join" -> ((s, d) => {
      val intervals = Tables.supplier(s, d).select(
        col("s_suppkey"),
        (col("s_suppkey") * 20).cast("long").as("lo"),
        (col("s_suppkey") * 20 + 50).cast("long").as("hi"))
      RangeJoin.pointInInterval(
          Tables.lineitem(s, d).select("l_partkey", "l_quantity"),
          intervals, "l_partkey", "lo", "hi", bucketWidth = 64)
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
    }),

    // §2.8 union + dedup (graph union, Source.py:228-229).
    "q17_union_dedup" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_name").as("name"))
        .union(Tables.supplier(s, d).select(col("s_name").as("name")))
        .distinct()),

    // §2.8 intersection (configured ∩ available, GeneOntology.py:269).
    "q18_intersect" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))),

    // §2.7 canonical symmetric-pair ordering + self-join co-occurrence
    // (STRING protein1≥protein2 dedup, StringDB.py:200-208; GWAS
    // same-locus self-join, GWASCatalog.py:292-298).
    "q19_canonical_pairs" -> ((s, d) => {
      val a = Tables.lineitem(s, d).select(col("l_orderkey").as("ok"), col("l_suppkey").as("sa"))
      val b = Tables.lineitem(s, d).select(col("l_orderkey").as("ok"), col("l_suppkey").as("sb"))
      a.join(b, Seq("ok")).filter(col("sa") < col("sb"))
        .groupBy(least(col("sa"), col("sb")).as("s1"),
                 greatest(col("sa"), col("sb")).as("s2"))
        .agg(countDistinct("ok").as("n"))
    }),

    // §2.3 threshold filter + agg (STRING combined_score > 700).
    "q20_threshold_filter" -> ((s, d) => {
      Tables.events(s, d).filter(col("value") > 300)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
    }),

    // §2.7 deterministic sorted limit (CLI --limit pushdown).
    "q21_limit_topn" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_totalprice")
        .limit(10)),

    // §2.6 prefix-partonomy min/max extents (UCSCBands parent-band
    // aggregation, UCSCBands.py:288-544 / Monochrom.make_parent_bands).
    "q22_band_extents" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_partkey") >= 10)
        .select(col("p_partkey").cast("string").as("code"),
                (col("p_size") * 1000).cast("long").as("s"),
                (col("p_size") * 1000 + 999).cast("long").as("e"))
        .select(explode(expr(
          "transform(sequence(1, length(code) - 1), n -> substring(code, 1, n))")).as("band"),
          col("s"), col("e"))
        .groupBy("band")
        .agg(min("s").as("min_start"), max("e").as("max_end"),
             count(lit(1)).as("n_children"))
    }),

    // §2.9 JSON navigation (OMIM/BioThings payloads).
    "q23_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), get_json_object(col("props"), "$.k").as("k"))),

    // §2.10 event-time tumbling window, batch form (the streaming pipeline
    // in graft.streaming runs the same agg with a watermark).
    "q24_window_hourly" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
    }),

    // §2.7 gap-based sessionization: per-user event sessions split at
    // >30 min idle gaps — lag + running sum over one user-partitioned
    // window (a single shuffle on user_id; both windows share the sort).
    // Gaps compare in microseconds, exact for the µs-truncated ts.
    "q29_sessionize" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gapUs = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
      val isNew = when(gapUs.isNull || gapUs > 1800L * 1000000L, 1).otherwise(0)
      Tables.events(s, d)
        .withColumn("session", sum(isNew).over(run))
        .groupBy("user_id", "session")
        .agg(count(lit(1)).as("n_events"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("start_ts"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("end_ts"))
    }),

    // §2.5 inner-join-with-missing-count (STRING p2gene probe: rows whose
    // key misses the mapping are dropped AND counted, StringDB.py:194-210)
    // over a multi-column key (UDP rsID join shape, (chrom,pos,alleles)).
    "q26_missing_key_count" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val dim = li.filter(col("l_quantity") > 40)
        .select("l_partkey", "l_suppkey").distinct()
      val matched = li.join(dim, Seq("l_partkey", "l_suppkey"))
      val missing = li.join(dim, Seq("l_partkey", "l_suppkey"), "left_anti")
      matched.agg(count(lit(1)).as("matched"))
        .crossJoin(missing.agg(count(lit(1)).as("missing")))
    }),

    // Skew-salted two-phase aggregation — identical results to a plain
    // groupBy (proved here against the unsalted oracle), robust to hot
    // keys at cluster scale. Sum rounded post-hoc on both sides.
    "q27_salted_agg" -> ((s, d) => {
      Salt.saltedSumCount(
          Tables.lineitem(s, d).select("l_suppkey", "l_extendedprice"),
          Seq("l_suppkey"), "l_extendedprice", buckets = 16)
        .select(col("l_suppkey"), round(col("total"), 2).as("total"), col("n"))
    }),

    // §2.6 hierarchical totals in one pass: ROLLUP produces the
    // (flag, status) / (flag) / () grouping levels as a single shuffle
    // with map-side partial aggregation — the one-pass form of the
    // subtotal-report shape (reference computes per-level counts with
    // separate passes, e.g. VoID's per-level statistics).
    "q28_rollup_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag").as("rflag"), col("l_linestatus").as("lstatus"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n"))
        .select(coalesce(col("rflag"), lit("ALL")).as("rflag"),
          coalesce(col("lstatus"), lit("ALL")).as("lstatus"),
          col("revenue"), col("n"))),

    // As-of join (brief's named scale extension; no reference analogue —
    // SURVEY §2.5 notes dipper has none): each click gets the most recent
    // purchase at or before it per user, via the union+window single-
    // shuffle operator (never |L|×|R|). Purchases are pre-aggregated to
    // one row per (user, ts) so the as-of pick is deterministic;
    // max(value) is selection, not arithmetic — no rounding.
    "q30_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("pts"))
        .agg(max("value").as("purchase_value"))
      graft.operators.AsofJoin.asof(clicks, purchases,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "pts")
        .select(col("event_id"), col("user_id"),
          date_format(col("pts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("purchase_value"))
    }),

    // Pivot (wide conditional aggregation): quantity by return flag ×
    // line status. Explicit pivot values — the two-pass infer-then-pivot
    // form collects distinct values to the driver, which a 100 TB plan
    // must not do; with values given the whole thing is ONE hash
    // aggregate with conditional partials (same plan as the oracle's
    // CASE WHEN form — map-side combine, single shuffle).
    "q31_pivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("rflag"))
        .pivot("l_linestatus", Seq("O", "F"))
        .agg(round(sum(col("l_quantity")), 2))),

    // Cube (all grouping-set combinations) with grouping indicators —
    // the subtotal lattice of q28's ROLLUP. One shuffle: Spark expands
    // the grouping sets map-side and aggregates once.
    "q32_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_prio"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("n"), col("g_status"), col("g_prio"))),

    // Frame-bounded window: 4-event trailing average per user in event
    // order (ts, event_id tie-break — total order ⇒ deterministic).
    // One shuffle on user_id; frames evaluate inside the window operator
    // with no self-join (the pre-window-function formulation of a
    // trailing average is a range self-join — strictly worse at scale).
    "q33_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          round(avg(col("value")).over(w), 4).as("trailing_avg"))
    }),

    // Runtime-filter join (scale extension): bloom-prune the fact side
    // on the curated dim's keys BEFORE the shuffle join — at 100 TB the
    // win is shuffling |matching lineitem| instead of |lineitem|. Exact:
    // the real join removes bloom false positives, so the oracle is the
    // plain join.
    "q34_bloom_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_partkey", "l_quantity")
      val dim = Tables.part(s, d).filter(col("p_size") >= 48)
        .select("p_partkey", "p_brand")
      BloomJoin.join(li, "l_partkey", dim, "p_partkey", expectedItems = 1 << 16)
        .groupBy("p_brand")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n_items"))
    }),

    // HLL approx-distinct — the 100 TB path for count(DISTINCT), one
    // fixed-size sketch per group instead of a distinct shuffle.
    // Self-checking oracle form: emit exact counts only for groups where
    // the sketch lands within 5% of exact; a drifting sketch drops rows
    // and fails the driver's row-count gate. HLL register-merge is a
    // per-register max — order-independent ⇒ deterministic per dataset.
    "q35_hll_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(countDistinct("l_partkey").as("exact_parts"),
          approx_count_distinct("l_partkey", 0.02).as("approx_parts"))
        .filter(abs(col("approx_parts") - col("exact_parts")) <=
          col("exact_parts") * 0.05)
        .select("l_returnflag", "l_linestatus", "exact_parts")),

    // Approximate quantiles (Greenwald-Khanna mergeable summaries) — the
    // scale path for the exact-percentile shapes (t06/q25): bounded-size
    // summaries, no full sort. Self-check: with accuracy 10000 the rank
    // error is ≤ 1e-4, so the approx median must land between the exact
    // 0.49 and 0.51 quantiles; emit exact values for the oracle.
    "q36_approx_quantile" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        // ONE exact-percentile buffer for all three cut points (array
        // form) instead of three independent Percentile aggregates:
        // each Percentile is an ObjectHashAggregate buffering a
        // value→count map per group per partition, so the 3-column form
        // built and merged the identical corpus-sized map three times
        // (guide §1.2 "per-task work"). The array form evaluates all
        // three percentages from one buffer — same interpolation
        // arithmetic on the same sorted counts, values bit-identical.
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
            .as("approx_median"),
          expr("percentile(l_extendedprice, array(0.49, 0.5, 0.51))")
            .as("pct"))
        .filter(col("approx_median")
          .between(col("pct").getItem(0), col("pct").getItem(2)))
        // round to 3, NOT 2: an even-count median of 2-decimal prices
        // is an exact .xx5 midpoint — a round-half boundary where the
        // two engines' tie directions can differ (seen at sf0.001).
        // 3 digits puts midpoints ON the grid, off the boundary.
        .select(col("l_returnflag"),
          round(col("pct").getItem(1), 3).as("exact_median"))),

    // Explicit GROUPING SETS through the engine's SQL surface (the
    // arbitrary-subtotal generalization of q28's ROLLUP / q32's CUBE):
    // two chosen levels, one shuffle — Spark expands the sets map-side
    // and aggregates once, same plan family as rollup/cube.
    "q37_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                      coalesce(o_orderpriority, 'ALL') AS prio,
                      count(*) AS n,
                      round(sum(o_totalprice), 2) AS revenue
               FROM orders_gs
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""")
    }),

    // §2.7 analytic-window suite: lag/lead (neighbour deltas), ntile
    // (equi-depth quartiles), percent_rank — one window spec, one
    // shuffle on the partition key, all functions evaluated in a single
    // Window operator pass (ts, event_id total order ⇒ deterministic).
    "q38_window_suite" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          round(col("value") - lag(col("value"), 1).over(w), 4).as("delta_prev"),
          round(lead(col("value"), 1).over(w) - col("value"), 4).as("delta_next"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"))
    }),

    // Column profiling — the data-quality report every ingest runs
    // before trusting a landed file (the engine-side generalization of
    // the reference's header/row-width checks): per column null rate,
    // distinct count, min/max. ONE pass, one shuffle: all measures are
    // partial-aggregatable, stacked long-form via explode so adding a
    // column never adds a scan.
    "q39_profile_stats" -> ((s, d) => {
      def prof(c: String) = struct(lit(c).as("col_name"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_v"),
        max(col(c)).cast("string").as("max_v"))
      Tables.orders(s, d)
        .agg(count(lit(1)).as("n_rows"),
          // integral + string columns only: their to-string rendering is
          // engine-independent (float formatting is not)
          array(prof("o_custkey"), prof("o_orderstatus"),
            prof("o_orderpriority")).as("cols"))
        .select(col("n_rows"), explode(col("cols")).as("c"))
        .select(col("c.col_name").as("col_name"), col("n_rows"),
          col("c.n_null").as("n_null"), col("c.n_distinct").as("n_distinct"),
          col("c.min_v").as("min_v"), col("c.max_v").as("max_v"))
    }),

    // §4 subquery decorrelation through the SQL surface: a correlated
    // scalar subquery (orders above their customer's average) — Catalyst
    // rewrites it to an aggregate + join; the plan must never execute
    // per-row (check the absence of a subquery node in .explain).
    "q40_correlated_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_cs")
      s.sql("""SELECT o_orderkey, o_custkey,
                      round(o_totalprice, 2) AS price
               FROM orders_cs o
               WHERE o_totalprice > 1.5 * (
                 SELECT avg(o_totalprice) FROM orders_cs i
                 WHERE i.o_custkey = o.o_custkey)""")
    }),

    // Null-semantics coverage: null-safe equality (<=>), nulls in
    // grouping keys (one group, not dropped), and null-aware conditional
    // routing — the correctness corners every engine must pin. Nulls are
    // synthesized deterministically (nullif on a stable predicate).
    "q41_null_semantics" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("P")).as("st"),
          when(col("o_totalprice") > 200000, col("o_orderpriority")).as("pr"))
        .groupBy("st", "pr")
        .agg(count(lit(1)).as("n"),
          sum(when(col("st").isNull, 1L).otherwise(0L)).as("n_null_st"),
          count(col("pr")).as("n_nonnull_pr"),
          sum(when(col("st") <=> col("pr"), 1L).otherwise(0L))
            .as("n_nullsafe_eq"))),

    // §2.6 mean-of-means outliers (MPD: per-strain means per (assay,sex),
    // then strains beyond ±2σ of the strain-mean distribution,
    // MPD.py:326-594): two-level aggregation, broadcast stats join.
    "q25_mean_of_means" -> ((s, d) => {
      val um = Tables.events(s, d).groupBy("event_type", "user_id")
        .agg(avg("value").as("um"))
      val st = um.groupBy("event_type")
        .agg(avg("um").as("mu"), stddev_samp("um").as("sigma"))
      um.join(broadcast(st), "event_type")
        .filter(abs((col("um") - col("mu")) / col("sigma")) > 2)
        .select("event_type", "user_id")
    })
  )

  val oracles: ListMap[String, String] = ListMap(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
         round(avg(l_quantity),4) AS avg_qty, round(avg(l_extendedprice),4) AS avg_price,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
         WHERE o_orderstatus <> 'F' AND o_totalprice > 400000
           AND o_orderpriority <> '4-NOT SPECIFIED'""",
    "q03_join_region_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
         count(DISTINCT o_orderkey) AS n_orders
         FROM lineitem JOIN orders ON l_orderkey=o_orderkey
         JOIN customer ON o_custkey=c_custkey
         JOIN nation ON c_nationkey=n_nationkey
         JOIN region ON n_regionkey=r_regionkey
         WHERE r_name='ASIA' GROUP BY n_name""",
    "q04_join_part_supplier" ->
      """SELECT p_brand, count(*) AS n, round(sum(l_quantity),2) AS qty,
         round(avg(p_retailprice),4) AS avg_retail
         FROM lineitem JOIN part ON l_partkey=p_partkey
         JOIN supplier ON l_suppkey=s_suppkey
         GROUP BY p_brand""",
    "q05_semijoin_exists" ->
      """SELECT n_nationkey, n_name FROM nation n
         WHERE EXISTS (SELECT 1 FROM customer c
                       WHERE c.c_nationkey=n.n_nationkey AND c.c_acctbal>9000)""",
    "q06_antijoin" ->
      """SELECT p_partkey, p_name FROM part p
         WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                           WHERE l.l_partkey=p.p_partkey AND l.l_quantity>45)""",
    "q07_topk_per_group" ->
      """SELECT p_brand, p_partkey, p_retailprice, rn FROM (
           SELECT p_brand, p_partkey, p_retailprice,
                  row_number() OVER (PARTITION BY p_brand
                                     ORDER BY p_retailprice DESC, p_partkey) AS rn
           FROM part) t WHERE rn <= 5""",
    "q08_zscore_outliers" ->
      """SELECT event_id, event_type, value FROM (
           SELECT event_id, event_type, value,
                  (value - avg(value) OVER (PARTITION BY event_type))
                  / stddev_samp(value) OVER (PARTITION BY event_type) AS z
           FROM events) t WHERE abs(z) > 2""",
    "q09_group_collect_set" ->
      """SELECT l_orderkey,
         string_agg(DISTINCT l_suppkey::varchar, ',' ORDER BY l_suppkey::varchar) AS supps
         FROM lineitem GROUP BY l_orderkey""",
    "q10_set_except" ->
      """SELECT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag='R'
         EXCEPT
         SELECT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag='A'""",
    "q11_distinct_dedup" ->
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    "q12_explode_split" ->
      """SELECT word, count(*) AS n FROM (
           SELECT unnest(string_split(p_name, ' ')) AS word FROM part) t
         GROUP BY word""",
    "q13_digest_id" ->
      """SELECT o_orderkey,
         'b' || substr(md5('ORDER+' || o_orderkey::varchar), 2, 19) AS digest
         FROM orders""",
    "q14_translation_lookup" ->
      """SELECT o_orderkey,
         CASE o_orderpriority WHEN '1-URGENT' THEN 'prio:urgent'
              WHEN '2-HIGH' THEN 'prio:high' ELSE 'prio:other' END AS prio_term,
         CASE WHEN o_orderstatus='F' THEN 'closed' ELSE 'open' END AS state
         FROM orders""",
    "q15_curie_expand" ->
      """SELECT p_partkey, 'HP:' || p_partkey::varchar AS curie,
         'http://purl.obolibrary.org/obo/HP_' || p_partkey::varchar AS iri
         FROM part""",
    "q16_range_join" ->
      """SELECT s_suppkey, count(*) AS n, round(sum(l_quantity),2) AS qty
         FROM (SELECT s_suppkey, s_suppkey*20 AS lo, s_suppkey*20+50 AS hi
               FROM supplier) i
         JOIN lineitem l ON l.l_partkey BETWEEN i.lo AND i.hi
         GROUP BY s_suppkey""",
    "q17_union_dedup" ->
      """SELECT c_name AS name FROM customer
         UNION SELECT s_name AS name FROM supplier""",
    "q18_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
         INTERSECT SELECT s_nationkey AS nk FROM supplier""",
    "q19_canonical_pairs" ->
      """SELECT least(a.l_suppkey, b.l_suppkey) AS s1,
              greatest(a.l_suppkey, b.l_suppkey) AS s2,
              count(DISTINCT a.l_orderkey) AS n
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey=b.l_orderkey AND a.l_suppkey < b.l_suppkey
         GROUP BY 1, 2""",
    "q20_threshold_filter" ->
      """SELECT event_type, count(*) AS n, round(sum(value),2) AS total
         FROM events WHERE value > 300 GROUP BY event_type""",
    "q21_limit_topn" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q22_band_extents" ->
      """WITH codes AS (
           SELECT p_partkey::varchar AS code, p_size*1000 AS s, p_size*1000+999 AS e
           FROM part WHERE p_partkey >= 10),
         pref AS (
           SELECT substr(code, 1, n) AS band, s, e
           FROM (SELECT code, s, e,
                        unnest(generate_series(1, length(code)-1)) AS n
                 FROM codes) t)
         SELECT band, min(s) AS min_start, max(e) AS max_end,
                count(*) AS n_children
         FROM pref GROUP BY band""",
    "q23_json_extract" ->
      "SELECT event_id, json_extract_string(props, '$.k') AS k FROM events",
    "q24_window_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
              event_type, count(*) AS n, round(sum(value),2) AS total
         FROM events GROUP BY 1, 2""",
    "q29_sessionize" ->
      """WITH o AS (
           SELECT user_id, ts, event_id,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                       THEN 1 ELSE 0 END AS nw
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, ts,
                  (sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING))::BIGINT AS session
           FROM o)
         SELECT user_id, session, count(*) AS n_events,
                strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
                strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts
         FROM s GROUP BY 1, 2""",
    "q26_missing_key_count" ->
      """WITH dim AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
                      WHERE l_quantity > 40)
         SELECT
           (SELECT count(*) FROM lineitem l JOIN dim
              ON l.l_partkey=dim.l_partkey AND l.l_suppkey=dim.l_suppkey) AS matched,
           (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
              (SELECT 1 FROM dim
               WHERE l.l_partkey=dim.l_partkey AND l.l_suppkey=dim.l_suppkey)) AS missing""",
    "q27_salted_agg" ->
      """SELECT l_suppkey, round(sum(l_extendedprice), 2) AS total,
              count(*) AS n
         FROM lineitem GROUP BY l_suppkey""",
    "q28_rollup_revenue" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
              coalesce(l_linestatus, 'ALL') AS lstatus,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              count(*) AS n
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q30_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
         r AS (SELECT user_id, ts AS pts, max(value) AS purchase_value
               FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
         SELECT l.event_id, l.user_id,
                strftime(r.pts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
                r.purchase_value
         FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.pts""",
    "q31_pivot" ->
      """SELECT l_returnflag AS rflag,
              round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O",
              round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F"
         FROM lineitem GROUP BY 1""",
    "q32_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
              coalesce(o_orderpriority, 'ALL') AS prio,
              count(*) AS n,
              grouping(o_orderstatus)::INT AS g_status,
              grouping(o_orderpriority)::INT AS g_prio
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q33_moving_avg" ->
      """SELECT event_id, user_id,
              round(avg(value) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS trailing_avg
         FROM events""",
    "q34_bloom_join" ->
      """SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty,
              count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size >= 48 GROUP BY p_brand""",
    "q35_hll_distinct" ->
      """SELECT l_returnflag, l_linestatus,
              count(DISTINCT l_partkey) AS exact_parts
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q36_approx_quantile" ->
      """SELECT l_returnflag,
              round(quantile_cont(l_extendedprice, 0.5), 3) AS exact_median
         FROM lineitem GROUP BY l_returnflag""",
    "q40_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
         FROM orders o
         WHERE o_totalprice > 1.5 * (
           SELECT avg(o_totalprice) FROM orders i
           WHERE i.o_custkey = o.o_custkey)""",
    "q41_null_semantics" ->
      """SELECT nullif(o_orderstatus, 'P') AS st,
              CASE WHEN o_totalprice > 200000 THEN o_orderpriority END AS pr,
              count(*) AS n,
              sum(CASE WHEN nullif(o_orderstatus, 'P') IS NULL
                       THEN 1 ELSE 0 END)::BIGINT AS n_null_st,
              count(CASE WHEN o_totalprice > 200000
                         THEN o_orderpriority END) AS n_nonnull_pr,
              sum(CASE WHEN nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM
                            (CASE WHEN o_totalprice > 200000
                                  THEN o_orderpriority END)
                       THEN 1 ELSE 0 END)::BIGINT AS n_nullsafe_eq
         FROM orders
         GROUP BY 1, 2""",
    "q39_profile_stats" ->
      """WITH n AS (SELECT count(*) AS n_rows FROM orders)
         SELECT 'o_custkey' AS col_name, n_rows,
                (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS n_null,
                (SELECT count(DISTINCT o_custkey) FROM orders) AS n_distinct,
                (SELECT min(o_custkey)::VARCHAR FROM orders) AS min_v,
                (SELECT max(o_custkey)::VARCHAR FROM orders) AS max_v
         FROM n
         UNION ALL
         SELECT 'o_orderstatus', n_rows,
                (SELECT count(*) FROM orders WHERE o_orderstatus IS NULL),
                (SELECT count(DISTINCT o_orderstatus) FROM orders),
                (SELECT min(o_orderstatus) FROM orders),
                (SELECT max(o_orderstatus) FROM orders)
         FROM n
         UNION ALL
         SELECT 'o_orderpriority', n_rows,
                (SELECT count(*) FROM orders WHERE o_orderpriority IS NULL),
                (SELECT count(DISTINCT o_orderpriority) FROM orders),
                (SELECT min(o_orderpriority) FROM orders),
                (SELECT max(o_orderpriority) FROM orders)
         FROM n""",
    "q37_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
              coalesce(o_orderpriority, 'ALL') AS prio,
              count(*) AS n, round(sum(o_totalprice), 2) AS revenue
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""",
    "q38_window_suite" ->
      """SELECT event_id, user_id,
              round(value - lag(value, 1) OVER w, 4) AS delta_prev,
              round(lead(value, 1) OVER w - value, 4) AS delta_next,
              ntile(4) OVER w AS quartile,
              round(percent_rank() OVER w, 6) AS pct_rank
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "q25_mean_of_means" ->
      """WITH um AS (SELECT event_type, user_id, avg(value) AS um
                     FROM events GROUP BY 1, 2),
         st AS (SELECT event_type, avg(um) AS mu, stddev_samp(um) AS sigma
                FROM um GROUP BY 1)
         SELECT um.event_type, user_id FROM um JOIN st USING (event_type)
         WHERE abs((um - mu) / sigma) > 2"""
  )
}
