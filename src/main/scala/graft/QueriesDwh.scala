package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.IngestDiscovery
/** Registry part 1 of SparkEntry.queries (see SparkEntry for the driver
  * contract): the reference-ETL families — normalization/coercion/ingest,
  * the end-to-end pipeline reports, multi-source merge + reconciliation,
  * quality rules + dashboards, star schema + SCD2, warehouse analytics,
  * the monitoring/statistics family, and event-stream analytics. */
private[graft] object QueriesDwh {
  import QueryShared._

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 row 4 — string normalization
    "normalize_strings" -> ((s, d) => {
      val c = Tables.customer(s, d)
      c.select(col("c_custkey"),
        Normalize.collapseWs(col("c_name")).as("name_norm"),
        Normalize.emptyToNull(Normalize.digitsOnly(col("c_name"))).as("id_digits"),
        Normalize.lowerNorm(col("c_mktsegment")).as("seg_norm"))
    }),
    // §2.1 row 5 — safe type coercion
    "coerce_types" -> ((s, d) => {
      val e = Tables.events(s, d)
      val kRaw = regexp_extract(col("props"), "[0-9]+", 0)
      e.select(col("event_id"), kRaw.as("k_raw"),
        Normalize.coerceInt(kRaw, 0).as("k_int"),
        Normalize.coerceInt(col("event_type"), -1).as("bad_int"),
        Normalize.coerceDouble(kRaw, 0.0).as("k_dbl"))
    }),
    // §2.1 row 6 — ISO timestamp parse with Z handling + fallback
    "parse_timestamps" -> ((s, d) => {
      val e = Tables.events(s, d)
      val iso = date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
      e.select(col("event_id"), iso.as("iso"),
        Normalize.parseIsoZ(iso).as("parsed"),
        coalesce(Normalize.parseIsoZ(lit("not-a-timestamp")),
          to_timestamp(lit("1970-01-01 00:00:00"))).as("parsed_fallback"))
    }),
    // §2.1 row 7 — dual-format schema dispatch
    "dual_format_dispatch" -> ((s, d) => {
      val p = Tables.part(s, d)
      val csvShape = p.filter(col("p_partkey") % 2 === 0).select(
        col("p_partkey").as("id"), col("p_name").as("ten_san_pham"),
        col("p_retailprice").as("gia"))
      val sqlShape = p.filter(col("p_partkey") % 2 === 1).select(
        col("p_partkey").as("id"), col("p_name").as("ten_mon"),
        col("p_size").as("loai_id"), col("p_retailprice").as("gia"))
      dispatchMon(csvShape).unionByName(dispatchMon(sqlShape))
    }),
    // §2.1 row 2 — staged reader metadata contract
    "staged_read" -> ((s, d) =>
      IngestDiscovery.staged(Tables.customer(s, d), "csv", "run_001", "2026-01-01 00:00:00")),
    // §2.1 row 1 — discovery (rows-only oracle: filesystem metadata)
    "ingest_discovery" -> ((s, d) => IngestDiscovery.discover(s, d)),
    // §2.1 row 17d — the END-TO-END DWH pipeline, run for real and
    // COUNT-ORACLED (round 13): every stage's row count (raw staging,
    // quality split, two-fact DWH load, report sink) re-derives in SQL,
    // so the orchestrated run — zone writes, SCD2 dim, fact loads — not
    // just its constituent operators, answers to the DuckDB gate.
    // Per-stage SECONDS are recorded by Bench's pipeline-detail phase
    // (PIPELINE_BENCH.json); this entry exposes the deterministic part.
    "pipeline_report" -> ((s, d) =>
      runDwhPipeline(s, d).select(col("stage"), col("rows").as("n_rows"))),
    // §2.2 row L22e — Z-order (Morton) clustering values: min-max integer
    // bucketing (exact DIV arithmetic) + bit interleave over
    // (l_partkey, l_suppkey) — the data-skipping layout key an OPTIMIZE
    // ZORDER job sorts by. The physical relayout + file-box pruning proof
    // live in LayoutSpec (Layout.writeZOrdered / fileBoxes); the VALUE
    // computation — the part with engine-parity risk — is row-hash
    // oracled here, the DuckDB side generating the SAME shift/mask term
    // list from the same (bit, column) loop.
    "zorder_cluster" -> ((s, d) =>
      Layout.zorderValues(Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey")),
        Seq("l_partkey", "l_suppkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("_zb_l_partkey").as("zb_part"), col("_zb_l_suppkey").as("zb_supp"),
          col("zval"))),
    // §2.2 row L17g — the END-TO-END corpus curation pipeline,
    // COUNT-ORACLED (round 13): NFC ingest → quality gate → source cap →
    // exact + near-dup dedup (cluster representatives) → span scrub →
    // BPE tokenizer annotate → perplexity buckets → shard write. Only
    // gate/cap/dedup change counts (scrub/tokenizer/ppl annotate in
    // place — spec-pinned in PipelineSpec), so every stage row
    // re-derives in SQL: the dedup stage via the dedup_cluster oracle's
    // all-pairs-Jaccard + recursive-reach fixpoint over the capped
    // survivors. The asymmetry is the point at 100 TB: Spark's stage is
    // LSH-banded candidates + bounded-round min-label propagation; the
    // oracle must go all-pairs.
    "corpus_report" -> ((s, d) =>
      runCorpusPipeline(s, d).select(col("stage"), col("rows").as("n_rows"))),
    // §2.1 row 11 — merged union with source tag
    // §2.2 row 29x — corpus snapshot diff (dataset versioning audit):
    // v2 derives deterministically from the corpus (drop %17, edit %13,
    // clone %19 under shifted ids), then every id classifies added /
    // removed / changed / unchanged by map-side content hash
    "corpus_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val v2 = docs.where(col("doc_id") % 17 =!= 0)
        .withColumn("text", when(col("doc_id") % 13 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
        .unionByName(docs.where(col("doc_id") % 19 === 0)
          .withColumn("doc_id", col("doc_id") + 10000000L))
      MultiSource.snapshotDiff(docs, v2, "doc_id", Seq("text"))
    }),
    "merged_union" -> ((s, d) =>
      MultiSource.mergedUnion(Map("CSV" -> srcA(s, d), "SQL" -> srcB(s, d)))),
    // §2.1 row 12b — fuzzy record linkage (round 14): blocked pairwise
    // Levenshtein above recon's exact-key compare. The dirty side adds a
    // single-char deletion (dist 1, links) on top of srcB's case
    // mutation (dist 7, correctly excluded at maxDist 2); the block key
    // is nation + the name's last-6-digit suffix (deletion- and
    // case-stable), so candidates are block-local — never all-pairs.
    "recon_fuzzy" -> ((s, d) => {
      def blk(df: DataFrame): DataFrame = df.withColumn("_blk",
        concat(col("c_nationkey").cast("string"), lit(":"),
          expr("right(c_name, 6)")))
      val dirty = srcB(s, d).withColumn("c_name",
        when(col("c_custkey") % 7 === 0,
          concat(substring(col("c_name"), 1, 4), substring(col("c_name"), 6, 1000)))
          .otherwise(col("c_name")))
      MultiSource.fuzzyLinkage(blk(srcA(s, d)), blk(dirty),
        "c_custkey", "c_name", "_blk", 2)
    }),
    // §2.1 row 12c — EXACT edit-distance self-join (round 15): every
    // supplier-name pair within Levenshtein 1, COMPLETE (Ed-Join q-gram
    // prefix filtering — no blocking key to lose a pair through; the
    // oracle is the literal all-pairs definition)
    // supplier ships as ONE row group at every test SF, and Ed-Join's
    // per-row work is heavy (q-gram explode + levenshtein verify): spread
    // it (r19 — the final verify stage otherwise ran 1-task: the planner
    // broadcasts the small candidate table and STREAMS the 1-partition
    // scan; no-op on a well-split source)
    "edit_join" -> ((s, d) =>
      MultiSource.editJoin(
        Tables.spread(s, d, "supplier",
          Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
        "s_suppkey", "s_name", 1)),
    // §2.1 row 12c, SCALE-KNOB variant (round 18): Ed-Join's completeness
    // is q-independent — only the candidate count changes — so the q=3
    // shape (the one the r18 scale curve shows restoring ~linear growth
    // on digit-heavy key domains; bench_logs/r18/SCALE_CURVE.md) is gated
    // by the SAME brute-force oracle, proving result identity in the
    // driver gate, not just in the probe.
    "edit_join_wide" -> ((s, d) =>
      MultiSource.editJoin(
        Tables.spread(s, d, "supplier",
          Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
        "s_suppkey", "s_name", 1, q = 3)),
    // §2.1 row 12 — reconciliation
    "recon_inner" -> ((s, d) =>
      MultiSource.reconInner(srcA(s, d), srcB(s, d), "c_custkey", Seq("c_name", "c_acctbal"))),
    "recon_only_left" -> ((s, d) =>
      MultiSource.reconOnlyIn(srcA(s, d), srcB(s, d), "c_custkey")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))),
    "recon_only_right" -> ((s, d) =>
      MultiSource.reconOnlyIn(srcB(s, d), srcA(s, d), "c_custkey")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))),
    // §2.1 row 13 — per-source aggregation
    "per_source_agg" -> ((s, d) =>
      MultiSource.perSourceAgg(
        MultiSource.mergedUnion(Map("CSV" -> srcA(s, d), "SQL" -> srcB(s, d))),
        Seq("c_mktsegment"), Seq("CSV", "SQL"))),
    // §2.1 rows 8-10, 17 — quality engine
    "quality_clean" -> ((s, d) => Quality.cleanZone(annotatedOrders(s, d))),
    "quality_errors" -> ((s, d) => Quality.errorZone(annotatedOrders(s, d))),
    "pipeline_stats" -> ((s, d) => Quality.zoneStats(annotatedOrders(s, d), "orders", "o_orderkey")),
    "error_audit" -> ((s, d) => Quality.ruleAudit(annotatedOrders(s, d))),
    // §2.1 row 17u — the two dashboard drill-ins beyond monitor_feed's
    // aggregates (dashboard.py:124-157 get_file_content, 207-224 get_logs):
    // typed first-50 preview of the clean zone, last-50 rejected rows with
    // reasons. (o_orderkey, src) is the zone's unique composite, so both
    // top-N row SETS are deterministic; plans are TakeOrderedAndProject.
    "zone_preview" -> ((s, d) =>
      Quality.zonePreview(Quality.cleanZone(annotatedOrders(s, d)),
        Seq("o_orderkey", "src"), 50)),
    "audit_tail" -> ((s, d) =>
      Quality.auditTail(annotatedOrders(s, d), Seq("o_orderkey", "src"), 50)),
    // §2.1 row 8b — the LITERAL per-entity rule catalogs (the reference's
    // "106 rules" registry shape): 23 rules over 4 §3 entities, each
    // catalog one aggregation pass, zero-violation rules included
    "quality_catalog" -> ((s, d) => {
      val nat = Tables.nation(s, d)
      val (prepC, rulesC) = Quality.Catalogs.customer(nat)
      val (prepO, rulesO) = Quality.Catalogs.orders(Tables.customer(s, d))
      val (prepP, rulesP) = Quality.Catalogs.part()
      val (prepS, rulesS) = Quality.Catalogs.supplier(nat)
      val (prepL, rulesL) = Quality.Catalogs.loaiMon(Tables.region(s, d))
      val (prepI, rulesI) = Quality.Catalogs.nguyenLieu(Tables.supplier(s, d))
      Quality.catalogCounts(prepC(catalogCustomer(s, d)), rulesC, "khach_hang")
        .unionByName(Quality.catalogCounts(prepO(catalogOrders(s, d)), rulesO, "dat_hang"))
        .unionByName(Quality.catalogCounts(prepP(catalogPart(s, d)), rulesP, "mon"))
        .unionByName(Quality.catalogCounts(prepS(catalogSupplier(s, d)), rulesS, "nha_cung_cap"))
        .unionByName(Quality.catalogCounts(prepL(catalogNation(s, d)), rulesL, "loai_mon"))
        .unionByName(Quality.catalogCounts(prepI(catalogInventory(s, d)), rulesI, "nguyen_lieu"))
    }),
    // §2.1 row 17h — the dashboard's serving feed: zone counts, per-rule
    // violations, per-column drift flags, and hot keys in ONE long-format
    // (metric, key, value) table (dashboard.py's page, minus the HTML)
    "monitor_feed" -> ((s, d) => {
      // zone_rows + rule_violations fused into one annotate pass
      // (zoneRuleMetrics); drift and hot keys union on as before.
      Quality.zoneRuleMetrics(annotatedOrders(s, d)).unionByName(
        Quality.monitorFeed(Seq(
          ("col_drift", Quality.profileDrift(srcA(s, d), srcB(s, d),
            Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment")),
            col("col_name"), col("drifted").cast("int")),
          ("hot_key_rows", Analytics.skewProfile(
            Tables.orders(s, d).select(col("o_custkey")), col("o_custkey"), "o_custkey", 10),
            col("o_custkey"), col("n_rows")))))
    }),
    // §2.1 row 14 — date dimension
    "dim_date" -> ((s, d) => Star.dimDate(Tables.orders(s, d), "o_orderdate")),
    // §2.1 row 15 — star fact build (broadcast dim lookups)
    "star_fact" -> ((s, d) => {
      val dimC = rankedDim(s, d, "customer", "c_custkey", "customer_key")
      val dimP = rankedDim(s, d, "part", "p_partkey", "part_key")
      // spread: the fact build (broadcast-join pipeline over every lineitem
      // row) would otherwise run single-core on the one-row-group testdata
      val f0 = Tables.spread(s, d, "lineitem", Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount")))
        .join(Tables.orders(s, d).select(
          col("o_orderkey").as("l_orderkey"), col("o_custkey").as("c_custkey"),
          col("o_orderdate"), col("o_orderstatus")), Seq("l_orderkey"))
      val f1 = Star.lookupDim(f0, dimC, "c_custkey", "customer_key")
      val f2 = Star.lookupDim(f1.withColumnRenamed("l_partkey", "p_partkey"), dimP, "p_partkey", "part_key")
      val od = col("o_orderdate")
      f2.select(col("l_orderkey"), col("l_linenumber"),
        col("customer_key"), col("part_key"),
        (year(od) * 10000 + month(od) * 100 + dayofmonth(od)).as("date_key"),
        col("l_quantity").as("quantity"),
        col("l_extendedprice").as("ext_price"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        col("o_orderstatus").as("status"))
    }),
    // §2.1 row 15 — the reference's FULL star shape
    // (create_dwh_tables.sql:21-163): four dimensions (customer, part,
    // supplier, nation-of-supplier) + dim_date around the lineitem-grain
    // fact; every dim lookup is a broadcast join against a two-phase-ranked
    // surrogate key.
    "star_full" -> ((s, d) => {
      val dimC = rankedDim(s, d, "customer", "c_custkey", "customer_key")
      val dimP = rankedDim(s, d, "part", "p_partkey", "part_key")
      val dimS = rankedDim(s, d, "supplier", "s_suppkey", "supplier_key")
      val dimN = rankedDim(s, d, "nation", "n_nationkey", "nation_key")
      val f0 = Tables.spread(s, d, "lineitem", Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount")))
        .join(Tables.orders(s, d).select(
          col("o_orderkey").as("l_orderkey"), col("o_custkey").as("c_custkey"),
          col("o_orderdate")), Seq("l_orderkey"))
        .join(broadcast(Tables.supplier(s, d).select(
          col("s_suppkey").as("l_suppkey"), col("s_nationkey").as("n_nationkey"))),
          Seq("l_suppkey"))
      val f1 = Star.lookupDim(f0, dimC, "c_custkey", "customer_key")
      val f2 = Star.lookupDim(f1.withColumnRenamed("l_partkey", "p_partkey"),
        dimP, "p_partkey", "part_key")
      val f3 = Star.lookupDim(f2.withColumnRenamed("l_suppkey", "s_suppkey"),
        dimS, "s_suppkey", "supplier_key")
      val f4 = Star.lookupDim(f3, dimN, "n_nationkey", "nation_key")
      val od = col("o_orderdate")
      f4.select(col("l_orderkey"), col("l_linenumber"),
        col("customer_key"), col("part_key"), col("supplier_key"), col("nation_key"),
        (year(od) * 10000 + month(od) * 100 + dayofmonth(od)).as("date_key"),
        col("l_quantity").as("quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    }),
    // §2.1 row 15 — second fact table at orders grain (fact_orders), sharing
    // the customer dimension with the lineitem fact
    "star_orders_fact" -> ((s, d) => {
      val dimC = rankedDim(s, d, "customer", "c_custkey", "customer_key")
      val f = Star.lookupDim(
        Tables.orders(s, d).withColumnRenamed("o_custkey", "c_custkey"),
        dimC, "c_custkey", "customer_key")
      val od = col("o_orderdate")
      f.select(col("o_orderkey"), col("customer_key"),
        (year(od) * 10000 + month(od) * 100 + dayofmonth(od)).as("date_key"),
        col("o_totalprice").as("total_price"), col("o_orderstatus").as("status"))
    }),
    // §2.1 row 15b — inventory-position fact (the reference's stock-level
    // fact fact_kho_nguyen_lieu, create_dwh_tables.sql:180-211): lineitem
    // rows become signed stock movements per (part, supplier) — returns
    // (l_returnflag = 'R') issue stock back out, everything else receives —
    // and the fact carries each movement's running stock balance
    // (key-partitioned cumulative sum, decimal-accumulated), with part and
    // supplier resolved to broadcast surrogate keys like the other facts.
    "star_inventory_fact" -> ((s, d) => {
      val dimP = rankedDim(s, d, "part", "p_partkey", "part_key")
      val dimS = rankedDim(s, d, "supplier", "s_suppkey", "supplier_key")
      val m = Tables.spread(s, d, "lineitem", Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
          col("l_linenumber"), col("l_shipdate"), col("l_quantity"), col("l_returnflag")))
      val f0 = Star.inventoryFact(m,
        Seq("l_partkey", "l_suppkey"),
        Seq("l_shipdate", "l_orderkey", "l_linenumber"),
        when(col("l_returnflag") === "R", -col("l_quantity")).otherwise(col("l_quantity")))
      val f1 = Star.lookupDim(f0.withColumnRenamed("l_partkey", "p_partkey"),
        dimP, "p_partkey", "part_key")
      val f2 = Star.lookupDim(f1.withColumnRenamed("l_suppkey", "s_suppkey"),
        dimS, "s_suppkey", "supplier_key")
      val sd = col("l_shipdate")
      f2.select(col("part_key"), col("supplier_key"),
        (year(sd) * 10000 + month(sd) * 100 + dayofmonth(sd)).as("date_key"),
        col("l_orderkey"), col("l_linenumber"),
        col("qty_delta"), col("stock_balance"))
    }),
    // §2.1 row 15 — analytical rollup over the star
    "star_rollup" -> ((s, d) => {
      val f = Tables.spread(s, d, "lineitem", Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount")))
        .join(Tables.orders(s, d).select(
          col("o_orderkey").as("l_orderkey"), col("o_custkey"), col("o_orderdate")), Seq("l_orderkey"))
        .join(broadcast(Tables.customer(s, d).select(
          col("c_custkey").as("o_custkey"), col("c_mktsegment"))), Seq("o_custkey"))
      f.groupBy(year(col("o_orderdate")).as("year"),
          month(col("o_orderdate")).as("month"),
          col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"))
    }),
    // §2.1 row 16 — SCD Type 2 dimension
    "scd2_dim" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val snap1 = c.select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal"), to_date(lit("2024-01-01")).as("snap_date"))
      val snap2 = c.select(col("c_custkey"), col("c_name"),
        when(col("c_custkey") % 11 === 0, lit("MACHINERY")).otherwise(col("c_mktsegment")).as("c_mktsegment"),
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0).otherwise(col("c_acctbal")).as("c_acctbal"),
        to_date(lit("2024-06-01")).as("snap_date"))
      Star.scd2(snap1.unionByName(snap2), "c_custkey",
        Seq("c_name", "c_mktsegment", "c_acctbal"), "snap_date")
    }),
    // §2.1 row 16b — point-in-time SCD2 resolution: each order joined to the
    // customer-dim VERSION valid at its order date (broadcast version table;
    // the fact side never shuffles). Snapshot dates sit inside the
    // order-date domain (1995-2001) so both versions receive facts.
    "pit_fact" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val snap1 = c.select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        to_date(lit("1995-01-01")).as("snap_date"))
      val snap2 = c.select(col("c_custkey"),
        when(col("c_custkey") % 11 === 0, lit("MACHINERY")).otherwise(col("c_mktsegment")).as("c_mktsegment"),
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0).otherwise(col("c_acctbal")).as("c_acctbal"),
        to_date(lit("1998-01-01")).as("snap_date"))
      val dim = Star.scd2(snap1.unionByName(snap2), "c_custkey",
        Seq("c_mktsegment", "c_acctbal"), "snap_date")
      val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("order_date"))
      Star.pointInTime(orders, dim, "o_custkey", "c_custkey", col("order_date"))
        .select(col("o_orderkey"), col("o_custkey"), col("order_date"),
          col("c_mktsegment"), col("c_acctbal"), col("valid_from"))
    }),
    // §2.1 row 16c — incremental SCD2 apply: a third snapshot (with
    // mutations AND keys the dim has never seen — the %4==0 slice) merges
    // into the live versioned dim; current-slice-only join, one pass.
    "scd2_merge" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val base = c.filter(col("c_custkey") % 4 =!= 0)
      val snap1 = base.select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        to_date(lit("1995-01-01")).as("snap_date"))
      val snap2 = base.select(col("c_custkey"),
        when(col("c_custkey") % 11 === 0, lit("MACHINERY")).otherwise(col("c_mktsegment")).as("c_mktsegment"),
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0).otherwise(col("c_acctbal")).as("c_acctbal"),
        to_date(lit("1998-01-01")).as("snap_date"))
      val dim = Star.scd2(snap1.unionByName(snap2), "c_custkey",
        Seq("c_mktsegment", "c_acctbal"), "snap_date")
      val snap3 = c.select(col("c_custkey"),
        when(col("c_custkey") % 5 === 0, lit("AUTOMOBILE")).otherwise(col("c_mktsegment")).as("c_mktsegment"),
        when(col("c_custkey") % 9 === 0, col("c_acctbal") + 25.0).otherwise(col("c_acctbal")).as("c_acctbal"))
      Star.scd2Merge(dim, snap3, "c_custkey", Seq("c_mktsegment", "c_acctbal"),
        to_date(lit("2001-01-01")))
    }),
    // §2.1 row 19 — warehouse analytics: top-N per group, ROLLUP, as-of,
    // skew-safe salted aggregation
    "topn_per_group" -> ((s, d) =>
      Analytics.topNPerGroup(
        Tables.orders(s, d).select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
        Seq(col("o_orderpriority")), col("o_totalprice"), col("o_orderkey"), 3)),
    // §2.1 row 19 — the same top-N via the custom TypedImperativeAggregate
    // (bounded per-group heaps with map-side partial aggregation: K rows per
    // group cross the shuffle instead of every row)
    "topn_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(graft.functions.TopKAgg.topKPairs(
          struct(col("o_totalprice").as("ord"), col("o_orderkey").as("id")), 3).as("_top"))
        .select(col("o_orderpriority"), posexplode(col("_top")))
        .select(col("o_orderpriority"), col("col.id").as("o_orderkey"),
          col("col.ord").as("o_totalprice"), (col("pos") + 1).cast("int").as("rn"))),
    "rollup_revenue" -> ((s, d) => {
      // spread: heavy per-row pipeline (two joins + 3x Expand) would
      // otherwise run single-core on the one-row-group testdata scan
      val f = Tables.spread(s, d, "lineitem", Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")))
        .join(Tables.orders(s, d).select(
          col("o_orderkey").as("l_orderkey"), col("o_custkey"), col("o_orderdate")), Seq("l_orderkey"))
        .join(broadcast(Tables.customer(s, d).select(
          col("c_custkey").as("o_custkey"), col("c_mktsegment"))), Seq("o_custkey"))
        .select(year(col("o_orderdate")).as("year"), col("c_mktsegment").as("segment"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      Analytics.rollupAgg(f, Seq(col("year"), col("segment")),
        Seq(count(lit(1)).as("n_items"),
          sum(col("rev").cast("decimal(18,4)")).cast("double").as("revenue")))
    }),
    "asof_last_error" -> ((s, d) =>
      Analytics.asOfPrior(Tables.events(s, d).select(
          col("event_id"), col("user_id"), col("ts"), col("event_type")),
        col("user_id"), col("ts"), col("event_id"),
        col("event_type") === "error", col("ts"), "last_error_ts")
        .select(col("event_id"), col("user_id"), col("ts"), col("last_error_ts"))),
    // §2.1 row 19 — range join: assign events to their session intervals
    "range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val sessions = Events.sessionize(ev, 1800L)
        .select(col("user_id"), col("session_id"),
          col("session_start"), col("session_end"))
      Analytics.rangeJoin(
        ev.select(col("event_id"), col("user_id"), col("ts")), sessions,
        col("ts"), col("session_start"), col("session_end"),
        Seq("user_id"), 3600L)
        .select(col("event_id"), col("user_id"), col("session_id"))
    }),
    "salted_agg" -> ((s, d) =>
      Analytics.saltedSumCount(Tables.lineitem(s, d), col("l_returnflag"), "l_returnflag",
        col("l_quantity").cast("decimal(18,2)"), col("l_orderkey"), 16)
        .select(col("l_returnflag"), col("n_rows"), col("sum_value").cast("double").as("sum_qty"))),
    // §2.1 row 19 — skew-safe salted JOIN: probe rows scatter over 8
    // deterministic salt buckets, the dim side replicates across them;
    // result identical to the plain equi-join (the oracle IS the plain join)
    "salted_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        col("l_suppkey").as("suppkey"), col("l_quantity"))
      val sup = Tables.supplier(s, d).select(col("s_suppkey").as("suppkey"),
        col("s_name"), col("s_nationkey"))
      Analytics.saltedJoin(li, sup, "suppkey", col("l_orderkey"), 8)
    }),
    // §2.1 row 20 — incremental upsert-latest merge
    "upsert_latest" -> ((s, d) => {
      val existing = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"), lit(1).as("batch"))
      val updates = Tables.orders(s, d).filter(col("o_orderkey") % 7 === 0).select(
        col("o_orderkey"), (col("o_totalprice") * 1.1).as("o_totalprice"),
        lit("F").as("o_orderstatus"), lit(2).as("batch"))
      // real secondary tie-break (o_totalprice) so ranking stays
      // deterministic even if a batch ever carried duplicate keys
      Star.upsertLatest(existing, updates, "o_orderkey", "batch", "o_totalprice")
    }),
    // §2.1 row 19 — conditional pivot (status columns) + percentile stats
    "pivot_status" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("year"))
        .agg(
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_open"),
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_filled"),
          sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_partial"))),
    "pctl_prices" -> ((s, d) =>
      // exact path for the oracle; the operator's approx=true switch is the
      // 100 TB path (constant-memory GK sketch, spec'd within tolerance)
      Analytics.percentiles(Tables.orders(s, d),
        col("o_orderpriority"), col("o_totalprice"),
        Seq("p50" -> 0.5, "p90" -> 0.9, "p_min" -> 0.0, "p_max" -> 1.0))),
    // §2.1 row 17c — approximate distinct counts (HLL sketch) alongside
    // exact, for monitoring at scales where exact countDistinct is too
    // expensive (rows-only oracle: HLL estimates are engine-specific)
    "approx_stats" -> ((s, d) =>
      Tables.events(s, d).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id"), 0.02).as("n_approx"))),
    // §2.1 row 17e — z-score anomaly flags over hourly per-type volumes
    "anomaly_zscore" -> ((s, d) =>
      Analytics.zScoreAnomalies(
        Events.hourlyAgg(Tables.events(s, d))
          .select(col("hour"), col("event_type"), col("n_events")),
        Seq(col("event_type")), col("n_events"), 2.0)),
    // §2.1 row 17k — robust median/MAD outlier docs per source (round 15):
    // lower-median convention keeps every number an actual data value, so
    // the whole chain replays in SQL with no interpolation anywhere
    "anomaly_mad" -> ((s, d) =>
      Analytics.madOutliers(
        Tables.documents(s, d).where(col("text").isNotNull)
          .select(col("doc_id"), col("source"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
        "source", "doc_id", "n_tokens", 2.0)),
    // §2.1 row 17l — exact two-sample KS drift statistic (round 15)
    // between the even- and odd-id corpus halves' token-count
    // distributions (the decontaminate split convention): identical
    // halves of one corpus ⇒ a small D, a drifted re-crawl ⇒ large
    "ks_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d).where(col("text").isNotNull)
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      Analytics.ksTwoSample(docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1), "n_tokens")
    }),
    // §2.1 row 17l CONTINUOUS form (round 16): events.value is a raw
    // double — exactly the metric whose value domain would make
    // ksTwoSample's ordered frame corpus-sized — so both sides grid onto
    // 1024 shared integer bins from one combined-min/max broadcast first
    // (purchase events vs the rest of the stream).
    "ks_binned" -> ((s, d) => {
      val ev = Tables.events(s, d)
      Analytics.ksBinned(
        ev.where(col("event_type") === "purchase"),
        ev.where(col("event_type") =!= "purchase"), "value", 1024)
    }),
    // §2.1 row 17l continuous GROUPED form (round 16): ksBySource has the
    // same value-domain exposure the two-sample form had — bin once on
    // the global min/max grid, then every event type's value distribution
    // vs the rest of the stream on a ≤ |types|×1024 grid.
    "ks_binned_by_source" -> ((s, d) =>
      Analytics.ksBinnedBySource(Tables.events(s, d), "event_type", "value", 1024)),
    // §2.1 row 17n — Mann–Whitney U rank-sum drift (round 16, third
    // session): the LOCATION companion to ks_drift's shape statistic on
    // the SAME even/odd corpus split — tie-exact integer midranks off the
    // (value, count) histogram, tie-corrected normal z
    "mann_whitney" -> ((s, d) => {
      val docs = Tables.documents(s, d).where(col("text").isNotNull)
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      Analytics.mannWhitneyU(docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1), "n_tokens")
    }),
    // §2.1 row 17o — Population Stability Index (round 16, third
    // session): the production scorecard-drift metric on the ks_binned
    // grid (purchase events' value distribution vs the rest), Jeffreys
    // add-1/2 smoothing over the occupied-union bins
    "psi_drift" -> ((s, d) => {
      val ev = Tables.events(s, d)
      Analytics.psiBinned(
        ev.where(col("event_type") === "purchase"),
        ev.where(col("event_type") =!= "purchase"), "value", 64)
    }),
    // §2.1 row 17o grouped form — every event type's value distribution
    // vs the rest in ONE set-based plan (the ksBySource discipline)
    "psi_by_source" -> ((s, d) =>
      Analytics.psiBinnedBySource(Tables.events(s, d), "event_type", "value", 64)),
    // §2.1 row 17p — daily-series autocorrelation (round 16, third
    // session): r_1..r_14 of the gap-filled daily event-value totals —
    // the weekly-seasonality diagnostic (lag 7) the smoothers can't give
    "acf_daily" -> ((s, d) =>
      Analytics.acfDaily(Tables.events(s, d), col("ts"), col("value"), 14)),
    // §2.1 row 17p (r17 tier 2) — Ljung-Box whiteness DECISION over the
    // same 14-lag ACF; χ²(0.95, 14) pinned as a 6dp literal on both
    // engines (the Benford convention — no engine evaluates a quantile)
    "ljung_box" -> ((s, d) =>
      Analytics.ljungBoxDaily(Tables.events(s, d), col("ts"), col("value"),
        14, LjungBoxCrit14)),
    // §2.1 row 17p (r17 tier 3) — Wald-Wolfowitz runs test: the
    // SIGN-pattern randomness companion (clustering vs oscillation of
    // above/below-median days)
    "runs_test" -> ((s, d) =>
      Analytics.runsTestDaily(Tables.events(s, d), col("ts"), col("value"))),
    // §2.1 row 17q — CUSUM level-shift localization (round 16, third
    // session): argmax |Σ(x−x̄)| over the same daily series + the
    // normalized max statistic (Brownian-bridge bound)
    "cusum_daily" -> ((s, d) =>
      Analytics.cusumDaily(Tables.events(s, d), col("ts"), col("value"))),
    // §2.1 row 17r — delete-one-group jackknife (round 16, third
    // session): the corpus mean token count WITH its error bar — groups
    // (sources) are the exchangeable unit of a crawled corpus, so
    // delete-a-group is the honest replication estimator
    "jackknife_mean" -> ((s, d) =>
      Analytics.jackknifeMean(
        Tables.documents(s, d).where(col("text").isNotNull)
          .select(col("source"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
        "source", "n_tokens")),
    // §2.1 row 17t — Poissonized bootstrap CI (round 16, third session):
    // the resampling companion to the jackknife — md5-coin Poisson(1)
    // multiplier weights, exact order-statistic CI, fully oracled
    // despite being "random"
    "bootstrap_ci" -> ((s, d) =>
      Analytics.bootstrapMeanCi(
        Tables.documents(s, d).where(col("text").isNotNull)
          .select(col("doc_id"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", 40)),
    // §2.1 row 17s — day-of-week seasonal profile (round 16, third
    // session): the calendar structure acf_daily detects (the lag-7
    // spike) made legible — per-ISO-weekday mean daily value and share
    "dow_profile" -> ((s, d) =>
      Analytics.dowProfile(Tables.events(s, d), col("ts"), col("value"))),
    // §2.1 row 17l grouped form — each source's token-count distribution
    // vs the REST of the corpus, one set-based plan (spec-pinned equal to
    // the two-sample statistic per source)
    "ks_by_source" -> ((s, d) =>
      Analytics.ksBySource(
        Tables.documents(s, d).where(col("text").isNotNull)
          .select(col("source"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
        "source", "n_tokens")),
    // §2.1 rows 3, 18 — event routing / sessionization / windowed agg
    "event_route" -> ((s, d) => Events.routeStats(Tables.events(s, d))),
    "sessionize" -> ((s, d) => Events.sessionize(Tables.events(s, d), 1800L)),
    "window_agg" -> ((s, d) => Events.hourlyAgg(Tables.events(s, d))),
    // §2.1 row 18b — Markov transition matrix of the event stream (the
    // path-discovery complement of the fixed-step funnel): one user_id
    // window pass, then a types^2-sized aggregate
    "event_transitions" -> ((s, d) => Events.transitions(Tables.events(s, d))),
    // §2.1 row 18c — random-surfer centrality over the transition graph
    // (integer fixed-point power iteration, bit-exact cross-engine)
    "event_pagerank" -> ((s, d) => Events.pageRank(Tables.events(s, d))),
    // §2.2 row 19 — exact dedup
  )
}
