package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.IngestDiscovery

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory
  * each query key maps to. Every SQL-expressible operator has a matching
  * `oracleSql` entry (DuckDB dialect) with IDENTICAL output column aliases;
  * aggregates that sum floating columns go through exact DECIMAL sums cast
  * back to DOUBLE so Spark and DuckDB produce bit-identical values
  * regardless of accumulation order.
  */
object SparkEntry {

  // ---- two-source simulation (SURVEY §3): deterministic slices of customer
  // with a deterministic mutation on the "SQL" side, so merge/recon/SCD2
  // queries have reproducible overlap and diffs at every SF.
  private def srcA(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).filter(col("c_custkey") % 3 =!= 0)

  private def srcB(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).filter(col("c_custkey") % 2 =!= 0)
      .withColumn("c_name",
        when(col("c_custkey") % 10 === 1, upper(col("c_name"))).otherwise(col("c_name")))
      .withColumn("c_acctbal",
        when(col("c_custkey") % 13 === 0, col("c_acctbal") + 50.0).otherwise(col("c_acctbal")))

  private val SrcCte =
    """WITH src_a AS (SELECT * FROM customer WHERE c_custkey % 3 <> 0),
      |src_b AS (SELECT c_custkey,
      |    CASE WHEN c_custkey % 10 = 1 THEN upper(c_name) ELSE c_name END AS c_name,
      |    c_nationkey,
      |    CASE WHEN c_custkey % 13 = 0 THEN c_acctbal + 50.0 ELSE c_acctbal END AS c_acctbal,
      |    c_mktsegment
      |  FROM customer WHERE c_custkey % 2 <> 0)""".stripMargin

  // ---- dirty-orders simulation for the quality engine: deterministic
  // violations (null FK, nonpositive price, bad status, duplicated keys).
  // Pinned weight vector for quality_classify: w(b) = (b·2654435761 mod
  // 2^32)/2^32 − 0.5, a dyadic rational per bucket (denominator 2^32), so
  // every per-doc partial sum is EXACT in IEEE double and the logit
  // replays bit-identically from integer arithmetic in the oracle. A
  // trained parameter vector drops in through the same element_at carrier.
  private val classifierWeights: Array[Double] = Array.tabulate(1024) { b =>
    ((b.toLong * 2654435761L) % 4294967296L).toDouble / 4294967296.0 - 0.5
  }

  private def dirtyOrders(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir).select(
      col("o_orderkey"),
      when(col("o_orderkey") % 97 === 0, lit(null))
        .when(col("o_orderkey") % 79 === 0, lit(-1L))
        .otherwise(col("o_custkey")).as("o_custkey"),
      when(col("o_orderkey") % 89 === 0, -col("o_totalprice")).otherwise(col("o_totalprice")).as("o_totalprice"),
      when(col("o_orderkey") % 83 === 0, lit("X")).otherwise(col("o_orderstatus")).as("o_orderstatus"),
      lit(0).as("src"))
    base.unionByName(base.filter(col("o_orderkey") % 101 === 0).withColumn("src", lit(1)))
  }

  private val DirtyCte =
    """WITH base AS (SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 97 = 0 THEN NULL
      |         WHEN o_orderkey % 79 = 0 THEN -1 ELSE o_custkey END AS o_custkey,
      |    CASE WHEN o_orderkey % 89 = 0 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice,
      |    CASE WHEN o_orderkey % 83 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
      |    0 AS src FROM orders),
      |dirty AS (SELECT * FROM base
      |  UNION ALL SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, 1 AS src
      |  FROM base WHERE o_orderkey % 101 = 0),
      |flagged AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY src) AS rn FROM dirty),
      |annotated AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, src,
      |  concat_ws(' | ',
      |    CASE WHEN o_custkey IS NULL THEN 'null_custkey' END,
      |    CASE WHEN o_custkey IS NOT NULL
      |          AND o_custkey NOT IN (SELECT c_custkey FROM customer) THEN 'fk_customer' END,
      |    CASE WHEN o_totalprice <= 0 THEN 'nonpositive_price' END,
      |    CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 'bad_status' END,
      |    CASE WHEN rn > 1 THEN 'duplicate_key' END) AS _errors
      |  FROM flagged)""".stripMargin

  // ---- deterministically-dirtied §3 entities for the CATALOG audit
  // (quality_catalog): each entity gets its full reference rule set
  // (Quality.Catalogs) instantiated; dirt moduli are primes chosen so every
  // rule fires at the oracle scale. Synthetic contact columns (c_email,
  // c_phone, s_phone) mirror the reference's khach_hang sdt/email fields
  // (data_transformer.py:30-40), which the TPC-H-ish testdata lacks.
  private def catalogCustomer(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      when(col("c_custkey") % 113 === 0, lit(null)).otherwise(col("c_custkey")).as("c_custkey"),
      when(col("c_custkey") % 107 === 0, lit("  "))
        .when(col("c_custkey") % 149 === 0, rpad(col("c_name"), 40, "x"))
        .otherwise(col("c_name")).as("c_name"),
      when(col("c_custkey") % 109 === 0, lit("bad email"))
        .otherwise(concat(lit("cust"), col("c_custkey").cast("string"), lit("@shop.vn")))
        .as("c_email"),
      when(col("c_custkey") % 127 === 0,
          concat(lit("x"), lpad(col("c_custkey").cast("string"), 8, "0")))
        .otherwise(lpad(col("c_custkey").cast("string"), 8, "0")).as("c_phone"),
      when(col("c_custkey") % 131 === 0, col("c_acctbal") + 20000)
        .otherwise(col("c_acctbal")).as("c_acctbal"),
      when(col("c_custkey") % 137 === 0, lit("UNKNOWN"))
        .otherwise(col("c_mktsegment")).as("c_mktsegment"),
      when(col("c_custkey") % 139 === 0, lit(99))
        .otherwise(col("c_nationkey")).as("c_nationkey"))

  private def catalogOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      when(col("o_orderkey") % 97 === 0, lit(null))
        .when(col("o_orderkey") % 79 === 0, lit(-1L))
        .otherwise(col("o_custkey")).as("o_custkey"),
      when(col("o_orderkey") % 89 === 0, -col("o_totalprice"))
        .otherwise(col("o_totalprice")).as("o_totalprice"),
      when(col("o_orderkey") % 83 === 0, lit("X"))
        .otherwise(col("o_orderstatus")).as("o_orderstatus"),
      when(col("o_orderkey") % 103 === 0, to_timestamp(lit("2099-01-01")))
        .otherwise(col("o_orderdate")).as("o_orderdate"),
      when(col("o_orderkey") % 71 === 0, lit("9-BOGUS"))
        .otherwise(col("o_orderpriority")).as("o_orderpriority"))

  private def catalogPart(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(
      col("p_partkey"),
      when(col("p_partkey") % 67 === 0, lit("")).otherwise(col("p_name")).as("p_name"),
      when(col("p_partkey") % 59 === 0, lit("brandX")).otherwise(col("p_brand")).as("p_brand"),
      when(col("p_partkey") % 53 === 0, lit(null)).otherwise(col("p_type")).as("p_type"),
      when(col("p_partkey") % 73 === 0, lit(999)).otherwise(col("p_size")).as("p_size"),
      when(col("p_partkey") % 61 === 0, lit(0.0)).otherwise(col("p_retailprice")).as("p_retailprice"))

  private def catalogNation(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir).select(
      when(col("n_nationkey") % 7 === 0, lit(null)).otherwise(col("n_nationkey")).as("n_nationkey"),
      when(col("n_nationkey") % 5 === 0, lit(" "))
        .when(col("n_nationkey") % 11 === 0, lower(col("n_name")))
        .when(col("n_nationkey") % 13 === 0, rpad(col("n_name"), 30, "X"))
        .otherwise(col("n_name")).as("n_name"),
      when(col("n_nationkey") % 17 === 0, lit(99)).otherwise(col("n_regionkey")).as("n_regionkey"))

  private def catalogInventory(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      when(col("l_orderkey") % 43 === 0, lit(null)).otherwise(col("l_partkey")).as("l_partkey"),
      when(col("l_orderkey") % 23 === 0, lit(999999L)).otherwise(col("l_suppkey")).as("l_suppkey"),
      when(col("l_orderkey") % 19 === 0, lit(999.0)).otherwise(col("l_quantity")).as("l_quantity"),
      when(col("l_orderkey") % 29 === 0, lit("X")).otherwise(col("l_returnflag")).as("l_returnflag"),
      when(col("l_orderkey") % 31 === 0, lit("Z")).otherwise(col("l_linestatus")).as("l_linestatus"),
      when(col("l_orderkey") % 37 === 0, lit(0.9)).otherwise(col("l_discount")).as("l_discount"),
      when(col("l_orderkey") % 41 === 0, -col("l_extendedprice"))
        .otherwise(col("l_extendedprice")).as("l_extendedprice"))

  private def catalogSupplier(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir).select(
      col("s_suppkey"),
      when(col("s_suppkey") % 29 === 0, lit(" ")).otherwise(col("s_name")).as("s_name"),
      when(col("s_suppkey") % 17 === 0, lit("abc"))
        .otherwise(concat(lit("84-"), lpad(col("s_suppkey").cast("string"), 7, "0")))
        .as("s_phone"),
      when(col("s_suppkey") % 19 === 0, col("s_acctbal") + 20000)
        .otherwise(col("s_acctbal")).as("s_acctbal"),
      when(col("s_suppkey") % 23 === 0, lit(99))
        .otherwise(col("s_nationkey")).as("s_nationkey"))

  private def annotatedOrders(s: SparkSession, dir: String): DataFrame = {
    val (addRn, dupRule) = Quality.duplicateKeyRule("duplicate_key", col("o_orderkey"), Seq(col("src")))
    val (addFk, fkCustRule) = Quality.fkRule("fk_customer", col("o_custkey"),
      Tables.customer(s, dir), "c_custkey")
    val rules = Seq(
      Quality.Rule("null_custkey", col("o_custkey").isNull),
      fkCustRule,
      Quality.Rule("nonpositive_price", col("o_totalprice") <= 0),
      Quality.Rule("bad_status", !col("o_orderstatus").isin("O", "F", "P")),
      dupRule)
    Quality.annotate(addFk(addRn(dirtyOrders(s, dir))), rules)
      .drop("_rn_duplicate_key", "_fk_ok_fk_customer")
  }

  // Dual-format dispatch (data_transformer.py:117-140 transform_mon): detect
  // the CSV shape by its distinguishing column and map to canonical schema.
  private def dispatchMon(df: DataFrame): DataFrame =
    if (df.columns.contains("ten_san_pham"))
      df.select(col("id"), trim(col("ten_san_pham")).as("ten_mon"),
        lit(null).cast("int").as("loai_id"), col("gia"), lit("csv").as("fmt"))
    else
      df.select(col("id"), trim(col("ten_mon")).as("ten_mon"),
        col("loai_id").cast("int").as("loai_id"), col("gia"), lit("sql").as("fmt"))

  // Dedup corpus: documents plus shifted duplicate copies, so exact-dedup has
  // non-trivial clusters (driver data is duplicate-free by construction).
  /** dedup_substr's minimum duplicated-run length in tokens — interpolated
    * into BOTH the Spark call and the DuckDB replay (the Bpe shared-
    * constant discipline). */
  private val SubstrRun = 8

  /** The C1 control planted for mojibake_gate's c1_cnt — U+0091 (cp1252
    * left-quote read as Latin-1), deliberately NOT one of Java's line
    * terminators (U+0085 would make `.` semantics diverge between Java
    * regex and RE2). Interpolated into BOTH the Spark plant and the
    * DuckDB oracle so the bytes are identical. */
  private val MojiC1 = "\u0091"

  /** mojibake_gate's planted artifact strings — shared constants so the
    * Spark plant and the DuckDB oracle interpolate IDENTICAL bytes
    * (explicit escapes; raw control chars in source are edit hazards). */
  private val MojiPlant17 = " caf\u00c3\u00a9 d\u00c3\u00a9j\u00c3\u00a0 vu"
  private val MojiPlant19 = " bad \ufffd\ufffd data"
  private val MojiPlant23 = " quote \u00e2\u20ac\u2122 mark \u00c2 tail " + MojiC1 + "end"

  /** script_profile's planted script samples — Cyrillic / Han+digits /
    * Arabic / accented-Latin, all code points whose script assignment
    * predates Unicode 3.0 (stable across the engines' Unicode tables);
    * shared constants so both engines see identical bytes. */
  private val ScriptPlant29 = " Привет мир"
  private val ScriptPlant31 = " 中文数据 123"
  private val ScriptPlant37 = " مرحبا بالعالم"
  private val ScriptPlant41 = " café déjà vu naïve"

  /** χ²(0.95, df = 14) to 6dp — the ljung_box rejection bound, pinned as
    * the SAME literal in the Spark plan and the DuckDB oracle so neither
    * engine evaluates a chi-square quantile (the Benford convention). */
  private val LjungBoxCrit14 = 23.684791

  private def dedupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.unionByName(d.filter(col("doc_id") % 20 === 0)
      .withColumn("doc_id", col("doc_id") + 100000))
  }

  private val CorpusCte =
    """WITH corpus AS (SELECT * FROM documents
      |  UNION ALL SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
      |  FROM documents WHERE doc_id % 20 = 0)""".stripMargin

  /** CDC rolling-chain replay, shared by the `dedup_cdc` and
    * `boilerplate_scrub` oracles: MD5 token hashes fold through the same
    * wrapping rolling chain as the winnow oracle (HUGEINT mod 2^64); the
    * low-bit boundary predicate (`g % maskMod`, maskMod = 2^maskBits)
    * reads only bits signed wrap preserves, so no re-signing is needed.
    * Emits CTEs (no leading WITH) ending in
    * `f(doc_id, n_total, pos, chunk)` — one row per content-defined
    * chunk of `src`, in document order. */
  private def cdcChainCtes(src: String, maskMod: Int): String =
    s"""tw AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM $src),
       |th AS (SELECT doc_id, toks,
       |    [CAST(('0x' || substr(md5(t), 1, 16))::UBIGINT AS HUGEINT) for t in toks] AS h
       |  FROM tw WHERE len(toks) > 0),
       |kg AS (SELECT doc_id, toks,
       |    CASE WHEN len(h) >= 4 THEN
       |      [list_reduce(h[i:i+3], (a, b) -> (a * 1000003 + b) % 18446744073709551616)
       |       for i in range(1, len(h) - 2)]
       |    ELSE CAST([] AS HUGEINT[]) END AS g
       |  FROM th),
       |bnd AS (SELECT doc_id, toks,
       |    list_append(list_prepend(0,
       |      list_filter([CASE WHEN g[i] % $maskMod = 0 AND i + 3 < len(toks) THEN i + 3 END
       |                   for i in range(1, len(g) + 1)], x -> x IS NOT NULL)),
       |      len(toks)) AS b
       |  FROM kg),
       |chs AS (SELECT doc_id,
       |    [array_to_string(toks[b[j] + 1 : b[j + 1]], ' ') for j in range(1, len(b))] AS cs
       |  FROM bnd),
       |e AS (SELECT doc_id, len(cs) AS n_total,
       |    unnest([{'p': j - 1, 'c': cs[j]} for j in range(1, len(cs) + 1)]) AS u
       |  FROM chs),
       |f AS (SELECT doc_id, n_total, CAST(u.p AS INT) AS pos, u.c AS chunk FROM e)""".stripMargin

  // Embedding near-dup corpus: embeddings plus planted duplicates — exact
  // copies (cos = 1.0) and single-component perturbations (cos ≈ 0.999) —
  // so the near-dup gates verify real pairs instead of an empty result.
  // All math runs on array<double> in BOTH engines so values hash-match.
  // ONE source of truth for the plant recipe: `withLabel = true` carries
  // the label column through (the semantic_dedup cluster key; copies
  // inherit their source's label) — both the Scala and the SQL corpus are
  // built from the same construction, never re-implemented per query.
  private def embCorpus(s: SparkSession, dir: String,
                        withLabel: Boolean = false): DataFrame = {
    val cols = Seq(col("vec_id"), col("embedding").cast("array<double>").as("embedding")) ++
      (if (withLabel) Seq(col("label")) else Nil)
    val e = Tables.embeddings(s, dir).select(cols: _*)
    val keep = e.columns.drop(1).toIndexedSeq.map(col)
    val copies = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id") +: keep: _*)
    val perturbed = e.filter(col("vec_id") % 10 === 5)
      .select(Seq((col("vec_id") + 200000).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) * 1.5),
          slice(col("embedding"), 2, 63)).as("embedding")) ++
        (if (withLabel) Seq(col("label")) else Nil): _*)
    e.unionByName(copies).unionByName(perturbed)
  }

  private def embCorpusCte(withLabel: Boolean): String = {
    val lbl = if (withLabel) ", label" else ""
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v$lbl FROM embeddings),
       |emb_corpus AS (SELECT vec_id, v$lbl FROM base
       |  UNION ALL SELECT vec_id + 100000 AS vec_id, v$lbl FROM base WHERE vec_id % 10 = 0
       |  UNION ALL SELECT vec_id + 200000 AS vec_id,
       |    list_concat([v[1] * 1.5], v[2:64]) AS v$lbl FROM base WHERE vec_id % 10 = 5)""".stripMargin
  }
  private val EmbCorpusCte = embCorpusCte(withLabel = false)

  private val Stop = TextAnalysis.EnStop.mkString("('", "','", "')")

  /** Shared by `source_overlap` and `source_overlap_hashed`: the hashed
    * variant's output is hash-independent (pair counts and Jaccard over the
    * same vocabulary sets), so one exact-string oracle gates both paths. */
  private val SourceOverlapSql =
    """WITH toks AS (SELECT source, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |sh AS (SELECT DISTINCT source, g
      |  FROM toks, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS t(g)
      |  WHERE len(w) >= 2),
      |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY source),
      |common AS (SELECT a.source AS source_a, b.source AS source_b,
      |    CAST(count(*) AS BIGINT) AS n_common
      |  FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT c.source_a, c.source_b, sa.n AS n_a, sb.n AS n_b, c.n_common,
      |  round(CAST(c.n_common AS DOUBLE) / (sa.n + sb.n - c.n_common), 6) AS jaccard
      |FROM common c
      |JOIN sizes sa ON sa.source = c.source_a
      |JOIN sizes sb ON sb.source = c.source_b""".stripMargin

  /** Shared by `setsim_join` and `setsim_join_hashed`: PPJoin promises the
    * EXACT threshold-join result, so the oracle is the all-pairs brute
    * force — completeness is the contract, and the hashed carrier's output
    * is key-representation-independent (verify scores true shingle arrays). */
  private val ContainmentJoinSql =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |sh AS (SELECT doc_id,
      |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
      |  FROM toks WHERE len(w) >= 3),
      |pairs AS (SELECT a.doc_id AS doc_sub, b.doc_id AS doc_sup,
      |    round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s), 6) AS containment
      |  FROM sh a JOIN sh b ON a.doc_id != b.doc_id)
      |SELECT doc_sub, doc_sup, containment FROM pairs WHERE containment >= 0.6""".stripMargin

  private val SetSimJoinSql =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |sh AS (SELECT doc_id,
      |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
      |  FROM toks WHERE len(w) >= 3),
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.5""".stripMargin

  /** Shared by `embedding_cov` and `embedding_cov_hd`: the two Spark paths
    * (pair explode vs the fixed-buffer CovOuterSumAgg) are bit-identical by
    * construction, so one full-matrix oracle gates both. */
  private val EmbeddingCovSql =
    """WITH u AS (SELECT vec_id, unnest(
      |    [{'i': i - 1, 'x': CAST(embedding[i] AS DOUBLE)}
      |     for i in range(1, len(embedding) + 1)]) AS e FROM embeddings),
      |m AS (SELECT vec_id, e.i AS i, e.x AS x FROM u),
      |p AS (SELECT a.i AS i, b.i AS j, a.x AS xi, b.x AS xj
      |  FROM m a JOIN m b ON a.vec_id = b.vec_id AND b.i >= a.i),
      |agg AS (SELECT i, j, count(*) AS n,
      |    SUM(CAST(xi * xj AS DECIMAL(28,12))) AS sxy,
      |    SUM(CAST(xi AS DECIMAL(28,12))) AS sx,
      |    SUM(CAST(xj AS DECIMAL(28,12))) AS sy
      |  FROM p GROUP BY i, j)
      |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
      |  CAST(n AS BIGINT) AS n_vecs,
      |  round(CAST(sxy AS DOUBLE) / n
      |    - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n), 6) + 0.0 AS cov
      |FROM agg""".stripMargin

  /** Bit-exact replay of Similarity.pcaPowerFixed (VERDICT r17 #1): the
    * k×rounds fixed-point power-iteration steps unroll as chained CTEs
    * over the integerized 6dp covariance (cov6 = round(cov·1e6) of the
    * SAME covariance EmbeddingCovSql already gates), every step exact
    * HUGEINT arithmetic with CASE-signed truncating division (DuckDB's
    * bare `//` floors, Spark-side BigInt truncates — the signs differ on
    * negative numerators, so every division decomposes through ABS; the
    * event_pagerank discipline one tier up in width). Renormalization is
    * max-|component| to exactly ±1e6 — no sqrt, no float after cov6. */
  private val EmbeddingPcaSql: String = {
    val (k, rounds) = (4, 12)
    def sdiv(num: String, den: String): String =
      s"CASE WHEN ($den) = 0 THEN CAST(0 AS HUGEINT) " +
        s"WHEN ($num) >= 0 THEN ($num) // ($den) " +
        s"ELSE -((-($num)) // ($den)) END"
    val comps = (0 until k).map { c =>
      val steps = (1 to rounds).map { r =>
        s"""w_${c}_$r AS MATERIALIZED (SELECT m.i, SUM(m.c * v.v) AS w
           |  FROM m_$c m JOIN v_${c}_${r - 1} v ON m.j = v.i GROUP BY m.i),
           |v_${c}_$r AS MATERIALIZED (SELECT w.i,
           |    CASE WHEN mx.mx = 0 THEN CAST(0 AS HUGEINT)
           |      WHEN w.w >= 0 THEN (w.w * 1000000) // mx.mx
           |      ELSE -((-(w.w) * 1000000) // mx.mx) END AS v
           |  FROM w_${c}_$r w, (SELECT MAX(ABS(w)) AS mx FROM w_${c}_$r) mx)""".stripMargin
      }.mkString(",\n")
      val deflate =
        if (c == k - 1) ""
        else s""",
           |m_${c + 1} AS MATERIALIZED (SELECT m.i, m.j,
           |    m.c - ${sdiv("l.lam * vi.v * vj.v", "s.s")} AS c
           |  FROM m_$c m JOIN v_${c}_$rounds vi ON vi.i = m.i
           |    JOIN v_${c}_$rounds vj ON vj.i = m.j, lam_$c l, s_$c s)""".stripMargin
      s"""v_${c}_0 AS MATERIALIZED (SELECT i, CAST(1000000 AS HUGEINT) AS v FROM dims),
         |$steps,
         |wf_$c AS MATERIALIZED (SELECT m.i, SUM(m.c * v.v) AS w
         |  FROM m_$c m JOIN v_${c}_$rounds v ON m.j = v.i GROUP BY m.i),
         |s_$c AS MATERIALIZED (SELECT SUM(v * v) AS s FROM v_${c}_$rounds),
         |n_$c AS MATERIALIZED (SELECT SUM(v.v * w.w) AS n
         |  FROM v_${c}_$rounds v JOIN wf_$c w ON v.i = w.i),
         |lam_$c AS MATERIALIZED (SELECT ${sdiv("n.n", "s.s")} AS lam FROM n_$c n, s_$c s)$deflate""".stripMargin
    }.mkString(",\n")
    val tail = (0 until k).map { c =>
      s"""SELECT CAST($c AS INT) AS component, CAST(v.i AS INT) AS dim_idx,
         |  CAST(v.v AS BIGINT) AS loading6, CAST(l.lam AS BIGINT) AS lambda6
         |FROM v_${c}_$rounds v, lam_$c l""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH cov AS MATERIALIZED (
       |$EmbeddingCovSql
       |),
       |c6 AS MATERIALIZED (SELECT i, j,
       |    CAST(CAST(round(cov * 1000000) AS BIGINT) AS HUGEINT) AS c FROM cov),
       |m_0 AS MATERIALIZED (SELECT i, j, c FROM c6
       |  UNION ALL SELECT j AS i, i AS j, c FROM c6 WHERE i <> j),
       |dims AS MATERIALIZED (SELECT DISTINCT i FROM m_0),
       |$comps
       |$tail""".stripMargin
  }

  /** IVF centroids trained once per testdata dir and shared across the
    * queries that search the embeddings corpus (`ann_ivf`, `ann_recall`) —
    * training is deterministic in (data, numCells), so caching by dir is
    * exact, and the recall gate no longer re-runs the training jobs
    * `ann_ivf` already paid for. */
  private val ivfCentroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(Int, Array[Double])]]()
  private def ivfCentroids(s: SparkSession, dir: String): Array[(Int, Array[Double])] =
    ivfCentroidCache.computeIfAbsent(dir, _ =>
      Similarity.trainCentroids(
        Tables.embeddings(s, dir).filter(col("vec_id") >= 5), "vec_id", "embedding"))

  /** PQ codebooks trained once per testdata dir and shared by `ann_pq` and
    * the `ann_recall` gate — the ivfCentroids discipline: train once,
    * search many. */
  private val pqBookCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Double]]]]()
  private def pqBooks(s: SparkSession, dir: String): Array[Array[Array[Double]]] =
    pqBookCache.computeIfAbsent(dir, _ =>
      Similarity.pqTrain(
        Tables.embeddings(s, dir).filter(col("vec_id") >= 5), "vec_id", "embedding",
        m = 8, ksub = 16))

  /** Residual PQ codebooks (trained on x − centroid(cell), sharing the IVF
    * centroids) — once per dir, shared by `ann_ivfpq_res` and `ann_recall`. */
  private val pqResBookCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Double]]]]()
  private def pqResBooks(s: SparkSession, dir: String): Array[Array[Array[Double]]] =
    pqResBookCache.computeIfAbsent(dir, _ =>
      Similarity.pqTrainResidual(
        Tables.embeddings(s, dir).filter(col("vec_id") >= 5), "vec_id", "embedding",
        ivfCentroids(s, dir), m = 8, ksub = 16))

  /** Surrogate-keyed dimensions built once per testdata dir and SHARED
    * across the star queries — exactly the reference DWH's shape, where the
    * dimension tables are materialized once and both facts resolve against
    * them (create_dwh_tables.sql: dims precede facts). `localCheckpoint`
    * materializes the tiny ranked dim at first use so later facts skip the
    * distinct+rank subtree entirely. */
  private val dimCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def rankedDim(s: SparkSession, d: String, table: String,
                        naturalKey: String, keyName: String): DataFrame =
    dimCache.computeIfAbsent(s"${s.hashCode}:$d:$naturalKey", _ =>
      Star.withSurrogateKey(
        Tables.load(s, d, table).select(col(naturalKey)), naturalKey, keyName)
        .localCheckpoint())

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("star_rollup")(spark, "/root/testdata/sf0.001")

  /** Zone root for the end-to-end pipeline queries: under the JVM temp dir
    * (the PipelineSpec temp-dir precedent), keyed by pipeline flavor AND sf
    * dir so scales never share zone state; a FIXED path (not
    * createTempDirectory) so reruns overwrite idempotently — combined with
    * the fixed runId and `_run_id`-partitioned dynamic overwrite, repeated
    * runs of the same (flavor, sf) are byte-stable, never accumulating. */
  private def zoneRoot(flavor: String, sfDir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${flavor}_zones_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")

  /** The exact end-to-end pipeline invocations behind `pipeline_report` /
    * `corpus_report` — factored out so Bench's stage-detail phase times the
    * IDENTICAL runs the correctness gate verifies. Both return the
    * (stage, rows, seconds) report. Parameter choices: corpus thresholds
    * match the standalone operators' oracled constants (gate 30/0.05/0.2,
    * near-dup 3-shingle 0.8, 20-token spans, 32 BPE merges, CCNet
    * terciles); capPerSource 120 binds at sf0.1 (~150 gated docs in the
    * largest sources) and is a verified no-op below. semantic_dedup is the
    * one optional stage left out: its derived-IVF-cell variant is
    * spec-gated (PipelineSpec), not SQL-replayable. */
  def runDwhPipeline(s: SparkSession, d: String): DataFrame =
    Pipeline.runAll(s, d, zoneRoot("dwh", d), "report_run")

  def runCorpusPipeline(s: SparkSession, d: String): DataFrame =
    CorpusPipeline.runAll(s, Tables.documents(s, d), zoneRoot("corpus", d),
      "report_run", capPerSource = 120, numShards = 4,
      spanScrub = Some(20), bpeMerges = Some(32), pplBuckets = Some(3))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    "edit_join" -> ((s, d) =>
      MultiSource.editJoin(
        Tables.supplier(s, d).select(col("s_suppkey"), col("s_name")),
        "s_suppkey", "s_name", 1)),
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
    "dedup_exact" -> ((s, d) => Dedup.exactDedupByHash(dedupCorpus(s, d), "doc_id", "text")),
    "dedup_stats" -> ((s, d) => Dedup.dedupStats(dedupCorpus(s, d), "doc_id", "text")),
    // §2.2 row 19b — span-level exact dedup (Lee et al. ExactSubstr at
    // fixed-span granularity): repeated 20-token spans keep only their
    // first corpus occurrence; docs reassembled from surviving spans
    "dedup_span" -> ((s, d) => Dedup.spanDedup(dedupCorpus(s, d), "doc_id", "text", 20)),
    // §2.2 row 19c — CDC span dedup: content-defined chunk boundaries
    // (rolling 4-gram hash, low-5-bit mask => ~32-token chunks), so
    // duplicated passages dedup at ANY offset — spanDedup's documented
    // miss class. MD5 token hash => the rolling chain replays in DuckDB.
    "dedup_cdc" -> ((s, d) =>
      Dedup.cdcDedup(dedupCorpus(s, d), "doc_id", "text", 4, 5, md5Hash = true)),
    // §2.2 row 19e — arbitrary-offset EXACT-SUBSTRING dedup (the true
    // ExactSubstr tier, Lee et al. 2022): ANY duplicated run >= 8 tokens
    // is cut at ANY offset — no span grid (dedup_span's miss), no
    // chunk-boundary requirement (dedup_cdc's miss). Overlapping 8-gram
    // md5 keys, first-occurrence keep, interval-merge gap reassembly;
    // md5 => every cut replays verbatim in DuckDB.
    "dedup_substr" -> ((s, d) =>
      Dedup.substrDedup(dedupCorpus(s, d), "doc_id", "text", SubstrRun,
        md5Hash = true)),
    // §2.2 row 19d — boilerplate scrub: CDC chunks at the ~4-token scale
    // occurring in >= 3 DISTINCT docs are template noise and drop from
    // EVERY doc (no canonical first copy — the CCNet/RefinedWeb
    // discipline, vs dedup_cdc's keep-first). Plain documents: natural
    // cross-doc fragment repeats are exactly the boilerplate signal.
    "boilerplate_scrub" -> ((s, d) =>
      Dedup.boilerplateScrub(Tables.documents(s, d), "doc_id", "text", 4, 2, 3,
        md5Hash = true)),
    // §2.2 row 20 — MinHash LSH near-dedup (banded, verified)
    "neardup_minhash" -> ((s, d) =>
      Dedup.nearDupMinHash(Tables.documents(s, d), "doc_id", "text", 3, 0.8)),
    // §2.2 row 20g — EXACT set-similarity self-join (AllPairs/PPJoin prefix
    // filter): complete at J >= 0.5, a threshold where 32x4 MinHash banding
    // would miss ~13% of true pairs. Never all-pairs: candidates only form
    // inside prefix-shingle buckets (rarest-first global order).
    "setsim_join" -> ((s, d) =>
      Dedup.setSimJoin(Tables.documents(s, d), "doc_id", "text", 3, 1, 2)),
    // §2.2 row 20g, petabyte carrier: xxhash64 shingle keys map-side, so
    // the df aggregate, window pass, and prefix self-join all shuffle
    // 8-byte longs instead of n-gram strings; verify runs on true shingle
    // arrays, so it answers to the exact-string oracle verbatim (the
    // source_overlap_hashed discipline).
    "setsim_join_hashed" -> ((s, d) =>
      Dedup.setSimJoin(Tables.documents(s, d), "doc_id", "text", 3, 1, 2,
        hashKeys = true)),
    // §2.2 row 20h — exact ASYMMETRIC containment join at C >= 0.6: the
    // short-doc-embedded-in-long-doc class every symmetric threshold
    // (Jaccard/minhash/simhash) passes by; sub-side-only prefix filter,
    // sup side contributes full postings
    "containment_join" -> ((s, d) =>
      Dedup.containmentJoin(Tables.documents(s, d), "doc_id", "text", 3, 3, 5)),
    // §2.2 row 20h, petabyte carrier: per-element xxhash64 shingle keys
    // map-side, every downstream shuffle 8-byte (the setsim_join_hashed
    // discipline — identical output, same exact-string oracle)
    "containment_join_hashed" -> ((s, d) =>
      Dedup.containmentJoin(Tables.documents(s, d), "doc_id", "text", 3, 3, 5,
        hashKeys = true)),
    // §2.2 row 20c — near-dup pairs -> dedup DECISION: connected components
    // over the MinHash pair graph, one kept representative per cluster
    "dedup_cluster" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.nearDupClusters(docs,
        Dedup.nearDupMinHash(docs, "doc_id", "text", 3, 0.8), "doc_id")
    }),
    // §2.2 row 21d, keep-BEST canonical selection: the cluster
    // representative is the longest member (most complete copy), not the
    // smallest id — crawl order is not a quality signal
    "dedup_keep_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.keepBestPerCluster(
        Dedup.nearDupClusters(docs,
          Dedup.nearDupMinHash(docs, "doc_id", "text", 3, 0.8), "doc_id"),
        docs.select(col("doc_id"), col("n_chars").cast("long").as("score")))
    }),
    // §2.2 row 22e — document-fragment stitching: A's last-3 == B's
    // first-3 tokens flags B as A's continuation (pagination reassembly)
    "fragment_pairs" -> ((s, d) =>
      Dedup.fragmentPairs(Tables.documents(s, d), "doc_id", "text", 3)),
    // §2.2 row 27b — PII redaction over deterministically dirtied text
    "pii_scrub" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.piiScrub(concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-01"),
          col("doc_id"), lit(" at 192.168.0."), pmod(col("doc_id"), lit(256))))
          .as("scrubbed"))),
    // §2.2 row 27b (r17 tier 2) — Luhn-VALIDATED card detection: plants a
    // valid PAN (%7), a checksum-broken twin (%11), and a spaced valid PAN
    // (%13) so both verdicts + the separator path fire at every SF; the
    // mod-10 HOF arithmetic is integer-exact on both engines
    "pii_luhn" -> ((s, d) =>
      TextAnalysis.luhnCandidates(
        Tables.documents(s, d).where(col("text").isNotNull)
          .select(col("doc_id"), concat(col("text"),
            when(col("doc_id") % 7 === 0, lit(" card 4111111111111111"))
              .when(col("doc_id") % 11 === 0, lit(" card 4111111111111112"))
              .when(col("doc_id") % 13 === 0, lit(" card 4111 1111 1111 1111 ok"))
              .otherwise(lit(""))).as("text")),
        "doc_id", "text")),
    // §2.2 row 29f — deterministic stratified sampling (corpus mixing)
    "sample_stratified" -> ((s, d) =>
      TextAnalysis.sampleStratified(Tables.documents(s, d), "source", "doc_id", 5)
        .select(col("doc_id"), col("source"))),
    // §2.2 row 29v — budget-constrained mixture allocation: exact integer
    // waterfilling of half the corpus's tokens across sources
    "mix_waterfill" -> ((s, d) =>
      TextAnalysis.waterfillBudget(Tables.documents(s, d), "source", "text", 2L)),
    // §2.2 row 29w — PMI collocation mining (phrase induction for
    // tokenizer/vocab curation): top-50 above-chance bigrams
    "pmi_collocations" -> ((s, d) =>
      TextAnalysis.pmiCollocations(Tables.documents(s, d), "text", 5L, 50)),
    // §2.2 row 29u — deterministic stratified train/val/test assignment
    // (exact per-language ratios via the rank cut, disjoint + exhaustive)
    "split_assign" -> ((s, d) =>
      TextAnalysis.splitAssign(Tables.documents(s, d), "lang", "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))),
    // §2.2 row 29i — weighted mixture sampling (per-language keep
    // probabilities via portable md5-prefix thresholds)
    "sample_weighted" -> ((s, d) =>
      TextAnalysis.sampleWeighted(Tables.documents(s, d), "lang", "doc_id",
        Map("en" -> 1.0, "zh" -> 0.5, "es" -> 0.25, "de" -> 0.1), 0.75)
        .select(col("doc_id"), col("lang"))),
    // §2.2 row 29s — priority sampling (Duffield-Lund-Thorup): k=200
    // weight-proportional WITHOUT replacement by n_chars + the unbiased
    // max(w, tau) subset-sum estimator; priorities use only exact IEEE
    // ops (md5-derived dyadic u, one division) so the doubles
    // hash-match the SQL replay bit-for-bit
    "sample_priority" -> ((s, d) =>
      TextAnalysis.samplePriority(Tables.documents(s, d), "doc_id", "n_chars", 200)),
    // §2.2 row 29o, per-stratum form: an independent DLT sample of 50 per
    // language — partitioned windows only (the large-k/many-strata shape:
    // no k-row funnel through one task)
    "sample_priority_strat" -> ((s, d) =>
      TextAnalysis.samplePriorityPerStratum(Tables.documents(s, d),
        "lang", "doc_id", "n_chars", 50)),
    // §2.2 row 29j — deterministic global corpus shuffle (training order);
    // two-phase bucket rank, no single-partition window
    "corpus_shuffle" -> ((s, d) =>
      TextAnalysis.corpusShuffle(Tables.documents(s, d), "doc_id")),
    // §2.2 row 29g — token-budget sequence packing per stratum
    "seq_pack" -> ((s, d) =>
      TextAnalysis.seqPack(Tables.documents(s, d), "source", "doc_id", "text", 512)),
    // §2.2 row 29h — overlapping context-window chunking (32-token windows,
    // 8-token overlap at this SF so multi-chunk docs exist)
    "chunk_docs" -> ((s, d) =>
      TextAnalysis.chunkTokens(Tables.documents(s, d), "doc_id", "text", 32, 8)),
    // §2.2 row 21 — SimHash near-dedup (rows-only oracle). maxHamming=6:
    // jaccard>=0.8 near-dups land well inside hamming 6 of a weighted 64-bit
    // simhash, and the derived 7x~9-bit banding keeps candidate volume ~30x
    // below the maxHamming=12 setting while preserving the recall guarantee.
    // md5 token hash so DuckDB can reproduce the signatures bit-for-bit:
    // with the pigeonhole banding guarantee the result set is EXACTLY
    // "hamming <= 6 AND jaccard >= 0.8", which the oracle brute-forces.
    "neardup_simhash" -> ((s, d) =>
      Dedup.nearDupSimHash(Tables.documents(s, d), "doc_id", "text", 6, 3, 0.8, md5Hash = true)),
    // §2.2 row 22c — cross-source n-gram overlap matrix (mixture-design /
    // leakage diagnostic): exact bigram-vocabulary Jaccard per source pair
    "source_overlap" -> ((s, d) =>
      Dedup.sourceOverlap(Tables.documents(s, d), "source", "text", 2)),
    // §2.2 row 22c, petabyte carrier: xxhash64 replaces the shingle before
    // the first distinct so every shuffle carries 8-byte keys. The output
    // matrix is hash-independent (counts, not hashes) modulo ~N²/2⁻⁶⁴
    // collisions, so it shares source_overlap's oracle SQL verbatim —
    // putting the scale path under the driver's rows+schema+hash gate, not
    // just the ScalaTest parity spec.
    "source_overlap_hashed" -> ((s, d) =>
      Dedup.sourceOverlap(Tables.documents(s, d), "source", "text", 2, hashKeys = true)),
    // §2.2 row L22h — bottom-k MinHash overlap sketch (round 14): the
    // k-bounded estimator tier above the exact matrix; deterministic
    // (the md5 hash IS the permutation), fully SQL-replayable.
    "source_overlap_sketch" -> ((s, d) =>
      Dedup.sourceOverlapSketch(Tables.documents(s, d), "source", "text", 2)),
    // §2.2 row 22 — n-gram Jaccard over an explicit pair set
    "ngram_jaccard" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = docs.select(col("doc_id").as("doc_a"))
        .join(docs.select(col("doc_id").as("doc_b")), col("doc_b") === col("doc_a") + 1)
      Dedup.ngramJaccard(pairs, docs, "doc_id", "text", 2)
    }),
    // §2.2 row 23 — exact ANN baseline
    "ann_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.exactTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10)
    }),
    // §2.2 row L24g — binary (sign-bit) Hamming ANN (round 14): 8-byte
    // sign signatures scanned with XOR+popcount, exact-cosine re-rank of
    // the Hamming-top-50 shortlist. Fully replayable: the sign fold, both
    // 32-bit words, the (hamming, id) shortlist order, and the rerank
    // re-derive in SQL bit-for-bit.
    "ann_hamming" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.hammingTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10)
    }),
    // §2.2 row 24 — LSH-bucketed ANN, FULL top-k table row-hash-oracled:
    // numPlanes pinned at 8 (the adaptive default at this SF) so the
    // oracle SQL can inline the fixed-seed hyperplane constants and
    // re-derive every signature; adaptivePlanes itself is spec-covered.
    "ann_lsh" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.lshTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10, numPlanes = 8)
    }),
    // §2.2 row 24 — IVF-bucketed ANN, the 100 TB scale path, FULLY
    // row-hash-oracled INCLUDING TRAINING (round 12): the oracle replays
    // Spark's xxhash64 in HUGEINT limb arithmetic to re-select the
    // hash-ordered sample, re-runs seed selection + the one k-means step
    // with fold-order-pinned means, and derives numCells/nprobe from the
    // corpus count exactly as adaptiveCells/adaptiveProbes do. Runs with
    // broadcastCentroids = true so the large-index carrier — the
    // broadcast-variable kernel that engages past the literal budget — is
    // the code path the driver actually exercises every round; literal-vs-
    // broadcast parity is spec-pinned (DedupSimilaritySpec).
    "ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopKWith(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10, ivfCentroids(s, d), broadcastCentroids = true)
    }),
    // §2.2 row 24 — IVF search under a PINNED seeded centroid set, FULLY
    // row-hash-oracled (round 11, the ann_lsh pinned-planes precedent):
    // any fixed centroid set is a valid IVF index, and a seeded one is
    // reproducible in SQL — the oracle re-derives cell assignment (argmax
    // cosine, tie to lowest cell), the nprobe=4 probe set, and the
    // cell-pruned exact top-k. Trained-centroid routing + the broadcast
    // carrier stay exercised by ann_ivf/ann_recall.
    "ann_ivf_fixed" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopKWith(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10, Similarity.seededCentroids(16, 64), nprobe = 4)
    }),
    // §2.2 row 23c — MMR-diversified retrieval: greedy diversified
    // re-rank of the brute top-20 pool (λ = 0.7, k = 5); 6dp-rounded
    // cosines + decimal λ/μ literals make every greedy step engine-exact
    "mmr_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.mmrTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", k = 5, pool = 20, lambda = 0.7)
    }),
    // §2.2 row 24f — FILTERED vector search: the metadata predicate is
    // pushed into the corpus scan BEFORE the index (pre-filtering), so
    // every cell holds only qualifying rows and top-k can never starve —
    // the composition falls out of the operators taking the corpus as a
    // DataFrame (Catalyst pushes the filter into the parquet scan)
    "ann_filtered" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopKWith(e.filter(col("vec_id") < 5),
        e.filter(col("vec_id") >= 5 && col("label").isin(2, 3, 5)),
        "vec_id", "embedding", 10, Similarity.seededCentroids(16, 64), nprobe = 4)
    }),
    // §2.2 row 24c — product-quantization ANN (rows-only oracle; rank-1
    // recall gated by `ann_recall`'s pq_nn column + recall@10 spec): ADC
    // scoring over the m-byte code table, exact re-rank of the shortlist
    "ann_pq" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.pqTopKWith(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10, pqBooks(s, d))
    }),
    // §2.2 row 24c — PQ search under PINNED seeded codebooks, FULLY
    // row-hash-oracled (the ann_lsh/ann_ivf_fixed pinned-artifact
    // precedent, applied to ADC): any fixed codebook set is a valid
    // product quantizer, and a seeded one lets the oracle replay the
    // entire search in SQL — per-subspace argmin-L2 code assignment,
    // per-query LUT dots, the order-pinned ADC sum, reconstructed-norm
    // cosine, top-80 shortlist, exact cosine re-rank. Trained codebooks
    // stay exercised by ann_pq + ann_recall.
    "ann_pq_fixed" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.pqTopKWith(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10, Similarity.seededBooks(8, 16, 8))
    }),
    // §2.2 row 24d — IVF-PQ composed (cell-routed ADC + exact re-rank, the
    // billion-vector production shape; rows-only, recall via ann_recall's
    // ivfpq_nn + the recall@10 spec). Shares ann_ivf's centroids and
    // ann_pq's codebooks — indexes train once, every searcher reuses them.
    "ann_ivfpq" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfPqTopKWith(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10, ivfCentroids(s, d), pqBooks(s, d))
    }),
    // §2.2 row 24d — IVF-PQ composed under PINNED centroids AND codebooks
    // (ann_ivf_fixed's seeded cells routing ann_pq_fixed's seeded ADC):
    // the full production search chain — route → ADC-score → shortlist →
    // exact re-rank — row-hash-verified end-to-end by one oracle.
    "ann_ivfpq_fixed" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfPqTopKWith(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10, Similarity.seededCentroids(16, 64),
        Similarity.seededBooks(8, 16, 8), nprobe = 4)
    }),
    // §2.2 row 24e — IVF-PQ with RESIDUAL encoding (faiss by_residual):
    // codes quantize x − centroid(cell); inner-product ADC keeps the LUT
    // per-query (only the scalar <q, c> is per-probe). Rows-only; recall
    // gated by ann_recall's ivfpqr_nn column + the recall@10 spec.
    "ann_ivfpq_res" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfPqResidualTopKWith(e.filter(col("vec_id") < 5),
        e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10, ivfCentroids(s, d), pqResBooks(s, d))
    }),
    // §2.2 row L24h — persisted + incrementally-maintained ANN index
    // (round 16): build the IVF-PQ zone on the %4!=0 training slice under
    // the PINNED artifacts, APPEND the %4==0 slice map-side against the
    // frozen centroids/codebooks (no rebuild — the faiss IndexIVF.add
    // contract), then the staleness gate: exact weighted KS between the
    // frozen training-time cell occupancy and the zone's current one.
    // Zone lands at the fixed per-sf tmpdir root (the pipeline-zone
    // idempotence convention — reruns overwrite).
    "ann_index_stale" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = Similarity.seededCentroids(16, 64)
      val books = Similarity.seededBooks(8, 16, 8)
      val path = zoneRoot("annindex", d)
      AnnIndex.build(e.filter(col("vec_id") % 4 =!= 0), "vec_id", "embedding",
        cents, books, path)
      AnnIndex.append(e.filter(col("vec_id") % 4 === 0), "vec_id", "embedding",
        cents, books, path)
      AnnIndex.staleness(s, path, 0.1)
    }),
    // §2.2 row 19 — embedding-cosine near-dup (banded + multiprobed +
    // verified) over a corpus with planted exact and perturbed duplicates
    "neardup_embedding" -> ((s, d) =>
      Similarity.cosineNearDup(embCorpus(s, d), "vec_id", "embedding", 0.9)),
    // §2.2 row 21e — SemDeDup semantic dedup over the planted-duplicate
    // corpus, clustered by the label column (the oracle-checkable variant;
    // the derived-IVF-cell variant is spec-gated): each planted copy has a
    // lower-id source in its cluster at cos >= 0.9, so keep=false marks
    // exactly the plants and the smallest id of each neighborhood survives
    "semantic_dedup" -> ((s, d) =>
      Similarity.semanticDedup(embCorpus(s, d, withLabel = true),
        "vec_id", "embedding", 0.9, clusterCol = Some(col("label")))),
    // §2.2 row 21f — margin-based cross-side pair mining (Artetxe-Schwenk
    // ratio margin, the CCMatrix criterion) between the even- and odd-label
    // halves; planes pinned at 16 (4 bands x 4 bits) for the SQL replay
    "margin_mine" -> ((s, d) =>
      Similarity.marginMine(
        Tables.embeddings(s, d).withColumn("side",
          when(pmod(col("label"), lit(2)) === 0, "a").otherwise("b")),
        "vec_id", "embedding", "side", 4, 1.0, numPlanes = 16)),
    // §2.2 row 24 — ANN recall gate: queries are PERTURBED copies of corpus
    // vectors (component 0 scaled 1.5x, cos ≈ 0.999 to their source), so the
    // true nearest neighbor of each query is known and independently
    // computable by the oracle via brute force. All three approximate paths
    // (LSH, IVF, PQ) must retrieve that neighbor at rank 1 — a genuine recall check on a
    // near-duplicate workload (the regime ANN bucketing is built for),
    // without pinning constants the data can't support.
    "ann_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id"),
          concat(array(element_at(col("embedding"), 1) * 1.5),
            slice(col("embedding"), 2, 63)).as("embedding"))
      def rank1(df: DataFrame, alias: String) =
        df.filter(col("rank") === 1).select(col("query_id"), col("neighbor_id").as(alias))
      val lsh = rank1(Similarity.lshTopK(q, e, "vec_id", "embedding", 1), "lsh_nn")
      val ivf = rank1(Similarity.ivfTopKWith(q, e, "vec_id", "embedding", 1,
        ivfCentroids(s, d)), "ivf_nn")
      val pq = rank1(Similarity.pqTopKWith(q, e, "vec_id", "embedding", 1,
        pqBooks(s, d)), "pq_nn")
      val ivfpq = rank1(Similarity.ivfPqTopKWith(q, e, "vec_id", "embedding", 1,
        ivfCentroids(s, d), pqBooks(s, d)), "ivfpq_nn")
      val ivfpqr = rank1(Similarity.ivfPqResidualTopKWith(q, e, "vec_id", "embedding", 1,
        ivfCentroids(s, d), pqResBooks(s, d)), "ivfpqr_nn")
      lsh.join(ivf, Seq("query_id")).join(pq, Seq("query_id"))
        .join(ivfpq, Seq("query_id")).join(ivfpqr, Seq("query_id"))
    }),
    // §2.2 row 25 — embedding column ops
    "embedding_norms" -> ((s, d) => Similarity.norms(Tables.embeddings(s, d), "vec_id", "embedding")),
    // §2.2 row 25f — Matryoshka truncation readiness: retained_d IS
    // cos(full, d-prefix truncation); decides the coarse-stage width of a
    // prefix-search retrieval funnel
    "embedding_matryoshka" -> ((s, d) =>
      Similarity.matryoshkaNorms(Tables.embeddings(s, d), "vec_id",
        "embedding", Seq(16, 32))),
    // §2.2 row L25g — Johnson–Lindenstrauss random projection (round 14):
    // data-oblivious 64→16 reduction under pinned seed-19 Gaussian planes;
    // order-pinned folds + the exact dyadic 1/√16 scale make every rounded
    // component and the norm-ratio diagnostic replay in SQL. Emitted
    // EXPLODED to (vec_id, component_idx, value, norm_ratio) scalar rows —
    // the embedding_pca precedent: a raw array<double> column crashes the
    // driver comparator's pandas sort (r14 red row).
    "embedding_jl" -> ((s, d) =>
      Similarity.jlProject(Tables.embeddings(s, d), "vec_id", "embedding")
        .select(col("vec_id"), col("norm_ratio"),
          posexplode(col("proj")).as(Seq("component_idx", "value")))
        .select(col("vec_id"), col("component_idx"), col("value"),
          col("norm_ratio"))),
    // §2.2 row 25e — component covariance matrix (PCA/whitening input):
    // the explode carrier (pure built-in Catalyst, independently planned),
    // kept under the oracle as the cross-check of the default aggregate
    "embedding_cov" -> ((s, d) =>
      Similarity.embeddingCovariance(Tables.embeddings(s, d), "embedding",
        highDim = false)),
    // §2.2 row 25e — the DEFAULT covariance carrier (fixed-buffer
    // CovOuterSumAgg, no explode — the only high-dim-safe shape, and
    // ~2.3× faster already at dim 64) under the SAME oracle — the paths
    // are bit-identical by construction, so the driver gates both
    "embedding_cov_hd" -> ((s, d) =>
      Similarity.embeddingCovariance(Tables.embeddings(s, d), "embedding")),
    // §2.2 row 25e — top-4 PCA eigensolve, ORACLED (round 18 — VERDICT
    // r17 #1): engine-exact integer fixed-point power iteration with
    // Hotelling deflation over the 6dp covariance (the event_pagerank
    // unrolled-CTE discipline; see Similarity.pcaPowerFixed's scaladoc
    // for the flat-spectrum adjudication). The float Jacobi path
    // (pcaTrain/pcaProject — whitened projections) remains library
    // surface, spec-gated as before.
    "embedding_pca" -> ((s, d) =>
      Similarity.pcaPowerFixed(Tables.embeddings(s, d), "embedding", k = 4)),
    // §2.2 row 26 — multimodal binary plumbing (metadata path)
    "multimodal_meta" -> ((s, d) =>
      Multimodal.metaTable(Multimodal.packBinary(Tables.documents(s, d), "doc_id", "text"))),
    // §2.2 row 26b — frame sampling over opaque payloads (every 4th 64-byte
    // frame; the sizes verify the slicing arithmetic end-to-end)
    "frame_sample" -> ((s, d) =>
      Multimodal.frameSample(
        Multimodal.packBinary(Tables.documents(s, d), "doc_id", "text"), 64, 4)
        .select(col("doc_id"), col("n_frames"), col("frame_idx"), col("frame_bytes"))),
    // §2.2 row 25b — int8 embedding quantization (absmax), scalar digest
    "embedding_quantize" -> ((s, d) => {
      val v = col("embedding").cast("array<double>")
      val q = Similarity.quantizeInt8(v)
      Tables.embeddings(s, d).select(col("vec_id"),
        get(q, lit(0)).as("q0"),
        array_min(q).as("q_min"), array_max(q).as("q_max"),
        aggregate(q, lit(0L), (acc, x) => acc + x).as("q_sum"))
    }),
    // §2.2 row 20b — decontamination: train/benchmark near-dup scrub
    "decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.decontaminate(
        docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", 3, 0.8)
    }),
    // §2.2 row 20c — exact n-gram decontamination (Bloom-pruned, exact-
    // verified): train docs sharing ANY verbatim 5-gram with the benchmark
    "decontam_ngram" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.decontamNgram(
        docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", 5)
    }),
    // §2.2 row L19e (cross-corpus form, round 16) — ExactSubstr as
    // DECONTAMINATION, the Lee et al. deployment: every training run
    // >= 8 tokens appearing ANYWHERE in the benchmark half is CUT from
    // every training occurrence (no canonical keep — the benchmark is
    // canonical; decontam_ngram flags docs, this EDITS them), docs
    // reassembled from the surviving gaps.
    "decontam_substr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.substrScrub(
        docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", SubstrRun, md5Hash = true)
    }),
    // §2.2 row L29cc — first-class ORACLED Bloom filter (round 16): the
    // membership sketch decontaminate() uses opaquely, rebuilt here as a
    // verifiable word table (k=4 salted-md5 positions over 8192 bits,
    // 32-bit lanes in BIGINT words so bit_or/shift probes are sign-free
    // in both engines); build over the benchmark slice, probe the whole
    // corpus, report the Bloom verdict beside the exact membership join —
    // no false negatives by construction, realized FPR measurable.
    "bloom_decontam" -> ((s, d) =>
      BloomSketch.bloomDiagnostics(Tables.documents(s, d), "doc_id", "text",
        col("doc_id") % 97 === 0)),
    // §2.2 row 27d — unigram LM quality score (mean per-token log-prob
    // under the corpus's own unigram distribution — the perplexity gate)
    "lm_score" -> ((s, d) =>
      TextAnalysis.lmScore(Tables.documents(s, d), "doc_id", "text")),
    // §2.2 row 27f — bigram LM quality score (lm_score one model order up:
    // mean log P(w_i | w_{i-1}) under the corpus's own MLE bigram model)
    "lm_bigram" -> ((s, d) =>
      TextAnalysis.lmBigram(Tables.documents(s, d), "doc_id", "text")),
    // §2.2 row L27l — interpolated Kneser–Ney bigram scoring (round 14):
    // continuation-probability smoothing over the same two corpus
    // shuffles as lm_bigram; D=0.75 dyadic, identical parenthesization
    // both engines, 6dp DECIMAL weighted sums.
    "lm_kneser_ney" -> ((s, d) =>
      TextAnalysis.lmKneserNey(Tables.documents(s, d), "doc_id", "text")),
    // §2.2 row L27l (round 16): interpolated KN one model order up —
    // trigram top level, continuation-count middle order on the distinct
    // (w2,w3) pair table, pair-continuation base; same oracle contract
    // (dyadic D, identical parenthesization, 6dp DECIMAL weighted sums).
    "lm_kn_trigram" -> ((s, d) =>
      TextAnalysis.lmKneserNeyTrigram(Tables.documents(s, d), "doc_id", "text")),
    // §2.2 row L27m — Zipf-fit corpus diagnostic (round 14): OLS of
    // ln(freq) on ln(rank) over the top-1000 vocabulary head; DECIMAL
    // sums + identically-parenthesized double closed forms replay in SQL.
    "zipf_fit" -> ((s, d) =>
      TextAnalysis.zipfFit(Tables.documents(s, d), "text")),
    // §2.2 row L27m (per-source form): one (slope, r2) row per source so
    // a boilerplate-flooded source reads non-Zipfian next to its peers.
    "zipf_by_source" -> ((s, d) =>
      TextAnalysis.zipfFitBySource(Tables.documents(s, d), "source", "text")),
    // §2.2 row L27m (robust form, round 15): Theil–Sen median of
    // pairwise slopes over the SAME head — a 29.3% breakdown point where
    // one corrupted head frequency drags the OLS slope arbitrarily;
    // lower-median convention keeps the whole chain engine-exact.
    "zipf_theil_sen" -> ((s, d) =>
      TextAnalysis.zipfTheilSen(Tables.documents(s, d), "text")),
    // §2.2 row L22j — Self-BLEU clipped n-gram precision, source vs rest
    // (round 16; Papineni 2002 / Zhu 2018): the MULTISET redundancy
    // monitor beside source_overlap's set Jaccard — c_rest = c_total −
    // c_src, so no pair join ever forms (the ksBySource discipline);
    // exact integer clip/total pairs per order + the 6dp-decimal
    // geometric-mean log precision.
    "self_bleu" -> ((s, d) =>
      TextAnalysis.selfBleu(Tables.documents(s, d), "source", "text")),
    // §2.2 row L27n — Heaps'-law vocabulary-growth fit (round 16): V =
    // K·n^beta over the per-source (tokens, vocab) points — the growth
    // dual of zipf_fit's frequency decay; same 6dp-ln DECIMAL sums +
    // fixed-parenthesization OLS.
    "heaps_law" -> ((s, d) =>
      TextAnalysis.heapsLaw(Tables.documents(s, d), "source", "text")),
    // §2.2 row L27q — stupid-backoff trigram scoring (round 16, third
    // session): the Brants et al. distributed production LM, trained on
    // even doc ids and scoring the odd ones so the backoff chain
    // actually fires (the held-out LM-eval shape)
    "lm_stupid_backoff" -> ((s, d) =>
      TextAnalysis.lmStupidBackoff(Tables.documents(s, d), "doc_id", "text")),
    // §2.2 row L27r — token burstiness (round 16, third session): VMR
    // index of dispersion for the top-30 tokens — separates topical
    // content words (VMR >> 1) from once-per-page template words
    "token_burstiness" -> ((s, d) =>
      TextAnalysis.tokenBurstiness(Tables.documents(s, d), "doc_id", "text", 30)),
    // §2.2 row L27s — vocabulary-concentration Gini per source (round
    // 16, third session): exact from the frequency spectrum, never a
    // per-type sort
    "vocab_gini" -> ((s, d) =>
      TextAnalysis.vocabGini(Tables.documents(s, d), "source", "text")),
    // §2.2 row L27w — conditional bigram entropy rate (round 16, third
    // session): corpus predictability in nats/token — templated text
    // reads low, junk reads near the ceiling; h_bigram − h_rate = H(w1)
    "entropy_rate" -> ((s, d) =>
      TextAnalysis.entropyRate(Tables.documents(s, d), "text")),
    // §2.2 row L27u — source-token mutual information (round 16, third
    // session): the template/leakage detector — U near 1 means tokens
    // identify their source (headers, watermarks, markup)
    "source_token_mi" -> ((s, d) =>
      TextAnalysis.sourceTokenMi(Tables.documents(s, d), "source", "text")),
    // §2.2 row L27v — Chao1 richness + Good–Turing coverage (round 16,
    // third session): is this source mined out, or does more crawl buy
    // more vocabulary
    "chao1_richness" -> ((s, d) =>
      TextAnalysis.chao1Richness(Tables.documents(s, d), "source", "text")),
    // §2.2 row L27o — Yule's K lexical diversity (round 16, third
    // session): the length-robust repeat-rate constant + TTR + hapax
    // ratio per source — the third corpus-health axis beside Zipf decay
    // and Heaps growth
    "yule_k" -> ((s, d) =>
      TextAnalysis.lexicalDiversity(Tables.documents(s, d), "source", "text")),
    // §2.2 row L27p — Jensen–Shannon divergence, source vs rest (round
    // 16, third session): the bounded symmetric distributional distance
    // mixture design uses — count-weighted form, rest = total − slice,
    // no pair join
    "js_divergence" -> ((s, d) =>
      TextAnalysis.jsDivergence(Tables.documents(s, d), "source", "text")),
    // §2.2 row 27g — per-doc token-distribution entropy + ratio to max
    // (the repetitive/templated-text signal)
    "token_entropy" -> ((s, d) =>
      TextAnalysis.tokenEntropy(Tables.documents(s, d), "doc_id", "text")),
    // §2.2 row 22d — per-doc n-gram novelty (fraction of the doc's distinct
    // 3-grams found nowhere else in the corpus — diversity diagnostic)
    "ngram_novelty" -> ((s, d) =>
      TextAnalysis.ngramNovelty(Tables.documents(s, d), "doc_id", "text", 3)),
    // §2.2 row 25c — per-label embedding centroids (class prototypes),
    // exploded to scalar rows so the oracle hashes element-wise
    "label_centroids" -> ((s, d) =>
      Similarity.labelCentroids(Tables.embeddings(s, d), "label", "embedding")
        .select(col("label"), col("n_vecs"), posexplode(col("centroid")))
        .select(col("label"), col("n_vecs"), col("pos"), col("col").as("c"))),
    // §2.2 row 29b — corpus vocabulary (token frequencies)
    "vocab_top" -> ((s, d) => TextAnalysis.vocabulary(Tables.documents(s, d), "text", 30)),
    // §2.2 row L29y — Count-Min Sketch frequency estimation (round 14):
    // one-pass depth×width sketch (salted-md5 buckets, the hashed-
    // classifier convention), probed at the exact top-30 tokens; the
    // min-over-rows estimate and its one-sided overcount replay in SQL.
    "cms_counts" -> ((s, d) => TextAnalysis.cmsCounts(Tables.documents(s, d), "text")),
    // §2.2 row L29bb — AMS F2 / self-join-size sketch (round 16, Alon–
    // Matias–Szegedy tug-of-war): 96 signed sums from the md5 bits of
    // each key estimate Σf² — the exact self-join size of lineitem on
    // l_orderkey, the number a planner needs to size the shuffle BEFORE
    // joining; ≤ 96 longs per task cross the exchange at any stream
    // size, and the median-of-means chain is integer/dyadic throughout so
    // the whole estimator replays bit-for-bit. Exact F2 runs beside it as
    // the verification surface (the cmsCounts probe discipline).
    "f2_sketch" -> ((s, d) =>
      F2Sketch.f2Diagnostics(Tables.lineitem(s, d), Nil, "l_orderkey")),
    // the grouped form — per-source token F2 (the repetition/skew monitor:
    // F2/n² rises when few tokens dominate a source); state is
    // |sources|×96 longs at any corpus size
    "f2_by_source" -> ((s, d) =>
      F2Sketch.f2Diagnostics(
        Tables.documents(s, d)
          .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("token"))
          .where(col("token") =!= ""),
        Seq("source"), "token")),
    // the INNER-PRODUCT form — E[Z_a·Z_b] = Σ f_a·f_b = |A ⋈ B| on the
    // key: estimate the many×many events⋈orders fan-out (≈67 events/user
    // × ≈10 orders/cust) from two independently-built 96-long sketches,
    // BEFORE any join runs; exact Σ c_a·c_b rides as the verification
    // surface
    "join_size_est" -> ((s, d) =>
      F2Sketch.joinSizeDiagnostics(Tables.events(s, d), "user_id",
        Tables.orders(s, d), "o_custkey")),
    // §2.2 row L29z — HyperLogLog cardinality sketch (round 15): 256
    // one-byte registers over the raw token stream (no distinct anywhere —
    // max is idempotent), register-wise-max merge law, and the corrected
    // estimate; both replay exactly in SQL (bin() is unpadded in both
    // engines, the 2^-r sum is dyadic-exact order-free). The first
    // ORACLED cardinality sketch — approx_stats stays the built-in
    // (non-replayable HLL++) tier.
    "hll_registers" -> ((s, d) =>
      TextAnalysis.hllRegisters(Tables.documents(s, d), "text")),
    "hll_estimate" -> ((s, d) =>
      TextAnalysis.hllEstimate(Tables.documents(s, d), "text")),
    // the grouped form — per-source vocabulary-richness monitor
    // (|sources|×256 rows of state at any corpus size)
    "hll_by_source" -> ((s, d) =>
      TextAnalysis.hllEstimateBy(Tables.documents(s, d), Seq("source"), "text")),
    // sketch ALGEBRA: per-pair union (exact via max merge law) +
    // inclusion–exclusion intersection — the cross-source vocabulary
    // overlap monitor in |sources|·256 rows of state
    "hll_set_ops" -> ((s, d) =>
      TextAnalysis.hllSetOps(Tables.documents(s, d), "source", "text")),
    // §2.2 row L29aa — deterministic mergeable quantile sketch (round 16,
    // Agarwal et al. 2012 with md5 coins): ≤ k uniform-by-hash survivors
    // at the smallest admissible halving level; order statistics of the
    // survivors estimate the quantiles; EXACT merge law (union+
    // re-threshold), fully replayable — the quantile tier approx_
    // percentile's non-replayable GK internals can't provide.
    "quantile_sketch" -> ((s, d) =>
      QuantileSketch.estimates(Tables.orders(s, d), None, "o_orderkey",
        "o_totalprice", 256, Seq(10, 100, 250, 500, 750, 900, 990))),
    // the grouped form — per-source document-length quantile monitor
    "quantile_sketch_by" -> ((s, d) =>
      QuantileSketch.estimates(Tables.documents(s, d), Some("source"),
        "doc_id", "n_chars", 128, Seq(250, 500, 750, 900))),
    // §2.2 row 31 — BPE tokenizer training (Sennrich word-frequency
    // formulation: ONE corpus pass builds the word table, then — vocab
    // being far under Bpe.DriverVocabBound — the merge loop runs
    // driver-side with incremental pair counts, the production-trainer
    // shape; the distributed per-round carrier engages past the bound and
    // is spec-pinned merge-for-merge against this one). Iterative →
    // rows-only oracle; the merge list is also spec-checked against an
    // in-memory reference trainer (BpeSpec). memoize=false so every bench
    // rep pays the REAL training (the memo would otherwise hide it behind
    // min-of-reps); bpe_segment keeps the memo — segmentation under an
    // already-trained tokenizer is the realistic shape there.
    "bpe_train" -> ((s, d) =>
      Bpe.mergesDF(s, Bpe.train(Tables.documents(s, d), "text", 32, memoize = false))),
    // §2.2 row 31 — BPE segmentation under the trained merges: one
    // compiled map-side expression, zero shuffles (training memoized, so
    // this reuses bpe_train's merges within the session)
    "bpe_segment" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Bpe.train(docs, "text", 32)
      Bpe.segment(docs, "doc_id", "text", merges)
        .select(col("doc_id"), coalesce(size(col("pieces")), lit(0)).as("n_pieces"),
          concat_ws(" ", slice(col("pieces"), 1, 12)).as("head_pieces"))
    }),
    // §2.2 row 31 — BPE segmentation under a PINNED literal merge list,
    // FULLY row-hash-oracled (round 12, the pinned-artifact precedent's
    // fifth application): TRAINING is genuinely iterative-data-dependent
    // (rows-only, spec-gated), but segmentation under a FIXED merge table
    // is a deterministic per-word rewrite system a DuckDB recursive CTE
    // can replay exactly — lowest-rank-first, all non-overlapping
    // occurrences left-to-right per round (see the oracle's state-machine
    // CTE). Same BpeSegmentExpr code path as bpe_segment.
    // Degenerate cases aligned with the oracle (round 13): NULL text →
    // NULL pieces under ANSI size(), coalesced to the oracle's 0;
    // tokenization runs the same literal whitespace class in both engines
    // (see Bpe.tokens — Java \s vs RE2 \s differ on U+000B).
    "bpe_segment_fixed" -> ((s, d) =>
      Bpe.segment(Tables.documents(s, d), "doc_id", "text", pinnedMerges)
        .select(col("doc_id"), coalesce(size(col("pieces")), lit(0)).as("n_pieces"),
          concat_ws(" ", slice(col("pieces"), 1, 12)).as("head_pieces"))),
    // §2.2 row 31b — tokenizer fertility (pieces per word, per language):
    // the compression-ratio eval for tokenizer choice; pure projection
    // (the pinned-merge segmenter) + one lang-keyed aggregate, fertility
    // is one double division of exactly-summed integer counts
    "bpe_fertility" -> ((s, d) => {
      val toks = TextAnalysis.tokens(col("text"))
      Tables.documents(s, d).select(col("lang"),
          coalesce(size(graft.functions.NativeExprs.bpeSegment(
            toks, pinnedMerges, "</w>")), lit(0)).cast("long").as("_np"),
          size(filter(toks, w => w =!= "")).cast("long").as("_nw"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("_nw")).as("n_words"),
          sum(col("_np")).as("n_pieces"))
        .withColumn("fertility",
          col("n_pieces").cast("double") / col("n_words"))
    }),
    // §2.2 row L31c — unigram-LM (SentencePiece-style) Viterbi
    // segmentation (round 15): globally optimal min-cost split of every
    // distinct word under the pinned integer-cost piece inventory; the
    // combined cost·PieceScoreBase+pieces DP integer makes the whole
    // operator float-free and the SQL replay a recursive CTE over the
    // same DP (base/fallback/maxPieceLen interpolated from Bpe into BOTH
    // sides — ADVICE r15).
    "unigram_segment" -> ((s, d) =>
      Bpe.unigramSegment(Tables.documents(s, d), "doc_id", "text",
        Bpe.pinnedPieces)),
    // §2.2 row L31d — WordPiece greedy longest-match segmentation (round
    // 16, the BERT tokenizer's runtime algorithm): FOURTH tokenizer tier;
    // per DISTINCT word an integer/boolean greedy automaton (no FP, fixed
    // candidate order), ##-continuations, whole-word [UNK] on a stranded
    // remainder; fully replayable as a recursive CTE over the SAME pinned
    // vocabulary (interpolated into both sides).
    "wordpiece_segment" -> ((s, d) =>
      Bpe.wordpieceSegment(Tables.documents(s, d), "doc_id", "text",
        Bpe.pinnedWordPieces)),
    // §2.1 row 17b — single-pass column profiling
    // (spread: the 4-column exact-distinct profile Expands the input 4x,
    // all fused into the single-row-group scan without it)
    "profile_columns" -> ((s, d) => Quality.profileColumns(Tables.spread(s, d, "orders", Tables.orders(s, d)),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))),
    // §2.1 row 8c — Benford first-digit conformance (round 16, third
    // session): the forensic data-quality gate for organic positive
    // amounts — digit histogram with per-digit χ² contributions over
    // order totals, expected probabilities as pinned 6dp literals
    "benford_digits" -> ((s, d) =>
      Quality.benfordDigits(Tables.orders(s, d), "o_totalprice")),
    // §2.1 row 8c rolled to the one-row verdict: χ² (df=8, 1% critical
    // value pinned) + Nigrini's MAD
    "benford_stat" -> ((s, d) =>
      Quality.benfordStat(Tables.orders(s, d), "o_totalprice")),
    // §2.2 row 27 — Unicode NFC normalization (pre-dedup canonicalization)
    "unicode_norm" -> ((s, d) => {
      val nfc = graft.functions.NativeExprs.nfcNormalize(col("text"))
      Tables.documents(s, d).select(col("doc_id"),
        length(nfc).as("len_nfc"), (nfc === col("text")).as("unchanged"))
    }),
    // §2.2 row 30b — rolling-hash winnowing fingerprints, FULLY oracled
    // (round 11): the MD5 token-hash variant (the simhash precedent) makes
    // the whole rolling chain replayable in DuckDB — h = (h*B + t) mod
    // 2^64 in HUGEINT, window-min, distinct — so the driver hash-gates the
    // actual fingerprint SETS, exploded to scalar rows. The xxh64 default
    // stays the production path (spec-covered; winnow_overlap runs it).
    "winnow_fingerprint" -> ((s, d) => {
      val fps = graft.functions.NativeExprs.winnowFingerprints(
        Dedup.tokens(col("text")), 5, 4, md5Hash = true)
      Tables.documents(s, d).select(col("doc_id"), fps.as("_fps"))
        .select(col("doc_id"), explode(col("_fps")).as("fp"))
    }),
    // §2.2 row 30b — winnowing invariant, oracled: a document always shares
    // fingerprints with a prefix-shifted copy of itself (the position-
    // robustness property winnowing exists for; a position-anchored
    // fingerprinter fails this), and fingerprint sets are non-empty.
    "winnow_overlap" -> ((s, d) => {
      def fpsOf(t: org.apache.spark.sql.Column) =
        graft.functions.NativeExprs.winnowFingerprints(Dedup.tokens(t), 5, 4)
      val fps = fpsOf(col("text"))
      val shifted = fpsOf(concat(lit("shifted prefix padding tokens "), col("text")))
      Tables.documents(s, d)
        .filter(col("doc_id") % 20 === 0 && size(Dedup.tokens(col("text"))) >= 16)
        .select(col("doc_id"),
          (size(fps) > 0).as("has_fps"),
          (size(array_intersect(fps, shifted)) > 0).as("prefix_overlap"))
    }),
    // §2.2 rows 27-30 — text analysis
    "text_quality" -> ((s, d) => TextAnalysis.textQuality(Tables.documents(s, d), "doc_id", "text")),
    // §2.2 row L27x — encoding-artifact (mojibake) gate: plants all three
    // artifact classes on doc_id moduli (digraphs %17, U+FFFD %19,
    // â€/Â digraphs + a raw C1 NEL %23) so every counter and both keep
    // verdicts fire at every SF; raw testdata carries NONE of these bytes
    // (verified), so the Java-vs-RE2 dot/line-terminator edge never sees
    // real data — plants keep artifact chars away from line terminators
    "mojibake_gate" -> ((s, d) =>
      TextAnalysis.mojibakeGate(
        Tables.documents(s, d).where(col("text").isNotNull)
          .select(col("doc_id"), concat(col("text"),
            when(col("doc_id") % 17 === 0, lit(MojiPlant17))
              .when(col("doc_id") % 19 === 0, lit(MojiPlant19))
              .when(col("doc_id") % 23 === 0, lit(MojiPlant23))
              .otherwise(lit(""))).as("text")),
        "doc_id", "text")),
    // §2.2 row L28b — per-source Unicode-script profile: plants Cyrillic
    // (%29), Han+digits (%31), Arabic (%37), accented Latin (%41) on
    // doc_id moduli so every script counter fires at every SF (raw
    // testdata is pure ASCII — verified)
    "script_profile" -> ((s, d) =>
      TextAnalysis.scriptProfile(
        Tables.documents(s, d).where(col("text").isNotNull)
          .select(col("source"), concat(col("text"),
            when(col("doc_id") % 29 === 0, lit(ScriptPlant29))
              .when(col("doc_id") % 31 === 0, lit(ScriptPlant31))
              .when(col("doc_id") % 37 === 0, lit(ScriptPlant37))
              .when(col("doc_id") % 41 === 0, lit(ScriptPlant41))
              .otherwise(lit(""))).as("text")),
        "source", "text")),
    "lang_id" -> ((s, d) => TextAnalysis.langId(Tables.documents(s, d), "doc_id", "text")),
    "token_count" -> ((s, d) => TextAnalysis.tokenCounts(Tables.documents(s, d), "doc_id", "text")),
    "doc_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(Tables.documents(s, d), "doc_id", "text", 3)),
    // §2.2 row 27c — Gopher-style repetition quality filter (dup-bigram and
    // top-bigram fractions; explode + doc_id-keyed partial aggs)
    "rep_filter" -> ((s, d) =>
      TextAnalysis.repetitionFilter(Tables.documents(s, d), "doc_id", "text", 2, 0.2)),
    // §2.2 row 23b — BM25 inverted-index retrieval: every ~97th doc's first
    // 6 tokens form a query; postings + query-vocab df probe + bounded-heap
    // top-10 (scores decimal-summed → accumulation-order independent)
    "bm25_topk" -> ((s, d) => {
      val queries = Tables.documents(s, d)
        .where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 6)).as("qtext"))
      Retrieval.bm25TopK(Tables.documents(s, d), "doc_id", "text",
        queries, "qid", "qtext", 10)
    }),
    // §2.2 row L23e — hybrid retrieval via reciprocal-rank fusion (round
    // 16, Cormack et al. 2009): the SAME query ids drive both rankers —
    // BM25 over the doc's first-6-token probe and exact-cosine ANN over
    // its embedding (vec_id aligns with doc_id in the testdata) — and RRF
    // fuses the two top-10 lists rank-only (no cross-ranker score
    // calibration), 1/(60+rank) contributions decimal-summed. Every stage
    // is bounded by |queries|·k, so the fusion adds NO corpus-sized work
    // on top of its rankers. The query doc itself stays in both lists
    // (self-retrieval sanity: it should fuse to rank 1).
    "hybrid_rrf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val e = Tables.embeddings(s, d)
      val queries = docs
        .where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 6)).as("qtext"))
      val sparse = Retrieval.bm25TopK(docs, "doc_id", "text",
        queries, "qid", "qtext", 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val dense = Similarity.exactTopK(e.where(col("vec_id") % 97 === 0), e,
        "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(Seq(sparse, dense), 10)
    }),
    // §2.1 row 19b — sequential funnel over the event stream (view → click →
    // purchase, each step strictly after the user's previous-step time)
    "funnel_steps" -> ((s, d) =>
      Events.funnel(Tables.events(s, d), col("event_type"),
        Seq("view", "click", "purchase"))),
    // §2.1 row 19c — weekly cohort retention grid
    "cohort_retention" -> ((s, d) =>
      Events.cohortRetention(Tables.events(s, d))),
    // §2.1 row 19d — CUBE cross-tab over the same revenue fact rollup uses
    "cube_revenue" -> ((s, d) => {
      val f = Tables.spread(s, d, "lineitem", Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")))
        .join(Tables.orders(s, d).select(
          col("o_orderkey").as("l_orderkey"), col("o_custkey"), col("o_orderdate")), Seq("l_orderkey"))
        .join(broadcast(Tables.customer(s, d).select(
          col("c_custkey").as("o_custkey"), col("c_mktsegment"))), Seq("o_custkey"))
        .select(year(col("o_orderdate")).as("year"), col("c_mktsegment").as("segment"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      Analytics.cubeAgg(f, Seq(col("year"), col("segment")),
        Seq(count(lit(1)).as("n_items"),
          sum(col("rev").cast("decimal(18,4)")).cast("double").as("revenue")))
    }),
    // §2.1 row 19e — winsorized prices (per-priority [p05, p95] clamp)
    "winsorize_prices" -> ((s, d) =>
      Analytics.winsorize(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice")),
        Seq(col("o_orderpriority")), col("o_totalprice"), 0.05, 0.95, "w_price")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"), col("w_price"))),
    // §2.1 row 19f — per-user daily gap fill with forward fill
    "gap_fill" -> ((s, d) =>
      Analytics.gapFill(Tables.events(s, d), col("user_id"), to_date(col("ts")),
        sum(col("value").cast("decimal(18,4)")).cast("double"))
        .select(col("key").as("user_id"), col("day"), col("day_value"),
          col("filled_value"), col("is_filled"))),
    // §2.2 row 29k — exact heavy hitters via the two-pass Misra-Gries sketch
    // (tokens above 1/40 of the stream; capacity 64 >= 40 keeps the no-miss
    // guarantee). The oracle recomputes the same exact counts directly.
    "heavy_hitters" -> ((s, d) =>
      TextAnalysis.heavyHitters(Tables.documents(s, d), "text", 40, 64)),
    // §2.2 row 29l — token-balanced training shards in md5 shuffle order
    "shard_assign" -> ((s, d) =>
      TextAnalysis.shardTokenBudget(Tables.documents(s, d), "doc_id", "text", 16)),
    // §2.2 row 25d — per-class prototype-distance outlier flags
    "centroid_outliers" -> ((s, d) =>
      Similarity.centroidOutliers(Tables.embeddings(s, d),
        "vec_id", "label", "embedding", 0.0)),
    // §2.1 row 19g — hot-key skew diagnostics (top-10 heaviest order keys)
    "skew_profile" -> ((s, d) =>
      Analytics.skewProfile(
        Tables.orders(s, d).select(col("o_custkey")), col("o_custkey"), "o_custkey", 10)),
    // §2.2 row 29m — power-of-two token-length histogram (packing planner)
    "len_histogram" -> ((s, d) =>
      TextAnalysis.tokenLengthHistogram(Tables.documents(s, d), "text")),
    // §2.1 row 17f — snapshot profile drift between the two source slices
    "schema_drift" -> ((s, d) =>
      Quality.profileDrift(srcA(s, d), srcB(s, d),
        Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment"))),
    // §2.2 row 29n — per-source document cap (domain-cap curation)
    "source_cap" -> ((s, d) =>
      TextAnalysis.sourceCap(Tables.documents(s, d), "doc_id", "source", 10)),
    // §2.2 row 27e — composite corpus quality gate with ordered reasons
    "corpus_gate" -> ((s, d) =>
      TextAnalysis.corpusGate(Tables.documents(s, d), "doc_id", "text",
        30, 0.05, 0.2)),
    // §2.2 row 27h — top-5 TF-IDF keyword extraction per document
    "tfidf_top" -> ((s, d) =>
      TextAnalysis.tfidfTop(Tables.documents(s, d), "doc_id", "text", 5)),
    // §2.2 row 29p — training-mixture reweighting to a target language
    // share (weights > 1 = epochs, < 1 = subsample rate)
    "mix_weights" -> ((s, d) =>
      TextAnalysis.mixWeights(Tables.documents(s, d), "lang", "text",
        Map("en" -> 0.5, "zh" -> 0.2, "fr" -> 0.1, "es" -> 0.1, "de" -> 0.1))),
    // §2.2 row 29t — mixture-epoch materialization: declared per-lang
    // weights become the physical training list (floor(w) full epochs +
    // one deterministic-Bernoulli partial epoch); map-side only
    "mix_epochs" -> ((s, d) =>
      TextAnalysis.materializeEpochs(Tables.documents(s, d), "lang", "doc_id",
        Map("en" -> 1.6, "zh" -> 2.3, "es" -> 0.5, "fr" -> 0.25, "de" -> 1.0))),
    // §2.2 row 29q — DSIR importance weights (hashed unigram+bigram
    // log-likelihood ratio vs the English subset as target): the model is
    // bounded at 1024 bucket rows no matter the corpus size; scoring is a
    // broadcast join, the only corpus shuffle is the per-doc sum
    "dsir_weights" -> ((s, d) =>
      TextAnalysis.dsirWeights(Tables.documents(s, d), "doc_id", "text",
        col("lang") === "en", 1024)),
    // §2.2 row 27j — model-based quality filter (fastText/CCNet-style
    // hashed linear classifier, APPLY side): pure projection, zero
    // shuffles — the pinned dyadic weight vector stands in for trained
    // parameters (same plan either way)
    "quality_classify" -> ((s, d) =>
      TextAnalysis.hashClassifier(Tables.documents(s, d), "doc_id", "text",
        classifierWeights)),
    // §2.2 row L27y — gate-agreement: Cohen's kappa between the heuristic
    // composite gate (corpus_gate keep) and the trained-classifier gate
    // (quality_classify kept) — does the classifier add information over
    // the heuristics, or re-measure them?
    "gate_agreement" -> ((s, d) => {
      val g = TextAnalysis.corpusGate(Tables.documents(s, d), "doc_id", "text",
        30, 0.05, 0.2).select(col("doc_id"), col("keep").as("_a"))
      val c = TextAnalysis.hashClassifier(Tables.documents(s, d), "doc_id", "text",
        classifierWeights).select(col("doc_id"), col("kept").as("_b"))
      Analytics.cohenKappa(g.join(c, Seq("doc_id")), col("_a"), col("_b"))
    }),
    // §2.2 row L27z — Spearman ρ between doc length and the classifier
    // score: the continuous form of L27y's question (is the quality
    // score re-measuring length?), tie-exact midranks
    "quality_length_corr" -> ((s, d) => {
      val c = TextAnalysis.hashClassifier(Tables.documents(s, d), "doc_id", "text",
        classifierWeights).select(col("doc_id"), col("logit"))
      // shuffle_hash hint: broadcasting the classifier side re-executes
      // its whole chain inside the one-task broadcast build (see
      // spearmanCorr's merge-hint note) — 8.2 s vs 0.6 s measured
      val j = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        .join(c.hint("shuffle_hash"), Seq("doc_id"))
      Analytics.spearmanCorr(j, col("n_chars"), col("logit"))
    }),
    // §2.2 row 27k — domain-level keep decision above the per-doc gate:
    // a source survives only when it's big enough to judge AND mostly
    // classifier-clean (the spam-domain wholesale drop)
    "domain_gate" -> ((s, d) =>
      TextAnalysis.domainGate(Tables.documents(s, d), "doc_id", "text",
        "source", "n_chars", classifierWeights)),
    // §2.2 row 29r — exact per-source length deciles (curriculum/eval-split
    // bucketing) via the two-phase rank, not a per-source global sort
    "quality_deciles" -> ((s, d) =>
      Analytics.ntileBuckets(Tables.documents(s, d),
        col("source"), col("n_chars"), col("doc_id"), 10)
        .select(col("id").as("doc_id"), col("stratum").as("source"),
          col("value").as("n_chars"), col("bucket").as("decile"))),
    // §2.1 row 17j — 7-day trailing revenue window per event type on the
    // gap-filled day spine (DECIMAL-exact through the sliding frame)
    "moving_avg" -> ((s, d) =>
      Analytics.movingAvg(Tables.events(s, d), col("event_type"), col("ts"),
        col("value"), 7)
        .select(col("key").as("event_type"), col("day"), col("n_events"),
          col("day_value"), col("win_sum"), col("win_avg"))),
    // §2.1 row 17m — EWMA smoothing + spike flags (round 16): the
    // recency-weighted companion to moving_avg — dyadic 2^-(k+1) lag
    // weights over the same gap-filled spine (power-of-two scaling is
    // EXACT on doubles; the left-assoc term chain replays in order), the
    // start renormalized by present weights, spike = today > 4x
    // yesterday's EWMA.
    "ewma_daily" -> ((s, d) =>
      Analytics.ewmaDaily(Tables.events(s, d), col("event_type"), col("ts"),
        col("value"), 16)
        .select(col("key").as("event_type"), col("day"), col("n_events"),
          col("day_value"), col("ewma"), col("spike"))),
    // §2.2 row 27i — CCNet-style perplexity bucketing: the corpus's own
    // unigram LM score (row 27d) cut into per-language terciles by the
    // exact-NTILE operator (row 29r) — bucket 3 = highest avg_logprob =
    // lowest perplexity ("head"), bucket 1 = "tail". The composition the
    // CCNet pipeline ships as its quality-stratified sampling input.
    "ppl_buckets" -> ((s, d) => {
      // lang rides lmScore's aggregation keys (carry) — no second corpus
      // scan and no doc-keyed join to re-attach it (round 11)
      val scored = TextAnalysis.lmScore(Tables.documents(s, d), "doc_id", "text",
        carry = Seq("lang"))
      Analytics.ntileBuckets(scored, col("lang"), col("avg_logprob"),
        col("doc_id"), 3)
        .select(col("id").as("doc_id"), col("stratum").as("lang"),
          col("value").as("avg_logprob"), col("bucket").as("ppl_bucket"))
    })
  )

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted keys (ingest_discovery, approx_stats,
    * bpe_train, bpe_segment) are non-SQL-expressible →
    * driver's weaker rows-only check (filesystem listing; approximate
    * by construction; genuinely iterative training). The
    * ENTIRE ANN family is row-hash-oracled: pinned seeded artifacts
    * (`ann_lsh` planes, `ann_ivf_fixed` centroids, `ann_pq_fixed`
    * codebooks, `ann_ivfpq_fixed` composed) AND trained artifacts
    * (`ann_ivf`, `ann_pq`, `ann_ivfpq`, `ann_ivfpq_res` — the SQL
    * xxhash64 replay re-selects each training sample, and the one-step
    * k-means re-runs with fold-order-pinned means, so training and
    * adaptive sizing are verified, not just search). BPE segmentation is
    * gated by `bpe_segment_fixed` (pinned merge list, recursive-CTE
    * replay) — only TRAINING is genuinely iterative. Winnowing is gated
    * by `winnow_overlap` + the fully-oracled md5-variant
    * `winnow_fingerprint`. `embedding_pca` is HASH-oracled since round
    * 18 (EmbeddingPcaSql's unrolled fixed-point power iteration); the
    * float Jacobi/whitening path stays spec-gated library surface with
    * its distributed pass covered by the oracled `embedding_cov`. */
  /** Pinned-centroid IVF search replay, parameterized by the corpus-scan
    * predicate — `ann_ivf_fixed` uses the plain split, `ann_filtered` adds
    * the metadata filter (pre-filtering: the index sees only qualifying
    * rows, the filtered-vector-search strategy that cannot starve top-k). */
  private def ivfFixedSql(corpusPred: String): String = {
    val centRows = graft.operators.Similarity.seededCentroids(16, 64)
      .map { case (cid, v) => s"($cid, [${v.mkString(", ")}])" }
      .mkString(",\n        ")
    s"""WITH cents(cid, cv) AS (VALUES
      |        $centRows),
      |q0 AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |    FROM embeddings WHERE vec_id < 5),
      |c0 AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv2
      |    FROM embeddings WHERE $corpusPred),
      |casim AS (SELECT neighbor_id, cid,
      |    row_number() OVER (PARTITION BY neighbor_id
      |      ORDER BY list_cosine_similarity(cv2, cv) DESC, cid) AS rn
      |    FROM c0, cents),
      |cell_of AS (SELECT neighbor_id, cid AS cell FROM casim WHERE rn = 1),
      |probes AS (SELECT query_id, cid AS cell FROM (
      |    SELECT query_id, cid, row_number() OVER (PARTITION BY query_id
      |      ORDER BY list_cosine_similarity(qv, cv) DESC, cid) AS rn
      |    FROM q0, cents) WHERE rn <= 4),
      |cand AS (SELECT query_id, neighbor_id
      |    FROM probes JOIN cell_of USING (cell)),
      |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv2) AS sim
      |    FROM cand JOIN q0 USING (query_id) JOIN c0 USING (neighbor_id)),
      |r AS (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
      |    ORDER BY sim DESC, neighbor_id) AS rank FROM s WHERE NOT isnan(sim))
      |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM r
      |WHERE rank <= 10""".stripMargin
  }

  /** Shared DuckDB CTE chain for the pinned-merge BPE oracles
    * (`bpe_segment_fixed`, `bpe_fertility`): explicit whitespace class
    * (RE2's \s lacks U+000B), per-word-instance table `wd`, distinct-word
    * `w0`/`init`, and the recursive merge state machine `fin`. */
  private def bpeFixedCtes: String = {
    val mergeRows = pinnedMerges.zipWithIndex
      .map { case ((l, r), i) => s"($i, '$l', '$r')" }.mkString(",\n        ")
    s"""m(rank, l, r) AS (VALUES
      |        $mergeRows),
      |d0 AS (SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+') AS toks FROM documents),
      |wd AS (SELECT doc_id, u.wi AS wi, u.w AS w FROM (
      |    SELECT doc_id, unnest([{'wi': i, 'w': toks[i]}
      |        for i in range(1, len(toks) + 1)]) AS u FROM d0)
      |  WHERE u.w <> ''),
      |w0 AS (SELECT DISTINCT w FROM wd),
      |init AS (SELECT w, ch[1:len(ch)-1] || [ch[len(ch)] || '</w>'] AS syms
      |    FROM (SELECT w, string_split(w, '') AS ch FROM w0)),
      |fin AS (
      |  WITH RECURSIVE st(w, syms, al, ar, done) AS (
      |    SELECT w, syms, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), false FROM init
      |    UNION ALL
      |    SELECT w,
      |      CASE WHEN pos IS NOT NULL
      |           THEN syms[1:pos-1] || [al || ar] || syms[pos+2:] ELSE syms END,
      |      CASE WHEN pos IS NOT NULL THEN al
      |           ELSE (SELECT mm.l FROM m mm WHERE mm.rank = br) END,
      |      CASE WHEN pos IS NOT NULL THEN ar
      |           ELSE (SELECT mm.r FROM m mm WHERE mm.rank = br) END,
      |      (pos IS NULL AND br IS NULL)
      |    FROM (SELECT w, syms, al, ar,
      |        list_min([i for i in range(1, len(syms))
      |                  if syms[i] = al AND syms[i+1] = ar]) AS pos,
      |        (SELECT min(mm.rank) FROM m mm WHERE len(
      |            [i for i in range(1, len(syms))
      |             if syms[i] = mm.l AND syms[i+1] = mm.r]) > 0) AS br
      |      FROM st WHERE NOT done))
      |  SELECT w, syms FROM st WHERE done)""".stripMargin
  }

  /** Pinned literal merge list for `bpe_segment_fixed` — rank order is
    * merge priority. Chosen a priori (common English pairs, NOT trained on
    * the corpus — the seeded-centroid discipline: artifacts pinned, the
    * search/rewrite machinery real), with deliberate stress cases: chained
    * merges (t+h → th+e</w>, i+n → in+g</w>), end-of-word-suffix merges,
    * and the self-pair l+l that exercises the non-overlapping
    * left-to-right rule on letter runs. */
  private[graft] val pinnedMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e</w>"), ("i", "n"), ("a", "n"), ("r", "e"),
    ("o", "n"), ("e", "r"), ("an", "d</w>"), ("e", "n"), ("o", "r"),
    ("t", "i"), ("e", "s</w>"), ("s", "t"), ("a", "r"), ("t", "e"),
    ("o", "f</w>"), ("in", "g</w>"), ("t", "o</w>"), ("i", "s</w>"),
    ("e", "d</w>"), ("a", "l"), ("l", "l"), ("c", "o"), ("th", "e"))

  /** 64-bit modular multiply in DuckDB HUGEINT limb arithmetic:
    * (a*b) mod 2^64 with a < 2^64 split into 32-bit limbs so no
    * intermediate exceeds HUGEINT range — the building block of the
    * SQL xxhash64 replay below. */
  private def mul64(a: String, b: String): String =
    s"((($a) % 4294967296) * $b + (((($a) // 4294967296) * $b) % 4294967296) * 4294967296) % 18446744073709551616"

  /** Spark `xxhash64(BIGINT)` (seed 42) replayed step-for-step in DuckDB —
    * the single-8-byte-block XXH64 path (mix with PRIME64_2/rotl31/PRIME64_1,
    * fold with rotl27*PRIME64_1+PRIME64_4, then the avalanche), each
    * multiply via [[mul64]], rotates as shift-sum, xors through UBIGINT.
    * Emits CTEs `$p0`..`hh` mapping (idCol rows of `src`) → signed BIGINT
    * `h` — bit-identical to Spark's value (verified against pyspark on
    * known vectors and by the ann_ivf oracle's hash-ordered sample).
    * This is what makes TRAINED-artifact oracles possible: the training
    * sample is selected BY this hash, so replaying it exactly lets DuckDB
    * re-run the whole k-means step rather than needing pinned literals. */
  private def xxhash64Ctes(src: String, idCol: String): String =
    s"""hx0 AS (SELECT $idCol, CAST($idCol AS HUGEINT)
      |      + CASE WHEN $idCol < 0 THEN 18446744073709551616 ELSE 0 END AS l FROM $src),
      |hx1 AS (SELECT $idCol, ${mul64("l", "14029467366897019727")} AS k1 FROM hx0),
      |hx2 AS (SELECT $idCol, ((k1 * 2147483648) % 18446744073709551616 + k1 // 8589934592) AS k2 FROM hx1),
      |hx3 AS (SELECT $idCol, ${mul64("k2", "11400714785074694791")} AS k3 FROM hx2),
      |hx4 AS (SELECT $idCol, CAST(xor(2870177450012600311::UBIGINT, CAST(k3 AS UBIGINT)) AS HUGEINT) AS h1 FROM hx3),
      |hx5 AS (SELECT $idCol, ((h1 * 134217728) % 18446744073709551616 + h1 // 137438953472) AS h2 FROM hx4),
      |hx6 AS (SELECT $idCol, (${mul64("h2", "11400714785074694791")} + 9650029242287828579) % 18446744073709551616 AS h3 FROM hx5),
      |hx7 AS (SELECT $idCol, CAST(xor(CAST(h3 AS UBIGINT), CAST(h3 // 8589934592 AS UBIGINT)) AS HUGEINT) AS h4 FROM hx6),
      |hx8 AS (SELECT $idCol, ${mul64("h4", "14029467366897019727")} AS h5 FROM hx7),
      |hx9 AS (SELECT $idCol, CAST(xor(CAST(h5 AS UBIGINT), CAST(h5 // 536870912 AS UBIGINT)) AS HUGEINT) AS h6 FROM hx8),
      |hxa AS (SELECT $idCol, ${mul64("h6", "1609587929392839161")} AS h7 FROM hx9),
      |hxb AS (SELECT $idCol, CAST(xor(CAST(h7 AS UBIGINT), CAST(h7 // 4294967296 AS UBIGINT)) AS HUGEINT) AS h8 FROM hxa),
      |hh AS (SELECT $idCol, CAST(CASE WHEN h8 >= 9223372036854775808
      |      THEN h8 - 18446744073709551616 ELSE h8 END AS BIGINT) AS h FROM hxb)""".stripMargin

  /** Shared DuckDB replay of the pinned-codebook ADC search (`ann_pq_fixed`
    * / `ann_ivfpq_fixed`): the seeded 8×16×8 codebooks inline as literals
    * (the ann_lsh / ann_ivf_fixed pinned-artifact precedent, applied to
    * PQ). Every floating-point reduction is ORDER-PINNED with list_reduce
    * (ascending element index; ascending subspace j via list(... ORDER BY
    * j)) to mirror the Scala kernels' sequential loops — PqEncodeEval's
    * argmin-L2 (ties to lowest code = ORDER BY d2, c), PqLutExpr's dots,
    * AdcSumExpr's j-walk, reconNorm's per-code norm², l2Norm's fold — so
    * float parity holds by construction, not engine coincidence.
    * `candFrom` supplies the candidate (query_id, neighbor_id) pairs: the
    * full query×corpus product for flat PQ, the probed-cell join for
    * IVF-PQ; shortlist 80 = pqTopKWith's max(8k, 64) default at k=10. */
  private def pqFixedOracle(extraCtes: String, candFrom: String): String = {
    val bookRows = graft.operators.Similarity.seededBooks(8, 16, 8)
      .zipWithIndex.flatMap { case (book, j) =>
        book.zipWithIndex.map { case (bv, c) => s"($j, $c, [${bv.mkString(", ")}])" }
      }.mkString(",\n        ")
    s"""WITH books(j, c, bv) AS (VALUES
      |        $bookRows),
      |q0 AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |    FROM embeddings WHERE vec_id < 5),
      |c0 AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      |    FROM embeddings WHERE vec_id >= 5),$extraCtes
      |${adcSearchCtes(candFrom)}""".stripMargin
  }

  /** Global-codebook ADC search chain (encode → reconstructed-norm cosine
    * → shortlist 80 → exact re-rank 10), consuming CTEs `books(j, c, bv)`,
    * `c0`, `q0` — shared verbatim by the pinned (`ann_pq_fixed` /
    * `ann_ivfpq_fixed`) and trained (`ann_pq` / `ann_ivfpq`) oracles;
    * only the books source differs. */
  private def adcSearchCtes(candFrom: String): String =
    s"""enc AS (SELECT neighbor_id, j, c, row_number() OVER (PARTITION BY neighbor_id, j
      |      ORDER BY list_reduce(
      |        [(coalesce(cv[j*8+i], 0.0) - bv[i]) * (coalesce(cv[j*8+i], 0.0) - bv[i])
      |         for i in range(1, 9)], (a, b) -> a + b) ASC, c ASC) AS rn
      |    FROM c0, books),
      |codes AS (SELECT neighbor_id, j, c AS code FROM enc WHERE rn = 1),
      |vn AS (SELECT neighbor_id,
      |      sqrt(list_reduce(list(n2 ORDER BY j), (a, b) -> a + b)) AS vnormr
      |    FROM (SELECT neighbor_id, codes.j AS j,
      |        list_reduce([bv[i] * bv[i] for i in range(1, 9)], (a, b) -> a + b) AS n2
      |      FROM codes JOIN books ON books.j = codes.j AND books.c = codes.code)
      |    GROUP BY neighbor_id),
      |qn AS (SELECT query_id,
      |      sqrt(list_reduce([x * x for x in qv], (a, b) -> a + b)) AS qnorm
      |    FROM q0),
      |pj AS (SELECT cand.query_id, cand.neighbor_id, codes.j AS j,
      |      list_reduce([coalesce(qv[codes.j*8+i], 0.0) * bv[i] for i in range(1, 9)],
      |        (a, b) -> a + b) AS lj
      |    FROM $candFrom
      |      JOIN codes ON codes.neighbor_id = cand.neighbor_id
      |      JOIN books ON books.j = codes.j AND books.c = codes.code
      |      JOIN q0 ON q0.query_id = cand.query_id),
      |adc AS (SELECT query_id, neighbor_id,
      |      list_reduce(list(lj ORDER BY j), (a, b) -> a + b) AS adcsum
      |    FROM pj GROUP BY query_id, neighbor_id),
      |sc AS (SELECT query_id, neighbor_id, adcsum / (qnorm * vnormr) AS asim
      |    FROM adc JOIN qn USING (query_id) JOIN vn USING (neighbor_id)),
      |short AS (SELECT query_id, neighbor_id FROM (
      |      SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
      |        ORDER BY asim DESC, neighbor_id) AS srn
      |      FROM sc WHERE NOT isnan(asim)) WHERE srn <= 80),
      |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
      |    FROM short JOIN q0 USING (query_id) JOIN c0 USING (neighbor_id)),
      |r AS (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
      |    ORDER BY sim DESC, neighbor_id) AS rank FROM s WHERE NOT isnan(sim))
      |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM r
      |WHERE rank <= 10""".stripMargin

  /** `Similarity.trainCentroids` + IVF routing replayed in SQL, consuming
    * `c0`/`q0`/`hh`: the hash-ordered bounded sample, seed selection, ONE
    * k-means step with fold-order-pinned per-dim means, adaptiveCells /
    * adaptiveProbes sizing re-derived from the corpus count, then cell
    * assignment + per-query probe sets. Emits `cents(cid, cv0)`, `np`,
    * `cell_of`, `probes` — shared by the ann_ivf / ann_ivfpq /
    * ann_ivfpq_res oracles. BOTH training regimes replay: past
    * centroidLiteralBudget (4096) cells — corpus ≳ 16.8M rows —
    * `trainCentroids` (Similarity.scala:333) skips the k-means step and
    * the numCells smallest-hash vectors ARE the centroids (hash-order
    * cid), so `cents` branches on the derived numcells exactly as the
    * Scala does; a large-SF corpus therefore stays oracle-valid instead
    * of silently drifting into a regime the replay doesn't cover. */
  private val ivfTrainCtes: String =
    """nc AS (SELECT least(65536, greatest(16, CAST(ceil(sqrt(count(*))) AS INT))) AS numcells FROM c0),
      |samp AS (SELECT neighbor_id, cv, row_number() OVER (ORDER BY h) AS sp
      |    FROM c0 JOIN hh USING (neighbor_id), nc
      |    QUALIFY sp <= numcells * 32),
      |seeds AS (SELECT sp - 1 AS cid, cv AS sv,
      |      sqrt(list_reduce([x * x for x in cv], (a, b) -> a + b)) AS snorm
      |    FROM samp, nc WHERE sp <= numcells),
      |asg AS (SELECT sp, cid FROM (
      |    SELECT samp.sp AS sp, seeds.cid AS cid, row_number() OVER (PARTITION BY samp.sp
      |        ORDER BY list_reduce([samp.cv[i] * seeds.sv[i]
      |            for i in range(1, least(len(samp.cv), len(seeds.sv)) + 1)], (a, b) -> a + b)
      |          / (sqrt(list_reduce([x * x for x in samp.cv], (a, b) -> a + b)) * seeds.snorm) DESC,
      |          seeds.cid) AS arn
      |    FROM samp, seeds) WHERE arn = 1),
      |cdim AS (SELECT cid, u.di AS di, u.v AS v, sp FROM (
      |    SELECT asg.cid AS cid, samp.sp AS sp,
      |      unnest([{'di': i, 'v': samp.cv[i]} for i in range(1, len(samp.cv) + 1)]) AS u
      |    FROM asg JOIN samp USING (sp))),
      |km AS (SELECT cid, list(m ORDER BY di) AS cv0 FROM (
      |    SELECT cid, di, list_reduce(list(v ORDER BY sp), (a, b) -> a + b) / count(*) AS m
      |    FROM cdim GROUP BY cid, di) GROUP BY cid),
      |cents AS (
      |  SELECT cid, cv0 FROM km, nc WHERE numcells <= 4096
      |  UNION ALL
      |  SELECT cid, sv AS cv0 FROM seeds, nc WHERE numcells > 4096),
      |np AS (SELECT greatest(4, CAST(ceil(count(*) / 8.0) AS INT)) AS nprobe FROM cents),
      |casim AS (SELECT neighbor_id, cid,
      |    row_number() OVER (PARTITION BY neighbor_id
      |      ORDER BY list_cosine_similarity(cv, cv0) DESC, cid) AS crn
      |    FROM c0, cents),
      |cell_of AS (SELECT neighbor_id, cid AS cell FROM casim WHERE crn = 1),
      |probes AS (SELECT query_id, cid AS cell FROM (
      |    SELECT query_id, cid, row_number() OVER (PARTITION BY query_id
      |      ORDER BY list_cosine_similarity(qv, cv0) DESC, cid) AS qrn
      |    FROM q0, cents), np WHERE qrn <= nprobe)""".stripMargin

  /** `Similarity.pqTrain` replayed in SQL over a (neighbor_id, tv) CTE
    * `tsrc` (m=8, ksub=16, sub=8 — the query surface's pinned shape):
    * 512-row hash sample (shares the `hh` chain — pqTrain hashes the SAME
    * id column), per-subspace zero-padded slices, seeds = smallest-hash
    * 16, argmin-L2 one-step k-means with sample-order-pinned means, empty
    * codes keeping their seeds. Emits `books(j, c, bv)` — the trained
    * twin of the seeded literal table, feeding the same
    * [[adcSearchCtes]]. */
  private def pqTrainCtes(tsrc: String): String =
    s"""psamp AS (SELECT t.neighbor_id AS neighbor_id, t.tv AS tv, row_number() OVER (ORDER BY h) AS psp
      |    FROM $tsrc t JOIN hh ON hh.neighbor_id = t.neighbor_id
      |    QUALIFY psp <= 512),
      |jj AS (SELECT unnest(range(0, 8)) AS j),
      |slc AS (SELECT psp, j, [coalesce(tv[j*8+i], 0.0) for i in range(1, 9)] AS sl FROM psamp, jj),
      |pseeds AS (SELECT j, psp - 1 AS c, sl AS sv FROM slc WHERE psp <= 16),
      |pasg AS (SELECT psp, j, c FROM (
      |    SELECT slc.psp AS psp, slc.j AS j, pseeds.c AS c, row_number() OVER (PARTITION BY slc.psp, slc.j
      |        ORDER BY list_reduce([(slc.sl[i] - pseeds.sv[i]) * (slc.sl[i] - pseeds.sv[i])
      |            for i in range(1, 9)], (a, b) -> a + b) ASC, pseeds.c ASC) AS prn
      |    FROM slc JOIN pseeds ON pseeds.j = slc.j) WHERE prn = 1),
      |pexp AS (SELECT psp, j, u.di AS di, u.v AS v FROM (
      |    SELECT psp, j, unnest([{'di': i, 'v': sl[i]} for i in range(1, 9)]) AS u FROM slc)),
      |pm0 AS (SELECT pasg.j AS j, pasg.c AS c, pexp.di AS di,
      |      list_reduce(list(pexp.v ORDER BY pexp.psp), (a, b) -> a + b) / count(*) AS mv
      |    FROM pasg JOIN pexp ON pexp.psp = pasg.psp AND pexp.j = pasg.j
      |    GROUP BY 1, 2, 3),
      |pmean AS (SELECT j, c, list(mv ORDER BY di) AS mv FROM pm0 GROUP BY j, c),
      |books AS (SELECT pseeds.j AS j, pseeds.c AS c, coalesce(pmean.mv, pseeds.sv) AS bv
      |    FROM pseeds LEFT JOIN pmean ON pmean.j = pseeds.j AND pmean.c = pseeds.c)""".stripMargin

  private val annQcCtes: String =
    """q0 AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |    FROM embeddings WHERE vec_id < 5),
      |c0 AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      |    FROM embeddings WHERE vec_id >= 5)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // ann_ivf — the TRAINED-centroid IVF search, re-derived END-TO-END
    // including training (round 12; closes SURVEY §7.6's "k-means is not
    // SQL-oracle-able" question in the negative for THIS trainer):
    // trainCentroids is one deterministic hash-ordered sample (xxhash64
    // replayed bit-exact above) + seed selection (numCells smallest
    // hashes) + ONE k-means step (cosine assignment, tie to lowest cell;
    // per-dim means summed in SAMPLE order via list(... ORDER BY sp) +
    // list_reduce — matching the Scala fold order), with numCells/nprobe
    // derived from the corpus count exactly as adaptiveCells /
    // adaptiveProbes do — so even the ADAPTIVE SIZING is oracled. The
    // search tail is the ann_ivf_fixed chain under the computed centroids.
    "ann_ivf" ->
      s"""WITH $annQcCtes,
        |${xxhash64Ctes("c0", "neighbor_id")},
        |$ivfTrainCtes,
        |cand AS (SELECT query_id, neighbor_id FROM probes JOIN cell_of USING (cell)),
        |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
        |    FROM cand JOIN q0 USING (query_id) JOIN c0 USING (neighbor_id)),
        |r AS (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) AS rank FROM s WHERE NOT isnan(sim))
        |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM r
        |WHERE rank <= 10""".stripMargin,
    // ann_pq — the TRAINED-codebook flat PQ search, oracled with its
    // training (round 12): pqTrain's hash sample/seeds/one-k-means-step
    // replay via pqTrainCtes (per-subspace argmin-L2, sample-order means,
    // empty codes keep seeds), then the SAME ADC chain as ann_pq_fixed.
    "ann_pq" ->
      s"""WITH $annQcCtes,
        |${xxhash64Ctes("c0", "neighbor_id")},
        |tsrc AS (SELECT neighbor_id, cv AS tv FROM c0),
        |${pqTrainCtes("tsrc")},
        |${adcSearchCtes("(SELECT query_id, neighbor_id FROM q0, c0) AS cand")}""".stripMargin,
    // ann_ivfpq — trained centroids routing trained global codebooks:
    // both trainings replay (they share the xxhash64 chain — the sample
    // selections hash the same id column), candidates are the probed-cell
    // pairs, the ADC chain is shared with ann_pq/ann_pq_fixed.
    "ann_ivfpq" ->
      s"""WITH $annQcCtes,
        |${xxhash64Ctes("c0", "neighbor_id")},
        |$ivfTrainCtes,
        |tsrc AS (SELECT neighbor_id, cv AS tv FROM c0),
        |${pqTrainCtes("tsrc")},
        |${adcSearchCtes("(SELECT query_id, neighbor_id FROM probes JOIN cell_of USING (cell)) AS cand")}""".stripMargin,
    // ann_ivfpq_res — the residual refinement, oracled end-to-end:
    // residuals (x − centroid(cell), zero-padded zip) feed the SAME
    // pqTrainCtes; the search scores inner-product ADC — per-(query,
    // cell) ⟨q,c⟩ scalar + per-query LUT over the residual codes —
    // against each row's EXACT norm, with the vnorm>0 NaN guard the
    // Scala path applies, then the shared shortlist/re-rank tail.
    "ann_ivfpq_res" ->
      s"""WITH $annQcCtes,
        |${xxhash64Ctes("c0", "neighbor_id")},
        |$ivfTrainCtes,
        |res AS (SELECT c0.neighbor_id AS neighbor_id,
        |      [coalesce(cv[i], 0.0) - coalesce(cv0[i], 0.0)
        |       for i in range(1, greatest(len(cv), len(cv0)) + 1)] AS tv
        |    FROM c0 JOIN cell_of USING (neighbor_id) JOIN cents ON cents.cid = cell_of.cell),
        |${pqTrainCtes("res")},
        |enc AS (SELECT res.neighbor_id AS neighbor_id, j, c, row_number() OVER (PARTITION BY res.neighbor_id, j
        |      ORDER BY list_reduce(
        |        [(coalesce(tv[j*8+i], 0.0) - bv[i]) * (coalesce(tv[j*8+i], 0.0) - bv[i])
        |         for i in range(1, 9)], (a, b) -> a + b) ASC, c ASC) AS rn
        |    FROM res, books),
        |codes AS (SELECT neighbor_id, j, c AS code FROM enc WHERE rn = 1),
        |vn AS (SELECT neighbor_id, sqrt(list_reduce([x * x for x in cv], (a, b) -> a + b)) AS vnorm FROM c0),
        |qn AS (SELECT query_id, sqrt(list_reduce([x * x for x in qv], (a, b) -> a + b)) AS qnorm FROM q0),
        |qdc AS (SELECT query_id, cell,
        |      list_reduce([coalesce(qv[i], 0.0) * coalesce(cv0[i], 0.0)
        |        for i in range(1, greatest(len(qv), len(cv0)) + 1)], (a, b) -> a + b) AS qdotc
        |    FROM probes JOIN cents ON cents.cid = probes.cell JOIN q0 USING (query_id)),
        |cand AS (SELECT query_id, neighbor_id, cell FROM probes JOIN cell_of USING (cell)),
        |pj AS (SELECT cand.query_id, cand.neighbor_id, codes.j AS j,
        |      list_reduce([coalesce(qv[codes.j*8+i], 0.0) * bv[i] for i in range(1, 9)],
        |        (a, b) -> a + b) AS lj
        |    FROM cand
        |      JOIN codes ON codes.neighbor_id = cand.neighbor_id
        |      JOIN books ON books.j = codes.j AND books.c = codes.code
        |      JOIN q0 ON q0.query_id = cand.query_id),
        |adc AS (SELECT query_id, neighbor_id, list_reduce(list(lj ORDER BY j), (a, b) -> a + b) AS adcsum
        |    FROM pj GROUP BY query_id, neighbor_id),
        |sc AS (SELECT adc.query_id AS query_id, adc.neighbor_id AS neighbor_id,
        |      CASE WHEN vnorm > 0 THEN (qdotc + adcsum) / (qnorm * vnorm) ELSE NULL END AS asim
        |    FROM adc
        |      JOIN cand ON cand.query_id = adc.query_id AND cand.neighbor_id = adc.neighbor_id
        |      JOIN qdc ON qdc.query_id = adc.query_id AND qdc.cell = cand.cell
        |      JOIN qn ON qn.query_id = adc.query_id
        |      JOIN vn ON vn.neighbor_id = adc.neighbor_id),
        |short AS (SELECT query_id, neighbor_id FROM (
        |      SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
        |        ORDER BY asim DESC, neighbor_id) AS srn
        |      FROM sc WHERE asim IS NOT NULL AND NOT isnan(asim)) WHERE srn <= 80),
        |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
        |    FROM short JOIN q0 USING (query_id) JOIN c0 USING (neighbor_id)),
        |r AS (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) AS rank FROM s WHERE NOT isnan(sim))
        |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM r
        |WHERE rank <= 10""".stripMargin,
    // PQ search under the pinned seeded codebooks, re-derived end-to-end
    // (see pqFixedOracle): every corpus row is a candidate for every query
    // (flat PQ — no routing), exactly pqTopKWith's crossJoin.
    "ann_pq_fixed" -> pqFixedOracle("",
      "(SELECT query_id, neighbor_id FROM q0, c0) AS cand"),
    // IVF-PQ under pinned centroids AND codebooks: candidates are the
    // probed-cell pairs (cell = argmax cosine, tie to lowest cell id;
    // probes = each query's top-4 cells — the exact ann_ivf_fixed routing
    // CTEs), then the same ADC → shortlist → re-rank chain.
    "ann_ivfpq_fixed" -> {
      val centRows = graft.operators.Similarity.seededCentroids(16, 64)
        .map { case (cid, v) => s"($cid, [${v.mkString(", ")}])" }
        .mkString(",\n        ")
      pqFixedOracle(
        s"""
          |cents(cid, cv0) AS (VALUES
          |        $centRows),
          |casim AS (SELECT neighbor_id, cid,
          |    row_number() OVER (PARTITION BY neighbor_id
          |      ORDER BY list_cosine_similarity(cv, cv0) DESC, cid) AS crn
          |    FROM c0, cents),
          |cell_of AS (SELECT neighbor_id, cid AS cell FROM casim WHERE crn = 1),
          |probes AS (SELECT query_id, cid AS cell FROM (
          |    SELECT query_id, cid, row_number() OVER (PARTITION BY query_id
          |      ORDER BY list_cosine_similarity(qv, cv0) DESC, cid) AS qrn
          |    FROM q0, cents) WHERE qrn <= 4),""".stripMargin,
        "(SELECT query_id, neighbor_id FROM probes JOIN cell_of USING (cell)) AS cand")
    },
    // BPE segmentation under the pinned merge list, replayed as a per-word
    // rewrite system: distinct words seed a recursive state machine
    // (syms, active pair) — while the active pair occurs, merge its
    // LEFTMOST occurrence (iterated leftmost single-merge ≡ one
    // non-overlapping left-to-right pass, because merging (a,b) can never
    // create a NEW (a,b) adjacency: the merged symbol a||b is distinct
    // from both a and b, so remaining occurrences are exactly the
    // original non-overlapped ones); when the active pair is exhausted,
    // re-derive the lowest-rank pair present — the same syms state at
    // which the Scala expression recomputes after each full pass. Docs
    // reassemble by word position; wordless docs keep n_pieces=0 via the
    // LEFT JOIN.
    "bpe_segment_fixed" ->
      s"""WITH $bpeFixedCtes,
        |agg AS (SELECT doc_id, CAST(sum(len(syms)) AS INT) AS n_pieces,
        |      flatten(list(syms ORDER BY wi)) AS pieces
        |    FROM wd JOIN fin USING (w) GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.n_pieces, 0) AS n_pieces,
        |  coalesce(array_to_string(a.pieces[1:12], ' '), '') AS head_pieces
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,
    // Same pinned-merge segmentation machinery, aggregated per language:
    // fertility is one double division of exactly-summed integer counts.
    "bpe_fertility" ->
      s"""WITH $bpeFixedCtes,
        |agg AS (SELECT doc_id, CAST(sum(len(syms)) AS BIGINT) AS np,
        |      CAST(count(*) AS BIGINT) AS nw
        |    FROM wd JOIN fin USING (w) GROUP BY doc_id)
        |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(coalesce(a.nw, 0)) AS BIGINT) AS n_words,
        |  CAST(SUM(coalesce(a.np, 0)) AS BIGINT) AS n_pieces,
        |  CAST(SUM(coalesce(a.np, 0)) AS DOUBLE) / SUM(coalesce(a.nw, 0))
        |    AS fertility
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |GROUP BY d.lang""".stripMargin,
    // The SAME integer Viterbi DP as Bpe.unigramSegment, as a recursive
    // CTE over word prefixes: state = cost·1024+pieces combined integers
    // (one per prefix), piece lookups via a generated CASE chain from the
    // pinned inventory, list_min skipping not-in-inventory NULLs exactly
    // as Spark's array_min does. Float-free end to end.
    "unigram_segment" -> {
      val pieceCase = graft.operators.Bpe.pinnedPieces
        .map { case (p, c) => s"WHEN '$p' THEN $c" }.mkString(" ")
      // shared DP constants interpolated from Bpe — a default change there
      // reaches this CTE automatically (ADVICE r15: no silent desync)
      val base = graft.operators.Bpe.PieceScoreBase
      val maxW = graft.operators.Bpe.MaxWordLen
      val fb = graft.operators.Bpe.DefaultFallbackCost
      val mpl = graft.operators.Bpe.DefaultMaxPieceLen
      s"""WITH d0 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
        |tw AS (SELECT doc_id, u AS w FROM
        |    (SELECT doc_id, unnest(toks) AS u FROM d0)
        |  WHERE u <> '' AND length(u) < $maxW),
        |w0 AS (SELECT DISTINCT w FROM tw),
        |dp AS (
        |  WITH RECURSIVE st(w, i, best) AS (
        |    SELECT w, 0, [CAST(0 AS BIGINT)] FROM w0
        |    UNION ALL
        |    SELECT w, i + 1,
        |      best || [list_min([best[j+1] +
        |        (CASE WHEN i + 1 - j = 1
        |              THEN coalesce(CASE substr(w, j+1, 1) $pieceCase END, $fb)
        |              ELSE CASE substr(w, j+1, i+1-j) $pieceCase END END) * $base + 1
        |        for j in range(greatest(0, i + 1 - $mpl), i + 1)])]
        |    FROM st WHERE i < length(w))
        |  SELECT w, best[length(w) + 1] AS fin FROM st WHERE i = length(w)),
        |seg AS (SELECT w, fin % $base AS np,
        |    CAST((fin - fin % $base) / $base AS BIGINT) AS cost FROM dp)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(s.np) AS BIGINT) AS n_pieces,
        |  CAST(sum(s.cost) AS BIGINT) AS total_cost
        |FROM tw t JOIN seg s USING (w) GROUP BY t.doc_id""".stripMargin
    },
    // WordPiece: the greedy automaton replays as a recursive CTE — state
    // (pos, np, unk) advances by the longest in-vocab match (list_max
    // over the j candidates, ##-prefixed past position 0); a NULL best
    // sets unk and halts (pos goes NULL, failing the recursion guard);
    // final rows are exactly (unk OR pos = L). Vocabulary and maxPieceLen
    // interpolate from Bpe.pinnedWordPieces / DefaultMaxPieceLen — the
    // unigram_segment no-desync rule.
    "wordpiece_segment" -> {
      val vocabList = graft.operators.Bpe.pinnedWordPieces
        .map(p => s"'$p'").mkString(", ")
      val mpl = graft.operators.Bpe.DefaultMaxPieceLen
      val js = (1 to mpl).mkString(", ")
      val maxW = graft.operators.Bpe.MaxWordLen
      s"""WITH d0 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
        |tw AS (SELECT doc_id, u AS w FROM
        |    (SELECT doc_id, unnest(toks) AS u FROM d0)
        |  WHERE u <> '' AND length(u) < $maxW),
        |w0 AS (SELECT DISTINCT w FROM tw),
        |fin AS (
        |  WITH RECURSIVE st(w, L, pos, np, unk) AS (
        |    SELECT w, CAST(length(w) AS INT), 0, CAST(0 AS BIGINT), FALSE FROM w0
        |    UNION ALL
        |    SELECT w, L, CAST(pos + b AS INT), np + 1, b IS NULL FROM (
        |      SELECT w, L, pos, np,
        |        list_max([CASE WHEN pos + j <= L AND list_contains([$vocabList],
        |            CASE WHEN pos = 0 THEN substr(w, 1, j)
        |                 ELSE '##' || substr(w, pos + 1, j) END)
        |          THEN j END for j in [$js]]) AS b
        |      FROM st WHERE pos < L AND NOT unk) q)
        |  SELECT w, CASE WHEN unk THEN CAST(1 AS BIGINT) ELSE np END AS np, unk
        |  FROM st WHERE unk OR pos = L)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(f.np) AS BIGINT) AS n_pieces,
        |  CAST(sum(CASE WHEN f.unk THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
        |FROM tw t JOIN fin f USING (w) GROUP BY t.doc_id""".stripMargin
    },
    // ann_lsh re-derived end-to-end: the SAME 8×64 hyperplane constants
    // (java.util.Random(7) — deterministic across JVMs) rebuild every
    // signature as a bit-int; the multiprobe candidate set (query bucket
    // flipped in ≤2 positions) is EXACTLY the corpus rows within hamming
    // distance 2, so a bit_count(xor) join replaces probe enumeration;
    // cosine + (sim DESC, id) rank as in ann_topk. Sign parity of the dot
    // products holds because both engines sum index-ascending in doubles
    // and a sign flip would need |dot| below the last-ulp rounding gap.
    // DUCKDB-VERSION SENSITIVITY: this and ann_ivf_fixed lean on
    // list_dot_product / list_cosine_similarity summing index-ascending
    // in plain doubles (true of DuckDB 1.x's scalar implementation); a
    // future DuckDB that vectorizes them (pairwise/SIMD summation) could
    // flip a near-zero hyperplane dot's sign or a near-tie rank with NO
    // Spark-side change — triage a sudden red here as oracle-engine
    // drift first, not a Spark regression. (ann_pq_fixed/ann_ivfpq_fixed
    // are immune where they use list_reduce, which pins the order, but
    // share the exposure through list_cosine_similarity re-ranks.)
    "ann_lsh" -> {
      val planeRows = graft.operators.Similarity.hyperplanes(8, 64).zipWithIndex
        .map { case (p, i) => s"($i, [${p.mkString(", ")}])" }
        .mkString(",\n        ")
      s"""WITH planes(pid, pv) AS (VALUES
        |        $planeRows),
        |q0 AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |    FROM embeddings WHERE vec_id < 5),
        |c0 AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        |    FROM embeddings WHERE vec_id >= 5),
        |qs AS (SELECT query_id, bit_or(CASE WHEN list_dot_product(qv, pv) >= 0
        |      THEN (1::UBIGINT << pid) ELSE 0::UBIGINT END) AS sig
        |    FROM q0, planes GROUP BY query_id),
        |cs AS (SELECT neighbor_id, bit_or(CASE WHEN list_dot_product(cv, pv) >= 0
        |      THEN (1::UBIGINT << pid) ELSE 0::UBIGINT END) AS sig
        |    FROM c0, planes GROUP BY neighbor_id),
        |cand AS (SELECT query_id, neighbor_id FROM qs JOIN cs
        |    ON bit_count(xor(qs.sig, cs.sig)) <= 2),
        |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
        |    FROM cand JOIN q0 USING (query_id) JOIN c0 USING (neighbor_id)),
        |r AS (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) AS rank FROM s WHERE NOT isnan(sim))
        |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM r
        |WHERE rank <= 10""".stripMargin
    },
    "normalize_strings" ->
      """SELECT c_custkey,
        |  regexp_replace(trim(c_name), '\s+', ' ', 'g') AS name_norm,
        |  nullif(regexp_replace(c_name, '[^0-9]', '', 'g'), '') AS id_digits,
        |  lower(trim(c_mktsegment)) AS seg_norm
        |FROM customer""".stripMargin,
    "coerce_types" ->
      """SELECT event_id,
        |  regexp_extract(props, '[0-9]+', 0) AS k_raw,
        |  coalesce(TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS INT), 0) AS k_int,
        |  coalesce(TRY_CAST(event_type AS INT), -1) AS bad_int,
        |  coalesce(TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS DOUBLE), 0.0) AS k_dbl
        |FROM events""".stripMargin,
    "parse_timestamps" ->
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso,
        |  CAST(date_trunc('second', ts) AS TIMESTAMP) AS parsed,
        |  TIMESTAMP '1970-01-01 00:00:00' AS parsed_fallback
        |FROM events""".stripMargin,
    "dual_format_dispatch" ->
      """SELECT p_partkey AS id, trim(p_name) AS ten_mon, CAST(NULL AS INT) AS loai_id,
        |  p_retailprice AS gia, 'csv' AS fmt FROM part WHERE p_partkey % 2 = 0
        |UNION ALL
        |SELECT p_partkey AS id, trim(p_name) AS ten_mon, CAST(p_size AS INT) AS loai_id,
        |  p_retailprice AS gia, 'sql' AS fmt FROM part WHERE p_partkey % 2 = 1""".stripMargin,
    "staged_read" ->
      """SELECT *, 'csv' AS _source, 'run_001' AS _run_id,
        |  TIMESTAMP '2026-01-01 00:00:00' AS _extract_time FROM customer""".stripMargin,
    "corpus_diff" ->
      """WITH v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 19 = 0),
        |o AS (SELECT doc_id, md5(CASE WHEN text IS NULL THEN 'N'
        |  ELSE 'V' || CAST(strlen(text) AS VARCHAR) || ':' || text END) AS oh
        |  FROM documents),
        |n AS (SELECT doc_id, md5(CASE WHEN text IS NULL THEN 'N'
        |  ELSE 'V' || CAST(strlen(text) AS VARCHAR) || ':' || text END) AS nh
        |  FROM v2)
        |SELECT doc_id,
        |  CASE WHEN oh IS NULL THEN 'added'
        |       WHEN nh IS NULL THEN 'removed'
        |       WHEN oh <> nh THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n USING (doc_id)""".stripMargin,
    "merged_union" -> (SrcCte +
      """
        |SELECT 'CSV' AS source, * FROM src_a
        |UNION ALL
        |SELECT 'SQL' AS source, * FROM src_b""".stripMargin),
    "recon_fuzzy" -> (SrcCte +
      """,
        |a AS (SELECT c_custkey AS id_a, c_name AS name_a,
        |    CAST(c_nationkey AS VARCHAR) || ':' || right(c_name, 6) AS blk FROM src_a),
        |b0 AS (SELECT c_custkey, CASE WHEN c_custkey % 7 = 0
        |      THEN substr(c_name, 1, 4) || substr(c_name, 6, 1000) ELSE c_name END AS c_name,
        |    c_nationkey FROM src_b),
        |b AS (SELECT c_custkey AS id_b, c_name AS name_b,
        |    CAST(c_nationkey AS VARCHAR) || ':' || right(c_name, 6) AS blk FROM b0)
        |SELECT id_a, id_b, name_a, name_b,
        |  CAST(levenshtein(name_a, name_b) AS INT) AS dist
        |FROM a JOIN b USING (blk)
        |WHERE levenshtein(name_a, name_b) <= 2""".stripMargin),
    // The literal definition: brute-force all pairs under the length
    // prefilter — completeness is exactly what the Spark side's prefix
    // filtering must reproduce.
    "edit_join" ->
      """WITH s AS (SELECT s_suppkey AS id, s_name AS name FROM supplier)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
        |FROM s a JOIN s b ON a.id < b.id
        |  AND abs(length(a.name) - length(b.name)) <= 1
        |WHERE levenshtein(a.name, b.name) <= 1""".stripMargin,
    "recon_inner" -> (SrcCte +
      """
        |SELECT a.c_custkey AS c_custkey,
        |  a.c_name AS left_c_name, b.c_name AS right_c_name,
        |  a.c_acctbal AS left_c_acctbal, b.c_acctbal AS right_c_acctbal
        |FROM src_a a JOIN src_b b ON a.c_custkey = b.c_custkey
        |WHERE a.c_name IS DISTINCT FROM b.c_name
        |   OR a.c_acctbal IS DISTINCT FROM b.c_acctbal""".stripMargin),
    "recon_only_left" -> (SrcCte +
      """
        |SELECT c_custkey, c_name, c_mktsegment FROM src_a a
        |WHERE NOT EXISTS (SELECT 1 FROM src_b b WHERE b.c_custkey = a.c_custkey)""".stripMargin),
    "recon_only_right" -> (SrcCte +
      """
        |SELECT c_custkey, c_name, c_mktsegment FROM src_b b
        |WHERE NOT EXISTS (SELECT 1 FROM src_a a WHERE a.c_custkey = b.c_custkey)""".stripMargin),
    "per_source_agg" -> (SrcCte + """,
        |merged AS (SELECT 'CSV' AS source, * FROM src_a UNION ALL SELECT 'SQL' AS source, * FROM src_b)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS total_count,
        |  CAST(SUM(CASE WHEN source = 'CSV' THEN 1 ELSE 0 END) AS BIGINT) AS csv_count,
        |  CAST(SUM(CASE WHEN source = 'SQL' THEN 1 ELSE 0 END) AS BIGINT) AS sql_count
        |FROM merged GROUP BY c_mktsegment""".stripMargin),
    "quality_clean" -> (DirtyCte +
      """
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, src
        |FROM annotated WHERE _errors = ''""".stripMargin),
    "quality_errors" -> (DirtyCte +
      """
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, src, _errors
        |FROM annotated WHERE _errors <> ''""".stripMargin),
    "pipeline_stats" -> (DirtyCte +
      """
        |SELECT CASE WHEN _errors = '' THEN 'clean' ELSE 'error' END AS zone,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
        |  'orders' AS entity
        |FROM annotated GROUP BY 1""".stripMargin),
    "error_audit" -> (DirtyCte +
      """
        |SELECT rule, CAST(count(*) AS BIGINT) AS n_violations FROM (
        |  SELECT unnest(string_split(_errors, ' | ')) AS rule
        |  FROM annotated WHERE _errors <> '') GROUP BY rule""".stripMargin),
    // Preview replay: same deterministic top-50 under the (o_orderkey, src)
    // unique composite, same long-format unpivot; double cells print via
    // DECIMAL(18,2) on both engines (2dp-exact money values), dtype strings
    // are Spark simpleString names pinned as literals.
    "zone_preview" -> (DirtyCte + """,
        |z AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, src
        |  FROM annotated WHERE _errors = ''
        |  ORDER BY o_orderkey, src LIMIT 50),
        |r AS (SELECT CAST(row_number() OVER (ORDER BY o_orderkey, src) AS INT) AS rn, * FROM z)
        |SELECT rn, 'o_orderkey' AS col_name, 'bigint' AS dtype,
        |  CAST(o_orderkey AS VARCHAR) AS cell FROM r
        |UNION ALL SELECT rn, 'o_custkey', 'bigint', CAST(o_custkey AS VARCHAR) FROM r
        |UNION ALL SELECT rn, 'o_totalprice', 'double',
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) FROM r
        |UNION ALL SELECT rn, 'o_orderstatus', 'string', o_orderstatus FROM r
        |UNION ALL SELECT rn, 'src', 'int', CAST(src AS VARCHAR) FROM r""".stripMargin),
    "audit_tail" -> (DirtyCte +
      """
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, src, _errors
        |FROM annotated WHERE _errors <> ''
        |ORDER BY o_orderkey DESC, src DESC LIMIT 50""".stripMargin),
    "monitor_feed" -> (DirtyCte + "," + SrcCte.stripPrefix("WITH") + """,
        |pa AS (
        |  SELECT 'c_custkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
        |    CAST(min(c_custkey) AS VARCHAR) AS min_value, CAST(max(c_custkey) AS VARCHAR) AS max_value FROM src_a
        |  UNION ALL SELECT 'c_name', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_name) AS BIGINT),
        |    CAST(min(c_name) AS VARCHAR), CAST(max(c_name) AS VARCHAR) FROM src_a
        |  UNION ALL SELECT 'c_acctbal', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_acctbal) AS BIGINT),
        |    CAST(min(c_acctbal) AS VARCHAR), CAST(max(c_acctbal) AS VARCHAR) FROM src_a
        |  UNION ALL SELECT 'c_mktsegment', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_mktsegment) AS BIGINT),
        |    CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR) FROM src_a),
        |pb AS (
        |  SELECT 'c_custkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
        |    CAST(min(c_custkey) AS VARCHAR) AS min_value, CAST(max(c_custkey) AS VARCHAR) AS max_value FROM src_b
        |  UNION ALL SELECT 'c_name', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_name) AS BIGINT),
        |    CAST(min(c_name) AS VARCHAR), CAST(max(c_name) AS VARCHAR) FROM src_b
        |  UNION ALL SELECT 'c_acctbal', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_acctbal) AS BIGINT),
        |    CAST(min(c_acctbal) AS VARCHAR), CAST(max(c_acctbal) AS VARCHAR) FROM src_b
        |  UNION ALL SELECT 'c_mktsegment', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_mktsegment) AS BIGINT),
        |    CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR) FROM src_b),
        |drift AS (
        |  SELECT pa.col_name AS col_name,
        |    (pb.n_distinct - pa.n_distinct <> 0
        |     OR (CASE WHEN pb.n_rows = 0 THEN 0 ELSE CAST(floor(pb.n_nulls * 1000 / pb.n_rows) AS BIGINT) END)
        |        - (CASE WHEN pa.n_rows = 0 THEN 0 ELSE CAST(floor(pa.n_nulls * 1000 / pa.n_rows) AS BIGINT) END) <> 0
        |     OR coalesce(pa.min_value, '') <> coalesce(pb.min_value, '')
        |     OR coalesce(pa.max_value, '') <> coalesce(pb.max_value, '')) AS drifted
        |  FROM pa JOIN pb ON pa.col_name = pb.col_name),
        |ck AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_rows FROM orders GROUP BY o_custkey),
        |hot AS (SELECT o_custkey, n_rows FROM ck ORDER BY n_rows DESC, o_custkey LIMIT 10)
        |SELECT 'zone_rows' AS metric,
        |  CASE WHEN _errors = '' THEN 'clean' ELSE 'error' END AS key,
        |  CAST(count(*) AS DOUBLE) AS value
        |FROM annotated GROUP BY 1, 2
        |UNION ALL SELECT 'rule_violations', rule, CAST(count(*) AS DOUBLE) FROM (
        |  SELECT unnest(string_split(_errors, ' | ')) AS rule
        |  FROM annotated WHERE _errors <> '') GROUP BY 1, 2
        |UNION ALL SELECT 'col_drift', col_name,
        |  CAST(CASE WHEN drifted THEN 1 ELSE 0 END AS DOUBLE) FROM drift
        |UNION ALL SELECT 'hot_key_rows', CAST(o_custkey AS VARCHAR),
        |  CAST(n_rows AS DOUBLE) FROM hot""".stripMargin),
    "quality_catalog" ->
      """WITH dc AS (SELECT
        |    CASE WHEN c_custkey % 113 = 0 THEN NULL ELSE c_custkey END AS c_custkey,
        |    CASE WHEN c_custkey % 107 = 0 THEN '  '
        |         WHEN c_custkey % 149 = 0 THEN rpad(c_name, 40, 'x') ELSE c_name END AS c_name,
        |    CASE WHEN c_custkey % 109 = 0 THEN 'bad email'
        |         ELSE 'cust' || CAST(c_custkey AS VARCHAR) || '@shop.vn' END AS c_email,
        |    CASE WHEN c_custkey % 127 = 0 THEN 'x' || lpad(CAST(c_custkey AS VARCHAR), 8, '0')
        |         ELSE lpad(CAST(c_custkey AS VARCHAR), 8, '0') END AS c_phone,
        |    CASE WHEN c_custkey % 131 = 0 THEN c_acctbal + 20000 ELSE c_acctbal END AS c_acctbal,
        |    CASE WHEN c_custkey % 137 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS c_mktsegment,
        |    CASE WHEN c_custkey % 139 = 0 THEN 99 ELSE c_nationkey END AS c_nationkey
        |  FROM customer),
        |dord AS (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 97 = 0 THEN NULL
        |         WHEN o_orderkey % 79 = 0 THEN -1 ELSE o_custkey END AS o_custkey,
        |    CASE WHEN o_orderkey % 89 = 0 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice,
        |    CASE WHEN o_orderkey % 83 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 103 = 0 THEN TIMESTAMP '2099-01-01' ELSE o_orderdate END AS o_orderdate,
        |    CASE WHEN o_orderkey % 71 = 0 THEN '9-BOGUS' ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders),
        |dp AS (SELECT p_partkey,
        |    CASE WHEN p_partkey % 67 = 0 THEN '' ELSE p_name END AS p_name,
        |    CASE WHEN p_partkey % 59 = 0 THEN 'brandX' ELSE p_brand END AS p_brand,
        |    CASE WHEN p_partkey % 53 = 0 THEN NULL ELSE p_type END AS p_type,
        |    CASE WHEN p_partkey % 73 = 0 THEN 999 ELSE p_size END AS p_size,
        |    CASE WHEN p_partkey % 61 = 0 THEN 0.0 ELSE p_retailprice END AS p_retailprice
        |  FROM part),
        |ds AS (SELECT s_suppkey,
        |    CASE WHEN s_suppkey % 29 = 0 THEN ' ' ELSE s_name END AS s_name,
        |    CASE WHEN s_suppkey % 17 = 0 THEN 'abc'
        |         ELSE '84-' || lpad(CAST(s_suppkey AS VARCHAR), 7, '0') END AS s_phone,
        |    CASE WHEN s_suppkey % 19 = 0 THEN s_acctbal + 20000 ELSE s_acctbal END AS s_acctbal,
        |    CASE WHEN s_suppkey % 23 = 0 THEN 99 ELSE s_nationkey END AS s_nationkey
        |  FROM supplier),
        |dn AS (SELECT
        |    CASE WHEN n_nationkey % 7 = 0 THEN NULL ELSE n_nationkey END AS n_nationkey,
        |    CASE WHEN n_nationkey % 5 = 0 THEN ' '
        |         WHEN n_nationkey % 11 = 0 THEN lower(n_name)
        |         WHEN n_nationkey % 13 = 0 THEN rpad(n_name, 30, 'X') ELSE n_name END AS n_name,
        |    CASE WHEN n_nationkey % 17 = 0 THEN 99 ELSE n_regionkey END AS n_regionkey
        |  FROM nation),
        |dl AS (SELECT
        |    CASE WHEN l_orderkey % 43 = 0 THEN NULL ELSE l_partkey END AS l_partkey,
        |    CASE WHEN l_orderkey % 23 = 0 THEN 999999 ELSE l_suppkey END AS l_suppkey,
        |    CASE WHEN l_orderkey % 19 = 0 THEN 999.0 ELSE l_quantity END AS l_quantity,
        |    CASE WHEN l_orderkey % 29 = 0 THEN 'X' ELSE l_returnflag END AS l_returnflag,
        |    CASE WHEN l_orderkey % 31 = 0 THEN 'Z' ELSE l_linestatus END AS l_linestatus,
        |    CASE WHEN l_orderkey % 37 = 0 THEN 0.9 ELSE l_discount END AS l_discount,
        |    CASE WHEN l_orderkey % 41 = 0 THEN -l_extendedprice ELSE l_extendedprice END AS l_extendedprice
        |  FROM lineitem)
        |SELECT 'khach_hang' AS entity, 'null_c_custkey' AS rule,
        |  CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations FROM dc
        |UNION ALL SELECT 'khach_hang', 'empty_c_name',
        |  CAST(SUM(CASE WHEN c_name IS NULL OR length(trim(c_name)) = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM dc
        |UNION ALL SELECT 'khach_hang', 'too_long_c_name',
        |  CAST(SUM(CASE WHEN c_name IS NOT NULL AND length(c_name) > 30 THEN 1 ELSE 0 END) AS BIGINT) FROM dc
        |UNION ALL SELECT 'khach_hang', 'bad_email',
        |  CAST(SUM(CASE WHEN c_email IS NOT NULL
        |    AND NOT regexp_matches(c_email, '^[A-Za-z0-9._-]+@[A-Za-z0-9.-]+$') THEN 1 ELSE 0 END) AS BIGINT) FROM dc
        |UNION ALL SELECT 'khach_hang', 'bad_phone',
        |  CAST(SUM(CASE WHEN c_phone IS NOT NULL
        |    AND NOT regexp_matches(c_phone, '^[0-9-]+$') THEN 1 ELSE 0 END) AS BIGINT) FROM dc
        |UNION ALL SELECT 'khach_hang', 'range_c_acctbal',
        |  CAST(SUM(CASE WHEN c_acctbal IS NOT NULL
        |    AND (c_acctbal < -999.99 OR c_acctbal > 9999.99) THEN 1 ELSE 0 END) AS BIGINT) FROM dc
        |UNION ALL SELECT 'khach_hang', 'bad_c_mktsegment',
        |  CAST(SUM(CASE WHEN c_mktsegment IS NOT NULL AND c_mktsegment NOT IN
        |    ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY') THEN 1 ELSE 0 END) AS BIGINT) FROM dc
        |UNION ALL SELECT 'khach_hang', 'fk_nation',
        |  CAST(SUM(CASE WHEN c_nationkey IS NOT NULL
        |    AND c_nationkey NOT IN (SELECT n_nationkey FROM nation) THEN 1 ELSE 0 END) AS BIGINT) FROM dc
        |UNION ALL SELECT 'dat_hang', 'null_o_custkey',
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM dord
        |UNION ALL SELECT 'dat_hang', 'fk_customer',
        |  CAST(SUM(CASE WHEN o_custkey IS NOT NULL
        |    AND o_custkey NOT IN (SELECT c_custkey FROM customer) THEN 1 ELSE 0 END) AS BIGINT) FROM dord
        |UNION ALL SELECT 'dat_hang', 'nonpositive_o_totalprice',
        |  CAST(SUM(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM dord
        |UNION ALL SELECT 'dat_hang', 'bad_o_orderstatus',
        |  CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
        |    AND o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) FROM dord
        |UNION ALL SELECT 'dat_hang', 'future_date',
        |  CAST(SUM(CASE WHEN o_orderdate IS NOT NULL
        |    AND o_orderdate > TIMESTAMP '2002-01-01' THEN 1 ELSE 0 END) AS BIGINT) FROM dord
        |UNION ALL SELECT 'dat_hang', 'bad_priority',
        |  CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
        |    AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$') THEN 1 ELSE 0 END) AS BIGINT) FROM dord
        |UNION ALL SELECT 'mon', 'empty_p_name',
        |  CAST(SUM(CASE WHEN p_name IS NULL OR length(trim(p_name)) = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM dp
        |UNION ALL SELECT 'mon', 'nonpositive_p_retailprice',
        |  CAST(SUM(CASE WHEN p_retailprice IS NOT NULL AND p_retailprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM dp
        |UNION ALL SELECT 'mon', 'range_p_size',
        |  CAST(SUM(CASE WHEN p_size IS NOT NULL AND (p_size < 1 OR p_size > 50) THEN 1 ELSE 0 END) AS BIGINT) FROM dp
        |UNION ALL SELECT 'mon', 'bad_brand',
        |  CAST(SUM(CASE WHEN p_brand IS NOT NULL
        |    AND NOT regexp_matches(p_brand, '^Brand#[0-9]+$') THEN 1 ELSE 0 END) AS BIGINT) FROM dp
        |UNION ALL SELECT 'mon', 'null_p_type',
        |  CAST(SUM(CASE WHEN p_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM dp
        |UNION ALL SELECT 'nha_cung_cap', 'empty_s_name',
        |  CAST(SUM(CASE WHEN s_name IS NULL OR length(trim(s_name)) = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM ds
        |UNION ALL SELECT 'nha_cung_cap', 'bad_phone',
        |  CAST(SUM(CASE WHEN s_phone IS NOT NULL
        |    AND NOT regexp_matches(s_phone, '^[0-9-]+$') THEN 1 ELSE 0 END) AS BIGINT) FROM ds
        |UNION ALL SELECT 'nha_cung_cap', 'range_s_acctbal',
        |  CAST(SUM(CASE WHEN s_acctbal IS NOT NULL
        |    AND (s_acctbal < -999.99 OR s_acctbal > 9999.99) THEN 1 ELSE 0 END) AS BIGINT) FROM ds
        |UNION ALL SELECT 'nha_cung_cap', 'fk_nation',
        |  CAST(SUM(CASE WHEN s_nationkey IS NOT NULL
        |    AND s_nationkey NOT IN (SELECT n_nationkey FROM nation) THEN 1 ELSE 0 END) AS BIGINT) FROM ds
        |UNION ALL SELECT 'loai_mon', 'null_n_nationkey',
        |  CAST(SUM(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM dn
        |UNION ALL SELECT 'loai_mon', 'empty_n_name',
        |  CAST(SUM(CASE WHEN n_name IS NULL OR length(trim(n_name)) = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM dn
        |UNION ALL SELECT 'loai_mon', 'too_long_n_name',
        |  CAST(SUM(CASE WHEN n_name IS NOT NULL AND length(n_name) > 25 THEN 1 ELSE 0 END) AS BIGINT) FROM dn
        |UNION ALL SELECT 'loai_mon', 'bad_n_name_shape',
        |  CAST(SUM(CASE WHEN n_name IS NOT NULL
        |    AND NOT regexp_matches(n_name, '^[A-Z ]+$') THEN 1 ELSE 0 END) AS BIGINT) FROM dn
        |UNION ALL SELECT 'loai_mon', 'fk_region',
        |  CAST(SUM(CASE WHEN n_regionkey IS NOT NULL
        |    AND n_regionkey NOT IN (SELECT r_regionkey FROM region) THEN 1 ELSE 0 END) AS BIGINT) FROM dn
        |UNION ALL SELECT 'nguyen_lieu', 'null_l_partkey',
        |  CAST(SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM dl
        |UNION ALL SELECT 'nguyen_lieu', 'fk_supplier',
        |  CAST(SUM(CASE WHEN l_suppkey IS NOT NULL
        |    AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier) THEN 1 ELSE 0 END) AS BIGINT) FROM dl
        |UNION ALL SELECT 'nguyen_lieu', 'range_l_quantity',
        |  CAST(SUM(CASE WHEN l_quantity IS NOT NULL
        |    AND (l_quantity < 1 OR l_quantity > 50) THEN 1 ELSE 0 END) AS BIGINT) FROM dl
        |UNION ALL SELECT 'nguyen_lieu', 'bad_l_returnflag',
        |  CAST(SUM(CASE WHEN l_returnflag IS NOT NULL
        |    AND l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) FROM dl
        |UNION ALL SELECT 'nguyen_lieu', 'bad_l_linestatus',
        |  CAST(SUM(CASE WHEN l_linestatus IS NOT NULL
        |    AND l_linestatus NOT IN ('O','F') THEN 1 ELSE 0 END) AS BIGINT) FROM dl
        |UNION ALL SELECT 'nguyen_lieu', 'range_l_discount',
        |  CAST(SUM(CASE WHEN l_discount IS NOT NULL
        |    AND (l_discount < 0.0 OR l_discount > 0.1) THEN 1 ELSE 0 END) AS BIGINT) FROM dl
        |UNION ALL SELECT 'nguyen_lieu', 'nonpositive_l_extendedprice',
        |  CAST(SUM(CASE WHEN l_extendedprice IS NOT NULL
        |    AND l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM dl""".stripMargin,
    "dim_date" ->
      """WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS full_date FROM orders)
        |SELECT CAST(year(full_date)*10000 + month(full_date)*100 + dayofmonth(full_date) AS INT) AS date_key,
        |  full_date,
        |  CAST(isodow(full_date) AS INT) AS iso_dow,
        |  dayname(full_date) AS day_name,
        |  CAST(dayofmonth(full_date) AS INT) AS day_of_month,
        |  CAST(dayofyear(full_date) AS INT) AS day_of_year,
        |  CAST(weekofyear(full_date) AS INT) AS week_of_year,
        |  CAST(month(full_date) AS INT) AS month,
        |  monthname(full_date) AS month_name,
        |  CAST(quarter(full_date) AS INT) AS quarter,
        |  CAST(year(full_date) AS INT) AS year,
        |  isodow(full_date) >= 6 AS is_weekend
        |FROM d""".stripMargin,
    "star_fact" ->
      """WITH dim_c AS (SELECT c_custkey, dense_rank() OVER (ORDER BY c_custkey) AS customer_key FROM customer),
        |dim_p AS (SELECT p_partkey, dense_rank() OVER (ORDER BY p_partkey) AS part_key FROM part)
        |SELECT l.l_orderkey, l.l_linenumber,
        |  CAST(dc.customer_key AS BIGINT) AS customer_key,
        |  CAST(dp.part_key AS BIGINT) AS part_key,
        |  CAST(year(o.o_orderdate)*10000 + month(o.o_orderdate)*100 + dayofmonth(o.o_orderdate) AS INT) AS date_key,
        |  l.l_quantity AS quantity,
        |  l.l_extendedprice AS ext_price,
        |  l.l_extendedprice * (1 - l.l_discount) AS revenue,
        |  o.o_orderstatus AS status
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |LEFT JOIN dim_c dc ON o.o_custkey = dc.c_custkey
        |LEFT JOIN dim_p dp ON l.l_partkey = dp.p_partkey""".stripMargin,
    "star_full" ->
      """WITH dim_c AS (SELECT c_custkey, dense_rank() OVER (ORDER BY c_custkey) AS customer_key FROM customer),
        |dim_p AS (SELECT p_partkey, dense_rank() OVER (ORDER BY p_partkey) AS part_key FROM part),
        |dim_s AS (SELECT s_suppkey, dense_rank() OVER (ORDER BY s_suppkey) AS supplier_key FROM supplier),
        |dim_n AS (SELECT n_nationkey, dense_rank() OVER (ORDER BY n_nationkey) AS nation_key FROM nation)
        |SELECT l.l_orderkey, l.l_linenumber,
        |  CAST(dc.customer_key AS BIGINT) AS customer_key,
        |  CAST(dp.part_key AS BIGINT) AS part_key,
        |  CAST(ds.supplier_key AS BIGINT) AS supplier_key,
        |  CAST(dn.nation_key AS BIGINT) AS nation_key,
        |  CAST(year(o.o_orderdate)*10000 + month(o.o_orderdate)*100 + dayofmonth(o.o_orderdate) AS INT) AS date_key,
        |  l.l_quantity AS quantity,
        |  l.l_extendedprice * (1 - l.l_discount) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |LEFT JOIN dim_c dc ON o.o_custkey = dc.c_custkey
        |LEFT JOIN dim_p dp ON l.l_partkey = dp.p_partkey
        |LEFT JOIN dim_s ds ON l.l_suppkey = ds.s_suppkey
        |LEFT JOIN dim_n dn ON s.s_nationkey = dn.n_nationkey""".stripMargin,
    "star_orders_fact" ->
      """WITH dim_c AS (SELECT c_custkey, dense_rank() OVER (ORDER BY c_custkey) AS customer_key FROM customer)
        |SELECT o.o_orderkey,
        |  CAST(dc.customer_key AS BIGINT) AS customer_key,
        |  CAST(year(o.o_orderdate)*10000 + month(o.o_orderdate)*100 + dayofmonth(o.o_orderdate) AS INT) AS date_key,
        |  o.o_totalprice AS total_price,
        |  o.o_orderstatus AS status
        |FROM orders o
        |LEFT JOIN dim_c dc ON o.o_custkey = dc.c_custkey""".stripMargin,
    "star_inventory_fact" ->
      """WITH dim_p AS (SELECT p_partkey, dense_rank() OVER (ORDER BY p_partkey) AS part_key FROM part),
        |dim_s AS (SELECT s_suppkey, dense_rank() OVER (ORDER BY s_suppkey) AS supplier_key FROM supplier),
        |m AS (SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        |    CASE WHEN l_returnflag = 'R' THEN -l_quantity ELSE l_quantity END AS qty_delta
        |  FROM lineitem)
        |SELECT CAST(dp.part_key AS BIGINT) AS part_key,
        |  CAST(ds.supplier_key AS BIGINT) AS supplier_key,
        |  CAST(year(m.l_shipdate)*10000 + month(m.l_shipdate)*100 + dayofmonth(m.l_shipdate) AS INT) AS date_key,
        |  m.l_orderkey, m.l_linenumber, m.qty_delta,
        |  CAST(SUM(CAST(m.qty_delta AS DECIMAL(18,2))) OVER (
        |    PARTITION BY m.l_partkey, m.l_suppkey
        |    ORDER BY m.l_shipdate, m.l_orderkey, m.l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS stock_balance
        |FROM m
        |LEFT JOIN dim_p dp ON m.l_partkey = dp.p_partkey
        |LEFT JOIN dim_s ds ON m.l_suppkey = ds.s_suppkey""".stripMargin,
    "star_rollup" ->
      """SELECT CAST(year(o.o_orderdate) AS INT) AS year,
        |  CAST(month(o.o_orderdate) AS INT) AS month,
        |  c.c_mktsegment AS segment,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1, 2, 3""".stripMargin,
    "scd2_dim" ->
      """WITH snap1 AS (SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
        |    DATE '2024-01-01' AS snap_date FROM customer),
        |snap2 AS (SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 11 = 0 THEN 'MACHINERY' ELSE c_mktsegment END AS c_mktsegment,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
        |    DATE '2024-06-01' AS snap_date FROM customer),
        |snaps AS (SELECT * FROM snap1 UNION ALL SELECT * FROM snap2),
        |v AS (SELECT *,
        |    lag(c_name) OVER w AS p_name, lag(c_mktsegment) OVER w AS p_seg,
        |    lag(c_acctbal) OVER w AS p_bal, (lag(snap_date) OVER w) IS NULL AS is_first
        |  FROM snaps WINDOW w AS (PARTITION BY c_custkey ORDER BY snap_date)),
        |kept AS (SELECT c_custkey, c_name, c_mktsegment, c_acctbal, snap_date FROM v
        |  WHERE is_first OR c_name IS DISTINCT FROM p_name
        |     OR c_mktsegment IS DISTINCT FROM p_seg OR c_acctbal IS DISTINCT FROM p_bal)
        |SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
        |  snap_date AS valid_from,
        |  lead(snap_date) OVER w2 AS valid_to,
        |  (lead(snap_date) OVER w2) IS NULL AS is_current
        |FROM kept WINDOW w2 AS (PARTITION BY c_custkey ORDER BY snap_date)""".stripMargin,
    "topn_per_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "topn_agg" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "rollup_revenue" ->
      """WITH f AS (SELECT CAST(year(o.o_orderdate) AS INT) AS year,
        |    c.c_mktsegment AS segment,
        |    l.l_extendedprice * (1 - l.l_discount) AS rev
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey)
        |SELECT year, segment, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(rev AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM f GROUP BY ROLLUP(year, segment)""".stripMargin,
    "asof_last_error" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  CAST(max(CASE WHEN event_type = 'error' THEN ts END) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS TIMESTAMP) AS last_error_ts
        |FROM events""".stripMargin,
    "range_join" ->
      """WITH e AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events),
        |f AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800.0
        |    THEN 1 ELSE 0 END AS new_s FROM e),
        |g AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_id FROM f),
        |sessions AS (SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |    min(ts) AS session_start, max(ts) AS session_end
        |  FROM g GROUP BY user_id, session_id)
        |SELECT ev.event_id, ev.user_id, s.session_id
        |FROM events ev JOIN sessions s
        |  ON ev.user_id = s.user_id
        | AND ev.ts BETWEEN s.session_start AND s.session_end""".stripMargin,
    "salted_agg" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "salted_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_suppkey AS suppkey,
        |  l.l_quantity, s.s_name, s.s_nationkey
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey""".stripMargin,
    "neardup_embedding" -> (EmbCorpusCte +
      """
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
        |FROM emb_corpus a JOIN emb_corpus b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.9""".stripMargin),
    // Margin mining replay (ann_lsh pinned-planes precedent): the same
    // 16x64 hyperplane constants rebuild every signature as a bit-int;
    // the per-band hamming<=1 multiprobe is EXACTLY "some 4-bit band of
    // the xor has popcount <= 1" (band masks 0xF << 4b); cosines round
    // 6dp before use, mu_k sums run over DECIMAL(18,6) and divide once
    // in doubles — margins match bit-for-bit. Shares ann_lsh's
    // documented DuckDB float-summation-order sensitivity.
    "margin_mine" -> {
      val planeRows = graft.operators.Similarity.hyperplanes(16, 64).zipWithIndex
        .map { case (p, i) => s"($i, [${p.mkString(", ")}])" }
        .mkString(",\n        ")
      val bandCond = (0 until 4)
        .map(b => s"bit_count(xor(a.sig, b.sig) & ${15L << (4 * b)}::UBIGINT) <= 1")
        .mkString(" OR ")
      s"""WITH planes(pid, pv) AS (VALUES
        |        $planeRows),
        |v AS (SELECT vec_id, CASE WHEN label % 2 = 0 THEN 'a' ELSE 'b' END AS side,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sg AS (SELECT vec_id, bit_or(CASE WHEN list_dot_product(v.v, pv) >= 0
        |      THEN (1::UBIGINT << pid) ELSE 0::UBIGINT END) AS sig
        |    FROM v, planes GROUP BY vec_id),
        |sv AS (SELECT v.vec_id, v.side, v.v, sg.sig FROM v JOIN sg USING (vec_id)),
        |cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
        |  FROM sv a JOIN sv b ON a.side < b.side AND ($bandCond)
        |  WHERE NOT isnan(list_cosine_similarity(a.v, b.v))),
        |ranked AS (SELECT *,
        |    row_number() OVER (PARTITION BY vec_a ORDER BY cos_sim DESC, vec_b) AS ra,
        |    row_number() OVER (PARTITION BY vec_b ORDER BY cos_sim DESC, vec_a) AS rb
        |  FROM cand),
        |mua AS (SELECT vec_a, CAST(SUM(CAST(cos_sim AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(*) AS mu_a
        |  FROM ranked WHERE ra <= 4 GROUP BY vec_a),
        |mub AS (SELECT vec_b, CAST(SUM(CAST(cos_sim AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(*) AS mu_b
        |  FROM ranked WHERE rb <= 4 GROUP BY vec_b)
        |SELECT vec_a, vec_b, cos_sim,
        |  round(cos_sim / ((mu_a + mu_b) / 2), 6) AS margin
        |FROM ranked JOIN mua USING (vec_a) JOIN mub USING (vec_b)
        |WHERE (ra = 1 OR rb = 1)
        |  AND round(cos_sim / ((mu_a + mu_b) / 2), 6) >= 1.0""".stripMargin
    },
    "semantic_dedup" -> (embCorpusCte(withLabel = true) +
      """,
        |dup AS (SELECT DISTINCT x.vec_id
        |  FROM emb_corpus x JOIN emb_corpus y
        |    ON x.label = y.label AND x.vec_id > y.vec_id
        |  WHERE NOT isnan(list_cosine_similarity(x.v, y.v))
        |    AND round(list_cosine_similarity(x.v, y.v), 6) >= 0.9)
        |SELECT p.vec_id, p.label AS cell, (d.vec_id IS NULL) AS keep
        |FROM emb_corpus p LEFT JOIN dup d ON p.vec_id = d.vec_id""".stripMargin),
    // The oracle brute-forces the true nearest neighbor of each perturbed
    // query; both approximate paths must have retrieved exactly it.
    "ann_recall" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, list_concat([v[1] * 1.5], v[2:64]) AS qv
        |  FROM base WHERE vec_id < 5),
        |s AS (SELECT query_id, b.vec_id AS neighbor_id,
        |    list_cosine_similarity(qv, b.v) AS sim FROM q, base b),
        |r AS (SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM s)
        |SELECT query_id, neighbor_id AS lsh_nn, neighbor_id AS ivf_nn,
        |  neighbor_id AS pq_nn, neighbor_id AS ivfpq_nn,
        |  neighbor_id AS ivfpqr_nn
        |FROM r WHERE rn = 1""".stripMargin,
    // IVF search under the pinned seeded centroids, re-derived end-to-end:
    // same 16×64 constants as the Spark query; cell = argmax cosine (tie
    // to lowest cell id), probes = each query's top-4 cells, candidates =
    // corpus rows in probed cells, then exact cosine top-10 as in ann_topk.
    "ann_ivf_fixed" -> ivfFixedSql("vec_id >= 5"),
    // Index-staleness replay: cell assignment re-derives from the SAME
    // pinned centroid literals (the ivfFixedSql idiom), occupancy counts
    // group the assignments, and the weighted-KS tail is the ks_drift
    // machinery over the cell-id axis; stale compares the ROUNDED d.
    "ann_index_stale" -> {
      val centRows = graft.operators.Similarity.seededCentroids(16, 64)
        .map { case (cid, v) => s"($cid, [${v.mkString(", ")}])" }
        .mkString(",\n        ")
      s"""WITH cents(cid, cv) AS (VALUES
        |        $centRows),
        |c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    (vec_id % 4 = 0) AS isnew FROM embeddings),
        |asg AS (SELECT vec_id, isnew, cid FROM (
        |    SELECT vec_id, isnew, cid, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY list_cosine_similarity(v, cv) DESC, cid) AS rn
        |    FROM c0, cents) WHERE rn = 1),
        |base AS (SELECT cid AS v, count(*) AS ca FROM asg WHERE NOT isnew GROUP BY 1),
        |cur AS (SELECT cid AS v, count(*) AS cb FROM asg GROUP BY 1),
        |u AS (SELECT coalesce(base.v, cur.v) AS v,
        |    coalesce(base.ca, 0) AS ca, coalesce(cur.cb, 0) AS cb
        |  FROM base FULL OUTER JOIN cur ON base.v = cur.v),
        |c AS (SELECT v,
        |    sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |    sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
        |    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
        |  FROM u),
        |agg AS (SELECT CAST(max(na) AS BIGINT) AS n_train,
        |    CAST(max(nb) AS BIGINT) AS n_now,
        |    CAST(count(*) AS BIGINT) AS n_cells,
        |    round(max(abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE)
        |      - CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE))), 6) AS d_stat
        |  FROM c)
        |SELECT n_train, n_now, n_cells, d_stat, d_stat > 0.1 AS stale FROM agg""".stripMargin
    },
    // Filtered vector search: the SAME pinned-centroid IVF replay with the
    // metadata predicate pushed into the corpus scan (pre-filtering — the
    // index sees only qualifying rows, so top-k can never starve).
    "ann_filtered" -> ivfFixedSql("vec_id >= 5 AND label IN (2, 3, 5)"),
    // Winnowing fingerprints re-derived end-to-end (md5 token-hash
    // variant): per-token top-8-md5-bytes as HUGEINT, the rolling chain
    // h = (h*B + t) mod 2^64 replayed by list_reduce (B = 1000003 < 2^20
    // keeps every product under HUGEINT range), then RE-SIGNED to BIGINT
    // BEFORE the window-min — the expression's min compares SIGNED longs,
    // so the unsigned mod-2^64 value would pick a different minimum in any
    // window mixing "negative" (>= 2^63) and positive hashes. Window-min
    // of each w=4 window (the rightmost-tie rule affects positions, never
    // the selected VALUE, so plain list_min matches), distinct.
    "winnow_fingerprint" ->
      """WITH tw AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |    FROM documents),
        |th AS (SELECT doc_id,
        |    [CAST(('0x' || substr(md5(t), 1, 16))::UBIGINT AS HUGEINT) for t in toks] AS h
        |  FROM tw),
        |kg0 AS (SELECT doc_id,
        |    [list_reduce(h[i:i+4], (a, b) -> (a * 1000003 + b) % 18446744073709551616)
        |     for i in range(1, len(h) - 3)] AS g0
        |  FROM th WHERE len(h) >= 5),
        |kg AS (SELECT doc_id,
        |    [CASE WHEN m >= 9223372036854775808
        |          THEN CAST(m - 18446744073709551616 AS BIGINT)
        |          ELSE CAST(m AS BIGINT) END for m in g0] AS g
        |  FROM kg0),
        |sel AS (SELECT doc_id, CASE WHEN len(g) <= 4 THEN [list_min(g)]
        |    ELSE [list_min(g[s:s+3]) for s in range(1, len(g) - 2)] END AS mins FROM kg)
        |SELECT doc_id, unnest(list_distinct(mins)) AS fp FROM sel""".stripMargin,
    // Winnowing position-robustness invariant: every sampled doc must share
    // fingerprints with its prefix-shifted copy (and have a non-empty set).
    "winnow_overlap" ->
      """SELECT doc_id, true AS has_fps, true AS prefix_overlap
        |FROM documents
        |WHERE doc_id % 20 = 0
        |  AND len(string_split_regex(trim(text), '\s+')) >= 16""".stripMargin,
    "upsert_latest" ->
      """WITH existing AS (SELECT o_orderkey, o_totalprice, o_orderstatus, 1 AS batch FROM orders),
        |updates AS (SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice,
        |    'F' AS o_orderstatus, 2 AS batch FROM orders WHERE o_orderkey % 7 = 0),
        |merged AS (SELECT * FROM existing UNION ALL SELECT * FROM updates),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY batch DESC, o_totalprice DESC) AS rn FROM merged)
        |SELECT o_orderkey, o_totalprice, o_orderstatus, batch
        |FROM ranked WHERE rn = 1""".stripMargin,
    "anomaly_zscore" ->
      """WITH h AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |    CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 1, 2),
        |s AS (SELECT *, avg(n_events) OVER (PARTITION BY event_type) AS m,
        |    stddev_pop(n_events) OVER (PARTITION BY event_type) AS sd FROM h)
        |SELECT hour, event_type, n_events,
        |  round((n_events - m) / nullif(sd, 0), 6) AS z,
        |  coalesce(abs(round((n_events - m) / nullif(sd, 0), 6)) > 2.0, false) AS is_anomaly
        |FROM s""".stripMargin,
    // Lower-median convention on BOTH sides: row_number over (value, id)
    // then the ⌈n/2⌉ rank — actual data values, no interpolation, so the
    // dev/rscore doubles replay exactly.
    "anomaly_mad" ->
      """WITH base AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS v
        |  FROM documents WHERE text IS NOT NULL),
        |medr AS (SELECT source, v,
        |    row_number() OVER (PARTITION BY source ORDER BY v, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n FROM base),
        |med AS (SELECT source, v AS med FROM medr WHERE rn = (n + 1) // 2),
        |dev AS (SELECT b.doc_id, b.source, b.v, m.med, abs(b.v - m.med) AS d
        |  FROM base b JOIN med m USING (source)),
        |madr AS (SELECT source, d,
        |    row_number() OVER (PARTITION BY source ORDER BY d, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n FROM dev),
        |mad AS (SELECT source, d AS mad FROM madr WHERE rn = (n + 1) // 2)
        |SELECT dev.doc_id, dev.source, dev.v AS n_tokens, dev.med, mad.mad,
        |  round((dev.v - dev.med) / mad.mad, 6) AS rscore
        |FROM dev JOIN mad USING (source)
        |WHERE mad.mad > 0.0 AND dev.d > 2.0 * mad.mad""".stripMargin,
    // Each per-point double is the same two correctly-rounded ops from
    // identical integers in both engines, so the MAX is engine-exact.
    "ks_drift" ->
      """WITH base AS (SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
        |  FROM documents WHERE text IS NOT NULL),
        |ca AS (SELECT v, count(*) AS ca FROM base WHERE doc_id % 2 = 0 GROUP BY v),
        |cb AS (SELECT v, count(*) AS cb FROM base WHERE doc_id % 2 = 1 GROUP BY v),
        |u AS (SELECT coalesce(ca.v, cb.v) AS v,
        |    coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
        |  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
        |c AS (SELECT v,
        |    sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |    sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
        |    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
        |  FROM u)
        |SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
        |  CAST(count(*) AS BIGINT) AS n_points,
        |  round(max(abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE)
        |    - CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE))), 6) AS d_stat
        |FROM c""".stripMargin,
    // Binned-KS replay: the bin index is floor((v − lo)/(hi − lo)·1024)
    // clamped to 1023 — each step one correctly-rounded double op,
    // parenthesized identically to the Column expression, so the integer
    // grid (and everything after it, the ks_drift tail) is engine-exact.
    "ks_binned" ->
      """WITH v0 AS (SELECT event_type, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL),
        |st AS (SELECT min(v) AS lo, max(v) AS hi FROM v0),
        |ba AS (SELECT CAST(CASE WHEN hi = lo THEN 0
        |      ELSE least(floor((v - lo) / (hi - lo) * 1024), 1023) END AS INT) AS v
        |  FROM v0, st WHERE event_type = 'purchase'),
        |bb AS (SELECT CAST(CASE WHEN hi = lo THEN 0
        |      ELSE least(floor((v - lo) / (hi - lo) * 1024), 1023) END AS INT) AS v
        |  FROM v0, st WHERE event_type <> 'purchase'),
        |ca AS (SELECT v, count(*) AS ca FROM ba GROUP BY v),
        |cb AS (SELECT v, count(*) AS cb FROM bb GROUP BY v),
        |u AS (SELECT coalesce(ca.v, cb.v) AS v,
        |    coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
        |  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
        |c AS (SELECT v,
        |    sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |    sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
        |    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
        |  FROM u)
        |SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
        |  CAST(count(*) AS BIGINT) AS n_points,
        |  round(max(abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE)
        |    - CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE))), 6) AS d_stat
        |FROM c""".stripMargin,
    // Grouped binned-KS replay: ks_binned's grid prelude (identical
    // parenthesization) feeding ks_by_source's set-based per-source tail.
    "ks_binned_by_source" ->
      """WITH v0 AS (SELECT event_type AS source, CAST(value AS DOUBLE) AS v0v
        |  FROM events WHERE value IS NOT NULL),
        |st AS (SELECT min(v0v) AS lo, max(v0v) AS hi FROM v0),
        |base AS (SELECT source, CAST(CASE WHEN hi = lo THEN 0
        |      ELSE least(floor((v0v - lo) / (hi - lo) * 1024), 1023) END AS INT) AS v
        |  FROM v0, st),
        |cnt AS (SELECT source, v, count(*) AS c FROM base GROUP BY source, v),
        |gv AS (SELECT v, count(*) AS g FROM base GROUP BY v),
        |srcs AS (SELECT DISTINCT source FROM cnt),
        |grid AS (SELECT s.source, gv.v, gv.g, coalesce(c.c, 0) AS c
        |  FROM srcs s CROSS JOIN gv
        |  LEFT JOIN cnt c ON c.source = s.source AND c.v = gv.v),
        |cum AS (SELECT source,
        |    sum(c) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cin,
        |    sum(g - c) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS crest,
        |    sum(c) OVER (PARTITION BY source) AS nin,
        |    sum(g - c) OVER (PARTITION BY source) AS nrest
        |  FROM grid)
        |SELECT source, CAST(max(nin) AS BIGINT) AS n_in,
        |  CAST(max(nrest) AS BIGINT) AS n_rest,
        |  round(max(abs(CAST(cin AS DOUBLE) / CAST(nin AS DOUBLE)
        |    - CAST(crest AS DOUBLE) / CAST(nullif(nrest, 0) AS DOUBLE))), 6) AS d_stat
        |FROM cum GROUP BY source""".stripMargin,
    // Mann–Whitney replay: integer midranks (2·mr = 2·|below| + t + 1) off
    // the same (value, count) histogram, then the identically-parenthesized
    // u/z chain — every double step one correctly-rounded op (IEEE sqrt
    // included), so z is engine-exact before its display round.
    "mann_whitney" ->
      """WITH base AS (SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
        |  FROM documents WHERE text IS NOT NULL),
        |ca AS (SELECT v, count(*) AS ca FROM base WHERE doc_id % 2 = 0 GROUP BY v),
        |cb AS (SELECT v, count(*) AS cb FROM base WHERE doc_id % 2 = 1 GROUP BY v),
        |u AS (SELECT coalesce(ca.v, cb.v) AS v,
        |    coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
        |  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
        |r AS (SELECT ca, cb, ca + cb AS t,
        |    2 * (sum(ca + cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - (ca + cb))
        |      + (ca + cb) + 1 AS mr2
        |  FROM u),
        |a AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
        |    CAST(sum(ca * mr2) AS BIGINT) AS r2a,
        |    CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS t3 FROM r),
        |f AS (SELECT na, nb,
        |    (CAST(r2a AS DOUBLE) - CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) + 1.0)) / 2.0 AS u_stat,
        |    CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0 *
        |      ((CAST(na + nb AS DOUBLE) + 1.0) - CAST(t3 AS DOUBLE)
        |        / (CAST(na + nb AS DOUBLE) * (CAST(na + nb AS DOUBLE) - 1.0))) AS sig2
        |  FROM a)
        |SELECT na AS n_a, nb AS n_b, u_stat,
        |  CASE WHEN sig2 > 0 THEN round((u_stat
        |    - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0) / sqrt(sig2), 6) END AS z_stat
        |FROM f""".stripMargin,
    // PSI replay: the ks_binned 64-bin grid, Jeffreys add-1/2 smoothing
    // over the occupied-union bins, ln 6dp-DECIMAL per the lmScore
    // convention, order-free DECIMAL term sum.
    "psi_drift" ->
      """WITH v0 AS (SELECT event_type, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL),
        |st AS (SELECT min(v) AS lo, max(v) AS hi FROM v0),
        |ba AS (SELECT CAST(CASE WHEN hi = lo THEN 0
        |      ELSE least(floor((v - lo) / (hi - lo) * 64), 63) END AS INT) AS bin
        |  FROM v0, st WHERE event_type = 'purchase'),
        |bb AS (SELECT CAST(CASE WHEN hi = lo THEN 0
        |      ELSE least(floor((v - lo) / (hi - lo) * 64), 63) END AS INT) AS bin
        |  FROM v0, st WHERE event_type <> 'purchase'),
        |ca AS (SELECT bin, count(*) AS ca FROM ba GROUP BY bin),
        |cb AS (SELECT bin, count(*) AS cb FROM bb GROUP BY bin),
        |u AS (SELECT coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
        |  FROM ca FULL OUTER JOIN cb ON ca.bin = cb.bin),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
        |    CAST(count(*) AS BIGINT) AS k FROM u),
        |pq AS (SELECT na, nb, k,
        |    (CAST(ca AS DOUBLE) + 0.5) / (CAST(na AS DOUBLE) + CAST(k AS DOUBLE) * 0.5) AS p,
        |    (CAST(cb AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + CAST(k AS DOUBLE) * 0.5) AS q
        |  FROM u, tot),
        |terms AS (SELECT na, nb, k,
        |    CAST(round((p - q) * CAST(CAST(round(ln(p / q), 6) AS DECIMAL(18,6))
        |      AS DOUBLE), 6) AS DECIMAL(18,6)) AS term
        |  FROM pq)
        |SELECT max(na) AS n_a, max(nb) AS n_b, max(k) AS n_bins,
        |  CAST(sum(term) AS DOUBLE) AS psi
        |FROM terms""".stripMargin,
    // Grouped PSI replay: psi_drift's smoothing over the ks_by_source
    // source-vs-rest grid (global occupied-bin support).
    "psi_by_source" ->
      """WITH v0 AS (SELECT event_type AS source, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL),
        |st AS (SELECT min(v) AS lo, max(v) AS hi FROM v0),
        |base AS (SELECT source, CAST(CASE WHEN hi = lo THEN 0
        |      ELSE least(floor((v - lo) / (hi - lo) * 64), 63) END AS INT) AS bin
        |  FROM v0, st),
        |cnt AS (SELECT source, bin, count(*) AS c FROM base GROUP BY source, bin),
        |gv AS (SELECT bin, count(*) AS g FROM base GROUP BY bin),
        |srcs AS (SELECT DISTINCT source FROM cnt),
        |grid AS (SELECT s.source, gv.g, coalesce(c.c, 0) AS c
        |  FROM srcs s CROSS JOIN gv
        |  LEFT JOIN cnt c ON c.source = s.source AND c.bin = gv.bin),
        |wt AS (SELECT source, g, c,
        |    sum(c) OVER (PARTITION BY source) AS nin,
        |    sum(g - c) OVER (PARTITION BY source) AS nrest,
        |    count(*) OVER (PARTITION BY source) AS k
        |  FROM grid),
        |pq AS (SELECT source, nin, nrest,
        |    (CAST(c AS DOUBLE) + 0.5) / (CAST(nin AS DOUBLE) + CAST(k AS DOUBLE) * 0.5) AS p,
        |    (CAST(g - c AS DOUBLE) + 0.5) / (CAST(nrest AS DOUBLE) + CAST(k AS DOUBLE) * 0.5) AS q
        |  FROM wt),
        |terms AS (SELECT source, nin, nrest,
        |    CAST(round((p - q) * CAST(CAST(round(ln(p / q), 6) AS DECIMAL(18,6))
        |      AS DOUBLE), 6) AS DECIMAL(18,6)) AS term
        |  FROM pq)
        |SELECT source, CAST(max(nin) AS BIGINT) AS n_in,
        |  CAST(max(nrest) AS BIGINT) AS n_rest,
        |  CASE WHEN max(nrest) > 0 THEN CAST(sum(term) AS DOUBLE) END AS psi
        |FROM terms GROUP BY source""".stripMargin,
    // Jackknife replay: integer group sums, the same single-op loo/var
    // chains, θ and squared deviations 6dp-DECIMAL for order-free
    // cross-group sums; mean/se/ci emitted UNROUNDED (every step one
    // correctly-rounded op — no display-rounding boundary to disagree on).
    "jackknife_mean" ->
      """WITH base AS (SELECT source AS g,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
        |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
        |grp AS (SELECT g, count(*) AS n, SUM(v) AS s FROM base GROUP BY g),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(s) AS BIGINT) AS ss,
        |    CAST(count(*) AS BIGINT) AS gg FROM grp),
        |loo AS (SELECT nn, ss, gg,
        |    CAST(round(CAST(ss - s AS DOUBLE) / CAST(nullif(nn - n, 0) AS DOUBLE), 6)
        |      AS DECIMAL(18,6)) AS t6
        |  FROM grp, tot),
        |a0 AS (SELECT nn, ss, gg, SUM(t6) AS tsum, CAST(count(t6) AS BIGINT) AS gok
        |  FROM loo GROUP BY nn, ss, gg),
        |dev AS (SELECT l.nn, l.ss, l.gg, a0.gok,
        |    CAST(round((CAST(t6 AS DOUBLE) - CAST(tsum AS DOUBLE) / CAST(gok AS DOUBLE))
        |      * (CAST(t6 AS DOUBLE) - CAST(tsum AS DOUBLE) / CAST(gok AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS d2
        |  FROM loo l JOIN a0 USING (nn, ss, gg)),
        |f AS (SELECT nn, ss, gg, gok, SUM(d2) AS d2sum FROM dev GROUP BY nn, ss, gg, gok),
        |r AS (SELECT gg AS n_groups, nn AS n_rows,
        |    CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE) AS mean,
        |    CASE WHEN gok >= 2 THEN sqrt((CAST(gok AS DOUBLE) - 1.0) / CAST(gok AS DOUBLE)
        |      * CAST(d2sum AS DOUBLE)) END AS se_jack
        |  FROM f)
        |SELECT n_groups, n_rows, mean, se_jack,
        |  mean - 1.96 * se_jack AS ci_lo, mean + 1.96 * se_jack AS ci_hi
        |FROM r""".stripMargin,
    // Bootstrap replay: the SAME md5 coins (52-bit dyadic u — the
    // sample_priority idiom), the SAME pinned Poisson(1) CDF literals,
    // unrounded replicate means into exact order statistics.
    "bootstrap_ci" ->
      """WITH base AS (SELECT CAST(doc_id AS VARCHAR) AS id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
        |  FROM documents WHERE text IS NOT NULL),
        |ex AS (SELECT id, v, CAST(unnest(range(1, 41)) AS INT) AS rep FROM base),
        |uu AS (SELECT rep, v,
        |    (CAST(('0x' || substr(md5(id || ':' || CAST(rep AS VARCHAR)), 1, 13))::UBIGINT
        |      AS DOUBLE) + 0.5) / 4503599627370496.0 AS u
        |  FROM ex),
        |ww AS (SELECT rep, v,
        |    CASE WHEN u <= 0.3678794412 THEN 0 WHEN u <= 0.7357588823 THEN 1
        |         WHEN u <= 0.9196986029 THEN 2 WHEN u <= 0.9810118431 THEN 3
        |         WHEN u <= 0.9963401532 THEN 4 WHEN u <= 0.9994058152 THEN 5
        |         WHEN u <= 0.9999167589 THEN 6 WHEN u <= 0.9999897508 THEN 7
        |         WHEN u <= 0.9999988748 THEN 8 ELSE 9 END AS w
        |  FROM uu),
        |r AS (SELECT rep, CASE WHEN SUM(w) > 0
        |    THEN CAST(SUM(w * v) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) END AS m
        |  FROM ww GROUP BY rep),
        |tot AS (SELECT CAST(SUM(v) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n FROM base),
        |ms AS (SELECT list_sort(list(m)) AS ms, CAST(count(m) AS BIGINT) AS b
        |  FROM r WHERE m IS NOT NULL)
        |SELECT CAST(b AS INT) AS n_reps,
        |  CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |  CASE WHEN b > 0 THEN ms[CAST(ceil(0.025 * CAST(b AS DOUBLE)) AS INT)] END AS boot_lo,
        |  CASE WHEN b > 0 THEN ms[CAST(ceil(0.975 * CAST(b AS DOUBLE)) AS INT)] END AS boot_hi
        |FROM ms, tot""".stripMargin,
    // DOW replay: the daily/spine prelude, ISO weekday on both engines
    // (Spark weekday()+1 == DuckDB isodow — their dayofweek defaults
    // disagree on Sunday), unrounded single-division outputs.
    "dow_profile" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS rev FROM events GROUP BY 1),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |spine AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |filled AS (SELECT CAST(isodow(s.day) AS INT) AS dow,
        |    coalesce(d.rev, CAST(0 AS DECIMAL(18,4))) AS rev
        |  FROM spine s LEFT JOIN daily d USING (day)),
        |bydow AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_days, SUM(rev) AS sm
        |  FROM filled GROUP BY dow),
        |tot AS (SELECT SUM(sm) AS tt FROM bydow)
        |SELECT dow, n_days, CAST(sm AS DOUBLE) AS dow_total,
        |  CAST(sm AS DOUBLE) / CAST(n_days AS DOUBLE) AS dow_mean,
        |  CAST(sm AS DOUBLE) / CAST(tt AS DOUBLE) AS share
        |FROM bydow, tot""".stripMargin,
    // ACF replay: the moving_avg daily/spine prelude (global series), mean
    // off the exact DECIMAL daily sum, demeaned products 6dp-DECIMAL so
    // numerator/denominator sums are order-free, lag pairs by date+k join.
    "acf_daily" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS rev FROM events GROUP BY 1),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |spine AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |filled AS (SELECT s.day, coalesce(d.rev, CAST(0 AS DECIMAL(18,4))) AS rev
        |  FROM spine s LEFT JOIN daily d USING (day)),
        |st AS (SELECT SUM(rev) AS sm, CAST(count(*) AS BIGINT) AS n FROM filled),
        |dev AS (SELECT day, CAST(rev AS DOUBLE) - CAST(sm AS DOUBLE) / n AS d
        |  FROM filled, st),
        |den AS (SELECT SUM(CAST(round(d * d, 6) AS DECIMAL(18,6))) AS den FROM dev),
        |pairs AS (SELECT l.lag, a.d AS d1, b.d AS d2
        |  FROM dev a CROSS JOIN (SELECT CAST(unnest(range(1, 15)) AS INT) AS lag) l
        |  JOIN dev b ON b.day = a.day + l.lag),
        |num AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |    SUM(CAST(round(d1 * d2, 6) AS DECIMAL(18,6))) AS num
        |  FROM pairs GROUP BY lag)
        |SELECT CAST(lag AS INT) AS lag, n_pairs,
        |  CASE WHEN den > 0 THEN round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) END AS acf
        |FROM num, den""".stripMargin,
    // Ljung-Box replay: the acf chain, then the Q fold — per-term
    // r²/n_pairs (n - k == n_pairs on the gap-filled spine) rounded to
    // 6dp DECIMAL before the order-free sum, the (n·(n+2))·Σ chain
    // identically parenthesized, the pinned χ² literal on both sides.
    "ljung_box" -> (
      s"""WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS rev FROM events GROUP BY 1),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |spine AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |filled AS (SELECT s.day, coalesce(d.rev, CAST(0 AS DECIMAL(18,4))) AS rev
        |  FROM spine s LEFT JOIN daily d USING (day)),
        |st AS (SELECT SUM(rev) AS sm, CAST(count(*) AS BIGINT) AS n FROM filled),
        |dev AS (SELECT day, CAST(rev AS DOUBLE) - CAST(sm AS DOUBLE) / n AS d
        |  FROM filled, st),
        |den AS (SELECT SUM(CAST(round(d * d, 6) AS DECIMAL(18,6))) AS den FROM dev),
        |pairs AS (SELECT l.lag, a.d AS d1, b.d AS d2
        |  FROM dev a CROSS JOIN (SELECT CAST(unnest(range(1, 15)) AS INT) AS lag) l
        |  JOIN dev b ON b.day = a.day + l.lag),
        |num AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |    SUM(CAST(round(d1 * d2, 6) AS DECIMAL(18,6))) AS num
        |  FROM pairs GROUP BY lag),
        |r AS (SELECT CAST(lag AS INT) AS lag, n_pairs,
        |    CASE WHEN den > 0 THEN round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) END AS acf
        |  FROM num, den),
        |q AS (SELECT CAST(max(n_pairs + lag) AS BIGINT) AS n,
        |    CAST(max(lag) AS INT) AS h,
        |    SUM(CAST(round(acf * acf / n_pairs, 6) AS DECIMAL(18,6))) AS terms
        |  FROM r)
        |SELECT n AS n_days, h AS max_lag,
        |  CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * CAST(terms AS DOUBLE) AS q_stat,
        |  CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * CAST(terms AS DOUBLE)
        |    > $LjungBoxCrit14 AS reject
        |FROM q""".stripMargin),
    // Runs-test replay: exact lower median via floor((n+1)/2) rank (a
    // double->int CAST would round on DuckDB and truncate on Spark),
    // median-equal days dropped, R = sign changes + 1 via lag, the
    // mu/sigma/z chain identically parenthesized over 2*n1*n2 carried
    // exactly.
    "runs_test" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS rev FROM events GROUP BY 1),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |spine AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |filled AS (SELECT s.day, coalesce(d.rev, CAST(0 AS DECIMAL(18,4))) AS rev
        |  FROM spine s LEFT JOIN daily d USING (day)),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nall FROM filled),
        |rk AS (SELECT rev, row_number() OVER (ORDER BY rev, day) AS rk FROM filled),
        |med AS (SELECT rev AS med FROM rk, tot WHERE rk = floor((nall + 1) / 2)),
        |signed AS (SELECT day, CAST(rev > med AS INT) AS s
        |  FROM filled, med WHERE rev <> med),
        |marks AS (SELECT s,
        |    CASE WHEN lag(s) OVER (ORDER BY day) IS NULL THEN 1
        |         WHEN lag(s) OVER (ORDER BY day) <> s THEN 1 ELSE 0 END AS newrun
        |  FROM signed),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(s) AS BIGINT) AS n1, CAST(SUM(1 - s) AS BIGINT) AS n2,
        |    CAST(SUM(newrun) AS BIGINT) AS r
        |  FROM marks),
        |f AS (SELECT n, n1, n2, r,
        |    CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE) * 2.0 AS p FROM agg)
        |SELECT n AS n_days, n1 AS n_above, n2 AS n_below, r AS n_runs,
        |  CASE WHEN n1 > 0 AND n2 > 0 AND n > 1
        |        AND p * (p - CAST(n AS DOUBLE))
        |          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) > 0
        |    THEN round((CAST(r AS DOUBLE) - (p / CAST(n AS DOUBLE) + 1.0))
        |      / sqrt(p * (p - CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6)
        |  END AS z_stat
        |FROM f""".stripMargin,
    // CUSUM replay: demeaned terms round to 6dp DECIMAL before the
    // cumulative (association-free), argmax tie-breaks to earliest day,
    // the m-statistic chain identically parenthesized.
    "cusum_daily" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS rev FROM events GROUP BY 1),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |spine AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |filled AS (SELECT s.day, coalesce(d.rev, CAST(0 AS DECIMAL(18,4))) AS rev
        |  FROM spine s LEFT JOIN daily d USING (day)),
        |st AS (SELECT SUM(rev) AS sm, CAST(count(*) AS BIGINT) AS n FROM filled),
        |dev AS (SELECT day, n, CAST(rev AS DOUBLE) - CAST(sm AS DOUBLE) / n AS d
        |  FROM filled, st),
        |r0 AS (SELECT day, n, CAST(round(d * d, 6) AS DECIMAL(18,6)) AS sq,
        |    sum(CAST(round(d, 6) AS DECIMAL(18,6))) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM dev),
        |r1 AS (SELECT day, n, sq, abs(cum) AS ab FROM r0),
        |st2 AS (SELECT max(ab) AS smax, SUM(sq) AS ssq FROM r1),
        |one AS (SELECT CAST(max(n) AS BIGINT) AS n_days,
        |    min(CASE WHEN ab = smax THEN day END) AS cp_day,
        |    max(smax) AS smax, max(ssq) AS ssq
        |  FROM r1, st2)
        |SELECT n_days, cp_day, CAST(smax AS DOUBLE) AS s_max,
        |  CASE WHEN ssq > 0 THEN round(CAST(smax AS DOUBLE) /
        |    (sqrt(CAST(ssq AS DOUBLE) / CAST(n_days AS DOUBLE))
        |      * sqrt(CAST(n_days AS DOUBLE))), 6) END AS m_stat
        |FROM one""".stripMargin,
    "ks_by_source" ->
      """WITH base AS (SELECT source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
        |  FROM documents WHERE text IS NOT NULL),
        |cnt AS (SELECT source, v, count(*) AS c FROM base GROUP BY source, v),
        |gv AS (SELECT v, count(*) AS g FROM base GROUP BY v),
        |srcs AS (SELECT DISTINCT source FROM cnt),
        |grid AS (SELECT s.source, gv.v, gv.g, coalesce(c.c, 0) AS c
        |  FROM srcs s CROSS JOIN gv
        |  LEFT JOIN cnt c ON c.source = s.source AND c.v = gv.v),
        |cum AS (SELECT source,
        |    sum(c) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cin,
        |    sum(g - c) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS crest,
        |    sum(c) OVER (PARTITION BY source) AS nin,
        |    sum(g - c) OVER (PARTITION BY source) AS nrest
        |  FROM grid)
        |SELECT source, CAST(max(nin) AS BIGINT) AS n_in,
        |  CAST(max(nrest) AS BIGINT) AS n_rest,
        |  round(max(abs(CAST(cin AS DOUBLE) / CAST(nin AS DOUBLE)
        |    - CAST(crest AS DOUBLE) / CAST(nullif(nrest, 0) AS DOUBLE))), 6) AS d_stat
        |FROM cum GROUP BY source""".stripMargin,
    "pivot_status" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS year,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
        |FROM orders GROUP BY 1""".stripMargin,
    "pctl_prices" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  round(min(o_totalprice), 4) AS p_min,
        |  round(max(o_totalprice), 4) AS p_max
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "event_route" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
        |  CAST(min(ts) AS TIMESTAMP) AS first_ts,
        |  CAST(max(ts) AS TIMESTAMP) AS last_ts
        |FROM events GROUP BY event_type""".stripMargin,
    "sessionize" ->
      """WITH e AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events),
        |f AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800.0
        |    THEN 1 ELSE 0 END AS new_s FROM e),
        |g AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_id FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(ts) AS TIMESTAMP) AS session_start,
        |  CAST(max(ts) AS TIMESTAMP) AS session_end,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
        |FROM g GROUP BY user_id, session_id""".stripMargin,
    // Bit-exact replay of the integer fixed-point power iteration: the 8
    // rounds unroll as chained CTEs, every step a truncating integer
    // division on nonnegative operands (DuckDB's floor // == Spark's
    // truncating div there), so no float ever accumulates.
    "event_pagerank" -> {
      val base = "((1000000000000 // (SELECT nn FROM nn)) * 15) // 100"
      val rounds = (1 to 8).map { i =>
        s"""pr$i AS (SELECT n.node,
           |    $base + (85 * coalesce(c.cs, 0)) // 100 AS pr
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.to_type AS node, SUM((p.pr * e.p6) // 1000000) AS cs
           |    FROM pr${i - 1} p JOIN e ON e.from_type = p.node GROUP BY 1) c
           |  USING (node))""".stripMargin
      }.mkString(",\n")
      s"""WITH seq AS (SELECT user_id, event_type,
         |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
         |  FROM events),
         |ec AS (SELECT from_type, event_type AS to_type, count(*) AS n
         |  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2),
         |eo AS (SELECT from_type, SUM(n) AS out_n FROM ec GROUP BY 1),
         |e AS (SELECT ec.from_type, ec.to_type,
         |    (ec.n * 1000000) // eo.out_n AS p6
         |  FROM ec JOIN eo USING (from_type)),
         |nodes AS (SELECT DISTINCT event_type AS node FROM events),
         |nn AS (SELECT count(*) AS nn FROM nodes),
         |pr0 AS (SELECT node, 1000000000000 // (SELECT nn FROM nn) AS pr FROM nodes),
         |$rounds
         |SELECT node AS event_type, CAST(pr AS BIGINT) AS pagerank FROM pr8""".stripMargin
    },
    "event_transitions" ->
      """WITH e AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
        |  FROM events),
        |c AS (SELECT from_type, event_type AS to_type, count(*) AS n
        |  FROM e WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
        |  round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type), 6) AS p
        |FROM c""".stripMargin,
    "window_agg" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "dedup_exact" -> (CorpusCte +
      """
        |SELECT CAST(min(doc_id) AS BIGINT) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
        |FROM corpus GROUP BY regexp_replace(trim(lower(text)), '\s+', ' ', 'g')""".stripMargin),
    "dedup_stats" -> (CorpusCte + """,
        |clusters AS (SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |  FROM corpus GROUP BY regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
        |SELECT CAST(n_copies AS BIGINT) AS n_copies, CAST(count(*) AS BIGINT) AS n_clusters
        |FROM clusters GROUP BY n_copies""".stripMargin),
    "dedup_span" -> (CorpusCte + """,
        |toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM corpus),
        |idx AS (SELECT doc_id, w, CAST(ceil(len(w) / 20.0) AS INT) AS n_total,
        |    unnest(range(CAST(ceil(len(w) / 20.0) AS BIGINT))) AS i
        |  FROM toks WHERE len(w) > 0),
        |spans AS (SELECT doc_id, CAST(i AS INT) AS pos,
        |    array_to_string(w[i*20+1 : i*20+20], ' ') AS span, n_total
        |  FROM idx),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
        |  FROM spans),
        |kept AS (SELECT doc_id, pos, span, n_total FROM ranked WHERE rn = 1)
        |SELECT doc_id,
        |  string_agg(span, ' ' ORDER BY pos) AS text_dedup,
        |  CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(max(n_total) - count(*) AS BIGINT) AS n_dropped
        |FROM kept GROUP BY doc_id""".stripMargin),
    // CDC replay (chain in cdcChainCtes): keep first corpus occurrence of
    // every chunk, reassemble — mirrors the span oracle's tail.
    "dedup_cdc" -> (CorpusCte + ",\n" + cdcChainCtes("corpus", 32) + """,
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
        |  FROM f),
        |kept AS (SELECT doc_id, pos, chunk, n_total FROM ranked WHERE rn = 1)
        |SELECT doc_id,
        |  string_agg(chunk, ' ' ORDER BY pos) AS text_dedup,
        |  CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(max(n_total) - count(*) AS BIGINT) AS n_dropped
        |FROM kept GROUP BY doc_id""".stripMargin),
    // ExactSubstr replay — token-level restatement of the SAME semantics:
    // a token is cut iff SOME overlapping L-gram covering it is a
    // non-first occurrence of its md5'd content (first = smallest doc_id,
    // then position — the dedup_span ranking verbatim). The Spark side
    // evaluates this via interval merge + gap slicing; here the coverage
    // test is a direct position-range join (fine at oracle SF), so the
    // two sides agree only if the interval algebra is exactly right.
    "dedup_substr" -> {
      val l = SubstrRun
      s"""${CorpusCte},
        |toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM corpus),
        |t0 AS (SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) > 0),
        |g AS (SELECT doc_id, CAST(p AS INT) AS pos,
        |    md5(array_to_string(w[p+1 : p+$l], ' ')) AS h
        |  FROM (SELECT doc_id, w, unnest(range(n - $l + 1)) AS p FROM t0 WHERE n >= $l)),
        |dup AS (SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos, row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
        |    FROM g) WHERE rn >= 2),
        |tok AS (SELECT doc_id, CAST(t - 1 AS INT) AS ti, w[t] AS tk, n
        |  FROM (SELECT doc_id, w, n, unnest(range(1, n + 1)) AS t FROM t0)),
        |cov AS (SELECT DISTINCT t.doc_id, t.ti FROM tok t JOIN dup d
        |  ON t.doc_id = d.doc_id AND t.ti BETWEEN d.pos AND d.pos + $l - 1),
        |kept AS (SELECT t.doc_id, t.ti, t.tk, t.n FROM tok t LEFT JOIN cov c
        |  ON t.doc_id = c.doc_id AND t.ti = c.ti WHERE c.ti IS NULL)
        |SELECT doc_id, string_agg(tk, ' ' ORDER BY ti) AS text_dedup,
        |  CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(max(n) - count(*) AS BIGINT) AS n_dropped
        |FROM kept GROUP BY doc_id""".stripMargin
    },
    // Cross-corpus ExactSubstr scrub replay: bench = the odd half's
    // DISTINCT gram-hash set; a training gram is cut iff its hash is in
    // that set (no first-occurrence ranking — the benchmark is
    // canonical); the coverage/reassembly tail is dedup_substr's.
    "decontam_substr" -> {
      val l = SubstrRun
      s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
        |t0 AS (SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) > 0),
        |g AS (SELECT doc_id, CAST(p AS INT) AS pos,
        |    md5(array_to_string(w[p+1 : p+$l], ' ')) AS h
        |  FROM (SELECT doc_id, w, unnest(range(n - $l + 1)) AS p FROM t0 WHERE n >= $l)),
        |bench AS (SELECT DISTINCT h FROM g WHERE doc_id % 2 = 1),
        |dup AS (SELECT g.doc_id, g.pos FROM g JOIN bench USING (h) WHERE g.doc_id % 2 = 0),
        |tok AS (SELECT doc_id, CAST(t - 1 AS INT) AS ti, w[t] AS tk, n
        |  FROM (SELECT doc_id, w, n, unnest(range(1, n + 1)) AS t FROM t0)
        |  WHERE doc_id % 2 = 0),
        |cov AS (SELECT DISTINCT t.doc_id, t.ti FROM tok t JOIN dup d
        |  ON t.doc_id = d.doc_id AND t.ti BETWEEN d.pos AND d.pos + $l - 1),
        |kept AS (SELECT t.doc_id, t.ti, t.tk, t.n FROM tok t LEFT JOIN cov c
        |  ON t.doc_id = c.doc_id AND t.ti = c.ti WHERE c.ti IS NULL)
        |SELECT doc_id, string_agg(tk, ' ' ORDER BY ti) AS text_clean,
        |  CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(max(n) - count(*) AS BIGINT) AS n_dropped
        |FROM kept GROUP BY doc_id""".stripMargin
    },
    // Boilerplate scrub: same CDC chain at the ~4-token chunk scale over
    // plain documents; chunks in >= 3 distinct docs drop from EVERY doc.
    "boilerplate_scrub" -> ("WITH " + cdcChainCtes("documents", 4) + """,
        |dfx AS (SELECT chunk, count(DISTINCT doc_id) AS df FROM f GROUP BY 1),
        |kept AS (SELECT f.doc_id, f.pos, f.chunk, f.n_total
        |  FROM f JOIN dfx USING (chunk) WHERE dfx.df < 3)
        |SELECT doc_id,
        |  string_agg(chunk, ' ' ORDER BY pos) AS text_clean,
        |  CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(max(n_total) - count(*) AS BIGINT) AS n_dropped
        |FROM kept GROUP BY doc_id""".stripMargin),
    "neardup_minhash" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
        |  FROM toks WHERE len(w) >= 3),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.8""".stripMargin,
    // Exact operator, exact oracle: the all-pairs brute force IS the
    // contract here (PPJoin guarantees completeness, not approximation),
    // so any miss by the prefix filter is a hard red, not noise.
    "setsim_join" -> SetSimJoinSql,
    // Asymmetric containment, all-pairs brute force — completeness IS the
    // contract (ordered pairs: exact copies qualify in both directions).
    // The hashed carrier answers the same exact-string statement (key
    // representation only, the setsim_join_hashed discipline).
    "containment_join" -> ContainmentJoinSql,
    "containment_join_hashed" -> ContainmentJoinSql,
    // Same oracle verbatim: hashed shingle keys change only the shuffle
    // representation; the verify stage scores true shingle arrays.
    "setsim_join_hashed" -> SetSimJoinSql,
    // True connected-components fixpoint via recursive CTE — the Spark
    // side's bounded label propagation must reach the same labels.
    "dedup_cluster" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
        |  FROM toks WHERE len(w) >= 3),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.8),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
        |reach(src, node) AS (
        |  SELECT doc_id AS src, doc_id AS node FROM documents
        |  UNION
        |  SELECT r.src, e.dst AS node FROM reach r JOIN edges e ON e.src = r.node)
        |SELECT src AS doc_id, CAST(min(node) AS BIGINT) AS cluster_id,
        |  min(node) = src AS kept
        |FROM reach GROUP BY src""".stripMargin,
    // Same recursive-CTE fixpoint; the kept rule becomes the per-cluster
    // score argmax (n_chars desc, id asc) instead of min id.
    "dedup_keep_best" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
        |  FROM toks WHERE len(w) >= 3),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.8),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
        |reach(src, node) AS (
        |  SELECT doc_id AS src, doc_id AS node FROM documents
        |  UNION
        |  SELECT r.src, e.dst AS node FROM reach r JOIN edges e ON e.src = r.node),
        |lab AS (SELECT src AS doc_id, CAST(min(node) AS BIGINT) AS cluster_id
        |  FROM reach GROUP BY src)
        |SELECT l.doc_id, l.cluster_id, CAST(d.n_chars AS BIGINT) AS score,
        |  row_number() OVER (PARTITION BY l.cluster_id
        |    ORDER BY d.n_chars DESC, l.doc_id) = 1 AS kept
        |FROM lab l JOIN documents d ON l.doc_id = d.doc_id""".stripMargin,
    "fragment_pairs" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |hb AS (SELECT doc_id,
        |    array_to_string(w[1:3], ' ') AS head3,
        |    array_to_string(w[len(w)-2:len(w)], ' ') AS tail3
        |  FROM t WHERE len(w) >= 6)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.tail3 AS boundary
        |FROM hb a JOIN hb b ON a.tail3 = b.head3 AND a.doc_id <> b.doc_id""".stripMargin,
    "pii_scrub" -> (
      s"""SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
        |  text || ' contact user' || doc_id || '@example.com or +1-555-01' || doc_id
        |       || ' at 192.168.0.' || (doc_id % 256),
        |  '${TextAnalysis.EmailRe}', '[EMAIL]', 'g'),
        |  '${TextAnalysis.Ipv4Re}', '[IP]', 'g'),
        |  '${TextAnalysis.PhoneRe}', '[PHONE]', 'g') AS scrubbed
        |FROM documents""".stripMargin),
    // Luhn replay: identical RE2 candidate extraction, the same right-to-
    // left double-every-second digit sum as integer list arithmetic.
    "pii_luhn" -> (
      s"""WITH d2 AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 7 = 0 THEN ' card 4111111111111111'
        |         WHEN doc_id % 11 = 0 THEN ' card 4111111111111112'
        |         WHEN doc_id % 13 = 0 THEN ' card 4111 1111 1111 1111 ok'
        |         ELSE '' END AS text
        |  FROM documents WHERE text IS NOT NULL),
        |cand AS (SELECT doc_id,
        |    unnest(regexp_extract_all(text, '${TextAnalysis.CardRe}')) AS candidate
        |  FROM d2),
        |dd AS (SELECT doc_id, candidate,
        |    regexp_replace(candidate, '[ -]', '', 'g') AS digits FROM cand)
        |SELECT doc_id, candidate, digits,
        |  (length(digits) BETWEEN 13 AND 19 AND
        |   CAST(list_sum(list_transform(range(1, length(digits) + 1), i ->
        |     CASE WHEN (length(digits) - i) % 2 = 1
        |          THEN CASE WHEN 2 * (ascii(substr(digits, i, 1)) - 48) > 9
        |               THEN 2 * (ascii(substr(digits, i, 1)) - 48) - 9
        |               ELSE 2 * (ascii(substr(digits, i, 1)) - 48) END
        |          ELSE ascii(substr(digits, i, 1)) - 48 END)) AS BIGINT) % 10 = 0)
        |  AS valid
        |FROM dd""".stripMargin),
    // Mojibake replay: identical planted artifact strings (shared Scala
    // constants interpolated into both engines), identical RE2 classes,
    // bad_permille one terminal division (engine-exact, unrounded).
    "mojibake_gate" -> (
      s"""WITH d2 AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 17 = 0 THEN '$MojiPlant17'
        |         WHEN doc_id % 19 = 0 THEN '$MojiPlant19'
        |         WHEN doc_id % 23 = 0 THEN '$MojiPlant23'
        |         ELSE '' END AS text
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
        |    CAST(len(regexp_extract_all(text, '${TextAnalysis.MojibakeReplRe}')) AS INT) AS repl_cnt,
        |    CAST(len(regexp_extract_all(text, '${TextAnalysis.MojibakeC1Re}')) AS INT) AS c1_cnt,
        |    CAST(len(regexp_extract_all(text, '${TextAnalysis.MojibakeDigraphRe}')) AS INT) AS digraph_cnt
        |  FROM d2),
        |r AS (SELECT doc_id, n_chars, repl_cnt, c1_cnt, digraph_cnt,
        |    CASE WHEN n_chars > 0
        |      THEN CAST(repl_cnt + c1_cnt + digraph_cnt AS DOUBLE) * 1000.0
        |           / CAST(n_chars AS DOUBLE)
        |      ELSE 0.0 END AS bad_permille
        |  FROM c)
        |SELECT doc_id, n_chars, repl_cnt, c1_cnt, digraph_cnt, bad_permille,
        |  bad_permille <= 2.0 AS keep
        |FROM r""".stripMargin),
    // Script-profile replay: same planted samples (shared constants), the
    // RE2 spellings of the same script classes (\p{Latin} vs Java's
    // \p{IsLatin}), exact integer sums, one terminal division.
    "script_profile" -> {
      def re2(name: String): String =
        TextAnalysis.ScriptClasses.find(_._1 == name).get._3
      s"""WITH d2 AS (SELECT source, text ||
        |    CASE WHEN doc_id % 29 = 0 THEN '$ScriptPlant29'
        |         WHEN doc_id % 31 = 0 THEN '$ScriptPlant31'
        |         WHEN doc_id % 37 = 0 THEN '$ScriptPlant37'
        |         WHEN doc_id % 41 = 0 THEN '$ScriptPlant41'
        |         ELSE '' END AS text
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT source, CAST(length(text) AS BIGINT) AS n,
        |    CAST(len(regexp_extract_all(text, '${re2("latin")}')) AS BIGINT) AS latin,
        |    CAST(len(regexp_extract_all(text, '${re2("digit")}')) AS BIGINT) AS digit,
        |    CAST(len(regexp_extract_all(text, '${re2("cyrillic")}')) AS BIGINT) AS cyr,
        |    CAST(len(regexp_extract_all(text, '${re2("han")}')) AS BIGINT) AS han,
        |    CAST(len(regexp_extract_all(text, '${re2("arabic")}')) AS BIGINT) AS arab,
        |    CAST(len(regexp_extract_all(text, '${re2("space")}')) AS BIGINT) AS sp
        |  FROM d2)
        |SELECT source, CAST(SUM(n) AS BIGINT) AS n_chars,
        |  CAST(SUM(latin) AS BIGINT) AS latin_cnt,
        |  CAST(SUM(digit) AS BIGINT) AS digit_cnt,
        |  CAST(SUM(cyr) AS BIGINT) AS cyrillic_cnt,
        |  CAST(SUM(han) AS BIGINT) AS han_cnt,
        |  CAST(SUM(arab) AS BIGINT) AS arabic_cnt,
        |  CAST(SUM(sp) AS BIGINT) AS space_cnt,
        |  CAST(SUM(n) - SUM(latin) - SUM(digit) - SUM(cyr) - SUM(han)
        |    - SUM(arab) - SUM(sp) AS BIGINT) AS other_cnt,
        |  CASE WHEN SUM(n) > 0
        |    THEN CAST(SUM(n) - SUM(latin) - SUM(digit) - SUM(sp) AS DOUBLE)
        |         * 1000.0 / CAST(SUM(n) AS DOUBLE)
        |    ELSE 0.0 END AS non_latin_permille
        |FROM c GROUP BY source""".stripMargin
    },
    "corpus_shuffle" ->
      """SELECT doc_id, CAST(row_number() OVER (
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)) || CAST(doc_id AS VARCHAR))
        |  AS BIGINT) AS shuffle_rank
        |FROM documents""".stripMargin,
    "sample_weighted" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
        |  CASE lang WHEN 'en' THEN 'g' WHEN 'zh' THEN '80000000'
        |            WHEN 'es' THEN '40000000' WHEN 'de' THEN '19999999'
        |            ELSE 'c0000000' END""".stripMargin,
    // Priority sampling: u = (52-bit md5 prefix + 0.5) / 2^52 is a dyadic
    // rational (every op exact in doubles), priority = weight / u one
    // correctly-rounded division — bit-identical to Spark, so the float
    // columns hash-match without decimal laundering.
    "sample_priority" ->
      """WITH s AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
        |    CAST(n_chars AS DOUBLE) /
        |      ((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::UBIGINT AS DOUBLE)
        |        + 0.5) / 4503599627370496.0) AS priority
        |  FROM documents),
        |top AS (SELECT * FROM s ORDER BY priority DESC, doc_id LIMIT 201),
        |m AS (SELECT min(priority) AS tau, count(*) AS n FROM top)
        |SELECT doc_id, weight, priority,
        |  CASE WHEN m.n <= 200 THEN weight ELSE greatest(weight, m.tau) END AS w_est
        |FROM top, m
        |QUALIFY row_number() OVER (ORDER BY priority DESC, doc_id) <= 200""".stripMargin,
    "sample_priority_strat" ->
      """WITH s AS (SELECT lang, doc_id, CAST(n_chars AS DOUBLE) AS weight,
        |    CAST(n_chars AS DOUBLE) /
        |      ((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::UBIGINT AS DOUBLE)
        |        + 0.5) / 4503599627370496.0) AS priority
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER
        |    (PARTITION BY lang ORDER BY priority DESC, doc_id) AS rn FROM s),
        |t AS (SELECT *, max(CASE WHEN rn = 51 THEN priority END)
        |    OVER (PARTITION BY lang) AS tau FROM r)
        |SELECT lang, doc_id, weight, priority,
        |  CASE WHEN tau IS NULL THEN weight ELSE greatest(weight, tau) END AS w_est
        |FROM t WHERE rn <= 50""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) WHERE rk <= 5""".stripMargin,
    // PMI from the same single-tokenize counts; the pmi expression's
    // parenthesization is pinned to the Spark side's, rounded 6dp, ties
    // on the bigram string.
    "pmi_collocations" ->
      """WITH toks AS (SELECT string_split_regex(trim(text), '\s+') AS w FROM documents),
        |uni AS (SELECT unnest(w) AS g FROM toks),
        |ucnt AS (SELECT g AS wrd, count(*) AS cw FROM uni GROUP BY g),
        |nt AS (SELECT SUM(cw) AS n FROM ucnt),
        |bi AS (SELECT unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g FROM toks),
        |bcnt AS (SELECT g, CAST(count(*) AS BIGINT) AS n_pair FROM bi
        |  GROUP BY g HAVING count(*) >= 5),
        |s AS (SELECT b.g AS bigram, b.n_pair,
        |    round(ln((CAST(b.n_pair AS DOUBLE) / cl.cw)
        |      * (CAST((SELECT n FROM nt) AS DOUBLE) / cr.cw)), 6) AS pmi
        |  FROM bcnt b
        |  JOIN ucnt cl ON cl.wrd = string_split(b.g, ' ')[1]
        |  JOIN ucnt cr ON cr.wrd = string_split(b.g, ' ')[2]),
        |r AS (SELECT bigram, n_pair, pmi,
        |    row_number() OVER (ORDER BY pmi DESC, bigram) AS rank FROM s)
        |SELECT bigram, n_pair, pmi, CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 50""".stripMargin,
    // Same closed-form windows as the Spark side: funded via the monotone
    // capacity test, the level via one integer division, remainder to the
    // first unfunded sources in id order — all-integer, engine-exact.
    "mix_waterfill" ->
      """WITH caps AS (SELECT source,
        |    CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS cap_tokens
        |  FROM documents GROUP BY source),
        |t AS (SELECT SUM(cap_tokens) AS total, count(*) AS n FROM caps),
        |rk AS (SELECT source, cap_tokens,
        |    (SELECT total // 2 FROM t) AS b, (SELECT n FROM t) AS n,
        |    row_number() OVER (ORDER BY cap_tokens, source) AS rn,
        |    SUM(cap_tokens) OVER (ORDER BY cap_tokens, source
        |      ROWS UNBOUNDED PRECEDING) AS pref
        |  FROM caps),
        |f AS (SELECT *,
        |    cap_tokens * (n - rn + 1) + (pref - cap_tokens) <= b AS funded
        |  FROM rk),
        |g AS (SELECT *,
        |    SUM(CASE WHEN funded THEN 1 ELSE 0 END) OVER () AS k,
        |    SUM(CASE WHEN funded THEN cap_tokens ELSE 0 END) OVER () AS pk,
        |    row_number() OVER (PARTITION BY funded ORDER BY source) AS ur
        |  FROM f)
        |SELECT source, cap_tokens,
        |  CAST(CASE WHEN funded THEN cap_tokens
        |       ELSE (b - pk) // (n - k)
        |         + (CASE WHEN ur <= (b - pk) % (n - k) THEN 1 ELSE 0 END)
        |       END AS BIGINT) AS alloc_tokens,
        |  funded
        |FROM g""".stripMargin,
    // Same rank construction; the cut boundaries are floor(c * n) with the
    // identical double literals, so the split is engine-exact.
    "split_assign" ->
      """SELECT doc_id, lang,
        |  CASE WHEN rn <= floor(0.9 * n) THEN 'train'
        |       WHEN rn <= floor(0.95 * n) THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)""".stripMargin,
    "seq_pack" ->
      """SELECT doc_id, source,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens,
        |  CAST(floor(coalesce(SUM(len(string_split_regex(trim(text), '\s+'))) OVER (
        |    PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0) AS BIGINT) AS bin
        |FROM documents""".stripMargin,
    "chunk_docs" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |e AS (SELECT doc_id, w,
        |    CAST(ceil(greatest(len(w) - 32, 0) / 24.0) AS INT) AS n_extra FROM t),
        |c AS (SELECT doc_id, w, CAST(unnest(range(0, n_extra + 1)) AS INT) AS chunk_id FROM e)
        |SELECT doc_id, chunk_id,
        |  CAST(len(w[chunk_id * 24 + 1 : chunk_id * 24 + 32]) AS INT) AS n_chunk_tokens,
        |  array_to_string(w[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ') AS chunk_text
        |FROM c""".stripMargin,
    "ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |    list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS s
        |  FROM toks WHERE len(w) >= 2)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
        |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""".stripMargin,
    "source_overlap" -> SourceOverlapSql,
    // Bottom-k replay: per-source k smallest distinct gram md5s via a
    // source-partitioned row_number, then pure list arithmetic — the
    // union's bottom-k, its overlap with the intersection, one division.
    "source_overlap_sketch" ->
      """WITH toks AS (SELECT source, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT DISTINCT source, md5(g) AS h
        |  FROM toks, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS t(g)
        |  WHERE len(w) >= 2),
        |bk AS (SELECT source, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM sh),
        |sk AS (SELECT source, list_sort(list(h)) AS bl FROM bk WHERE rn <= 64 GROUP BY source),
        |p AS (SELECT a.source AS source_a, b.source AS source_b, a.bl AS la, b.bl AS lb
        |  FROM sk a JOIN sk b ON a.source < b.source),
        |e AS (SELECT source_a, source_b,
        |    list_slice(list_sort(list_distinct(list_concat(la, lb))), 1, 64) AS u,
        |    list_intersect(la, lb) AS comm
        |  FROM p)
        |SELECT source_a, source_b,
        |  CAST(len(list_intersect(u, comm)) AS BIGINT) AS n_common_sk,
        |  round(CAST(len(list_intersect(u, comm)) AS DOUBLE) / len(u), 6) AS est_jaccard
        |FROM e""".stripMargin,
    // Same oracle verbatim: hashKeys only changes the join-key
    // representation (8-byte xxhash64 vs raw n-gram string); the output
    // matrix is identical modulo ~2^-64 collision probability, so the
    // hashed carrier answers to the exact-string oracle.
    "source_overlap_hashed" -> SourceOverlapSql,
    // Brute-force simhash near-dup: rebuild the frequency-weighted Charikar
    // signature from the md5 token hash (identical bits to the Spark
    // expression), then ALL pairs with hamming <= 6 verified by 3-gram
    // Jaccard >= 0.8 — exactly the set the pigeonhole banding guarantees.
    "neardup_simhash" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |    FROM documents),
        |th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h, count(*) AS cnt
        |    FROM toks GROUP BY doc_id, h),
        |bits AS (SELECT doc_id, i,
        |    CASE WHEN SUM(CASE WHEN ((h >> i) & 1) = 1 THEN cnt ELSE -cnt END) > 0
        |      THEN (1::UBIGINT << i) ELSE 0::UBIGINT END AS b
        |  FROM th, range(64) r(i) GROUP BY doc_id, i),
        |sig AS (SELECT doc_id, bit_or(b) AS s FROM bits GROUP BY doc_id),
        |tw AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
        |  FROM tw WHERE len(w) >= 3),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND bit_count(xor(a.s, b.s)) <= 6),
        |j AS (SELECT doc_a, doc_b,
        |    round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        |      / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))), 6) AS jaccard
        |  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b)
        |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.8""".stripMargin,
    // The greedy MMR steps unroll as CTEs (the event_pagerank pattern):
    // candidate/pairwise cosines 6dp-rounded before any arithmetic, λ/μ
    // as the same decimal literals the Spark side computes with, argmax
    // ties on neighbor_id — each step is engine-exact by construction.
    "mmr_topk" -> {
      val steps = (2 to 5).map { t =>
        s"""ch$t AS (SELECT * FROM ch${t - 1}
           |  UNION ALL
           |  SELECT query_id, neighbor_id, $t AS mmr_rank FROM (
           |    SELECT cd.query_id, cd.neighbor_id,
           |      row_number() OVER (PARTITION BY cd.query_id
           |        ORDER BY 0.7 * cd.sim - 0.3 * pen.mx DESC, cd.neighbor_id) AS rk
           |    FROM cand cd
           |    JOIN (SELECT p.query_id, p.ida, max(p.psim) AS mx
           |        FROM p JOIN ch${t - 1} ch
           |          ON ch.query_id = p.query_id AND ch.neighbor_id = p.idb
           |        GROUP BY p.query_id, p.ida) pen
           |      ON pen.query_id = cd.query_id AND pen.ida = cd.neighbor_id
           |    WHERE NOT EXISTS (SELECT 1 FROM ch${t - 1} x
           |      WHERE x.query_id = cd.query_id AND x.neighbor_id = cd.neighbor_id)
           |  ) WHERE rk = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |    FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        |    FROM embeddings WHERE vec_id >= 5),
        |s0 AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS rawsim
        |    FROM q, c),
        |sh AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
        |      ORDER BY rawsim DESC, neighbor_id) AS rk
        |    FROM s0 WHERE NOT isnan(rawsim)) WHERE rk <= 20),
        |cand AS (SELECT s.query_id, s.neighbor_id, round(s.rawsim, 6) AS sim
        |    FROM s0 s JOIN sh USING (query_id, neighbor_id)),
        |p AS (SELECT a.query_id, a.neighbor_id AS ida, b.neighbor_id AS idb,
        |      round(list_cosine_similarity(ca.cv, cb.cv), 6) AS psim
        |    FROM sh a JOIN sh b USING (query_id)
        |    JOIN c ca ON ca.neighbor_id = a.neighbor_id
        |    JOIN c cb ON cb.neighbor_id = b.neighbor_id
        |    WHERE a.neighbor_id <> b.neighbor_id),
        |ch1 AS (SELECT query_id, neighbor_id, 1 AS mmr_rank FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS rk FROM cand) WHERE rk = 1),
        |$steps
        |SELECT query_id, neighbor_id, CAST(mmr_rank AS INT) AS mmr_rank FROM ch5""".stripMargin
    },
    "ann_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |    FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        |    FROM embeddings WHERE vec_id >= 5),
        |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim FROM q, c),
        |r AS (SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM r WHERE rank <= 10""".stripMargin,
    // Sign fold replay: both engines set bit i iff component i+1 > 0; the
    // two 32-bit words stay below 2^32 so no signed-compare trap applies,
    // and XOR+popcount is sign-free by construction. Shortlist order
    // (hamming asc, id asc) and the exact-cosine rerank mirror the Spark
    // operator's TopKAgg orderings exactly.
    "ann_hamming" ->
      """WITH q0 AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |    FROM embeddings WHERE vec_id < 5),
        |c0 AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        |    FROM embeddings WHERE vec_id >= 5),
        |qs AS (SELECT query_id,
        |    CAST(list_sum(list_transform(range(0, 32), i ->
        |      CASE WHEN qv[i+1] > 0 THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS qlo,
        |    CAST(list_sum(list_transform(range(32, 64), i ->
        |      CASE WHEN qv[i+1] > 0 THEN (1::BIGINT << (i-32)) ELSE 0 END)) AS BIGINT) AS qhi
        |  FROM q0),
        |cs AS (SELECT neighbor_id,
        |    CAST(list_sum(list_transform(range(0, 32), i ->
        |      CASE WHEN cv[i+1] > 0 THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS clo,
        |    CAST(list_sum(list_transform(range(32, 64), i ->
        |      CASE WHEN cv[i+1] > 0 THEN (1::BIGINT << (i-32)) ELSE 0 END)) AS BIGINT) AS chi
        |  FROM c0),
        |h AS (SELECT query_id, neighbor_id,
        |    CAST(bit_count(xor(qlo, clo)) AS INT) + CAST(bit_count(xor(qhi, chi)) AS INT) AS ham
        |  FROM qs, cs),
        |sh AS (SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY ham, neighbor_id) AS hr FROM h),
        |rr AS (SELECT s.query_id, s.neighbor_id,
        |    list_cosine_similarity(q0.qv, c0.cv) AS sim
        |  FROM sh s
        |  JOIN q0 ON q0.query_id = s.query_id
        |  JOIN c0 ON c0.neighbor_id = s.neighbor_id
        |  WHERE s.hr <= 50),
        |f AS (SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM rr)
        |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM f WHERE rank <= 10""".stripMargin,
    "embedding_norms" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        |  round(sqrt(list_aggregate([x*x for x in CAST(embedding AS DOUBLE[])], 'sum')), 4) AS l2_norm,
        |  round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum') / len(embedding), 6) AS mean_component
        |FROM embeddings""".stripMargin,
    // No rounding anywhere: the squared-norm fold is order-pinned
    // (list_reduce over the squared list == Spark's ascending aggregate
    // fold, 0.0 + x1^2 being exactly x1^2), and sqrt / the ratio are
    // single correctly-rounded ops — raw doubles hash-match.
    "embedding_matryoshka" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id,
        |    sqrt(list_reduce([x*x for x in v], (a, b) -> a + b)) AS norm_full,
        |    sqrt(list_reduce([x*x for x in v[1:16]], (a, b) -> a + b)) AS norm_16,
        |    sqrt(list_reduce([x*x for x in v[1:32]], (a, b) -> a + b)) AS norm_32
        |  FROM e)
        |SELECT vec_id, norm_full,
        |  norm_16, norm_16 / norm_full AS retained_16,
        |  norm_32, norm_32 / norm_full AS retained_32
        |FROM n""".stripMargin,
    // JL replay: the SAME seed-19 16×64 Gaussian planes inline as list
    // literals; each component is an index-ascending list_reduce fold
    // (≡ Spark's aggregate left fold) × the exact dyadic 0.25 scale,
    // rounded once; norm_ratio folds over the ROUNDED components so both
    // engines square identical inputs.
    "embedding_jl" -> {
      val comps = graft.operators.Similarity.jlPlanes(16, 64).map { p =>
        s"round(list_reduce(list_transform(range(1, 65), i -> " +
          s"coalesce(v[i], 0.0) * ([${p.mkString(", ")}])[i]), " +
          "(a, b) -> a + b) * 0.25, 6)"
      }.mkString(",\n        |    ").stripMargin
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |p AS (SELECT vec_id, v, [$comps] AS proj FROM e),
        |n AS (SELECT vec_id, proj,
        |    round(sqrt(list_reduce([x*x for x in proj], (a, b) -> a + b)) /
        |      sqrt(list_reduce([x*x for x in v], (a, b) -> a + b)), 6) AS norm_ratio
        |  FROM p),
        |u AS (SELECT vec_id, norm_ratio,
        |    unnest([{'ci': i - 1, 'val': proj[i]} for i in range(1, len(proj) + 1)]) AS c
        |  FROM n)
        |SELECT vec_id, CAST(c.ci AS INT) AS component_idx, c.val AS value,
        |  norm_ratio
        |FROM u""".stripMargin
    },
    "multimodal_meta" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  sha256(text) AS sha256
        |FROM documents""".stripMargin,
    "frame_sample" ->
      """WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
        |f AS (SELECT doc_id, n, CAST(ceil(n / 64.0) AS INT) AS n_frames FROM m WHERE n > 0)
        |SELECT doc_id, n_frames,
        |  CAST(unnest(range(0, n_frames, 4)) AS INT) AS frame_idx,
        |  CAST(least(64, n - CAST(unnest(range(0, n_frames, 4)) AS INT) * 64) AS INT) AS frame_bytes
        |FROM f""".stripMargin,
    "embedding_cov" -> EmbeddingCovSql,
    "embedding_cov_hd" -> EmbeddingCovSql,
    "embedding_pca" -> EmbeddingPcaSql,
    "embedding_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT vec_id, v,
        |    greatest(list_aggregate([abs(x) for x in v], 'max'), 1e-12) AS mx FROM e),
        |q AS (SELECT vec_id, [CAST(round(x / mx * 127) AS INT) for x in v] AS qv FROM m)
        |SELECT vec_id, qv[1] AS q0,
        |  CAST(list_aggregate(qv, 'min') AS INT) AS q_min,
        |  CAST(list_aggregate(qv, 'max') AS INT) AS q_max,
        |  CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum
        |FROM q""".stripMargin,
    "decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
        |  FROM toks WHERE len(w) >= 3),
        |pairs AS (SELECT a.doc_id AS train_id, b.doc_id AS bench_id,
        |    round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1),
        |hits AS (SELECT * FROM pairs WHERE jaccard >= 0.8),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY train_id
        |    ORDER BY jaccard DESC, bench_id DESC) AS rn FROM hits)
        |SELECT train_id, bench_id, jaccard FROM ranked WHERE rn = 1""".stripMargin,
    "label_centroids" ->
      """WITH u AS (SELECT label, unnest(
        |    [{'pos': i - 1, 'x': CAST(embedding[i] AS DOUBLE)}
        |     for i in range(1, len(embedding) + 1)]) AS e FROM embeddings),
        |m AS (SELECT label, e.pos AS pos, e.x AS x FROM u),
        |agg AS (SELECT label, pos, count(*) AS n,
        |    SUM(CAST(x AS DECIMAL(28,12))) AS s FROM m GROUP BY label, pos)
        |SELECT label, CAST(n AS BIGINT) AS n_vecs, CAST(pos AS INT) AS pos,
        |  round(CAST(s AS DOUBLE) / n, 6) AS c
        |FROM agg""".stripMargin,
    "decontam_ngram" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(
        |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |     for i in range(1, len(w) - 3)])) AS gram
        |  FROM toks WHERE len(w) >= 5),
        |hits AS (SELECT g.doc_id AS train_id, g.gram FROM g
        |  WHERE g.doc_id % 2 = 0
        |    AND g.gram IN (SELECT gram FROM g b WHERE b.doc_id % 2 = 1))
        |SELECT train_id, CAST(count(*) AS BIGINT) AS n_hit_grams,
        |  min(gram) AS first_hit
        |FROM hits GROUP BY train_id""".stripMargin,
    // Bloom: every coordinate replays — salted-md5 positions, 32-bit
    // lanes packed into BIGINT words by bit_or, probes via (bits >> bit)
    // & 1 on a LEFT join (absent word = unset), bool_and over the k
    // probes; the exact side is the same distinct-member left join.
    "bloom_decontam" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |hs AS (SELECT unnest(range(0, 4)) AS h),
        |bp AS (SELECT ('0x' || substr(md5('bf' || h || ':' || text), 1, 8))::BIGINT % 8192 AS pos
        |  FROM (SELECT text FROM d WHERE doc_id % 97 = 0) m, hs),
        |w AS (SELECT CAST(pos // 32 AS INT) AS widx,
        |    bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
        |  FROM bp GROUP BY pos // 32),
        |pp AS (SELECT doc_id, ('0x' || substr(md5('bf' || h || ':' || text), 1, 8))::BIGINT % 8192 AS pos
        |  FROM d, hs),
        |ph AS (SELECT doc_id,
        |    COALESCE(((w.bits >> CAST(pos % 32 AS INT)) & 1) = 1, FALSE) AS hit
        |  FROM pp LEFT JOIN w ON CAST(pos // 32 AS INT) = w.widx),
        |bl AS (SELECT doc_id, bool_and(hit) AS bloom_hit FROM ph GROUP BY doc_id),
        |b AS (SELECT DISTINCT text FROM d WHERE doc_id % 97 = 0),
        |ex AS (SELECT d.doc_id, (b.text IS NOT NULL) AS exact_hit
        |  FROM d LEFT JOIN b ON d.text = b.text)
        |SELECT bl.doc_id, bloom_hit, exact_hit
        |FROM bl JOIN ex ON bl.doc_id = ex.doc_id""".stripMargin,
    "lm_score" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        |vocab AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
        |n AS (SELECT count(*) AS n_total FROM tok)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |  round(CAST(SUM(tf * CAST(round(ln(CAST(cnt AS DOUBLE) / n_total), 6)
        |    AS DECIMAL(18,6))) AS DOUBLE) / SUM(tf), 6) AS avg_logprob
        |FROM tf JOIN vocab USING (token), n GROUP BY doc_id""".stripMargin,
    "lm_bigram" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |bi AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bigram FROM tok),
        |tf AS (SELECT doc_id, bigram, count(*) AS tf FROM bi GROUP BY doc_id, bigram),
        |vb AS (SELECT bigram, SUM(tf) AS cnt_bi FROM tf GROUP BY bigram),
        |vc AS (SELECT split_part(bigram, ' ', 1) AS ctx, SUM(cnt_bi) AS cnt_ctx FROM vb GROUP BY 1),
        |probs AS (SELECT bigram,
        |    CAST(round(ln(CAST(cnt_bi AS DOUBLE) / cnt_ctx), 6) AS DECIMAL(18,6)) AS lp
        |  FROM vb JOIN vc ON split_part(bigram, ' ', 1) = ctx)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
        |  round(CAST(SUM(tf * lp) AS DOUBLE) / SUM(tf), 6) AS avg_logprob
        |FROM tf JOIN probs USING (bigram) GROUP BY doc_id""".stripMargin,
    // Kneser-Ney replay: the probability expression is parenthesized
    // EXACTLY as the Spark side computes it — (c-D)/cv + D*n1f/cv *
    // (n1b/N) — so every FP step is the same correctly-rounded op.
    "lm_kneser_ney" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |bi AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bigram FROM tok),
        |tf AS (SELECT doc_id, bigram, count(*) AS tf FROM bi GROUP BY doc_id, bigram),
        |vb AS (SELECT bigram, SUM(tf) AS cnt_bi FROM tf GROUP BY bigram),
        |vc AS (SELECT split_part(bigram, ' ', 1) AS ctx, SUM(cnt_bi) AS cnt_ctx,
        |    count(*) AS n1_fwd FROM vb GROUP BY 1),
        |vw AS (SELECT split_part(bigram, ' ', 2) AS wrd, count(*) AS n1_back
        |  FROM vb GROUP BY 1),
        |nt AS (SELECT count(*) AS n_types FROM vb),
        |probs AS (SELECT bigram,
        |    CAST(round(ln(
        |      (cnt_bi - 0.75) / cnt_ctx +
        |      0.75 * n1_fwd / cnt_ctx * (CAST(n1_back AS DOUBLE) / n_types)), 6)
        |      AS DECIMAL(18,6)) AS lp
        |  FROM vb
        |  JOIN vc ON split_part(bigram, ' ', 1) = ctx
        |  JOIN vw ON split_part(bigram, ' ', 2) = wrd
        |  CROSS JOIN nt)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
        |  round(CAST(SUM(tf * lp) AS DOUBLE) / SUM(tf), 6) AS avg_logprob_kn
        |FROM tf JOIN probs USING (bigram) GROUP BY doc_id""".stripMargin,
    // Trigram KN replay — the bigram oracle one order up: the five KN
    // statistics come from GROUP BY restatements of the Spark side's
    // partitioned windows (identical values), the distinct (w2,w3) pair
    // table carries the continuation counts, and the probability chain is
    // parenthesized IDENTICALLY to the Column expression.
    "lm_kn_trigram" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |tri AS (SELECT doc_id,
        |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS trigram
        |  FROM tok),
        |tf AS (SELECT doc_id, trigram, count(*) AS tf FROM tri GROUP BY doc_id, trigram),
        |vt AS (SELECT trigram, SUM(tf) AS cnt_tri FROM tf GROUP BY trigram),
        |vc AS (SELECT split_part(trigram, ' ', 1) AS c1, split_part(trigram, ' ', 2) AS c2,
        |    SUM(cnt_tri) AS cnt_ctx, count(*) AS n1_fwd FROM vt GROUP BY 1, 2),
        |vm AS (SELECT split_part(trigram, ' ', 2) AS m2, split_part(trigram, ' ', 3) AS m3,
        |    count(*) AS n1_mid FROM vt GROUP BY 1, 2),
        |vd AS (SELECT split_part(trigram, ' ', 2) AS d2, count(*) AS n1_dot2dot
        |  FROM vt GROUP BY 1),
        |pr AS (SELECT DISTINCT split_part(trigram, ' ', 2) AS p2,
        |    split_part(trigram, ' ', 3) AS p3 FROM vt),
        |p2s AS (SELECT p2, count(*) AS n1_w2dot FROM pr GROUP BY 1),
        |p3s AS (SELECT p3, count(*) AS n1_back FROM pr GROUP BY 1),
        |np AS (SELECT count(*) AS n_pairs FROM pr),
        |probs AS (SELECT trigram,
        |    CAST(round(ln(
        |      (cnt_tri - 0.75) / cnt_ctx +
        |      0.75 * n1_fwd / cnt_ctx *
        |      ((n1_mid - 0.75) / n1_dot2dot +
        |       0.75 * n1_w2dot / n1_dot2dot *
        |       (CAST(n1_back AS DOUBLE) / n_pairs))), 6)
        |      AS DECIMAL(18,6)) AS lp
        |  FROM vt
        |  JOIN vc ON split_part(trigram, ' ', 1) = c1 AND split_part(trigram, ' ', 2) = c2
        |  JOIN vm ON split_part(trigram, ' ', 2) = m2 AND split_part(trigram, ' ', 3) = m3
        |  JOIN vd ON split_part(trigram, ' ', 2) = d2
        |  JOIN p2s ON split_part(trigram, ' ', 2) = p2
        |  JOIN p3s ON split_part(trigram, ' ', 3) = p3
        |  CROSS JOIN np)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_trigrams,
        |  round(CAST(SUM(tf * lp) AS DOUBLE) / SUM(tf), 6) AS avg_logprob_kn3
        |FROM tf JOIN probs USING (trigram) GROUP BY doc_id""".stripMargin,
    // Zipf replay: ln values round to 6dp DECIMAL so the five sums are
    // exact; the OLS closed forms then run in doubles with the SAME
    // parenthesization as the Scala side — each step one correctly-
    // rounded op (the rounded slope is re-derived inside intercept
    // exactly as the engine recomputes the column expression).
    // Theil-Sen: the pairwise-slope frame is the SAME post-limit ranked
    // head; each slope is two subtractions + one division of identical
    // 6dp-rounded doubles, the median is the LOWER-MEDIAN convention
    // over (slope, ra, rb), and residuals re-derive the ROUNDED slope.
    "zipf_theil_sen" ->
      """WITH tok AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
        |vocab AS (SELECT token, count(*) AS n FROM tok GROUP BY token
        |  ORDER BY n DESC, token LIMIT 1000),
        |ranked AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rank FROM vocab),
        |pts AS (SELECT rank, round(ln(CAST(rank AS DOUBLE)), 6) AS x,
        |    round(ln(CAST(n AS DOUBLE)), 6) AS y FROM ranked),
        |pr AS (SELECT a.rank AS ra, b.rank AS rb, (b.y - a.y) / (b.x - a.x) AS s
        |  FROM pts a JOIN pts b ON a.rank < b.rank AND a.x <> b.x),
        |sm AS (SELECT round(s, 6) AS slope, n AS npairs FROM
        |    (SELECT s, row_number() OVER (ORDER BY s, ra, rb) AS rn,
        |       count(*) OVER () AS n FROM pr)
        |  WHERE rn = (n + 1) // 2),
        |res AS (SELECT sm.slope, sm.npairs, p.rank, p.y - sm.slope * p.x AS r
        |  FROM pts p CROSS JOIN sm)
        |SELECT CAST(np AS BIGINT) AS n_points, CAST(npairs AS BIGINT) AS n_pairs,
        |  slope, round(r, 6) AS intercept
        |FROM (SELECT slope, npairs, r, row_number() OVER (ORDER BY r, rank) AS rn,
        |    count(*) OVER () AS np FROM res)
        |WHERE rn = (np + 1) // 2""".stripMargin,
    "zipf_fit" ->
      """WITH tok AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
        |vocab AS (SELECT token, count(*) AS n FROM tok GROUP BY token
        |  ORDER BY n DESC, token LIMIT 1000),
        |ranked AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rank FROM vocab),
        |xy AS (SELECT CAST(round(ln(CAST(rank AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
        |    CAST(round(ln(CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y FROM ranked),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_ranks,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x*y) AS DOUBLE) AS sxy, CAST(SUM(x*x) AS DOUBLE) AS sxx,
        |    CAST(SUM(y*y) AS DOUBLE) AS syy FROM xy)
        |SELECT n_ranks,
        |  round((n_ranks * sxy - sx * sy) / (n_ranks * sxx - sx * sx), 6) AS slope,
        |  round((sy - round((n_ranks * sxy - sx * sy) / (n_ranks * sxx - sx * sx), 6) * sx)
        |    / n_ranks, 6) AS intercept,
        |  round(((n_ranks * sxy - sx * sy) * (n_ranks * sxy - sx * sy))
        |    / ((n_ranks * sxx - sx * sx) * (n_ranks * syy - sy * sy)), 6) AS r2
        |FROM s""".stripMargin,
    "zipf_by_source" ->
      """WITH tok AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
        |vocab AS (SELECT source, token, count(*) AS n FROM tok GROUP BY source, token),
        |ranked AS (SELECT source, n,
        |    row_number() OVER (PARTITION BY source ORDER BY n DESC, token) AS rank FROM vocab),
        |xy AS (SELECT source,
        |    CAST(round(ln(CAST(rank AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
        |    CAST(round(ln(CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
        |  FROM ranked WHERE rank <= 1000),
        |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_ranks,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x*y) AS DOUBLE) AS sxy, CAST(SUM(x*x) AS DOUBLE) AS sxx,
        |    CAST(SUM(y*y) AS DOUBLE) AS syy FROM xy GROUP BY source)
        |SELECT source, n_ranks,
        |  round((n_ranks * sxy - sx * sy) / (n_ranks * sxx - sx * sx), 6) AS slope,
        |  round((sy - round((n_ranks * sxy - sx * sy) / (n_ranks * sxx - sx * sx), 6) * sx)
        |    / n_ranks, 6) AS intercept,
        |  round(((n_ranks * sxy - sx * sy) * (n_ranks * sxy - sx * sy))
        |    / ((n_ranks * sxx - sx * sx) * (n_ranks * syy - sy * sy)), 6) AS r2
        |FROM s""".stripMargin,
    // Self-BLEU: exact integer clip/total per order (c_rest = total − c
    // needs no pair join); each ln rounds to 6dp DECIMAL (the bm25
    // convention), the 4-term sum is exact decimal, /4 after one double
    // cast; NULL when any order has zero clipped overlap.
    "self_bleu" ->
      """WITH t AS (SELECT source,
        |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |g AS (SELECT source, 1 AS n, unnest(w) AS g FROM t
        |  UNION ALL SELECT source, 2, unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) FROM t
        |  UNION ALL SELECT source, 3, unnest(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) FROM t
        |  UNION ALL SELECT source, 4, unnest(list_transform(range(1, len(w) - 2),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) FROM t),
        |counts AS (SELECT source, n, g, count(*) AS c FROM g GROUP BY source, n, g),
        |tot AS (SELECT n, g, SUM(c) AS tt FROM counts GROUP BY n, g),
        |ps AS (SELECT source, n, SUM(c) AS total, SUM(least(c, tt - c)) AS clip
        |  FROM counts JOIN tot USING (n, g) GROUP BY source, n),
        |pl AS (SELECT source, n, total, clip,
        |    CASE WHEN clip > 0 THEN CAST(round(ln(CAST(clip AS DOUBLE) / total), 6)
        |      AS DECIMAL(18,6)) END AS logp
        |  FROM ps)
        |SELECT source,
        |  CAST(max(CASE WHEN n = 1 THEN total END) AS BIGINT) AS tot1,
        |  CAST(max(CASE WHEN n = 1 THEN clip END) AS BIGINT) AS clip1,
        |  CAST(max(CASE WHEN n = 2 THEN total END) AS BIGINT) AS tot2,
        |  CAST(max(CASE WHEN n = 2 THEN clip END) AS BIGINT) AS clip2,
        |  CAST(max(CASE WHEN n = 3 THEN total END) AS BIGINT) AS tot3,
        |  CAST(max(CASE WHEN n = 3 THEN clip END) AS BIGINT) AS clip3,
        |  CAST(max(CASE WHEN n = 4 THEN total END) AS BIGINT) AS tot4,
        |  CAST(max(CASE WHEN n = 4 THEN clip END) AS BIGINT) AS clip4,
        |  CASE WHEN count(logp) = 4 THEN CAST(SUM(logp) AS DOUBLE) / 4 END AS log_p_geo
        |FROM pl GROUP BY source""".stripMargin,
    // Heaps: the zipf_by_source OLS replay over |sources| log-log points
    "heaps_law" ->
      """WITH tok0 AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents),
        |tok AS (SELECT source, t FROM tok0 WHERE t <> ''),
        |vc AS (SELECT source, t, count(*) AS c FROM tok GROUP BY source, t),
        |pts AS (SELECT source, SUM(c) AS n_tokens, count(*) AS n_vocab FROM vc GROUP BY source),
        |xy AS (SELECT CAST(round(ln(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
        |    CAST(round(ln(CAST(n_vocab AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y FROM pts),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(x) AS DOUBLE) AS sx,
        |    CAST(SUM(y) AS DOUBLE) AS sy, CAST(SUM(x*y) AS DOUBLE) AS sxy,
        |    CAST(SUM(x*x) AS DOUBLE) AS sxx, CAST(SUM(y*y) AS DOUBLE) AS syy FROM xy)
        |SELECT n AS n_sources,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta,
        |  round((sy - round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) * sx)
        |    / n, 6) AS log_k,
        |  round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
        |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM s""".stripMargin,
    // Stupid-backoff replay: model counts off the even half, test
    // trigrams off the odd half, the three-branch CASE with identical
    // ratios, 0.4 / 0.16 pinned literals, ln 6dp-DECIMAL doc sums.
    "lm_stupid_backoff" ->
      """WITH tok AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
        |    x -> x <> '') AS w FROM documents WHERE text IS NOT NULL),
        |mtok AS (SELECT unnest(w) AS t FROM tok WHERE doc_id % 2 = 0),
        |t1 AS (SELECT t, count(*) AS c FROM mtok GROUP BY t),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM mtok),
        |m2 AS (SELECT unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS g FROM tok WHERE doc_id % 2 = 0),
        |t2 AS (SELECT g, count(*) AS c FROM m2 GROUP BY g),
        |m3 AS (SELECT unnest(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g FROM tok WHERE doc_id % 2 = 0),
        |t3 AS (SELECT g, count(*) AS c FROM m3 GROUP BY g),
        |test AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tri
        |  FROM tok WHERE doc_id % 2 = 1),
        |tf AS (SELECT doc_id, tri, count(*) AS tf FROM test GROUP BY doc_id, tri),
        |parts AS (SELECT doc_id, tri, tf, string_split(tri, ' ') AS p FROM tf),
        |sc AS (SELECT doc_id, tf,
        |    CASE WHEN t3.c IS NOT NULL THEN CAST(t3.c AS DOUBLE) / c12.c
        |         WHEN c23.c IS NOT NULL THEN 0.4 * (CAST(c23.c AS DOUBLE) / c2.c)
        |         ELSE 0.16 * (CAST(greatest(coalesce(c3.c, 0), 1) AS DOUBLE) / n)
        |    END AS s,
        |    CASE WHEN t3.c IS NOT NULL THEN 3
        |         WHEN c23.c IS NOT NULL THEN 2 ELSE 1 END AS b
        |  FROM parts
        |  LEFT JOIN t3 ON t3.g = tri
        |  LEFT JOIN t2 c12 ON c12.g = p[1] || ' ' || p[2]
        |  LEFT JOIN t2 c23 ON c23.g = p[2] || ' ' || p[3]
        |  LEFT JOIN t1 c2 ON c2.t = p[2]
        |  LEFT JOIN t1 c3 ON c3.t = p[3], nn)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_trigrams,
        |  CAST(SUM(tf * CAST(round(ln(s), 6) AS DECIMAL(18,6))) AS DOUBLE)
        |    AS sum_logscore,
        |  CAST(SUM(CASE WHEN b = 3 THEN tf ELSE 0 END) AS BIGINT) AS n_tri_hit,
        |  CAST(SUM(CASE WHEN b = 2 THEN tf ELSE 0 END) AS BIGINT) AS n_bi_hit,
        |  CAST(SUM(CASE WHEN b = 1 THEN tf ELSE 0 END) AS BIGINT) AS n_uni_hit
        |FROM sc GROUP BY doc_id""".stripMargin,
    // Burstiness replay: deterministic (count desc, token) top-30, then
    // the identical VMR chain off integer sums.
    "token_burstiness" ->
      """WITH tok0 AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (SELECT doc_id, t, count(*) AS x FROM tok0 WHERE t <> '' GROUP BY doc_id, t),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS ndocs FROM documents WHERE text IS NOT NULL),
        |top AS (SELECT t, CAST(SUM(x) AS BIGINT) AS n_total,
        |    CAST(count(*) AS BIGINT) AS n_docs_with,
        |    CAST(SUM(x * x) AS BIGINT) AS sx2
        |  FROM tf GROUP BY t ORDER BY n_total DESC, t LIMIT 30),
        |st AS (SELECT t AS token, n_total, n_docs_with,
        |    CAST(n_total AS DOUBLE) / CAST(ndocs AS DOUBLE) AS mean,
        |    CAST(sx2 AS DOUBLE) / CAST(ndocs AS DOUBLE) AS ex2,
        |    CAST(n_docs_with AS DOUBLE) / CAST(ndocs AS DOUBLE) AS dr
        |  FROM top, nd)
        |SELECT token, n_total, n_docs_with, round(dr, 6) AS doc_ratio,
        |  round((ex2 - mean * mean) / mean, 6) AS vmr
        |FROM st""".stripMargin,
    // Gini replay: the same spectrum construction — integer
    // position-weighted sum (shift-halved triangular term), two final
    // divisions identically parenthesized.
    "vocab_gini" ->
      """WITH tok0 AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents),
        |tf AS (SELECT source, t, count(*) AS f FROM tok0 WHERE t <> '' GROUP BY source, t),
        |spec AS (SELECT source, f, count(*) AS vf FROM tf GROUP BY source, f),
        |c AS (SELECT source, f, vf,
        |    sum(vf) OVER (PARTITION BY source ORDER BY f
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - vf AS cumex
        |  FROM spec),
        |agg AS (SELECT source, CAST(SUM(f * vf) AS BIGINT) AS n_tokens,
        |    CAST(SUM(vf) AS BIGINT) AS n_vocab,
        |    CAST(SUM(f * (vf * cumex + ((vf * (vf + 1)) >> 1))) AS BIGINT) AS s
        |  FROM c GROUP BY source)
        |SELECT source, n_tokens, n_vocab,
        |  round(2.0 * CAST(s AS DOUBLE) / (CAST(n_vocab AS DOUBLE) * CAST(n_tokens AS DOUBLE))
        |    - (CAST(n_vocab AS DOUBLE) + 1.0) / CAST(n_vocab AS DOUBLE), 6) AS gini
        |FROM agg""".stripMargin,
    // Entropy-rate replay: context totals via the first-token-partitioned
    // window, ln terms 6dp-DECIMAL, terminal divisions unrounded.
    "entropy_rate" ->
      """WITH tok AS (SELECT list_filter(string_split_regex(trim(text), '\s+'),
        |    x -> x <> '') AS w FROM documents WHERE text IS NOT NULL),
        |bg AS (SELECT unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS bigram FROM tok),
        |cnt AS (SELECT bigram, count(*) AS c,
        |    string_split(bigram, ' ')[1] AS w1
        |  FROM bg GROUP BY bigram),
        |ctx AS (SELECT bigram, c, w1,
        |    sum(c) OVER (PARTITION BY w1) AS cctx
        |  FROM cnt),
        |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt),
        |a AS (SELECT CAST(max(n) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_bigram_types,
        |    CAST(count(DISTINCT w1) AS BIGINT) AS n_contexts,
        |    SUM(c * CAST(round(ln(CAST(c AS DOUBLE) / CAST(cctx AS DOUBLE)), 6)
        |      AS DECIMAL(18,6))) AS hcsum,
        |    SUM(c * CAST(round(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |      AS DECIMAL(18,6))) AS hbsum
        |  FROM ctx, nn)
        |SELECT n AS n_bigrams, n_bigram_types, n_contexts,
        |  0.0 - CAST(hcsum AS DOUBLE) / CAST(n AS DOUBLE) AS h_rate_nats,
        |  0.0 - CAST(hbsum AS DOUBLE) / CAST(n AS DOUBLE) AS h_bigram_nats
        |FROM a""".stripMargin,
    // MI replay: marginals via partitioned windows on the count table,
    // ln args all integer-valued-double single-op chains, pair terms
    // 6dp-DECIMAL (order-free), terminal divisions unrounded.
    "source_token_mi" ->
      """WITH tok0 AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents),
        |tok AS (SELECT source, t FROM tok0 WHERE t <> ''),
        |cnt AS (SELECT source, t, count(*) AS c FROM tok GROUP BY source, t),
        |marg AS (SELECT source, t, c,
        |    sum(c) OVER (PARTITION BY source) AS cs,
        |    sum(c) OVER (PARTITION BY t) AS ct
        |  FROM cnt),
        |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt),
        |pa AS (SELECT CAST(max(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_pairs,
        |    SUM(c * CAST(round(ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
        |      / (CAST(cs AS DOUBLE) * CAST(ct AS DOUBLE))), 6) AS DECIMAL(18,6))) AS misum
        |  FROM marg, nn),
        |sa AS (SELECT source, SUM(c) AS cs2 FROM cnt GROUP BY source),
        |ha AS (SELECT CAST(count(*) AS BIGINT) AS n_sources,
        |    SUM(cs2 * CAST(round(ln(CAST(cs2 AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |      AS DECIMAL(18,6))) AS hsum
        |  FROM sa, nn),
        |f AS (SELECT n_pairs, n AS n_tokens, n_sources,
        |    CAST(misum AS DOUBLE) / CAST(n AS DOUBLE) AS mi_nats,
        |    0.0 - CAST(hsum AS DOUBLE) / CAST(n AS DOUBLE) AS h_source
        |  FROM pa, ha)
        |SELECT n_pairs, n_tokens, n_sources, mi_nats, h_source,
        |  CASE WHEN h_source > 0 THEN mi_nats / h_source END AS uncertainty_coef
        |FROM f""".stripMargin,
    // Chao1/coverage replay: integer spectrum sums, single-op chains,
    // unrounded outputs.
    "chao1_richness" ->
      """WITH tok0 AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents),
        |tok AS (SELECT source, t FROM tok0 WHERE t <> ''),
        |tf AS (SELECT source, t, count(*) AS tf FROM tok GROUP BY source, t),
        |agg AS (SELECT source, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_vocab,
        |    CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |    CAST(SUM(CASE WHEN tf = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_doubletons
        |  FROM tf GROUP BY source)
        |SELECT source, n_tokens, n_vocab, n_hapax, n_doubletons,
        |  CAST(n_vocab AS DOUBLE) + CAST(n_hapax AS DOUBLE) * (CAST(n_hapax AS DOUBLE) - 1.0)
        |    / (2.0 * (CAST(n_doubletons AS DOUBLE) + 1.0)) AS chao1,
        |  1.0 - CAST(n_hapax AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS coverage
        |FROM agg""".stripMargin,
    // Yule's K replay: every statistic is integer sums down to one or two
    // correctly-rounded double ops, identically parenthesized.
    "yule_k" ->
      """WITH tok0 AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents),
        |tok AS (SELECT source, t FROM tok0 WHERE t <> ''),
        |tf AS (SELECT source, t, count(*) AS tf FROM tok GROUP BY source, t),
        |agg AS (SELECT source, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_vocab,
        |    CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |    CAST(SUM(tf * tf) AS BIGINT) AS f2 FROM tf GROUP BY source)
        |SELECT source, n_tokens, n_vocab, n_hapax,
        |  round(CAST(n_vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS ttr,
        |  round(CAST(n_hapax AS DOUBLE) / CAST(n_vocab AS DOUBLE), 6) AS hapax_ratio,
        |  round(10000.0 * CAST(f2 - n_tokens AS DOUBLE)
        |    / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6) AS yule_k
        |FROM agg""".stripMargin,
    // JSD replay: count-weighted form over the source-vs-rest grid —
    // integer weights × 6dp-DECIMAL ln factors (order-free sums), p/q/m
    // fixed-parenthesization single-op chains.
    "js_divergence" ->
      """WITH tok0 AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents),
        |tok AS (SELECT source, t FROM tok0 WHERE t <> ''),
        |cnt AS (SELECT source, t, count(*) AS c FROM tok GROUP BY source, t),
        |gv AS (SELECT t, SUM(c) AS g FROM cnt GROUP BY t),
        |srcs AS (SELECT DISTINCT source FROM cnt),
        |grid AS (SELECT s.source, gv.g, coalesce(c.c, 0) AS c
        |  FROM srcs s CROSS JOIN gv
        |  LEFT JOIN cnt c ON c.source = s.source AND c.t = gv.t),
        |wt AS (SELECT source, c, g - c AS r,
        |    sum(c) OVER (PARTITION BY source) AS nin,
        |    sum(g - c) OVER (PARTITION BY source) AS nrest
        |  FROM grid),
        |pq AS (SELECT source, c, r, nin, nrest,
        |    CAST(c AS DOUBLE) / CAST(nin AS DOUBLE) AS p,
        |    CASE WHEN nrest > 0 THEN CAST(r AS DOUBLE) / CAST(nrest AS DOUBLE)
        |      ELSE 0.0 END AS q
        |  FROM wt),
        |m AS (SELECT source, c, r, nin, nrest, p, q, (p + q) / 2.0 AS mm FROM pq),
        |terms AS (SELECT source, nin, nrest,
        |    CASE WHEN c > 0 THEN c * CAST(round(ln(p / mm), 6) AS DECIMAL(18,6)) END AS ta,
        |    CASE WHEN r > 0 THEN r * CAST(round(ln(q / mm), 6) AS DECIMAL(18,6)) END AS tb
        |  FROM m)
        |SELECT source, CAST(max(nin) AS BIGINT) AS n_in,
        |  CAST(max(nrest) AS BIGINT) AS n_rest,
        |  CASE WHEN max(nrest) > 0 THEN round((CAST(sum(ta) AS DOUBLE) / CAST(max(nin) AS DOUBLE)
        |    + CAST(sum(tb) AS DOUBLE) / CAST(max(nrest) AS DOUBLE)) / 2.0, 6) END AS jsd
        |FROM terms GROUP BY source""".stripMargin,
    "token_entropy" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        |agg AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(SUM(tf * CAST(round(ln(CAST(tf AS DOUBLE)), 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_tlnt
        |  FROM tf GROUP BY doc_id),
        |e AS (SELECT doc_id, n_tokens, n_distinct,
        |    round(ln(CAST(n_tokens AS DOUBLE)) - sum_tlnt / n_tokens, 6) + 0.0 AS entropy FROM agg)
        |SELECT doc_id, n_tokens, n_distinct, entropy,
        |  CASE WHEN n_distinct > 1 THEN round(entropy / ln(CAST(n_distinct AS DOUBLE)), 6) + 0.0
        |       ELSE 0.0 END AS entropy_ratio
        |FROM e""".stripMargin,
    "ngram_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |    unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w)-1)])) AS shingle
        |  FROM toks WHERE len(w) >= 3),
        |dfq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  round(CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS novelty
        |FROM sh JOIN dfq USING (shingle) GROUP BY doc_id""".stripMargin,
    "pit_fact" ->
      """WITH snap1 AS (SELECT c_custkey, c_mktsegment, c_acctbal,
        |    DATE '1995-01-01' AS snap_date FROM customer),
        |snap2 AS (SELECT c_custkey,
        |    CASE WHEN c_custkey % 11 = 0 THEN 'MACHINERY' ELSE c_mktsegment END AS c_mktsegment,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
        |    DATE '1998-01-01' AS snap_date FROM customer),
        |snaps AS (SELECT * FROM snap1 UNION ALL SELECT * FROM snap2),
        |v AS (SELECT *, lag(c_mktsegment) OVER w AS p_seg, lag(c_acctbal) OVER w AS p_bal,
        |    (lag(snap_date) OVER w) IS NULL AS is_first
        |  FROM snaps WINDOW w AS (PARTITION BY c_custkey ORDER BY snap_date)),
        |kept AS (SELECT c_custkey, c_mktsegment, c_acctbal, snap_date FROM v
        |  WHERE is_first OR c_mktsegment IS DISTINCT FROM p_seg OR c_acctbal IS DISTINCT FROM p_bal),
        |dim AS (SELECT c_custkey, c_mktsegment, c_acctbal, snap_date AS valid_from,
        |    lead(snap_date) OVER (PARTITION BY c_custkey ORDER BY snap_date) AS valid_to FROM kept)
        |SELECT o.o_orderkey, o.o_custkey, CAST(o.o_orderdate AS DATE) AS order_date,
        |  d.c_mktsegment, d.c_acctbal, d.valid_from
        |FROM orders o LEFT JOIN dim d
        |  ON o.o_custkey = d.c_custkey
        | AND CAST(o.o_orderdate AS DATE) >= d.valid_from
        | AND (d.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < d.valid_to)""".stripMargin,
    "scd2_merge" ->
      """WITH base AS (SELECT * FROM customer WHERE c_custkey % 4 <> 0),
        |snap1 AS (SELECT c_custkey, c_mktsegment, c_acctbal,
        |    DATE '1995-01-01' AS snap_date FROM base),
        |snap2 AS (SELECT c_custkey,
        |    CASE WHEN c_custkey % 11 = 0 THEN 'MACHINERY' ELSE c_mktsegment END AS c_mktsegment,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
        |    DATE '1998-01-01' AS snap_date FROM base),
        |snaps AS (SELECT * FROM snap1 UNION ALL SELECT * FROM snap2),
        |v AS (SELECT *, lag(c_mktsegment) OVER w AS p_seg, lag(c_acctbal) OVER w AS p_bal,
        |    (lag(snap_date) OVER w) IS NULL AS is_first
        |  FROM snaps WINDOW w AS (PARTITION BY c_custkey ORDER BY snap_date)),
        |kept AS (SELECT c_custkey, c_mktsegment, c_acctbal, snap_date FROM v
        |  WHERE is_first OR c_mktsegment IS DISTINCT FROM p_seg OR c_acctbal IS DISTINCT FROM p_bal),
        |dim AS (SELECT c_custkey, c_mktsegment, c_acctbal, snap_date AS valid_from,
        |    lead(snap_date) OVER (PARTITION BY c_custkey ORDER BY snap_date) AS valid_to FROM kept),
        |dim2 AS (SELECT *, valid_to IS NULL AS is_current FROM dim),
        |snap3 AS (SELECT c_custkey,
        |    CASE WHEN c_custkey % 5 = 0 THEN 'AUTOMOBILE' ELSE c_mktsegment END AS c_mktsegment,
        |    CASE WHEN c_custkey % 9 = 0 THEN c_acctbal + 25.0 ELSE c_acctbal END AS c_acctbal,
        |    DATE '2001-01-01' AS snap_date FROM customer),
        |hist AS (SELECT c_custkey, c_mktsegment, c_acctbal, valid_from, valid_to, is_current
        |  FROM dim2 WHERE NOT is_current),
        |cur AS (SELECT * FROM dim2 WHERE is_current),
        |pass AS (SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal, c.valid_from, c.valid_to, c.is_current
        |  FROM cur c LEFT JOIN snap3 s USING (c_custkey)
        |  WHERE s.c_custkey IS NULL
        |     OR (c.c_mktsegment IS NOT DISTINCT FROM s.c_mktsegment
        |         AND c.c_acctbal IS NOT DISTINCT FROM s.c_acctbal)),
        |closed AS (SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal, c.valid_from,
        |    s.snap_date AS valid_to, false AS is_current
        |  FROM cur c JOIN snap3 s USING (c_custkey)
        |  WHERE c.c_mktsegment IS DISTINCT FROM s.c_mktsegment
        |     OR c.c_acctbal IS DISTINCT FROM s.c_acctbal),
        |opened AS (SELECT s.c_custkey, s.c_mktsegment, s.c_acctbal,
        |    s.snap_date AS valid_from, CAST(NULL AS DATE) AS valid_to, true AS is_current
        |  FROM snap3 s LEFT JOIN cur c USING (c_custkey)
        |  WHERE c.c_custkey IS NULL
        |     OR c.c_mktsegment IS DISTINCT FROM s.c_mktsegment
        |     OR c.c_acctbal IS DISTINCT FROM s.c_acctbal)
        |SELECT * FROM hist UNION ALL SELECT * FROM pass
        |UNION ALL SELECT * FROM closed UNION ALL SELECT * FROM opened""".stripMargin,
    "vocab_top" ->
      """WITH tok AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
        |counts AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
        |ranked AS (SELECT token, CAST(n AS BIGINT) AS n,
        |    CAST(row_number() OVER (ORDER BY n DESC, token) AS INT) AS rank FROM counts)
        |SELECT token, n, rank FROM ranked WHERE rank <= 30""".stripMargin,
    "cms_counts" ->
      """WITH tok AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
        |rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
        |cells AS (SELECT r,
        |    ('0x' || substr(md5('cms' || r || ':' || token), 1, 8))::BIGINT % 1024 AS b,
        |    count(*) AS cell
        |  FROM tok, rs GROUP BY r, b),
        |exact AS (SELECT token, count(*) AS exact_n FROM tok GROUP BY token
        |  ORDER BY exact_n DESC, token LIMIT 30),
        |probes AS (SELECT token, exact_n, r,
        |    ('0x' || substr(md5('cms' || r || ':' || token), 1, 8))::BIGINT % 1024 AS b
        |  FROM exact, rs)
        |SELECT p.token, CAST(p.exact_n AS BIGINT) AS exact_n,
        |  CAST(min(c.cell) AS BIGINT) AS cms_n,
        |  CAST(min(c.cell) - p.exact_n AS BIGINT) AS overcount
        |FROM probes p JOIN cells c ON p.r = c.r AND p.b = c.b
        |GROUP BY p.token, p.exact_n""".stripMargin,
    // AMS F2: the full median-of-means chain replays — 96 ±1 signs from
    // the first three 32-bit md5 words (below 2^63 throughout), Z sums
    // are integers, group means divide by 16 (dyadic-exact) and the even
    // median averages two order statistics (one correctly-rounded op);
    // rel_err is identically parenthesized on both sides.
    "f2_sketch" ->
      """WITH r AS (SELECT md5(CAST(l_orderkey AS VARCHAR)) AS h FROM lineitem
        |    WHERE l_orderkey IS NOT NULL),
        |w AS (SELECT ('0x' || substr(h, 1, 8))::BIGINT AS w0,
        |    ('0x' || substr(h, 9, 8))::BIGINT AS w1,
        |    ('0x' || substr(h, 17, 8))::BIGINT AS w2 FROM r),
        |z AS (SELECT i, SUM(1 - 2 * (((CASE i // 32 WHEN 0 THEN w0 WHEN 1 THEN w1
        |      ELSE w2 END) >> CAST(i % 32 AS INT)) & 1)) AS z
        |  FROM w, (SELECT unnest(range(0, 96)) AS i) est GROUP BY i),
        |m AS (SELECT i // 16 AS g, CAST(SUM(z * z) AS DOUBLE) / 16 AS mean
        |  FROM z GROUP BY i // 16),
        |med AS (SELECT list_sort(list(mean)) AS ms FROM m),
        |est AS (SELECT (ms[3] + ms[4]) / 2 AS f2_est FROM med),
        |ex AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(c * c) AS BIGINT) AS f2_exact
        |  FROM (SELECT count(*) AS c FROM lineitem
        |    WHERE l_orderkey IS NOT NULL GROUP BY l_orderkey))
        |SELECT n_rows, n_keys, f2_exact, f2_est,
        |  round((f2_est - f2_exact) / f2_exact, 6) AS rel_err
        |FROM ex, est""".stripMargin,
    "join_size_est" ->
      """WITH ra AS (SELECT md5(CAST(user_id AS VARCHAR)) AS h FROM events
        |    WHERE user_id IS NOT NULL),
        |wa AS (SELECT ('0x' || substr(h, 1, 8))::BIGINT AS w0,
        |    ('0x' || substr(h, 9, 8))::BIGINT AS w1,
        |    ('0x' || substr(h, 17, 8))::BIGINT AS w2 FROM ra),
        |za AS (SELECT i, SUM(1 - 2 * (((CASE i // 32 WHEN 0 THEN w0 WHEN 1 THEN w1
        |      ELSE w2 END) >> CAST(i % 32 AS INT)) & 1)) AS zva
        |  FROM wa, (SELECT unnest(range(0, 96)) AS i) e GROUP BY i),
        |rb AS (SELECT md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders
        |    WHERE o_custkey IS NOT NULL),
        |wb AS (SELECT ('0x' || substr(h, 1, 8))::BIGINT AS w0,
        |    ('0x' || substr(h, 9, 8))::BIGINT AS w1,
        |    ('0x' || substr(h, 17, 8))::BIGINT AS w2 FROM rb),
        |zb AS (SELECT i, SUM(1 - 2 * (((CASE i // 32 WHEN 0 THEN w0 WHEN 1 THEN w1
        |      ELSE w2 END) >> CAST(i % 32 AS INT)) & 1)) AS zvb
        |  FROM wb, (SELECT unnest(range(0, 96)) AS i) e GROUP BY i),
        |m AS (SELECT i // 16 AS g, CAST(SUM(zva * zvb) AS DOUBLE) / 16 AS mean
        |  FROM za JOIN zb USING (i) GROUP BY i // 16),
        |med AS (SELECT list_sort(list(mean)) AS ms FROM m),
        |est AS (SELECT (ms[3] + ms[4]) / 2 AS join_est FROM med),
        |ea AS (SELECT user_id AS k, count(*) AS ca FROM events
        |  WHERE user_id IS NOT NULL GROUP BY user_id),
        |eb AS (SELECT o_custkey AS k, count(*) AS cb FROM orders
        |  WHERE o_custkey IS NOT NULL GROUP BY o_custkey),
        |ex AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
        |    CAST(coalesce(SUM(ca * cb), 0) AS BIGINT) AS join_exact
        |  FROM ea FULL JOIN eb USING (k))
        |SELECT n_a, n_b, join_exact, join_est,
        |  CASE WHEN join_exact > 0
        |       THEN round((join_est - join_exact) / join_exact, 6) END AS rel_err
        |FROM ex, est""".stripMargin,
    "f2_by_source" ->
      """WITH tok0 AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token
        |    FROM documents),
        |tok AS (SELECT source, token FROM tok0 WHERE token <> ''),
        |r AS (SELECT source, md5(token) AS h FROM tok),
        |w AS (SELECT source, ('0x' || substr(h, 1, 8))::BIGINT AS w0,
        |    ('0x' || substr(h, 9, 8))::BIGINT AS w1,
        |    ('0x' || substr(h, 17, 8))::BIGINT AS w2 FROM r),
        |z AS (SELECT source, i, SUM(1 - 2 * (((CASE i // 32 WHEN 0 THEN w0 WHEN 1 THEN w1
        |      ELSE w2 END) >> CAST(i % 32 AS INT)) & 1)) AS z
        |  FROM w, (SELECT unnest(range(0, 96)) AS i) est GROUP BY source, i),
        |m AS (SELECT source, i // 16 AS g, CAST(SUM(z * z) AS DOUBLE) / 16 AS mean
        |  FROM z GROUP BY source, i // 16),
        |med AS (SELECT source, list_sort(list(mean)) AS ms FROM m GROUP BY source),
        |est AS (SELECT source, (ms[3] + ms[4]) / 2 AS f2_est FROM med),
        |ex AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(c * c) AS BIGINT) AS f2_exact
        |  FROM (SELECT source, token, count(*) AS c FROM tok GROUP BY source, token)
        |  GROUP BY source)
        |SELECT ex.source, n_rows, n_keys, f2_exact, f2_est,
        |  round((f2_est - f2_exact) / f2_exact, 6) AS rel_err
        |FROM ex JOIN est ON ex.source = est.source""".stripMargin,
    // HLL registers: bucket = first 2 md5 hex digits, ρ = 33 − len(bin(w))
    // over the next 8 (33 for w = 0) — bin() is unpadded in both engines,
    // so the register table is a pure integer computation.
    "hll_registers" ->
      """WITH tok AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents),
        |rw AS (SELECT ('0x' || substr(md5(t), 1, 2))::BIGINT AS bucket,
        |    ('0x' || substr(md5(t), 3, 8))::BIGINT AS w FROM tok)
        |SELECT CAST(bucket AS INT) AS bucket,
        |  CAST(max(CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END) AS INT) AS r
        |FROM rw GROUP BY bucket""".stripMargin,
    // Estimate chain: 2^-r terms are dyadic (power() exact), the 256-term
    // sum spans 41 exponent bits (< 53) so it is exact in any order, and
    // the α·m²/s + linear-counting branch is identically parenthesized.
    "hll_estimate" ->
      """WITH tok AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents),
        |rw AS (SELECT ('0x' || substr(md5(t), 1, 2))::BIGINT AS bucket,
        |    ('0x' || substr(md5(t), 3, 8))::BIGINT AS w FROM tok),
        |reg AS (SELECT bucket,
        |    max(CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END) AS r
        |  FROM rw GROUP BY bucket),
        |a AS (SELECT count(*) AS nb, sum(power(2.0, -r)) AS s FROM reg),
        |e AS (SELECT nb,
        |    (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 / (s + CAST(256 - nb AS DOUBLE)) AS raw
        |  FROM a)
        |SELECT CAST(256 AS INT) AS m, CAST(nb AS INT) AS n_buckets,
        |  CAST(256 - nb AS INT) AS n_zero,
        |  round(raw, 4) AS raw_est,
        |  round(CASE WHEN raw <= 640.0 AND 256 - nb > 0
        |    THEN 256.0 * ln(256.0 / CAST(256 - nb AS DOUBLE)) ELSE raw END, 4) AS est
        |FROM e""".stripMargin,
    "hll_by_source" ->
      """WITH tok AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents),
        |rw AS (SELECT source, ('0x' || substr(md5(t), 1, 2))::BIGINT AS bucket,
        |    ('0x' || substr(md5(t), 3, 8))::BIGINT AS w FROM tok),
        |reg AS (SELECT source, bucket,
        |    max(CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END) AS r
        |  FROM rw GROUP BY source, bucket),
        |a AS (SELECT source, count(*) AS nb, sum(power(2.0, -r)) AS s
        |  FROM reg GROUP BY source),
        |e AS (SELECT source, nb,
        |    (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 / (s + CAST(256 - nb AS DOUBLE)) AS raw
        |  FROM a)
        |SELECT source, CAST(256 AS INT) AS m, CAST(nb AS INT) AS n_buckets,
        |  CAST(256 - nb AS INT) AS n_zero,
        |  round(raw, 4) AS raw_est,
        |  round(CASE WHEN raw <= 640.0 AND 256 - nb > 0
        |    THEN 256.0 * ln(256.0 / CAST(256 - nb AS DOUBLE)) ELSE raw END, 4) AS est
        |FROM e""".stripMargin,
    // Union registers via per-pair bucket max (≡ the Spark side's dense
    // zip_with(greatest) — the max merge law makes both EXACTLY the
    // union's sketch); per-side and union estimates share the pinned
    // α/ln chain; est_intersect is one subtraction of rounded estimates.
    "hll_set_ops" ->
      """WITH tok AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents),
        |rw AS (SELECT source, ('0x' || substr(md5(t), 1, 2))::BIGINT AS bucket,
        |    ('0x' || substr(md5(t), 3, 8))::BIGINT AS w FROM tok),
        |reg AS (SELECT source, bucket,
        |    max(CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END) AS r
        |  FROM rw GROUP BY source, bucket),
        |src AS (SELECT DISTINCT source FROM reg),
        |sides AS (SELECT source, count(*) AS nb, sum(power(2.0, -r)) AS sp
        |  FROM reg GROUP BY source),
        |se AS (SELECT source,
        |    round(CASE WHEN raw <= 640.0 AND nz > 0
        |      THEN 256.0 * ln(256.0 / CAST(nz AS DOUBLE)) ELSE raw END, 4) AS est
        |  FROM (SELECT source,
        |      (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
        |        / (sp + CAST(256 - nb AS DOUBLE)) AS raw,
        |      256 - nb AS nz FROM sides)),
        |pairs AS (SELECT a.source AS sa, b.source AS sb
        |  FROM src a JOIN src b ON a.source < b.source),
        |ureg AS (SELECT p.sa, p.sb, r.bucket, max(r.r) AS ur
        |  FROM pairs p JOIN reg r ON r.source = p.sa OR r.source = p.sb
        |  GROUP BY p.sa, p.sb, r.bucket),
        |ua AS (SELECT sa, sb, count(*) AS nb, sum(power(2.0, -ur)) AS sp
        |  FROM ureg GROUP BY sa, sb),
        |ue AS (SELECT sa, sb,
        |    round(CASE WHEN raw <= 640.0 AND nz > 0
        |      THEN 256.0 * ln(256.0 / CAST(nz AS DOUBLE)) ELSE raw END, 4) AS est_union
        |  FROM (SELECT sa, sb,
        |      (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
        |        / (sp + CAST(256 - nb AS DOUBLE)) AS raw,
        |      256 - nb AS nz FROM ua))
        |SELECT u.sa AS source_a, u.sb AS source_b, ea.est AS est_a,
        |  eb.est AS est_b, u.est_union,
        |  round(ea.est + eb.est - u.est_union, 4) AS est_intersect
        |FROM ue u JOIN se ea ON ea.source = u.sa JOIN se eb ON eb.source = u.sb""".stripMargin,
    // Quantile sketch replay — the whole construction is integer/string
    // ops both engines share: v60 = 15 md5 hex digits (the cms/hll
    // convention), level = 60 − len(bin(v60)) (bin() unpadded in both),
    // the level choice a ≤ 61-candidate aggregate, and the estimate an
    // order statistic of the sorted survivor values at the all-integer
    // rank (p·m + 999) div 1000 — no floating arithmetic anywhere, so
    // row hashes match exactly.
    "quantile_sketch" ->
      """WITH r AS (SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT AS v60,
        |    CAST(o_totalprice AS DOUBLE) AS v FROM orders WHERE o_totalprice IS NOT NULL),
        |rl AS (SELECT v60, v,
        |    CASE WHEN v60 = 0 THEN 60 ELSE 60 - length(bin(v60)) END AS lmax FROM r),
        |hist AS (SELECT lmax, count(*) AS c FROM rl GROUP BY lmax),
        |cand AS (SELECT cl, SUM(c) AS n
        |  FROM hist, (SELECT unnest(range(0, 61)) AS cl) cls
        |  WHERE lmax >= cl GROUP BY cl),
        |ls AS (SELECT CAST(min(cl) AS INT) AS level FROM cand WHERE n <= 256),
        |nr AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows FROM hist),
        |sv AS (SELECT list_sort(list(v)) AS vals, CAST(count(*) AS BIGINT) AS n_survivors
        |  FROM rl, ls WHERE lmax >= level),
        |ps AS (SELECT unnest([10, 100, 250, 500, 750, 900, 990]) AS p)
        |SELECT CAST(p AS INT) AS p_permille,
        |  vals[CAST((p * n_survivors + 999) // 1000 AS INT)] AS est,
        |  ls.level, sv.n_survivors, nr.n_rows
        |FROM ps, sv, ls, nr""".stripMargin,
    "quantile_sketch_by" ->
      """WITH r AS (SELECT source,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS v60,
        |    CAST(n_chars AS DOUBLE) AS v FROM documents WHERE n_chars IS NOT NULL),
        |rl AS (SELECT source, v60, v,
        |    CASE WHEN v60 = 0 THEN 60 ELSE 60 - length(bin(v60)) END AS lmax FROM r),
        |hist AS (SELECT source, lmax, count(*) AS c FROM rl GROUP BY source, lmax),
        |cand AS (SELECT source, cl, SUM(c) AS n
        |  FROM hist, (SELECT unnest(range(0, 61)) AS cl) cls
        |  WHERE lmax >= cl GROUP BY source, cl),
        |ls AS (SELECT source, CAST(min(cl) AS INT) AS level FROM cand
        |  WHERE n <= 128 GROUP BY source),
        |nr AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_rows FROM hist GROUP BY source),
        |sv AS (SELECT rl.source, ls.level, list_sort(list(v)) AS vals,
        |    CAST(count(*) AS BIGINT) AS n_survivors
        |  FROM rl JOIN ls ON rl.source = ls.source WHERE lmax >= level
        |  GROUP BY rl.source, ls.level),
        |ps AS (SELECT unnest([250, 500, 750, 900]) AS p)
        |SELECT sv.source, CAST(p AS INT) AS p_permille,
        |  vals[CAST((p * n_survivors + 999) // 1000 AS INT)] AS est,
        |  sv.level, sv.n_survivors, nr.n_rows
        |FROM ps, sv JOIN nr ON sv.source = nr.source""".stripMargin,
    "profile_columns" ->
      """SELECT 'o_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
        |  CAST(min(o_orderkey) AS VARCHAR) AS min_value,
        |  CAST(max(o_orderkey) AS VARCHAR) AS max_value FROM orders
        |UNION ALL
        |SELECT 'o_custkey', CAST(count(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT o_custkey) AS BIGINT),
        |  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT),
        |  CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR) FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT),
        |  CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR) FROM orders""".stripMargin,
    // Benford replay: the first significant digit comes off the
    // DECIMAL(18,6) canonical string on BOTH engines (fixed-scale render,
    // no float formatting), expected probabilities are the SAME pinned 6dp
    // literals, and the p_obs/χ² chains are identically parenthesized.
    "benford_digits" ->
      """WITH s0 AS (SELECT CAST(CAST(abs(o_totalprice) AS DECIMAL(18,6)) AS VARCHAR) AS s
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |d0 AS (SELECT regexp_extract(s, '[1-9]', 0) AS d FROM s0),
        |obs AS (SELECT CAST(d AS INT) AS digit, count(*) AS c FROM d0
        |  WHERE d IS NOT NULL AND d <> '' GROUP BY 1),
        |grid AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit),
        |pb AS (SELECT digit, CAST(CASE digit WHEN 1 THEN 0.301030 WHEN 2 THEN 0.176091
        |    WHEN 3 THEN 0.124939 WHEN 4 THEN 0.096910 WHEN 5 THEN 0.079181
        |    WHEN 6 THEN 0.066947 WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153
        |    ELSE 0.045757 END AS DOUBLE) AS p_benford FROM grid),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM obs),
        |j AS (SELECT pb.digit, pb.p_benford, CAST(coalesce(obs.c, 0) AS BIGINT) AS n_obs
        |  FROM pb LEFT JOIN obs USING (digit))
        |SELECT digit, n_obs,
        |  round(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_obs, p_benford,
        |  round((CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p_benford)
        |    * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p_benford)
        |    / (CAST(n AS DOUBLE) * p_benford), 6) AS chi_term
        |FROM j, tot""".stripMargin,
    // Rolled verdict: 6dp-rounded per-digit terms sum in DECIMAL
    // (order-free), the χ² critical value and MAD /9 pinned both sides.
    "benford_stat" ->
      """WITH s0 AS (SELECT CAST(CAST(abs(o_totalprice) AS DECIMAL(18,6)) AS VARCHAR) AS s
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |d0 AS (SELECT regexp_extract(s, '[1-9]', 0) AS d FROM s0),
        |obs AS (SELECT CAST(d AS INT) AS digit, count(*) AS c FROM d0
        |  WHERE d IS NOT NULL AND d <> '' GROUP BY 1),
        |grid AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit),
        |pb AS (SELECT digit, CAST(CASE digit WHEN 1 THEN 0.301030 WHEN 2 THEN 0.176091
        |    WHEN 3 THEN 0.124939 WHEN 4 THEN 0.096910 WHEN 5 THEN 0.079181
        |    WHEN 6 THEN 0.066947 WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153
        |    ELSE 0.045757 END AS DOUBLE) AS p_benford FROM grid),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM obs),
        |j AS (SELECT pb.digit, pb.p_benford, CAST(coalesce(obs.c, 0) AS BIGINT) AS n_obs
        |  FROM pb LEFT JOIN obs USING (digit)),
        |dd AS (SELECT n_obs, p_benford,
        |    round(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_obs,
        |    round((CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p_benford)
        |      * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p_benford)
        |      / (CAST(n AS DOUBLE) * p_benford), 6) AS chi_term
        |  FROM j, tot),
        |f AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_values,
        |    CAST(sum(CAST(chi_term AS DECIMAL(18,6))) AS DOUBLE) AS chi2,
        |    round(CAST(sum(CAST(round(abs(p_obs - p_benford), 6) AS DECIMAL(18,6)))
        |      AS DOUBLE) / 9.0, 6) AS mad
        |  FROM dd)
        |SELECT n_values, chi2, mad, chi2 > 20.090 AS reject_1pct FROM f""".stripMargin,
    "unicode_norm" ->
      """SELECT doc_id, CAST(length(nfc_normalize(text)) AS INT) AS len_nfc,
        |  nfc_normalize(text) = text AS unchanged
        |FROM documents""".stripMargin,
    "text_quality" -> (s"""WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS INT) AS len_chars,
        |  CAST(len(w) AS INT) AS n_tokens,
        |  CAST(len(list_filter(w, x -> x IN $Stop)) AS INT) AS n_stopwords,
        |  round(CAST(len(list_filter(w, x -> x IN $Stop)) AS DOUBLE) / len(w), 6) AS stop_ratio,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS INT) AS n_punct,
        |  round(CAST(list_aggregate([length(x) for x in w], 'sum') AS DOUBLE) / len(w), 6) AS mean_token_len
        |FROM t""".stripMargin),
    "lang_id" -> {
      val en = TextAnalysis.EnStop.mkString("('", "','", "')")
      val fr = TextAnalysis.FrStop.mkString("('", "','", "')")
      val de = TextAnalysis.DeStop.mkString("('", "','", "')")
      val es = TextAnalysis.EsStop.mkString("('", "','", "')")
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
        |c AS (SELECT doc_id,
        |    CAST(len(list_filter(w, x -> x IN $en)) AS INT) AS n_en,
        |    CAST(len(list_filter(w, x -> x IN $fr)) AS INT) AS n_fr,
        |    CAST(len(list_filter(w, x -> x IN $de)) AS INT) AS n_de,
        |    CAST(len(list_filter(w, x -> x IN $es)) AS INT) AS n_es
        |  FROM t)
        |SELECT doc_id, n_en, n_fr, n_de, n_es,
        |  CASE WHEN n_en > 0 AND n_en >= n_fr AND n_en >= n_de AND n_en >= n_es THEN 'en'
        |       WHEN n_fr > 0 AND n_fr >= n_de AND n_fr >= n_es THEN 'fr'
        |       WHEN n_de > 0 AND n_de >= n_es THEN 'de'
        |       WHEN n_es > 0 THEN 'es'
        |       ELSE 'und' END AS lang_pred
        |FROM c""".stripMargin
    },
    "token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_tokens
        |FROM documents""".stripMargin,
    "doc_fingerprint" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
        |  FROM toks WHERE len(w) >= 3)
        |SELECT doc_id, list_aggregate([md5(x) for x in s], 'min') AS fingerprint FROM sh""".stripMargin,
    "rep_filter" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |grams AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS gram
        |  FROM toks WHERE len(w) >= 2),
        |per AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY doc_id, gram),
        |agg AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
        |    CAST(count(*) AS BIGINT) AS n_distinct_grams,
        |    CAST(max(cnt) AS BIGINT) AS top_cnt
        |  FROM per GROUP BY doc_id)
        |SELECT doc_id, n_grams, n_distinct_grams,
        |  round(CAST(n_grams - n_distinct_grams AS DOUBLE) / n_grams, 6) AS dup_gram_fraction,
        |  round(CAST(top_cnt AS DOUBLE) / n_grams, 6) AS top_gram_fraction,
        |  round(CAST(n_grams - n_distinct_grams AS DOUBLE) / n_grams, 6) <= 0.2 AS keep
        |FROM agg""".stripMargin,
    "bm25_topk" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |lens AS (SELECT doc_id, len(w) AS dl FROM toks),
        |stats AS (SELECT count(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM lens),
        |post AS (SELECT doc_id, unnest(w) AS term FROM toks),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM post GROUP BY doc_id, term),
        |qt AS (SELECT doc_id AS query_id, unnest(list_distinct(w[1:6])) AS term
        |  FROM toks WHERE doc_id % 97 = 0),
        |dfq AS (SELECT t.term, count(*) AS df FROM tf t
        |  WHERE t.term IN (SELECT DISTINCT term FROM qt) GROUP BY t.term),
        |contrib AS (SELECT qt.query_id, t.doc_id,
        |    CAST(round(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
        |      * (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)), 6)
        |      AS DECIMAL(18,6)) AS c
        |  FROM tf t JOIN qt ON t.term = qt.term JOIN dfq d ON t.term = d.term
        |  JOIN lens l ON t.doc_id = l.doc_id CROSS JOIN stats s),
        |scored AS (SELECT query_id, doc_id, CAST(SUM(c) AS DOUBLE) AS score
        |  FROM contrib GROUP BY query_id, doc_id),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id) AS rn FROM scored)
        |SELECT query_id, doc_id, score, CAST(rn AS INT) AS rank
        |FROM ranked WHERE rn <= 10""".stripMargin,
    // Hybrid RRF: both rankers replay end-to-end (the bm25_topk and
    // ann_topk oracle chains verbatim, same query ids), then the fusion —
    // 1/(60+rank) rounded to 6dp, DECIMAL-summed, re-ranked (score desc,
    // doc asc). Only RANKS cross from the rankers into the fusion, so
    // last-ulp cosine differences cannot reach the fused hash.
    "hybrid_rrf" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |lens AS (SELECT doc_id, len(w) AS dl FROM toks),
        |stats AS (SELECT count(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM lens),
        |post AS (SELECT doc_id, unnest(w) AS term FROM toks),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM post GROUP BY doc_id, term),
        |qt AS (SELECT doc_id AS query_id, unnest(list_distinct(w[1:6])) AS term
        |  FROM toks WHERE doc_id % 97 = 0),
        |dfq AS (SELECT t.term, count(*) AS df FROM tf t
        |  WHERE t.term IN (SELECT DISTINCT term FROM qt) GROUP BY t.term),
        |contrib AS (SELECT qt.query_id, t.doc_id,
        |    CAST(round(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
        |      * (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)), 6)
        |      AS DECIMAL(18,6)) AS c
        |  FROM tf t JOIN qt ON t.term = qt.term JOIN dfq d ON t.term = d.term
        |  JOIN lens l ON t.doc_id = l.doc_id CROSS JOIN stats s),
        |scored AS (SELECT query_id, doc_id, CAST(SUM(c) AS DOUBLE) AS score
        |  FROM contrib GROUP BY query_id, doc_id),
        |sranked AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id) AS rn FROM scored),
        |sparse AS (SELECT query_id, doc_id, CAST(rn AS INT) AS rank FROM sranked WHERE rn <= 10),
        |q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 97 = 0),
        |cv AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sims AS (SELECT query_id, doc_id, list_cosine_similarity(qv, v) AS sim FROM q, cv),
        |dranked AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, doc_id) AS rn FROM sims),
        |dense AS (SELECT query_id, doc_id, CAST(rn AS INT) AS rank FROM dranked WHERE rn <= 10),
        |u AS (SELECT query_id, doc_id, rank FROM sparse
        |  UNION ALL SELECT query_id, doc_id, rank FROM dense),
        |fc AS (SELECT query_id, doc_id,
        |    CAST(round(CAST(1 AS DOUBLE) / (60 + rank), 6) AS DECIMAL(18,6)) AS c FROM u),
        |fused AS (SELECT query_id, doc_id, CAST(count(*) AS INT) AS n_lists,
        |    CAST(SUM(c) AS DOUBLE) AS rrf_score FROM fc GROUP BY query_id, doc_id),
        |fr AS (SELECT query_id, doc_id, n_lists, rrf_score,
        |    row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rn
        |  FROM fused)
        |SELECT query_id, doc_id, n_lists, rrf_score, CAST(rn AS INT) AS rank
        |FROM fr WHERE rn <= 10""".stripMargin,
    // Funnel: per-user milestone times computed sequentially; comparisons run
    // on microsecond-truncated timestamps on BOTH sides (Spark's converted
    // events ts is micros; DuckDB raw parquet ts is nanos).
    "funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |s1 AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t FROM e GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s1 ON e.user_id = s1.user_id
        |  AND e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s2 ON e.user_id = s2.user_id
        |  AND e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id)
        |SELECT CAST(1 AS INT) AS step_index, 'view' AS step,
        |  CAST(count(t) AS BIGINT) AS n_users FROM s1
        |UNION ALL SELECT CAST(2 AS INT), 'click', CAST(count(t) AS BIGINT) FROM s2
        |UNION ALL SELECT CAST(3 AS INT), 'purchase', CAST(count(t) AS BIGINT) FROM s3""".stripMargin,
    "cohort_retention" ->
      """WITH f AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |g AS (SELECT user_id, ts, min(ts) OVER (PARTITION BY user_id) AS first_ts FROM f),
        |c AS (SELECT user_id,
        |    date_trunc('week', first_ts) AS cohort_week,
        |    CAST(floor((epoch(date_trunc('week', ts)) - epoch(date_trunc('week', first_ts)))
        |      / 604800.0) AS INT) AS week_offset
        |  FROM g)
        |SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        |FROM c GROUP BY cohort_week, week_offset""".stripMargin,
    "cube_revenue" ->
      """WITH f AS (SELECT CAST(year(o.o_orderdate) AS INT) AS year,
        |    c.c_mktsegment AS segment,
        |    l.l_extendedprice * (1 - l.l_discount) AS rev
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey)
        |SELECT year, segment, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(rev AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM f GROUP BY CUBE(year, segment)""".stripMargin,
    "winsorize_prices" ->
      """WITH b AS (SELECT o_orderpriority,
        |    quantile_cont(o_totalprice, 0.05) AS lo,
        |    quantile_cont(o_totalprice, 0.95) AS hi
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
        |  round(greatest(b.lo, least(b.hi, o.o_totalprice)), 6) AS w_price
        |FROM orders o JOIN b USING (o_orderpriority)""".stripMargin,
    "gap_fill" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS day_value
        |  FROM events GROUP BY user_id, day),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id),
        |spine AS (SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span)
        |SELECT s.user_id, s.day, d.day_value,
        |  (SELECT dd.day_value FROM daily dd
        |   WHERE dd.user_id = s.user_id AND dd.day <= s.day
        |   ORDER BY dd.day DESC LIMIT 1) AS filled_value,
        |  d.day_value IS NULL AS is_filled
        |FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day""".stripMargin,
    "heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
        |tot AS (SELECT count(*) AS n FROM tok),
        |cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS n_occ FROM tok GROUP BY token)
        |SELECT token, n_occ, round(CAST(n_occ AS DOUBLE) / t.n, 6) AS share
        |FROM cnt, tot t WHERE n_occ * 40 > t.n""".stripMargin,
    "shard_assign" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR)) || CAST(doc_id AS VARCHAR) AS skey
        |  FROM documents),
        |c AS (SELECT *, coalesce(SUM(n_tokens) OVER (ORDER BY skey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
        |    SUM(n_tokens) OVER () AS total FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST(least(floor(cum_before / ceil(total / 16.0)), 15) AS INT) AS shard
        |FROM c""".stripMargin,
    "centroid_outliers" ->
      """WITH u AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |pe AS (SELECT label, unnest(
        |    [{'pos': i, 'x': v[i]} for i in range(1, len(v) + 1)]) AS e FROM u),
        |agg AS (SELECT label, e.pos AS pos, count(*) AS n,
        |    SUM(CAST(e.x AS DECIMAL(28,12))) AS s FROM pe GROUP BY label, e.pos),
        |cpos AS (SELECT label, pos, round(CAST(s AS DOUBLE) / n, 6) AS c FROM agg),
        |cent AS (SELECT label, list(c ORDER BY pos) AS centroid FROM cpos GROUP BY label)
        |SELECT u.vec_id, u.label,
        |  round(list_cosine_similarity(u.v, cent.centroid), 6) AS cos_centroid,
        |  round(list_cosine_similarity(u.v, cent.centroid), 6) < 0.0 AS is_outlier
        |FROM u JOIN cent USING (label)""".stripMargin,
    "skew_profile" ->
      """WITH c AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM orders GROUP BY o_custkey),
        |s AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS n_keys FROM c)
        |SELECT o_custkey, n_rows,
        |  round(CAST(n_rows AS DOUBLE) / s.total, 6) AS share,
        |  round(n_rows * s.n_keys / CAST(s.total AS DOUBLE), 4) AS skew_vs_mean
        |FROM c, s ORDER BY n_rows DESC, o_custkey LIMIT 10""".stripMargin,
    "len_histogram" ->
      """WITH t AS (SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |b AS (SELECT CAST(length(bin(greatest(n, 1))) - 1 AS INT) AS bucket, n FROM t)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS sum_tokens,
        |  CAST(min(n) AS BIGINT) AS min_tokens,
        |  CAST(max(n) AS BIGINT) AS max_tokens,
        |  CAST(1 << bucket AS BIGINT) AS band_lo
        |FROM b GROUP BY bucket""".stripMargin,
    "schema_drift" -> (SrcCte + """,
        |pa AS (
        |  SELECT 'c_custkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
        |    CAST(min(c_custkey) AS VARCHAR) AS min_value, CAST(max(c_custkey) AS VARCHAR) AS max_value FROM src_a
        |  UNION ALL SELECT 'c_name', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_name) AS BIGINT),
        |    CAST(min(c_name) AS VARCHAR), CAST(max(c_name) AS VARCHAR) FROM src_a
        |  UNION ALL SELECT 'c_acctbal', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_acctbal) AS BIGINT),
        |    CAST(min(c_acctbal) AS VARCHAR), CAST(max(c_acctbal) AS VARCHAR) FROM src_a
        |  UNION ALL SELECT 'c_mktsegment', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_mktsegment) AS BIGINT),
        |    CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR) FROM src_a),
        |pb AS (
        |  SELECT 'c_custkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
        |    CAST(min(c_custkey) AS VARCHAR) AS min_value, CAST(max(c_custkey) AS VARCHAR) AS max_value FROM src_b
        |  UNION ALL SELECT 'c_name', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_name) AS BIGINT),
        |    CAST(min(c_name) AS VARCHAR), CAST(max(c_name) AS VARCHAR) FROM src_b
        |  UNION ALL SELECT 'c_acctbal', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_acctbal) AS BIGINT),
        |    CAST(min(c_acctbal) AS VARCHAR), CAST(max(c_acctbal) AS VARCHAR) FROM src_b
        |  UNION ALL SELECT 'c_mktsegment', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_mktsegment) AS BIGINT),
        |    CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR) FROM src_b)
        |SELECT pa.col_name AS col_name,
        |  pa.n_rows AS rows_before, pb.n_rows AS rows_after,
        |  pb.n_distinct - pa.n_distinct AS distinct_delta,
        |  (CASE WHEN pb.n_rows = 0 THEN 0 ELSE CAST(floor(pb.n_nulls * 1000 / pb.n_rows) AS BIGINT) END)
        |    - (CASE WHEN pa.n_rows = 0 THEN 0 ELSE CAST(floor(pa.n_nulls * 1000 / pa.n_rows) AS BIGINT) END) AS null_permille_delta,
        |  (coalesce(pa.min_value, '') <> coalesce(pb.min_value, '')
        |    OR coalesce(pa.max_value, '') <> coalesce(pb.max_value, '')) AS range_changed,
        |  (pb.n_distinct - pa.n_distinct <> 0
        |    OR (CASE WHEN pb.n_rows = 0 THEN 0 ELSE CAST(floor(pb.n_nulls * 1000 / pb.n_rows) AS BIGINT) END)
        |       - (CASE WHEN pa.n_rows = 0 THEN 0 ELSE CAST(floor(pa.n_nulls * 1000 / pa.n_rows) AS BIGINT) END) <> 0
        |    OR coalesce(pa.min_value, '') <> coalesce(pb.min_value, '')
        |    OR coalesce(pa.max_value, '') <> coalesce(pb.max_value, '')) AS drifted
        |FROM pa JOIN pb ON pa.col_name = pb.col_name""".stripMargin),
    "source_cap" ->
      """WITH r AS (SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)) || CAST(doc_id AS VARCHAR)) AS INT) AS src_rank
        |  FROM documents)
        |SELECT doc_id, source, src_rank FROM r WHERE src_rank <= 10""".stripMargin,
    "corpus_gate" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |q AS (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
        |    round(CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is')))
        |      AS DOUBLE) / len(w), 6) AS stop_ratio
        |  FROM t),
        |grams AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS gram
        |  FROM t WHERE len(w) >= 2),
        |per AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY doc_id, gram),
        |agg AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
        |    CAST(count(*) AS BIGINT) AS n_distinct_grams FROM per GROUP BY doc_id),
        |dupf AS (SELECT doc_id,
        |    round(CAST(n_grams - n_distinct_grams AS DOUBLE) / n_grams, 6) AS df
        |  FROM agg)
        |SELECT q.doc_id, q.n_tokens, q.stop_ratio,
        |  coalesce(dupf.df, 0.0) AS dup_fraction,
        |  concat_ws(' | ',
        |    CASE WHEN q.n_tokens < 30 THEN 'too_short' END,
        |    CASE WHEN q.stop_ratio < 0.05 THEN 'low_stopword_ratio' END,
        |    CASE WHEN coalesce(dupf.df, 0.0) > 0.2 THEN 'repetitive' END) AS _reasons,
        |  (concat_ws(' | ',
        |    CASE WHEN q.n_tokens < 30 THEN 'too_short' END,
        |    CASE WHEN q.stop_ratio < 0.05 THEN 'low_stopword_ratio' END,
        |    CASE WHEN coalesce(dupf.df, 0.0) > 0.2 THEN 'repetitive' END) = '') AS keep
        |FROM q LEFT JOIN dupf ON q.doc_id = dupf.doc_id""".stripMargin,
    // zorder_cluster — bucketing replayed with the identical exact
    // integer arithmetic ((v-min)*(2^16-1) // max(range,1)) and the
    // interleave generated from the SAME (bit, column) loop as
    // Layout.interleave, so the 32 shift/mask terms agree by construction.
    "zorder_cluster" -> {
      val terms = (for { j <- 0 until 16; i <- 0 until 2 } yield {
        val b = if (i == 0) "bp" else "bs"
        s"((($b >> $j) & 1) << ${j * 2 + i})"
      }).mkString(" | ")
      s"""WITH b AS (SELECT CAST(min(l_partkey) AS BIGINT) AS mnp, CAST(max(l_partkey) AS BIGINT) AS mxp,
        |    CAST(min(l_suppkey) AS BIGINT) AS mns, CAST(max(l_suppkey) AS BIGINT) AS mxs FROM lineitem),
        |v AS (SELECT l_orderkey, l_linenumber,
        |    ((CAST(l_partkey AS BIGINT) - mnp) * 65535) // greatest(mxp - mnp, 1) AS bp,
        |    ((CAST(l_suppkey AS BIGINT) - mns) * 65535) // greatest(mxs - mns, 1) AS bs
        |  FROM lineitem, b)
        |SELECT l_orderkey, l_linenumber, bp AS zb_part, bs AS zb_supp,
        |  CAST($terms AS BIGINT) AS zval
        |FROM v""".stripMargin
    },
    // pipeline_report — the DWH pipeline's per-stage row counts re-derived:
    // quality replays Pipeline.runAll's 4-rule engine (null/FK/price checks
    // + the duplicate-key window; rn without ORDER BY is safe because the
    // count only depends on WHICH row is rn=1 when a dup group is
    // heterogeneous on the other rules — orderkeys are unique at every SF,
    // verified), transform_load is the two facts' grains (clean orders +
    // their lineitems), report is the zone-stats row count (zones present).
    "pipeline_report" ->
      """WITH ann AS (SELECT o_orderkey, o_custkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderkey) AS rn FROM orders),
        |flg AS (SELECT o_orderkey, (o_custkey IS NOT NULL
        |    AND o_custkey IN (SELECT c_custkey FROM customer)
        |    AND (o_totalprice > 0 OR o_totalprice IS NULL) AND rn = 1) AS is_clean FROM ann),
        |cl AS (SELECT CAST(count(*) AS BIGINT) AS n FROM flg WHERE is_clean),
        |li AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem l
        |    JOIN flg f ON f.o_orderkey = l.l_orderkey AND f.is_clean),
        |zz AS (SELECT CAST(count(DISTINCT CASE WHEN is_clean THEN 'clean' ELSE 'error' END)
        |    AS BIGINT) AS n FROM flg)
        |SELECT 'stage_raw' AS stage, CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows
        |UNION ALL SELECT 'quality', (SELECT n FROM cl)
        |UNION ALL SELECT 'transform_load', (SELECT n FROM cl) + (SELECT n FROM li)
        |UNION ALL SELECT 'report', (SELECT n FROM zz)""".stripMargin,
    // corpus_report — the curation pipeline's per-stage counts re-derived
    // end-to-end: the corpus_gate thresholds (30/0.05/0.2, 6dp-rounded
    // signals), the source_cap md5 rank at 120, exact dedup's
    // normalized-text min-id grouping, then the dedup_cluster oracle's
    // all-pairs 3-shingle Jaccard >= 0.8 + recursive-reach fixpoint over
    // the capped survivors (representative = cluster min). The annotate-
    // only stages (span scrub, tokenizer, ppl buckets, shard write) carry
    // the dedup count through — pinned as never-drops in PipelineSpec.
    "corpus_report" ->
      """WITH RECURSIVE
        |d0 AS (SELECT doc_id, source, nfc_normalize(text) AS text FROM documents),
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM d0),
        |q AS (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
        |    round(CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is')))
        |      AS DOUBLE) / len(w), 6) AS stop_ratio FROM t),
        |grams AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS gram
        |  FROM t WHERE len(w) >= 2),
        |per AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY doc_id, gram),
        |agg AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
        |    CAST(count(*) AS BIGINT) AS n_distinct_grams FROM per GROUP BY doc_id),
        |gated AS (SELECT d0.doc_id, d0.source, d0.text FROM d0
        |  JOIN q ON q.doc_id = d0.doc_id LEFT JOIN agg ON agg.doc_id = d0.doc_id
        |  WHERE NOT coalesce(q.n_tokens < 30, FALSE)
        |    AND NOT coalesce(q.stop_ratio < 0.05, FALSE)
        |    AND NOT coalesce(round(CAST(n_grams - n_distinct_grams AS DOUBLE) / n_grams, 6) > 0.2, FALSE)),
        |cap AS (SELECT doc_id, row_number() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)) || CAST(doc_id AS VARCHAR)) AS rk FROM gated),
        |capped AS (SELECT g.* FROM gated g JOIN cap ON cap.doc_id = g.doc_id WHERE cap.rk <= 120),
        |ex AS (SELECT min(doc_id) AS doc_id FROM capped
        |  GROUP BY regexp_replace(trim(lower(text)), '\s+', ' ', 'g')),
        |exd AS (SELECT c.* FROM capped c JOIN ex ON ex.doc_id = c.doc_id),
        |tw AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM exd),
        |sh AS (SELECT doc_id,
        |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
        |  FROM tw WHERE len(w) >= 3),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.8),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
        |reach(src, node) AS (
        |  SELECT doc_id AS src, doc_id AS node FROM exd
        |  UNION
        |  SELECT r.src, e.dst AS node FROM reach r JOIN edges e ON e.src = r.node),
        |kept AS (SELECT src AS doc_id FROM reach GROUP BY src HAVING min(node) = src),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM kept)
        |SELECT 'ingest' AS stage, CAST((SELECT count(*) FROM d0) AS BIGINT) AS n_rows
        |UNION ALL SELECT 'quality_gate', CAST((SELECT count(*) FROM gated) AS BIGINT)
        |UNION ALL SELECT 'source_cap', CAST((SELECT count(*) FROM capped) AS BIGINT)
        |UNION ALL SELECT 'dedup', (SELECT n FROM nd)
        |UNION ALL SELECT 'span_scrub', (SELECT n FROM nd)
        |UNION ALL SELECT 'tokenizer', (SELECT n FROM nd)
        |UNION ALL SELECT 'ppl_buckets', (SELECT n FROM nd)
        |UNION ALL SELECT 'shard_write', (SELECT n FROM nd)""".stripMargin,
    "tfidf_top" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, token),
        |d AS (SELECT *, CAST(count(*) OVER (PARTITION BY token) AS BIGINT) AS df,
        |    (SELECT count(*) FROM documents) AS n_docs FROM tf),
        |s AS (SELECT doc_id, token, tf, df,
        |    round(tf * round(ln(CAST(n_docs AS DOUBLE) / df), 6), 6) AS tfidf FROM d),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, token) AS INT) AS rank FROM s)
        |SELECT doc_id, token, tf, df, tfidf, rank FROM r WHERE rank <= 5""".stripMargin,
    "mix_weights" ->
      """WITH t AS (SELECT lang, len(string_split_regex(trim(text), '\s+')) AS n_tok FROM documents),
        |p AS (SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens FROM t GROUP BY lang),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS _total FROM p)
        |SELECT stratum, n_docs, n_tokens,
        |  round(CAST(n_tokens AS DOUBLE) / _total, 6) AS actual_share,
        |  round(CASE stratum WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.2 WHEN 'fr' THEN 0.1
        |    WHEN 'es' THEN 0.1 WHEN 'de' THEN 0.1 ELSE 0.0 END, 6) AS target_share,
        |  round((CASE stratum WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.2 WHEN 'fr' THEN 0.1
        |    WHEN 'es' THEN 0.1 WHEN 'de' THEN 0.1 ELSE 0.0 END)
        |    / (CAST(n_tokens AS DOUBLE) / _total), 6) AS weight
        |FROM p, tot""".stripMargin,
    // Epoch thresholds are floor(frac(w)*2^32) as 8-hex (the
    // sample_weighted convention): 1.6->99999999, 2.3->4ccccccc,
    // 0.5->80000000, 0.25->40000000, 1.0->00000000 (never keeps).
    "mix_epochs" ->
      """WITH e AS (SELECT doc_id, lang,
        |    CAST(CASE lang WHEN 'en' THEN 1 WHEN 'zh' THEN 2 WHEN 'es' THEN 0
        |         WHEN 'fr' THEN 0 ELSE 1 END AS INT) AS full_e,
        |    CASE lang WHEN 'en' THEN '99999999' WHEN 'zh' THEN '4ccccccc'
        |         WHEN 'es' THEN '80000000' WHEN 'fr' THEN '40000000'
        |         ELSE '00000000' END AS thr
        |  FROM documents)
        |SELECT doc_id, lang, CAST(e AS INT) AS epoch
        |FROM (SELECT doc_id, lang, full_e, thr,
        |        unnest(range(0, full_e + 1)) AS e FROM e) u
        |WHERE e < full_e OR substr(md5(doc_id || ':' || e), 1, 8) < thr""".stripMargin,
    // DSIR replay: identical hashed-bucket model (MD5-top-32-bit mod 1024),
    // identical add-1 smoothing, the per-bucket log-ratio as ONE double
    // expression rounded to 6dp, and the per-doc sum in DECIMAL — the
    // lm_score float-summation discipline.
    "dsir_weights" ->
      """WITH toks AS (SELECT doc_id, lang = 'en' AS t,
        |    string_split_regex(trim(text), '\s+') AS w FROM documents),
        |feats AS (
        |  SELECT doc_id, t, unnest(w) AS g FROM toks
        |  UNION ALL
        |  SELECT doc_id, t,
        |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
        |  FROM toks),
        |fb AS (SELECT doc_id, t,
        |    ('0x' || substr(md5(g), 1, 8))::BIGINT % 1024 AS b FROM feats),
        |stats AS (SELECT b, SUM(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
        |    count(*) AS cr FROM fb GROUP BY b),
        |tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM stats),
        |ratio AS (SELECT b,
        |    CAST(round(ln((CAST(ct + 1 AS DOUBLE) / (nt + 1024))
        |      * (CAST(nr + 1024 AS DOUBLE) / (cr + 1))), 6)
        |      AS DECIMAL(18,6)) AS lr
        |  FROM stats, tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
        |  round(CAST(SUM(lr) AS DOUBLE), 6) AS dsir_logw
        |FROM fb JOIN ratio USING (b) GROUP BY doc_id""".stripMargin,
    // Integer replay of the pinned dyadic weights: Spark folds
    // w_i = (k_i - 2^31)/2^32 (each partial sum exact in double), so
    // summing the k_i as integers and applying (SUM(k) - n·2^31)/2^32/n
    // reconstructs the identical double — one exact subtraction, two
    // divisions whose operands are exactly representable.
    "quality_classify" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |feats AS (
        |  SELECT doc_id, unnest(w) AS g FROM toks
        |  UNION ALL
        |  SELECT doc_id,
        |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
        |  FROM toks),
        |fk AS (SELECT doc_id,
        |    ((('0x' || substr(md5(g), 1, 8))::BIGINT % 1024)
        |      * 2654435761) % 4294967296 AS k
        |  FROM feats),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
        |    CAST(SUM(k) - count(*) * 2147483648 AS DOUBLE)
        |      / 4294967296.0 / count(*) AS logit
        |  FROM fk GROUP BY doc_id)
        |SELECT doc_id, n_feats, logit, logit > 0.0 AS kept FROM agg""".stripMargin,
    // Per-source rollup of the same integer-replayed classifier verdicts;
    // both ratios are one double division of exactly-summed integers.
    "domain_gate" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |feats AS (
        |  SELECT doc_id, unnest(w) AS g FROM toks
        |  UNION ALL
        |  SELECT doc_id,
        |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
        |  FROM toks),
        |fk AS (SELECT doc_id,
        |    ((('0x' || substr(md5(g), 1, 8))::BIGINT % 1024)
        |      * 2654435761) % 4294967296 AS k
        |  FROM feats),
        |agg AS (SELECT doc_id,
        |    CAST(SUM(k) - count(*) * 2147483648 AS DOUBLE)
        |      / 4294967296.0 / count(*) AS logit
        |  FROM fk GROUP BY doc_id),
        |j AS (SELECT d.source, d.n_chars, a.logit > 0.0 AS kept
        |  FROM documents d JOIN agg a USING (doc_id)),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS DOUBLE) / count(*) AS mean_chars,
        |    CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE)
        |      / count(*) AS keep_rate
        |  FROM j GROUP BY source)
        |SELECT source, n_docs, mean_chars, keep_rate,
        |  n_docs >= 10 AND keep_rate > 0.5 AS src_kept
        |FROM g""".stripMargin,
    // Spearman replay: the classifier logit chain, the mann_whitney
    // doubled-midrank construction per variable, moment sums in HUGEINT,
    // the identically-parenthesized double chain (IEEE sqrt included).
    "quality_length_corr" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |feats AS (
        |  SELECT doc_id, unnest(w) AS g FROM toks
        |  UNION ALL
        |  SELECT doc_id,
        |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
        |  FROM toks),
        |fk AS (SELECT doc_id,
        |    ((('0x' || substr(md5(g), 1, 8))::BIGINT % 1024)
        |      * 2654435761) % 4294967296 AS k
        |  FROM feats),
        |agg AS (SELECT doc_id,
        |    CAST(SUM(k) - count(*) * 2147483648 AS DOUBLE)
        |      / 4294967296.0 / count(*) AS logit
        |  FROM fk GROUP BY doc_id),
        |base AS (SELECT CAST(d.n_chars AS DOUBLE) AS x, a.logit AS y
        |  FROM documents d JOIN agg a USING (doc_id)),
        |pairs AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY x, y),
        |cx AS (SELECT x, SUM(c) AS t FROM pairs GROUP BY x),
        |rx AS (SELECT x, 2 * (sum(t) OVER (ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t) + t + 1 AS rxv
        |  FROM cx),
        |cy AS (SELECT y, SUM(c) AS t FROM pairs GROUP BY y),
        |ry AS (SELECT y, 2 * (sum(t) OVER (ORDER BY y
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t) + t + 1 AS ryv
        |  FROM cy),
        |wr AS (SELECT p.c, rx.rxv, ry.ryv
        |  FROM pairs p JOIN rx USING (x) JOIN ry USING (y)),
        |m AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
        |    SUM(CAST(c AS HUGEINT) * rxv) AS sx,
        |    SUM(CAST(c AS HUGEINT) * ryv) AS sy,
        |    SUM(CAST(c AS HUGEINT) * rxv * rxv) AS sxx,
        |    SUM(CAST(c AS HUGEINT) * ryv * ryv) AS syy,
        |    SUM(CAST(c AS HUGEINT) * rxv * ryv) AS sxy
        |  FROM wr)
        |SELECT n,
        |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |        AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
        |    THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS rho
        |FROM m""".stripMargin,
    // Kappa replay: the corpus_gate keep chain + the quality_classify
    // kept chain joined per doc, the 2x2 contingency, and kappa in its
    // cleared-denominator integer form carried in HUGEINT (products of
    // two row counts overflow BIGINT past ~3B rows), one terminal
    // division per output double.
    "gate_agreement" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |q AS (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
        |    round(CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is')))
        |      AS DOUBLE) / len(w), 6) AS stop_ratio
        |  FROM t),
        |grams AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS gram
        |  FROM t WHERE len(w) >= 2),
        |per AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY doc_id, gram),
        |agg AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
        |    CAST(count(*) AS BIGINT) AS n_distinct_grams FROM per GROUP BY doc_id),
        |dupf AS (SELECT doc_id,
        |    round(CAST(n_grams - n_distinct_grams AS DOUBLE) / n_grams, 6) AS df
        |  FROM agg),
        |ga AS (SELECT q.doc_id,
        |    (concat_ws(' | ',
        |      CASE WHEN q.n_tokens < 30 THEN 'too_short' END,
        |      CASE WHEN q.stop_ratio < 0.05 THEN 'low_stopword_ratio' END,
        |      CASE WHEN coalesce(dupf.df, 0.0) > 0.2 THEN 'repetitive' END) = '') AS a
        |  FROM q LEFT JOIN dupf ON q.doc_id = dupf.doc_id),
        |cfeats AS (
        |  SELECT doc_id, unnest(w) AS g FROM t
        |  UNION ALL
        |  SELECT doc_id,
        |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
        |  FROM t),
        |cfk AS (SELECT doc_id,
        |    ((('0x' || substr(md5(g), 1, 8))::BIGINT % 1024)
        |      * 2654435761) % 4294967296 AS k
        |  FROM cfeats),
        |cagg AS (SELECT doc_id,
        |    CAST(SUM(k) - count(*) * 2147483648 AS DOUBLE)
        |      / 4294967296.0 / count(*) AS logit
        |  FROM cfk GROUP BY doc_id),
        |j AS (SELECT ga.a AS a, cagg.logit > 0.0 AS b
        |  FROM ga JOIN cagg USING (doc_id)),
        |x AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS yy,
        |    CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS yn,
        |    CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS ny,
        |    CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS nn
        |  FROM j),
        |f AS (SELECT n, yy, nn, yn, ny,
        |    CAST(yy + yn AS HUGEINT) * (yy + ny)
        |      + CAST(ny + nn AS HUGEINT) * (yn + nn) AS pe_num
        |  FROM x)
        |SELECT n, yy AS n_both_keep, nn AS n_both_drop,
        |  yn AS n_only_a, ny AS n_only_b,
        |  CAST(yy + nn AS DOUBLE) / CAST(n AS DOUBLE) AS p_o,
        |  CAST(pe_num AS DOUBLE) / CAST(CAST(n AS HUGEINT) * n AS DOUBLE) AS p_e,
        |  CASE WHEN CAST(n AS HUGEINT) * n <> pe_num
        |    THEN CAST(CAST(n AS HUGEINT) * (yy + nn) - pe_num AS DOUBLE)
        |         / CAST(CAST(n AS HUGEINT) * n - pe_num AS DOUBLE) END AS kappa
        |FROM f""".stripMargin,
    "quality_deciles" ->
      """SELECT doc_id, source, n_chars,
        |  CAST(ntile(10) OVER (PARTITION BY source
        |    ORDER BY n_chars, doc_id) AS INT) AS decile
        |FROM documents""".stripMargin,
    "moving_avg" ->
      """WITH daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS rev, CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
        |spine AS (SELECT event_type, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |filled AS (SELECT s.event_type, s.day,
        |    coalesce(d.rev, CAST(0 AS DECIMAL(18,4))) AS rev,
        |    CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events
        |  FROM spine s LEFT JOIN daily d USING (event_type, day)),
        |w AS (SELECT event_type, day, n_events, rev,
        |    SUM(rev) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS wsum,
        |    count(*) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS wn
        |  FROM filled)
        |SELECT event_type, day, n_events,
        |  CAST(rev AS DOUBLE) AS day_value, CAST(wsum AS DOUBLE) AS win_sum,
        |  round(CAST(wsum AS DOUBLE) / wn, 6) AS win_avg
        |FROM w""".stripMargin,
    // EWMA: the generated term chain is IDENTICAL on both sides — each
    // lag scaled by an exact power-of-two literal, summed left-assoc,
    // renormalized by the (exactly-summed dyadic) present-weight total;
    // the spike compare is one exact multiply.
    "ewma_daily" -> {
      val W = 16
      def wt(k: Int) = math.pow(2.0, -(k + 1)).toString
      val num = (0 until W)
        .map(k => s"coalesce(lag(xv, $k) OVER wspec * ${wt(k)}, 0)").mkString(" + ")
      val den = (0 until W)
        .map(k => s"coalesce(CASE WHEN lag(xv, $k) OVER wspec IS NOT NULL THEN ${wt(k)} END, 0)")
        .mkString(" + ")
      s"""WITH daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS rev, CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
        |spine AS (SELECT event_type, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |filled AS (SELECT s.event_type, s.day,
        |    CAST(coalesce(d.rev, CAST(0 AS DECIMAL(18,4))) AS DOUBLE) AS xv,
        |    CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events
        |  FROM spine s LEFT JOIN daily d USING (event_type, day)),
        |e AS (SELECT event_type, day, n_events, xv,
        |    ($num) / ($den) AS ewma
        |  FROM filled WINDOW wspec AS (PARTITION BY event_type ORDER BY day)),
        |p AS (SELECT event_type, day, n_events, xv, ewma,
        |    lag(ewma, 1) OVER (PARTITION BY event_type ORDER BY day) AS prev
        |  FROM e)
        |SELECT event_type, day, n_events, xv AS day_value, ewma,
        |  coalesce(xv > 4.0 * prev, FALSE) AS spike
        |FROM p""".stripMargin
    },
    "ppl_buckets" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        |vocab AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
        |n AS (SELECT count(*) AS n_total FROM tok),
        |lm AS (SELECT doc_id,
        |    round(CAST(SUM(tf * CAST(round(ln(CAST(cnt AS DOUBLE) / n_total), 6)
        |      AS DECIMAL(18,6))) AS DOUBLE) / SUM(tf), 6) AS avg_logprob
        |  FROM tf JOIN vocab USING (token), n GROUP BY doc_id),
        |j AS (SELECT d.doc_id, d.lang, lm.avg_logprob
        |  FROM documents d JOIN lm USING (doc_id))
        |SELECT doc_id, lang, avg_logprob,
        |  CAST(ntile(3) OVER (PARTITION BY lang
        |    ORDER BY avg_logprob, doc_id) AS INT) AS ppl_bucket
        |FROM j""".stripMargin
  )
}
