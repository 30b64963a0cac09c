"""Query registry: the generic relational forms of every SURVEY §2 operator
plus the large-scale training-data ops (dedup / similarity / text analysis),
each with a DuckDB-oracle SQL twin for the driver's correctness gate.

Each entry: name → (spark_builder(spark, sf_dir) -> DataFrame, oracle_sql).
``oracle_sql`` is None for ops not expressible in ANSI SQL (the fused
extraction UDF stage) — the driver then records a rows-only check.

Dialect discipline: every computed column is aliased identically on both
sides; aggregates are rounded; counts/length are cast to BIGINT (Spark
``size`` is INT, DuckDB ``len`` is BIGINT); timestamps are serialized
through explicit formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def _sql(query: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_views(spark, sf_dir)
        return spark.sql(query)
    return run


QUERIES: dict[str, tuple] = {}


def _q(name: str, spark_sql: str, oracle: str | None = "same"):
    QUERIES[name] = (_sql(spark_sql),
                     spark_sql if oracle == "same" else oracle)


# ---------------------------------------------------------------------------
# §2.1 sources / dispatch — scalar string normalization (S5 extractMime)
_q("mime_normalize", """
SELECT doc_id,
       lower(trim(split_part(concat(source, '; charset=utf-8'), ';', 1)))
         AS mime,
       upper(lang) AS lang_uc
FROM documents
""")

# §2.1 S4 — middleware dispatch: branch filters + union + fallback
_q("union_dispatch_fallback", """
SELECT event_id, 'interaction' AS route, event_type FROM events
WHERE event_type IN ('click', 'view')
UNION ALL
SELECT event_id, 'error' AS route, event_type FROM events
WHERE event_type = 'error'
UNION ALL
SELECT event_id, 'link_fallback' AS route, event_type FROM events
WHERE event_type NOT IN ('click', 'view', 'error')
""")

# §2.2 P2 — scalar JSON extraction (readJson / from_json)
_q("json_props_extract", """
SELECT event_id,
       CAST(get_json_object(props, '$.k') AS BIGINT) AS k_value
FROM events
""", """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
FROM events
""")

# §2.2 P3/P4 — explode with position (graph flatten / zip family)
_q("posexplode_words", """
SELECT doc_id, CAST(t.pos AS BIGINT) AS pos, t.word
FROM documents
LATERAL VIEW posexplode(split(text, ' ')) t AS pos, word
WHERE doc_id < 200
""", """
SELECT d.doc_id, CAST(t.i - 1 AS BIGINT) AS pos, d.words[t.i] AS word
FROM (SELECT doc_id, string_split(text, ' ') AS words
      FROM documents WHERE doc_id < 200) d,
     UNNEST(generate_series(1, len(d.words))) AS t(i)
""")

# §2.2 P5 — record-scoped lookup: left outer equi-join (oembed side table)
_q("lookup_left_join", """
SELECT o.o_orderkey, c.c_mktsegment AS segment,
       coalesce(c.c_name, 'missing-customer') AS cust_name
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
""")

# §2.3 C1-C7 — precedence coalesce
_q("precedence_coalesce", """
SELECT o_orderkey,
       coalesce(nullif(o_orderpriority, '5-LOW'),
                nullif(o_orderstatus, 'F'),
                'fallback') AS resolved
FROM orders
""")

# §2.3 C9-C11 — dedupe-merge: group-first with ordered overlay
_q("dedupe_group_first", """
SELECT lang, source, doc_id AS first_doc, n_chars AS first_len
FROM (
  SELECT lang, source, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang, source ORDER BY doc_id)
           AS rn
  FROM documents
) WHERE rn = 1
""")

# §2.3 — ordered re-aggregation (span order preservation)
_q("ordered_array_reagg", """
SELECT user_id,
       array_join(transform(array_sort(collect_list(
         struct(ts, event_id, event_type))), x -> x.event_type), ',')
         AS type_seq,
       count(*) AS n_events
FROM events
WHERE user_id < 40
GROUP BY user_id
""", """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS type_seq,
       count(*) AS n_events
FROM events
WHERE user_id < 40
GROUP BY user_id
""")

# relational competence: TPC-H Q1 (map-side-combinable agg)
_q("tpch_q1", """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
         AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= CAST('1998-09-02' AS DATE)
GROUP BY l_returnflag, l_linestatus
""")

# relational competence: TPC-H Q3-style join + top-k (broadcastable dims)
_q("tpch_q3_topk", """
SELECT o.o_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       date_format(o.o_orderdate, 'yyyy-MM-dd') AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""", """
SELECT o.o_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""")

# relational competence: TPC-H Q5-style multi-join with broadcastable dims
_q("tpch_q5_region_revenue", """
SELECT n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
             AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
""")

# relational competence: TPC-H Q6 (pure pushdown-filter scan agg)
_q("tpch_q6_forecast", """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= CAST('1994-01-01' AS DATE)
  AND l_shipdate < CAST('1995-01-01' AS DATE)
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")

# relational competence: TPC-H Q10-style top returning customers
_q("tpch_q10_returns", """
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       n.n_name AS nation
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")

# relational competence: TPC-H Q4 form — EXISTS → left-semi join.
# (The spec's l_commitdate/l_receiptdate aren't in the reduced schema;
# the semi-join predicate is ship-lag > 60 days instead.)
_q("tpch_q4_priority_semi", """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE CAST(o.o_orderdate AS DATE) >= CAST('1996-01-01' AS DATE)
  AND CAST(o.o_orderdate AS DATE) < CAST('1997-01-01' AS DATE)
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND CAST(l.l_shipdate AS DATE)
          > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""")

# relational competence: TPC-H Q7 form — nation-pair volume shipping
# (OR of symmetric pairs; two broadcastable joins against nation)
_q("tpch_q7_volume", """
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""")

# relational competence: TPC-H Q14 form — conditional agg over a
# broadcastable part join (promo revenue share)
_q("tpch_q14_promo", """
SELECT round(100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                         THEN l.l_extendedprice * (1 - l.l_discount)
                         ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
         AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE CAST(l.l_shipdate AS DATE) >= CAST('1996-09-01' AS DATE)
  AND CAST(l.l_shipdate AS DATE) < CAST('1996-10-01' AS DATE)
""")

# relational competence: TPC-H Q15 form — scalar-subquery max over a CTE
_q("tpch_q15_top_supplier", """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2)
           AS total_revenue
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= CAST('1996-01-01' AS DATE)
    AND CAST(l_shipdate AS DATE) < CAST('1996-04-01' AS DATE)
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
""")

# relational competence: TPC-H Q16 form — distinct-count + NOT IN
# anti-join (lineitem stands in for partsupp in the reduced schema)
_q("tpch_q16_supplier_cnt", """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type NOT LIKE 'MEDIUM%'
  AND p.p_size IN (1, 4, 7, 10, 15, 23, 45, 49)
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""")

# relational competence: TPC-H Q18 form — IN over a HAVING subquery
_q("tpch_q18_large_orders", """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 20
""")

# relational competence: TPC-H Q19 form — OR-of-AND bracket predicates
# across a broadcastable join (disjunct pushdown exercise)
_q("tpch_q19_brackets", """
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#10' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""")

# relational competence: TPC-H Q22 form — scalar-avg filter + NOT EXISTS
# anti-join (every synthetic customer has SOME order, so the anti-join
# is against recent orders; cntrycode stands in as nationkey)
_q("tpch_q22_idle_rich", """
SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c.c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer
                     WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND CAST(o.o_orderdate AS DATE) >= CAST('2000-01-01' AS DATE))
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
""")

# relational competence: TPC-H Q13 form — LEFT OUTER + two-level
# aggregate (customers with ZERO orders must appear in the c_count=0
# histogram bucket, which an inner join silently drops)
_q("tpch_q13_custdist", """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) cc
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""")

# relational competence: TPC-H Q17 form — correlated scalar subquery
# per part (decorrelates to a broadcastable per-part aggregate join)
_q("tpch_q17_small_qty_revenue", """
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey)
""")

# grouped top-k per group (window rank) — dedup family's per-key keeper
_q("topk_per_group", """
SELECT lang, doc_id, n_chars
FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
) WHERE rn <= 3
""")

# gaps-and-islands sessionization — the generic relational form of the
# stateful streaming sessionizer (streaming/windows.py::sessionize)
_q("sessionize_gaps_islands", """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR unix_micros(CAST(ts AS TIMESTAMP))
                   - unix_micros(CAST(lag(ts) OVER w AS TIMESTAMP))
                   > 7200000000
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id < 40
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS INT) AS session_id,
       count(*) AS n_events,
       date_format(min(ts), 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS session_start,
       date_format(max(ts), 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS session_end
FROM sess GROUP BY user_id, session_id
""", """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 7200000000
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id < 40
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS INT) AS session_id,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end
FROM sess GROUP BY user_id, session_id
""")

# window analytics: running per-user sums (checkpointable progress metric)
_q("window_running_sum", """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_value
FROM events
WHERE user_id < 40
""")

# ---------------------------------------------------------------------------
# training-data pipeline: deduplication family

_q("dedup_exact", """
SELECT md5(text) AS fp, min(doc_id) AS keeper, count(*) AS n_copies
FROM documents
GROUP BY md5(text)
""")

# minhash signatures over word-3-gram shingles — built join-free with a
# native array expression (transform over sequence) so the shingle stage is
# scan→project only: at 10^12 docs the old 3-way self-join of the exploded
# token table was three full shuffles; this is zero.
_MINHASH_CTE = """
WITH docs AS (
  SELECT doc_id, split(text, ' ') AS w FROM documents
), shingles AS (
  SELECT doc_id, t.g
  FROM docs
  LATERAL VIEW explode(
    CASE WHEN size(w) >= 3
         THEN zip_with(slice(w, 1, size(w) - 2),
                       zip_with(slice(w, 2, size(w) - 2),
                                slice(w, 3, size(w) - 2),
                                (y, z) -> concat(y, ' ', z)),
                       (x, yz) -> concat(x, ' ', yz))
         ELSE array() END) t AS g
)
"""
_MINHASH_CTE_DUCK = """
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), shingles AS (
  SELECT doc_id,
         unnest(CASE WHEN len(w) >= 3
                     THEN list_transform(generate_series(1, len(w) - 2),
                          i -> concat(w[i], ' ', w[i + 1], ' ', w[i + 2]))
                     ELSE CAST([] AS VARCHAR[]) END) AS g
  FROM docs
)
"""
_MINHASH_BODY = """
SELECT doc_id,
       min(md5(concat('0|', g))) AS h0, min(md5(concat('1|', g))) AS h1,
       min(md5(concat('2|', g))) AS h2, min(md5(concat('3|', g))) AS h3,
       min(md5(concat('4|', g))) AS h4, min(md5(concat('5|', g))) AS h5,
       min(md5(concat('6|', g))) AS h6, min(md5(concat('7|', g))) AS h7
FROM shingles GROUP BY doc_id
"""
_q("dedup_minhash_signature", _MINHASH_CTE + _MINHASH_BODY,
   _MINHASH_CTE_DUCK + _MINHASH_BODY)

_LSH_BODY = """
, sig AS (
%s
)
SELECT band_key, count(*) AS n_docs, min(doc_id) AS keeper
FROM (
  SELECT doc_id, md5(concat(h0, h1, h2, h3)) AS band_key FROM sig
  UNION ALL
  SELECT doc_id, md5(concat(h4, h5, h6, h7)) AS band_key FROM sig
)
GROUP BY band_key
HAVING count(*) > 1
""" % _MINHASH_BODY
_q("dedup_minhash_lsh_buckets", _MINHASH_CTE + _LSH_BODY,
   _MINHASH_CTE_DUCK + _LSH_BODY)

# simhash: 16 sign-summed bits from per-word hash parities
_SIMHASH_BITS = " + ".join(
    "(CASE WHEN sum(CASE WHEN ascii(substr(md5(word), %d, 1)) %% 2 = 1 "
    "THEN 1 ELSE -1 END) > 0 THEN %d ELSE 0 END)" % (b + 1, 1 << b)
    for b in range(16)
)
_q("dedup_simhash", """
SELECT doc_id, CAST(%s AS BIGINT) AS simhash
FROM (
  SELECT doc_id, t.word
  FROM documents LATERAL VIEW explode(split(text, ' ')) t AS word
)
GROUP BY doc_id
""" % _SIMHASH_BITS, """
SELECT doc_id, CAST(%s AS BIGINT) AS simhash
FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
)
GROUP BY doc_id
""" % _SIMHASH_BITS)

# SimHash near-dup PAIRING (completes the simhash pipeline the way
# LSH buckets complete minhash): split the 16-bit signature into 4
# bands of 4 bits — by pigeonhole, any pair within Hamming distance 3
# shares at least one full band, so the band equi-join is a guaranteed
# superset of the ≤2-bit pairs we emit after exact bit_count verify.
# Candidate space is band-bucket-bounded (never all-pairs).  At 100 TB
# the production signature is 64-bit with 4×16-bit bands — identical
# plan shape, same guarantee for hd≤3.
_SIMHASH_CTE = """
WITH sh AS (
  SELECT doc_id, CAST(%s AS BIGINT) AS simhash
  FROM (
    %s
  )
  GROUP BY doc_id
), bands AS (
  %s
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sa, b.simhash AS sb
  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(%s AS INT) AS hamming
FROM cand
WHERE %s <= 2
ORDER BY doc_a, doc_b
"""


def _simhash_pairs_sql(tok_body, band_expr, ham_expr):
    bands_union = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} * 16 + ({band_expr(b)}) AS bk FROM sh"
        for b in range(4))
    return _SIMHASH_CTE % (_SIMHASH_BITS, tok_body, bands_union,
                           ham_expr, ham_expr)


_q("dedup_simhash_hamming_pairs",
   _simhash_pairs_sql(
       "SELECT doc_id, t.word FROM documents "
       "LATERAL VIEW explode(split(text, ' ')) t AS word",
       lambda b: f"shiftright(simhash, {4 * b}) & 15",
       "bit_count(sa ^ sb)"),
   _simhash_pairs_sql(
       "SELECT doc_id, unnest(string_split(text, ' ')) AS word "
       "FROM documents",
       lambda b: f"(simhash >> {4 * b}) & 15",
       "bit_count(xor(sa, sb))"))

# The production-width variant: a 64-bit signature (two md5 streams of
# 32 hex-digit parities) split into 4×16-bit bands.  Same pigeonhole
# guarantee (any hd≤3 pair shares a full band) but at 64 bits the
# chance collision rate drops from ~1% to ~2^-44 per pair — the banded
# result IS the near-dup set, no post-filter flood.  Emits hd≤3 pairs.
_SIMHASH64_BITS = " + ".join(
    "(CASE WHEN sum(CASE WHEN ascii(substr(%s, %d, 1)) %% 2 = 1 "
    "THEN 1 ELSE -1 END) > 0 THEN CAST(%d AS BIGINT) ELSE 0 END)"
    % ("md5(word)" if b < 32 else "md5(concat('x', word))",
       (b % 32) + 1, 1 << b)
    for b in range(63)   # 63 bits: keeps the BIGINT sign bit clear
)


def _simhash64_pairs_sql(tok_body, shift, ham):
    bands = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS bno, {shift(16 * b)} AS bv "
        "FROM sh" for b in range(4))
    return f"""
WITH sh AS (
  SELECT doc_id, CAST({_SIMHASH64_BITS} AS BIGINT) AS simhash
  FROM (
    {tok_body}
  )
  GROUP BY doc_id
), bands AS (
  {bands}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sa, b.simhash AS sb
  FROM bands a JOIN bands b
    ON a.bno = b.bno AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST({ham} AS INT) AS hamming
FROM cand
WHERE {ham} <= 3
ORDER BY doc_a, doc_b
"""


_q("dedup_simhash64_hamming_pairs",
   _simhash64_pairs_sql(
       "SELECT doc_id, t.word FROM documents "
       "LATERAL VIEW explode(split(text, ' ')) t AS word",
       lambda k: f"shiftright(simhash, {k}) & 65535",
       "bit_count(sa ^ sb)"),
   _simhash64_pairs_sql(
       "SELECT doc_id, unnest(string_split(text, ' ')) AS word "
       "FROM documents",
       lambda k: f"(simhash >> {k}) & 65535",
       "bit_count(xor(sa, sb))"))

# n-gram Jaccard between LSH-candidate pairs.  The candidate pairs explode
# into (doc_a, doc_b, doc_id) rows — one per side — and EQUI-join the
# distinct shingle table on doc_id, so the verify stage shuffles on doc_id
# like any other join (the r1 version's `doc_id IN (doc_a, doc_b)` predicate
# forced a CartesianProduct of pairs × all shingles — confirmed scale-killer).
_JACCARD_BODY = """
, sig AS (
%s
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b
    ON a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id
), pair_sides AS (
  SELECT doc_a, doc_b, doc_a AS doc_id FROM pairs
  UNION ALL
  SELECT doc_a, doc_b, doc_b AS doc_id FROM pairs
), ga AS (SELECT DISTINCT doc_id, g FROM shingles)
SELECT doc_a, doc_b,
       round(CAST(sum(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS jaccard
FROM (
  SELECT p.doc_a AS doc_a, p.doc_b AS doc_b, ga.g AS g,
         count(*) AS n_sides
  FROM pair_sides p JOIN ga ON ga.doc_id = p.doc_id
  GROUP BY p.doc_a, p.doc_b, ga.g
)
GROUP BY doc_a, doc_b
""" % _MINHASH_BODY
_q("dedup_ngram_jaccard", _MINHASH_CTE + _JACCARD_BODY,
   _MINHASH_CTE_DUCK + _JACCARD_BODY)

# keeper application — the step a pipeline user actually runs after LSH:
# drop every non-keeper duplicate via an anti-join (NOT EXISTS plans as
# LeftAnti in Spark).  Shuffles on doc_id only; the dupe set is tiny
# relative to the corpus, so AQE broadcasts it at scale.
_KEEP_BODY = """
, sig AS (
%s
), bands AS (
  SELECT doc_id, md5(concat(h0, h1, h2, h3)) AS band_key FROM sig
  UNION ALL
  SELECT doc_id, md5(concat(h4, h5, h6, h7)) AS band_key FROM sig
), dupes AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY band_key) AS keeper,
           count(*) OVER (PARTITION BY band_key) AS n
    FROM bands
  ) WHERE n > 1 AND doc_id <> keeper
)
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM dupes x WHERE x.doc_id = d.doc_id)
""" % _MINHASH_BODY
_q("dedup_apply_keep", _MINHASH_CTE + _KEEP_BODY,
   _MINHASH_CTE_DUCK + _KEEP_BODY)

# signature-space Jaccard estimate — the production-scale verifier: LSH
# band buckets propose candidate pairs, then similarity is estimated from
# minhash component agreement alone (E[matches/k] = true Jaccard), so the
# shingle table is never re-joined.  Every join is an equi-join on
# band_key / doc_id; pair count is bounded by bucket co-membership, never
# all-pairs.  Complements dedup_ngram_jaccard (the exact verifier).
_SIGJACC_MATCHES = " + ".join(
    "(CASE WHEN sa.h%d = sb.h%d THEN 1 ELSE 0 END)" % (i, i)
    for i in range(8))
_SIGJACC_BODY = """
, sig AS (
%s
), bands AS (
  SELECT doc_id, md5(concat(h0, h1, h2, h3)) AS band_key FROM sig
  UNION ALL
  SELECT doc_id, md5(concat(h4, h5, h6, h7)) AS band_key FROM sig
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT p.doc_a, p.doc_b,
       round(CAST(%s AS DOUBLE) / 8.0, 4) AS est_jaccard
FROM pairs p
JOIN sig sa ON sa.doc_id = p.doc_a
JOIN sig sb ON sb.doc_id = p.doc_b
""" % (_MINHASH_BODY, _SIGJACC_MATCHES)
_q("dedup_signature_jaccard", _MINHASH_CTE + _SIGJACC_BODY,
   _MINHASH_CTE_DUCK + _SIGJACC_BODY)

# set-operation family (INTERSECT / EXCEPT — distinct semantics in both
# engines): which docs each dedup method flags, and where they disagree.
# Both flag sets are hash-group products; the set ops shuffle on doc_id.
_AGREE_BODY = """
, sig AS (
%s
), bands AS (
  SELECT doc_id, md5(concat(h0, h1, h2, h3)) AS band_key FROM sig
  UNION ALL
  SELECT doc_id, md5(concat(h4, h5, h6, h7)) AS band_key FROM sig
), exact_d AS (
  SELECT d.doc_id
  FROM documents d
  JOIN (SELECT md5(text) AS fp FROM documents GROUP BY md5(text)
        HAVING count(*) > 1) g
    ON md5(d.text) = g.fp
), lsh_d AS (
  SELECT DISTINCT b.doc_id
  FROM bands b
  JOIN (SELECT band_key FROM bands GROUP BY band_key
        HAVING count(*) > 1) bb
    ON b.band_key = bb.band_key
)
SELECT 'both' AS method, doc_id
FROM (SELECT doc_id FROM exact_d INTERSECT SELECT doc_id FROM lsh_d)
UNION ALL
SELECT 'exact_only' AS method, doc_id
FROM (SELECT doc_id FROM exact_d EXCEPT SELECT doc_id FROM lsh_d)
UNION ALL
SELECT 'lsh_only' AS method, doc_id
FROM (SELECT doc_id FROM lsh_d EXCEPT SELECT doc_id FROM exact_d)
""" % _MINHASH_BODY
_q("dedup_methods_agreement", _MINHASH_CTE + _AGREE_BODY,
   _MINHASH_CTE_DUCK + _AGREE_BODY)

# ---------------------------------------------------------------------------
# similarity search over embeddings

_q("ann_cosine_topk", """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, e.label,
       round(
         aggregate(zip_with(e.embedding, q.qv,
                            (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                   CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
         / (sqrt(aggregate(e.embedding, CAST(0.0 AS DOUBLE),
                           (acc, v) -> acc + CAST(v AS DOUBLE) * v))
            * sqrt(aggregate(q.qv, CAST(0.0 AS DOUBLE),
                             (acc, v) -> acc + CAST(v AS DOUBLE) * v))),
         3) AS cosine
FROM embeddings e CROSS JOIN q
WHERE e.vec_id <> 0
ORDER BY cosine DESC, vec_id
LIMIT 20
""", """
WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, e.label,
       round(
         list_dot_product(list_transform(e.embedding,
                          x -> CAST(x AS DOUBLE)), q.qv)
         / (sqrt(list_dot_product(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE)),
                 list_transform(e.embedding, x -> CAST(x AS DOUBLE))))
            * sqrt(list_dot_product(q.qv, q.qv))),
         3) AS cosine
FROM embeddings e CROSS JOIN q
WHERE e.vec_id <> 0
ORDER BY cosine DESC, vec_id
LIMIT 20
""")

# LSH-bucketed ANN: bucket by the sign pattern of 8 REAL random hyperplanes
# (seeded Gaussian, generated once here and inlined as identical literals in
# both dialects — recall vs the brute-force twin is asserted in
# tests/test_ann_recall.py).  Embedding dim is 64 (TESTDATA.md).
import random as _random

_EMB_DIM = 64
_rng = _random.Random(20260817)
_PLANES = [[round(_rng.gauss(0.0, 1.0), 4) for _ in range(_EMB_DIM)]
           for _ in range(8)]


def _dot_plane_spark(plane: list) -> str:
    lit = "array(" + ", ".join(f"{v}D" for v in plane) + ")"
    return ("aggregate(zip_with(embedding, " + lit +
            ", (x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), "
            "(a, v) -> a + v)")


def _dot_plane_duck(plane: list) -> str:
    lit = "[" + ", ".join(str(v) for v in plane) + "]::DOUBLE[]"
    return ("list_dot_product(list_transform(embedding, "
            "x -> CAST(x AS DOUBLE)), " + lit + ")")


def _sdot(a, b):
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")


def _ddot(a, b):
    return f"list_dot_product({a}, {b})"


_ANN_BUCKET_EXPR = " + ".join(
    "(CASE WHEN %s > 0 THEN %d ELSE 0 END)"
    % (_dot_plane_spark(_PLANES[b]), 1 << b)
    for b in range(8)
)
_ANN_BUCKET_EXPR_DUCK = " + ".join(
    "(CASE WHEN %s > 0 THEN %d ELSE 0 END)"
    % (_dot_plane_duck(_PLANES[b]), 1 << b)
    for b in range(8)
)
_q("ann_lsh_buckets", f"""
SELECT CAST({_ANN_BUCKET_EXPR} AS BIGINT) AS bucket,
       count(*) AS n_vecs, min(vec_id) AS min_vec
FROM embeddings
GROUP BY 1
""", f"""
SELECT CAST({_ANN_BUCKET_EXPR_DUCK} AS BIGINT) AS bucket,
       count(*) AS n_vecs, min(vec_id) AS min_vec
FROM embeddings
GROUP BY 1
""")

# Embedding-cosine near-dup dedup: BANDED LSH prefilter (2 bands × 4 random
# hyperplanes) defuses the O(n^2) pair space — at 100 TB the self-join
# shuffles on (band, bucket) so each task only compares within one bucket,
# and the band union drives recall at near-dup similarity to
# 1-(1-p^4)^2 ≈ 0.95 for cos≥0.98 (asserted with planted near-dups in
# tests/test_ann_recall.py).  Exact cosine verifies candidates.


def _band_expr(mk_dot, planes):
    return " + ".join(
        "(CASE WHEN %s > 0 THEN %d ELSE 0 END)" % (mk_dot(p), 1 << i)
        for i, p in enumerate(planes))


def _near_dup_sql(mk_dot_plane, dot, to_double):
    band0 = _band_expr(mk_dot_plane, _PLANES[:4])
    band1 = _band_expr(mk_dot_plane, _PLANES[4:])
    # norms factor out of the pair loop: one sqrt per VECTOR in the CTE,
    # not three aggregates per PAIR (measured 3× on the bench corpus)
    cos = f"{dot('a.v', 'c.v')} / (a.nrm * c.nrm)"
    return f"""
WITH b AS (
  SELECT vec_id, label, v, sqrt({dot('v', 'v')}) AS nrm,
         CAST({band0} AS BIGINT) AS bucket0,
         CAST({band1} AS BIGINT) AS bucket1
  FROM (SELECT vec_id, label, embedding, {to_double} AS v FROM embeddings)
), pairs AS (
  SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, {cos} AS cos
  FROM b a JOIN b c ON a.bucket0 = c.bucket0 AND a.vec_id < c.vec_id
  UNION
  SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, {cos} AS cos
  FROM b a JOIN b c ON a.bucket1 = c.bucket1 AND a.vec_id < c.vec_id
)
SELECT vec_a, vec_b, round(cos, 3) AS cosine
FROM pairs WHERE cos >= 0.3
ORDER BY vec_a, vec_b
"""


_q("dedup_embedding_cosine",
   _near_dup_sql(_dot_plane_spark, _sdot,
                 "transform(embedding, x -> CAST(x AS DOUBLE))"),
   _near_dup_sql(_dot_plane_duck, _ddot,
                 "list_transform(embedding, x -> CAST(x AS DOUBLE))"))

# IVF ANN with SAMPLED centroids: the first 16 vectors are the coarse
# codebook (a deterministic sample standing in for one k-means pass), every
# vector is assigned to its nearest centroid by cosine (narrow n×16
# broadcast pass — scale-safe), and the query multi-probes its 2 nearest
# cells.  At 100 TB the table is written partitioned by `cell`, so the probe
# is a partition-pruned scan of 2/16 cells.  Recall vs brute force is
# asserted in tests/test_ann_recall.py.
_N_CENTROIDS = 16
_N_PROBE = 2


def _ivf_sql(dot, to_double):
    return f"""
WITH vecs AS (
  SELECT vec_id, label, v, sqrt({dot('v', 'v')}) AS nrm
  FROM (SELECT vec_id, label, {to_double} AS v FROM embeddings)
), cent AS (
  SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
  FROM vecs WHERE vec_id < {_N_CENTROIDS}
), scored AS (
  SELECT vec_id, label, v, nrm, cent_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, cent_id) AS rn
  FROM (
    SELECT t.vec_id, t.label, t.v, t.nrm, c.cent_id,
           {dot('t.v', 'c.cv')} / (t.nrm * c.cnrm) AS cos
    FROM vecs t CROSS JOIN cent c
  )
), cells AS (
  SELECT vec_id, label, v, nrm, cent_id AS cell FROM scored WHERE rn = 1
), qprobe AS (
  SELECT cent_id AS cell FROM scored WHERE vec_id = 0 AND rn <= {_N_PROBE}
), q AS (
  SELECT v AS qv, nrm AS qnrm FROM vecs WHERE vec_id = 0
)
SELECT c.vec_id, c.label,
       round({dot('c.v', 'q.qv')} / (c.nrm * q.qnrm), 3) AS cosine
FROM cells c JOIN qprobe p ON c.cell = p.cell CROSS JOIN q
WHERE c.vec_id <> 0
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


_q("ann_ivf_topk",
   _ivf_sql(_sdot, "transform(embedding, x -> CAST(x AS DOUBLE))"),
   _ivf_sql(_ddot, "list_transform(embedding, x -> CAST(x AS DOUBLE))"))

# IVF with a REAL k-means codebook: 3 unrolled Lloyd iterations refine the
# sampled seed above (assign = the same narrow n×16 broadcast pass;
# re-center = one GROUP BY cell with 64 per-dimension avg() columns —
# map-side partial agg, no explode, no collect).  Centroid components are
# rounded to 6 decimals so the FP summation order of avg() can't flip an
# assignment between Spark and DuckDB — the whole training loop is plain
# SQL in BOTH dialects, so this iterative algorithm still gets the full
# three-gate oracle.  At 100 TB: train on a sampled partition (centroids
# are corpus statistics), write the table partitioned by `cell`, and the
# probe stays a partition-pruned scan; each Lloyd pass is one broadcast
# projection + one 16-group aggregate, nothing quadratic.  Codebook
# quality vs the sampled stand-in is asserted in tests/test_ann_recall.py.
_KM_ITERS = 3


def _avg_vec_spark() -> str:
    return ("array(" + ", ".join(
        f"round(avg(v[{j}]), 6)" for j in range(_EMB_DIM)) + ")")


def _avg_vec_duck() -> str:
    return ("[" + ", ".join(
        f"round(avg(v[{j + 1}]), 6)" for j in range(_EMB_DIM)) + "]")


def _ivf_kmeans_cte(dot, to_double, avg_vec, iters=_KM_ITERS):
    """WITH-clause prefix ending at the final assignment CTE a{iters+1}
    (rows: vec_id, label, v, nrm, cent_id, rn) — shared by the top-k
    query below and the codebook-quality measurement in
    tests/test_ann_recall.py."""
    sql = f"""
WITH vecs AS (
  SELECT vec_id, label, v, sqrt({dot('v', 'v')}) AS nrm
  FROM (SELECT vec_id, label, {to_double} AS v FROM embeddings)
), cent0 AS (
  SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
  FROM vecs WHERE vec_id < {_N_CENTROIDS}
)"""
    last = iters + 1          # final pass assigns against trained centroids
    for i in range(1, last + 1):
        sql += f""", a{i} AS (
  SELECT vec_id, label, v, nrm, cent_id, cos,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, cent_id) AS rn
  FROM (
    SELECT t.vec_id, t.label, t.v, t.nrm, c.cent_id,
           {dot('t.v', 'c.cv')} / (t.nrm * c.cnrm) AS cos
    FROM vecs t CROSS JOIN cent{i - 1} c
  )
)"""
        if i <= iters:
            sql += f""", cm{i} AS (
  SELECT cent_id, {avg_vec} AS cv
  FROM a{i} WHERE rn = 1 GROUP BY cent_id
), cent{i} AS (
  SELECT cent_id, cv, sqrt({dot('cv', 'cv')}) AS cnrm FROM cm{i}
)"""
    return sql


def _ivf_kmeans_sql(dot, to_double, avg_vec, iters=_KM_ITERS):
    last = iters + 1
    sql = _ivf_kmeans_cte(dot, to_double, avg_vec, iters)
    sql += f""", cells AS (
  SELECT vec_id, label, v, nrm, cent_id AS cell FROM a{last} WHERE rn = 1
), qprobe AS (
  SELECT cent_id AS cell FROM a{last} WHERE vec_id = 0 AND rn <= {_N_PROBE}
), q AS (
  SELECT v AS qv, nrm AS qnrm FROM vecs WHERE vec_id = 0
)
SELECT c.vec_id, c.label,
       round({dot('c.v', 'q.qv')} / (c.nrm * q.qnrm), 3) AS cosine
FROM cells c JOIN qprobe p ON c.cell = p.cell CROSS JOIN q
WHERE c.vec_id <> 0
ORDER BY cosine DESC, vec_id
LIMIT 10
"""
    return sql


_q("ann_ivf_kmeans_topk",
   _ivf_kmeans_sql(_sdot, "transform(embedding, x -> CAST(x AS DOUBLE))",
                   _avg_vec_spark()),
   _ivf_kmeans_sql(_ddot,
                   "list_transform(embedding, x -> CAST(x AS DOUBLE))",
                   _avg_vec_duck()))

# Product-quantization ANN (Jégou et al. 2011): split the 64-dim space
# into 4 subspaces of 16 dims, train a 16-centroid codebook per
# subspace (2 Lloyd iterations, same rounded-avg determinism trick as
# ann_ivf_kmeans_topk), encode every vector as 4 one-byte codes, and
# answer the query with ADC — sum over subspaces of the exact
# ||q_sub − centroid(code)||², computed once per (subspace, centroid)
# pair (a 64-row lookup) and joined to the codes.  The whole trainer +
# encoder + query is plain SQL in BOTH dialects, so this iterative
# compression pipeline gets the full three-gate oracle.  At 100 TB the
# codes table is 4 bytes/vector (256× smaller than the floats), the
# lookup join is a 64-row broadcast, and training reads a sample — the
# standard billion-scale recipe.  Recall vs brute force is asserted in
# tests/test_ann_recall.py.
_PQ_M = 8          # subspaces
_PQ_K = 16         # centroids per subspace (32-bit codes)
_PQ_DIM = _EMB_DIM // _PQ_M
_PQ_ITERS = 2
_PQ_SHORTLIST = 100  # ADC shortlist before the exact re-rank
# (measured at sf0.01: shortlist 50 → recall@10 0.8, 100 → 1.0; at scale
# the shortlist/corpus ratio shrinks to ~1e-7 — re-rank cost is fixed)


def _pq_sql(dot, to_double, avg_vec_fn, slice_fn):
    """slice_fn(col, s) → SQL for subspace s of a 64-dim double array;
    avg_vec_fn(dim) → per-dimension rounded avg array constructor."""
    d2 = lambda a, b: (f"({dot(a, a)} - 2 * {dot(a, b)}"  # noqa: E731
                       f" + {dot(b, b)})")
    parts = [f"""
WITH vecs AS (
  SELECT vec_id, label, {to_double} AS v FROM embeddings
)"""]
    for s in range(_PQ_M):
        parts.append(f""", sub{s} AS (
  SELECT vec_id, label, {slice_fn('v', s)} AS sv FROM vecs
), c{s}_0 AS (
  SELECT vec_id AS cent_id, sv AS cv FROM sub{s}
  WHERE vec_id < {_PQ_K}
)""")
        last = _PQ_ITERS + 1
        for i in range(1, last + 1):
            parts.append(f""", a{s}_{i} AS (
  SELECT vec_id, label, sv, cent_id, dist,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist, cent_id) AS rn
  FROM (
    SELECT t.vec_id, t.label, t.sv, c.cent_id,
           {d2('t.sv', 'c.cv')} AS dist
    FROM sub{s} t CROSS JOIN c{s}_{i - 1} c
  )
)""")
            if i <= _PQ_ITERS:
                parts.append(f""", c{s}_{i} AS (
  SELECT cent_id, {avg_vec_fn(_PQ_DIM)} AS cv
  FROM a{s}_{i} WHERE rn = 1 GROUP BY cent_id
)""")
    last = _PQ_ITERS + 1
    # per-subspace codes and the query's distance lookup table
    code_joins = " JOIN ".join(
        f"(SELECT vec_id, label, cent_id AS code{s} FROM a{s}_{last} "
        f"WHERE rn = 1) e{s}"
        + ("" if s == 0 else f" ON e0.vec_id = e{s}.vec_id")
        for s in range(_PQ_M))
    lut_union = " UNION ALL ".join(
        f"SELECT {s} AS sub, c.cent_id, "
        f"{d2('q.sv', 'c.cv')} AS qdist "
        f"FROM c{s}_{last - 1} c CROSS JOIN "
        f"(SELECT sv FROM sub{s} WHERE vec_id = 0) q"
        for s in range(_PQ_M))
    parts.append(f""", codes AS (
  SELECT e0.vec_id, e0.label, {', '.join(
      f'e{s}.code{s}' for s in range(_PQ_M))}
  FROM {code_joins}
), lut AS (
  {lut_union}
), shortlist AS (
  SELECT c.vec_id, c.label,
         round({' + '.join(
             f'l{s}.qdist' for s in range(_PQ_M))}, 4) AS adc_dist
  FROM codes c
  {''.join(
      f" JOIN lut l{s} ON l{s}.sub = {s} AND l{s}.cent_id = c.code{s}"
      for s in range(_PQ_M))}
  WHERE c.vec_id <> 0
  ORDER BY adc_dist, vec_id
  LIMIT {_PQ_SHORTLIST}
)
SELECT s.vec_id, s.label, s.adc_dist,
       round({d2('t.v', 'q.qv')}, 4) AS l2_dist
FROM shortlist s
JOIN vecs t ON t.vec_id = s.vec_id
CROSS JOIN (SELECT v AS qv FROM vecs WHERE vec_id = 0) q
ORDER BY l2_dist, s.vec_id
LIMIT 10
""")
    return "".join(parts)


def _pq_slice_spark(col, s):
    return f"slice({col}, {s * _PQ_DIM + 1}, {_PQ_DIM})"


def _pq_slice_duck(col, s):
    return f"list_slice({col}, {s * _PQ_DIM + 1}, {(s + 1) * _PQ_DIM})"


def _pq_avg_spark(dim):
    return ("array(" + ", ".join(
        f"round(avg(sv[{j}]), 6)" for j in range(dim)) + ")")


def _pq_avg_duck(dim):
    return ("[" + ", ".join(
        f"round(avg(sv[{j + 1}]), 6)" for j in range(dim)) + "]")


_q("ann_pq_adc_topk",
   _pq_sql(_sdot, "transform(embedding, x -> CAST(x AS DOUBLE))",
           _pq_avg_spark, _pq_slice_spark),
   _pq_sql(_ddot, "list_transform(embedding, x -> CAST(x AS DOUBLE))",
           _pq_avg_duck, _pq_slice_duck))

# ---------------------------------------------------------------------------
# text analysis family

# Rabin-Karp-style rolling polynomial hash: acc = (acc*31 + byte) mod p.
# Streaming-friendly (a k-char window variant drops the leading term with
# a precomputed 31^k) — here the full-document hash doubles as an exact
# dedup fingerprint computable without materializing the text twice.
_q("text_rolling_hash", """
SELECT doc_id,
       aggregate(transform(split(text, ''), ch -> ascii(ch)),
                 CAST(0 AS BIGINT),
                 (acc, x) -> (acc * 31 + x) % 1000000007) AS rhash
FROM documents
""", """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split_regex(text, ''),
                                     ch -> CAST(ascii(ch) AS BIGINT))),
         (acc, x) -> (acc * 31 + x) % 1000000007) AS rhash
FROM documents
""")

_q("text_token_count", """
SELECT doc_id,
       CAST(size(split(trim(text), ' +')) AS BIGINT) AS ws_tokens,
       CAST(size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]',
                                    0)) AS BIGINT) AS bpe_ish_tokens
FROM documents
""", """
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT)
         AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
            AS BIGINT) AS bpe_ish_tokens
FROM documents
""")

# UNPIVOT (melt) — wide measure columns to long (measure, val) form, the
# standard reshape before per-measure stats; same SQL text parses in both
# engines.  DECIMAL sums make the aggregate order-independent, so the
# salted/partial/plain plans all hash-match.
_q("lineitem_unpivot_measures", """
SELECT measure,
       CAST(round(sum(CAST(val AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
FROM lineitem UNPIVOT (val FOR measure IN
  (l_quantity, l_extendedprice, l_discount, l_tax))
GROUP BY measure
""")

# skew-defused aggregation — the two-level salted GROUP BY used when one
# key dominates (a viral doc, a bot user): partial agg on (key, salt)
# spreads the hot key over 16 reducers, the tiny re-agg collapses it.
# DECIMAL partials make the result bit-identical to the plain GROUP BY
# oracle regardless of addition order.
_q("events_salted_agg", """
SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
       CAST(round(sum(v), 2) AS DOUBLE) AS total_value
FROM (
  SELECT event_type, pmod(hash(event_id), 16) AS salt,
         count(*) AS n, sum(CAST(value AS DECIMAL(18,6))) AS v
  FROM events
  GROUP BY event_type, pmod(hash(event_id), 16)
)
GROUP BY event_type
""", """
SELECT event_type, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS total_value
FROM events GROUP BY event_type
""")

# corpus length histogram — integer-division buckets (deterministic across
# engines, unlike float log binning); one hash-group pass, scale-free.
_q("text_length_histogram", """
SELECT CAST(size(split(text, ' ')) DIV 10 AS BIGINT) AS bucket,
       count(*) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY size(split(text, ' ')) DIV 10
""", """
SELECT CAST(len(string_split(text, ' ')) // 10 AS BIGINT) AS bucket,
       count(*) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY len(string_split(text, ' ')) // 10
""")

_q("text_quality_score", """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_m,
       round(CAST(size(split(text, ' ')) AS DOUBLE)
             / (length(text) + 1), 4) AS word_density,
       round(CAST(length(regexp_replace(text, '[a-z ]', '')) AS DOUBLE)
             / (length(text) + 1), 4) AS nonalpha_ratio
FROM documents
""", """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_m,
       round(CAST(len(string_split(text, ' ')) AS DOUBLE)
             / (length(text) + 1), 4) AS word_density,
       round(CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE)
             / (length(text) + 1), 4) AS nonalpha_ratio
FROM documents
""")

_q("text_lang_id", """
SELECT doc_id, lang AS labeled,
       CASE WHEN CAST(size(split(concat(' ', text, ' '), ' table | row | value '))
                 AS BIGINT) - 1 > 0 THEN 'en' ELSE 'unk' END AS detected
FROM documents
""", """
SELECT doc_id, lang AS labeled,
       CASE WHEN CAST(len(regexp_split_to_array(concat(' ', text, ' '),
                 ' table | row | value ')) AS BIGINT) - 1 > 0
            THEN 'en' ELSE 'unk' END AS detected
FROM documents
""")

_q("text_fingerprint", """
SELECT doc_id,
       md5(lower(regexp_replace(text, '\\\\s+', ' '))) AS fingerprint
FROM documents
""", """
SELECT doc_id,
       md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
""")

# exact interpolated quantiles (the deterministic twin of the sketch path:
# at 100 TB approx_percentile serves the same query shape with bounded
# error; the exact form is the oracle-checkable contract)
_q("events_value_quantiles", """
SELECT event_type,
       round(percentile(value, 0.5), 4) AS p50,
       round(percentile(value, 0.9), 4) AS p90,
       round(percentile(value, 0.99), 4) AS p99,
       count(*) AS n
FROM events GROUP BY event_type
""", """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99,
       count(*) AS n
FROM events GROUP BY event_type
""")

# PIVOT — Spark's native relational pivot operator; the oracle re-derives
# the same shape with conditional aggregates
_q("events_pivot_type_counts", """
SELECT user_id,
       coalesce(click, 0) AS n_click,
       coalesce(view, 0) AS n_view,
       coalesce(error, 0) AS n_error
FROM (SELECT user_id, event_type FROM events WHERE user_id < 40)
PIVOT (count(*) FOR event_type IN ('click' AS click, 'view' AS view,
                                   'error' AS error))
""", """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_click,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_error
FROM events WHERE user_id < 40
GROUP BY user_id
""")

# deterministic hash sampling — reproducible corpus subsets (TABLESAMPLE is
# engine-random; a hash gate is stable across engines, runs, and restarts)
_q("documents_hash_sample", """
SELECT doc_id, lang
FROM documents
WHERE substr(md5(CAST(doc_id AS STRING)), 1, 1) = '0'
""", """
SELECT doc_id, lang
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
""")

# multi-level rollup (hypertable-style hour→day→total aggregation in one
# pass — GROUPING SETS shuffle once, not once per level)
_q("events_hourly_rollup", """
SELECT coalesce(date_format(date_trunc('day', ts), 'yyyy-MM-dd'), 'ALL')
         AS day,
       coalesce(CAST(hour(ts) AS BIGINT), -1) AS hr,
       CAST(grouping(date_trunc('day', ts)) * 2
            + grouping(hour(ts)) AS BIGINT) AS lvl,
       count(*) AS n, round(sum(value), 2) AS total
FROM events WHERE user_id < 40
GROUP BY ROLLUP(date_trunc('day', ts), hour(ts))
""", """
SELECT coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
       coalesce(CAST(hour(ts) AS BIGINT), -1) AS hr,
       CAST(grouping(date_trunc('day', ts)) * 2
            + grouping(hour(ts)) AS BIGINT) AS lvl,
       count(*) AS n, round(sum(value), 2) AS total
FROM events WHERE user_id < 40
GROUP BY ROLLUP(date_trunc('day', ts), hour(ts))
""")

# ---------------------------------------------------------------------------
# AS-OF JOIN — an operator Spark lacks natively, composed scale-right:
# union the two tagged streams, one shuffle on the key, and a running
# last_value(IGNORE NULLS) ordered by (ts, side) carries the most recent
# right-side row forward onto each left row.  No inequality join, no
# BroadcastNestedLoop — the single window shuffle is the whole cost.
# The DuckDB oracle uses its NATIVE ASOF JOIN, so two entirely different
# algorithms must agree row-for-row.
_q("asof_join_last_error", """
WITH err AS (
  -- one row per (user, ts): two errors sharing a timestamp would make
  -- both the window's last_value and DuckDB's ASOF pick arbitrarily
  SELECT user_id, ts, max(event_id) AS err_id
  FROM events WHERE event_type = 'error' AND user_id < 40
  GROUP BY user_id, ts
), clicks AS (
  SELECT user_id, ts, event_id
  FROM events WHERE event_type = 'click' AND user_id < 40
), tagged AS (
  SELECT user_id, ts, err_id, CAST(NULL AS BIGINT) AS event_id, 0 AS side
  FROM err
  UNION ALL
  SELECT user_id, ts, CAST(NULL AS BIGINT) AS err_id, event_id, 1 AS side
  FROM clicks
), filled AS (
  SELECT user_id, ts, event_id, side,
         last_value(err_id, true) OVER (
           PARTITION BY user_id ORDER BY ts, side
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_err_id
  FROM tagged
)
SELECT event_id, user_id, last_err_id
FROM filled WHERE side = 1
""", """
SELECT c.event_id, c.user_id, e.err_id AS last_err_id
FROM (SELECT user_id, ts, event_id
      FROM events WHERE event_type = 'click' AND user_id < 40) c
ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS err_id
                FROM events WHERE event_type = 'error' AND user_id < 40
                GROUP BY user_id, ts) e
  ON c.user_id = e.user_id AND c.ts >= e.ts
""")

# RANGE JOIN — events within [anchor, anchor + 1h) per user, composed as
# a BINNED equi-join: ranges explode into their covered hour bins, events
# join on (user_id, hour_bin), the residual range predicate filters — the
# plan is Generate → hash join, never an inequality BNL.  At 100 TB the
# bin width trades explode factor against join selectivity.  The DuckDB
# oracle runs the plain inequality join, so the binned decomposition is
# verified against the naive semantics.
_q("range_join_follow_events", """
WITH anchors AS (
  SELECT event_id AS anchor_id, user_id, ts AS t0,
         ts + INTERVAL 1 HOUR AS t1
  FROM events WHERE event_type = 'error' AND user_id < 40
), bins AS (
  SELECT anchor_id, user_id, t0, t1, b.bin
  FROM anchors
  LATERAL VIEW explode(sequence(date_trunc('hour', t0),
                                date_trunc('hour', t1),
                                INTERVAL 1 HOUR)) b AS bin
), ev AS (
  SELECT user_id, ts, date_trunc('hour', ts) AS bin
  FROM events WHERE user_id < 40
)
SELECT b.anchor_id, count(ev.ts) AS n_follow
FROM bins b
LEFT JOIN ev ON ev.user_id = b.user_id AND ev.bin = b.bin
            AND ev.ts >= b.t0 AND ev.ts < b.t1
GROUP BY b.anchor_id
""", """
SELECT a.anchor_id, count(ev.ts) AS n_follow
FROM (SELECT event_id AS anchor_id, user_id, ts AS t0,
             ts + INTERVAL 1 HOUR AS t1
      FROM events WHERE event_type = 'error' AND user_id < 40) a
LEFT JOIN (SELECT user_id, ts FROM events WHERE user_id < 40) ev
  ON ev.user_id = a.user_id AND ev.ts >= a.t0 AND ev.ts < a.t1
GROUP BY a.anchor_id
""")

# ---------------------------------------------------------------------------
# the composed cleaning recipe a training-data pipeline actually runs:
# quality gate → exact-dedup keeper → per-language corpus stats.
# Single declarative query: Catalyst fuses the gate into the scan, the
# dedup is one hash aggregate, the stats a second — two shuffles total.

_q("corpus_clean_stats", """
WITH gated AS (
  SELECT doc_id, lang, text,
         CAST(length(text) AS BIGINT) AS n_chars_m,
         CAST(size(split(trim(text), ' +')) AS BIGINT) AS n_tokens
  FROM documents
  WHERE length(text) >= 80
    AND CAST(size(split(text, ' ')) AS DOUBLE) / (length(text) + 1) > 0.05
), kept AS (
  SELECT md5(text) AS fp, min(doc_id) AS keeper,
         min(lang) AS lang,
         min(n_chars_m) AS n_chars_m, min(n_tokens) AS n_tokens
  FROM gated GROUP BY md5(text)
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(n_chars_m), 2) AS avg_chars
FROM kept GROUP BY lang
""", """
WITH gated AS (
  SELECT doc_id, lang, text,
         CAST(length(text) AS BIGINT) AS n_chars_m,
         CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT)
           AS n_tokens
  FROM documents
  WHERE length(text) >= 80
    AND CAST(len(string_split(text, ' ')) AS DOUBLE) / (length(text) + 1)
        > 0.05
), kept AS (
  SELECT md5(text) AS fp, min(doc_id) AS keeper,
         min(lang) AS lang,
         min(n_chars_m) AS n_chars_m, min(n_tokens) AS n_tokens
  FROM gated GROUP BY md5(text)
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(n_chars_m), 2) AS avg_chars
FROM kept GROUP BY lang
""")

# ---------------------------------------------------------------------------
# streaming's batch twin: tumbling-window aggregation over the event stream

_q("events_tumbling_window", """
SELECT date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss')
         AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""", """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""")

# ---------------------------------------------------------------------------
# extraction as SQL (the C2 coalesce shape on synthesized html) — the full
# engine path is the non-SQL flagship below
_WRAP = """
SELECT doc_id,
       concat('<html><head><title>', substr(text, 1, 40),
              '</title><meta property="og:title" content="', substr(text, 1, 60),
              '"><meta name="description" content="', substr(text, 1, 80),
              '"></head><body><p>', text, '</p></body></html>') AS html
FROM documents
"""
_q("og_title_regex_extract", f"""
WITH pages AS ({_WRAP})
SELECT doc_id,
       regexp_extract(html, 'property="og:title" content="([^"]*)"', 1)
         AS og_title,
       coalesce(
         nullif(regexp_extract(html,
                'property="og:title" content="([^"]*)"', 1), ''),
         nullif(regexp_extract(html, '<title>([^<]*)</title>', 1), ''))
         AS headline
FROM pages
""")


# ---------------------------------------------------------------------------
# duplicate-cluster resolution: connected components over the LSH candidate
# graph — the iterative step between "pairs found" and "one keeper per
# duplicate CLUSTER" (pairwise keepers under-merge transitive duplicates).
# Spark side: distributed min-label propagation (each round = one join +
# one aggregate, converges in O(graph diameter) rounds — the classic
# MapReduce CC).  Oracle: DuckDB RECURSIVE CTE transitive closure — a
# completely different algorithm that must agree row-for-row.

_CC_EDGES_SQL = (", sig AS (%s)\n"
                 "SELECT a.doc_id AS src, b.doc_id AS dst\n"
                 "FROM sig a JOIN sig b\n"
                 "  ON a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id"
                 % _MINHASH_BODY)


def _cc_star_contraction(spark: SparkSession, edges: DataFrame,
                         max_rounds: int = 50):
    """Large-star/small-star alternation (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14 — public literature).
    Converges in O(log² n) rounds even on chain/skewed components where
    plain min-label propagation needs O(diameter) rounds, and every
    round is bucket-local: two groupBy+join pairs, no all-pairs.

    Lineage is truncated each round — ``checkpoint()`` to reliable
    storage when a checkpoint dir is configured (cluster mode), else
    ``localCheckpoint`` (local/test).  Returns (star_edges, rounds):
    at fixpoint the edge set is a star forest (node → component min).
    """
    from pyspark.sql import functions as F

    use_ckpt = spark.sparkContext.getCheckpointDir() is not None

    def persist(df: DataFrame) -> DataFrame:
        return df.checkpoint() if use_ckpt else df.localCheckpoint()

    def sig(df: DataFrame) -> tuple:
        # decimal sum: a long sum of xxhash64 values overflows ANSI mode
        r = df.agg(F.count("*").alias("n"),
                   F.coalesce(F.sum(F.xxhash64("src", "dst")
                                    .cast("decimal(38,0)")),
                              F.lit(0)).alias("h")).collect()[0]
        return (r["n"], r["h"])

    # canonical direction src > dst, self-loops dropped
    e = persist(edges.select(F.greatest("src", "dst").alias("src"),
                             F.least("src", "dst").alias("dst"))
                .where(F.col("src") != F.col("dst")).distinct())
    prev_sig = sig(e)
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        # large-star: every neighbor v > u links to m = min(Γ(u) ∪ {u})
        sym = e.union(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        m_of = (sym.groupBy("src").agg(F.min("dst").alias("mn"))
                .select("src", F.least("mn", "src").alias("m")))
        large = (sym.join(m_of, "src")
                 .where(F.col("dst") > F.col("src"))
                 .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
                 .union(m_of.select(F.col("src"), F.col("m").alias("dst")))
                 .where(F.col("src") != F.col("dst")).distinct())
        # small-star: smaller neighbors (and u) link to m = min(N⁻(u)∪{u})
        m2 = (large.groupBy("src").agg(F.min("dst").alias("mn"))
              .select("src", F.least("mn", "src").alias("m")))
        small = (large.join(m2, "src")
                 .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
                 .union(m2.select(F.col("src"), F.col("m").alias("dst")))
                 .where(F.col("src") != F.col("dst")).distinct())
        e = persist(small)
        cur_sig = sig(e)
        if cur_sig == prev_sig:
            break
        prev_sig = cur_sig
    return e, rounds


def _connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    load_views(spark, sf_dir)
    edges = spark.sql("WITH docs AS (SELECT doc_id, split(text, ' ') AS w "
                      "FROM documents), shingles AS (SELECT doc_id, t.g "
                      "FROM docs LATERAL VIEW explode(CASE WHEN size(w) >= 3 "
                      "THEN zip_with(slice(w, 1, size(w) - 2), "
                      "zip_with(slice(w, 2, size(w) - 2), "
                      "slice(w, 3, size(w) - 2), (y, z) -> "
                      "concat(y, ' ', z)), (x, yz) -> concat(x, ' ', yz)) "
                      "ELSE array() END) t AS g)" + _CC_EDGES_SQL)
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node"))).distinct())
    stars, rounds = _cc_star_contraction(spark, edges)
    _connected_components.last_rounds = rounds
    return (nodes.join(stars.withColumnRenamed("src", "node"),
                       "node", "left")
            .select(F.col("node").alias("doc_id"),
                    F.coalesce(F.col("dst"), F.col("node"))
                    .alias("component")))


_connected_components.last_rounds = 0


# transitive closure + min-reachable label per node
_CC_DUCK = ("WITH RECURSIVE docs AS (\n"
            "  SELECT doc_id, string_split(text, ' ') AS w FROM documents\n"
            "), shingles AS (\n"
            "  SELECT doc_id,\n"
            "         unnest(CASE WHEN len(w) >= 3\n"
            "                THEN list_transform(generate_series(1, len(w) - 2),\n"
            "                     i -> concat(w[i], ' ', w[i + 1], ' ', w[i + 2]))\n"
            "                ELSE CAST([] AS VARCHAR[]) END) AS g\n"
            "  FROM docs\n"
            ")" + _CC_EDGES_SQL.replace(
                "SELECT a.doc_id AS src",
                ", edges AS (SELECT a.doc_id AS src", 1).replace(
                "AND a.doc_id < b.doc_id",
                "AND a.doc_id < b.doc_id)", 1) + ",\n"
            "sym AS (SELECT src, dst FROM edges\n"
            "        UNION SELECT dst, src FROM edges),\n"
            "walk(node, reach) AS (\n"
            "  SELECT src, src FROM sym\n"
            "  UNION\n"
            "  SELECT w.node, s.dst FROM walk w JOIN sym s ON s.src = w.reach\n"
            ")\n"
            "SELECT node AS doc_id, min(reach) AS component\n"
            "FROM walk GROUP BY node")

QUERIES["dedup_connected_components"] = (_connected_components, _CC_DUCK)

# TF-IDF top terms per document — the standard relevance/keyword stage of
# a text pipeline.  Document frequency comes from the already-distinct
# (doc_id, word) tf table (count per word), NOT count(DISTINCT doc_id)
# over raw tokens — same answer, one less shuffle and no distinct-expand
# at 10^12 docs.  Rank orders by the score rounded to 6dp with the word
# as tiebreak, so both engines agree on ties down to libm noise.
_TFIDF = """
WITH words AS (
  SELECT doc_id, word FROM (%s) WHERE word <> ''
), tf AS (
  SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word
), idf AS (
  SELECT word, count(*) AS df FROM tf GROUP BY word
), n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, word, rnk, tfidf FROM (
  SELECT tf.doc_id AS doc_id, tf.word AS word,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY round(tf.tf * ln((n.n_docs + 1.0) / (idf.df + 1.0)), 6)
                      DESC,
                    tf.word) AS rnk,
         round(tf.tf * ln((n.n_docs + 1.0) / (idf.df + 1.0)), 4) AS tfidf
  FROM tf JOIN idf ON tf.word = idf.word CROSS JOIN n
  WHERE tf.doc_id < 100
)
WHERE rnk <= 3
"""
_q("tfidf_top_terms",
   _TFIDF % ("SELECT doc_id, t.word AS word FROM documents "
             "LATERAL VIEW explode(split(text, ' ')) t AS word"),
   _TFIDF % ("SELECT doc_id, unnest(string_split(text, ' ')) AS word "
             "FROM documents"))

# stratified deterministic sampling — per-language rates via an md5 hash
# gate (hex-prefix threshold ≈ rate), reproducible across engines, runs,
# restarts, and cluster sizes; the per-row form (not a count summary) is
# what feeds a training-mix job downstream
_STRAT = """
SELECT doc_id, lang
FROM documents
WHERE substr(md5(CAST(doc_id AS {str_t})), 1, 2)
      < CASE lang WHEN 'en' THEN '80' WHEN 'de' THEN '33' ELSE '1a' END
"""
_q("documents_stratified_sample",
   _STRAT.format(str_t="STRING"), _STRAT.format(str_t="VARCHAR"))

# per-label embedding centroids (one k-means / class-prototype pass) in
# long form (label, pos) — a single shuffle on the group keys; the wide
# array is reassembled only at consumer time, so the agg state per key is
# one double, not a 64-float array
_q("embedding_centroids", """
SELECT label, p.pos AS pos,
       round(avg(CAST(p.val AS DOUBLE)), 4) AS mean_val,
       count(*) AS n_vecs
FROM embeddings LATERAL VIEW posexplode(embedding) p AS pos, val
GROUP BY label, p.pos
""", """
SELECT label, CAST(ord - 1 AS INT) AS pos,
       round(avg(CAST(val AS DOUBLE)), 4) AS mean_val,
       count(*) AS n_vecs
FROM (SELECT label, unnest(embedding) AS val,
             unnest(generate_series(1, len(embedding))) AS ord
      FROM embeddings)
GROUP BY label, pos
""")

# unigram LM quality score (the CCNet/KenLM-style filter signal): each
# document's mean token log-probability under the corpus unigram
# distribution.  Shuffles once on word (freq join — broadcastable in
# practice) and once on doc_id; the 1-row token-total agg broadcasts.
_LM = """
WITH words AS (
  SELECT doc_id, word FROM (%s) WHERE word <> ''
), freq AS (
  SELECT word, count(*) AS wc FROM words GROUP BY word
), tot AS (SELECT sum(wc) AS n_tok FROM freq)
SELECT w.doc_id AS doc_id,
       round(avg(ln(CAST(f.wc AS DOUBLE) / CAST(t.n_tok AS DOUBLE))), 4)
         AS avg_logprob,
       count(*) AS n_tokens
FROM words w JOIN freq f ON w.word = f.word CROSS JOIN tot t
WHERE w.doc_id < 200
GROUP BY w.doc_id
"""
_q("text_lm_logprob",
   _LM % ("SELECT doc_id, t.word AS word FROM documents "
          "LATERAL VIEW explode(split(text, ' ')) t AS word"),
   _LM % ("SELECT doc_id, unnest(string_split(text, ' ')) AS word "
          "FROM documents"))

# n-gram repetition ratio (the Gopher/MassiveText repetition rule):
# fraction of a document's 3-gram occurrences that are repeats of an
# earlier 3-gram in the same document — pure per-doc aggregation over
# the shared shingle CTE, no joins at all
_REP_BODY = """
SELECT doc_id,
       round(1.0 - CAST(count(DISTINCT g) AS DOUBLE) / count(*), 4)
         AS rep_ratio,
       count(*) AS n_grams
FROM shingles
GROUP BY doc_id
"""
_q("text_repetition_ratio", _MINHASH_CTE + _REP_BODY,
   _MINHASH_CTE_DUCK + _REP_BODY)

# Gopher quality rules (Rae et al. 2021 "Scaling Language Models", table A1
# subset): word-count bounds, mean-word-length bounds, alphabetic-word
# fraction, and the ≥2-stop-words rule.  Pure per-row projection — no
# shuffle at all, safe at any corpus size.
_q("text_gopher_quality", """
WITH w AS (SELECT doc_id, text, split(text, ' ') AS words FROM documents)
SELECT doc_id,
       CAST(size(words) AS BIGINT) AS n_words,
       round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / size(words), 4) AS mean_word_len,
       round(CAST(size(filter(words, x -> x rlike '^[a-z]+$')) AS DOUBLE)
             / size(words), 4) AS alpha_word_frac,
       CAST(size(array_intersect(words,
            array('the','be','to','of','and','that','have','with','a','in')))
            AS BIGINT) AS n_stop_hits,
       CAST(size(words) BETWEEN 50 AND 100000
            AND CAST(length(replace(text, ' ', '')) AS DOUBLE) / size(words)
                BETWEEN 3 AND 10
            AND size(filter(words, x -> x rlike '^[a-z]+$'))
                >= 0.8 * size(words)
            AND size(array_intersect(words,
                array('the','be','to','of','and','that','have','with','a',
                      'in'))) >= 2
            AS BOOLEAN) AS gopher_pass
FROM w
""", """
WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS words
           FROM documents)
SELECT doc_id,
       CAST(len(words) AS BIGINT) AS n_words,
       round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(words), 4) AS mean_word_len,
       round(CAST(len(list_filter(words,
                x -> regexp_full_match(x, '[a-z]+'))) AS DOUBLE)
             / len(words), 4) AS alpha_word_frac,
       CAST(len(list_intersect(words,
            ['the','be','to','of','and','that','have','with','a','in']))
            AS BIGINT) AS n_stop_hits,
       CAST(len(words) BETWEEN 50 AND 100000
            AND CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(words)
                BETWEEN 3 AND 10
            AND len(list_filter(words, x -> regexp_full_match(x, '[a-z]+')))
                >= 0.8 * len(words)
            AND len(list_intersect(words,
                ['the','be','to','of','and','that','have','with','a','in']))
                >= 2
            AS BOOLEAN) AS gopher_pass
FROM w
""")

# Exact substring-chunk dedup (Lee et al. 2022 "Deduplicating Training Data
# Makes Language Models Better", §exact-substring, at fixed 8-word chunk
# granularity): explode docs into consecutive chunks, find chunks shared by
# >1 document, report per-doc duplicated-chunk fraction.  Two shuffles
# (chunk group-by + chunk equi-join) — no pairwise blow-up; the join key is
# the chunk text itself, so candidate space is bounded by corpus chunk count.
_CHUNK_BODY = """
, dup AS (
  SELECT chunk FROM chunks GROUP BY chunk HAVING count(DISTINCT doc_id) > 1
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(d.chunk) AS BIGINT) AS n_dup_chunks,
       round(CAST(count(d.chunk) AS DOUBLE) / count(*), 4) AS dup_frac
FROM chunks c LEFT JOIN dup d ON c.chunk = d.chunk
GROUP BY c.doc_id
"""
_q("dedup_exact_chunks", """
WITH wd AS (SELECT doc_id, split(text, ' ') AS w FROM documents
            WHERE size(split(text, ' ')) >= 8),
chunks AS (
  SELECT doc_id,
         explode(transform(sequence(1, CAST(size(w) / 8 AS INT)),
                 i -> array_join(slice(w, (i - 1) * 8 + 1, 8), ' ')))
           AS chunk
  FROM wd)
""" + _CHUNK_BODY, """
WITH wd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
            WHERE len(string_split(text, ' ')) >= 8),
ix AS (SELECT doc_id, w, unnest(generate_series(1, len(w) // 8)) AS i
       FROM wd),
chunks AS (
  SELECT doc_id,
         array_to_string(list_slice(w, (i - 1) * 8 + 1, i * 8), ' ')
           AS chunk
  FROM ix)
""" + _CHUNK_BODY)

# Suffix-granularity exact-substring dedup (Lee et al. 2022 §4.1): the
# fixed 8-word grid above misses duplicate passages that start at a
# shifted offset (doc B repeats doc A's sentence 3 words later → no
# grid chunk matches).  Stride-1 sliding windows of 16 words catch a
# duplicated substring at ANY alignment, the DataFrame stand-in for the
# paper's suffix array.  Scale shape: windowing amplifies shuffle rows
# ~16× but each row is (window, doc_id) and the group-by is an exact
# equi-key — at 100 TB the production plan inserts an xxhash64(window)
# pre-pass so only 8-byte keys shuffle (collisions re-verified on the
# surviving <<1% candidates); the string-keyed form here is the
# oracle-parity twin.  DISTINCT per doc first so an internally repeated
# window doesn't self-mark a doc as cross-doc duplicated.
_WIN_BODY = """
, dwin AS (SELECT DISTINCT doc_id, win FROM win),
dup AS (
  SELECT win FROM dwin GROUP BY win HAVING count(*) > 1
)
SELECT d.doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(count(p.win) AS BIGINT) AS n_dup_windows,
       round(CAST(count(p.win) AS DOUBLE) / count(*), 4) AS dup_frac
FROM dwin d LEFT JOIN dup p ON d.win = p.win
GROUP BY d.doc_id
"""
_q("dedup_substring_windows", """
WITH wd AS (SELECT doc_id, split(text, ' ') AS w FROM documents
            WHERE size(split(text, ' ')) >= 16),
win AS (
  SELECT doc_id,
         explode(transform(sequence(1, size(w) - 15),
                 i -> array_join(slice(w, i, 16), ' '))) AS win
  FROM wd)
""" + _WIN_BODY, """
WITH wd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
            WHERE len(string_split(text, ' ')) >= 16),
ix AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 15)) AS i
       FROM wd),
win AS (
  SELECT doc_id, array_to_string(list_slice(w, i, i + 15), ' ') AS win
  FROM ix)
""" + _WIN_BODY)

# The 100 TB shape of the same operator: an xxhash64 pre-pass gates the
# heavy string shuffle.  Windows first group by their 8-byte hash (the
# only full-corpus shuffle moves (bigint, doc_id) rows); only windows
# whose HASH is shared by >1 doc — <<1% of a web corpus — re-shuffle as
# strings for exact verification, so a hash collision can gate a
# candidate in but can never mark a non-duplicate (output bit-identical
# to dedup_substring_windows, which doubles as its DuckDB oracle; the
# identity is also asserted directly in tests/test_substring_dedup.py).
def _substring_windows_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql("""
WITH wd AS (SELECT doc_id, split(text, ' ') AS w FROM documents
            WHERE size(split(text, ' ')) >= 16),
win AS (
  SELECT doc_id,
         explode(transform(sequence(1, size(w) - 15),
                 i -> array_join(slice(w, i, 16), ' '))) AS win
  FROM wd),
dwin AS (SELECT DISTINCT doc_id, win FROM win),
hwin AS (SELECT doc_id, win, xxhash64(win) AS h FROM dwin),
hcand AS (
  SELECT h FROM hwin GROUP BY h HAVING count(DISTINCT doc_id) > 1
),
dup AS (
  SELECT w.win FROM hwin w JOIN hcand c ON w.h = c.h
  GROUP BY w.win HAVING count(*) > 1
)
SELECT d.doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(count(p.win) AS BIGINT) AS n_dup_windows,
       round(CAST(count(p.win) AS DOUBLE) / count(*), 4) AS dup_frac
FROM dwin d LEFT JOIN dup p ON d.win = p.win
GROUP BY d.doc_id
""")


QUERIES["dedup_substring_windows_hashed"] = (
    _substring_windows_hashed,
    # same relation as the string-keyed form — reuse its DuckDB oracle
    QUERIES["dedup_substring_windows"][1])

# Unigram Shannon entropy per document — a standard quality-filter feature
# (low-entropy docs are boilerplate/spam).  Two partial-agg shuffles on
# (doc_id, word) then doc_id; map-side combine keeps both narrow.
_ENTROPY_BODY = """
, cnt AS (SELECT doc_id, word, count(*) AS c FROM tok GROUP BY doc_id, word),
tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY doc_id)
SELECT c.doc_id,
       round(sum(-(CAST(c.c AS DOUBLE) / t.n)
                 * log2(CAST(c.c AS DOUBLE) / t.n)), 4) AS unigram_entropy,
       CAST(t.n AS BIGINT) AS n_tokens
FROM cnt c JOIN tot t ON c.doc_id = t.doc_id
GROUP BY c.doc_id, t.n
"""
_q("text_unigram_entropy",
   "WITH tok AS (SELECT doc_id, t.word AS word FROM documents "
   "LATERAL VIEW explode(split(text, ' ')) t AS word)" + _ENTROPY_BODY,
   "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word "
   "FROM documents)" + _ENTROPY_BODY)

# ---------------------------------------------------------------------------
# non-SQL-expressible: the fused extraction pipeline itself (rows-only check)

def _extract_over_wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .pipeline import extract_spans

    load_views(spark, sf_dir)
    pages = spark.sql(_WRAP)
    docs = pages.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(F.struct(
            F.lit("html").alias("kind"),
            F.col("html").alias("text"),
            F.concat(F.lit("https://synth.example.com/doc/"),
                     F.col("doc_id")).alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        )).alias("spans"),
    )
    out = extract_spans(docs, salt=True)
    return out.select(
        "doc_id", F.explode("spans").alias("span")
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


QUERIES["extract_spans_full"] = (_extract_over_wrapped, None)


def _rotation_order() -> list[str]:
    """Deterministic least-recently-verified rotation.

    The correctness driver snapshots only the FIRST 50 registry entries,
    while the registry holds more — so with a fixed order the tail never
    gets a driver row.  Order queries by the last round in which a
    CORRECTNESS_r*.json row passed all three gates (never/failed first,
    ties broken by registry insertion order).  Each round the driver then
    checks the least-recently-verified 50, so every query gets a fresh
    green row within two rounds.  Inputs are repo-root snapshot files:
    same files → same order, fully deterministic.
    """
    import json
    import re as _re
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    last_green: dict[str, int] = {}
    for snap in sorted(root.glob("CORRECTNESS_r*.json")):
        m = _re.search(r"_r(\d+)", snap.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(snap.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("rows_match") \
                    and row.get("schema_match") is not False \
                    and row.get("hash_match") is not False:
                last_green[name] = max(last_green.get(name, -1), rnd)
    order = list(QUERIES)
    idx = {n: i for i, n in enumerate(order)}
    return sorted(order, key=lambda n: (last_green.get(n, -1), idx[n]))


def spark_queries() -> dict:
    rotated = _rotation_order()
    return {name: QUERIES[name][0] for name in rotated}


def oracle_sqls() -> dict:
    rotated = _rotation_order()
    return {name: QUERIES[name][1] for name in rotated
            if QUERIES[name][1] is not None}
