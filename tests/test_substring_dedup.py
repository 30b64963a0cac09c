"""Suffix-granularity substring dedup (Lee et al. 2022 §4.1): stride-1
sliding windows catch duplicated passages at ANY offset — including the
shifted overlaps the fixed 8-word chunk grid (dedup_exact_chunks)
structurally misses."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from unfurl_spark.operators.queries import QUERIES

SF_BASE = "/root/testdata/sf0.001"


def _link_other_tables(tmp_path):
    # load_views registers every engine table; borrow sf0.001 for the
    # ones this test doesn't shape
    for f in os.listdir(SF_BASE):
        if f.endswith(".parquet") and f != "documents.parquet":
            os.symlink(os.path.join(SF_BASE, f), str(tmp_path / f))


def _mkdocs(tmp_path):
    # doc 2 repeats doc 1's 20-word passage shifted by THREE words:
    # every 8-word grid chunk of the passage straddles a different grid
    # boundary in each doc, so exact-chunk finds nothing; any 16-word
    # stride-1 window inside the passage matches exactly.
    passage = " ".join(f"p{i}" for i in range(20))
    filler_a = " ".join(f"a{i}" for i in range(8))
    filler_b = " ".join(f"b{i}" for i in range(11))
    filler_c = " ".join(f"c{i}" for i in range(9))
    unique = " ".join(f"u{i}" for i in range(40))
    docs = {
        "doc_id": [1, 2, 3],
        "text": [f"{filler_a} {passage} {filler_c}",
                 f"{filler_b} {passage}",
                 unique],
        "lang": ["en"] * 3,
        "source": ["web"] * 3,
        "n_chars": [0, 0, 0],
    }
    pq.write_table(pa.table(docs), str(tmp_path / "documents.parquet"))
    _link_other_tables(tmp_path)
    return str(tmp_path)


@pytest.mark.usefixtures("spark")
def test_shifted_passage_caught_windows_missed_by_grid(spark, tmp_path):
    sf = _mkdocs(tmp_path)
    grid = {r["doc_id"]: r for r in
            QUERIES["dedup_exact_chunks"][0](spark, sf).collect()}
    win = {r["doc_id"]: r for r in
           QUERIES["dedup_substring_windows"][0](spark, sf).collect()}
    # the 8-word grid sees no duplicate chunk (alignment shifted by 3)
    assert grid[1]["n_dup_chunks"] == 0
    assert grid[2]["n_dup_chunks"] == 0
    # stride-1 windows flag the shared passage in both docs:
    # a 20-word passage holds 5 full 16-word windows
    assert win[1]["n_dup_windows"] == 5
    assert win[2]["n_dup_windows"] == 5
    assert win[1]["dup_frac"] > 0
    # the unique doc stays clean
    assert win[3]["n_dup_windows"] == 0


@pytest.mark.usefixtures("spark")
def test_identical_docs_fully_flagged(spark, tmp_path):
    text = " ".join(f"w{i}" for i in range(30))
    docs = {
        "doc_id": [10, 11],
        "text": [text, text],
        "lang": ["en"] * 2,
        "source": ["web"] * 2,
        "n_chars": [0, 0],
    }
    pq.write_table(pa.table(docs), str(tmp_path / "documents.parquet"))
    _link_other_tables(tmp_path)
    win = {r["doc_id"]: r for r in
           QUERIES["dedup_substring_windows"][0](spark, str(tmp_path))
           .collect()}
    for d in (10, 11):
        assert win[d]["n_windows"] == 15        # 30-16+1
        assert win[d]["n_dup_windows"] == 15
        assert win[d]["dup_frac"] == 1.0


@pytest.mark.usefixtures("spark")
def test_hashed_variant_bit_identical(spark, tmp_path):
    """The xxhash64-gated scale variant returns the identical relation:
    a hash collision can gate a candidate IN but the string verify step
    keeps the output exact."""
    sf = _mkdocs(tmp_path)
    a = sorted(map(tuple,
                   QUERIES["dedup_substring_windows"][0](spark, sf)
                   .collect()))
    b = sorted(map(tuple,
                   QUERIES["dedup_substring_windows_hashed"][0](spark, sf)
                   .collect()))
    assert a == b


@pytest.mark.usefixtures("spark")
def test_simhash_hamming_pairs_band_completeness(spark, tmp_path):
    """Pigeonhole guarantee: the 4×4-bit band join is a SUPERSET of all
    pairs within Hamming distance 3, so every hd≤2 pair the brute-force
    scan finds must be in the banded result — verified on the planted
    corpus plus DuckDB brute force at sf0.01."""
    import duckdb

    from unfurl_spark.operators import queries as q

    sf = "/root/testdata/sf0.01"
    banded = {(r["doc_a"], r["doc_b"])
              for r in q.QUERIES["dedup_simhash_hamming_pairs"][0](
                  spark, sf).collect()}
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    brute = {(a, b) for a, b in con.execute(f"""
WITH sh AS (
  SELECT doc_id, CAST({q._SIMHASH_BITS} AS BIGINT) AS simhash
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents)
  GROUP BY doc_id
)
SELECT a.doc_id, b.doc_id
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 2""").fetchall()}
    assert banded == brute     # banding loses nothing at hd<=2
    # identical docs pair at hamming 0
    text = " ".join(f"w{i}" for i in range(40))
    import pyarrow as pa
    import pyarrow.parquet as pq_

    pq_.write_table(pa.table({
        "doc_id": [1, 2, 3],
        "text": [text, text, "completely different tokens only here"],
        "lang": ["en"] * 3, "source": ["web"] * 3, "n_chars": [0, 0, 0],
    }), str(tmp_path / "documents.parquet"))
    _link_other_tables(tmp_path)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in q.QUERIES["dedup_simhash_hamming_pairs"][0](
               spark, str(tmp_path)).collect()}
    assert got.get((1, 2)) == 0


@pytest.mark.usefixtures("spark")
def test_simhash64_near_dup_sensitivity(spark, tmp_path):
    """64-bit signature: identical docs pair at hamming 0; a one-WORD-
    INSTANCE edit in a repeated-words doc (each word ×3 — the realistic
    regime where per-bit sums are strong) flips ~1 bit and stays within
    the hd≤3 emit threshold; unrelated docs never pair (chance hd≤3 at
    64 bits ≈ 2^-44).  A doc of 60 UNIQUE words with one swap measures
    hd 7 — near-dup detection needs token repetition, which real text
    has; documented by construction here."""
    from unfurl_spark.operators.queries import QUERIES

    base = " ".join((f"t{i} " * 3).strip() for i in range(20))
    edited = base.replace("t7 t7 t7", "t7 t7 x")
    other = " ".join(f"zz{i}" for i in range(60))
    pq.write_table(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [base, base, edited, other],
        "lang": ["en"] * 4, "source": ["web"] * 4, "n_chars": [0] * 4,
    }), str(tmp_path / "documents.parquet"))
    _link_other_tables(tmp_path)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in QUERIES["dedup_simhash64_hamming_pairs"][0](
               spark, str(tmp_path)).collect()}
    assert got.get((1, 2)) == 0
    assert (1, 3) in got and got[(1, 3)] <= 3
    assert not any(4 in pair for pair in got)
