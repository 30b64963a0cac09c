"""Composable corpus-hygiene operators — the DataFrame-level API for the
training-data ops the SQL registry (operators/queries.py) exposes over the
fixed ``documents`` view.  A pipeline user points these at ANY table
(parameterized id/text columns, shingle width, signature length, bands),
and the shapes stay scale-safe: shingling is a native array expression
(zero joins), candidate generation is banded LSH (never all-pairs),
keeper application is a left-anti join.

Default parameters (k=8, n=3, bands=2) reproduce the registry queries
bit-for-bit — asserted by tests/test_corpus_api.py against the DuckDB-
oracled entries, so the API inherits their correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-grams as a native array expression — scan→project only
    (the r1 self-join formulation shuffled the token table n times;
    VERDICT r1 #2)."""
    w = F.split(text if isinstance(text, Column) else F.col(text), " ")
    return F.when(
        F.size(w) >= n,
        F.transform(F.sequence(F.lit(0), F.size(w) - n),
                    lambda i: F.array_join(F.slice(w, i + 1, n), " "))
    ).otherwise(F.array().cast("array<string>"))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 8,
                       n: int = 3) -> DataFrame:
    """Per-row minhash signature columns h0..h{k-1} over word n-grams.
    One explode + one hash-group aggregate; no joins."""
    g = (df.select(F.col(id_col).alias(id_col),
                   F.explode(word_shingles(text_col, n)).alias("g")))
    aggs = [F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("g"))))
            .alias(f"h{i}") for i in range(k)]
    return g.groupBy(id_col).agg(*aggs)


def lsh_bands(sigs: DataFrame, id_col: str = "doc_id",
              bands: int = 2) -> DataFrame:
    """(id, band_key) rows: the signature columns split into ``bands``
    equal groups, each hashed to one bucket key.  Near-duplicates agree
    on at least one band with high probability; grouping is by band_key,
    never all-pairs."""
    hcols = [c for c in sigs.columns if c != id_col]
    per = len(hcols) // bands
    if per == 0 or len(hcols) % bands:
        raise ValueError(f"{len(hcols)} signature cols not divisible "
                         f"into {bands} bands")
    keys = F.array(*[
        F.md5(F.concat(*[F.col(c) for c in hcols[b * per:(b + 1) * per]]))
        for b in range(bands)])
    return (sigs.select(id_col, F.explode(keys).alias("band_key")))


def duplicate_groups(bands_df: DataFrame, id_col: str = "doc_id"
                     ) -> DataFrame:
    """Buckets holding >1 row: (band_key, n_docs, keeper=min id)."""
    return (bands_df.groupBy("band_key")
            .agg(F.count("*").alias("n_docs"),
                 F.min(id_col).alias("keeper"))
            .filter(F.col("n_docs") > 1))


def apply_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", k: int = 8, n: int = 3,
                bands: int = 2) -> DataFrame:
    """Drop every non-keeper near-duplicate: signatures → banded LSH →
    per-bucket keeper (min id) → LEFT ANTI join of the flagged set.
    The dupe set is small relative to the corpus, so AQE broadcasts it
    at scale (same shape as the oracled ``dedup_apply_keep``)."""
    from pyspark.sql import Window

    b = lsh_bands(minhash_signatures(df, text_col, id_col, k, n),
                  id_col, bands)
    w = Window.partitionBy("band_key")
    dupes = (b.select(id_col,
                      F.min(id_col).over(w).alias("keeper"),
                      F.count("*").over(w).alias("n"))
             .filter((F.col("n") > 1) & (F.col(id_col) != F.col("keeper")))
             .select(id_col).distinct())
    return df.join(dupes, id_col, "left_anti")


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per exact text fingerprint."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col(text_col)))
    return (df.withColumn("__keeper", F.min(id_col).over(w))
            .filter(F.col(id_col) == F.col("__keeper"))
            .drop("__keeper"))


def substring_dup_stats(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", window: int = 16,
                        hashed: bool = True) -> DataFrame:
    """Suffix-granularity duplicated-substring statistics per row
    (Lee et al. 2022 §4.1 as a DataFrame op): stride-1 ``window``-word
    sliding windows catch duplicated passages at ANY offset; returns
    (id_col, n_windows, n_dup_windows, dup_frac).

    ``hashed=True`` is the 100 TB shape: the full-corpus shuffle moves
    xxhash64 keys (8 bytes/window) and only hash-shared candidates —
    <<1% of a web corpus — re-shuffle as strings for exact
    verification, so a collision can gate a candidate IN but never
    mark a non-duplicate.  Both modes return the identical relation
    (the registry twins `dedup_substring_windows[_hashed]` carry the
    DuckDB oracle; parameterized equivalence in test_corpus_api.py)."""
    w = F.split(F.col(text_col), " ")
    wins = F.when(
        F.size(w) >= window,
        F.transform(F.sequence(F.lit(1), F.size(w) - window + 1),
                    lambda i: F.array_join(F.slice(w, i, window), " "))
    ).otherwise(F.array().cast("array<string>"))
    dwin = (df.select(F.col(id_col), F.explode(wins).alias("win"))
            .distinct())
    if hashed:
        hwin = dwin.withColumn("h", F.xxhash64("win"))
        hcand = (hwin.groupBy("h")
                 .agg(F.countDistinct(id_col).alias("nd"))
                 .filter(F.col("nd") > 1).select("h"))
        dup = (hwin.join(hcand, "h").groupBy("win")
               .agg(F.count("*").alias("n")).filter(F.col("n") > 1)
               .select("win"))
    else:
        dup = (dwin.groupBy("win").agg(F.count("*").alias("n"))
               .filter(F.col("n") > 1).select("win"))
    marked = dwin.join(dup.withColumn("__dup", F.lit(1)), "win", "left")
    return (marked.groupBy(id_col)
            .agg(F.count("*").alias("n_windows"),
                 F.count("__dup").alias("n_dup_windows"))
            .withColumn("dup_frac",
                        F.round(F.col("n_dup_windows").cast("double")
                                / F.col("n_windows"), 4)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row quality columns (the ``text_quality_score`` feature set):
    n_chars_m, word_density, punct_ratio, mean word length — pure native
    expressions, no shuffle."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.size(F.split(t, " "))
    return df.withColumns({
        "n_chars_m": n_chars.cast("bigint"),
        "word_density": F.round(
            words.cast("double") / F.greatest(n_chars, F.lit(1)), 4),
        "punct_ratio": F.round(
            (n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", "")))
            .cast("double") / F.greatest(n_chars, F.lit(1)), 4),
        "mean_word_len": F.round(
            F.length(F.regexp_replace(t, r"\s+", "")).cast("double")
            / F.greatest(words, F.lit(1)), 2),
    })


_PII_PATTERNS = (
    # order matters: emails before bare domains, long digit runs last
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\s().\-]{7,}\d", "<PHONE>"),
)


def pii_scrub(df: DataFrame, text_col: str = "text",
              out_col: str | None = None) -> DataFrame:
    """Redact emails / IPv4 addresses / phone-shaped digit runs with typed
    placeholder tokens, plus per-row hit counts for lineage (a corpus job
    must be able to report HOW MUCH it redacted, not just do it).

    Pure JVM-side ``regexp_replace`` / ``regexp_count`` chain — no Python
    in the hot path, no shuffle, safe at any scale.  The patterns are the
    standard high-precision subset (full PII detection needs NER models;
    this is the regex tier every published corpus pipeline runs first)."""
    out_col = out_col or text_col
    t = F.col(text_col)
    counts = {f"n_pii_{name}": F.regexp_count(t, F.lit(pat)).cast("bigint")
              for name, pat, _ in _PII_PATTERNS}
    red = t
    for _, pat, token in _PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    return df.withColumns({**counts, out_col: red})


def canonical_url(url: Column | str) -> Column:
    """Canonicalize a URL column for URL-level dedup: lowercase scheme +
    host, strip a default port, drop the fragment, drop tracking params
    (utm_*, gclid, fbclid), and trim a trailing slash from the path.
    Native expression tree — usable as a join/group key at any scale."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")                       # fragment
    # lowercase scheme://host (leave path/query case alone)
    u = F.concat(F.lower(F.regexp_extract(u, r"^([^:/?#]+://[^/?#]*)", 1)),
                 F.regexp_replace(u, r"^[^:/?#]+://[^/?#]*", ""))
    u = F.regexp_replace(u, r"^(https?://[^/?#]*):(?:80|443)(?=[/?#]|$)",
                         r"$1")                                # default port
    # tracking params: strip k=v pairs then tidy separators
    u = F.regexp_replace(
        u, r"(?<=[?&])(?:utm_[a-z]+|gclid|fbclid)=[^&#]*&?", "")
    u = F.regexp_replace(u, r"[?&]+$", "")                     # dangling ? &
    u = F.regexp_replace(u, r"\?&", "?")                       # ?&a=1 → ?a=1
    u = F.regexp_replace(u, r"(://[^/?#]+/[^?#]*?)/+(?=\?|$)", r"$1")
    u = F.regexp_replace(u, r"(://[^/?#]+)/(?=\?|$)", r"$1")   # bare /
    return u


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """Keep one row per canonical URL (min id wins) — the first-line dedup
    every crawl corpus runs before any content hashing.  One shuffle on
    the canonical key."""
    key = canonical_url(url_col).alias("__canon")
    from pyspark.sql import Window
    w = Window.partitionBy("__canon")
    return (df.withColumn("__canon", key)
            .withColumn("__keeper", F.min(id_col).over(w))
            .filter(F.col(id_col) == F.col("__keeper"))
            .drop("__canon", "__keeper"))


def clean_corpus(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", min_chars: int = 40,
                 max_punct_ratio: float = 0.2,
                 near_dup: bool = True) -> DataFrame:
    """The composed hygiene recipe a training pipeline runs: quality gate
    (cheap native filters, pushed before any shuffle) → exact dedup →
    optional near-dup LSH dedup.  Two to three shuffles total."""
    gated = (quality_features(df, text_col)
             .filter((F.col("n_chars_m") >= min_chars)
                     & (F.col("punct_ratio") <= max_punct_ratio))
             .select(*df.columns))
    out = exact_dedup(gated, text_col, id_col)
    if near_dup:
        out = apply_dedup(out, text_col, id_col)
    return out
