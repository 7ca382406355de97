"""Round-3 operator additions (SURVEY §2.0 rows G13/W4/G14).

Registered as rows-only driver entries (the 50-row CORRECTNESS window is
fully allocated: 48 oracled + extract_pages + pdf_tables), but each one
still carries a DuckDB-parity SQL twin exercised by tests/test_queries_r3
— the same rows+schema+values check the driver would run, just executed
in pytest instead of the round report.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .extraction import heavy_concurrency as _conc

_PYA = {"batch_format": "pyarrow"}


def _read(sf_dir: str, table: str, columns: list[str]) -> ray.data.Dataset:
    from .queries import read_table

    return read_table(sf_dir, table, columns)


# --- G13: near-dup keep-list application -------------------------------------

# Drop-set ids broadcast below this; above it the apply step degrades to
# a distributed left_outer anti-join (queries_r3t.py span-dedup template:
# at crawl scale the duplicated minority is ~30-50% of docs, an O(corpus)
# object the driver must never hold).  Path equality is pinned by
# tests/test_queries_r3.py with the cap forced to 0.
DROP_BROADCAST_CAP = 2_000_000


def q_docs_dedup_apply(sf_dir: str) -> ray.data.Dataset:
    """The step that makes dedup USEFUL: apply the cluster keep-list to the
    corpus — keep every doc that is its cluster's head (min member) or in
    no cluster at all.  The drop-set (non-head members of the oracled
    neardup_clusters table) is broadcast once via ray.put when it fits
    under DROP_BROADCAST_CAP so the corpus scan filters vectorized per
    batch with no exchange; above the cap it becomes a Dataset and the
    filter is a distributed left_outer join + null-keep — the capped
    broadcast → join fallback discipline (VERDICT r3 #1)."""
    import pyarrow.compute as pc

    from .queries_ext import q_neardup_clusters

    clusters = q_neardup_clusters(sf_dir)
    drop = clusters.filter(
        pc.invert(pc.equal(clusters.column("doc_id"),
                           clusters.column("cluster_id"))))
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    if drop.num_rows <= DROP_BROADCAST_CAP:
        drop_ref = ray.put(drop.column("doc_id").combine_chunks())

        def keep(b: pa.Table) -> pa.Table:
            drop_ids = ray.get(drop_ref)
            mask = pc.invert(
                pc.is_in(b.column("doc_id"), value_set=drop_ids))
            return b.filter(mask)

        return docs.map_batches(keep, **_PYA)

    # join fallback: ship only the 8-byte ids through the exchange
    drop_ds = ray.data.from_arrow(drop.select(["doc_id"]))
    return docs.join(drop_ds, join_type="left_anti", num_partitions=8,
                     on=("doc_id",))


# pytest parity twin (NOT a driver oracle — window allocation, see module
# docstring); reuses the neardup_clusters recursive CTE
SQL_DOCS_DEDUP_APPLY = """
WITH RECURSIVE
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.4),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs),
walk (node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node),
clusters AS (
  SELECT node AS doc_id, MIN(label) AS cluster_id FROM walk GROUP BY node)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM clusters
                       WHERE doc_id != cluster_id)
"""


# --- W4: grouped rank window --------------------------------------------------

def q_orders_rank(sf_dir: str) -> ray.data.Dataset:
    """ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice
    DESC, o_orderkey) <= 2 — the rank-window operator.  Same shape as
    doc_top_terms' fallback ranking: a coarse key-hash bucket groupby
    (64 groups) and ONE vectorized lexsort + first-occurrence rank per
    bucket, instead of one Python map_groups call per customer.  The
    ordering key is integer/decimal-deterministic, so ranks are
    bit-reproducible across engines."""

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b.column("o_custkey").to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket", pa.array((ids % 64).astype(np.int64)))

    def rank2(g: pa.Table) -> pa.Table:
        cust = g.column("o_custkey").to_numpy(zero_copy_only=False)
        okey = g.column("o_orderkey").to_numpy(zero_copy_only=False)
        price = g.column("o_totalprice").to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, -price, cust))  # cust-major, then rank
        c = cust[order]
        first = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1]
        starts = np.repeat(first, np.diff(np.r_[first, len(c)]))
        rank = np.arange(len(c)) - starts + 1
        keep = rank <= 2
        sel = order[keep]
        return pa.table({
            "o_orderkey": pa.array(okey[sel], type=pa.int64()),
            "o_custkey": pa.array(cust[sel], type=pa.int64()),
            "o_totalprice": pa.array(price[sel], type=pa.float64()),
            "price_rank": pa.array(rank[keep], type=pa.int64()),
        })

    return (_read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_totalprice"])
            .map_batches(add_bucket, **_PYA)
            .groupby("bucket")
            .map_groups(rank2, batch_format="pyarrow"))


SQL_ORDERS_RANK = """
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_rank
FROM orders
QUALIFY price_rank <= 2
"""


# --- G14: grouped string aggregation (collect/string_agg) ---------------------

def q_lang_doc_csv(sf_dir: str) -> ray.data.Dataset:
    """Per-language comma-joined CSV of the 5 smallest doc_ids — the
    string_agg/collect_list operator, built with a MAP-SIDE COMBINER:
    each batch keeps only its own 5 smallest ids per lang (min-k is a
    semilattice, so partials compose exactly), the groupby shuffles
    ≤ langs × 5 rows per batch, and the final merge re-selects the global
    5 and joins — the full id list never shuffles anywhere."""

    def partial_min5(b: pa.Table) -> pa.Table:
        langs = np.asarray(b.column("lang").to_pylist(), dtype=object)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, langs))
        la = langs[order]
        first = np.r_[0, np.flatnonzero(la[1:] != la[:-1]) + 1]
        starts = np.repeat(first, np.diff(np.r_[first, len(la)]))
        keep = (np.arange(len(la)) - starts) < 5
        sel = order[keep]
        return pa.table({
            "lang": pa.array(langs[sel].tolist(), type=pa.string()),
            "doc_id": pa.array(ids[sel], type=pa.int64()),
        })

    def merge_csv(g: pa.Table) -> pa.Table:
        ids = sorted(g.column("doc_id").to_pylist())[:5]
        return pa.table({
            "lang": g.column("lang").slice(0, 1),
            "doc_csv": pa.array([",".join(str(i) for i in ids)],
                                type=pa.string()),
        })

    return (_read(sf_dir, "documents", ["lang", "doc_id"])
            .map_batches(partial_min5, **_PYA)
            .groupby("lang")
            .map_groups(merge_csv, batch_format="pyarrow"))


SQL_LANG_DOC_CSV = """
WITH r AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents)
SELECT lang,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_csv
FROM r WHERE rn <= 5 GROUP BY lang
"""


# --- M21: audio decode + featurize (real WAV codec) --------------------------

def q_audio_features(sf_dir: str) -> ray.data.Dataset:
    """Audio leg of the multimodal story: deterministic RIFF/PCM clips per
    doc (mono/stereo, 8/16-bit — real containers from core/wav.py) →
    AudioFeaturizer actor pool (decode + duration/RMS/peak/ZCR, state in
    __init__, small batches because binary payloads dominate memory).
    Rows-only; exact per-clip features are pinned in pytest against a
    direct numpy recomputation."""
    from ..functions.multimodal import AudioFeaturizer, synth_audio_batch

    return (_read(sf_dir, "documents", ["doc_id"])
            .map_batches(synth_audio_batch, **_PYA)
            .map_batches(AudioFeaturizer, concurrency=_conc(), batch_size=64,
                         **_PYA))


# --- T2: pattern redaction (PII-style scrub) ---------------------------------

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"


def redact_batch(b: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized RE2 scrub: emails → <EMAIL>, then URLs → <URL> — the
    standard pretraining-corpus PII pass.  Both patterns are RE2-safe so
    the DuckDB regexp_replace(..., 'g') twin is bit-identical."""
    import pyarrow.compute as pc

    t = pc.replace_substring_regex(b.column(text_col), pattern=EMAIL_RE,
                                   replacement="<EMAIL>")
    t = pc.replace_substring_regex(t, pattern=URL_RE, replacement="<URL>")
    return pa.table({
        "doc_id": b.column("doc_id"),
        "redacted": t,
        "n_redacted": pc.add(
            pc.count_substring_regex(b.column(text_col), pattern=EMAIL_RE),
            pc.count_substring_regex(b.column(text_col), pattern=URL_RE)),
    })


def q_docs_redact(sf_dir: str) -> ray.data.Dataset:
    return _read(sf_dir, "documents", ["doc_id", "text"]
                 ).map_batches(redact_batch, **_PYA)


SQL_DOCS_REDACT = r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
           'g'),
         'https?://[^\s]+', '<URL>', 'g') AS redacted,
       CAST(length(regexp_extract_all(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
            + length(regexp_extract_all(text, 'https?://[^\s]+'))
            AS INT) AS n_redacted
FROM documents
"""


# --- T3: benchmark decontamination --------------------------------------------

def q_decontaminate(sf_dir: str, n_gram: int = 8,
                    benchmark_max_id: int = 20) -> ray.data.Dataset:
    """The decontamination pass a pretraining pipeline runs before
    training: flag every corpus doc sharing an n-gram with a benchmark
    set.  The benchmark side is SMALL BY DEFINITION (eval sets are
    thousands of docs vs billions in the corpus), so its n-gram hash set
    is built once driver-side, ray.put, and the corpus scan checks
    membership per doc — no shuffle, one pass over the big side."""
    import pyarrow.parquet as pq

    bench = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"],
                          filters=[("doc_id", "<", benchmark_max_id)])
    # NOTE: membership is on the n-gram STRINGS, not hash() values —
    # Python's str hash is per-process randomized (PYTHONHASHSEED), so a
    # driver-built hash set would never match inside Ray workers.  The
    # benchmark side is bounded-small, so the string set broadcasts fine.
    grams: set = set()
    for text in bench.column("text").to_pylist():
        toks = (text or "").split()
        for i in range(len(toks) - n_gram + 1):
            grams.add(" ".join(toks[i : i + n_gram]))
    grams_ref = ray.put(grams)

    def scan(b: pa.Table) -> pa.Table:
        gset = ray.get(grams_ref)
        ids_out, hits_out = [], []
        for doc_id, text in zip(b.column("doc_id").to_pylist(),
                                b.column("text").to_pylist()):
            toks = (text or "").split()
            n_hits = sum(
                1 for i in range(len(toks) - n_gram + 1)
                if " ".join(toks[i : i + n_gram]) in gset)
            if n_hits:
                ids_out.append(doc_id)
                hits_out.append(n_hits)
        return pa.table({
            "doc_id": pa.array(ids_out, type=pa.int64()),
            "n_contaminated": pa.array(hits_out, type=pa.int64()),
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]
                 ).map_batches(scan, **_PYA)


# --- X7: per-group HLL distinct ------------------------------------------------

def q_users_by_type_hll(sf_dir: str) -> pa.Table:
    """Distinct users per event_type via per-group HyperLogLog — the
    at-scale replacement for groupby+COUNT(DISTINCT): the shuffle carries
    register maxima (≤ groups × 4096 rows total), never user ids.
    Rows-only; ≤5% per-group accuracy pinned in pytest vs exact."""
    from ..functions.sketch import grouped_approx_distinct

    return grouped_approx_distinct(
        _read(sf_dir, "events", ["event_type", "user_id"]),
        group_col="event_type", col="user_id")


# --- J12: full outer join --------------------------------------------------------

def q_cust_orders_full_outer(sf_dir: str) -> ray.data.Dataset:
    """FULL OUTER customer ⋈ per-customer order counts — completes the
    native-join family (inner J4, left_anti J6, left_semi J7, left_outer
    in window_skew).  Customers with no orders keep null n_orders; orphan
    orders (none in this corpus, but the plan handles them) would keep
    null nation."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    per_cust = (_read(sf_dir, "orders", ["o_custkey"])
                .groupby("o_custkey")
                .aggregate(Count(alias_name="n_orders"))
                .repartition(8))  # absorb schema-less empty reduce blocks
    joined = cust.join(per_cust, join_type="full_outer", num_partitions=8,
                       on=("c_custkey",), right_on=("o_custkey",))

    def finish(b: pa.Table) -> pa.Table:
        names = b.schema.names
        key = pc.coalesce(b.column("c_custkey"),
                          b.column("o_custkey")) if "o_custkey" in names             else b.column("c_custkey")
        return pa.table({
            "custkey": pc.cast(key, pa.int64()),
            "c_nationkey": b.column("c_nationkey"),
            "n_orders": b.column("n_orders"),
        })

    return joined.map_batches(finish, **_PYA)


SQL_CUST_ORDERS_FULL_OUTER = """
WITH per_cust AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey)
SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_nationkey, n_orders
FROM customer FULL OUTER JOIN per_cust ON c_custkey = o_custkey
"""


# --- K6: true global sort ---------------------------------------------------------

def q_orders_global_sort(sf_dir: str) -> ray.data.Dataset:
    """ds.sort — the genuine distributed range-partitioned sort (top-k
    everywhere else deliberately avoids it): orders by (o_totalprice
    DESC, o_orderkey ASC), first 100 rows IN ORDER.  The pytest twin
    compares the ordered row list, not just the set."""
    return (_read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
            .sort(["o_totalprice", "o_orderkey"],
                  descending=[True, False])
            .limit(100))


SQL_ORDERS_GLOBAL_SORT = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


def queries_r3() -> dict:
    return {
        "docs_dedup_apply": q_docs_dedup_apply,
        "orders_rank": q_orders_rank,
        "lang_doc_csv": q_lang_doc_csv,
        "audio_features": q_audio_features,
        "docs_redact": q_docs_redact,
        "decontaminate": q_decontaminate,
        "users_by_type_hll": q_users_by_type_hll,
        "cust_orders_full_outer": q_cust_orders_full_outer,
        "orders_global_sort": q_orders_global_sort,
    }


def parity_sql_r3() -> dict[str, str]:
    """DuckDB twins for the pytest parity gate (NOT driver oracles)."""
    return {
        "docs_dedup_apply": SQL_DOCS_DEDUP_APPLY,
        "orders_rank": SQL_ORDERS_RANK,
        "lang_doc_csv": SQL_LANG_DOC_CSV,
        "docs_redact": SQL_DOCS_REDACT,
        "cust_orders_full_outer": SQL_CUST_ORDERS_FULL_OUTER,
        "orders_global_sort": SQL_ORDERS_GLOBAL_SORT,
    }
