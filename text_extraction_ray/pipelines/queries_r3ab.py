"""Round-3 continuation batch AB: training-mix manifest + corpus
datasheet.

- ``training_mix`` — the data-mixing step of LLM corpus assembly
  (static DoReMi-style weights): every document lands in an EXACT
  global length tercile (NTILE(3) over (n_chars, doc_id) — computed
  with the decile machinery's shape: value-count histogram, driver
  brackets the 2 cut ranks, tie values fetched exactly, boundary
  PAIRS broadcast; no global sort), the (lang × tercile) cell
  assigns a keep rate, and the content-keyed md5-threshold rule
  (bit-identical to the SQL twin, the docs_lang_resample discipline)
  selects survivors.  Output: (lang, bucket, n_total, n_kept) — the
  mix manifest a trainer consumes.  DuckDB NTILE+md5 parity twin in
  pytest.
- ``corpus_datasheet`` — the dataset card in one table: corpus-level
  metrics (doc/lang counts, char totals/means, exact distinct-text
  rate, event/user counts, events-per-user) as (metric, value) rows,
  each computed by a distributed aggregate; DuckDB twin in pytest.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

_PYA = {"batch_format": "pyarrow"}

LANG_W = {"en": 0.6, "de": 1.0, "es": 0.9, "fr": 0.8, "zh": 1.0}
BUCKET_W = [0.5, 1.0, 0.7]          # short docs dropped hardest
N_TILES = 3


def _read(sf_dir: str, table: str, columns: list[str]):
    from .queries import read_table

    return read_table(sf_dir, table, columns)


def mix_threshold(rate: float) -> str | None:
    """8-hex-char md5 keep threshold; None ⇒ keep all (rate ≥ 1).
    Single correctly-rounded float chain so DuckDB lands on the same
    bits (the docs_lang_resample rule)."""
    if rate >= 1.0:
        return None
    return format(int(math.floor(rate * 4294967296.0)), "08x")


def q_training_mix(sf_dir: str) -> ray.data.Dataset:
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    n = docs.count()
    base, rem = divmod(n, N_TILES)
    sizes = [base + 1 if t < rem else base for t in range(N_TILES)]
    cut_ranks = np.cumsum(sizes)[:-1]          # 1-indexed last-of-tile

    # pass 1: value-count histogram over the SMALL n_chars domain
    hist = (docs.groupby("n_chars")
            .aggregate(Count(alias_name="c"))
            .to_pandas().sort_values("n_chars"))
    vals = hist["n_chars"].to_numpy()
    cum = hist["c"].cumsum().to_numpy()

    # pass 2: exact boundary (n_chars, doc_id) pairs — ties fetched
    boundaries = []
    for k in cut_ranks.tolist():
        vi = int(np.searchsorted(cum, k))
        v = int(vals[vi])
        before = int(cum[vi - 1]) if vi else 0
        ties = sorted(
            r["doc_id"]
            for r in docs.filter(expr=f"n_chars == {v}").take_all())
        boundaries.append((v, int(ties[k - before - 1])))
    b_ref = ray.put(boundaries)

    def assign(b: pa.Table) -> pa.Table:
        bnds = ray.get(b_ref)
        nc = b.column("n_chars").to_numpy(zero_copy_only=False)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        bucket = np.zeros(len(nc), dtype=np.int64)
        for v, tid in bnds:
            bucket += (nc > v) | ((nc == v) & (ids > tid))
        langs = b.column("lang").to_pylist()
        kept = np.zeros(len(nc), dtype=np.int64)
        for i, (lang, bk, did) in enumerate(
                zip(langs, bucket.tolist(), ids.tolist())):
            thr = mix_threshold(LANG_W[lang] * BUCKET_W[bk])
            kept[i] = 1 if thr is None else (
                hashlib.md5(str(did).encode()).hexdigest()[:8] < thr)
        return pa.table({
            "lang": b.column("lang"),
            "bucket": pa.array(bucket),
            "kept": pa.array(kept),
            "one": pa.array(np.ones(len(nc), dtype=np.int64)),
        })

    return (docs.map_batches(assign, **_PYA)
            .groupby(["lang", "bucket"])
            .aggregate(Sum("one", alias_name="n_total"),
                       Sum("kept", alias_name="n_kept")))


def q_corpus_datasheet(sf_dir: str) -> pa.Table:
    """(metric, value) dataset card; every metric is a distributed
    aggregate, the card itself is a constant-size driver table.

    Three passes, not six: ONE per-lang groupby carries doc counts,
    char sums and char min/max (5 rows → all doc scalars + n_langs),
    one text-hash groupby carries the exact distinct count, and one
    per-user groupby carries both event totals."""
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang",
                                       "n_chars"])

    def lang_partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        langs = np.array(b.column("lang").to_pylist(), dtype=object)
        nc = b.column("n_chars").to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(langs, sort=False)
        rows = {"lang": [], "n": [], "s": [], "mn": [], "mx": []}
        for gi, lang in enumerate(uniq):
            m = codes == gi
            rows["lang"].append(lang)
            rows["n"].append(int(m.sum()))
            rows["s"].append(int(nc[m].sum()))
            rows["mn"].append(int(nc[m].min()))
            rows["mx"].append(int(nc[m].max()))
        return pa.table({
            "lang": pa.array(rows["lang"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "s": pa.array(rows["s"], pa.int64()),
            "mn": pa.array(rows["mn"], pa.int64()),
            "mx": pa.array(rows["mx"], pa.int64()),
        })

    per_lang = (docs.map_batches(lang_partial, **_PYA)
                .groupby("lang")
                .aggregate(Sum("n", alias_name="n"),
                           Sum("s", alias_name="s"),
                           Min("mn", alias_name="mn"),
                           Max("mx", alias_name="mx"))
                .to_pandas())
    n_docs = int(per_lang["n"].sum())
    total_chars = int(per_lang["s"].sum())
    n_langs = len(per_lang)
    g = {"min(n_chars)": int(per_lang["mn"].min()),
         "max(n_chars)": int(per_lang["mx"].max())}

    def text_hash(b: pa.Table) -> pa.Table:
        from ..functions.dedup import _fnv1a64_many

        hv = _fnv1a64_many(
            [t.encode("utf-8") for t in b.column("text").to_pylist()])
        return pa.table({"h": pa.array(hv.view(np.int64))})

    n_distinct_texts = (docs.map_batches(text_hash, **_PYA)
                        .groupby("h").aggregate(Count(alias_name="c"))
                        .count())

    ev = _read(sf_dir, "events", ["event_id", "user_id"])
    # second-level aggregate: (n_users, n_events) from the per-user
    # table WITHOUT collecting it (user count is corpus-scale)
    ug = (ev.groupby("user_id").aggregate(Count(alias_name="c"))
          .aggregate(Count(), Sum("c")))
    n_users = int(ug["count()"])
    n_events = int(ug["sum(c)"])

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    rows = [
        ("docs.n", float(n_docs)),
        ("docs.n_langs", float(n_langs)),
        ("docs.total_chars", float(total_chars)),
        ("docs.mean_chars", r6(total_chars / n_docs)),
        ("docs.min_chars", float(g["min(n_chars)"])),
        ("docs.max_chars", float(g["max(n_chars)"])),
        ("docs.distinct_text_rate", r6(n_distinct_texts / n_docs)),
        ("events.n", float(n_events)),
        ("events.n_users", float(n_users)),
        ("events.per_user", r6(n_events / n_users)),
    ]
    return pa.table({
        "metric": pa.array([r[0] for r in rows], pa.string()),
        "value": pa.array([r[1] for r in rows], pa.float64()),
    })


def queries_r3ab() -> dict:
    return {
        "training_mix": q_training_mix,
        "corpus_datasheet": q_corpus_datasheet,
    }
