"""Round-3 continuation batch E: reshaping + feature-prep operators.

Five operators: UNPIVOT/melt (the inverse of the pivot, as a generic
helper), grouped argmax (associative partial reduction), regex group
extraction (scalar-function breadth), per-group z-score normalization
(the ML feature-prep two-pass: group moments broadcast, then a per-row
transform), and event-type transition counts (first-order Markov
bigrams over per-user time order).

Registered rows-only (driver 50-row window frozen); DuckDB parity
twins run in tests/test_queries_r3e.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

_PYA = {"batch_format": "pyarrow"}


def _read(sf_dir: str, table: str, columns: list[str],
          row_filter=None) -> ray.data.Dataset:
    from .queries import read_table

    return read_table(sf_dir, table, columns, row_filter=row_filter)


def _round_half_up(x: np.ndarray, digits: int) -> np.ndarray:
    q = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * q + 0.5) / q


def _ts_us(col: pa.ChunkedArray) -> np.ndarray:
    return col.combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False)


# --- G20: UNPIVOT / melt -------------------------------------------------------

def melt(ds: ray.data.Dataset, id_cols: list[str],
         value_cols: list[str], var_name: str = "variable",
         value_name: str = "value") -> ray.data.Dataset:
    """Generic wide→long reshape: each batch emits one slice per value
    column (id columns repeated, a constant label column, the value
    column renamed) and concatenates — row-parallel, shuffle-free, the
    exact inverse of the map-side pivot."""
    def unpivot(b: pa.Table) -> pa.Table:
        parts = []
        for vc in value_cols:
            cols = {c: b.column(c) for c in id_cols}
            cols[var_name] = pa.array([vc] * b.num_rows,
                                      type=pa.string())
            cols[value_name] = b.column(vc)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(unpivot, **_PYA)


def q_events_unpivot(sf_dir: str) -> ray.data.Dataset:
    """Melt the oracled day×type pivot back to long form — zero cells
    included (the information the long→wide→long round trip must
    preserve)."""
    from .queries_ext import _EVENT_TYPES, q_events_pivot

    return melt(q_events_pivot(sf_dir), ["day"], list(_EVENT_TYPES),
                var_name="event_type", value_name="n")


def _sql_events_unpivot() -> str:
    from .queries_ext import _EVENT_TYPES, SQL_EVENTS_PIVOT

    selects = [
        f"SELECT day, '{t}' AS event_type, {t} AS n FROM p"
        for t in _EVENT_TYPES]
    return f"WITH p AS ({SQL_EVENTS_PIVOT})\n" + "\nUNION ALL\n".join(
        selects)


# --- G21: grouped argmax -------------------------------------------------------

def q_lang_argmax_doc(sf_dir: str) -> ray.data.Dataset:
    """arg_max per group: the doc with the most characters per language
    (ties → smallest doc_id).  (max-by with a deterministic tiebreak)
    is associative, so each batch emits one candidate per lang and the
    final merge sees ≤ langs × batches rows — same shape as the grouped
    mode."""
    def local_best(b: pa.Table) -> pa.Table:
        langs = np.asarray(b.column("lang").to_pylist(), dtype=object)
        nc = b.column("n_chars").to_numpy(zero_copy_only=False)
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -nc, langs))
        la = langs[order]
        keep = np.zeros(len(la), dtype=bool)
        if len(la):
            keep[0] = True
            keep[1:] = la[1:] != la[:-1]
        return pa.table({
            "lang": pa.array(la[keep].tolist(), type=pa.string()),
            "doc_id": pa.array(did[order][keep], type=pa.int64()),
            "n_chars": pa.array(nc[order][keep], type=pa.int64()),
        })

    def merge_best(g: pa.Table) -> pa.Table:
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        nc = g.column("n_chars").to_numpy(zero_copy_only=False)
        i = int(np.lexsort((did, -nc))[0])
        return g.slice(i, 1)

    return (_read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
            .map_batches(local_best, **_PYA)
            .groupby("lang")
            .map_groups(merge_best, batch_format="pyarrow"))


SQL_LANG_ARGMAX_DOC = """
WITH r AS (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents)
SELECT lang, doc_id, n_chars FROM r WHERE rn = 1
"""


# --- §2.8c: regex group extraction ---------------------------------------------

_EXTRACT_RE = r"([a-z]{7,})"


def q_docs_regex_extract(sf_dir: str) -> ray.data.Dataset:
    """First ≥7-letter token per doc via a capture group — the
    regexp_extract scalar op (RE2 semantics on both engines; null when
    no match, matching SQL)."""
    def ext(b: pa.Table) -> pa.Table:
        # Arrow's extract_regex requires NAMED groups; the SQL twin uses
        # the equivalent unnamed group with index 1 — same RE2 semantics.
        m = pc.extract_regex(b.column("text"),
                             pattern=_EXTRACT_RE.replace("(", "(?P<w>", 1))
        first = pc.struct_field(m, ["w"])
        return pa.table({
            "doc_id": b.column("doc_id"),
            "long_word": first,
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]
                 ).map_batches(ext, **_PYA)


SQL_DOCS_REGEX_EXTRACT = f"""
SELECT doc_id,
       CASE WHEN regexp_matches(text, '{_EXTRACT_RE}')
            THEN regexp_extract(text, '{_EXTRACT_RE}', 1)
            ELSE NULL END AS long_word
FROM documents
"""


# --- X8: per-group z-score normalization ---------------------------------------

def q_docs_zscore(sf_dir: str) -> ray.data.Dataset:
    """Feature scaling: z = (n_chars − mean_lang) / std_lang (sample
    std, ddof=1 — SQL STDDEV).  Two passes: distributed (n, Σx, Σx²)
    moment partials per lang → tiny map broadcast once → vectorized
    per-row transform.  The groups-stats-then-transform shape every ML
    feature pipeline needs; no shuffle of the fact rows."""
    def partial(b: pa.Table) -> pa.Table:
        langs = np.asarray(b.column("lang").to_pylist(), dtype=object)
        x = b.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(langs, return_inverse=True)
        return pa.table({
            "lang": pa.array(uniq.tolist(), type=pa.string()),
            "n": pa.array(np.bincount(inv).astype(np.float64)),
            "sx": pa.array(np.bincount(inv, weights=x)),
            "sxx": pa.array(np.bincount(inv, weights=x * x)),
        })

    stats = (_read(sf_dir, "documents", ["lang", "n_chars"])
             .map_batches(partial, **_PYA)
             .groupby("lang")
             .aggregate(Sum("n", alias_name="n"),
                        Sum("sx", alias_name="sx"),
                        Sum("sxx", alias_name="sxx"))
             .take_all())
    lut = {}
    for r in stats:
        n, sx, sxx = r["n"], r["sx"], r["sxx"]
        mean = sx / n
        var = (sxx - sx * sx / n) / (n - 1) if n > 1 else float("nan")
        lut[r["lang"]] = (mean, float(np.sqrt(var)))
    lut_ref = ray.put(lut)

    def attach(b: pa.Table) -> pa.Table:
        table = ray.get(lut_ref)
        langs = np.asarray(b.column("lang").to_pylist(), dtype=object)
        x = b.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.float64)
        z = np.empty(len(x))
        for lang in np.unique(langs):
            mean, std = table[lang]
            m = langs == lang
            z[m] = (x[m] - mean) / std
        return b.append_column("z", pa.array(_round_half_up(z, 6)))

    return (_read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
            .map_batches(attach, **_PYA))


SQL_DOCS_ZSCORE = """
SELECT doc_id, lang, n_chars,
       ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
             / STDDEV(n_chars) OVER (PARTITION BY lang), 6) AS z
FROM documents
"""


# --- W10: event-type transition counts (Markov bigrams) ------------------------

def q_event_transitions(sf_dir: str) -> ray.data.Dataset:
    """First-order transition matrix of user behavior: count
    (prev_type → next_type) over each user's time-ordered stream.
    Same 64-bucket lexsort machinery as LAG; the bigram pairs
    pre-aggregate per bucket (≤ types² rows each) before one tiny
    groupby — raw events shuffle once into buckets, pairs never do."""
    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket", pa.array((ids % 64).astype(np.int64)))

    def bigrams(g: pa.Table) -> pa.Table:
        user = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = _ts_us(g.column("ts"))
        types, tinv = np.unique(
            np.asarray(g.column("event_type").to_pylist(), dtype=object),
            return_inverse=True)
        order = np.lexsort((eid, ts, user))
        u, t = user[order], tinv[order]
        if len(u) < 2:
            return pa.table({
                "prev_type": pa.array([], type=pa.string()),
                "next_type": pa.array([], type=pa.string()),
                "n_part": pa.array([], type=pa.int64()),
            })
        same = u[1:] == u[:-1]
        k = len(types)
        keys = t[:-1][same] * k + t[1:][same]
        uk, cnt = np.unique(keys, return_counts=True)
        return pa.table({
            "prev_type": pa.array(types[uk // k].tolist(),
                                  type=pa.string()),
            "next_type": pa.array(types[uk % k].tolist(),
                                  type=pa.string()),
            "n_part": pa.array(cnt, type=pa.int64()),
        })

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "prev_type": b.column("prev_type"),
            "next_type": b.column("next_type"),
            "n": pc.cast(b.column("n"), pa.int64()),
        })

    return (_read(sf_dir, "events",
                  ["event_id", "user_id", "ts", "event_type"])
            .map_batches(add_bucket, **_PYA)
            .groupby("bucket")
            .map_groups(bigrams, batch_format="pyarrow")
            .groupby(["prev_type", "next_type"])
            .aggregate(Sum("n_part", alias_name="n"))
            .map_batches(finish, **_PYA))


SQL_EVENT_TRANSITIONS = """
WITH s AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events)
SELECT prev_type, event_type AS next_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


def queries_r3e() -> dict:
    return {
        "events_unpivot": q_events_unpivot,
        "lang_argmax_doc": q_lang_argmax_doc,
        "docs_regex_extract": q_docs_regex_extract,
        "docs_zscore": q_docs_zscore,
        "event_transitions": q_event_transitions,
    }


def parity_sql_r3e() -> dict[str, str]:
    """DuckDB twins for the pytest parity gate (NOT driver oracles)."""
    return {
        "events_unpivot": _sql_events_unpivot(),
        "lang_argmax_doc": SQL_LANG_ARGMAX_DOC,
        "docs_regex_extract": SQL_DOCS_REGEX_EXTRACT,
        "docs_zscore": SQL_DOCS_ZSCORE,
        "event_transitions": SQL_EVENT_TRANSITIONS,
    }
