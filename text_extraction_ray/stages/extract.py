"""Ray Data batch stages for extraction (SURVEY.md SS2.2 M1-M13, SS2.4).

Batch functions take/return ``pyarrow.Table`` (``batch_format="pyarrow"``,
``zero_copy_batch=True``).  The extractors are callable CLASSES so Ray hosts
them in actor pools: state (compiled regexes, entity table, stopword sets —
"compiled DOM heuristics", BASELINE.json north_star) is touched once per
actor in ``__init__``, batches flow through ``__call__``.  Logically they
are pure functions — tests run the same callables inline in one process and
get identical bytes (SURVEY SS2.4 note).
"""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.compute as pc

from ..core import dom as _dom  # noqa: F401  (forces regex compilation at import)
from ..core.extract import extract_document
from ..core.stopwords import STOPWORDS  # noqa: F401  (actor-resident state)
from ..schemas import OUT, SPAN, validate_pages_schema


def _out_table(rows: dict[str, list]) -> pa.Table:
    arrays = [
        pa.array(rows["url"], type=pa.string()),
        pa.array(rows["warc_ts"], type=pa.timestamp("us")),
        pa.array(rows["lang"], type=pa.string()),
        pa.array(rows["doc_type"], type=pa.string()),
        pa.array(rows["extracted_text"], type=pa.string()),
        pa.array(rows["spans"], type=pa.list_(SPAN)),
        pa.array(rows["n_blocks_kept"], type=pa.int32()),
        pa.array(rows["n_blocks_dropped"], type=pa.int32()),
        pa.array(rows["parse_ok"], type=pa.bool_()),
        pa.array(rows["error"], type=pa.string()),
    ]
    return pa.Table.from_arrays(arrays, schema=OUT)


class Extractor:
    """Actor-pool extraction stage (A1+A2 fused dispatch, SURVEY SS2.4).

    One instance handles every doc_type: the per-document sniff dispatches to
    the HTML or PDF path.  Used with::

        ds.map_batches(Extractor, concurrency=(2, N), batch_size=B,
                       batch_format="pyarrow", zero_copy_batch=True)

    Mirrors the reference's per-image OCR loop [RECON] — but batched,
    zero-copy, and hosted in a restartable pool.
    """

    def __init__(self, validate_schema: bool = True) -> None:
        # State construction happens at import of core modules: compiled
        # regexes (dom/_TAG_RE etc.), the html5 entity table, stopword sets.
        # Touch them so a broken environment fails at actor start, not
        # mid-batch.
        self._validate = validate_schema
        self._validated = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._validate and not self._validated:
            validate_pages_schema(pa.schema(
                [batch.schema.field(n) for n in batch.schema.names]))
            self._validated = True
        urls = batch.column("url").to_pylist()
        ts = batch.column("warc_ts").to_pylist()
        payloads = batch.column("html").to_pylist()
        langs = batch.column("lang").to_pylist()
        rows: dict[str, list] = {
            "url": urls, "warc_ts": ts, "lang": [], "doc_type": [],
            "extracted_text": [], "spans": [], "n_blocks_kept": [],
            "n_blocks_dropped": [], "parse_ok": [], "error": [],
        }
        for payload, lang in zip(payloads, langs):
            res = extract_document(payload or b"", lang or "")
            rows["lang"].append(res["lang"])
            rows["doc_type"].append(res["doc_type"])
            rows["extracted_text"].append(res["extracted_text"])
            rows["spans"].append(
                [{"start": s, "end": e} for s, e in res["spans"]])
            rows["n_blocks_kept"].append(res["n_blocks_kept"])
            rows["n_blocks_dropped"].append(res["n_blocks_dropped"])
            rows["parse_ok"].append(res["parse_ok"])
            rows["error"].append(res["error"])
        return _out_table(rows)


def sniff_batch(batch: pa.Table) -> pa.Table:
    """Stateless M1 routing stage: adds ``doc_type`` + ``n_bytes``.

    Vectorized where Arrow kernels exist (length, pdf-magic prefix); the
    markup sniff falls back to a bounded per-row check on the first 2 KiB.
    Only used by the routed pipeline variant — the single-pass variant
    sniffs inside the extractor and never rescans the input.
    """
    html = batch.column("html")
    n_bytes = pc.binary_length(html)
    payloads = html.to_pylist()
    from ..core.encoding import sniff_doc_type

    doc_type = pa.array(
        [sniff_doc_type(p or b"") for p in payloads], type=pa.string())
    out = batch.append_column("n_bytes", pc.cast(n_bytes, pa.int64()))
    return out.append_column("doc_type", doc_type)


def passthrough_empty_batch(batch: pa.Table) -> pa.Table:
    """OUT rows for empty/unknown payloads without invoking the extractor."""
    urls = batch.column("url").to_pylist()
    ts = batch.column("warc_ts").to_pylist()
    langs = batch.column("lang").to_pylist()
    types = batch.column("doc_type").to_pylist()
    n = len(urls)
    rows = {
        "url": urls,
        "warc_ts": ts,
        "lang": [l or "" for l in langs],
        "doc_type": types,
        "extracted_text": [""] * n,
        "spans": [[] for _ in range(n)],
        "n_blocks_kept": [0] * n,
        "n_blocks_dropped": [0] * n,
        "parse_ok": [t == "empty" for t in types],
        "error": ["" if t == "empty" else "payload is neither markup nor pdf"
                  for t in types],
    }
    return _out_table(rows)


def metrics_from_out_batch(batch: pa.Table, stage: str = "extract") -> dict:
    """Partial METRICS aggregation for one OUT batch (G1 combiner side)."""
    kept = pc.sum(batch.column("n_blocks_kept")).as_py() or 0
    dropped = pc.sum(batch.column("n_blocks_dropped")).as_py() or 0
    failed = pc.sum(
        pc.cast(pc.invert(batch.column("parse_ok")), pa.int64())).as_py() or 0
    bytes_out = pc.sum(
        pc.binary_length(batch.column("extracted_text"))).as_py() or 0
    return {
        "stage": stage,
        "docs_in": batch.num_rows,
        "docs_out": batch.num_rows,
        "docs_failed": failed,
        "blocks_kept": kept,
        "blocks_dropped": dropped,
        "bytes_out": bytes_out,
        "wall_s": 0.0,
        "ts": time.time(),
    }
