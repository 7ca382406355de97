"""Freeze oracle outputs into golden fixtures (SURVEY S6, FIXTURES SS2).

Run once (and after any params.py change):

    python -m oracle.freeze

Writes ``tests/golden/golden_tiny.parquet`` with the per-url extracted
bytes, sha256, spans and the params hash that produced them.  The pytest
suite regenerates the tiny corpus deterministically and fails loudly if the
frozen params_hash differs from the live one.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from text_extraction_ray.params import params_hash
from text_extraction_ray.sources.synth import make_row
from .extract import extract_one

TINY_ROWS = 200
GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                           "golden_tiny.parquet")

SPAN = pa.struct([("start", pa.int64()), ("end", pa.int64())])
GOLDEN_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("extracted_text", pa.string()),
        ("sha256", pa.string()),
        ("spans", pa.list_(SPAN)),
        ("doc_type", pa.string()),
        ("lang", pa.string()),
        ("parse_ok", pa.bool_()),
        ("n_blocks_kept", pa.int32()),
        ("n_blocks_dropped", pa.int32()),
        ("params_hash", pa.string()),
    ]
)


def tiny_corpus_rows(n: int = TINY_ROWS) -> list[dict]:
    return [make_row(i) for i in range(n)]


def freeze(path: str = GOLDEN_PATH, n: int = TINY_ROWS) -> str:
    rows = tiny_corpus_rows(n)
    # keep-latest per url (duplicate urls carry identical payloads by
    # construction — FIXTURES SS1 — so extraction is url-unique)
    seen: dict[str, dict] = {}
    for r in rows:
        prev = seen.get(r["url"])
        if prev is None or r["warc_ts"] > prev["warc_ts"]:
            seen[r["url"]] = r
    results = [extract_one(r["url"], r["html"], r["lang"])
               for r in sorted(seen.values(), key=lambda r: r["url"])]
    ph = params_hash()
    cols = {
        "url": [r["url"] for r in results],
        "extracted_text": [r["extracted_text"] for r in results],
        "sha256": [r["sha256"] for r in results],
        "spans": [[{"start": s, "end": e} for s, e in r["spans"]] for r in results],
        "doc_type": [r["doc_type"] for r in results],
        "lang": [r["lang"] for r in results],
        "parse_ok": [r["parse_ok"] for r in results],
        "n_blocks_kept": [r["n_blocks_kept"] for r in results],
        "n_blocks_dropped": [r["n_blocks_dropped"] for r in results],
        "params_hash": [ph] * len(results),
    }
    table = pa.Table.from_pydict(cols, schema=GOLDEN_SCHEMA)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(table, path)
    return path


if __name__ == "__main__":
    p = freeze()
    print(f"froze goldens → {p} (params_hash={params_hash()})")
