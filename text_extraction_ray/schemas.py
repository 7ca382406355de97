"""Canonical Arrow schemas (SURVEY.md SS1.3) — fixed + explicit, no inference.

Schema drift (int32 vs int64, string vs large_string) would threaten the
byte-stability of outputs across runs and scales, so every logical table is
declared here once and validated at the pipeline boundary.
"""

from __future__ import annotations

import pyarrow as pa

# input pages table — exactly the BASELINE.json input_hint shape
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),   # HTML bytes OR PDF bytes (sniffed) OR garbage
        ("text", pa.string()),   # crawl-provided WET-style text (input)
        ("lang", pa.string()),
    ]
)

SPAN = pa.struct([("start", pa.int64()), ("end", pa.int64())])

OUT = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("doc_type", pa.string()),       # html | pdf | feed | docx | xlsx
                                         # | pptx | odt | ods | odp | rtf
                                         # | doc | xls | ppt | epub | mhtml
                                         # | empty | unknown  (gzip/zstd
                                         # are transports: rows carry the
                                         # inner type)
        ("extracted_text", pa.string()),  # THE byte-identical payload
        ("spans", pa.list_(SPAN)),
        ("n_blocks_kept", pa.int32()),
        ("n_blocks_dropped", pa.int32()),
        ("parse_ok", pa.bool_()),
        ("error", pa.string()),
    ]
)

METRICS = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("stage", pa.string()),
        ("docs_in", pa.int64()),
        ("docs_out", pa.int64()),
        ("docs_failed", pa.int64()),
        ("blocks_kept", pa.int64()),
        ("blocks_dropped", pa.int64()),
        ("bytes_in", pa.int64()),
        ("bytes_out", pa.int64()),
        ("wall_s", pa.float64()),
    ]
)


REQUIRED_PAGES_COLUMNS = ("url", "warc_ts", "html", "lang")


def validate_pages_schema(schema: pa.Schema) -> None:
    """Fail fast on a wrong input shape (large_string/binary tolerated).

    The WET ``text`` column is optional: extraction never reads it, and the
    read should prune it (SURVEY: prune at the read)."""
    names = schema.names
    missing = [c for c in REQUIRED_PAGES_COLUMNS if c not in names]
    if missing:
        raise ValueError(
            f"pages schema missing columns {missing}; got {names}")
    extra = [c for c in names if c not in PAGES.names]
    if extra:
        raise ValueError(f"pages schema has unexpected columns {extra}")
    for name in names:
        got = schema.field(name).type
        want = PAGES.field(name).type
        if got == want:
            continue
        if want == pa.string() and got == pa.large_string():
            continue
        if want == pa.binary() and got == pa.large_binary():
            continue
        raise ValueError(f"pages column {name!r}: type {got} != {want}")
