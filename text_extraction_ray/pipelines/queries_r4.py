"""Round-4 batch: filter-chain + encryption parity in the registry.

`pdf_filter_parity` is the registry-facing twin of the M10e pytest
suite (tests/test_pdf_filters.py): per document it builds the SAME page
content under every round-4 stream-filter spec, extracts each through
core/pdf.py's filter chain, and reports how many distinct extracted
texts it saw.  Self-verifying by construction — the oracle row is the
constant (n_variants=6, n_distinct=1, has_text=TRUE) per doc — the
`cust_with_urgent_bloom` precedent of several physical plans behind one
oracle, here several PHYSICAL ENCODINGS behind one logical document.
Registered through the parity harness so the driver's pinned 50-row
window is untouched (queries.py layout note).

`pdf_encrypt_parity` (M10f/M10g, tests/test_pdf_crypt.py) is the same
shape over the standard security handler: plaintext vs RC4-40 vs
RC4-128 (± Flate) vs AES-128 /AESV2 (± Flate) builds of one document
must extract identically — the empty-user-password decrypt paths
(core/pdf_crypt.py + core/aes.py) proven per doc.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

_PYA = {"batch_format": "pyarrow", "zero_copy_batch": True}

_SPECS = (False, "flate", "lzw", "a85+flate", "rl", "flate-pred")


def _parity_batch(batch: pa.Table) -> pa.Table:
    from ..core.pdf import extract_pdf
    from ..core.pdf_write import PageBuilder, build_pdf

    ids = batch.column("doc_id").to_pylist()
    n_var, n_distinct, has_text = [], [], []
    for i in ids:
        texts = set()
        ok = True
        for spec in _SPECS:
            pb = PageBuilder()
            pb.text_lines([f"Filter parity doc {i} line {j} for the "
                           f"round four chain." for j in range(3)])
            pb.table([[str((i + r * 3 + c) % 10) for c in range(3)]
                      for r in range(2)])
            res = extract_pdf(build_pdf([pb], compress=spec))
            texts.add(res["extracted_text"])
            ok = ok and bool(res["extracted_text"])
        n_var.append(len(_SPECS))
        n_distinct.append(len(texts))
        has_text.append(ok)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "n_variants": pa.array(n_var, type=pa.int64()),
        "n_distinct": pa.array(n_distinct, type=pa.int64()),
        "has_text": pa.array(has_text, type=pa.bool_()),
    })


def q_pdf_filter_parity(sf_dir: str) -> ray.data.Dataset:
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(_parity_batch, **_PYA))


# --- pdf_encrypt_parity (M10f): encrypted == plaintext, per document ----

_ENC_SPECS = (False, "rc4-40", "rc4-128", ("rc4-128", "flate"),
              "aes-128", ("aes-128", "flate"))


def _encrypt_parity_batch(batch: pa.Table) -> pa.Table:
    from ..core.pdf import extract_pdf
    from ..core.pdf_write import PageBuilder, build_pdf

    ids = batch.column("doc_id").to_pylist()
    n_var, n_distinct, has_text = [], [], []
    for i in ids:
        texts = set()
        ok = True
        for spec in _ENC_SPECS:
            enc, comp = (spec if isinstance(spec, tuple) else (spec, False))
            pb = PageBuilder()
            pb.text_lines([f"Standard-security doc {i} paragraph line "
                           f"{j} under handler parity." for j in range(3)])
            pb.table([[str((i + r * 2 + c) % 10) for c in range(3)]
                      for r in range(2)])
            res = extract_pdf(build_pdf([pb], compress=comp, encrypt=enc))
            texts.add(res["extracted_text"])
            ok = ok and bool(res["extracted_text"])
        n_var.append(len(_ENC_SPECS))
        n_distinct.append(len(texts))
        has_text.append(ok)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "n_variants": pa.array(n_var, type=pa.int64()),
        "n_distinct": pa.array(n_distinct, type=pa.int64()),
        "has_text": pa.array(has_text, type=pa.bool_()),
    })


def q_pdf_encrypt_parity(sf_dir: str) -> ray.data.Dataset:
    from .queries import read_table

    return (read_table(sf_dir, "documents", ["doc_id"])
            .map_batches(_encrypt_parity_batch, **_PYA))


SQL_PDF_FILTER_PARITY = """
SELECT doc_id,
       CAST(6 AS BIGINT) AS n_variants,
       CAST(1 AS BIGINT) AS n_distinct,
       TRUE AS has_text
FROM documents
"""


SQL_PDF_ENCRYPT_PARITY = """
SELECT doc_id,
       CAST(6 AS BIGINT) AS n_variants,
       CAST(1 AS BIGINT) AS n_distinct,
       TRUE AS has_text
FROM documents
"""


def queries_r4() -> dict:
    return {"pdf_filter_parity": q_pdf_filter_parity,
            "pdf_encrypt_parity": q_pdf_encrypt_parity}


def parity_sql_r4() -> dict[str, str]:
    return {"pdf_filter_parity": SQL_PDF_FILTER_PARITY,
            "pdf_encrypt_parity": SQL_PDF_ENCRYPT_PARITY}
