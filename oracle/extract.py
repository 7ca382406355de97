"""Single-process reference extractor — the byte-identity oracle.

SURVEY.md SS0.2: the reference repo checkout is empty in this sandbox, so
the repo must *contain* the oracle the north_rule's "byte-identical
extracted text per url" is measured against.  This module is it: pure
Python, no Ray, no Arrow — it walks rows one at a time exactly like the
reference's sequential script [RECON] and calls the same published
jusText/Boilerpipe + cell-grid semantics the distributed pipeline uses.

``python -m pytest -x -q`` freezes this module's outputs into goldens and
asserts the Ray pipeline reproduces them byte-for-byte per url.
"""

from __future__ import annotations

import hashlib

from text_extraction_ray.core.extract import extract_document


def extract_one(url: str, payload: bytes, lang: str = "") -> dict:
    """Extract a single document; adds url + sha256 of the text bytes."""
    res = extract_document(payload, lang)
    res["url"] = url
    res["sha256"] = hashlib.sha256(res["extracted_text"].encode("utf-8")).hexdigest()
    return res


def extract_corpus(rows) -> list[dict]:
    """Sequential oracle run over (url, html, lang) rows, sorted by url."""
    out = [extract_one(r["url"], r["html"], r["lang"]) for r in rows]
    out.sort(key=lambda r: r["url"])
    return out
