"""Text-analysis batch functions over a documents-style table.

Language ID (stopword-vote heuristic), quality scoring, token counting and
rolling-hash fingerprinting — the per-document analyses a training-data
pipeline runs at corpus scale.  All are ``map_batches`` stages over Arrow
batches; counting ops use pyarrow.compute kernels (vectorized), the per-row
ops are bounded pure-Python loops over pre-extracted lists.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..core.stopwords import STOPWORDS, vote_lang

_TOKEN_PATTERN = r"\S+"
# BPE-ish word/number/punct splitter for subword-style counting
_BPEISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def fnv1a64(data: bytes) -> int:
    h = _FNV_OFFSET
    for b in data:
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds n_tokens (whitespace tokens) + n_subtokens (BPE-ish pieces).
    Idempotent about columns another stage already added (quality_batch
    also derives n_tokens), so analysis stages compose in any order."""
    text = batch.column(text_col)
    out = batch
    if "n_tokens" not in out.schema.names:
        n_tokens = pc.count_substring_regex(text, _TOKEN_PATTERN)
        out = out.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
    if "n_subtokens" not in out.schema.names:
        n_sub = pc.count_substring_regex(text, _BPEISH_PATTERN)
        out = out.append_column("n_subtokens", pc.cast(n_sub, pa.int64()))
    return out


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds CCNet-style quality features: alpha ratio, digit ratio, mean
    token length, stopword ratio (en), and a composite quality_ok flag."""
    text = batch.column(text_col)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_alpha = pc.cast(pc.count_substring_regex(text, r"[A-Za-z]"), pa.int64())
    n_digit = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, _TOKEN_PATTERN), pa.int64())
    denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
    tok_denom = pc.max_element_wise(n_tokens, pa.scalar(1, pa.int64()))
    alpha_ratio = pc.divide(pc.cast(n_alpha, pa.float64()),
                            pc.cast(denom, pa.float64()))
    digit_ratio = pc.divide(pc.cast(n_digit, pa.float64()),
                            pc.cast(denom, pa.float64()))
    mean_tok_len = pc.divide(pc.cast(n_chars, pa.float64()),
                             pc.cast(tok_denom, pa.float64()))
    en_stops = STOPWORDS["en"]
    stop_ratio = pa.array(
        [
            (sum(1 for w in (t or "").lower().split() if w in en_stops)
             / max(len((t or "").split()), 1))
            for t in text.to_pylist()
        ],
        type=pa.float64(),
    )
    quality_ok = pc.and_(
        pc.and_(pc.greater_equal(n_tokens, pa.scalar(5, pa.int64())),
                pc.greater(alpha_ratio, 0.5)),
        pc.less(digit_ratio, 0.3),
    )
    out = batch
    for name, arr in (
        ("n_tokens", n_tokens),
        ("alpha_ratio", alpha_ratio),
        ("digit_ratio", digit_ratio),
        ("mean_tok_len", mean_tok_len),
        ("stop_ratio", stop_ratio),
        ("quality_ok", quality_ok),
    ):
        if name not in out.schema.names:  # compose-safe (see token_count)
            out = out.append_column(name, arr)
    return out


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds lang_pred via the stopword-vote heuristic (SURVEY SS2.4 A3)."""
    preds = [vote_lang((t or "").split()) for t in
             batch.column(text_col).to_pylist()]
    return batch.append_column("lang_pred", pa.array(preds, type=pa.string()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      ngram: int = 5) -> pa.Table:
    """Adds fingerprint: min rolling FNV-1a hash over word n-grams
    (winnowing-style document fingerprint; 0 for docs shorter than n).
    All n-grams of the batch hash in one vectorized FNV pass
    (length-grouped byte matrices), min per doc via reduceat —
    bit-identical to the round-1 scalar loop."""
    import numpy as np

    from .dedup import _fnv1a64_many, _signed64

    texts = batch.column(text_col).to_pylist()
    grams: list[bytes] = []
    starts: list[int] = []        # docs with >= 1 n-gram only
    doc_idx: list[int] = []
    for d, t in enumerate(texts):
        words = (t or "").split()
        if len(words) < ngram:
            continue
        starts.append(len(grams))
        doc_idx.append(d)
        grams.extend(" ".join(words[i : i + ngram]).encode("utf-8")
                     for i in range(len(words) - ngram + 1))
    fps = np.zeros(len(texts), dtype=np.int64)
    if grams:
        hs = _fnv1a64_many(grams)
        mins = np.minimum.reduceat(hs, np.asarray(starts, dtype=np.int64))
        fps[doc_idx] = _signed64(mins)
    return batch.append_column("fingerprint", pa.array(fps, type=pa.int64()))
