"""Round-3 continuation batch U: learned models over the corpus —
hashed Naive Bayes classification + mini-BPE subword training.

- ``pages_nb_confusion`` — multinomial Naive Bayes (hashed-feature,
  fasttext-shaped; functions/nbayes.py) trained on the synthetic
  crawl's OWN extracted text to predict page language, then scored
  over the same pages; output is the confusion matrix
  (label, pred, n).  Train is one bounded (label, h) aggregate
  (state ≤ classes × 2¹⁶ buckets by the hashing trick — bounded BY
  CONSTRUCTION, not by corpus vocabulary); scoring broadcasts the
  ~1 MB dense model once into an actor pool.  The languages have
  distinct stopword/content lexica, so the matrix is
  diagonal-dominant AND exactly equal to a single-process float64
  recompute — both pinned in pytest.
- ``docs_bpe_stats`` — BPE subword statistics under merges LEARNED
  from the corpus (functions/bpe.py): distributed word-frequency
  pass (Zipf-truncated top-k above a cap, logged) → driver merge
  loop over the vocabulary-sized table → merge ranks broadcast into
  an encoding actor pool (per-word memoized) → per-lang
  (n_docs, n_words, n_pieces, pieces_per_word).  Merge semantics are
  pinned against an independent textbook BPE in pytest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ..functions.bpe import BpeEncoder, corpus_word_freq, train_bpe
from ..functions.nbayes import NBScorer, train_nb

from .extraction import default_concurrency as _conc

_PYA = {"batch_format": "pyarrow"}

BPE_MERGES = 64


def _read(sf_dir: str, table: str, columns: list[str]):
    from .queries import read_table

    return read_table(sf_dir, table, columns)


def q_pages_nb_confusion(sf_dir: str) -> ray.data.Dataset:
    """NB language-ID trained on the crawl's own extracted text.

    The synthetic languages have disjoint-ish stopword/content lexica
    (sources/synth.py:_STOPS/_CONTENT), so the learned model is
    genuinely predictive — the confusion matrix is diagonal-dominant
    (asserted in pytest alongside the exact-parity check).  The
    extraction output is materialized once (2 pruned columns) because
    train and score both consume it; in production both passes read
    the already-written extraction OUT parquet instead."""
    from ..stages.extract import Extractor
    from .extraction import read_pages
    from .queries_r3s import _corpus_pages  # noqa: F401  (corpus gen)

    import os
    import tempfile

    from ..sources.synth import gen_corpus

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    corpus = os.path.join(tempfile.gettempdir(), f"tx_pages_{tag}")
    gen_corpus(corpus, 500, seed=42, n_shards=8)
    out = (read_pages(corpus)
           .map_batches(Extractor, concurrency=_conc(), **_PYA)
           .filter(expr="parse_ok == True")
           .filter(expr="extracted_text != ''")
           .select_columns(["lang", "extracted_text"])
           .materialize())
    model_ref = ray.put(train_nb(out, "extracted_text", "lang"))
    return (out.map_batches(
                NBScorer,
                fn_constructor_kwargs={"model_ref": model_ref,
                                       "text_col": "extracted_text"},
                concurrency=_conc(), **_PYA)
            .groupby(["label", "pred"])
            .aggregate(Count(alias_name="n")))


def q_docs_bpe_stats(sf_dir: str) -> ray.data.Dataset:
    docs = _read(sf_dir, "documents", ["text", "lang"])
    wf, _dropped = corpus_word_freq(docs, "text")
    merges_ref = ray.put(train_bpe(wf, BPE_MERGES))
    stats = (docs.map_batches(
                 BpeEncoder,
                 fn_constructor_kwargs={"merges_ref": merges_ref},
                 concurrency=_conc(), **_PYA)
             .groupby("lang")
             .aggregate(Count(alias_name="n_docs"),
                        Sum("n_words", alias_name="n_words"),
                        Sum("n_pieces", alias_name="n_pieces")))

    def ratio(b: pa.Table) -> pa.Table:
        w = b.column("n_words").to_numpy(zero_copy_only=False).astype(
            np.float64)
        p = b.column("n_pieces").to_numpy(zero_copy_only=False).astype(
            np.float64)
        r = p / w
        q = 10.0 ** 6
        return b.append_column(
            "pieces_per_word",
            pa.array(np.sign(r) * np.floor(np.abs(r) * q + 0.5) / q))

    return stats.map_batches(ratio, **_PYA)


def queries_r3u() -> dict:
    return {
        "pages_nb_confusion": q_pages_nb_confusion,
        "docs_bpe_stats": q_docs_bpe_stats,
    }
