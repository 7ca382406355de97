"""Mini BPE: distributed word-frequency pass + driver merge loop +
broadcast tokenizer stage.

Classic byte-pair-encoding training factors into (a) a word-frequency
table — the ONLY part that touches the corpus, one map-side-combined
``groupby(word).Sum`` here — and (b) a merge loop over that table,
which is driver-side by nature (every iteration needs the global
argmax pair; the table is vocabulary-sized, not corpus-sized).  At
crawl scale the word table is Zipf-truncated to the top-K words first
(distributed top-k, never a full sort) — standard practice (the tail
contributes ~nothing to pair counts) and what BOUNDS the driver state;
the truncation is logged.

Encoding broadcasts the merge ranks once and applies them greedily
(lowest rank first — the canonical BPE apply order) inside
``map_batches``.  Reference semantics pinned in
tests/test_queries_r3u.py against an independent textbook
implementation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

END = "</w>"   # word-end marker so merges can't cross word boundaries


def word_count_partials(b: pa.Table, text_col: str = "text") -> pa.Table:
    """Map-side combined (word, n) rows for one batch."""
    counts: dict[str, int] = {}
    for text in b.column(text_col).to_pylist():
        for w in text.split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    return pa.table({
        "word": pa.array(list(counts.keys()), pa.string()),
        "n": pa.array(np.fromiter(counts.values(), dtype=np.int64,
                                  count=len(counts))),
    })


def corpus_word_freq(ds, text_col: str = "text", top_k: int = 65536):
    """Distributed word-frequency table, Zipf-truncated to ``top_k``
    rows (count desc, word asc — deterministic) before the driver
    collect.  Returns (list[(word, n)], n_dropped)."""
    import logging

    from ray.data.aggregate import Sum

    # materialize once: count, the top-k prune and the collect below
    # would each re-execute the aggregate otherwise (bounded hold —
    # it's the post-aggregation word table)
    wf = (ds.map_batches(lambda b: word_count_partials(b, text_col),
                         batch_format="pyarrow")
          .groupby("word").aggregate(Sum("n", alias_name="n"))
          .materialize())
    total = wf.count()
    if total > top_k:
        logging.getLogger(__name__).warning(
            "BPE word table %d > top_k %d: tail truncated", total, top_k)
        from .topk import topk as distributed_topk

        wf = distributed_topk(wf, ["n", "word"], top_k,
                              descending=[True, False])
    df = wf.to_pandas().sort_values(
        ["n", "word"], ascending=[False, True]).head(top_k)
    return list(zip(df["word"], df["n"].astype(int))), max(0, total - top_k)


def train_bpe(word_freq: list[tuple[str, int]],
              n_merges: int = 64) -> list[tuple[str, str]]:
    """Greedy BPE merge learning over a word-frequency table.  Pair
    ties break lexicographically (deterministic regardless of dict
    order).  Words are character sequences with a terminal END mark."""
    seqs = [tuple(w) + (END,) for w, _ in word_freq]
    freqs = [n for _, n in word_freq]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for seq, n in zip(seqs, freqs):
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        out = []
        for seq in seqs:
            s, i, n = [], 0, len(seq)
            while i < n:
                if (i + 1 < n and seq[i] == best[0]
                        and seq[i + 1] == best[1]):
                    s.append(merged)
                    i += 2
                else:
                    s.append(seq[i])
                    i += 1
            out.append(tuple(s))
        seqs = out
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges lowest-rank-first (canonical BPE apply)."""
    seq = list(word) + [END]
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i: best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


class BpeEncoder:
    """Actor-pool stage: merge ranks fetched once per actor; per-word
    encodings memoized (Zipf again — the cache hit rate is the word
    frequency curve)."""

    def __init__(self, merges_ref, text_col: str = "text"):
        import ray

        merges = ray.get(merges_ref)
        self.ranks = {p: i for i, p in enumerate(merges)}
        self.text_col = text_col
        self.cache: dict[str, int] = {}

    def _n_pieces(self, w: str) -> int:
        n = self.cache.get(w)
        if n is None:
            n = self.cache[w] = len(encode_word(w, self.ranks))
        return n

    def __call__(self, b: pa.Table) -> pa.Table:
        n_words, n_pieces = [], []
        for text in b.column(self.text_col).to_pylist():
            words = [w for w in text.split(" ") if w]
            n_words.append(len(words))
            n_pieces.append(sum(self._n_pieces(w) for w in words))
        out = b.drop_columns([self.text_col])
        out = out.append_column("n_words",
                                pa.array(n_words, pa.int64()))
        return out.append_column("n_pieces",
                                 pa.array(n_pieces, pa.int64()))
