"""Batch-U: hashed Naive Bayes + mini-BPE."""

import numpy as np
import pandas as pd
import pyarrow as pa

SF_DIR = "/root/testdata/sf0.001"


def test_nb_confusion_exact_and_diagonal():
    """Distributed train+score == single-process float64 recompute on
    the same rows (count aggregation is exact integer math, scoring is
    the same per-doc dot product), and the matrix is diagonal-dominant
    (the synthetic languages are genuinely separable)."""
    import ray

    from text_extraction_ray.functions.nbayes import train_nb
    from text_extraction_ray.pipelines.queries_r3u import (
        q_pages_nb_confusion)
    from text_extraction_ray.stages.extract import Extractor
    from text_extraction_ray.pipelines.extraction import read_pages
    import os
    import tempfile

    from text_extraction_ray.sources.synth import gen_corpus

    got = (q_pages_nb_confusion(SF_DIR).to_pandas()
           .sort_values(["label", "pred"]).reset_index(drop=True))

    tag = os.path.basename(os.path.normpath(SF_DIR)) or "sf"
    corpus = os.path.join(tempfile.gettempdir(), f"tx_pages_{tag}")
    gen_corpus(corpus, 500, seed=42, n_shards=8)
    out = (read_pages(corpus)
           .map_batches(Extractor, concurrency=2, batch_format="pyarrow")
           .filter(expr="parse_ok == True")
           .filter(expr="extracted_text != ''")
           .select_columns(["lang", "extracted_text"]))
    rows = out.take_all()
    model = train_nb(ray.data.from_items(rows),
                     "extracted_text", "lang")
    counts = {}
    for r in rows:
        k = (r["lang"], model.predict(r["extracted_text"]))
        counts[k] = counts.get(k, 0) + 1
    want = (pd.DataFrame(
        [(a, b, n) for (a, b), n in counts.items()],
        columns=["label", "pred", "n"])
        .sort_values(["label", "pred"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    diag = got[got.label == got.pred].n.sum()
    assert diag / got.n.sum() > 0.8


def test_bpe_merges_match_textbook():
    """train_bpe == an independent dict-based reference implementation
    (the classic Sennrich example table)."""
    from text_extraction_ray.functions.bpe import END, train_bpe

    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]

    def reference(word_freq, n_merges):
        vocab = {tuple(w) + (END,): n for w, n in word_freq}
        merges = []
        for _ in range(n_merges):
            pairs = {}
            for seq, n in vocab.items():
                for i in range(len(seq) - 1):
                    pairs[(seq[i], seq[i + 1])] = pairs.get(
                        (seq[i], seq[i + 1]), 0) + n
            if not pairs:
                break
            best = min(pairs, key=lambda p: (-pairs[p], p))
            if pairs[best] < 2:
                break
            merges.append(best)
            new = {}
            for seq, n in vocab.items():
                s, i = [], 0
                while i < len(seq):
                    if (i + 1 < len(seq) and (seq[i], seq[i + 1]) == best):
                        s.append(seq[i] + seq[i + 1])
                        i += 2
                    else:
                        s.append(seq[i])
                        i += 1
                new[tuple(s)] = n
            vocab = new
        return merges

    for m in (1, 4, 10, 64):
        assert train_bpe(wf, m) == reference(wf, m), m


def test_encode_word_canonical_order():
    """Merges apply lowest-rank-first regardless of position."""
    from text_extraction_ray.functions.bpe import END, encode_word

    ranks = {("e", "s"): 0, ("es", "t"): 1, ("est", END): 2,
             ("l", "o"): 3, ("lo", "w"): 4}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est" + END]
    assert encode_word("lowest", ranks) == ["low", "est" + END]
    assert encode_word("xyz", ranks) == ["x", "y", "z", END]


def test_bpe_stats_parity_and_bounds():
    """Per-lang distributed stats == local encode_word recompute; the
    learned merges genuinely compress (pieces_per_word strictly less
    than raw chars-per-word + END)."""
    import pyarrow.parquet as pq

    from text_extraction_ray.functions.bpe import (corpus_word_freq,
                                                   encode_word, train_bpe)
    from text_extraction_ray.pipelines.queries_r3u import (BPE_MERGES,
                                                           q_docs_bpe_stats)

    got = (q_docs_bpe_stats(SF_DIR).to_pandas()
           .sort_values("lang").reset_index(drop=True))

    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["text", "lang"])
    wf = {}
    for text in t.column("text").to_pylist():
        for w in text.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    merges = train_bpe(sorted(wf.items(), key=lambda kv: (-kv[1], kv[0])),
                       BPE_MERGES)
    ranks = {p: i for i, p in enumerate(merges)}
    agg = {}
    for text, lang in zip(t.column("text").to_pylist(),
                          t.column("lang").to_pylist()):
        words = [w for w in text.split(" ") if w]
        pieces = sum(len(encode_word(w, ranks)) for w in words)
        d = agg.setdefault(lang, [0, 0, 0])
        d[0] += 1
        d[1] += len(words)
        d[2] += pieces
    rows = []
    for lang in sorted(agg):
        n_docs, n_words, n_pieces = agg[lang]
        r = n_pieces / n_words
        rows.append((lang, n_docs, n_words, n_pieces,
                     np.floor(r * 1e6 + 0.5) / 1e6))
    want = pd.DataFrame(rows, columns=[
        "lang", "n_docs", "n_words", "n_pieces", "pieces_per_word"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # compression sanity: every word ends with END, so raw pieces per
    # word would be len(word)+1 ≥ 2; merged must be strictly below 3
    # on this corpus of short repeated words
    assert (got.pieces_per_word < 3.0).all()
    assert (got.pieces_per_word >= 1.0).all()


def test_word_freq_topk_truncation():
    import ray.data

    from text_extraction_ray.functions.bpe import corpus_word_freq

    ds = ray.data.from_items(
        [{"text": "a a a b b c"}, {"text": "a b d e"}])
    wf, dropped = corpus_word_freq(ds, "text", top_k=3)
    assert [w for w, _ in wf] == ["a", "b", "c"]  # count desc, word asc
    assert dict(wf)["a"] == 4 and dict(wf)["b"] == 3
    assert dropped == 2
