"""Batch-AC: host reciprocity + KWIC concordance."""

import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def test_reciprocal_links_match_local_recompute():
    import os

    from text_extraction_ray.core.encoding import decode_html
    from text_extraction_ray.core.links import (extract_hrefs, host_of,
                                                resolve_url)
    from text_extraction_ray.pipelines.queries_r3aa import _linked_corpus
    from text_extraction_ray.pipelines.queries_r3ac import (
        q_host_reciprocal_links)

    got = (q_host_reciprocal_links(SF_DIR).to_pandas()
           .sort_values(["lo", "hi"]).reset_index(drop=True))

    corpus = _linked_corpus(SF_DIR)
    agg = {}
    for f in sorted(os.listdir(corpus)):
        if not f.endswith(".parquet"):
            continue
        for r in pq.read_table(os.path.join(corpus, f),
                               columns=["url", "html"]).to_pylist():
            payload = r["html"]
            if payload is None:
                continue
            text = decode_html(payload)[0] if isinstance(payload, bytes) \
                else str(payload)
            s = host_of(r["url"])
            for href in extract_hrefs(text):
                absu = resolve_url(r["url"], href)
                if absu is None:
                    continue
                d = host_of(absu)
                if s == d:
                    continue
                lo, hi = min(s, d), max(s, d)
                cell = agg.setdefault((lo, hi), [0, 0])
                cell[0 if s == lo else 1] += 1
    rows = [(lo, hi, f, r, f > 0 and r > 0)
            for (lo, hi), (f, r) in sorted(agg.items())]
    want = pd.DataFrame(rows, columns=[
        "lo", "hi", "n_fwd", "n_rev", "reciprocal"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.reciprocal.sum() > 0          # fixture has mutual pairs
    assert (~got.reciprocal).sum() > 0       # and one-way pairs


def test_kwic_matches_local_recompute_and_caps():
    from text_extraction_ray.pipelines.queries_r3ac import (KWIC_CTX,
                                                            KWIC_PER_DOC,
                                                            KWIC_TERM,
                                                            q_kwic_search)

    got = (q_kwic_search(SF_DIR).to_pandas()
           .sort_values(["doc_id", "pos"]).reset_index(drop=True))
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"])
    rows = []
    for did, text in zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()):
        words = text.split(" ")
        hits = [j for j, w in enumerate(words) if w == KWIC_TERM]
        for j in hits[:KWIC_PER_DOC]:
            rows.append((did, j,
                         " ".join(words[max(0, j - KWIC_CTX):j]),
                         " ".join(words[j + 1:j + 1 + KWIC_CTX]),
                         len(hits)))
    want = (pd.DataFrame(rows, columns=[
        "doc_id", "pos", "left_ctx", "right_ctx", "n_hits"])
        .sort_values(["doc_id", "pos"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got.groupby("doc_id").size() <= KWIC_PER_DOC).all()
    assert len(got) > 0
