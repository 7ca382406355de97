"""Batch-AA: retrieval pairs + hard-negative mining."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _local_extracted():
    """url -> extracted_text via the INDEPENDENT oracle extractor with
    the url-keyed keep-latest rule."""
    import os

    from oracle.extract import extract_one

    from text_extraction_ray.pipelines.queries_r3aa import _linked_corpus

    corpus = _linked_corpus(SF_DIR)
    rows = []
    for f in sorted(os.listdir(corpus)):
        if f.endswith(".parquet"):
            rows.extend(pq.read_table(os.path.join(corpus, f)).to_pylist())
    best = {}
    for r in rows:
        k = r["url"]
        if k not in best or r["warc_ts"] > best[k]["warc_ts"]:
            best[k] = r
    out = {}
    for u, r in best.items():
        res = extract_one(u, r["html"] or b"", r["lang"] or "")
        if res["parse_ok"] and res["extracted_text"]:
            out[u] = res["extracted_text"]
    return out


def test_retrieval_pairs_match_local_recompute():
    from text_extraction_ray.core.encoding import decode_html
    from text_extraction_ray.core.links import extract_anchors, resolve_url
    from text_extraction_ray.pipelines.queries_r3aa import (_linked_corpus,
                                                            q_retrieval_pairs)
    import os

    got = (q_retrieval_pairs(SF_DIR).to_pandas()
           .sort_values(["anchor", "dst_url"]).reset_index(drop=True))
    texts = _local_extracted()

    corpus = _linked_corpus(SF_DIR)
    pairs = {}
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
            for href, txt in extract_anchors(text):
                if not txt:
                    continue
                absu = resolve_url(r["url"], href)
                if absu in texts:
                    sha = hashlib.sha256(
                        texts[absu].encode("utf-8")).hexdigest()[:16]
                    pairs[(txt, absu)] = (sha, len(texts[absu]))
    want = (pd.DataFrame(
        [(a, d, s, n) for (a, d), (s, n) in pairs.items()],
        columns=["anchor", "dst_url", "text_sha", "n_chars"])
        .sort_values(["anchor", "dst_url"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 100     # the linked fixture is not vacuous


def test_hard_negatives_match_local_recompute():
    from text_extraction_ray.functions.embed import embed_text
    from text_extraction_ray.pipelines.queries_r3aa import (
        HN_K, HN_QUERIES, q_retrieval_hard_negatives, q_retrieval_pairs)

    got = (q_retrieval_hard_negatives(SF_DIR).to_pandas()
           .sort_values(["anchor", "neg_rank"]).reset_index(drop=True))
    texts = _local_extracted()
    urls = sorted(texts)
    mat = np.stack([embed_text(texts[u]) for u in urls])

    pairs = (q_retrieval_pairs(SF_DIR).to_pandas()
             [["anchor", "dst_url"]]
             .sort_values(["anchor", "dst_url"])
             .drop_duplicates("anchor")
             .head(HN_QUERIES))
    rows = []
    for anchor, pos in pairs.itertuples(index=False, name=None):
        q = embed_text(anchor)
        cos = np.round(mat @ q, 6)
        order = np.lexsort((urls, -cos))
        rank = 0
        for i in order:
            if urls[i] == pos:
                continue
            rows.append((anchor, pos, urls[i], rank, cos[i]))
            rank += 1
            if rank == HN_K:
                break
    want = (pd.DataFrame(rows, columns=[
        "anchor", "pos_url", "neg_url", "neg_rank", "cos_neg"])
        .sort_values(["anchor", "neg_rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got.neg_url != got.pos_url).all()
    assert len(got) == HN_QUERIES * HN_K
