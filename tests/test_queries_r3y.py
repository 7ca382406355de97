"""Batch-Y: CDC template detection + random-projection ANN."""

import numpy as np
import pandas as pd
import pyarrow as pa

SF_DIR = "/root/testdata/sf0.001"


def test_cdc_boundaries_content_defined():
    """Boundaries re-synchronize after an insertion: the chunk sets of
    a page and its shifted copy overlap heavily (the fixed-offset
    blocking failure mode this exists to avoid)."""
    from text_extraction_ray.functions.cdc import cdc_chunks

    rng = np.random.RandomState(7)
    base = bytes(rng.randint(32, 127, 4096, dtype=np.uint8))
    shifted = b"INSERTED PREFIX >>> " + base
    a = {c for c in cdc_chunks(base)}
    b = {c for c in cdc_chunks(shifted)}
    shared = sum(len(c) for c in a & b)
    assert shared / len(base) > 0.8
    # split is a partition: concatenation restores the payload
    assert b"".join(cdc_chunks(base)) == base
    assert cdc_chunks(b"") == []
    assert cdc_chunks(b"tiny") == [b"tiny"]


def test_host_template_planted_signal():
    """A host whose pages share a big literal sidebar scores far above
    a host of fully unique pages — through the real Ray stages."""
    import ray.data

    from ray.data.aggregate import Sum

    from text_extraction_ray.functions.cdc import (fold_host_template,
                                                   host_template_rows)

    rng = np.random.RandomState(11)
    sidebar = bytes(rng.randint(32, 127, 1500, dtype=np.uint8))
    tpl_pages = [sidebar + bytes(rng.randint(32, 127, 500, dtype=np.uint8))
                 for _ in range(6)]
    uniq_pages = [bytes(rng.randint(32, 127, 2000, dtype=np.uint8))
                  for _ in range(6)]
    rows = []
    for i, p in enumerate(tpl_pages):
        rows.append({"url": f"https://tpl.example/p{i}", "html": p})
    for i, p in enumerate(uniq_pages):
        rows.append({"url": f"https://uniq.example/p{i}", "html": p})
    ds = ray.data.from_items(rows)
    reduced = (ds.map_batches(host_template_rows,
                              batch_format="pyarrow")
               .groupby(["host", "ch", "marker"])
               .aggregate(Sum("n", alias_name="n"),
                          Sum("nb", alias_name="nb")))
    got = (reduced.groupby("host")
           .map_groups(fold_host_template, batch_format="pyarrow")
           .to_pandas().set_index("host"))
    assert got.loc["tpl.example", "template_ratio"] > 0.5
    assert got.loc["uniq.example", "template_ratio"] < 0.05
    assert got.loc["tpl.example", "n_pages"] == 6


def test_host_template_matches_local_recompute():
    from collections import defaultdict

    from text_extraction_ray.core.encoding import decode_html  # noqa: F401
    from text_extraction_ray.functions.cdc import (TEMPLATE_FRACTION,
                                                   cdc_chunks)
    from text_extraction_ray.pipelines.queries_r3s import _corpus_pages
    from text_extraction_ray.pipelines.queries_r3y import (
        q_host_template_ratio)
    from text_extraction_ray.functions.dedup import _fnv1a64_many

    got = (q_host_template_ratio(SF_DIR).to_pandas()
           .sort_values("host").reset_index(drop=True))

    freq = defaultdict(lambda: defaultdict(int))   # host -> ch -> pages
    size = defaultdict(dict)                       # host -> ch -> bytes
    pages = defaultdict(int)
    total = defaultdict(int)
    for r in _corpus_pages(SF_DIR).iter_rows():
        raw = r["html"] if isinstance(r["html"], bytes) \
            else str(r["html"]).encode("utf-8")
        host = r["url"].split("/", 3)[2]
        chunks = cdc_chunks(raw)
        if not chunks:
            continue
        hv = _fnv1a64_many(chunks).view(np.int64)
        pages[host] += 1
        total[host] += sum(len(c) for c in chunks)
        seen = {}
        for h, c in zip(hv.tolist(), chunks):
            if h not in seen:
                seen[h] = len(c)
        for h, ln in seen.items():
            freq[host][h] += 1
            size[host][h] = ln
    rows = []
    for host in sorted(pages):
        need = max(2, int(np.ceil(TEMPLATE_FRACTION * pages[host])))
        tpl = sum(size[host][h] * n for h, n in freq[host].items()
                  if n >= need)
        ratio = tpl / total[host] if total[host] else 0.0
        rows.append((host, pages[host], len(freq[host]),
                     np.floor(ratio * 1e6 + 0.5) / 1e6))
    want = pd.DataFrame(rows, columns=[
        "host", "n_pages", "n_chunks", "template_ratio"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ann_rp_candidates_recall_and_exact_scores():
    """Returned scores are EXACT cosines (rescoring guarantees it) and
    candidate recall vs brute force is >= 0.8."""
    from text_extraction_ray.pipelines.queries import q_ann_top10
    from text_extraction_ray.pipelines.queries_r3y import q_ann_rp_rescore

    rp = q_ann_rp_rescore(SF_DIR).to_pandas()
    bf = q_ann_top10(SF_DIR).to_pandas()
    merged = rp.merge(bf, on="vec_id", suffixes=("_rp", "_bf"))
    assert (merged.cos_rp == merged.cos_bf).all()
    assert len(merged) >= 8          # >= 0.8 recall of the true top-10


def test_rp_matrix_deterministic_and_jl():
    """The projection is a pure function of shape, and preserves
    pairwise inner products in expectation (JL): correlation between
    exact and projected similarities is strong."""
    from text_extraction_ray.pipelines.queries_r3y import _rp_matrix

    a = _rp_matrix(64, 32)
    b = _rp_matrix(64, 32)
    assert (a == b).all()
    rng = np.random.RandomState(3)
    x = rng.randn(200, 64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    exact = x @ x[0]
    proj = (x @ a) @ (x[0] @ a)
    assert np.corrcoef(exact, proj)[0, 1] > 0.5
