"""Batch-Z: per-page boilerplate fraction + batched ANN."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def test_ann_batch_queries_match_bruteforce():
    """Every qid's top-5 equals the exact single-query brute force
    with the (cos desc, vec_id asc) order rule."""
    from text_extraction_ray.pipelines.queries_r3z import (ANN_BATCH_K,
                                                           ANN_BATCH_Q,
                                                           q_ann_batch_queries)

    got = (q_ann_batch_queries(SF_DIR).to_pandas()
           .sort_values(["qid", "cos", "vec_id"],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist())
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qids = np.sort(ids)[:ANN_BATCH_Q]
    rows = []
    for qid in qids:
        q = mn[ids.tolist().index(qid)]
        cos = np.round(mn @ q, 4)
        order = np.lexsort((ids, -cos))[:ANN_BATCH_K]
        rows.extend((qid, ids[i], cos[i]) for i in order)
    want = pd.DataFrame(rows, columns=["qid", "vec_id", "cos"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_boilerplate_frac_matches_local_recompute():
    from collections import defaultdict

    from text_extraction_ray.functions.cdc import (TEMPLATE_FRACTION,
                                                   cdc_chunks)
    from text_extraction_ray.functions.dedup import _fnv1a64_many
    from text_extraction_ray.pipelines.queries_r3s import _corpus_pages
    from text_extraction_ray.pipelines.queries_r3z import (
        q_pages_boilerplate_frac)

    got = (q_pages_boilerplate_frac(SF_DIR).to_pandas()
           .sort_values("url").reset_index(drop=True))

    freq = defaultdict(lambda: defaultdict(int))
    pages = defaultdict(int)
    per_page = {}
    for r in _corpus_pages(SF_DIR).iter_rows():
        raw = r["html"] if isinstance(r["html"], bytes) \
            else str(r["html"]).encode("utf-8")
        host = r["url"].split("/", 3)[2]
        chunks = cdc_chunks(raw)
        if not chunks:
            continue
        hv = _fnv1a64_many(chunks).view(np.int64).tolist()
        bytes_by_ch = defaultdict(int)
        for h, c in zip(hv, chunks):
            bytes_by_ch[h] += len(c)
        pages[host] += 1
        for h in set(hv):
            freq[host][h] += 1
        # same-url re-emissions accumulate (url is the output key)
        old = per_page.get(r["url"])
        if old is None:
            per_page[r["url"]] = (host, dict(bytes_by_ch),
                                  sum(len(c) for c in chunks))
        else:
            merged = dict(old[1])
            for h, nb in bytes_by_ch.items():
                merged[h] = merged.get(h, 0) + nb
            per_page[r["url"]] = (host, merged,
                                  old[2] + sum(len(c) for c in chunks))
    rows = []
    for url in sorted(per_page):
        host, by_ch, total = per_page[url]
        need = max(2, int(np.ceil(TEMPLATE_FRACTION * pages[host])))
        tpl = sum(nb for h, nb in by_ch.items()
                  if freq[host][h] >= need)
        rows.append((url, total, tpl,
                     np.floor(tpl / total * 1e6 + 0.5) / 1e6))
    want = pd.DataFrame(rows, columns=[
        "url", "n_bytes", "tpl_bytes", "boilerplate_frac"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_boilerplate_planted_heavy_pages():
    """Pages that are ~75% shared sidebar score near 0.75; fully
    unique pages score 0 — through the real Ray stages."""
    import ray.data

    from text_extraction_ray.pipelines.queries_r3z import (_template_keys,
                                                           page_chunk_rows)

    rng = np.random.RandomState(5)
    sidebar = bytes(rng.randint(32, 127, 1500, dtype=np.uint8))
    rows = []
    for i in range(6):
        body = bytes(rng.randint(32, 127, 500, dtype=np.uint8))
        rows.append({"url": f"https://tpl.example/p{i}",
                     "html": sidebar + body})
    for i in range(6):
        rows.append({"url": f"https://uniq.example/p{i}",
                     "html": bytes(rng.randint(32, 127, 2000,
                                               dtype=np.uint8))})
    ds = ray.data.from_items(rows)
    chunk_rows = ds.map_batches(page_chunk_rows,
                                batch_format="pyarrow").materialize()
    tpl = _template_keys(chunk_rows).to_pandas()
    assert (tpl.host == "tpl.example").all()     # unique host: no templates
    flagged = (chunk_rows.filter(expr="marker == False").to_pandas()
               .merge(tpl, how="left", on=["host", "ch"]))
    fr = (flagged.assign(tb=lambda d: d.nb * d.is_tpl.fillna(0))
          .groupby("url").tb.sum())
    totals = (chunk_rows.filter(expr="marker == True").to_pandas()
              .set_index("url").nb)
    frac = (fr / totals).fillna(0)
    assert (frac[frac.index.str.startswith("https://tpl")] > 0.6).all()
    assert (frac[frac.index.str.startswith("https://uniq")] == 0).all()
