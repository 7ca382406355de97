"""Round-3 continuation batch Z: per-page boilerplate fraction +
batched multi-query ANN.

- ``pages_boilerplate_frac`` — the page-level application of batch
  Y's host templates: pass 1 derives each host's template chunk set
  (CDC chunks on ≥ half the host's pages); pass 2 re-chunks the
  pages and joins their (host, ch) rows against the template keys —
  a distributed hash join on short hash rows, never a broadcast of
  the (per-host unbounded) template table — and folds per url the
  fraction of bytes covered by template chunks.  This is the
  "delete boilerplate-dominated pages" curation filter; a page of
  ~pure template scores near 1.
- ``ann_batch_queries`` — batched ANN: top-5 neighbours for 10 query
  vectors in ONE scan (per batch a single (rows × 10) matmul, then a
  per-block per-query prune to 5 candidates, one tiny (qid) regroup
  for the final fold).  The batched matmul is the shape model
  inference takes at crawl scale — Q queries amortize one pass over
  the corpus; per-query results are pinned equal to the exact
  single-query brute force in pytest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from ..functions.cdc import TEMPLATE_FRACTION, cdc_chunks
from ..functions.dedup import _fnv1a64_many

_PYA = {"batch_format": "pyarrow"}

ANN_BATCH_Q = 10
ANN_BATCH_K = 5


def _read(sf_dir: str, table: str, columns: list[str]):
    from .queries import read_table

    return read_table(sf_dir, table, columns)


def page_chunk_rows(b: pa.Table) -> pa.Table:
    """(url, host, ch, nb, marker): per-page distinct CDC chunks plus
    one marker row carrying the page's total bytes."""
    urls, hosts, chs, nbs, markers = [], [], [], [], []
    for url, payload in zip(b.column("url").to_pylist(),
                            b.column("html").to_pylist()):
        if payload is None:
            continue
        raw = payload if isinstance(payload, bytes) \
            else str(payload).encode("utf-8")
        host = url.split("/", 3)[2] if url.count("/") >= 2 else url
        chunks = cdc_chunks(raw)
        if not chunks:
            continue
        hv = _fnv1a64_many(chunks).view(np.int64)
        lens = np.array([len(c) for c in chunks], dtype=np.int64)
        # bytes per distinct chunk INCLUDING within-page repeats
        order = np.argsort(hv, kind="stable")
        hs, ls = hv[order], lens[order]
        first = np.ones(hs.size, dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        idx = np.flatnonzero(first)
        tot = np.add.reduceat(ls, idx)
        urls.extend([url] * (idx.size + 1))
        hosts.extend([host] * (idx.size + 1))
        chs.append(hs[idx])
        chs.append(np.array([0], dtype=np.int64))
        nbs.append(tot.astype(np.int64))
        nbs.append(np.array([int(lens.sum())], dtype=np.int64))
        markers.extend([False] * idx.size + [True])
    if not urls:
        return pa.table({
            "url": pa.array([], pa.string()),
            "host": pa.array([], pa.string()),
            "ch": pa.array([], pa.int64()),
            "nb": pa.array([], pa.int64()),
            "marker": pa.array([], pa.bool_()),
        })
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "host": pa.array(hosts, pa.string()),
        "ch": pa.array(np.concatenate(chs)),
        "nb": pa.array(np.concatenate(nbs)),
        "marker": pa.array(markers, pa.bool_()),
    })


def _template_keys(chunk_rows: ray.data.Dataset) -> ray.data.Dataset:
    """(host, ch) keys of each host's template chunks (page frequency
    ≥ TEMPLATE_FRACTION of the host's pages, min 2)."""
    df = (chunk_rows.map_batches(
            lambda b: pa.table({
                "host": b.column("host"), "ch": b.column("ch"),
                "marker": b.column("marker"),
                "n": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            **_PYA)
          .groupby(["host", "ch", "marker"])
          .aggregate(Sum("n", alias_name="n")))

    def fold(g: pa.Table) -> pa.Table:
        marker = g.column("marker").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        ch = g.column("ch").to_numpy(zero_copy_only=False)
        n_pages = int(n[marker].sum())
        need = max(2, int(np.ceil(TEMPLATE_FRACTION * n_pages)))
        keep = (~marker) & (n >= need)
        return pa.table({
            "host": pa.array([g.column("host")[0].as_py()] *
                             int(keep.sum()), pa.string()),
            "ch": pa.array(ch[keep]),
            "is_tpl": pa.array(np.ones(int(keep.sum()), dtype=np.int8)),
        })

    return df.groupby("host").map_groups(fold, **_PYA)


def q_pages_boilerplate_frac(sf_dir: str) -> ray.data.Dataset:
    from .queries_r3s import _corpus_pages

    pages = _corpus_pages(sf_dir)
    rows = pages.map_batches(page_chunk_rows, **_PYA).materialize()
    tpl = _template_keys(rows)
    chunk_rows = rows.filter(expr="marker == False")
    flagged = chunk_rows.join(tpl, join_type="left_outer",
                              num_partitions=4, on=("host", "ch"))

    def tpl_bytes(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_tpl = pc.fill_null(b.column("is_tpl"), 0)
        nb = b.column("nb").to_numpy(zero_copy_only=False)
        return pa.table({
            "url": b.column("url"),
            "tpl_bytes": pa.array(
                nb * is_tpl.to_numpy(zero_copy_only=False)),
        })

    per_url_tpl = (flagged.map_batches(tpl_bytes, **_PYA)
                   .groupby("url")
                   .aggregate(Sum("tpl_bytes", alias_name="tpl_bytes")))
    # url is the output key: the synthetic crawl re-emits a few urls,
    # so totals sum across same-url pages (as the tpl side already does
    # via its url groupby)
    totals = (rows.filter(expr="marker == True")
              .map_batches(lambda b: pa.table({
                  "url": b.column("url"),
                  "n_bytes": b.column("nb")}), **_PYA)
              .groupby("url")
              .aggregate(Sum("n_bytes", alias_name="n_bytes")))
    joined = totals.join(per_url_tpl, join_type="left_outer",
                         num_partitions=4, on=("url",))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nb = b.column("n_bytes").to_numpy(zero_copy_only=False).astype(
            np.float64)
        tb = pc.fill_null(b.column("tpl_bytes"), 0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        q = 10.0 ** 6
        return pa.table({
            "url": b.column("url"),
            "n_bytes": pc.cast(b.column("n_bytes"), pa.int64()),
            "tpl_bytes": pa.array(tb.astype(np.int64)),
            "boilerplate_frac": pa.array(
                np.floor(tb / nb * q + 0.5) / q),
        })

    return joined.map_batches(finish, **_PYA)


def q_ann_batch_queries(sf_dir: str) -> ray.data.Dataset:
    import os

    import pyarrow.parquet as pq

    from ..functions.similarity import _matrix_from_batch, _normalize

    path = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    order = np.argsort(ids)
    qids = ids[order][:ANN_BATCH_Q]
    qm = np.asarray(
        [t.column("embedding")[int(i)].as_py()
         for i in order[:ANN_BATCH_Q]], dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    q_ref = ray.put((qids, qm))
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def score(b: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref)
        mat = _normalize(_matrix_from_batch(b, "embedding"))
        vids = b.column("vec_id").to_numpy(zero_copy_only=False)
        s = np.round(mat @ qm.T, 4)            # rows x Q
        out_q, out_v, out_c = [], [], []
        k = min(ANN_BATCH_K, s.shape[0])
        for j in range(s.shape[1]):
            col = s[:, j]
            # block prune: top-k by (cos desc, vec_id asc)
            idx = np.lexsort((vids, -col))[:k]
            out_q.append(np.full(idx.size, qids[j], dtype=np.int64))
            out_v.append(vids[idx].astype(np.int64))
            out_c.append(col[idx])
        return pa.table({
            "qid": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "cos": pa.array(np.concatenate(out_c)),
        })

    pruned = ds.map_batches(score, **_PYA)

    def fold(g: pa.Table) -> pa.Table:
        vids = g.column("vec_id").to_numpy(zero_copy_only=False)
        cos = g.column("cos").to_numpy(zero_copy_only=False)
        idx = np.lexsort((vids, -cos))[:ANN_BATCH_K]
        n = idx.size
        return pa.table({
            "qid": pa.array(np.full(n, g.column("qid")[0].as_py(),
                                    dtype=np.int64)),
            "vec_id": pa.array(vids[idx]),
            "cos": pa.array(cos[idx]),
        })

    return pruned.groupby("qid").map_groups(fold, **_PYA)


def queries_r3z() -> dict:
    return {
        "pages_boilerplate_frac": q_pages_boilerplate_frac,
        "ann_batch_queries": q_ann_batch_queries,
    }
