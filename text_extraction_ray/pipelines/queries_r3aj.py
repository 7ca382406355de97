"""Round-3 continuation batch AJ: leakage-free train/test splitting.

One registered query, fully oracled (batch-parity block):

- ``docs_leakfree_split`` — the published dedup-leakage concern (e.g.
  Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  Better"): a random per-document split leaks near-duplicates across
  the train/test boundary, inflating eval.  The fix is to bucket by
  NEAR-DUP GROUP, not by document: every document inherits its
  connected-component label from the oracled near-dup cluster table
  (singletons label themselves), and the split decision hashes the
  GROUP id — md5 first hex digit in 0-2 → 'test' (3/16 expected), else
  'train' — so an entire near-dup family always lands on one side.

Scale note: scan-shaped.  The clustered-label side is bounded by the
number of CLUSTERED documents (pairs are banded/bucketed upstream), is
broadcast once, and every batch maps vec_id → group label + md5 bucket
locally; no exchange beyond the cluster table's own construction.  The
md5-of-group-id convention matches fingerprint_md5's oracled precedent
(hashlib hex == DuckDB md5() on identical strings).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray
import ray.data

_PYA = {"batch_format": "pyarrow"}

TEST_HEX = ("0", "1", "2")     # first md5 hex digit -> test (3/16)

# Clustered-label rows broadcast below this; above it the label attach
# degrades to a distributed left_outer join (the capped broadcast → join
# fallback discipline, VERDICT r3 #1: the map is bounded only by the
# number of CLUSTERED docs — at crawl scale a corpus-proportional
# object).  Path equality pinned in tests/test_queries_r3aj.py with the
# cap forced to 0.
LABEL_BROADCAST_CAP = 2_000_000


def _read(sf_dir: str, table: str, columns: list[str]):
    from .queries import read_table

    return read_table(sf_dir, table, columns)


def q_docs_leakfree_split(sf_dir: str) -> ray.data.Dataset:
    from .queries_ext import q_neardup_clusters

    clusters = q_neardup_clusters(sf_dir)
    emb = _read(sf_dir, "embeddings", ["vec_id"])

    def finish(vids, groups) -> pa.Table:
        splits = ["test" if hashlib.md5(str(g).encode()).hexdigest()[0]
                  in TEST_HEX else "train" for g in groups]
        return pa.table({
            "vec_id": pa.array(vids, type=pa.int64()),
            "group_id": pa.array(groups, type=pa.int64()),
            "split": pa.array(splits, type=pa.string()),
        })

    if clusters.num_rows <= LABEL_BROADCAST_CAP:
        # ray.put once, read per task (the J1 broadcast idiom — never
        # per-batch reshipping)
        label_ref = ray.put(dict(
            zip(clusters.column("doc_id").to_pylist(),
                clusters.column("cluster_id").to_pylist())))

        def assign(batch: pa.Table) -> pa.Table:
            label = ray.get(label_ref)
            vids = batch.column("vec_id").to_pylist()
            return finish(vids, [label.get(v, v) for v in vids])

        return emb.map_batches(assign, **_PYA)

    # join fallback: attach labels with a distributed left_outer join on
    # vec_id; a null cluster_id means "singleton — label yourself"
    lbl_ds = ray.data.from_arrow(clusters)

    def assign_joined(batch: pa.Table) -> pa.Table:
        vids = batch.column("vec_id").to_pylist()
        labels = batch.column("cluster_id").to_pylist()
        return finish(vids, [v if g is None else g
                             for v, g in zip(vids, labels)])

    return (emb.join(lbl_ds, join_type="left_outer", num_partitions=8,
                     on=("vec_id",), right_on=("doc_id",))
            .map_batches(assign_joined, **_PYA))


SQL_DOCS_LEAKFREE_SPLIT = """
WITH RECURSIVE
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.4),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs),
walk (node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node),
labels AS (SELECT node, MIN(label) AS grp FROM walk GROUP BY node)
SELECT e.vec_id, COALESCE(l.grp, e.vec_id) AS group_id,
       CASE WHEN substr(md5(CAST(COALESCE(l.grp, e.vec_id) AS VARCHAR)),
                        1, 1) IN ('0', '1', '2')
            THEN 'test' ELSE 'train' END AS split
FROM embeddings e LEFT JOIN labels l ON l.node = e.vec_id
"""


def queries_r3aj() -> dict:
    return {
        "docs_leakfree_split": q_docs_leakfree_split,
    }


def parity_sql_r3aj() -> dict[str, str]:
    """DuckDB twin — driver oracle via the batch-parity merge AND the
    pytest parity gate in tests/test_queries_r3aj.py."""
    return {
        "docs_leakfree_split": SQL_DOCS_LEAKFREE_SPLIT,
    }
