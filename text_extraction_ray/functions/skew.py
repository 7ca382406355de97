"""Hot-key skew handling: salted two-phase aggregation (SURVEY SS2 custom
operators / "salt hot keys").

A plain ``groupby(key)`` hash-shuffles every row of a hot key to ONE
reducer; with few distinct keys (e.g. 5 event types over 10^11 rows) that
reducer is the job.  The salted pattern:

  phase 1  map_batches: append salt = row_hash % n_salts
           groupby (key, salt) -> partial aggregates   (n_keys x n_salts
           groups spread across ALL reducers)
  phase 2  groupby key over the tiny partial table -> final aggregates

Phase 2's input is n_keys x n_salts rows regardless of data size, so the
second shuffle is trivially cheap.  Results are exactly equal to the
unsalted aggregate (counts and integer-weighted sums are associative;
float sums agree to reordering, handled by the caller's rounding policy).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Sum

DEFAULT_SALTS = 8


def salted_count_sum(ds: ray.data.Dataset, key_col: str, value_col: str,
                     n_salts: int = DEFAULT_SALTS,
                     salt_source: str | None = None) -> ray.data.Dataset:
    """groupby(key).count()+sum(value) via salt-spread two-phase shuffle.

    ``salt_source``: an int64 column to derive the salt from (defaults to a
    per-row modulo over a monotonically-derived hash of the value's bits —
    any even spread works; correctness never depends on the salt).
    Returns columns (key_col, n_rows, sum_<value_col>).
    """

    def add_salt(b: pa.Table) -> pa.Table:
        if salt_source is not None:
            src = pc.cast(b.column(salt_source), pa.int64())
        else:
            # spread rows round-robin within the batch: even, allocation-free
            src = pa.array(range(b.num_rows), type=pa.int64())
        salt = pc.cast(
            pc.subtract(src, pc.multiply(pc.divide(src, n_salts),
                                         pa.scalar(n_salts, pa.int64()))),
            pa.int8())
        return b.append_column("salt", salt)

    partial = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key_col, "salt"])
        .aggregate(Count(alias_name="pc_n"),
                   Sum(value_col, alias_name="pc_s"))
    )
    final = (
        partial.groupby(key_col)
        .aggregate(Sum("pc_n", alias_name="n_rows"),
                   Sum("pc_s", alias_name=f"sum_{value_col}"))
    )
    return final


def adaptive_salted_count_sum(ds: ray.data.Dataset, key_col: str,
                              value_col: str, n_salts: int = DEFAULT_SALTS,
                              sample_rows: int = 50_000,
                              hot_share: float = 0.05) -> ray.data.Dataset:
    """Skew-AWARE variant (round 2): detect hot keys from a bounded sample
    first, then salt ONLY those — cold keys take the normal one-shuffle
    path with no phase-2 overhead, hot keys spread across n_salts reducers.

      detect   driver-side key frequencies over <= sample_rows rows
               (bounded take, never the full input); hot = share >= hot_share
      phase 1  salt appended only where key ∈ hot (broadcast set);
               groupby (key, salt) partials
      phase 2  groupby key over the partial table (n_keys x n_salts rows)

    Results are exactly the plain groupby's (same associativity argument
    as salted_count_sum); the sample only influences WHICH keys get
    spread, never the numbers."""
    import ray

    sample = ds.limit(sample_rows).take_batch(sample_rows,
                                              batch_format="pyarrow")
    keys = sample.column(key_col).to_pylist()
    n = max(len(keys), 1)
    freq: dict = {}
    for k in keys:
        freq[k] = freq.get(k, 0) + 1
    hot = {k for k, c in freq.items() if c / n >= hot_share}
    hot_ref = ray.put(hot)

    def add_salt(b: pa.Table) -> pa.Table:
        hset = ray.get(hot_ref)
        col = b.column(key_col)
        is_hot = pc.is_in(col, value_set=pa.array(list(hset),
                                                  type=col.type))
        rr = pa.array([i % n_salts for i in range(b.num_rows)],
                      type=pa.int8())
        salt = pc.if_else(is_hot, rr, pa.scalar(0, pa.int8()))
        return b.append_column("salt", salt)

    partial = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key_col, "salt"])
        .aggregate(Count(alias_name="pc_n"),
                   Sum(value_col, alias_name="pc_s"))
    )
    return (
        partial.groupby(key_col)
        .aggregate(Sum("pc_n", alias_name="n_rows"),
                   Sum("pc_s", alias_name=f"sum_{value_col}"))
    )


def skew_broadcast_join(fact: ray.data.Dataset, dim: ray.data.Dataset,
                        fact_key: str, dim_key: str,
                        sample_rows: int = 50_000,
                        hot_share: float = 0.05,
                        num_partitions: int = 8) -> ray.data.Dataset:
    """Skew-aware HYBRID inner join (the join-side twin of
    ``adaptive_salted_count_sum``): a plain hash join sends every fact
    row of a hot key to ONE reducer — at web scale a single celebrity
    key is the whole job.  Plan:

      detect  hot fact keys from a bounded sample (≤ sample_rows rows)
      hot     the ≤ 1/hot_share matching DIM rows collect to the driver
              (bounded by construction), broadcast once; hot fact rows
              attach them vectorized (index_in + take) — no shuffle
      cold    everything else takes the normal native hash join
      union   hot ∪ cold (row sets disjoint by the hot-key split)

    Exactly the inner join's rows on ANY data; the sample only decides
    which route each key takes.  Dim columns (minus the key) must not
    collide with fact columns."""
    sample = fact.limit(sample_rows).take_batch(sample_rows,
                                                batch_format="pyarrow")
    keys = sample.column(fact_key).to_pylist()
    n = max(len(keys), 1)
    freq: dict = {}
    for k in keys:
        freq[k] = freq.get(k, 0) + 1
    hot = {k for k, c in freq.items() if c / n >= hot_share}
    dim_cols = [c for c in dim.schema().names if c != dim_key]
    out_cols = list(fact.schema().names) + dim_cols
    hot_ref = ray.put(hot)

    def split_factory(want_hot: bool):
        def split(b: pa.Table) -> pa.Table:
            hset = ray.get(hot_ref)
            if not hset:
                return b.slice(0, 0) if want_hot else b
            m = pc.is_in(b.column(fact_key),
                         value_set=pa.array(list(hset),
                                            type=b.column(fact_key).type))
            return b.filter(m if want_hot else pc.invert(m))
        return split

    cold_fact = fact.map_batches(split_factory(False),
                                 batch_format="pyarrow")
    cold_joined = (
        cold_fact
        .join(dim, join_type="inner", num_partitions=num_partitions,
              on=(fact_key,), right_on=(dim_key,))
        .map_batches(lambda b: b.select(out_cols),
                     batch_format="pyarrow"))
    if not hot:
        return cold_joined

    # bounded by |hot| ≤ 1/hot_share keys — a dimension-row handful
    def dim_hot_only(b: pa.Table) -> pa.Table:
        hset = ray.get(hot_ref)
        return b.filter(pc.is_in(
            b.column(dim_key),
            value_set=pa.array(list(hset), type=b.column(dim_key).type)))

    hot_dim = pa.concat_tables(
        [b for b in dim.map_batches(dim_hot_only, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")])
    hot_dim_ref = ray.put(hot_dim)

    def attach(b: pa.Table) -> pa.Table:
        d = ray.get(hot_dim_ref)
        idx = pc.index_in(b.column(fact_key), value_set=d.column(dim_key))
        found = pc.is_valid(idx)
        b, idx = b.filter(found), pc.filter(idx, found)
        for c in dim_cols:
            b = b.append_column(c, pc.take(d.column(c), idx))
        return b.select(out_cols)

    hot_joined = (
        fact.map_batches(split_factory(True), batch_format="pyarrow")
        .map_batches(attach, batch_format="pyarrow"))
    # an ALL-hot split leaves the cold side with only schema-less empty
    # blocks, which acero's join rejects even after repartition — probe
    # with a limit(1) pre-pass (bounded: early-stops at the first row)
    # and skip the cold join entirely when nothing is cold
    if cold_fact.limit(1).count() == 0:
        return hot_joined
    return cold_joined.union(hot_joined)
