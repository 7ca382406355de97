"""Per-partition checkpointing: manifests, atomic writes, resume pruning.

SURVEY.md SS2.1 S2-S4, SS4.4 / BASELINE.json north_rule: "resumable from
checkpoint with per-partition lineage + metrics".

Protocol: a partition's output is written to ``data.parquet.tmp`` then
renamed; its manifest (JSON, also written atomically) is written LAST and
its presence with a matching engine hash (constants + core source
digest) marks the partition done.  A
retried or resumed run therefore can never observe half-written output, and
rerunning a finished partition is a no-op (idempotent rename-overwrite).
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..params import engine_hash

MANIFEST_VERSION = 1


def partition_out_dir(output_dir: str, pid: int) -> str:
    return os.path.join(output_dir, f"part={pid:05d}")


def manifest_file(ckpt_dir: str, pid: int) -> str:
    return os.path.join(ckpt_dir, f"{pid:05d}.json")


def write_atomic_parquet(table: pa.Table, final_path: str) -> str:
    """tmp + fsync + rename so readers/resumers never see partial files."""
    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    tmp = final_path + ".tmp"
    pq.write_table(table, tmp)
    with open(tmp, "rb+") as fh:
        os.fsync(fh.fileno())
    os.replace(tmp, final_path)
    return final_path


def write_atomic_csv(table: pa.Table, final_path: str) -> str:
    """CSV sink variant (the reference emits CSV): nested columns (spans)
    are JSON-encoded strings so the file stays flat; same tmp+rename
    atomicity as parquet."""
    import json

    import pyarrow.csv as pacsv

    cols = {}
    for name in table.schema.names:
        col = table.column(name)
        if pa.types.is_nested(col.type):
            cols[name] = pa.array(
                [json.dumps(v) for v in col.to_pylist()], type=pa.string())
        else:
            cols[name] = col
    flat = pa.table(cols)
    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    tmp = final_path + ".tmp"
    pacsv.write_csv(flat, tmp)
    with open(tmp, "rb+") as fh:
        os.fsync(fh.fileno())
    os.replace(tmp, final_path)
    return final_path


def write_atomic_jsonl(table: pa.Table, final_path: str) -> str:
    """JSON-lines sink variant (symmetric with sources/jsonl.py): one
    object per row, timestamps as full isoformat, nested columns (spans)
    as plain JSON; same tmp+rename atomicity as parquet/CSV."""
    import json

    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    tmp = final_path + ".tmp"
    cols = table.to_pydict()
    names = table.schema.names
    with open(tmp, "w", encoding="utf-8") as fh:
        for i in range(table.num_rows):
            row = {}
            for name in names:
                v = cols[name][i]
                if hasattr(v, "isoformat"):
                    v = v.isoformat()
                row[name] = v
            fh.write(json.dumps(row, ensure_ascii=False) + "\n")
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, final_path)
    return final_path


def sha256_of_column(table: pa.Table, column: str) -> str:
    """Order-dependent digest over a string column (rows pre-sorted by url)."""
    h = hashlib.sha256()
    for chunk in table.column(column).chunks:
        for v in chunk:
            s = v.as_py()
            h.update(b"\x00" if s is None else s.encode("utf-8"))
            h.update(b"\x1e")
    return h.hexdigest()


def write_manifest(ckpt_dir: str, pid: int, *, input_fragments: list[str],
                   row_count: int, sha256: str, counters: dict,
                   output_format: str = "parquet") -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    doc = {
        "version": MANIFEST_VERSION,
        "partition_id": pid,
        "input_fragments": input_fragments,
        "row_count": row_count,
        "sha256": sha256,
        "params_hash": engine_hash(),
        "completed": True,
        "counters": counters,
        "output_format": output_format,
    }
    path = manifest_file(ckpt_dir, pid)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
    return path


def load_manifest(ckpt_dir: str, pid: int) -> dict | None:
    path = manifest_file(ckpt_dir, pid)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None


def partition_is_done(ckpt_dir: str, pid: int, output_dir: str,
                      expected_fragments: list[str],
                      output_format: str = "parquet") -> bool:
    """J2 resume predicate: manifest present, params match, output exists
    IN THE REQUESTED FORMAT — rerunning with a different --format recomputes
    the partition instead of silently skipping it (ADVICE r1)."""
    m = load_manifest(ckpt_dir, pid)
    if not m or not m.get("completed"):
        return False
    if m.get("params_hash") != engine_hash():
        return False  # extraction constants changed → recompute
    if m.get("input_fragments") != expected_fragments:
        return False
    if m.get("output_format", "parquet") != output_format:
        return False  # format changed → recompute in the new format
    pdir = partition_out_dir(output_dir, pid)
    fname = {"csv": "data.csv", "jsonl": "data.jsonl"}.get(
        output_format, "data.parquet")
    return os.path.exists(os.path.join(pdir, fname))


def assign_partition_ids(shards: list[str],
                         ckpt_dir: str) -> list[tuple[int, str]]:
    """STABLE shard→pid binding (round 2): the first run assigns pids in
    sorted order (identical to the old positional scheme); later runs
    look each shard's basename up in a persisted registry and only NEW
    shards get fresh (appended) pids.  A shard prepended to the sort
    order therefore no longer shifts every binding — previously that
    forced a safe-but-wasteful full recompute."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, "_shards.json")
    reg: dict[str, int] = {}
    try:
        with open(path) as fh:
            reg = {k: int(v) for k, v in json.load(fh).items()}
    except (OSError, json.JSONDecodeError, ValueError):
        reg = {}
    next_pid = max(reg.values(), default=-1) + 1
    changed = False
    pairs = []
    for shard in shards:
        key = os.path.basename(shard)
        if key not in reg:
            reg[key] = next_pid
            next_pid += 1
            changed = True
        pairs.append((reg[key], shard))
    if changed:
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(reg, fh, sort_keys=True)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)
    return pairs


def prune_done(shards: list[str], output_dir: str, ckpt_dir: str,
               output_format: str = "parquet") -> list[tuple[int, str]]:
    """S4: (pid, shard) pairs still pending — driver-side anti-join vs the
    manifest set (the manifest side is tiny; never a distributed join).
    pids come from the persistent registry, so resume survives shard-list
    changes in ANY direction."""
    pending = []
    for pid, shard in assign_partition_ids(shards, ckpt_dir):
        if not partition_is_done(ckpt_dir, pid, output_dir, [shard],
                                 output_format):
            pending.append((pid, shard))
    return pending


def sum_counters(ckpt_dir: str) -> dict:
    """G1 durable side: cumulative totals over all completed manifests."""
    totals: dict[str, int] = {}
    n = 0
    if not os.path.isdir(ckpt_dir):
        return {"partitions": 0}
    for name in sorted(os.listdir(ckpt_dir)):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(ckpt_dir, name)) as fh:
                m = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        if not m.get("completed"):
            continue
        n += 1
        for k, v in m.get("counters", {}).items():
            totals[k] = totals.get(k, 0) + int(v)
    totals["partitions"] = n
    return totals
