"""Incremental crawl refresh (round 2): extract ONLY the delta.

The recrawl workflow at corpus scale: a new crawl mostly re-fetches pages
already extracted.  Re-running the full job wastes the parser on
unchanged documents; ``refresh_extraction`` instead

  1. loads the previous run's (url → warc_ts) watermark table (two tiny
     columns of the old OUT — broadcast via ``ray.put``; at a url space
     too big to broadcast the same step is a hash join, documented),
  2. filters the new pages to the SUPERSEDING set — urls that are new, or
     whose warc_ts is strictly newer than the watermark (vectorized
     ``pc.index_in`` + timestamp compare per batch),
  3. extracts just those pages through the standard actor-pool stage,
  4. unions the result with the carried-forward old rows (old rows lose
     only where a newer crawl of the same url exists), and
  5. applies the deterministic keep-latest rule, so the result is
     EXACTLY what a full re-extraction of the merged keep-latest corpus
     would produce (asserted by test_refresh.py).

Returns (result Dataset, n_delta) — n_delta is how many pages actually
went through the parser, the number that collapses the recrawl bill.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .analysis import dedup_keep_latest
from .extraction import extract_pages


def refresh_extraction(old_out: ray.data.Dataset,
                       new_pages: ray.data.Dataset,
                       concurrency=None, batch_size: int = 64,
                       ) -> tuple[ray.data.Dataset, int]:
    """Delta-extract ``new_pages`` against a previous OUT dataset."""
    # 1. watermark: latest extracted warc_ts per url (tiny: 2 columns)
    wm = (old_out
          .map_batches(lambda b: pa.table({
              "url": b.column("url"),
              "warc_ts": b.column("warc_ts")}), batch_format="pyarrow")
          .groupby("url").max("warc_ts")
          ).to_pandas()
    wm_urls = pa.array(wm["url"], type=pa.string())
    wm_ts = pa.array(wm["max(warc_ts)"], type=pa.timestamp("us"))
    wm_ref = ray.put((wm_urls, wm_ts))

    def superseding(b: pa.Table) -> pa.Table:
        urls, ts = ray.get(wm_ref)
        idx = pc.index_in(b.column("url"), value_set=urls)
        old_ts = ts.take(idx)  # null where the url is new
        keep = pc.or_kleene(pc.is_null(old_ts),
                            pc.greater(b.column("warc_ts"), old_ts))
        return b.filter(pc.fill_null(keep, True))

    delta_pages = new_pages.map_batches(superseding, batch_format="pyarrow")
    delta_out = extract_pages(delta_pages, mode="single_pass",
                              concurrency=concurrency,
                              batch_size=batch_size).materialize()
    n_delta = delta_out.count()

    # 4+5. carry old rows forward; keep-latest resolves same-url overlaps
    merged = dedup_keep_latest(old_out.union(delta_out))
    return merged, n_delta
