"""Round-3 continuation batch V: crawl-frontier construction — sitemap
ingestion, bloom-accelerated new-URL detection, robots filtering,
politeness scheduling.

- ``frontier_new_urls`` — per host (host, n_sitemap, n_new): sitemap
  URL rows (sources/sitemap.py, shard-parallel XML parse) are
  canonicalized (core/links.py) and checked against the crawled set
  with the textbook bloom-accelerated ANTI-join: a distributed 128 KiB
  bloom of crawled canonical-URL hashes broadcasts once; probe rows
  the bloom PROVES absent are new with zero join work (at a real
  crawl's hit rate that's the overwhelming majority of a fresh
  sitemap), and only bloom HITS — true matches + rare false positives
  — take the exact distributed ``left_anti`` join.  Result is exact;
  the bloom only routes.
- ``frontier_schedule`` — robots.txt rules (core/robots.py, RFC 9309
  subset) parsed once from the per-host robots table and broadcast
  (bounded by host count, the domain-blocklist discipline of T5);
  new URLs gain an allowed flag; per host the schedule reports
  (n_allowed, n_blocked, crawl_delay, est_seconds, first_url) where
  first_url is the wave-0 fetch under (priority desc, url asc)
  politeness order and est_seconds = (n_allowed-1)·crawl_delay.

Fixtures are deterministic (sources/sitemap.py:gen_sitemaps derives
sitemaps + robots bodies from the synthetic crawl itself); pytest
pins the parsers against RFC examples and the whole funnel against a
single-process set-difference recompute.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Max

from ..functions.bloom import _test_bits, build_bloom
from ..functions.dedup import _fnv1a64_many

_PYA = {"batch_format": "pyarrow"}


def _corpus_urls(sf_dir: str) -> tuple[ray.data.Dataset, str]:
    """(crawled-URL Dataset, corpus dir) for the synthetic crawl."""
    from ..sources.synth import gen_corpus
    from .extraction import read_pages

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    corpus = os.path.join(tempfile.gettempdir(), f"tx_pages_{tag}")
    gen_corpus(corpus, 500, seed=42, n_shards=8)
    return read_pages(corpus, columns=["url"]), corpus


def _sitemap_dir(sf_dir: str) -> str:
    from ..sources.sitemap import gen_sitemaps

    urls_ds, corpus = _corpus_urls(sf_dir)
    smdir = corpus + "_sitemaps"
    # fixture generation (like gen_corpus): bounded driver work
    urls = [r["url"] for r in urls_ds.iter_rows()]
    return gen_sitemaps(smdir, urls)


def _key_batch(b: pa.Table, url_col: str) -> pa.Table:
    """canonical_url + int64 fnv key columns appended."""
    from ..core.links import canonicalize_url

    canon = [canonicalize_url(u) for u in b.column(url_col).to_pylist()]
    keys = _fnv1a64_many([c.encode("utf-8") for c in canon]).view(
        np.int64)
    out = b.append_column("canonical_url", pa.array(canon, pa.string()))
    return out.append_column("ckey", pa.array(keys))


def _host_col(b: pa.Table) -> pa.Table:
    hosts = [u.split("/", 3)[2]
             for u in b.column("canonical_url").to_pylist()]
    return b.append_column("host", pa.array(hosts, pa.string()))


def _new_urls(sf_dir: str) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(sitemap URL rows with host, provably-new subset)."""
    from ..sources.sitemap import read_sitemaps

    smdir = _sitemap_dir(sf_dir)
    crawled, _ = _corpus_urls(sf_dir)
    crawled_keys = (crawled
                    .map_batches(lambda b: _key_batch(b, "url"), **_PYA)
                    .select_columns(["ckey"]))
    sm = (read_sitemaps(smdir)
          .filter(expr="kind == 'url'")
          .map_batches(lambda b: _key_batch(b, "url"), **_PYA)
          .map_batches(_host_col, **_PYA))
    # frontier-internal dedup: syntactic variants collapse on the
    # canonical form, the best (max) priority wins
    sm = (sm.groupby(["host", "canonical_url", "ckey"])
          .aggregate(Max("priority", alias_name="priority")))
    bloom = build_bloom(crawled_keys, "ckey")
    bloom_ref = ray.put(bloom)

    def mark(b: pa.Table) -> pa.Table:
        words = ray.get(bloom_ref)
        keys = b.column("ckey").to_numpy(zero_copy_only=False)
        return b.append_column(
            "maybe_crawled", pa.array(_test_bits(keys, words)))

    marked = sm.map_batches(mark, **_PYA).materialize()
    definite_new = (marked.filter(expr="maybe_crawled == False")
                    .drop_columns(["maybe_crawled"]))
    survivors = (marked.filter(expr="maybe_crawled == True")
                 .drop_columns(["maybe_crawled"])
                 .join(crawled_keys, join_type="left_anti",
                       num_partitions=4, on=("ckey",)))
    return sm, definite_new.union(survivors)


def q_frontier_new_urls(sf_dir: str) -> ray.data.Dataset:
    sm, new = _new_urls(sf_dir)
    tot = sm.groupby("host").aggregate(Count(alias_name="n_sitemap"))
    nn = new.groupby("host").aggregate(Count(alias_name="n_new"))
    joined = tot.join(nn, join_type="left_outer", num_partitions=2,
                      on=("host",))

    def fill(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "host": b.column("host"),
            "n_sitemap": b.column("n_sitemap"),
            "n_new": pc.fill_null(b.column("n_new"), 0),
        })

    return joined.map_batches(fill, **_PYA)


def q_frontier_schedule(sf_dir: str) -> ray.data.Dataset:
    from ..core.robots import parse_robots

    import pyarrow.parquet as pq

    smdir = _sitemap_dir(sf_dir)
    _, new = _new_urls(sf_dir)
    robots = pq.read_table(os.path.join(smdir, "robots.parquet"))
    rules = {h: parse_robots(b) for h, b in
             zip(robots.column("host").to_pylist(),
                 robots.column("body").to_pylist())}
    rules_ref = ray.put(rules)

    def flag(b: pa.Table) -> pa.Table:
        rmap = ray.get(rules_ref)
        allowed = []
        for cu, host in zip(b.column("canonical_url").to_pylist(),
                            b.column("host").to_pylist()):
            path = "/" + cu.split("/", 3)[3] if cu.count("/") >= 3 else "/"
            r = rmap.get(host)
            allowed.append(True if r is None else r.allowed(path))
        return b.append_column("allowed", pa.array(allowed, pa.bool_()))

    flagged = new.map_batches(flag, **_PYA)

    def fold(g: pa.Table) -> pa.Table:
        rmap = ray.get(rules_ref)
        host = g.column("host")[0].as_py()
        ok = g.filter(g.column("allowed"))
        n_allowed = ok.num_rows
        n_blocked = g.num_rows - n_allowed
        delay = rmap[host].crawl_delay if host in rmap else 1.0
        first = ""
        if n_allowed:
            pr = ok.column("priority").to_numpy(zero_copy_only=False)
            urls = ok.column("canonical_url").to_pylist()
            best = min(range(n_allowed), key=lambda i: (-pr[i], urls[i]))
            first = urls[best]
        est = max(0, n_allowed - 1) * delay
        return pa.table({
            "host": pa.array([host], pa.string()),
            "n_allowed": pa.array([n_allowed], pa.int64()),
            "n_blocked": pa.array([n_blocked], pa.int64()),
            "crawl_delay": pa.array([float(delay)]),
            "est_seconds": pa.array([float(est)]),
            "first_url": pa.array([first], pa.string()),
        })

    return flagged.groupby("host").map_groups(fold, **_PYA)


def queries_r3v() -> dict:
    return {
        "frontier_new_urls": q_frontier_new_urls,
        "frontier_schedule": q_frontier_schedule,
    }
