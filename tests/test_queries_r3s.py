"""Batch-S: link extraction, URL resolution, host PageRank."""

import numpy as np
import pandas as pd
import pyarrow as pa

SF_DIR = "/root/testdata/sf0.001"


def test_extract_hrefs_fixtures():
    from text_extraction_ray.core.links import extract_hrefs

    html = (
        '<a href="/one">1</a>'
        "<a href='/two'>2</a>"
        "<a href=/three>3</a>"
        '<a href="/q?a=1&amp;b=2">amp</a>'
        '<A HREF="/UPPER">case</A>'
        '<a name="x">no href</a>'
        '<script>var s = \'<a href="/not-a-link">\';</script>'
        '<textarea><a href="/also-not">x</a></textarea>'
        '<a href="/after">after rawtext</a>'
        '<a href=">malformed<'
    )
    assert extract_hrefs(html) == [
        "/one", "/two", "/three", "/q?a=1&b=2", "/UPPER", "/after"]


def test_extract_hrefs_matches_stdlib_htmlparser():
    """Independent oracle: stdlib HTMLParser agrees on well-formed
    documents (the tokenizer regex is not self-verified)."""
    from html.parser import HTMLParser

    from text_extraction_ray.core.links import extract_hrefs

    html = ('<html><body><p>hi</p><a href="/a">a</a>'
            '<div><a class="x" href="/b?y=1">b</a></div>'
            '<script>no("<a href=/zzz>")</script>'
            '<a href="https://other.example/c">c</a></body></html>')

    class Grab(HTMLParser):
        def __init__(self):
            super().__init__()
            self.out = []

        def handle_starttag(self, tag, attrs):
            if tag == "a":
                for k, v in attrs:
                    if k == "href" and v is not None:
                        self.out.append(v)

    g = Grab()
    g.feed(html)
    assert extract_hrefs(html) == g.out == [
        "/a", "/b?y=1", "https://other.example/c"]


def test_resolve_url_cases():
    from text_extraction_ray.core.links import resolve_url

    base = "https://h.example/dir/page.html"
    assert resolve_url(base, "/abs") == "https://h.example/abs"
    assert resolve_url(base, "rel") == "https://h.example/dir/rel"
    assert resolve_url(base, "../up") == "https://h.example/up"
    assert resolve_url(base, "//o.example/x") == "https://o.example/x"
    assert resolve_url(base, "http://o.example/x") == "http://o.example/x"
    assert resolve_url(base, "#frag") is None
    assert resolve_url(base, "mailto:a@b") is None
    assert resolve_url(base, "javascript:void(0)") is None
    assert resolve_url(base, "/x#frag") == "https://h.example/x"


def test_link_graph_matches_independent_recount(ray_session):
    """Per-host profile equals a pandas recomputation from the raw
    per-edge rows (aggregation logic is not self-verified)."""
    from text_extraction_ray.pipelines.queries_r3s import (
        _edges,
        q_link_graph,
    )

    got = q_link_graph(SF_DIR).to_pandas().sort_values(
        "src_host").reset_index(drop=True)
    e = _edges(SF_DIR).to_pandas()
    want = e.groupby("src_host").agg(
        n_links=("dst_url", "size"),
        n_internal=("internal", "sum"),
        n_unique_targets=("dst_url", "nunique")).reset_index().sort_values(
        "src_host").reset_index(drop=True)
    assert got.src_host.tolist() == want.src_host.tolist()
    for c in ["n_links", "n_internal", "n_unique_targets"]:
        assert got[c].astype(int).tolist() == want[c].astype(int).tolist(), c


def test_pagerank_matches_dense_power_iteration(ray_session):
    """Chain + star + dangling fixture vs a dense numpy reference."""
    import ray as _ray

    from text_extraction_ray.core.links import pagerank

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
             ("d", "a"), ("d", "b"), ("e", "d")]  # 'c' has an edge; all reachable
    t = pa.table({
        "src_host": pa.array([s for s, _ in edges]),
        "dst_host": pa.array([d for _, d in edges]),
    })
    ds = _ray.data.from_arrow(t).repartition(3)
    got = pagerank(ds, damping=0.85, iters=40).to_pandas().set_index(
        "host")["rank"]

    hosts = sorted({h for e in edges for h in e})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    M = np.zeros((n, n))
    deg = np.zeros(n)
    for s, d in edges:
        deg[idx[s]] += 1
    for s, d in edges:
        M[idx[d], idx[s]] += 1.0 / deg[idx[s]]
    r = np.full(n, 1 / n)
    for _ in range(40):
        dangling = r[deg == 0].sum()
        r = (1 - 0.85) / n + 0.85 * (M @ r + dangling / n)
    for h in hosts:
        assert abs(got[h] - r[idx[h]]) < 1e-9, h
    assert abs(got.sum() - 1.0) < 1e-9


def test_pagerank_dangling_mass(ray_session):
    """A sink node's rank is redistributed, not lost: ranks still sum
    to 1 with a pure sink present."""
    import ray as _ray

    from text_extraction_ray.core.links import pagerank

    t = pa.table({"src_host": pa.array(["a", "b"]),
                  "dst_host": pa.array(["sink", "sink"])})
    got = pagerank(_ray.data.from_arrow(t), iters=30).to_pandas()
    assert abs(got["rank"].sum() - 1.0) < 1e-9
    assert got.set_index("host")["rank"]["sink"] > 0.5


def test_host_pagerank_uniform_on_self_loop_crawl(ray_session):
    """The synthetic crawl's links are all site-relative → the host
    graph is self-loops only → PageRank is exactly uniform."""
    from text_extraction_ray.pipelines.queries_r3s import q_host_pagerank

    got = q_host_pagerank(SF_DIR).to_pandas()
    assert len(got) == 97
    assert np.allclose(got["rank"], 1.0 / 97, atol=1e-6)


def test_r3s_registered_rows_only(ray_session):
    from text_extraction_ray.pipelines.queries import oracle_sql, queries
    from text_extraction_ray.pipelines.queries_r3s import queries_r3s

    qs, osql = queries(), oracle_sql()
    for name in queries_r3s():
        assert name in qs
        assert name not in osql


def test_pagerank_distributed_branch_matches_driver(ray_session):
    """pair_cap=0 forces the distributed iterations; ranks must be
    identical (same formula, different execution) to the driver path."""
    import ray as _ray

    from text_extraction_ray.core.links import pagerank

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
             ("d", "a"), ("a", "b"), ("e", "d")]
    t = pa.table({"src_host": pa.array([s for s, _ in edges]),
                  "dst_host": pa.array([d for _, d in edges])})
    ds = _ray.data.from_arrow(t).repartition(3)
    drv = pagerank(ds, iters=15).to_pandas().set_index("host")["rank"]
    dist = pagerank(ds, iters=15, pair_cap=0).to_pandas().set_index(
        "host")["rank"]
    assert sorted(drv.index) == sorted(dist.index)
    assert np.allclose(drv[dist.index], dist, atol=1e-12)


def test_canonicalize_url_cases():
    from text_extraction_ray.core.links import canonicalize_url as c

    assert c("HTTP://Site.Example:80/a//b/../c?z=1&a=2#frag") == \
        "http://site.example/a/c?a=2&z=1"
    assert c("https://h.example:443/") == "https://h.example/"
    assert c("https://h.example") == "https://h.example/"
    assert c("https://h.example/p?utm_source=x&q=1") == \
        "https://h.example/p?q=1"
    assert c("https://h.example/a/b/..") == "https://h.example/a"
    assert c("https://h.example/../x") == "https://h.example/x"
    # kept distinct on purpose: trailing slash, www, %-escapes
    assert c("https://h.example/a/") != c("https://h.example/a")
    assert c("https://www.h.example/") != c("https://h.example/")
    # idempotent
    for u in ["HTTP://A.B:80/x/../y?b=2&a=1#f", "https://q.example//z?utm_term=t"]:
        assert c(c(u)) == c(u)


def test_canonicalize_batch_collapses_variants(ray_session):
    import ray as _ray

    from text_extraction_ray.core.links import canonicalize_batch

    t = pa.table({"url": pa.array([
        "https://h.example/a?x=1&y=2",
        "https://h.example/a?y=2&x=1#frag",
        "HTTPS://H.EXAMPLE:443/b/../a?utm_source=s&x=1&y=2",
        "https://h.example/other",
    ])})
    ds = _ray.data.from_arrow(t).repartition(2).map_batches(
        canonicalize_batch, batch_format="pyarrow")
    df = ds.to_pandas()
    assert df.canonical_url.nunique() == 2
    assert (df.canonical_url == "https://h.example/a?x=1&y=2").sum() == 3


def test_pagerank_distributed_branch_never_collects_midway(ray_session,
                                                           monkeypatch):
    """VERDICT r3 #2: the distributed branch must stay keyed — no
    take_all ever, and the only to_pandas is the final (host, rank)
    return the pa.Table API requires."""
    import ray as _ray
    import ray.data as rd

    from text_extraction_ray.core.links import pagerank

    calls = {"take_all": 0, "to_pandas": 0}
    real_take_all, real_to_pandas = rd.Dataset.take_all, rd.Dataset.to_pandas

    def spy_take_all(self, *a, **k):
        calls["take_all"] += 1
        return real_take_all(self, *a, **k)

    def spy_to_pandas(self, *a, **k):
        calls["to_pandas"] += 1
        return real_to_pandas(self, *a, **k)

    monkeypatch.setattr(rd.Dataset, "take_all", spy_take_all)
    monkeypatch.setattr(rd.Dataset, "to_pandas", spy_to_pandas)

    t = pa.table({"src_host": ["a", "b", "c", "a"],
                  "dst_host": ["b", "c", "a", "c"]})
    out = pagerank(_ray.data.from_arrow(t), iters=3, pair_cap=0)
    assert abs(sum(out.column("rank").to_pylist()) - 1.0) < 1e-9
    assert calls["take_all"] == 0
    assert calls["to_pandas"] == 1
