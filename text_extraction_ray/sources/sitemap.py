"""Sitemap XML source + deterministic synthetic sitemap/robots fixtures.

``read_sitemaps`` turns a directory of sitemap XML shards into a
Dataset of URL rows via ``read_binary_files`` + a flat parse stage —
the same shard-parallel shape as the WARC/WET sources: one file maps
to one parse task, no driver-side XML work.  Both ``<urlset>`` and
``<sitemapindex>`` documents parse (index entries emit
``kind='sitemap'`` rows — in this no-network sandbox child sitemaps
are sibling shards the directory read already covers, so index rows
are inventory, not fetch work).  Parsing is stdlib
``xml.etree.ElementTree`` with the namespace stripped; malformed
shards yield zero rows instead of failing the task (total, like every
other source in this repo).

``gen_sitemaps`` derives a deterministic fixture set from the
synthetic crawl: per host one sitemap shard holding (a) a sample of
ALREADY-CRAWLED page URLs, (b) fresh ``/new/…`` URLs, (c) fresh
``/private/…`` URLs (robots-blocked downstream), plus syntactic
duplicate variants (tracking params / duplicate slashes) that the
canonicalizer must collapse; and ``robots.parquet`` — per-host
robots.txt bodies with varying Disallow/Allow/Crawl-delay shapes
(every 7th host blocks everything).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

_STAMP = "v=1"


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap(payload: bytes, source: str = "") -> list[dict]:
    """Total parse of one sitemap document → url rows."""
    try:
        root = ET.fromstring(payload)
    except ET.ParseError:
        return []
    kind_of_root = _strip_ns(root.tag)
    rows = []
    for node in root:
        tag = _strip_ns(node.tag)
        if tag not in ("url", "sitemap"):
            continue
        loc = lastmod = None
        priority = 0.5
        for child in node:
            c = _strip_ns(child.tag)
            text = (child.text or "").strip()
            if c == "loc":
                loc = text
            elif c == "lastmod":
                lastmod = text
            elif c == "priority":
                try:
                    priority = float(text)
                except ValueError:
                    pass
        if loc:
            rows.append({
                "url": loc,
                "lastmod": lastmod or "",
                "priority": priority,
                "kind": "sitemap" if (tag == "sitemap"
                                      or kind_of_root == "sitemapindex")
                        else "url",
                "source_file": source,
            })
    return rows


def _parse_batch(b: pa.Table) -> pa.Table:
    rows: list[dict] = []
    for path, payload in zip(b.column("path").to_pylist(),
                             b.column("bytes").to_pylist()):
        rows.extend(parse_sitemap(payload, os.path.basename(path)))
    return pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "lastmod": pa.array([r["lastmod"] for r in rows], pa.string()),
        "priority": pa.array([r["priority"] for r in rows], pa.float64()),
        "kind": pa.array([r["kind"] for r in rows], pa.string()),
        "source_file": pa.array([r["source_file"] for r in rows],
                                pa.string()),
    })


def read_sitemaps(dir_path: str) -> ray.data.Dataset:
    return (ray.data.read_binary_files(dir_path, include_paths=True,
                                       file_extensions=["xml"])
            .map_batches(_parse_batch, batch_format="pyarrow"))


def gen_sitemaps(out_dir: str, crawled_urls: list[str],
                 force: bool = False) -> str:
    """Deterministic sitemap + robots fixture set for the given crawl.

    Idempotent via a stamp file (the bench path never regenerates).
    Returns ``out_dir``.
    """
    stamp = os.path.join(out_dir, "_STAMP")
    want = f"{_STAMP} n={len(crawled_urls)}"
    if (not force and os.path.exists(stamp)
            and open(stamp).read() == want):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    by_host: dict[str, list[str]] = {}
    for u in sorted(crawled_urls):
        host = u.split("/", 3)[2]
        by_host.setdefault(host, []).append(u)
    index_entries = []
    for hi, (host, urls) in enumerate(sorted(by_host.items())):
        entries = []
        # (a) every other crawled URL re-announced, with a tracking-param
        # variant every 4th (the canonicalizer must collapse it)
        for i, u in enumerate(urls[::2]):
            v = u + "?utm_source=smap" if i % 4 == 3 else u
            entries.append((v, f"2026-07-{(i % 28) + 1:02d}",
                            0.5 + (i % 5) / 10.0))
        # (b) fresh public URLs, one duplicate-slash variant each 5th
        for j in range((hi % 4) + 2):
            path = f"/new/page-{j}" if j % 5 != 4 else f"//new//page-{j}"
            entries.append((f"https://{host}{path}",
                            f"2026-08-{(j % 28) + 1:02d}",
                            0.9))
        # (c) robots-blocked URLs
        for j in range((hi % 3) + 1):
            entries.append((f"https://{host}/private/doc-{j}", "", 0.1))
        fname = f"sitemap-{host}.xml"
        body = ['<?xml version="1.0" encoding="UTF-8"?>',
                '<urlset xmlns="http://www.sitemaps.org/schemas/'
                'sitemap/0.9">']
        for loc, lastmod, prio in entries:
            body.append("<url><loc>%s</loc>%s<priority>%.1f</priority>"
                        "</url>" % (
                            loc,
                            f"<lastmod>{lastmod}</lastmod>" if lastmod
                            else "",
                            prio))
        body.append("</urlset>")
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write("\n".join(body))
        index_entries.append(fname)
    with open(os.path.join(out_dir, "sitemap-index.xml"), "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n'
                '<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
                'sitemap/0.9">\n'
                + "\n".join(
                    f"<sitemap><loc>https://example.org/{n}</loc>"
                    f"</sitemap>" for n in sorted(index_entries))
                + "\n</sitemapindex>")
    hosts = sorted(by_host)
    bodies = []
    for hi, host in enumerate(hosts):
        if hi % 7 == 3:
            bodies.append("User-agent: *\nDisallow: /")
        else:
            lines = ["User-agent: *", "Disallow: /private/"]
            if hi % 5 == 0:
                lines.append("Allow: /private/doc-0$")
            lines.append(f"Crawl-delay: {(hi % 4) + 1}")
            bodies.append("\n".join(lines))
    pq.write_table(
        pa.table({"host": pa.array(hosts, pa.string()),
                  "body": pa.array(bodies, pa.string())}),
        os.path.join(out_dir, "robots.parquet"))
    with open(stamp, "w") as f:
        f.write(want)
    return out_dir
