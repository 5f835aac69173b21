"""WARC-style source (sources/warc.py): shard write → read round-trip
byte identity, member-splitting on raw gzip concatenations, plain
record iteration, and header parsing."""

import gzip
import os

import pytest

from ksoup_ray.sources.warc import (
    _iter_records,
    _parse_record,
    _record_bytes,
    _split_members,
)


def test_record_roundtrip_unit():
    rec = _record_bytes("https://x.invalid/a", b"<html>hi</html>")
    url, payload = _parse_record(rec[:-4])   # strip trailing CRLFs
    assert url == "https://x.invalid/a"
    assert payload == b"<html>hi</html>"


def test_split_members_and_iter_records_agree():
    recs = [_record_bytes(f"https://x.invalid/{i}",
                          b"<p>" + bytes(str(i), "ascii") + b"</p>")
            for i in range(5)]
    gz_concat = b"".join(gzip.compress(r, mtime=0) for r in recs)
    plain_concat = b"".join(recs)
    via_gz = [_parse_record(r) for r in _split_members(gz_concat)]
    via_plain = [_parse_record(r) for r in _iter_records(plain_concat)]
    assert via_gz == via_plain
    assert len(via_gz) == 5
    assert via_gz[3][1] == b"<p>3</p>"


def test_payload_with_crlf_crlf_inside():
    """Content-Length framing, not delimiter scanning: a payload
    containing the record separator must survive intact."""
    tricky = b"<pre>a\r\n\r\nb</pre>"
    rec = _record_bytes("https://x.invalid/t", tricky)
    out = [_parse_record(r) for r in _iter_records(rec)]
    assert out == [("https://x.invalid/t", tricky)]


def test_warc_shard_roundtrip(ray_session, sf_dir, tmp_path_factory):
    import ray.data as rd
    from ksoup_ray.sources.synth import cc_pages
    from ksoup_ray.sources.warc import read_warc, write_warc_shards

    root = str(tmp_path_factory.mktemp("warc_corpus"))
    n = write_warc_shards(cc_pages(sf_dir), root, records_per_file=64)
    got = read_warc(root).to_pandas().set_index("url")["html"]
    want = cc_pages(sf_dir).to_pandas().set_index("url")["html"]
    assert n == len(want) == len(got)
    assert sorted(got.index) == sorted(want.index)
    for url in want.index:
        assert bytes(got[url]) == bytes(want[url]), url
    # shards are genuinely multi-record files
    shards = [f for f in os.listdir(root) if f.endswith(".warc.gz")]
    assert 1 < len(shards) < n


def test_truncated_record_dropped_not_silent(ray_session, tmp_path):
    """A shard cut mid-payload drops ONLY the truncated record —
    earlier records survive; nothing silently-short is emitted."""
    import ray.data as rd
    from ksoup_ray.sources.warc import read_warc

    good = _record_bytes("https://x.invalid/ok", b"<p>fine</p>")
    cut = _record_bytes("https://x.invalid/cut",
                        b"<p>this payload gets truncated</p>")[:-20]
    root = tmp_path / "warc"
    root.mkdir()
    # one gzip member holding both records, cut inside the second —
    # Arrow inflates the .gz, so the worker sees the plain-record path
    (root / "shard-x.warc.gz").write_bytes(
        gzip.compress(good + cut, mtime=0))
    out = read_warc(str(root)).to_pandas()
    assert list(out["url"]) == ["https://x.invalid/ok"]
    assert bytes(out["html"][0]) == b"<p>fine</p>"


def test_truncated_gzip_member_dropped_not_silent(ray_session, tmp_path):
    """RAW-gzip-member path (1f 8b magic seen by the worker): a member
    truncated mid-payload decompresses PARTIALLY without error — the
    record must be counted as a drop, never emitted silently short
    (the _parse_record length check, mirroring _iter_records)."""
    from ksoup_ray.sources.warc import read_warc

    good = gzip.compress(
        _record_bytes("https://x.invalid/ok", b"<p>fine</p>"), mtime=0)
    # full member whose DECOMPRESSED record is short: gzip a cut record
    # (valid gzip stream, short payload inside)
    cut_rec = _record_bytes("https://x.invalid/cut",
                            b"<p>this payload gets truncated</p>")[:-20]
    cut = gzip.compress(cut_rec, mtime=0)
    root = tmp_path / "warc"
    root.mkdir()
    # double-gzip: Arrow auto-inflates the OUTER layer, so the worker
    # sees the raw concatenated gzip members (1f 8b magic) and takes
    # the _split_members path under test
    blob = good + cut
    (root / "shard-x.warc.gz").write_bytes(gzip.compress(blob, mtime=0))
    out = read_warc(str(root)).to_pandas()
    # Arrow inflates the outer layer; the inner members hit the 1f 8b
    # branch → member split → the cut record is dropped, not shortened
    assert list(out["url"]) == ["https://x.invalid/ok"]
    assert bytes(out["html"][0]) == b"<p>fine</p>"


def test_parse_record_rejects_short_and_malformed():
    rec = _record_bytes("https://x.invalid/a", b"0123456789")
    assert _parse_record(rec) == ("https://x.invalid/a", b"0123456789")
    # payload shorter than Content-Length promises -> None
    assert _parse_record(rec[:-8]) is None
    # header block cut before the blank line -> None
    assert _parse_record(rec[:20]) is None
    # missing Content-Length -> None
    assert _parse_record(
        b"WARC/1.0\r\nWARC-Target-URI: https://x.invalid/a\r\n\r\nhi") \
        is None
