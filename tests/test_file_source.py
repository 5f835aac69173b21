"""File-based HTML source (sources/files.py): the reference's
parseFile / transparent-gzip surface (`helper/DataUtil.kt:49-51`) as a
Ray source — write sharded .html/.html.gz files, read them back, and
verify the payloads and urls round-trip exactly."""

import gzip
import os

import pytest


@pytest.fixture(scope="module")
def file_corpus(ray_session, sf_dir, tmp_path_factory):
    from ksoup_ray.sources.files import write_html_shards
    from ksoup_ray.sources.synth import cc_pages

    root = str(tmp_path_factory.mktemp("html_corpus"))
    n = write_html_shards(cc_pages(sf_dir), root, num_shards=4,
                          gzip_every=2)
    return root, n


def test_round_trip_bytes_and_urls(file_corpus, sf_dir):
    import ray.data as rd
    from ksoup_ray.sources.files import read_html_files
    from ksoup_ray.sources.synth import cc_pages

    root, n = file_corpus
    got = read_html_files(root).to_pandas().set_index("url")["html"]
    want = cc_pages(sf_dir).to_pandas().set_index("url")["html"]
    assert n == len(want) == len(got)
    assert sorted(got.index) == sorted(want.index)
    # byte-identical payloads after transparent gunzip
    for url in want.index:
        assert bytes(got[url]) == bytes(want[url]), url


def test_gzip_by_magic_not_extension(file_corpus):
    """A gzipped file with a plain .html name still decodes — gzip is
    detected by the 1f 8b magic, like the reference's stream sniff."""
    import ray.data as rd
    from ksoup_ray.sources.files import read_html_files

    root, _ = file_corpus
    payload = b"<html><body><p>magic</p></body></html>"
    sdir = os.path.join(root, "shard=00")
    with open(os.path.join(sdir, "en_99999999.html"), "wb") as f:
        f.write(gzip.compress(payload, mtime=0))
    try:
        got = read_html_files(root).to_pandas().set_index("url")["html"]
        assert bytes(
            got["https://synth.invalid/en/99999999"]) == payload
    finally:
        os.remove(os.path.join(sdir, "en_99999999.html"))


def test_shards_contain_mixed_compression(file_corpus):
    root, _ = file_corpus
    names = [f for d in sorted(os.listdir(root))
             for f in os.listdir(os.path.join(root, d))]
    assert any(f.endswith(".html.gz") for f in names)
    assert any(f.endswith(".html") and not f.endswith(".html.gz")
               for f in names)


def test_z_suffix_and_bad_names_counted_not_fatal(ray_session, tmp_path):
    """'.z' gzip files load (reference DataUtil.kt: '.gz or .z');
    externally-named files are COUNTED drops, not task kills."""
    from ksoup_ray.sources.files import _parse_name, read_html_files

    assert _parse_name("/a/en_00000007.html.z") == ("en", 7)
    assert _parse_name("/a/en_00000007.html.gz") == ("en", 7)
    assert _parse_name("/a/readme.html.z") is None
    assert _parse_name("/a/en_x7.html") is None

    root = tmp_path / "mixed"
    sdir = root / "shard=00"
    sdir.mkdir(parents=True)
    (sdir / "en_00000003.html").write_bytes(b"<p>plain</p>")
    (sdir / "en_00000004.html.z").write_bytes(
        gzip.compress(b"<p>zed</p>", mtime=0))
    (sdir / "not-a-doc.html").write_bytes(b"<p>external</p>")
    out = read_html_files(str(root)).to_pandas().sort_values("url")
    assert len(out) == 2               # bad name skipped, not fatal
    assert [bytes(b) for b in out["html"]] == [b"<p>plain</p>",
                                               b"<p>zed</p>"]
