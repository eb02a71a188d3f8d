"""SOZip (sources/sozip.py): wire format, stdlib interop, and the
distributed in-zip text-split rule."""

import zipfile

import pytest

from gdal_spark.sources.sozip import (
    read_sozip_lines,
    sozip_index,
    write_sozip,
)


def test_stdlib_zipfile_interop(tmp_path):
    data = b"hello sozip\n" * 1000
    path = str(tmp_path / "a.zip")
    n = write_sozip(path, "m.txt", data, chunk_size=1024)
    assert n == 12
    zf = zipfile.ZipFile(path)
    assert zf.read("m.txt") == data           # plain deflate member
    assert ".m.txt.sozip.idx" in zf.namelist()
    assert zf.testzip() is None               # CRCs all good


def test_index_consistency(tmp_path):
    data = bytes(range(256)) * 100
    path = str(tmp_path / "b.zip")
    write_sozip(path, "bin", data, chunk_size=4000)
    cs, us, csz, offs, ds = sozip_index(path, "bin")
    assert cs == 4000 and us == len(data)
    assert offs[0] == 0 and sorted(offs) == offs
    assert len(offs) == -(-len(data) // 4000)


def test_distributed_lines_every_boundary_case(spark, tmp_path):
    """Lines spanning chunk boundaries, a line exactly ending at a
    boundary, and a line longer than a whole chunk all come back
    exactly once."""
    lines = []
    lines.append("a" * 100)           # ordinary
    lines.append("b" * 252)           # engineered boundary interplay
    lines.append("c" * 700)           # longer than the chunk size
    for i in range(200):
        lines.append(f"line-{i:04d}-" + "z" * (i % 53))
    text = "\n".join(lines) + "\n"
    path = str(tmp_path / "l.zip")
    write_sozip(path, "t.txt", text.encode(), chunk_size=256)
    back = read_sozip_lines(spark, path, "t.txt").toPandas()["value"]
    assert sorted(back) == sorted(lines)      # exactly once each


def test_line_exactly_at_chunk_boundary(spark, tmp_path):
    # chunk_size 8: "abcdefg\n" fills chunk 0 exactly; the next line
    # starts AT the boundary and must come back exactly once
    text = "abcdefg\nhij\nkl\n"
    path = str(tmp_path / "e.zip")
    write_sozip(path, "t.txt", text.encode(), chunk_size=8)
    back = sorted(read_sozip_lines(spark, path, "t.txt").toPandas()["value"])
    assert back == ["abcdefg", "hij", "kl"]


def test_missing_member_raises(tmp_path):
    path = str(tmp_path / "m.zip")
    write_sozip(path, "x", b"data\n", chunk_size=16)
    with pytest.raises(KeyError, match="nope"):
        sozip_index(path, "nope")
