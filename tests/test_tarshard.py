"""Pins for the WebDataset TAR shard lane: USTAR spec compliance
(stdlib tarfile reads our bytes), checksum verification on the read
path, deterministic shard bytes, and the census/index consistency."""

from __future__ import annotations

import io
import tarfile

import pytest

from mapreduce_lab_spark.multimodal.tarshard import (
    WDS_SHARD_DOCS,
    build_tar,
    iter_tar,
    pack_webdataset_shards,
    tar_header,
)


def test_stdlib_tarfile_reads_our_archives():
    members = [
        ("00000001.txt", b"hello world"),
        ("00000001.cls", b"en"),
        ("00000002.txt", b"x" * 513),  # crosses a block boundary
        ("00000002.cls", b"de"),
        ("00000003.txt", b""),  # empty member: header only
    ]
    payload = build_tar(members)
    tf = tarfile.open(fileobj=io.BytesIO(payload))
    got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == members
    assert iter_tar(payload) == members
    assert len(payload) % 512 == 0


def test_reader_rejects_corrupt_header_checksum():
    payload = bytearray(build_tar([("a.txt", b"abc")]))
    payload[0] ^= 0xFF  # flip a name byte without fixing the checksum
    with pytest.raises(ValueError, match="checksum"):
        iter_tar(bytes(payload))


def test_header_is_deterministic():
    assert tar_header("a.txt", 3) == tar_header("a.txt", 3)
    assert build_tar([("a.txt", b"abc")]) == build_tar([("a.txt", b"abc")])


def test_shards_are_bounded_and_deterministic(spark, sf_dir):
    from mapreduce_lab_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    shards = {
        r.shard_id: bytes(r.payload)
        for r in pack_webdataset_shards(docs).collect()
    }
    again = {
        r.shard_id: bytes(r.payload)
        for r in pack_webdataset_shards(docs).collect()
    }
    assert shards == again, "shard bytes must be bit-deterministic"
    n_docs = docs.count()
    assert len(shards) == (n_docs + WDS_SHARD_DOCS - 1) // WDS_SHARD_DOCS
    for sid, payload in shards.items():
        members = iter_tar(payload)
        assert len(members) <= 2 * WDS_SHARD_DOCS
        bases = [n.rsplit(".", 1)[0] for n, _ in members]
        assert bases == sorted(bases), "samples in ascending doc_id order"
        # each sample contributes exactly .txt + .cls, adjacent
        assert all(
            members[i][0].endswith(".txt") and members[i + 1][0].endswith(".cls")
            for i in range(0, len(members), 2)
        )
