"""Pins for the WebDataset TAR shard lane: USTAR spec compliance
(stdlib tarfile reads our bytes), checksum verification on the read
path, deterministic shard bytes, and the census/index consistency."""

from __future__ import annotations

import io
import tarfile

import pytest
from pyspark.sql import functions as F

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
    # ADVICE r11: shards are keyed by doc_id div WDS_SHARD_DOCS, so
    # the expected count is the number of DISTINCT key buckets — not
    # ceil(n_docs / WDS_SHARD_DOCS), which silently assumes doc_ids
    # are contiguous from 0 and fails spuriously on sparse ids.
    expected = (
        docs.select(
            F.call_function(
                "div", F.col("doc_id"), F.lit(WDS_SHARD_DOCS).cast("long")
            ).alias("bucket")
        )
        .distinct()
        .count()
    )
    assert len(shards) == expected
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


# --- round-12 adversarial widening (VERDICT r11 #4) ---------------------------


from hypothesis import given, settings
from hypothesis import strategies as st

from tests.fuzzbudget import examples

_name_alpha = "abcdefghijklmnopqrstuvwxyz0123456789._-"


@st.composite
def _member_lists(draw):
    n = draw(st.integers(1, 6))
    members = []
    for i in range(n):
        ln = draw(st.integers(1, 100))  # INCLUDING exactly-100 names
        name = "".join(
            draw(st.sampled_from(_name_alpha)) for _ in range(ln - 1)
        )
        name = f"{chr(97 + i)}{name}"[:100]
        # sizes straddling the 512 padding boundary, incl. 0
        size = draw(
            st.sampled_from([0, 1, 511, 512, 513, 1024, 1025])
            | st.integers(0, 1500)
        )
        members.append((name, bytes((j * 31 + i) % 256 for j in range(size))))
    return members


@settings(max_examples=examples(60), deadline=None)
@given(_member_lists())
def test_ustar_roundtrip_and_stdlib_interop_fuzz(members):
    """Both directions against the spec AND stdlib tarfile: our bytes
    parse identically by iter_tar and tarfile (name-length 100 edge,
    size % 512 in {0,1,511,512,513}); stdlib-written USTAR archives
    parse with iter_tar (checksum conventions must agree)."""
    payload = build_tar(members)
    assert iter_tar(payload) == members
    tf = tarfile.open(fileobj=io.BytesIO(payload))
    got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == members
    # reverse interop: stdlib writes, we read
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as w:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            w.addfile(info, io.BytesIO(data))
    assert iter_tar(buf.getvalue()) == members


def test_name_exactly_100_chars_no_nul():
    """A 100-char name fills the field with no NUL terminator — the
    reader must take the full field, and stdlib must agree."""
    name = "d" * 92 + ".txt"  # 96
    name100 = "e" * 96 + ".txt"  # exactly 100
    assert len(name100) == 100
    payload = build_tar([(name, b"x"), (name100, b"y" * 511)])
    assert iter_tar(payload) == [(name, b"x"), (name100, b"y" * 511)]
    tf = tarfile.open(fileobj=io.BytesIO(payload))
    assert [m.name for m in tf.getmembers()] == [name, name100]
    with pytest.raises(ValueError, match="too long"):
        tar_header("f" * 101, 0)


@settings(max_examples=examples(40), deadline=None)
@given(st.integers(0, 511), st.integers(0, 255))
def test_any_single_header_byte_corruption_is_caught(off, val):
    """Flipping ANY header byte to a different value must raise the
    checksum error — except inside the chksum field itself, where a
    mutated stored sum must also fail (the field participates as
    blanks)."""
    payload = bytearray(build_tar([("victim.txt", b"payload")]))
    if payload[off] == val:
        return  # not a corruption
    if 148 <= off < 156:
        # inside the chksum field the sum is computed over blanks, so
        # a mutation that parses to the SAME stored value (e.g. the
        # trailing NUL flipped to a space, both stripped) is a
        # semantic no-op the spec accepts — skip those
        before = payload[148:156]
        after = bytearray(before)
        after[off - 148] = val
        def _parse(b):
            try:
                return int(bytes(b).split(b"\0", 1)[0].strip() or b"0", 8)
            except ValueError:
                return -1
        if _parse(after) == _parse(before):
            return
    payload[off] = val
    with pytest.raises(ValueError, match="checksum"):
        iter_tar(bytes(payload))
