"""WebDataset-style TAR shard pack/unpack — the shipping container of
large-scale multimodal training corpora.

The WebDataset convention (public: the webdataset project and the
POSIX USTAR spec) stores a training corpus as TAR shards; each sample
is a group of members sharing a basename and differing in extension
(``00000042.txt`` + ``00000042.cls`` here — the text payload and its
label; image/audio members work identically as opaque bytes). Loaders
stream shards sequentially, which is why the format wins at 100 TB:
no per-sample object-store round trips, pure sequential I/O.

This lane implements BOTH sides dependency-free and proves the round
trip differentially:

- **Writer** (``build_tar``): USTAR headers from the spec — octal
  size field, checksum computed with the chksum field blanked to
  spaces, 512-byte data padding, two zero trailer blocks. mtime is
  pinned to 0 so shard bytes are deterministic.
- **Reader** (``iter_tar``): header parse + checksum verification +
  member extraction; raises on a corrupt checksum (the seam a real
  loader needs when a shard is truncated mid-transfer).
- **Queries**: documents group into fixed-size shards
  (``applyInPandas`` per shard — bounded by WDS_SHARD_DOCS, so the
  pandas frame is constant-size no matter the corpus); the SAME query
  then re-parses the shard bytes it built and reports a census the
  DuckDB oracle recomputes straight from the documents table: member
  counts, sample counts, data bytes, the EXACT archive byte size from
  the USTAR padding formula, and an md5-derived content checksum per
  member (``hex8_int`` — the repo's engine-portable hash). A wrong
  header field, checksum, padding, or member ordering changes the
  census and fails the hash gate.

Scale shape: one shuffle (groupBy shard id, keys = |docs|/WDS_SHARD
groups), per-group work bounded by the shard size constant, payloads
never re-shuffle after assembly. The member-level index query is pure
narrow work after the same single shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.hashing import oracle_hex8_int
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

WDS_SHARD_DOCS = 50  # samples per shard (demo scale; prod ~10k)

_BLOCK = 512


def _octal(value: int, width: int) -> bytes:
    return (f"%0{width - 1}o" % value).encode("ascii") + b"\0"


def tar_header(name: str, size: int) -> bytes:
    """512-byte USTAR header, mtime pinned to 0 (deterministic)."""
    nm = name.encode("ascii")
    if len(nm) > 100:
        raise ValueError(f"member name too long: {name!r}")
    h = bytearray(_BLOCK)
    h[0 : len(nm)] = nm
    h[100:108] = _octal(0o644, 8)  # mode
    h[108:116] = _octal(0, 8)  # uid
    h[116:124] = _octal(0, 8)  # gid
    h[124:136] = _octal(size, 12)
    h[136:148] = _octal(0, 12)  # mtime = 0
    h[148:156] = b"        "  # chksum blanked for the sum
    h[156] = ord("0")  # typeflag: regular file
    h[257:263] = b"ustar\0"
    h[263:265] = b"00"
    chk = sum(h)
    h[148:155] = (f"%06o" % chk).encode("ascii") + b"\0"
    h[155] = ord(" ")
    return bytes(h)


def build_tar(members: list[tuple[str, bytes]]) -> bytes:
    out = bytearray()
    for name, data in members:
        out += tar_header(name, len(data))
        out += data
        pad = (-len(data)) % _BLOCK
        out += b"\0" * pad
    out += b"\0" * (2 * _BLOCK)  # end-of-archive marker
    return bytes(out)


def iter_tar(payload: bytes) -> list[tuple[str, bytes]]:
    """Parse a USTAR stream; verifies each header checksum."""
    members: list[tuple[str, bytes]] = []
    pos = 0
    while pos + _BLOCK <= len(payload):
        header = payload[pos : pos + _BLOCK]
        if header == b"\0" * _BLOCK:  # end-of-archive
            break
        # checksum FIRST: a corrupt header must raise the checksum
        # error, not a downstream decode/parse artifact of garbage
        try:
            stored = int(header[148:156].split(b"\0", 1)[0].strip() or b"0", 8)
        except ValueError:
            stored = -1
        blanked = bytearray(header)
        blanked[148:156] = b"        "
        if sum(blanked) != stored:
            raise ValueError(f"tar header checksum mismatch at {pos}")
        name = header[0:100].split(b"\0", 1)[0].decode("ascii")
        size = int(header[124:136].split(b"\0", 1)[0] or b"0", 8)
        pos += _BLOCK
        members.append((name, payload[pos : pos + size]))
        pos += size + ((-size) % _BLOCK)
    return members


def _ship_by_value() -> None:
    """Register this module for cloudpickle by-value pickling so the
    pack/parse closures ship the tar code inside the task (the same
    executor-sys.path constraint binary_ops documents)."""
    from pyspark import cloudpickle

    import mapreduce_lab_spark.multimodal.tarshard as _self

    cloudpickle.register_pickle_by_value(_self)


def _hex8(data: bytes) -> int:
    import hashlib

    return int(hashlib.md5(data).hexdigest()[:8], 16)


def pack_webdataset_shards(docs: DataFrame) -> DataFrame:
    """(shard_id, payload): documents grouped into WDS_SHARD_DOCS-doc
    TAR shards; each sample is <doc_id:08d>.txt (text) + .cls (lang),
    members in ascending doc_id order."""
    shards = docs.select(
        F.call_function(
            "div", F.col("doc_id").cast("long"), F.lit(WDS_SHARD_DOCS).cast("long")
        ).alias("shard_id"),
        "doc_id",
        "text",
        "lang",
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":  # noqa: F821
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        members: list[tuple[str, bytes]] = []
        for doc_id, text, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
            members.append((f"{doc_id:08d}.txt", text.encode("utf-8")))
            members.append((f"{doc_id:08d}.cls", lang.encode("utf-8")))
        return pd.DataFrame(
            {"shard_id": [int(pdf["shard_id"].iloc[0])], "payload": [build_tar(members)]}
        )

    return shards.groupBy("shard_id").applyInPandas(
        pack, schema="shard_id long, payload binary"
    )


# Exact USTAR size algebra, shared by both oracles: each member costs
# one 512-byte header plus its data padded to 512; the archive adds
# two zero trailer blocks.
_O_MEMBER_BYTES = "(512 + 512 * ((octet_length(encode({c})) + 511) // 512))"


@query(
    "webdataset_shard_census",
    oracle=f"""
    WITH m AS (
      SELECT doc_id // {WDS_SHARD_DOCS} AS shard_id,
             octet_length(encode(text)) AS tb,
             octet_length(encode(lang)) AS lb,
             {_O_MEMBER_BYTES.format(c='text')}
               + {_O_MEMBER_BYTES.format(c='lang')} AS mb,
             {oracle_hex8_int('text')} + {oracle_hex8_int('lang')} AS hsum
      FROM documents
    )
    SELECT shard_id,
           CAST(2 * count(*) AS BIGINT) AS n_members,
           count(*) AS n_samples,
           CAST(sum(tb + lb) AS BIGINT) AS data_bytes,
           CAST(sum(mb) + 1024 AS BIGINT) AS shard_bytes,
           CAST(sum(hsum) AS BIGINT) AS content_hash_sum
    FROM m GROUP BY shard_id
    """,
)
def q_webdataset_shard_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into WebDataset TAR shards, RE-PARSE the bytes
    just built, and report per shard: member/sample counts, payload
    data bytes, the exact archive size, and the md5-derived content
    checksum sum — every number recomputed by DuckDB from the raw
    documents table, so the writer's headers/padding/ordering and the
    reader's parse/checksum both sit behind the hash gate."""
    _ship_by_value()
    docs = load_table(spark, sf_dir, "documents")
    payloads = pack_webdataset_shards(docs)

    def census(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in (
                "shard_id", "n_members", "n_samples", "data_bytes",
                "shard_bytes", "content_hash_sum",
            )}
            for shard_id, payload in zip(pdf["shard_id"], pdf["payload"]):
                payload = bytes(payload)
                members = iter_tar(payload)
                rows["shard_id"].append(shard_id)
                rows["n_members"].append(len(members))
                rows["n_samples"].append(
                    len({n.rsplit(".", 1)[0] for n, _ in members})
                )
                rows["data_bytes"].append(sum(len(d) for _, d in members))
                rows["shard_bytes"].append(len(payload))
                rows["content_hash_sum"].append(
                    sum(_hex8(d) for _, d in members)
                )
            yield pd.DataFrame(rows)

    schema = (
        "shard_id long, n_members long, n_samples long, data_bytes long, "
        "shard_bytes long, content_hash_sum long"
    )
    return payloads.mapInPandas(census, schema=schema)


@query(
    "webdataset_member_index",
    oracle=f"""
    WITH m AS (
      SELECT doc_id // {WDS_SHARD_DOCS} AS shard_id, doc_id,
             printf('%08d.txt', doc_id) AS name,
             octet_length(encode(text)) AS size,
             {oracle_hex8_int('text')} AS content_hash
      FROM documents
      UNION ALL
      SELECT doc_id // {WDS_SHARD_DOCS}, doc_id,
             printf('%08d.cls', doc_id),
             octet_length(encode(lang)),
             {oracle_hex8_int('lang')}
      FROM documents
    )
    SELECT shard_id, name, CAST(size AS BIGINT) AS size, content_hash
    FROM m
    """,
)
def q_webdataset_member_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Member-level index of the packed shards (the .idx file real
    WebDataset loaders build for random access): every member's shard,
    name, byte size, and content hash, read back from the TAR bytes."""
    _ship_by_value()
    docs = load_table(spark, sf_dir, "documents")
    payloads = pack_webdataset_shards(docs)

    def index(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in ("shard_id", "name", "size", "content_hash")}
            for shard_id, payload in zip(pdf["shard_id"], pdf["payload"]):
                for name, data in iter_tar(bytes(payload)):
                    rows["shard_id"].append(shard_id)
                    rows["name"].append(name)
                    rows["size"].append(len(data))
                    rows["content_hash"].append(_hex8(data))
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(
        index, schema="shard_id long, name string, size long, content_hash long"
    )
