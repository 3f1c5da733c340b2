"""Multimodal columns: opaque binary payloads + typed metadata.

ABSENT from the reference (strings only — SURVEY.md §1.1); this is
the training-pipeline surface for image/audio/video data: the payload
travels as an opaque ``binary`` column next to a typed metadata
struct, and all per-blob compute runs as Arrow-batched ``mapInPandas``
(one Python invocation per ~10k-row batch, never per row).

The container has no image/audio codecs, so ``decode_image`` is the
clearly-marked stub seam: real decode raises ``NotImplementedError``
unless PIL is importable; ``fake_decode`` is the deterministic test
double. Everything around the seam — schema, batching, partitioning,
the UDTF row-explosion shape for frame sampling — is real and
oracle-checked: the payloads here are utf-8 document bytes, so DuckDB
can recompute byte lengths, md5 digests, and frame chunking exactly.

Scale notes: blobs never pass through a shuffle in these operators
(narrow mapInPandas over the scan); metadata-only queries prune the
payload column at the parquet reader. For real lakes, store payloads
in their own parquet column (or out-of-line object store keys) so
``ReadSchema`` stays narrow when only metadata is queried.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import fan_out, load_table

FRAME_STRIDE = 128  # one sampled frame per 128 payload bytes
FRAME_LEN = 64


def blobify(docs: DataFrame) -> DataFrame:
    """documents → multimodal shape: (doc_id, payload binary, meta struct).

    Metadata is derived deterministically from doc_id so the oracle
    can recompute it; in a real pipeline it arrives from ingestion.
    """
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 2 == 0, F.lit("png")).otherwise(F.lit("jpeg")).alias("format"),
            (32 + F.col("doc_id") % 97).cast("int").alias("width"),
            (32 + (F.col("doc_id") * 7) % 89).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, fmt: str):
    """Decode an image payload to a pixel array — STUB.

    The real path needs an image codec which this container does not
    ship; it is gated behind an import-try exactly where a production
    deployment would plug PIL/torchvision in.
    """
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL, not available in this environment; "
            "use fake_decode() for deterministic tests"
        ) from exc


def fake_decode(payload: bytes, width: int, height: int) -> list[int]:
    """Deterministic decode double: first width+height payload bytes
    cycled into a fake 'pixel' list. Stable across engines/runs."""
    n = width + height
    if not payload:
        return [0] * n
    return [payload[i % len(payload)] for i in range(n)]


def blob_stats(blobs: DataFrame) -> DataFrame:
    """Per-blob stats via Arrow-batched mapInPandas: byte length + md5.

    The work is trivially expressible in SQL (that's what makes it
    oracle-checkable); the point is the plumbing — pandas batches in,
    stable schema out, payload bytes handled as Python ``bytes``.
    """
    schema = "doc_id long, fmt string, width int, height int, n_bytes long, payload_md5 string"

    def stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": [m["format"] for m in pdf["meta"]],
                    "width": [m["width"] for m in pdf["meta"]],
                    "height": [m["height"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "payload_md5": [hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]],
                }
            )

    return blobs.mapInPandas(stats, schema=schema)


@query(
    "multimodal_blob_stats",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
           (32 + doc_id % 97)::INT AS width,
           (32 + (doc_id * 7) % 89)::INT AS height,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def q_multimodal_blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return blob_stats(blobify(fan_out(load_table(spark, sf_dir, "documents"), spark)))


def frame_sample(blobs: DataFrame) -> DataFrame:
    """Sample 'frames' from each payload: a UDTF-shaped mapInPandas.

    One output row per FRAME_STRIDE-byte window (the video analog:
    every Nth frame), each identified by the md5 of its FRAME_LEN-byte
    chunk — the exact row-explosion shape a real frame sampler has,
    with the codec swapped for byte slicing.
    """
    schema = "doc_id long, frame_idx int, frame_md5 string"

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                i = 0
                while i * FRAME_STRIDE < len(data):
                    chunk = data[i * FRAME_STRIDE : i * FRAME_STRIDE + FRAME_LEN]
                    ids.append(doc_id)
                    idxs.append(i)
                    digests.append(hashlib.md5(chunk).hexdigest())
                    i += 1
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_md5": digests})

    return blobs.select("doc_id", "payload").mapInPandas(frames, schema=schema)


@query(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id, i::INT AS frame_idx,
           md5(substr(text, i * {FRAME_STRIDE} + 1, {FRAME_LEN})) AS frame_md5
    FROM documents,
         unnest(range(0, (octet_length(encode(text)) + {FRAME_STRIDE - 1}) // {FRAME_STRIDE})) AS t(i)
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample(blobify(fan_out(load_table(spark, sf_dir, "documents"), spark)))
