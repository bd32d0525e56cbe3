"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Images/audio/video ride as ``binary`` columns next to typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs over
``mapInPandas``. The decode libraries (PIL/ffmpeg/...) are NOT in this
container, so the codec step is STUBBED behind ``try: import`` with a
deterministic fake (documented below) — but the Spark-side plumbing (schema,
partitioning, UDF signature, Arrow batch shape) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta_codec", T.StringType(), True),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("byte_len", T.LongType(), True),
    T.StructField("header_byte", T.IntegerType(), True),
    T.StructField("fake_width", T.IntegerType(), True),
    T.StructField("fake_height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
])


def documents_as_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap documents into the media table shape (payload = utf-8 bytes).

    Stands in for a real image/audio ingest; the binary column is genuinely
    binary end-to-end (parquet BYTE_ARRAY, Arrow binary buffers).
    """
    return df.select(
        F.col("doc_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8").alias("payload"),
        F.lit("fake-v1").alias("meta_codec"),
    )


def _decode_stub(payload: bytes | None) -> tuple[int, int, int, int, int]:
    """Deterministic fake decoder. A real build would do, e.g.::

        from PIL import Image; img = Image.open(io.BytesIO(payload))

    gated behind try/import. Here: metadata derived from the bytes alone so
    the pipeline is testable and oracle-checkable.
    """
    try:  # the real decode path, absent in this container by design
        import PIL.Image  # noqa: F401

        raise NotImplementedError("real image decode not wired in this sandbox")
    except ImportError:
        pass
    if payload is None or len(payload) == 0:
        return 0, -1, 0, 0, 0
    n = len(payload)
    return n, payload[0], n % 640, n % 480, 1 + n % 16


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("out_width", T.IntegerType(), True),
    T.StructField("out_height", T.IntegerType(), True),
    T.StructField("resized", T.BinaryType(), True),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame", T.BinaryType(), True),
    T.StructField("frame_len", T.LongType(), True),
    T.StructField("frame_head", T.IntegerType(), True),
])


def default_resizer(payload: bytes | None, width: int, height: int) -> bytes:
    """Stub resize (no PIL in this container): deterministic stride-sample of
    the payload bytes down to exactly width*height bytes (cycled if shorter)
    — shape-correct and byte-deterministic so tests and oracles can pin it."""
    target = width * height
    if not payload:
        return b"\x00" * target
    n = len(payload)
    return bytes(payload[(i * n) // target] for i in range(target))


def resize_media(
    media: DataFrame, width: int = 64, height: int = 64, resizer=None
) -> DataFrame:
    """Resize plumbing: binary in -> binary out through mapInPandas.

    ``resizer``: an injectable ``(payload, width, height) -> bytes`` callable
    (cloudpickle-serializable, like any UDF body — plain functions and
    closures both work). Defaults to ``default_resizer``; a production build passes,
    e.g., a PIL-backed ``Image.open(...).resize((w, h)).tobytes()`` wrapper
    and NOTHING else changes — schema, Arrow batching, partitioning and
    memory behavior are identical by construction (asserted by the
    fake-real-codec injection test).
    """
    rz = resizer if resizer is not None else default_resizer

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(),
                "out_width": width,
                "out_height": height,
                "resized": [rz(p, width, height) for p in pdf["payload"]],
            })
            yield out

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def default_framer(payload: bytes) -> list[bytes]:
    """Stub framing (no ffmpeg): the payload splits into ``1 + len % 16``
    equal chunks of ceil(len/n_frames) bytes. Deterministic byte arithmetic
    -> DuckDB-oracle-checkable."""
    n = len(payload)
    nf = 1 + n % 16
    fs = -(-n // nf)  # ceil
    return [payload[i * fs:(i + 1) * fs] for i in range(nf)]


def sample_frames(media: DataFrame, every_n: int = 2, framer=None) -> DataFrame:
    """Frame sampling: one INPUT row fans out to one row per sampled frame
    (the genuinely row-exploding mapInPandas shape a video pipeline needs).

    ``framer``: injectable ``payload -> list[bytes]`` (picklable); defaults
    to ``default_framer``, swapped for an ffmpeg keyframe extractor in a
    production build with no plumbing change.
    """
    fr_fn = framer if framer is not None else default_framer

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                frames = fr_fn(payload)
                for i in range(0, len(frames), every_n):
                    fr = frames[i]
                    rows.append((int(doc_id), i, fr, len(fr),
                                 fr[0] if fr else -1))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "frame", "frame_len", "frame_head"],
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def decode_media(
    media: DataFrame, batch_size_hint: int = 4096, decoder=None
) -> DataFrame:
    """mapInPandas decoder: binary payload -> typed feature columns.

    Partition-parallel, Arrow-batched; the iterator shape means constant
    memory per task regardless of partition size.

    ``decoder``: injectable ``payload -> (byte_len, header_byte, width,
    height, n_frames)`` callable (picklable). Defaults to the deterministic
    ``_decode_stub``; swapping in a real PIL/ffmpeg decoder requires no
    plumbing change (see resize_media docstring).
    """
    dec = decoder if decoder is not None else _decode_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [dec(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                decoded,
                columns=["byte_len", "header_byte", "fake_width", "fake_height", "n_frames"],
            )
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return media.mapInPandas(run, schema=DECODED_SCHEMA)
