"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a metadata
struct alongside.  The Spark-side plumbing (schema, partition-friendly
mapInPandas batching, Arrow transfer) is real and tested; the actual codec
calls are stubbed because decode libraries (PIL/ffmpeg/librosa) are not in
this container:

* ``extract_binary_meta`` — pure SQL metadata (byte length, sha256, magic
  prefix), the always-available fast path;
* ``decode_features_stub`` — the mapInPandas batch pipeline with a
  deterministic fake feature extractor; swap ``_decode_batch`` for a real
  codec (it raises NotImplementedError when ``real=True``).

Partitioning note: binary payloads make rows heavy — the caller should
repartition by size (``spark.sql.files.maxPartitionBytes``) so a batch of
images fits executor memory; mapInPandas streams one Arrow batch at a time,
so peak memory is batch-bounded, not partition-bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes int, checksum string, fake_width int, "
    "fake_height int, n_frames int"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal table: payload = utf-8 bytes of ``text_col``
    (stands in for image bytes), plus typed metadata columns."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_binary_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """SQL-only metadata over an opaque binary column."""
    p = F.col(payload_col)
    return df.select(
        "doc_id",
        F.octet_length(p).alias("n_bytes"),
        F.sha2(p, 256).alias("sha256"),
        F.hex(F.substring(p, 1, 4)).alias("magic"),
    )


def decode_features_stub(df: DataFrame, real: bool = False) -> DataFrame:
    """mapInPandas decode pipeline: Arrow-batched, schema-stable.

    The whole batch function is a local closure: cloudpickle serializes
    module-level functions by reference, and Python workers are separate
    processes that can't import this package unless cwd is the repo root —
    a closure is pickled by value and runs anywhere.  real=True is where
    PIL/ffmpeg would go.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # noqa: PLC0415 - worker-side import

        import pandas as pd  # noqa: PLC0415 - worker-side import

        for pdf in batches:
            if real:
                raise NotImplementedError(
                    "image/audio decode libraries are not available in this "
                    "environment; wire PIL/ffmpeg here"
                )
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    # deterministic fake features derived only from the
                    # bytes — each chosen to ALSO be SQL-expressible so the
                    # whole mapInPandas pipeline is oracle-hash-checked,
                    # not rows-only (the checksum is md5 of the payload
                    # bytes, which DuckDB's md5(text) reproduces)
                    "checksum": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()[:8]
                    ),
                    "fake_width": (n_bytes % 640).astype("int32"),
                    "fake_height": (n_bytes % 480).astype("int32"),
                    "n_frames": ((n_bytes // 1000) + 1).astype("int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, DECODE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, payload binary, width int, height int"


def resize_stub(
    df: DataFrame, width: int, height: int, real: bool = False
) -> DataFrame:
    """Image-resize pipeline shape: one output row per input row, payload
    transformed in-place inside the Arrow batch.  The fake 'resize'
    truncates/cycles the byte stream to width*height bytes — deterministic
    and size-exact, so the downstream schema/partitioning contract (output
    rows are fixed-size) is the real one.  real=True is the PIL slot.
    """
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # noqa: PLC0415 - worker-side import

        def fake_resize(b: bytes) -> bytes:
            if real:
                raise NotImplementedError("wire PIL.Image.resize here")
            reps = -(-target // max(len(b), 1))
            return (bytes(b) * reps)[:target]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(fake_resize),
                    "width": width,
                    "height": height,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary, pts_ms int"


def frame_sample_stub(
    df: DataFrame, every_n_bytes: int = 256, max_frames: int = 8,
    real: bool = False,
) -> DataFrame:
    """Video frame-sampling pipeline shape: FAN-OUT — each input row
    yields up to ``max_frames`` output rows (one per sampled frame), the
    batch-shape property that distinguishes frame extraction from
    row-wise decode.  The fake 'frame' is a fixed-width byte slice at
    deterministic offsets standing in for an ffmpeg keyframe grab;
    pts_ms is the fake presentation timestamp.  real=True is the ffmpeg
    slot.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # noqa: PLC0415 - worker-side import

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame": [], "pts_ms": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if real:
                    raise NotImplementedError("wire ffmpeg frame grab here")
                b = bytes(payload)
                n = min(max(len(b) // every_n_bytes, 1), max_frames)
                for i in range(n):
                    off = i * every_n_bytes
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(b[off:off + 16])
                    out["pts_ms"].append(i * 40)  # fake 25fps cadence
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)
