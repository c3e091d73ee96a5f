"""Multimodal column convention + processing plumbing (SURVEY.md §8.4).

Contract for image/audio/video at 100 TB: media is an opaque ``binary``
column plus a typed metadata struct — the decode/feature/resample steps
are ``mapInPandas`` stages (Arrow batches, schema declared up front) so
they pipeline inside a scan stage without shuffles.  The actual pixel/
sample decoding is STUBBED in this environment (no PIL/ffmpeg in the
container — ``_HAS_PIL`` gates the real path): the stub is a
deterministic fake decoder over a self-describing header we also
generate, so schema, partitioning, UDF signatures and batch shapes are
all real and tested; swapping in a real codec touches ONLY the body of
``_decode_payload``.

Media header layout (fake codec "FMK1"): 4-byte magic | 2-byte width |
2-byte height | 1-byte channels | payload bytes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:
    import PIL  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MAGIC = b"FMK1"

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("channels", IntegerType()),
                    StructField("n_bytes", LongType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_intensity", FloatType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 16


def encode_fake_media(width: int, height: int, channels: int, seed: bytes) -> bytes:
    """Deterministic synthetic media blob with a parseable header."""
    n = width * height * channels
    payload = (seed * (n // max(len(seed), 1) + 1))[:n]
    return MAGIC + struct.pack(">HHB", width, height, channels) + payload


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media column from documents (test fixture).

    JVM-side synthesis: header via concat of binary literals + the text
    bytes as payload — no Python involved in generating the column.
    """
    w = (F.col("doc_id") % 8 + 4).cast("int")
    h = (F.col("doc_id") % 5 + 4).cast("int")
    header = F.concat(
        F.lit(MAGIC),
        F.expr(
            "concat(unhex(lpad(hex((doc_id % 8 + 4)), 4, '0')), "
            "unhex(lpad(hex((doc_id % 5 + 4)), 4, '0')), unhex('01'))"
        ),
    )
    content = F.concat(header, F.encode("text", "utf-8"))
    return docs.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        content.alias("content"),
        F.struct(
            w.alias("width"),
            h.alias("height"),
            F.lit(1).alias("channels"),
            F.length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_payload(content: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse the codec header + payload.  THE swap point for real
    decoders: FMK1 blobs always use the deterministic fake codec; any
    other container routes to PIL when it is installed (round 6 — the
    real branch is live, schema-stable, and skip-tested), and raises a
    clear gate error otherwise."""
    if not content.startswith(MAGIC):
        if _HAS_PIL:
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(content))
            arr = np.asarray(img)
            if arr.ndim == 2:  # grayscale -> (h, w, 1), one layout downstream
                arr = arr[:, :, None]
            h, w, c = arr.shape
            return w, h, c, arr.astype(np.uint8, copy=False)
        raise NotImplementedError(
            "real-codec decode needs PIL, absent in this environment"
        )
    w, h, c = struct.unpack(">HHB", content[4:9])
    n = w * h * c
    payload = np.frombuffer(content[9 : 9 + n], dtype=np.uint8)
    if len(payload) < n:  # pad deterministically (fake codec tolerance)
        payload = np.pad(payload, (0, n - len(payload)))
    return w, h, c, payload.reshape(h, w, c)


def decode_media(media: DataFrame) -> DataFrame:
    """mapInPandas decode stage: binary -> per-item stats + features.

    Arrow-batched; one output row per input row; no shuffle — this
    pipelines into the scan stage at any corpus size.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "width", "height", "channels", "mean_intensity", "features")}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                w, h, c, arr = _decode_payload(bytes(content))
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["mean_intensity"].append(float(arr.mean()))
                # deterministic pooled features: FEATURE_DIM histogram bins
                hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
                out["features"].append((hist / max(arr.size, 1)).astype("float32"))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, DECODED_SCHEMA)


def resize_media(media: DataFrame, new_w: int, new_h: int) -> DataFrame:
    """mapInPandas resize: nearest-neighbor on the fake codec (the real
    path would be PIL/ffmpeg); re-emits a valid blob with updated meta."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, mt, content, meta in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"], pdf["meta"]
            ):
                w, h, c, arr = _decode_payload(bytes(content))
                ys = (np.arange(new_h) * h // new_h).clip(0, h - 1)
                xs = (np.arange(new_w) * w // new_w).clip(0, w - 1)
                resized = arr[np.ix_(ys, xs)].astype(np.uint8)
                blob = MAGIC + struct.pack(">HHB", new_w, new_h, c) + resized.tobytes()
                rows.append(
                    (doc_id, mt, blob, {"width": new_w, "height": new_h, "channels": c, "n_bytes": len(blob)})
                )
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "content", "meta"])

    return media.mapInPandas(batches, MEDIA_SCHEMA)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Treat the payload as a "video" (stack of rows): emit ``n_frames``
    evenly-spaced single-row frames per item — one-to-many mapInPandas."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                w, h, c, arr = _decode_payload(bytes(content))
                idx = (np.arange(n_frames) * h // n_frames).clip(0, h - 1)
                for fn, y in enumerate(idx):
                    frame = MAGIC + struct.pack(">HHB", w, 1, c) + arr[y].tobytes()
                    rows.append((doc_id, fn, frame))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame"])

    return media.mapInPandas(batches, schema)
