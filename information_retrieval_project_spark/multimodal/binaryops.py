"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side contract is real and tested — schema, Arrow batch shape,
partition-size control — while the actual media decode is stubbed (the
sandbox has no image/audio libraries): decode_image_stub raises
NotImplementedError unless `fake=True`, in which case it produces a
deterministic fake decode derived from the bytes (so downstream plumbing is
testable end-to-end).

Design rules for 100 TB of media:
- binary payloads stay in their own column; metadata is typed struct columns
  so filters/pruning never touch the payload bytes;
- all per-row work happens in mapInPandas with a bounded
  spark.sql.execution.arrow.maxRecordsPerBatch so a batch of large blobs
  cannot OOM an executor;
- feature outputs are fixed-length array<float> columns ready for the
  similarity module's ANN operators.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, n_bytes long"
)


def with_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata columns computed natively from the binary payload."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col))).withColumn(
        "payload_sha", F.sha2(F.col(payload_col), 256)
    )


def decode_image_stub(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to HxWx3 uint8. STUB: no codec libs in this
    container. With fake=True returns a deterministic 8x8x3 array derived
    from the payload hash (stable plumbing fixture)."""
    if not fake:
        raise NotImplementedError(
            "image decode requires a codec library (PIL/opencv) not present "
            "in this environment; pass fake=True for the deterministic stub"
        )
    h = hashlib.sha256(payload).digest()
    arr = np.frombuffer((h * 6)[: 8 * 8 * 3], dtype=np.uint8)
    return arr.reshape(8, 8, 3).copy()


def frame_sample_stub(payload: bytes, every_n: int = 10, fake: bool = False) -> list[np.ndarray]:
    """Sample frames from a video payload. STUB (same policy as decode)."""
    if not fake:
        raise NotImplementedError("video frame sampling requires ffmpeg bindings")
    n_frames = max(1, len(payload) // (1024 * every_n))
    return [decode_image_stub(payload + bytes([i % 256]), fake=True) for i in range(min(n_frames, 4))]


FRAME_SCHEMA = "media_id long, frame_no int, height int, width int, frame_sha string"


def sample_frames(
    media: DataFrame, every_n: int = 10, fake: bool = True
) -> DataFrame:
    """video payload → one row per sampled frame with typed metadata + frame
    digest. Real contract = the mapInPandas fan-out shape (one input row →
    many output rows, bounded by the Arrow batch size); decode is the stub."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, hs, ws, shas = [], [], [], [], []
            for media_id, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                frames = frame_sample_stub(bytes(payload), every_n=every_n, fake=fake)
                for i, fr in enumerate(frames):
                    ids.append(media_id)
                    nos.append(i)
                    hs.append(fr.shape[0])
                    ws.append(fr.shape[1])
                    shas.append(hashlib.sha256(fr.tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_no": nos,
                    "height": hs,
                    "width": ws,
                    "frame_sha": shas,
                }
            )

    return media.select("media_id", "payload").mapInPandas(gen, FRAME_SCHEMA)


def resize_stub(
    img: np.ndarray, height: int, width: int, fake: bool = False
) -> np.ndarray:
    """Resize a decoded image. STUB (same policy as decode): the real path
    needs an interpolation library; the fake path is a deterministic
    stride-based nearest-neighbor downsample so the Spark-side plumbing —
    shapes, batching, output schema — is fully testable."""
    if not fake:
        raise NotImplementedError(
            "image resize requires an interpolation library (PIL/opencv) "
            "not present in this sandbox"
        )
    h, w = img.shape[0], img.shape[1]
    ys = np.linspace(0, h - 1, height).astype(np.int64)
    xs = np.linspace(0, w - 1, width).astype(np.int64)
    return img[ys][:, xs]


RESIZED_SCHEMA = (
    "media_id long, height int, width int, resized_sha string"
)


def resize_images(
    media: DataFrame, height: int = 8, width: int = 8, fake: bool = True
) -> DataFrame:
    """media(media_id, payload) → typed metadata of the resized image
    (decode → resize in one Arrow pass; payload bytes never leave the
    executor). A real pipeline would also emit the resized bytes — the stub
    emits their sha256 so determinism is assertable."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ws, shas = [], [], [], []
            for media_id, payload in zip(
                pdf["media_id"].values, pdf["payload"].values
            ):
                img = decode_image_stub(bytes(payload), fake=fake)
                out = resize_stub(img, height, width, fake=fake)
                ids.append(media_id)
                hs.append(out.shape[0])
                ws.append(out.shape[1])
                shas.append(hashlib.sha256(out.tobytes()).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "height": hs, "width": ws, "resized_sha": shas}
            )

    return media.select("media_id", "payload").mapInPandas(gen, RESIZED_SCHEMA)


FEATURE_SCHEMA = "media_id long, feature array<float>"


def extract_features(
    media: DataFrame, dim: int = 16, fake: bool = True
) -> DataFrame:
    """media(media_id, payload) → (media_id, feature: array<float>[dim]).

    The Arrow plumbing (batch iteration, fixed-length float output) is the
    real contract; the 'model' is the deterministic stub. Swapping in a real
    encoder changes only the body of `featurize`."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for media_id, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                img = decode_image_stub(bytes(payload), fake=fake)
                flat = img.reshape(-1).astype(np.float32)
                # deterministic pooled "embedding": block means, L2-normed
                blocks = np.array_split(flat, dim)
                v = np.array([b.mean() for b in blocks], dtype=np.float32)
                nrm = float(np.linalg.norm(v))
                ids.append(media_id)
                feats.append((v / nrm if nrm > 0 else v).tolist())
            yield pd.DataFrame({"media_id": ids, "feature": feats})

    return media.select("media_id", "payload").mapInPandas(featurize, FEATURE_SCHEMA)
