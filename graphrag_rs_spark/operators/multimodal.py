"""Multimodal column plumbing: binary payloads with typed metadata.

Image/audio/video ride as opaque `binary` columns next to a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched `mapInPandas` UDFs so payload bytes move over Arrow once
per batch, never per row.

The decode kernels themselves are STUBBED in this environment (no
image/audio libraries in the container): `decode_image` raises
NotImplementedError unless `fake=True`, which substitutes a
deterministic byte-derived feature vector so the Spark-side plumbing —
schema, batching, partition sizing — is fully real and testable.

Scale notes: binary payloads dominate partition size — size partitions
by bytes (`payload_partitions`), not rows, before any UDF; metadata-only
transforms must project the binary column away first (column pruning
keeps the payload out of the scan entirely).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("media_id string, kind string, payload binary, "
                "width int, height int, duration_ms int, mime string")

FEATURE_SCHEMA = "media_id string, kind string, n_bytes long, feature array<float>"


def payload_partitions(media: DataFrame, target_mb: int = 64,
                       size_col: str | None = None) -> DataFrame:
    """Repartition so each partition holds ~target_mb of payload bytes.

    Uses exact payload lengths (cheap: length() is metadata-free but
    JVM-side); the repartition key is a hash bucket so heavy rows spread.
    """
    sized = media.withColumn(
        "_bytes",
        F.length(F.col(size_col) if size_col else F.col("payload")))
    total = sized.agg(F.sum("_bytes")).collect()[0][0] or 0
    n_parts = max(1, int(total / (target_mb * 1024 * 1024)) + 1)
    return sized.repartition(n_parts).drop("_bytes")


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload → HxWxC uint8 array.

    STUB: real decode needs an image library absent from this container.
    `fake=True` returns a deterministic 4x4x3 array derived from the
    payload bytes (stable across runs/machines) for plumbing tests.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in "
            "this environment; pass fake=True for plumbing tests")
    seed = np.frombuffer(payload[:48].ljust(48, b"\0"), dtype=np.uint8)
    return np.tile(seed, (1 + 47 // len(seed)))[:48].reshape(4, 4, 3)


def extract_features(
    media: DataFrame,
    dim: int = 16,
    fake: bool = True,
) -> DataFrame:
    """media → (media_id, kind, n_bytes, feature: array<float>).

    The feature kernel is a per-batch numpy pass over the Arrow buffer:
    byte-histogram folded to `dim` buckets, L2-normalized — a stand-in
    with the exact shape/cost profile of a real embedding UDF.
    """

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, sizes, feats = [], [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                buf = np.frombuffer(payload or b"", dtype=np.uint8)
                hist = np.bincount(buf % dim, minlength=dim).astype("float64") \
                    if buf.size else np.zeros(dim)
                norm = np.linalg.norm(hist)
                feats.append((hist / norm if norm else hist)
                             .astype("float32").tolist())
                ids.append(mid)
                kinds.append(kind)
                sizes.append(int(buf.size))
            if ids:
                yield pd.DataFrame({"media_id": ids, "kind": kinds,
                                    "n_bytes": sizes, "feature": feats})

    src = media.select("media_id", "kind", "payload")
    return src.mapInPandas(feature_batches, schema=FEATURE_SCHEMA)


def resize_array(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an HxWxC array — pure numpy index
    sampling (pixel center mapping), no imaging library needed; only the
    DECODE step is environment-stubbed, the resize math is real."""
    h, w = img.shape[0], img.shape[1]
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(int),
                      h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(int),
                      w - 1)
    return img[rows][:, cols]


RESIZED_SCHEMA = ("media_id string, height int, width int, "
                  "payload binary")


def resize_images(media: DataFrame, out_h: int = 2, out_w: int = 2,
                  fake: bool = True) -> DataFrame:
    """image rows → (media_id, height, width, payload): decoded, resized
    (real nearest-neighbor math), re-emitted as raw HxWxC bytes.

    Arrow-batched `mapInPandas`, same batch shape as extract_features;
    decode rides the environment stub (`decode_image`), so with
    fake=False this raises until a real codec library is present —
    the task-sanctioned posture for this container.
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ws, payloads = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(bytes(payload or b""), fake=fake)
                out = resize_array(img, out_h, out_w)
                ids.append(mid)
                hs.append(int(out.shape[0]))
                ws.append(int(out.shape[1]))
                payloads.append(bytearray(out.astype(np.uint8).tobytes()))
            if ids:
                yield pd.DataFrame({"media_id": ids, "height": hs,
                                    "width": ws, "payload": payloads})

    src = media.filter(F.col("kind") == "image").select(
        "media_id", "payload")
    return src.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_idx, ts_ms) rows.

    Pure column math from duration metadata — the decode of each planned
    frame happens in extract_features-style UDFs downstream.  Planning
    stays JVM-side so a 10⁹-video catalog never touches Python here.
    """
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1,
                           F.lit(0)),
            )
        ).alias("frame_idx", "_step"),
    ).select(
        "media_id", "frame_idx",
        (F.col("frame_idx") * every_ms).alias("ts_ms"),
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary from a hash chain)."""
    rows = []
    state = seed.to_bytes(8, "little")
    import hashlib
    kinds = ("image", "audio", "video")
    for i in range(n):
        state = hashlib.sha256(state).digest()
        payload = (state * (1 + i % 7))[: 32 + (i * 37) % 256]
        kind = kinds[i % 3]
        rows.append((f"m{i:05d}", kind, bytearray(payload),
                     64 + i % 512, 64 + (i * 3) % 512,
                     (1 + i % 30) * 1000, f"{kind}/x-fake"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
