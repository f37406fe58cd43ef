"""Multimodal column plumbing: image/audio/video as opaque binary
columns + typed metadata, with decode/feature-extract/resize/
frame-sample as Arrow-batched mapInPandas operators.

The Spark-side contract (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; the actual media decode is STUBBED — this
container ships no image/audio codecs — behind ``_decode_stub``, a
deterministic fake that derives "pixels"/"samples" from the payload
bytes. Swapping in PIL/librosa/pyav changes one function, not the
plan shape.

Scale notes: binary payloads ride the same parquet row groups as
their metadata; operators are pure mapInPandas (no shuffle), so media
transforms scale linearly with input bytes. Keep
``spark.sql.files.maxPartitionBytes`` at/below 128 MB so a partition
of large blobs still fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output schema of decode_features: stable contract for downstream ops.
MEDIA_FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "width int, height int, feature array<float>"
)

FRAME_SAMPLE_SCHEMA = (
    "doc_id long, frame_idx int, frame_offset long, frame_bytes binary"
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build the multimodal table shape from the documents fixture:
    (id, payload binary, media_type, n_bytes). The payload is the
    UTF-8 encoding of the text — a deterministic stand-in for real
    media bytes with the same plumbing."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        (
            F.when(F.col(id_col) % 3 == 0, "image")
            .when(F.col(id_col) % 3 == 1, "audio")
            .otherwise("video")
        ).alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def _decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic fake decoder: payload bytes → fixed-length float
    'feature'. The real image path is ``_decode_image_pil`` below
    (import-gated); audio/video codecs (librosa/pyav) remain stubbed.

    Raises NotImplementedError for unknown media types — the marked
    stub boundary.
    """
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for media_type={media_type}")
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    if arr.size == 0:
        return np.zeros(8, dtype=np.float32)
    # 8 deterministic moments of the byte stream as the "feature"
    chunks = np.array_split(arr, 8)
    return np.asarray([float(c.mean()) if c.size else 0.0 for c in chunks], np.float32)


def _decode_image_pil(payload: bytes):
    """REAL image decode (Pillow): payload → (width, height, feature),
    feature = 8 chunk-means of the decoded pixel stream — same length
    contract as the stub, but over actual pixels, not container bytes.
    Caller handles ImportError (no Pillow in this container) and
    per-row decode failures (non-image bytes)."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        width, height = im.size
        px = np.asarray(im.convert("L"), dtype=np.float32).ravel()
    if px.size == 0:
        return width, height, np.zeros(8, dtype=np.float32)
    chunks = np.array_split(px, 8)
    feature = np.asarray(
        [float(c.mean()) if c.size else 0.0 for c in chunks], np.float32
    )
    return width, height, feature


def decode_features(df: DataFrame, decoder: str = "stub") -> DataFrame:
    """mapInPandas media decode + feature extraction.

    Input: (doc_id, payload, media_type, n_bytes); output:
    MEDIA_FEATURE_SCHEMA. Arrow-batched; one Python worker pass per
    partition, no shuffle.

    ``decoder``:
    - ``"stub"`` (default) — deterministic byte-stream fake for every
      media type; no optional deps (the gate queries use this).
    - ``"auto"`` — image rows decode through Pillow when it imports
      AND the payload parses as an image; anything else falls back to
      the stub per row. Same import-gate pattern as the faiss/torch
      tiers: plan shape identical with or without the dependency.
    - ``"pil"`` — force Pillow; ImportError where it's absent.
    """
    if decoder not in ("stub", "auto", "pil"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "pil":
        from PIL import Image  # noqa: F401 — import-try gate, driver-side

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil_ok = decoder in ("auto", "pil")
        if pil_ok:
            try:
                from PIL import Image  # noqa: F401
            except ImportError:
                if decoder == "pil":
                    raise
                pil_ok = False
        for pdf in batches:
            widths = (pdf["n_bytes"] % 640 + 1).astype("int32").to_numpy()
            heights = (pdf["n_bytes"] % 480 + 1).astype("int32").to_numpy()
            feats = []
            for i, (p, m) in enumerate(zip(pdf["payload"], pdf["media_type"])):
                if pil_ok and m == "image":
                    try:
                        w, h, feature = _decode_image_pil(p)
                        widths[i], heights[i] = w, h
                        feats.append(feature)
                        continue
                    except Exception:
                        if decoder == "pil":
                            raise
                feats.append(_decode_stub(p, m))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": widths,
                    "height": heights,
                    "feature": feats,
                }
            )

    return df.mapInPandas(op, MEDIA_FEATURE_SCHEMA)


def _extract_frames_pyav(
    payload: bytes, max_frames: int
) -> list[tuple[int, int, bytes]]:
    """REAL video frame extraction (PyAV): decode the container from
    bytes, pick ≤ max_frames evenly-spaced frames, emit each as raw
    grayscale pixels with its presentation timestamp as the offset —
    same (frame_idx, frame_offset, frame_bytes) contract as the stub,
    but over decoded frames, not byte windows. Caller handles
    ImportError (no PyAV in this container) and per-row decode
    failures (non-video bytes)."""
    import io

    import av

    with av.open(io.BytesIO(payload)) as container:
        decoded = [
            (int(f.pts or 0), f.to_ndarray(format="gray").tobytes())
            for f in container.decode(video=0)
        ]
    if not decoded:
        return []
    n_frames = min(max_frames, len(decoded))
    step = len(decoded) // n_frames
    return [
        (i, decoded[i * step][0], decoded[i * step][1])
        for i in range(n_frames)
    ]


def frame_sample(
    df: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 4,
    extractor: str = "stub",
) -> DataFrame:
    """mapInPandas frame sampler: emits ≤ max_frames evenly-spaced
    'frames' per video payload — the row-expanding (UDTF-like)
    multimodal shape.

    ``extractor`` (same gate policy as ``decode_features``):
    - ``"stub"`` (default) — deterministic byte windows at evenly
      spaced offsets; no optional deps. SQL-expressible, so the gate
      query is oracle-graded.
    - ``"auto"`` — rows whose payload parses as a video decode through
      PyAV when it imports; anything else falls back to the stub per
      row. Plan shape identical with or without the dependency.
    - ``"pyav"`` — force PyAV; ImportError where it's absent.
    """
    if extractor not in ("stub", "auto", "pyav"):
        raise ValueError(f"unknown extractor {extractor!r}")
    if extractor == "pyav":
        import av  # noqa: F401 — import-try gate, driver-side

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pyav_ok = extractor in ("auto", "pyav")
        if pyav_ok:
            try:
                import av  # noqa: F401
            except ImportError:
                if extractor == "pyav":
                    raise
                pyav_ok = False
        for pdf in batches:
            rows = []
            for did, payload, mtype in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "video":
                    continue
                if pyav_ok:
                    try:
                        decoded = _extract_frames_pyav(payload, max_frames)
                        # a parseable container with ZERO decodable
                        # video frames falls through to the stub —
                        # the row contract guarantees >= 1 frame per
                        # video payload in every tier
                        if decoded:
                            rows.extend(
                                (did, i, pts, fb) for i, pts, fb in decoded
                            )
                            continue
                    except Exception:
                        if extractor == "pyav":
                            raise
                n = len(payload)
                n_frames = min(max_frames, max(n // every_n_bytes, 1))
                for i in range(n_frames):
                    off = i * (n // n_frames) if n_frames else 0
                    rows.append((did, i, off, payload[off : off + every_n_bytes]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_offset", "frame_bytes"]
            )

    return df.mapInPandas(op, FRAME_SAMPLE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, media_type string, width int, height int, "
    "resized binary"
)


def resize_images(
    df: DataFrame, width: int = 32, height: int = 32, decoder: str = "stub"
) -> DataFrame:
    """mapInPandas image resize: image payloads → fixed (width, height)
    'thumbnails'. The STUB resamples the payload bytes to width×height
    by even-stride selection; ``decoder="auto"``/``"pil"`` runs a real
    Pillow decode→``Image.resize``→raw-bytes re-encode for payloads
    that parse as images (same gate policy as ``decode_features``).
    Non-image rows pass through untouched dimensions with a null
    thumbnail (filterable upstream, so the plan can prune decode work
    by media_type JVM-side before Python is ever invoked)."""
    if decoder not in ("stub", "auto", "pil"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "pil":
        from PIL import Image  # noqa: F401 — import-try gate, driver-side

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        pil_ok = decoder in ("auto", "pil")
        if pil_ok:
            try:
                from PIL import Image
            except ImportError:
                if decoder == "pil":
                    raise
                pil_ok = False
        for pdf in batches:
            out = []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                if mtype != "image":
                    out.append(None)
                    continue
                if pil_ok:
                    import io

                    try:
                        with Image.open(io.BytesIO(payload)) as im:
                            out.append(
                                im.convert("L").resize((width, height)).tobytes()
                            )
                        continue
                    except Exception:
                        if decoder == "pil":
                            raise
                # STUB: even-stride byte resample
                arr = np.frombuffer(payload, dtype=np.uint8)
                if arr.size == 0:
                    out.append(bytes(target))
                    continue
                idx = (np.arange(target) * arr.size) // target
                out.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": np.full(len(pdf), width, dtype="int32"),
                    "height": np.full(len(pdf), height, dtype="int32"),
                    "resized": out,
                }
            )

    return df.mapInPandas(op, RESIZE_SCHEMA)


def multimodal_metadata(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass over the binary column (no Python):
    sizes + content digest — the cheap pre-filter before any decode."""
    return df.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.md5(F.col("payload")).alias("payload_md5"),
    )
