"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed in Arrow-batched pandas stages.

This container ships no image/audio libraries, so the DECODE step is a
clearly-marked stub (deterministic fake features or
NotImplementedError); everything Spark-side — schemas, batch shapes,
partition sizing, UDF signatures — is real and tested. On a cluster,
swap ``_decode_image_stub`` for PIL/libvips inside the same
``mapInPandas`` stage and nothing else changes.

Scale notes: blob stages size partitions by BYTES not rows
(``repartition_for_blobs``) so a 256 KB-avg-blob dataset doesn't hand
an executor a 4 GB Arrow batch; ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds the per-batch footprint.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, declared_mime string, n_bytes long"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, sniffed_format string, "
    "width int, height int, channels int, mean_luma double, decode_ok boolean"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_index int, frame_ts_ms long, frame binary"

def attach_media_metadata(df: DataFrame, blob_col: str = "payload") -> DataFrame:
    """JVM-side metadata: byte size + magic-byte format sniff — no
    Python, no decode; enough for routing/filtering before the
    expensive decode stage."""
    b = F.col(blob_col)
    sniff = F.when(F.substring(b, 1, 3) == F.lit(b"\xff\xd8\xff"), "jpeg")
    sniff = sniff.when(F.substring(b, 1, 4) == F.lit(b"\x89PNG"), "png")
    sniff = sniff.when(F.substring(b, 1, 4) == F.lit(b"GIF8"), "gif")
    sniff = sniff.when(F.substring(b, 1, 4) == F.lit(b"RIFF"), "riff")
    return df.withColumns(
        {"n_bytes": F.octet_length(b).cast("long"), "sniffed_format": sniff.otherwise("unknown")}
    )


def repartition_for_blobs(df: DataFrame, target_partition_mb: int = 256,
                          size_col: str = "n_bytes") -> DataFrame:
    """Partition a blob table by total BYTES per task: at 100 TB the unit
    of decode work must be byte-bounded, not row-bounded."""
    total = df.agg(F.sum(size_col)).first()[0] or 0
    n = max(1, int(total / (target_partition_mb * 1024 * 1024)) + 1)
    return df.repartition(n)


def _decode_image_stub(payload: bytes) -> tuple[int, int, int, float, bool]:
    """STUB — deterministic fake decode (no imaging libs in container).

    Real deployment: pass ``decoder="pil"`` to
    :func:`extract_image_features` (Pillow path below, import-gated);
    signature and batch shape are identical.
    """
    if len(payload) < 8:
        return (0, 0, 0, 0.0, False)
    h = int.from_bytes(payload[:8], "little")
    width = 64 + h % 1920
    height = 64 + (h >> 11) % 1080
    channels = 3
    mean_luma = float((h >> 22) % 256)
    return (width, height, channels, mean_luma, True)


try:  # real decode path, exercised when the deployment ships Pillow
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:  # sandbox container: stub only
    _PILImage = None
    HAVE_PIL = False


def _decode_image_pil(payload: bytes) -> tuple[int, int, int, float, bool]:
    """REAL decode via Pillow — same signature/contract as the stub
    (width, height, channels, mean_luma, decode_ok); any undecodable
    blob becomes a decode_ok=False row, never a task failure (one
    corrupt WARC image must not kill a 100 TB stage)."""
    from io import BytesIO

    try:
        with _PILImage.open(BytesIO(payload)) as im:
            im.load()
            channels = len(im.getbands())
            luma = np.asarray(im.convert("L"), dtype=np.float64).mean()
            return (im.width, im.height, channels, float(luma), True)
    except Exception:
        return (0, 0, 0, 0.0, False)


def extract_image_features(media: DataFrame, blob_col: str = "payload",
                           id_col: str = "media_id",
                           decoder: str = "stub") -> DataFrame:
    """mapInPandas decode/feature stage: Arrow batches in, narrow typed
    features out — the blob never survives past this stage.

    ``decoder``: "stub" (default — deterministic fake, always
    available) or "pil" (real Pillow decode; raises at plan time if
    Pillow is absent so the failure is loud on the driver, not inside
    1000 executors)."""
    if decoder == "pil":
        if not HAVE_PIL:
            raise ImportError("decoder='pil' requires Pillow on driver and executors")
        decode = _decode_image_pil
    elif decoder == "stub":
        decode = _decode_image_stub
    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads become decode_ok=false rows, never a crash
            feats = [
                decode(bytes(p)) if p is not None else (0, 0, 0, 0.0, False)
                for p in pdf[blob_col]
            ]
            w, h, c, luma, ok = (list(t) for t in zip(*feats)) if feats else ([], [], [], [], [])
            fmt = pdf["sniffed_format"] if "sniffed_format" in pdf else pd.Series(["unknown"] * len(pdf))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[blob_col].map(lambda p: len(p) if p is not None else 0).astype("int64"),
                    "sniffed_format": fmt,
                    "width": pd.Series(w, dtype="int32"),
                    "height": pd.Series(h, dtype="int32"),
                    "channels": pd.Series(c, dtype="int32"),
                    "mean_luma": pd.Series(luma, dtype="float64"),
                    "decode_ok": pd.Series(ok, dtype="bool"),
                }
            )

    cols = [id_col, blob_col] + (["sniffed_format"] if "sniffed_format" in media.columns else [])
    return media.select(*cols).mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 8,
                        blob_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """Frame-sampling plumbing: 1 blob row → ≤ max_frames frame rows.
    STUB decode — frames are deterministic byte slices standing in for
    ffmpeg output; schema/fan-out/batching are the real contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_ix, out_ts, out_fr = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(payload)
                n = min(max_frames, max(1, len(b) // 1024))
                for i in range(n):
                    out_id.append(int(mid))
                    out_ix.append(i)
                    out_ts.append(i * every_ms)
                    out_fr.append(b[i * 64 : i * 64 + 64])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_id, dtype="int64"),
                    "frame_index": pd.Series(out_ix, dtype="int32"),
                    "frame_ts_ms": pd.Series(out_ts, dtype="int64"),
                    "frame": out_fr,
                }
            )

    return media.select(id_col, blob_col).mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def embed_media_stub(features: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fake embedding from decoded features (stands in for
    a vision encoder); output shape array<float> matches the similarity
    operators so ANN composes with media."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seeds = pdf["media_id"].to_numpy(dtype=np.uint64)
            x = seeds[:, None] * np.uint64(0x9E3779B97F4A7C15) + np.arange(dim, dtype=np.uint64)[None, :]
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            v = (x >> np.uint64(11)).astype(np.float64) / float(2**53) - 0.5
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].astype("int64"), "embedding": list(v.astype(np.float32))}
            )

    return features.select("media_id").mapInPandas(run, schema="media_id long, embedding array<float>")


RESIZED_SCHEMA = (
    "media_id long, out_width int, out_height int, scale_x1e4 long, "
    "resized binary, resize_ok boolean"
)


def resize_images(media: DataFrame, target_w: int = 224, target_h: int = 224,
                  blob_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """Resize stage (the train-time preprocessing op): blob in, fixed
    target-size blob out, aspect-preserving scale recorded exactly
    (×1e4 integer). STUB pixel math — the output blob is a
    deterministic function of (input bytes, target) standing in for the
    interpolated pixels; real deployment swaps the body for
    PIL.Image.resize / cv2.resize inside the SAME mapInPandas contract
    (one Arrow hop, blob-bounded batches via repartition_for_blobs,
    output size target_w*target_h*3 exactly like a real RGB buffer —
    so memory behavior and batch shape are production-true even with
    the stub).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_len = target_w * target_h * 3
        for pdf in batches:
            ids, ws, hs, scales, blobs, oks = [], [], [], [], [], []
            for mid, p in zip(pdf[id_col], pdf[blob_col]):
                ids.append(int(mid))
                if p is None or len(p) < 8:
                    ws.append(0); hs.append(0); scales.append(0)
                    blobs.append(b""); oks.append(False)
                    continue
                w0, h0, _, _, ok = _decode_image_stub(bytes(p))
                scale = min(target_w / max(w0, 1), target_h / max(h0, 1))
                # deterministic fake pixel buffer: tile the source bytes
                # to exactly the target RGB size (real resize writes the
                # same-shape buffer from interpolated pixels)
                src = bytes(p)
                reps = out_len // len(src) + 1
                blobs.append((src * reps)[:out_len])
                ws.append(target_w); hs.append(target_h)
                scales.append(round(scale * 10000)); oks.append(bool(ok))
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "out_width": pd.Series(ws, dtype="int32"),
                "out_height": pd.Series(hs, dtype="int32"),
                "scale_x1e4": pd.Series(scales, dtype="int64"),
                "resized": pd.Series(blobs, dtype="object"),
                "resize_ok": pd.Series(oks, dtype="bool"),
            })

    return media.select(id_col, blob_col).mapInPandas(run, schema=RESIZED_SCHEMA)
