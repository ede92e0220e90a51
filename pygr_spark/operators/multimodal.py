"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched mapInPandas (north star).

The Spark-side plumbing — schema, partitioning, UDF signature, batch
shapes — is real and tested; the decode kernels are deterministic
fakes behind ``FAKE_DECODERS`` because codec libraries are not in this
container. Swapping a fake for a real decoder (PIL/librosa/av) changes
ONE dict entry and nothing else: the contract is
bytes → dict of features per row, applied per Arrow batch.

Scale notes: binary payloads ride the normal shuffle paths; keep
``spark.sql.files.maxPartitionBytes`` sized so a partition of blobs
fits executor memory, and push metadata-only filters BEFORE the
decode stage (Catalyst prunes the binary column entirely for
metadata-only queries — binary columns are only deserialized in the
mapInPandas stage that uses them).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_image_decode(payload: bytes) -> dict:
    """Deterministic stand-in for image decode + feature extraction.
    Real impl: PIL.Image.open → resize → channel means. STUBBED: the
    container has no codec libs; geometry derives from a stable hash."""
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] % 64,
        "height": 64 + h[1] % 64,
        "duration_ms": None,
        "feature": [b / 255.0 for b in h[:8]],
    }


def _fake_audio_decode(payload: bytes) -> dict:
    h = hashlib.sha256(payload).digest()
    return {
        "width": None,
        "height": None,
        "duration_ms": 1000 + int.from_bytes(h[2:4], "big"),
        "feature": [b / 255.0 for b in h[8:16]],
    }


def _fake_video_decode(payload: bytes) -> dict:
    h = hashlib.sha256(payload).digest()
    return {
        "width": 160 + h[4] % 96,
        "height": 90 + h[5] % 54,
        "duration_ms": 5000 + int.from_bytes(h[6:8], "big"),
        "feature": [b / 255.0 for b in h[16:24]],
    }


FAKE_DECODERS: dict[str, Callable[[bytes], dict]] = {
    "image": _fake_image_decode,
    "audio": _fake_audio_decode,
    "video": _fake_video_decode,
}


def extract_features(
    media: DataFrame,
    decoders: dict[str, Callable[[bytes], dict]] | None = None,
) -> DataFrame:
    """Decode/feature-extract via mapInPandas: one Python worker per
    partition, Arrow batches in/out, no driver involvement."""
    import sys

    from pygr_spark.sources import ship_to_workers

    # the decoder dict holds module-level functions: serialize this
    # module by value so executors need no pygr_spark import path
    ship_to_workers(sys.modules[__name__])
    decoders = decoders or FAKE_DECODERS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                dec = decoders.get(r["kind"])
                if dec is None:
                    raise NotImplementedError(f"no decoder for kind={r['kind']!r}")
                feats = dec(payload)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "width": feats["width"],
                        "height": feats["height"],
                        "duration_ms": feats["duration_ms"],
                        "feature": feats["feature"],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def _fake_image_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for re-encode-at-size. Real impl:
    PIL.Image.open(payload).resize((w, h)) → bytes. STUBBED: returns a
    stable transform of the payload tagged with the geometry so tests
    can assert the pipeline ran per-row."""
    head = f"resized:{width}x{height}:".encode()
    return head + hashlib.sha256(payload).digest()


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    kernel: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Binary→binary transform stage (resize): same MEDIA_SCHEMA out,
    payload re-encoded at (width, height), meta annotated. Non-image
    rows pass through untouched — the transform composes with decode /
    feature stages on a mixed-modality table. Arrow-batched; payloads
    never visit the driver."""
    import sys

    from pygr_spark.sources import ship_to_workers

    ship_to_workers(sys.modules[__name__])
    kernel = kernel or _fake_image_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            mask = out["kind"] == "image"
            out.loc[mask, "payload"] = out.loc[mask, "payload"].map(
                lambda p: kernel(bytes(p) if p is not None else b"", width, height)
            )
            out.loc[mask, "meta"] = out.loc[mask, "meta"].map(
                lambda m: {**(m or {}), "resized": f"{width}x{height}"}
            )
            yield out

    return media.mapInPandas(run, MEDIA_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    timestamp (decode stubbed). Explodes timestamps JVM-side so the
    expensive Python stage only sees (media_id, frame_ts) work items."""
    feats = extract_features(media.filter(F.col("kind") == "video"))
    n_frames = F.floor(F.col("duration_ms") / every_ms).cast("int")
    idx = F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return feats.select(
        "media_id", F.explode(idx).alias("frame_no")
    ).withColumn("frame_ts_ms", F.col("frame_no").cast("long") * every_ms)
