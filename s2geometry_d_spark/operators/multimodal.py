"""Multimodal column operators: decode / verify / feature-extract images.

Images are opaque ``binary`` columns with typed metadata (w, h, fmt).
Everything runs through ``mapInPandas`` with bounded Arrow batches — the
plumbing (schema, batch shape, partition sizing) is the real engine path.
The codec itself is the stub pair from sources/images.py; a real decoder
(PIL/libjpeg) slots into ``_decode`` behind the import guard.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # real codec path (not present in this container)
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

from ..sources.images import H, W, fake_pixels


def _decode(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if data[:4] == b"FAKE":
        return np.frombuffer(data[8:], dtype=np.uint8).reshape(h, w, 3)
    if HAVE_PIL:
        raise NotImplementedError("real codec path: Image.open(BytesIO(data))")
    raise NotImplementedError(f"no decoder available for format {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return math.inf
    return 10.0 * math.log10(255.0 * 255.0 / mse)


VERIFY_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("psnr_db", T.DoubleType(), False),
        T.StructField("psnr_ok", T.BooleanType(), False),
        T.StructField("caption_ok", T.BooleanType(), False),
    ]
)


def verify_images(images: DataFrame, min_psnr_db: float = 40.0) -> DataFrame:
    """Per-row payload invariant (BASELINE.json input_hint): decoded pixels
    PSNR >= 40 dB against the reference render + caption equality."""

    def run(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                i = int(row.image_id[3:])
                ref = fake_pixels(i)
                dec = _decode(bytes(row["bytes"]), row.fmt, row.w, row.h)
                p = psnr(ref, dec)
                expected_caption = row.caption.startswith(f"synthetic image {i} at ")
                out.append(
                    (
                        row.image_id,
                        row.fmt,
                        999.0 if math.isinf(p) else round(p, 3),
                        p >= min_psnr_db,
                        bool(expected_caption),
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in VERIFY_SCHEMA.fields])

    return images.mapInPandas(run, VERIFY_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
        T.StructField("brightness", T.DoubleType(), False),
    ]
)


def image_features(images: DataFrame) -> DataFrame:
    """Cheap feature extraction over the binary column (mean channels)."""

    def run(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                dec = _decode(bytes(row["bytes"]), row.fmt, row.w, row.h).astype(np.float64)
                means = dec.mean(axis=(0, 1))
                out.append(
                    (
                        row.image_id,
                        round(float(means[0]), 4),
                        round(float(means[1]), 4),
                        round(float(means[2]), 4),
                        round(float(means.mean()), 4),
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return images.mapInPandas(run, FEATURE_SCHEMA)
