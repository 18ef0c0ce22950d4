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

from ..sources.images import H, W, fake_pixels_batch


def _decode(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if data[:4] == b"FAKE":
        return np.frombuffer(data[8:], dtype=np.uint8).reshape(h, w, 3)
    if HAVE_PIL:
        raise NotImplementedError("real codec path: Image.open(BytesIO(data))")
    raise NotImplementedError(f"no decoder available for format {fmt!r}")


def _fit(arr: np.ndarray) -> np.ndarray:
    """Normalize a decoded (h, w, 3) frame to the canonical (H, W, 3): crop
    the excess, zero-pad the deficit.  Keeps a mixed-dimension batch from
    crashing the whole-batch stack (real codecs return per-row dims)."""
    h, w = arr.shape[0], arr.shape[1]
    if h == H and w == W:
        return arr
    out = np.zeros((H, W, 3), dtype=np.uint8)
    out[: min(h, H), : min(w, W)] = arr[: min(h, H), : min(w, W)]
    return out


def _decode_batch(pdf: pd.DataFrame) -> np.ndarray:
    """(n, H, W, 3) decoded batch.  The only per-row python is a zero-copy
    buffer view per payload (the codec boundary is inherently per-row); all
    math downstream is whole-batch numpy.  Non-FAKE payloads route through
    the scalar decoder, which raises the documented NotImplementedError;
    frames whose decoded dims differ from (H, W) are normalized per-row."""
    bufs = []
    for data, fmt, w, h in zip(pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]):
        data = bytes(data)
        if data[:4] == b"FAKE" and int(w) == W and int(h) == H:
            bufs.append(np.frombuffer(data, dtype=np.uint8, count=H * W * 3, offset=8))
        else:
            bufs.append(_fit(_decode(data, fmt, int(w), int(h))).reshape(-1))
    return np.stack(bufs).reshape(len(bufs), H, W, 3)


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

    cols = [f.name for f in VERIFY_SCHEMA.fields]

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            ids = pdf["image_id"].str.slice(3).astype(np.int64).to_numpy()
            refs = fake_pixels_batch(ids).astype(np.float64)
            dec = _decode_batch(pdf).astype(np.float64)
            mse = ((refs - dec) ** 2).mean(axis=(1, 2, 3))
            with np.errstate(divide="ignore"):
                p = np.where(
                    mse == 0.0, 999.0, np.round(10.0 * np.log10(255.0 * 255.0 / mse), 3)
                )
            prefixes = pd.Series([f"synthetic image {i} at " for i in ids])
            caption_ok = pd.Series(
                [c.startswith(pref) for c, pref in zip(pdf["caption"], prefixes)]
            )
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "fmt": pdf["fmt"].to_numpy(),
                    "psnr_db": p,
                    "psnr_ok": (mse == 0.0) | (p >= min_psnr_db),
                    "caption_ok": caption_ok.to_numpy(),
                }
            )

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


def tile_pixel_stats(images: DataFrame, grid: int = 4) -> DataFrame:
    """Per-TILE pixel statistics: decode each image, split the H x W frame
    into grid x grid pixel tiles (the same tiles the raster<->vector
    assignment maps to cells), and emit per-tile mean channels — the raster
    side of the tiling story, joined to cells via (image_id, tile_x, tile_y).

    Whole-batch numpy: one (n, G, H/G, G, W/G, 3) reshape + one mean; the
    only per-row work is the decode buffer view.  Because the stub codec is
    a pure integer hash, this is the one image-DECODE operator whose output
    a SQL oracle can re-derive exactly (see __spark_entry__._tile_pixels_sql)
    — decoded-pixel verification with a hash-matched gate rather than a
    rows-only check."""
    g = grid
    cols = ["image_id", "tile_x", "tile_y", "mean_r", "mean_g", "mean_b"]
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("tile_x", T.IntegerType(), False),
            T.StructField("tile_y", T.IntegerType(), False),
            T.StructField("mean_r", T.DoubleType(), False),
            T.StructField("mean_g", T.DoubleType(), False),
            T.StructField("mean_b", T.DoubleType(), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            dec = _decode_batch(pdf).astype(np.float64)
            n = dec.shape[0]
            th, tw = H // g, W // g
            # (n, g, th, g, tw, 3) -> mean over pixel dims -> (n, g, g, 3)
            tiles = dec.reshape(n, g, th, g, tw, 3).mean(axis=(2, 4))
            ty, tx = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
            yield pd.DataFrame(
                {
                    "image_id": np.repeat(pdf["image_id"].to_numpy(), g * g),
                    "tile_x": np.tile(tx.ravel(), n).astype(np.int32),
                    "tile_y": np.tile(ty.ravel(), n).astype(np.int32),
                    # raw means (integer pixel sums are order-independent-
                    # exact in float64; /count is one correctly-rounded op).
                    # Rounding happens SQL-side: tile means land on exact
                    # dyadic ties (sum ≡ 6 mod 12 -> ...5 at the 7th digit)
                    # where numpy banker's and SQL HALF_UP diverge.
                    "mean_r": tiles[:, :, :, 0].reshape(-1),
                    "mean_g": tiles[:, :, :, 1].reshape(-1),
                    "mean_b": tiles[:, :, :, 2].reshape(-1),
                }
            )

    return images.mapInPandas(run, schema)


def image_tile_signature(images: DataFrame, grid: int = 4, quant: int = 16) -> DataFrame:
    """Content-based image signature from DECODED pixels: per-tile channel
    means quantized to ``quant`` levels, serialized in a deterministic
    token order, md5-hashed — a perceptual-hash-style fingerprint whose
    every step is engine-portable (the SQL oracle re-derives the pixels,
    the means, the quantization and the hash).

    Returns (image_id, sig).  Dedup = groupBy(sig); unlike the metadata
    phash column this fingerprints the actual pixel content, so re-encoded
    copies (e.g. the png/jpeg pair of the same render) collide exactly when
    their quantized tiles agree."""
    from pyspark.sql import functions as F

    t = tile_pixel_stats(images, grid)
    tok = F.concat_ws(
        ":",
        F.col("tile_y").cast("string"),
        F.col("tile_x").cast("string"),
        F.floor(F.col("mean_r") / float(quant)).cast("int").cast("string"),
        F.floor(F.col("mean_g") / float(quant)).cast("int").cast("string"),
        F.floor(F.col("mean_b") / float(quant)).cast("int").cast("string"),
    )
    return (
        t.select("image_id", tok.alias("tok"))
        .groupBy("image_id")
        .agg(
            F.md5(
                F.concat_ws("|", F.sort_array(F.collect_list("tok"))).cast("binary")
            ).alias("sig")
        )
    )


def image_features(images: DataFrame) -> DataFrame:
    """Cheap feature extraction over the binary column (mean channels)."""

    cols = [f.name for f in FEATURE_SCHEMA.fields]

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            dec = _decode_batch(pdf).astype(np.float64)
            means = dec.mean(axis=(1, 2))  # (n, 3)
            # raw doubles out; rounding happens SQL-side (HALF_UP parity
            # with the oracle — integer-pixel means land on dyadic ties
            # where numpy banker's rounding diverges)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "mean_r": means[:, 0],
                    "mean_g": means[:, 1],
                    "mean_b": means[:, 2],
                    "brightness": means.mean(axis=1),
                }
            )

    return images.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)


def resize_images(images: DataFrame, factor: int = 2) -> DataFrame:
    """Area-average downsample by an integer ``factor`` — the dataset-prep
    resize stage over opaque binary image columns: decode, mean each
    factor x factor block with INTEGER floor semantics (sum // f^2, so a
    SQL oracle reproduces the payload bit-exactly), re-encode lossless at
    (w/f, h/f).  Whole-batch numpy: one (n, oh, f, ow, f, 3) reshape+sum;
    per-row python is only the codec boundary.  Map-only at any scale (no
    shuffle: one mapInPandas over the image table)."""
    f = int(factor)
    if f < 1 or H % f or W % f:
        raise ValueError(f"factor {factor} must divide {H}x{W}")
    from ..sources.images import fake_encode

    cols = [s.name for s in RESIZED_SCHEMA.fields]
    oh, ow = H // f, W // f

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            dec = _decode_batch(pdf).astype(np.uint32)
            n = dec.shape[0]
            small = (
                dec.reshape(n, oh, f, ow, f, 3).sum(axis=(2, 4)) // (f * f)
            ).astype(np.uint8)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "bytes": [fake_encode(small[i], "png") for i in range(n)],
                    "w": np.full(n, ow, dtype=np.int32),
                    "h": np.full(n, oh, dtype=np.int32),
                    "fmt": ["png"] * n,
                }
            )

    return images.mapInPandas(run, RESIZED_SCHEMA)


CHECKSUM_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
        T.StructField("checksum", T.LongType(), False),
    ]
)


def image_checksum_stats(images: DataFrame) -> DataFrame:
    """Per-image channel means + a POSITIONAL integer checksum
    sum(p * (1 + (y*31 + x*17 + c*7) % 97)) over the row's OWN (w, h) —
    decodes variable-dimension payloads (e.g. the post-resize shape), so
    it also closes the round-trip: a resized artifact is itself readable
    by every downstream consumer.  The checksum pins pixel POSITIONS
    (means alone would accept any permutation)."""

    cols = [s.name for s in CHECKSUM_SCHEMA.fields]

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            out = []
            for image_id, data, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                arr = _decode(bytes(data), str(fmt), int(w), int(h)).astype(
                    np.int64
                )
                hh, ww = arr.shape[0], arr.shape[1]
                ys = np.arange(hh, dtype=np.int64)[:, None, None]
                xs = np.arange(ww, dtype=np.int64)[None, :, None]
                cs = np.arange(3, dtype=np.int64)[None, None, :]
                wgt = 1 + (ys * 31 + xs * 17 + cs * 7) % 97
                # exact int64 sums, ONE correctly-rounded division — the
                # same value SQL's sum()/count computes (numpy .mean()'s
                # pairwise float accumulation would not be)
                means = arr.reshape(-1, 3).sum(axis=0) / float(hh * ww)
                out.append(
                    (
                        image_id,
                        means[0],
                        means[1],
                        means[2],
                        int((arr * wgt).sum()),
                    )
                )
            yield pd.DataFrame(out, columns=cols)

    return images.mapInPandas(run, CHECKSUM_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)


def frame_sample(videos: DataFrame, every: int = 3) -> DataFrame:
    """Sample every ``every``-th frame of each video as an IMAGE row —
    the multimodal pipeline's frame-extraction stage over opaque binary
    video columns.  Emitted frames are re-encoded lossless, so every
    image operator (features, tile stats, checksum, dedup) consumes them
    unchanged.  Map-only at any scale: one mapInPandas over the video
    table; row growth is n_frames/every per video."""
    from ..sources.images import fake_encode, fake_video_decode

    k = int(every)
    if k < 1:
        raise ValueError(every)
    cols = [s.name for s in FRAME_SCHEMA.fields]

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            out = []
            for vid, data, n_frames in zip(
                pdf["video_id"], pdf["bytes"], pdf["n_frames"]
            ):
                frames = fake_video_decode(bytes(data), int(n_frames))
                for t in range(0, int(n_frames), k):
                    out.append(
                        (
                            vid,
                            t,
                            f"{vid}#{t}",
                            fake_encode(frames[t], "png"),
                            W,
                            H,
                            "png",
                        )
                    )
            yield pd.DataFrame(out, columns=cols)

    return videos.mapInPandas(run, FRAME_SCHEMA)


AUDIO_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("chunk_id", T.IntegerType(), False),
        T.StructField("mean_abs", T.DoubleType(), False),
        T.StructField("peak", T.IntegerType(), False),
        T.StructField("zero_crossings", T.IntegerType(), False),
    ]
)


def audio_chunk_stats(audio_df: DataFrame, chunk: int = 512) -> DataFrame:
    """Per-chunk audio features over opaque PCM payloads — the audio leg
    of the multimodal dataset-prep family (decode -> chunk -> per-chunk
    mean |amplitude|, peak, zero-crossing count; sign changes are counted
    WITHIN a chunk only, with nonnegative == positive).

    Same plumbing contract as the image kernels: ``mapInPandas`` with
    bounded Arrow batches, whole-batch numpy after the per-row codec
    boundary (sources/audio.py stub; real formats raise the documented
    NotImplementedError), and the binary column never survives past this
    map stage — at scale only the small stats rows shuffle."""
    from ..sources.audio import decode_audio

    def run(batches):
        for pdf in batches:
            out = []
            for aid, data, n in zip(
                pdf["audio_id"], pdf["bytes"], pdf["n_samples"]
            ):
                s = decode_audio(data)[: int(n)].astype(np.int32)
                m = (len(s) // chunk) * chunk
                c = s[:m].reshape(-1, chunk)
                mean_abs = np.round(np.abs(c).sum(axis=1) / float(chunk), 6)
                peak = np.abs(c).max(axis=1)
                nonneg = c >= 0
                zc = (nonneg[:, 1:] != nonneg[:, :-1]).sum(axis=1)
                for k in range(c.shape[0]):
                    out.append(
                        (aid, k, float(mean_abs[k]), int(peak[k]), int(zc[k]))
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "audio_id",
                    "chunk_id",
                    "mean_abs",
                    "peak",
                    "zero_crossings",
                ],
            )

    return audio_df.mapInPandas(run, AUDIO_CHUNK_SCHEMA)
