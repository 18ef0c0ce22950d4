"""Resize / frame-sample plumbing: exact block-mean semantics, artifact
round-trips, and the video container contract — the multimodal dataset-prep
stages whose outputs the hash-matched oracles (image_resize_stats,
video_frame_sample) verify end-to-end per round."""

import numpy as np

from s2geometry_d_spark.operators.multimodal import (
    frame_sample,
    image_checksum_stats,
    resize_images,
)
from s2geometry_d_spark.sources.images import (
    H,
    W,
    fake_pixels,
    synth_images_cached,
    synth_videos,
    video_frame_seed,
)

from conftest import SF_DIR


def test_resize_is_exact_block_floor_mean(spark):
    imgs = synth_images_cached(spark, SF_DIR).limit(8)
    rows = {r["image_id"]: r for r in resize_images(imgs, 2).collect()}
    src = {r["image_id"]: r for r in imgs.collect()}
    assert rows.keys() == src.keys()
    for iid, r in rows.items():
        assert (r["w"], r["h"], r["fmt"]) == (W // 2, H // 2, "png")
        got = np.frombuffer(bytes(r["bytes"])[8:], dtype=np.uint8).reshape(
            H // 2, W // 2, 3
        )
        s = src[iid]
        base = np.frombuffer(bytes(s["bytes"])[8:], dtype=np.uint8).reshape(
            H, W, 3
        )
        want = (
            base.astype(np.uint32)
            .reshape(H // 2, 2, W // 2, 2, 3)
            .sum(axis=(1, 3))
            // 4
        ).astype(np.uint8)
        assert np.array_equal(got, want)


def test_resized_artifact_round_trips_through_stats(spark):
    """The resize OUTPUT is a readable image artifact: the checksum-stats
    kernel decodes it through the normal codec path at its own dims."""
    imgs = synth_images_cached(spark, SF_DIR).limit(4)
    out = image_checksum_stats(resize_images(imgs, 4)).collect()
    assert len(out) == 4
    for r in out:
        assert 0.0 <= r["mean_r"] <= 255.0 and r["checksum"] > 0


def test_frame_sample_extracts_exact_frames(spark):
    vids = synth_videos(spark, SF_DIR).limit(6)
    meta = {r["video_id"]: r["n_frames"] for r in vids.collect()}
    frames = frame_sample(vids, every=3).collect()
    want_count = sum(len(range(0, n, 3)) for n in meta.values())
    assert len(frames) == want_count
    for r in frames:
        doc_id = int(r["video_id"][3:])
        assert r["frame_idx"] % 3 == 0 and r["frame_idx"] < meta[r["video_id"]]
        got = np.frombuffer(bytes(r["bytes"])[8:], dtype=np.uint8).reshape(
            H, W, 3
        )
        assert np.array_equal(
            got, fake_pixels(video_frame_seed(doc_id, r["frame_idx"]))
        )
        assert r["image_id"] == f"{r['video_id']}#{r['frame_idx']}"
