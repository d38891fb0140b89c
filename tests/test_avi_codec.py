"""MJPEG/AVI container codec (llm/avi.py): RIFF walk, frame sampling
without decoding dropped frames, headers, gates."""

import struct

import numpy as np
import pytest

from my_flink_1_10_2_spark.llm.avi import (
    avi_decode_sampled_pixels,
    avi_encode_mjpeg,
    avi_frames,
)
from my_flink_1_10_2_spark.llm.jpeg import jpeg_encode_gray


def _tiles_frame(levels):
    tiles = np.array([list(levels)], dtype=np.uint8)
    img = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))
    return img, jpeg_encode_gray(8 * len(levels), 8, img.tobytes())


def test_roundtrip_and_sampling():
    imgs, frames = zip(*[_tiles_frame([2 * k, (2 * k + 100) % 256 // 2 * 2])
                         for k in range(9)])
    avi = avi_encode_mjpeg(16, 8, list(frames), fps=4)
    w, h, n, kept = avi_frames(avi, every=1)
    assert (w, h, n, len(kept)) == (16, 8, 9, 9)
    assert list(kept) == list(frames)  # byte-identical chunk payloads
    w, h, n, pxs = avi_decode_sampled_pixels(avi, every=4)
    assert n == 9 and len(pxs) == 3  # frames 0, 4, 8
    for i, fidx in enumerate((0, 4, 8)):
        assert pxs[i] == imgs[fidx].tobytes()


def test_odd_sized_frames_are_word_aligned():
    # force odd JPEG byte lengths so chunk padding is exercised
    rng = np.random.RandomState(3)
    frames = []
    for _ in range(5):
        img = rng.randint(0, 256, size=(8, 8)).astype(np.uint8)
        frames.append(jpeg_encode_gray(8, 8, img.tobytes()))
    avi = avi_encode_mjpeg(8, 8, frames)
    _w, _h, n, kept = avi_frames(avi)
    assert n == 5 and kept == frames


def test_rejects_non_avi_and_non_mjpg():
    with pytest.raises(ValueError, match="RIFF"):
        avi_frames(b"RIFF\x04\x00\x00\x00WAVE")
    _img, frame = _tiles_frame([10])
    avi = bytearray(avi_encode_mjpeg(8, 8, [frame]))
    pos = avi.find(b"MJPG")  # strh handler fourcc
    avi[pos : pos + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="MJPG"):
        avi_frames(bytes(avi))


def test_truncated_chunk_is_loud():
    _img, frame = _tiles_frame([10])
    avi = avi_encode_mjpeg(8, 8, [frame])
    with pytest.raises(ValueError, match="truncated|exhaust"):
        avi_frames(avi[: len(avi) // 2])


def test_empty_frame_list_rejected():
    with pytest.raises(ValueError, match="at least one frame"):
        avi_encode_mjpeg(8, 8, [])


def test_extract_features_video_leg(spark):
    from my_flink_1_10_2_spark.llm.multimodal import (
        extract_features,
        synthetic_avi_media,
    )

    docs = spark.createDataFrame([(d,) for d in range(5)], "doc_id long")
    feats = extract_features(synthetic_avi_media(docs), fake=False)
    rows = {r.media_id: r.features for r in feats.collect()}
    for d in range(5):
        nf = 3 + d % 4
        vals = [
            ((d * 41 + f * 23 + t * 29) % 128) * 2
            for f in range(nf)
            for t in range(2)
        ]
        w, h, n_frames, n_px, s, lo, hi = rows[d]
        assert (w, h, n_frames, n_px) == (16, 8, nf, nf * 128)
        assert s == 64 * sum(vals)
        assert (lo, hi) == (min(vals), max(vals))
