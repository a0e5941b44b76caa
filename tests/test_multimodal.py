"""Real-decode multimodal path (llm/multimodal.py): P6 PPM payloads are
actual images — decode and resize are verified at the pixel level
through the same mapInPandas harness the mm_* queries use."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from rclabsapi_spark.llm.multimodal import (
    attach_ppm_payload,
    decode_image,
    decode_ppm,
    encode_ppm,
    map_binary_batches,
    resize_ppm,
)

SF_DIR = "/root/testdata/sf0.001"


def _px(w, h, seed=b"\x00"):
    n = w * h * 3
    reps = (n + len(seed) - 1) // len(seed)
    return (seed * reps)[:n]


def test_ppm_roundtrip_and_stats():
    rgb = bytes(range(8 * 4 * 3 % 256)) * 0 + bytes(
        (i * 7) % 256 for i in range(8 * 4 * 3)
    )
    d = decode_ppm(encode_ppm(8, 4, rgb))
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(4, 8, 3).astype("float64")
    assert (d["width"], d["height"], d["maxval"]) == (8, 4, 255)
    assert d["mean_r"] == pytest.approx(arr[:, :, 0].mean())
    assert d["mean_b"] == pytest.approx(arr[:, :, 2].mean())


def test_resize_is_true_nearest_neighbor():
    rgb = bytes((i * 13) % 256 for i in range(6 * 6 * 3))
    out = resize_ppm(encode_ppm(6, 6, rgb), target_w=3, target_h=2)
    d = decode_ppm(out)
    assert (d["width"], d["height"]) == (3, 2)
    src = np.frombuffer(rgb, dtype=np.uint8).reshape(6, 6, 3)
    expect = src[(np.arange(2) * 6) // 2][:, (np.arange(3) * 6) // 3]
    got = np.frombuffer(out.split(b"\n", 3)[3], dtype=np.uint8).reshape(2, 3, 3)
    assert (got == expect).all()


def test_decode_dispatch_rejects_compressed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0fakejpeg")


def test_mapinpandas_decodes_real_fixture_payloads(spark):
    """End-to-end through the harness: valid P6 payloads from the
    fixture adapter decode to the exact numpy ground truth."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    with_img = attach_ppm_payload(docs, width=8, height=8)
    feats = map_binary_batches(
        with_img,
        "doc_id long, width int, height int, maxval int,"
        " mean_r double, mean_g double, mean_b double",
        decode_image,
    )
    got = {r["doc_id"]: r for r in feats.collect()}
    for row in docs.select("doc_id", "text").collect():
        seed = hashlib.md5(row["text"].encode()).digest()
        arr = (
            np.frombuffer(_px(8, 8, seed), dtype=np.uint8)
            .reshape(8, 8, 3)
            .astype("float64")
        )
        g = got[row["doc_id"]]
        assert (g["width"], g["height"]) == (8, 8)
        assert g["mean_g"] == pytest.approx(arr[:, :, 1].mean())
    assert len(got) == 50


def test_wav_decode_matches_numpy_ground_truth(spark):
    """Real WAV path: PCM16 payloads decode to exact duration/RMS/peak
    through the mapInPandas harness."""
    from rclabsapi_spark.llm.multimodal import (
        attach_wav_payload,
        decode_wav,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(30)
    with_audio = attach_wav_payload(docs, sample_rate=8000, n_samples=256)
    feats = map_binary_batches(
        with_audio,
        "doc_id long, sample_rate int, channels int, n_samples int,"
        " duration_s double, rms double, peak double",
        decode_wav,
    )
    got = {r["doc_id"]: r for r in feats.collect()}
    for row in docs.select("doc_id", "text").collect():
        seed = hashlib.md5(row["text"].encode()).digest()
        raw = (seed * ((512 + 15) // 16))[:512]
        x = np.frombuffer(raw, dtype="<i2").astype("float64")
        g = got[row["doc_id"]]
        assert g["n_samples"] == 256
        assert g["duration_s"] == pytest.approx(256 / 8000)
        assert g["rms"] == pytest.approx(np.sqrt((x * x).mean()))
        assert g["peak"] == pytest.approx(np.abs(x).max())
    assert len(got) == 30


def test_wav_decode_rejects_non_riff():
    from rclabsapi_spark.llm.multimodal import decode_wav

    with pytest.raises(ValueError):
        decode_wav(b"OggS fake vorbis")


def test_wav_framing_matches_numpy(spark):
    """Frame RMS and zero-crossings equal a manual numpy recompute for
    every frame of every fixture payload."""
    from rclabsapi_spark.llm.multimodal import attach_wav_payload, wav_frames

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(10)
    with_audio = attach_wav_payload(docs, sample_rate=8000, n_samples=256)
    got = {}
    for r in wav_frames(with_audio, frame=64, hop=32).collect():
        got[(r["doc_id"], r["frame_idx"])] = (r["rms"], r["zero_crossings"])

    for row in docs.select("doc_id", "text").collect():
        seed = hashlib.md5(row["text"].encode()).digest()
        raw = (seed * ((512 + 15) // 16))[:512]
        x = np.frombuffer(raw, dtype="<i2").astype("float64")
        n_frames = (len(x) - 64) // 32 + 1
        for i in range(n_frames):
            w = x[i * 32 : i * 32 + 64]
            rms = float(np.sqrt((w * w).mean()))
            zc = int(((w[:-1] * w[1:]) < 0).sum())
            g = got[(row["doc_id"], i)]
            assert g[0] == pytest.approx(rms)
            assert g[1] == zc
