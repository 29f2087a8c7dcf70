"""Multimodal binary-column operators: metadata, features, resize, frames.

The decode kernels are the deterministic fixture codecs (real codecs are
stubbed, ``duke_spark/operators/multimodal.py``); the Spark plumbing under
test — schemas, pruning, batch iteration, fan-out shapes — is the real
production path.
"""

import numpy as np
import pytest

from duke_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    rows = []
    for i in range(6):
        rows.append((f"img_{i}", mm.make_fake_image(f"img_{i}",
                                                    width=32 + 4 * i,
                                                    height=24 + 2 * i)))
    for i in range(4):
        rows.append((f"aud_{i}", mm.make_fake_audio(f"aud_{i}",
                                                    sample_rate=16000,
                                                    n_samples=4096 + 512 * i)))
    rows.append(("junk_0", b"\x00\x01\x02 not media"))
    rows.append(("dup_img", mm.make_fake_image("img_0", 32, 24)))  # dup of img_0
    return spark.createDataFrame(rows, ["media_id", "blob"]).repartition(3)


def test_metadata_kinds_and_dims(media_df):
    meta = {r["media_id"]: r for r in mm.media_metadata(media_df).collect()}
    assert len(meta) == 12
    assert meta["img_0"]["kind"] == "image"
    assert (meta["img_0"]["width"], meta["img_0"]["height"]) == (32, 24)
    assert meta["img_0"]["channels"] == 3
    assert meta["aud_1"]["kind"] == "audio"
    assert meta["aud_1"]["sample_rate"] == 16000
    assert meta["aud_1"]["n_samples"] == 4608
    assert meta["junk_0"]["kind"] == "unknown"
    assert meta["junk_0"]["valid"] is False


def test_metadata_hash_is_exact_dedup_key(media_df):
    meta = {r["media_id"]: r["content_hash"]
            for r in mm.media_metadata(media_df).collect()}
    assert meta["dup_img"] == meta["img_0"]  # same payload → same hash
    assert meta["img_1"] != meta["img_0"]


def test_image_features_shape_and_determinism(media_df):
    feats = {r["media_id"]: r["features"]
             for r in mm.image_features(media_df, bins=16).collect()}
    # 3 channel means + 16 histogram bins
    assert len(feats["img_0"]) == 19
    assert feats["junk_0"] is None
    assert feats["aud_0"] is None
    # deterministic across runs
    again = {r["media_id"]: r["features"]
             for r in mm.image_features(media_df, bins=16).collect()}
    assert feats == again
    # histogram part sums to ~1
    assert abs(sum(feats["img_2"][3:]) - 1.0) < 1e-5


def test_resize_roundtrip(media_df):
    out = {r["media_id"]: r for r in
           mm.resize_images(media_df, out_w=8, out_h=6).collect()}
    assert set(out) == {f"img_{i}" for i in range(6)} | {"dup_img"}
    r = out["img_0"]
    assert (r["width"], r["height"]) == (8, 6)
    arr = mm.decode_image(bytes(r["blob"]), fake=True)
    assert arr.shape == (6, 8, 3)
    src = mm.decode_image(mm.make_fake_image("img_0", 32, 24), fake=True)
    # nearest-neighbor: every output pixel exists in the source
    assert arr[0, 0, 0] == src[0, 0, 0]


def test_audio_frame_stats_fanout(media_df):
    fr = mm.audio_frame_stats(media_df, frame_len=1024,
                              max_frames=4).toPandas()
    assert set(fr["media_id"]) == {f"aud_{i}" for i in range(4)}
    g = fr.groupby("media_id").size()
    assert (g == 4).all()  # 4096+ samples / 1024 → capped at 4 frames
    assert (fr["rms"] > 0).all()
    # offsets strictly increasing within a blob
    for _, grp in fr.groupby("media_id"):
        offs = grp.sort_values("frame_idx")["offset_samples"].to_numpy()
        assert (np.diff(offs) > 0).all()


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"anything", fake=False)
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"anything", fake=False)
