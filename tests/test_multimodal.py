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


def test_unknown_formats_raise_declared():
    """PNG/WAV decode for real (stdlib codecs); everything else —
    JPEG/MP3-class formats needing external libs — raises
    NotImplementedError instead of misdecoding."""
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\xff\xd8\xff\xe0 jpeg-ish", fake=False)
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"ID3 mp3-ish", fake=False)
    # fixture blobs are gated behind fake=True
    blob = mm.make_fake_image("k", 4, 4)
    with pytest.raises(ValueError, match="fake=True"):
        mm.decode_image(blob, fake=False)


# --- real stdlib codecs (kernel/codecs.py): PNG + WAV -----------------------

def _ref_filter_row(ftype, line, prev, c):
    """Reference PNG row FILTERING (the encoder side of the spec), used to
    craft streams that exercise every decode filter type."""
    out = np.zeros_like(line)
    for i in range(len(line)):
        a = int(line[i - c]) if i >= c else 0
        b = int(prev[i])
        cc = int(prev[i - c]) if i >= c else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - cc
            pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
            pred = a if (pa <= pb and pa <= pc_) else (b if pb <= pc_ else cc)
        out[i] = (int(line[i]) - pred) % 256
    return out


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    from duke_spark.kernel import codecs
    rng = np.random.default_rng(7 + channels)
    img = rng.integers(0, 256, size=(13, 9, channels), dtype=np.uint8)
    blob = codecs.encode_png(img)
    assert blob[:8] == codecs.PNG_SIG
    out = codecs.decode_png(blob)
    np.testing.assert_array_equal(out, img)


def test_png_decode_all_filter_types():
    """Hand-filter a stream cycling through filters 0..4 (our encoder only
    emits 0) and check the decoder reconstructs the original exactly."""
    import struct
    import zlib

    from duke_spark.kernel import codecs
    rng = np.random.default_rng(42)
    h, w, c = 10, 7, 3
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    flat = img.reshape(h, w * c)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for r in range(h):
        ftype = r % 5
        raw.append(ftype)
        raw.extend(_ref_filter_row(ftype, flat[r], prev, c).tobytes())
        prev = flat[r]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (codecs.PNG_SIG + codecs._chunk(b"IHDR", ihdr) +
            codecs._chunk(b"IDAT", zlib.compress(bytes(raw))) +
            codecs._chunk(b"IEND", b""))
    np.testing.assert_array_equal(codecs.decode_png(blob), img)


def test_png_unsupported_variants_raise():
    import struct

    from duke_spark.kernel import codecs
    with pytest.raises(ValueError, match="signature"):
        codecs.decode_png(b"JFIF not a png")
    # palette color type (3) is declared-unsupported, not misdecoded
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)
    blob = (codecs.PNG_SIG + codecs._chunk(b"IHDR", ihdr) +
            codecs._chunk(b"IDAT", b"x") + codecs._chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported"):
        codecs.decode_png(blob)


def test_wav_roundtrip_and_downmix():
    from duke_spark.kernel import codecs
    t = np.linspace(0, 1, 8000, dtype=np.float32)
    mono = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    sr, out = codecs.decode_wav(codecs.encode_wav(8000, mono))
    assert sr == 8000 and len(out) == len(mono)
    np.testing.assert_allclose(out, mono, atol=1e-4)     # PCM16 quantization


def test_image_features_on_real_png_no_fake(spark):
    """The VERDICT de-stub criterion: a real (generated) PNG flows through
    image_features WITHOUT fake=True."""
    import pandas as pd

    from duke_spark.kernel import codecs
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    df = spark.createDataFrame(pd.DataFrame({
        "media_id": ["png1", "bad1"],
        "blob": [codecs.encode_png(img), b"JFIFnotdecodable"],
    }))
    got = (mm.image_features(df, fake=False).toPandas()
           .set_index("media_id"))
    feats = got.loc["png1", "features"]
    assert len(feats) == 3 + 16                      # chan means + histogram
    np.testing.assert_allclose(feats[:3], img.reshape(-1, 3).mean(0) / 255.0,
                               rtol=1e-5)
    assert got.loc["bad1", "features"] is None       # declared-unsupported


def test_resize_real_png_stays_png(spark):
    import pandas as pd

    from duke_spark.kernel import codecs
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(20, 20, 4), dtype=np.uint8)
    df = spark.createDataFrame(pd.DataFrame({
        "media_id": ["p"], "blob": [codecs.encode_png(img)]}))
    out = mm.resize_images(df, 10, 10, fake=False).toPandas()
    blob = bytes(out.loc[0, "blob"])
    assert blob[:8] == codecs.PNG_SIG
    small = codecs.decode_png(blob)
    assert small.shape == (10, 10, 4)
    np.testing.assert_array_equal(small, img[::2][:, ::2])   # NN resize


def test_audio_frame_stats_on_real_wav(spark):
    import pandas as pd

    from duke_spark.kernel import codecs
    t = np.arange(4096, dtype=np.float32)
    samples = (0.25 * np.sin(t / 10)).astype(np.float32)
    df = spark.createDataFrame(pd.DataFrame({
        "media_id": ["w"], "blob": [codecs.encode_wav(16000, samples)]}))
    out = mm.audio_frame_stats(df, frame_len=1024, max_frames=4,
                               fake=False).toPandas()
    assert len(out) == 4
    assert (out["rms"] > 0.1).all()                  # sine RMS ≈ 0.177


def test_metadata_parses_real_png_and_wav(spark):
    import pandas as pd

    from duke_spark.kernel import codecs
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    wav = codecs.encode_wav(22050, np.zeros(5000, dtype=np.float32))
    df = spark.createDataFrame(pd.DataFrame({
        "media_id": ["png", "wav"],
        "blob": [codecs.encode_png(img), wav]}))
    got = mm.media_metadata(df).toPandas().set_index("media_id")
    assert got.loc["png", "kind"] == "image" and bool(got.loc["png", "valid"])
    assert (got.loc["png", "width"], got.loc["png", "height"],
            got.loc["png", "channels"]) == (17, 24, 3)
    assert got.loc["wav", "kind"] == "audio"
    assert got.loc["wav", "sample_rate"] == 22050
    assert got.loc["wav", "n_samples"] == 5000


def test_metadata_parses_jpeg_sof_headers(spark):
    """JPEG dims come from the SOF marker at arbitrary offset: the plain
    fixture (SOF at 20, inside the 44-byte head block) and one padded
    with a 5 KB APP1/EXIF segment (SOF far beyond the head block) must
    both parse; SOS-before-SOF and truncated streams are invalid."""
    import pandas as pd

    plain = mm.make_fake_jpeg(640, 480)
    assert len(plain) == 41
    exif = (b"\xff\xe1" + (5000 + 2).to_bytes(2, "big") + b"E" * 5000)
    padded = plain[:2] + exif + plain[2:]
    # progressive frame header (SOF2) instead of baseline SOF0
    prog = bytearray(mm.make_fake_jpeg(33, 7, channels=1))
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    sos_first = plain[:2] + b"\xff\xda\x00\x04\x01\x00" + plain[2:]
    trunc = plain[:12]
    df = spark.createDataFrame(pd.DataFrame({
        "media_id": ["plain", "padded", "prog", "sos", "trunc"],
        "blob": [plain, padded, bytes(prog), sos_first, trunc]}))
    got = mm.media_metadata(df).toPandas().set_index("media_id")
    for mid, (w, h, c) in {"plain": (640, 480, 3),
                           "padded": (640, 480, 3),
                           "prog": (33, 7, 1)}.items():
        assert got.loc[mid, "kind"] == "image" and bool(got.loc[mid, "valid"])
        assert (got.loc[mid, "width"], got.loc[mid, "height"],
                got.loc[mid, "channels"]) == (w, h, c)
    for mid in ("sos", "trunc"):
        assert got.loc[mid, "kind"] == "unknown"
        assert not bool(got.loc[mid, "valid"])


def test_decode_image_still_raises_for_jpeg():
    """Metadata parses JPEG headers, but full decode stays declared-
    unsupported (libjpeg absent)."""
    with pytest.raises(NotImplementedError):
        mm.decode_image(mm.make_fake_jpeg(8, 8))


def test_metadata_parses_mp3_frame_headers(spark):
    """MP3 sample rate / duration come from the MPEG frame-header walk
    after an ID3v2 skip: plain CBR, tagless (sync at 0), a fat ID3 tag
    pushing the first frame past the 44-byte head block, and a stream
    with trailing garbage must all parse; sync-less bytes are invalid."""
    import pandas as pd

    plain = mm.make_fake_mp3(44100, n_frames=4)
    tagless = plain[10:]
    fat_payload = b"T" * 3000
    fat = (b"ID3\x03\x00\x00" +
           bytes([(len(fat_payload) >> 21) & 0x7F,
                  (len(fat_payload) >> 14) & 0x7F,
                  (len(fat_payload) >> 7) & 0x7F,
                  len(fat_payload) & 0x7F]) + fat_payload + tagless)
    mono = mm.make_fake_mp3(32000, n_frames=3, channels=1,
                            bitrate_kbps=64)
    trailing = plain + b"TAG" + b"\x00" * 125      # ID3v1 trailer
    bad = b"\xff\x00" + b"\x00" * 40               # sync byte, no sync bits
    df = spark.createDataFrame(pd.DataFrame({
        "media_id": ["plain", "tagless", "fat", "mono", "trail", "bad"],
        "blob": [plain, tagless, fat, mono, trailing, bad]}))
    got = mm.media_metadata(df).toPandas().set_index("media_id")
    for mid, (sr, ns) in {"plain": (44100, 4 * 1152),
                          "tagless": (44100, 4 * 1152),
                          "fat": (44100, 4 * 1152),
                          "mono": (32000, 3 * 1152),
                          "trail": (44100, 4 * 1152)}.items():
        assert got.loc[mid, "kind"] == "audio" and bool(got.loc[mid, "valid"])
        assert got.loc[mid, "sample_rate"] == sr
        assert got.loc[mid, "n_samples"] == ns
    assert got.loc["bad", "kind"] == "unknown"
    assert not bool(got.loc["bad", "valid"])


def test_mp3_mpeg2_layer3_spf():
    """MPEG-2 Layer III frames carry 576 samples and use the 72-coef
    frame length — exercised straight on the parser (no Spark)."""
    # MPEG2 (ver bits 10 -> b1 0xF3), Layer III, 64 kbps idx 8, 22050 Hz
    hdr = bytes([0xFF, 0xF3, (8 << 4) | (0 << 2), 0x00])
    frame_len = 72 * 64000 // 22050
    blob = (hdr + b"\x00" * (frame_len - 4)) * 5
    assert mm._mp3_stream_info(blob) == (22050, 2, 5 * 576)


def test_decode_audio_still_raises_for_mp3():
    """Metadata parses MP3 headers, but full decode stays declared-
    unsupported (ffmpeg absent)."""
    with pytest.raises(NotImplementedError):
        mm.decode_audio(mm.make_fake_mp3())
