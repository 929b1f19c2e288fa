"""Property-based round trips for the media codecs (imaging.py,
containers.py) — decode(encode(x)) == x over adversarial shapes and
values, hypothesis-shrunk. No Spark session needed: the kernels are
pure functions, which is exactly why they can be property-tested at
this density (the engine analogue of the reference's round-trip
contract style, SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from watermill_kinesis_spark.functions.containers import (
    decode_tiff_tags,
    decode_wav,
    encode_mp4,
    encode_tiff,
    encode_wav,
    probe_mp4,
)
from watermill_kinesis_spark.functions.imaging import (
    decode_bmp,
    decode_gif,
    decode_jpeg,
    encode_bmp,
    encode_gif,
    encode_jpeg,
)

DIMS = st.integers(min_value=1, max_value=24)


@settings(max_examples=40, deadline=None)
@given(h=DIMS, w=DIMS, seed=st.integers(0, 2**32 - 1))
def test_bmp_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@settings(max_examples=40, deadline=None)
@given(
    h=DIMS,
    w=DIMS,
    npal=st.integers(min_value=1, max_value=256),
    seed=st.integers(0, 2**32 - 1),
)
def test_gif_roundtrip_property(h, w, npal, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (npal, 3), dtype=np.uint8)
    idx = rng.integers(0, npal, (h, w), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    gray=st.booleans(),
    sub=st.sampled_from(["444", "420"]),
    dri=st.integers(min_value=0, max_value=3),
    seed=st.integers(0, 2**32 - 1),
)
def test_jpeg_decodes_any_shape_within_range(h, w, gray, sub, dri, seed):
    """JPEG is lossy, so the property is structural: output shape
    matches input, dtype uint8, and a CONSTANT image reconstructs
    within DC-quantization tolerance regardless of dims/subsampling/
    restart cadence."""
    rng = np.random.default_rng(seed)
    if gray:
        px = np.full((h, w), int(rng.integers(0, 256)), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(px, restart_interval=dri))
        assert dec.shape == (h, w, 1)
    else:
        px = np.zeros((h, w, 3), dtype=np.uint8)
        px[:, :] = rng.integers(0, 256, 3)
        dec = decode_jpeg(
            encode_jpeg(px, subsample=sub, restart_interval=dri)
        )
        assert dec.shape == (h, w, 3)
    assert dec.dtype == np.uint8
    assert np.abs(dec.astype(int) - px.reshape(h, w, -1).astype(int)).max() <= 4


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=500),
    ch=st.integers(min_value=1, max_value=4),
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    seed=st.integers(0, 2**32 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-(2**15), 2**15, (n, ch)).astype(np.int16)
    got_rate, got_ch, out = decode_wav(encode_wav(s, rate))
    assert (got_rate, got_ch) == (rate, ch)
    assert np.array_equal(out, s)


@settings(max_examples=40, deadline=None)
@given(
    ts=st.integers(min_value=1, max_value=2**32 - 1),
    dur=st.integers(min_value=0, max_value=2**32 - 1),
    tracks=st.integers(min_value=0, max_value=12),
)
def test_mp4_probe_property(ts, dur, tracks):
    info = probe_mp4(encode_mp4(ts, dur, tracks))
    assert info["timescale"] == ts
    assert info["duration"] == dur
    assert info["n_tracks"] == tracks


@settings(max_examples=40, deadline=None)
@given(
    tags=st.dictionaries(
        keys=st.integers(min_value=1, max_value=0xFFFF),
        values=st.one_of(
            st.tuples(st.just(3), st.integers(0, 0xFFFF)),
            st.tuples(st.just(4), st.integers(0, 0xFFFFFFFF)),
        ),
        min_size=1,
        max_size=16,
    ),
    big=st.booleans(),
)
def test_tiff_roundtrip_property(tags, big):
    got = decode_tiff_tags(encode_tiff(tags, big_endian=big))
    assert got == {t: v for t, (ft, v) in tags.items()}
