"""Property-based roundtrips for the pure-Python media codecs (no
Spark session needed): PNG and BMP are lossless for arbitrary images,
GIF is lossless for any <=256-color image, WAV is lossless at 16-bit
grid resolution, JPEG preserves DC-exactness on flat images and stays
within PSNR bounds on smooth ones."""

import numpy as np
from hypothesis import given, settings, strategies as st

from feast_spark.functions.codecs import (
    decode_bmp,
    decode_gif,
    decode_gif_frames,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_gif,
    encode_png,
    encode_wav,
)

_dims = st.tuples(
    st.integers(min_value=1, max_value=24), st.integers(min_value=1, max_value=24)
)


def _image(h, w, seed, channels=3, levels=256):
    vals = np.empty(h * w * channels, dtype=np.int64)
    x = seed or 1
    for i in range(len(vals)):
        x = (1103515245 * x + 12345) % (1 << 31)
        vals[i] = x
    return (vals % levels).astype(np.uint8).reshape(h, w, channels)


@settings(max_examples=25, deadline=None)
@given(dims=_dims, seed=st.integers(min_value=0, max_value=2**30))
def test_png_roundtrip_any_rgb(dims, seed):
    h, w = dims
    img = _image(h, w, seed)
    assert np.array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=25, deadline=None)
@given(dims=_dims, seed=st.integers(min_value=0, max_value=2**30))
def test_bmp_roundtrip_any_rgb(dims, seed):
    h, w = dims
    img = _image(h, w, seed)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=25, deadline=None)
@given(
    dims=_dims,
    seed=st.integers(min_value=0, max_value=2**30),
    n_colors=st.integers(min_value=1, max_value=256),
)
def test_gif_roundtrip_any_palette_image(dims, seed, n_colors):
    h, w = dims
    pal = _image(1, 256, seed + 7)[0][:n_colors]
    idx = _image(h, w, seed, channels=1, levels=n_colors)[:, :, 0]
    img = pal[idx]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


@settings(max_examples=10, deadline=None)
@given(
    dims=_dims,
    seed=st.integers(min_value=0, max_value=2**30),
    n_frames=st.integers(min_value=1, max_value=4),
)
def test_gif_animation_roundtrip(dims, seed, n_frames):
    h, w = dims
    pal = _image(1, 16, seed + 3)[0]
    frames = [
        pal[_image(h, w, seed + k, channels=1, levels=16)[:, :, 0]]
        for k in range(n_frames)
    ]
    back = decode_gif_frames(encode_gif(frames))
    assert len(back) == n_frames
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=400),
    seed=st.integers(min_value=0, max_value=2**30),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_16bit_grid(n, seed, rate):
    vals = (_image(1, n, seed)[0][:, 0].astype(np.float64) - 127.5) / 127.5
    snapped = np.round(vals.clip(-1, 1) * 32767) / 32767.0
    got_rate, ch, samples = decode_wav(encode_wav(snapped, rate))
    assert (got_rate, ch) == (rate, 1)
    # 16-bit grid values survive exactly (scale: /32768 on decode)
    assert np.allclose(samples[:, 0] * 32768 / 32767, snapped, atol=1e-9)


@settings(max_examples=8, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**30),
    level=st.integers(min_value=0, max_value=255),
)
def test_jpeg_flat_image_dc_exact(seed, level):
    from feast_spark.functions.jpeg import decode_jpeg, encode_jpeg

    img = np.full((16, 16, 3), level, np.uint8)
    out = decode_jpeg(encode_jpeg(img, 90))
    assert np.abs(out.astype(int) - int(level)).max() <= 1


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**30))
def test_jpeg_smooth_psnr_floor(seed):
    from feast_spark.functions.jpeg import decode_jpeg, encode_jpeg

    y, x = np.mgrid[0:32, 0:40]
    a, b = (seed % 5) + 1, (seed // 5 % 5) + 1
    img = np.stack(
        [np.clip(x * a, 0, 255), np.clip(y * b, 0, 255),
         np.clip(255 - x - y, 0, 255)],
        axis=2,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, 90))
    mse = np.mean((img.astype(float) - out.astype(float)) ** 2)
    psnr = 10 * np.log10(255**2 / mse) if mse else float("inf")
    assert psnr > 38.0


def test_jpeg_truncated_entropy_stream_zero_pads():
    """A JPEG cut off mid-entropy-stream (no trailing EOI marker) must
    decode with zero-padded bits, not re-delivered stale bits: for a
    solid image the already-decoded top rows stay exact."""
    import numpy as np

    from feast_spark.functions.jpeg import decode_jpeg, encode_jpeg

    img = np.full((16, 16, 3), 128, dtype=np.uint8)
    data = encode_jpeg(img, 90)
    assert data.endswith(b"\xff\xd9")
    truncated = data[:-2]  # drop EOI so _fill hits the past-end branch
    out = decode_jpeg(truncated)
    assert out.shape == img.shape
    # zero-padding past the end must reproduce the full decode (the
    # stream was complete; only the marker was removed)
    full = decode_jpeg(data)
    assert np.array_equal(out, full)


def test_jpeg_bitreader_past_end_shifts_acc():
    """Direct pin of the _fill past-end branch: bits delivered past the
    end of data are zeros, not re-reads of consumed bits."""
    from feast_spark.functions.jpeg import _BitReader

    r = _BitReader(b"\xAB", 0)
    first = [r.read_bit() for _ in range(8)]
    assert first == [1, 0, 1, 0, 1, 0, 1, 1]
    # everything after the last real byte must be zero padding
    assert [r.read_bit() for _ in range(16)] == [0] * 16
