"""Native C++ codec vs NumPy codec equivalence (bit-exact)."""

import numpy as np
import pytest

from audio_fir_filter_tpu.native import pcm_codec


@pytest.fixture(scope="module")
def native():
    n = pcm_codec.load()
    if n is None:
        pytest.skip("native codec unavailable (no g++?)")
    return n


@pytest.mark.parametrize("bits", [16, 24])
@pytest.mark.parametrize("be", [False, True])
def test_decode_matches_numpy(native, bits, be):
    from audio_fir_filter_tpu.audio import codec as pycodec

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=3 * 4 * 1000, dtype=np.uint8)
    raw = raw[: (raw.size // (bits // 8)) * (bits // 8)]
    got = native.decode(raw, bits, be)
    if bits == 16:
        want = raw.view(">i2" if be else "<i2").astype(np.float32) / np.float32(32768)
    else:
        want = pycodec._unpack24(raw, be).astype(np.float32) * np.float32(1 / 8388608)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bits", [16, 24])
@pytest.mark.parametrize("be", [False, True])
def test_encode_matches_numpy(native, bits, be):
    from audio_fir_filter_tpu.audio import codec as pycodec

    rng = np.random.default_rng(1)
    x = rng.uniform(-1.2, 1.2, 5000).astype(np.float32)  # include clipping range
    # exact half-LSB values to exercise round-half-even
    x[:4] = np.array([0.5 / 32768, 1.5 / 32768, -0.5 / 32768, 2.5 / 32768])
    got = native.encode(x, bits, be)
    full = float(1 << (bits - 1))
    v = np.clip(np.rint(x.astype(np.float64) * full), -full, full - 1)
    if bits == 16:
        want = v.astype(">i2" if be else "<i2").tobytes()
    else:
        want = pycodec._pack24(v.astype(np.int32), be).tobytes()
    assert got == want


def test_peak(native):
    x = np.array([0.1, -0.9, 0.5], np.float32)
    assert native.peak(x) == np.float32(0.9)
