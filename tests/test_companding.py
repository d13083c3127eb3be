"""G.711 companding: scalar g711.c oracle over the full int16 range,
codebook idempotence, sign symmetry, continuous mu roundtrip."""

import numpy as np
import pytest

from digital_signal_processsing_tpu.ops import companding as cp

BIAS, CLIP = 0x84, 32635


def _ulaw_enc_scalar(sample: int) -> int:
    sign = 0x80 if sample < 0 else 0x00
    if sample < 0:
        sample = -sample
    sample = min(sample, CLIP) + BIAS
    exponent = max((sample >> 7).bit_length() - 1, 0)
    mantissa = (sample >> (exponent + 3)) & 0x0F
    return ~(sign | (exponent << 4) | mantissa) & 0xFF


def _ulaw_dec_scalar(u: int) -> int:
    u = ~u & 0xFF
    e = (u >> 4) & 0x07
    m = u & 0x0F
    t = ((m << 3) + BIAS) << e
    return BIAS - t if (u & 0x80) else t - BIAS


_SEG_END = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)


def _alaw_enc_scalar(sample: int) -> int:
    pcm = sample >> 3
    if pcm >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        pcm = -pcm - 1
    seg = 8
    for i, end in enumerate(_SEG_END):
        if pcm <= end:
            seg = i
            break
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    aval |= (pcm >> 1) & 0xF if seg < 2 else (pcm >> seg) & 0xF
    return aval ^ mask


def _alaw_dec_scalar(a: int) -> int:
    a ^= 0x55
    t = (a & 0xF) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


ALL_INT16 = np.arange(-32768, 32768, dtype=np.int16)
ALL_BYTES = np.arange(256, dtype=np.uint8)


def test_mulaw_encode_matches_scalar_oracle_full_range():
    got = np.asarray(cp.mulaw_encode(ALL_INT16))
    ref = np.array([_ulaw_enc_scalar(int(s)) for s in ALL_INT16], np.uint8)
    np.testing.assert_array_equal(got, ref)


def test_mulaw_decode_matches_scalar_oracle_all_codes():
    got = np.asarray(cp.mulaw_decode(ALL_BYTES))
    ref = np.array([_ulaw_dec_scalar(int(c)) for c in ALL_BYTES], np.int16)
    np.testing.assert_array_equal(got, ref)


def test_alaw_encode_matches_scalar_oracle_full_range():
    got = np.asarray(cp.alaw_encode(ALL_INT16))
    ref = np.array([_alaw_enc_scalar(int(s)) for s in ALL_INT16], np.uint8)
    np.testing.assert_array_equal(got, ref)


def test_alaw_decode_matches_scalar_oracle_all_codes():
    got = np.asarray(cp.alaw_decode(ALL_BYTES))
    ref = np.array([_alaw_dec_scalar(int(c)) for c in ALL_BYTES], np.int16)
    np.testing.assert_array_equal(got, ref)


def test_mulaw_codebook_idempotence():
    # encode(decode(c)) == c for every code except 0x7F: mu-law's negative
    # zero decodes to 0, whose canonical encoding is 0xFF.
    codes = np.asarray(cp.mulaw_encode(cp.mulaw_decode(ALL_BYTES)))
    keep = ALL_BYTES != 0x7F
    np.testing.assert_array_equal(codes[keep], ALL_BYTES[keep])
    assert codes[0x7F] == 0xFF
    assert int(np.asarray(cp.mulaw_decode(np.uint8(0x7F)))) == 0


def test_alaw_codebook_idempotence():
    codes = np.asarray(cp.alaw_encode(cp.alaw_decode(ALL_BYTES)))
    np.testing.assert_array_equal(codes, ALL_BYTES)


def test_roundtrip_quantization_error_bounds():
    # decode(encode(x)) stays within the segment quantization step.
    for enc, dec, bound in [
        # measured spec maxima: mu 644 (top segment step 1024, biased
        # midpoint), A 512 (top 13-bit segment step 256 << 3, midpoint)
        (cp.mulaw_encode, cp.mulaw_decode, 644),
        (cp.alaw_encode, cp.alaw_decode, 512),
    ]:
        y = np.asarray(dec(enc(ALL_INT16))).astype(np.int32)
        err = np.abs(y - ALL_INT16.astype(np.int32))
        assert err.max() <= bound
    # Small signals quantize finely (mu segment 0: step 8).
    small = np.arange(-128, 128, dtype=np.int16)
    ymu = np.asarray(cp.mulaw_decode(cp.mulaw_encode(small))).astype(np.int32)
    assert np.abs(ymu - small).max() <= 8


def test_sign_symmetry():
    x = np.asarray([100, 1000, 10000, 30000], np.int16)
    dm = np.asarray(cp.mulaw_decode(cp.mulaw_encode(x))).astype(np.int32)
    dm_neg = np.asarray(cp.mulaw_decode(cp.mulaw_encode(-x))).astype(np.int32)
    np.testing.assert_array_equal(dm, -dm_neg)
    da = np.asarray(cp.alaw_decode(cp.alaw_encode(x))).astype(np.int32)
    da_neg = np.asarray(cp.alaw_decode(cp.alaw_encode(-x))).astype(np.int32)
    np.testing.assert_array_equal(da, -da_neg)


def test_decode_levels_monotone():
    # Positive mu codes 0xFF..0x80 decode to increasing magnitudes.
    pos = np.asarray(cp.mulaw_decode(np.arange(0xFF, 0x7F, -1, dtype=np.uint8)))
    assert (np.diff(pos.astype(np.int32)) > 0).all()
    pos_a = sorted(
        int(v) for v in np.asarray(cp.alaw_decode(ALL_BYTES)) if v > 0
    )
    assert len(set(pos_a)) == 128


def test_mu_compress_expand_roundtrip_and_validation():
    x = np.linspace(-1.0, 1.0, 1001).astype(np.float32)
    y = np.asarray(cp.mu_expand(cp.mu_compress(x)))
    np.testing.assert_allclose(y, x, atol=1e-6)
    # Compression boosts small amplitudes (log1p(2.55)/log1p(255) ~ 0.228).
    c = np.asarray(cp.mu_compress(np.float32(0.01)))
    assert abs(c - np.log1p(2.55) / np.log1p(255.0)) < 1e-6
    with pytest.raises(ValueError):
        cp.mu_compress(x, mu=0.0)
    with pytest.raises(ValueError):
        cp.mu_expand(x, mu=-1.0)


def test_jit_compatible():
    import jax

    f = jax.jit(lambda v: cp.mulaw_decode(cp.mulaw_encode(v)))
    g = jax.jit(lambda v: cp.alaw_decode(cp.alaw_encode(v)))
    x = ALL_INT16[::7]
    np.testing.assert_array_equal(
        np.asarray(f(x)), np.asarray(cp.mulaw_decode(cp.mulaw_encode(x)))
    )
    np.testing.assert_array_equal(
        np.asarray(g(x)), np.asarray(cp.alaw_decode(cp.alaw_encode(x)))
    )
