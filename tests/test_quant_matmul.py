"""Quantized weight-streaming matmul kernels (ops/quant_matmul.py).

CPU interpret-mode parity: the Pallas kernels must match the plain-XLA
dequant reference bit-for-bit in math structure (same convert, same
f32 accumulation, same scale placement); quantization error itself is
bounded separately against the exact f32 matmul.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from persian_rag_tpu.ops.quant_matmul import (
    _unpack_int4,
    dequant_matmul_int4_reference,
    dequant_matmul_reference,
    pick_block_n,
    quantize_weight,
    quantize_weight_int4,
    w4a16_matmul,
    w8a8_matmul,
    w8a16_matmul,
    w8a16_matmul_nt,
)


@pytest.fixture
def wx(rng):
    k, n, b = 256, 512, 5
    w = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, k)), jnp.bfloat16)
    return w, x


def test_quantize_weight_roundtrip_bound(rng):
    w = jnp.asarray(rng.normal(size=(128, 256)), jnp.float32)
    v, s = quantize_weight(w)
    assert v.dtype == jnp.int8 and s.shape == (1, 256)
    err = np.abs(np.asarray(v, np.float32) * np.asarray(s) - np.asarray(w))
    # symmetric round-to-nearest: error <= scale/2 per element
    assert (err <= np.asarray(s) / 2 + 1e-7).all()


def test_w8a16_matches_reference(wx):
    w, x = wx
    v, s = quantize_weight(w)
    out = w8a16_matmul(x, v, s, block_n=256)
    ref = dequant_matmul_reference(x, v, s)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=1e-5
    )


def test_w8a16_nt_matches_reference(wx):
    w, x = wx
    v, s = quantize_weight(w.T, axis=1)
    out = w8a16_matmul_nt(x, v, s, block_n=256)
    ref = dequant_matmul_reference(x, v, s)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=1e-5
    )


def test_w8a16_leading_dims(wx):
    w, x = wx
    v, s = quantize_weight(w)
    x3 = x.reshape(1, 5, -1)
    out3 = w8a16_matmul(x3, v, s, block_n=256)
    out2 = w8a16_matmul(x, v, s, block_n=256)
    assert out3.shape == (1, 5, w.shape[1])
    np.testing.assert_array_equal(
        np.asarray(out3).reshape(5, -1), np.asarray(out2)
    )


def test_w8a16_quant_error_vs_f32(wx):
    w, x = wx
    v, s = quantize_weight(w)
    out = np.asarray(w8a16_matmul(x, v, s, block_n=256))
    exact = np.asarray(x.astype(jnp.float32) @ w)
    rel = np.abs(out - exact).max() / np.abs(exact).max()
    assert rel < 0.02  # int8 per-channel + bf16 activations


def test_w8a8_close_to_w8a16(wx):
    w, x = wx
    v, s = quantize_weight(w)
    a16 = np.asarray(w8a16_matmul(x, v, s, block_n=256))
    a8 = np.asarray(w8a8_matmul(x, v, s, block_n=256))
    rel = np.abs(a8 - a16).max() / np.abs(a16).max()
    assert rel < 0.03  # adds one int8 activation rounding


def test_pick_block_n():
    # targets ~16 grid steps within the 2 MB block budget (chip sweep,
    # scripts/bench_quant_blocks.py)
    assert pick_block_n(128_256, 2048) == 768  # budget-capped divisor
    assert pick_block_n(16384, 2048) == 1024  # 16 steps
    assert pick_block_n(8192, 2048) == 512  # 16 steps
    assert pick_block_n(2048, 8192) == 128  # 16 steps (256 ran 0.55x)
    with pytest.raises(ValueError):
        pick_block_n(100, 2048)


def test_int4_pack_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    packed, scale = quantize_weight_int4(w)
    assert packed.shape == (128, 128) and packed.dtype == jnp.int8
    lo, hi = _unpack_int4(packed.astype(jnp.int32))
    wq = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32) * scale
    err = np.abs(np.asarray(wq) - np.asarray(w))
    # int4 symmetric round-to-nearest: error <= scale/2 per element
    assert (err <= np.asarray(scale) / 2 + 1e-6).all()
    assert int(jnp.max(jnp.abs(jnp.concatenate([lo, hi])))) <= 7


def test_w4a16_matches_reference(wx):
    w, x = wx
    packed, scale = quantize_weight_int4(w)
    out = w4a16_matmul(x, packed, scale, block_n=256)
    ref = dequant_matmul_int4_reference(x, packed, scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=1e-5
    )
    # per-channel int4 is rough by construction (~1/7.5 quant step
    # against weights spanning +-amax): document the error envelope
    exact = np.asarray(x.astype(jnp.float32) @ w)
    rel = np.abs(np.asarray(out) - exact).max() / np.abs(exact).max()
    assert rel < 0.35


def test_large_batch_falls_back_to_xla(rng):
    # prefill regime: >256 flattened rows must route to the XLA dequant
    # path (the kernel would hold the whole activation block in VMEM)
    w = jnp.asarray(rng.normal(size=(128, 256)), jnp.float32)
    v, s = quantize_weight(w)
    x = jnp.asarray(rng.normal(size=(300, 128)), jnp.bfloat16)
    out = w8a16_matmul(x, v, s)
    ref = dequant_matmul_reference(x, v, s)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_batch_one_and_odd_batches(wx):
    w, _ = wx
    v, s = quantize_weight(w)
    for b in (1, 3, 17):
        x = jnp.asarray(
            np.random.default_rng(b).normal(size=(b, w.shape[0])),
            jnp.bfloat16,
        )
        out = w8a16_matmul(x, v, s, block_n=256)
        ref = dequant_matmul_reference(x, v, s)
        assert out.shape == (b, w.shape[1])
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=1e-5
        )


@pytest.mark.slow
def test_w8a16_split_k_decode_shape(rng):
    """The split-K (n, k) accumulating grid serves every K>=8192 decode
    matvec by default (mlp_down of the 1B arch) — pin its parity at the
    production threshold shape, and that an explicit block_n overrides
    the schedule."""
    import jax.numpy as jnp

    from persian_rag_tpu.ops.quant_matmul import (
        _w8a16_2d_call,
        dequant_matmul_reference,
        quantize_weight,
        w8a16_matmul,
    )

    k, n = 8192, 2048
    w = (rng.standard_normal((k, n)) * 0.05).astype(np.float32)
    x = rng.standard_normal((2, k)).astype(np.float32)
    values, scale = quantize_weight(jnp.asarray(w))
    want = np.asarray(
        dequant_matmul_reference(
            jnp.asarray(x).astype(jnp.bfloat16), values, scale, nt=False
        )
    )
    got = np.asarray(
        _w8a16_2d_call(
            jnp.asarray(x), values, scale, block_n=1024, block_k=256,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-2)
    # dispatcher routes this shape through split-K (bn2=2048)
    got2 = np.asarray(
        w8a16_matmul(jnp.asarray(x), values, scale, interpret=True)
    )
    np.testing.assert_allclose(got2, want, rtol=2e-2, atol=1e-2)
    # explicit block_n is a schedule override: identical values via the
    # 1-D kernel
    got3 = np.asarray(
        w8a16_matmul(
            jnp.asarray(x), values, scale, block_n=256, interpret=True
        )
    )
    np.testing.assert_allclose(got3, want, rtol=2e-2, atol=1e-2)
