"""Quantized weight-streaming matmuls for decode serving (Pallas).

Parity anchor: the reference serves a *quantized* GGUF export of its
fine-tuned Llama through llama.cpp (notebooks cell 7 exports
``q8_0``/``q4_k_m``; served at /root/reference/src/llama_client.py:10)
— quantized weight serving is part of the component envelope, not just
an optimization.

Why Pallas and not plain XLA: batch-1 decode on this chip is
weight-stream-bound (~520 GB/s effective across the whole step,
DESIGN.md round-3). Storing weights int8 halves the HBM bytes per
step, but XLA's convert-in-dot halves the achieved byte rate
(scripts/bench_int8_matvec.py: the 525 MB lm_head streams 401-413 GB/s
as bf16 but only 231-282 GB/s as int8 -> net 1.15x). These kernels
stream int8 tiles into VMEM at full DMA rate and dequantize on-core,
so the stream stays at the bf16 path's byte rate while moving half the
bytes.

Layouts:

* ``w8a16_matmul``   — w stored (K, N) int8, per-output-channel f32
  scale (1, N); x bf16; dequant int8->bf16 in VMEM, bf16 MXU dot,
  scale folded into the f32 accumulator once per output element.
* ``w8a16_matmul_nt``— w stored (N, K) int8 (row-major by output), for
  the tied lm_head: the SAME (V, H) int8 table serves the embedding
  gather and the logits matmul, so quantized serving does not store a
  second transposed copy of the half-GB vocab matrix.
* ``w8a8_matmul``    — activations quantized per-row on the fly
  (symmetric, dynamic), int8 x int8 -> int32 on the native int8 MXU
  (no VPU convert at all); scales applied to the int32 accumulator.

All wrappers pad the batch dim to the dtype sublane minimum (bf16: 16,
int8: 32) and slice back. Output dims must be 128-aligned for the
kernels (pick_block_n chooses a dividing block); anything else — and
any activation batch over 256 flattened rows (prefill regime) — routes
to the XLA convert-in-dot reference, which handles all shapes.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = [
    "quantize_weight",
    "quantize_weight_int4",
    "w8a16_matmul",
    "w8a16_matmul_nt",
    "w8a8_matmul",
    "w4a16_matmul",
    "dequant_matmul_reference",
    "dequant_matmul_int4_reference",
    "pick_block_n",
]


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def quantize_weight(
    w: jnp.ndarray, axis: int = 0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization.

    ``axis`` is the REDUCTION axis of the matmul (the one whose error
    averages out); the scale is per element of the other axis. For a
    (K, N) kernel pass axis=0 -> scale (1, N); for a (V, H) embedding
    table pass axis=1 -> scale (V, 1).
    """
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    values = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return values, scale


def pick_block_n(n: int, k: int, vmem_budget: int = 2 * 1024 * 1024) -> int:
    """block_n targeting ~16 grid steps within a 2 MB int8 block budget.

    Chip sweep (scripts/bench_quant_blocks.py, v5e): winners share grid
    depth ~16 with 1-2 MB blocks — (K=8192, N=2048) runs 271 GB/s at
    bn=128 (16 steps) vs 151 at bn=256 (8 steps) and 60 at bn=512 (4
    steps: too few steps to hide DMA latency behind compute); (K=2048,
    N=16384) runs 404 GB/s at bn=1024 (16 steps) vs 267 at bn=512 (32
    steps: per-step overhead). Blocks over the budget VMEM-OOM at
    pallas_call runtime."""
    target = max(128, n // 16)
    best = None
    for bn in range(128, n + 1, 128):
        if n % bn or k * bn > vmem_budget:
            continue
        if best is None or abs(bn - target) < abs(best - target) or (
            abs(bn - target) == abs(best - target) and bn > best
        ):
            best = bn
    if best is None:
        raise ValueError(
            f"n={n} must be a multiple of 128 with a block fitting "
            f"{vmem_budget} bytes at k={k}"
        )
    return best


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _w8a16_kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[...].astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)
    o_ref[...] = acc * s_ref[...]


def _w8a16_nt_kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[...].astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        x_ref[...],
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = acc * s_ref[...]


def _w8a8_kernel(x_ref, w_ref, s_ref, o_ref):
    acc = jnp.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.int32
    )
    o_ref[...] = acc.astype(jnp.float32) * s_ref[...]


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("block_n", "interpret")
)
def _w8a16_call(x, values, scale, *, block_n: int, interpret: bool):
    b, k = x.shape
    n = values.shape[1]
    b_pad = max(16, _round_up(b, 16))
    x = jnp.pad(x.astype(jnp.bfloat16), ((0, b_pad - b), (0, 0)))
    grid = (n // block_n,)
    out = pl.pallas_call(
        _w8a16_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, k), lambda i: (0, 0)),
            pl.BlockSpec((k, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((b_pad, block_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b_pad, n), jnp.float32),
        interpret=interpret,
    )(x, values, scale)
    return out[:b]


@functools.partial(
    jax.jit, static_argnames=("block_n", "interpret")
)
def _w8a16_nt_call(x, values, scale, *, block_n: int, interpret: bool):
    b, k = x.shape
    n = values.shape[0]
    b_pad = max(16, _round_up(b, 16))
    x = jnp.pad(x.astype(jnp.bfloat16), ((0, b_pad - b), (0, 0)))
    grid = (n // block_n,)
    out = pl.pallas_call(
        _w8a16_nt_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, k), lambda i: (0, 0)),
            pl.BlockSpec((block_n, k), lambda i: (i, 0)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((b_pad, block_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b_pad, n), jnp.float32),
        interpret=interpret,
    )(x, values, scale)
    return out[:b]


@functools.partial(
    jax.jit, static_argnames=("block_n", "interpret")
)
def _w8a8_call(x_q, x_scale, values, scale, *, block_n: int, interpret: bool):
    b, k = x_q.shape
    n = values.shape[1]
    b_pad = max(32, _round_up(b, 32))
    x_q = jnp.pad(x_q, ((0, b_pad - b), (0, 0)))
    grid = (n // block_n,)
    out = pl.pallas_call(
        _w8a8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, k), lambda i: (0, 0)),
            pl.BlockSpec((k, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((b_pad, block_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b_pad, n), jnp.float32),
        interpret=interpret,
    )(x_q, values, scale)
    return out[:b] * x_scale


def _flatten_leading(x):
    lead = x.shape[:-1]
    return x.reshape(-1, x.shape[-1]), lead


# Above this many flattened rows the wrappers fall back to the XLA
# convert-in-dot path: the whole (B_pad, K) activation block lives in
# VMEM alongside the weight blocks (a 1024-row bf16 block at K=8192 is
# 16 MB — the whole VMEM), and at large B the matmul is MXU-bound, so
# streaming int8 weights faster buys nothing (prefill regime).
_MAX_KERNEL_ROWS = 256

# Split-K 2-D grid policy for K-large decode matvecs: the 1-D grid's
# (K, bn) blocks force small bn at K=8192 (vmem budget), leaving too
# few lanes per step — isolated-op probe measured mlp_down (8192,
# 2048) at 424 us (1-D, bn=128) vs 342 us (2-D, bn=2048 x bk=256).
# >0 enables the accumulating (n, k) grid for K >= the threshold.
# Default on at 8192 after the whole-decode-step A/B (the decisive
# measurement — isolated per-op times are dominated by a ~250 us
# dispatch floor); set PRAG_W8A16_SPLIT_K=0 to disable.
W8A16_SPLIT_K = int(os.environ.get("PRAG_W8A16_SPLIT_K", "8192"))


def _w8a16_2d_kernel(x_ref, w_ref, s_ref, o_ref, *, n_k: int):
    kk = pl.program_id(1)
    acc = jnp.dot(
        x_ref[...], w_ref[...].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kk == 0)
    def _init():
        o_ref[...] = acc

    @pl.when(kk > 0)
    def _acc():
        o_ref[...] += acc

    @pl.when(kk == n_k - 1)
    def _scale():
        o_ref[...] *= s_ref[...]


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_k", "interpret")
)
def _w8a16_2d_call(
    x, values, scale, *, block_n: int, block_k: int, interpret: bool
):
    b, k = x.shape
    n = values.shape[1]
    b_pad = max(16, _round_up(b, 16))
    x = jnp.pad(x.astype(jnp.bfloat16), ((0, b_pad - b), (0, 0)))
    grid = (n // block_n, k // block_k)
    out = pl.pallas_call(
        functools.partial(_w8a16_2d_kernel, n_k=grid[1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, block_k), lambda i, j: (0, j)),
            pl.BlockSpec((block_k, block_n), lambda i, j: (j, i)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec((b_pad, block_n), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b_pad, n), jnp.float32),
        interpret=interpret,
    )(x, values, scale)
    return out[:b]


def w8a16_matmul(
    x: jnp.ndarray,
    values: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """x (..., K) bf16 @ dequant(values (K, N) int8, scale (1, N)) -> f32."""
    x2, lead = _flatten_leading(x)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if x2.shape[0] > _MAX_KERNEL_ROWS or values.shape[1] % 128:
        # prefill regime / non-128-aligned output dims (arbitrary HF
        # configs): XLA convert-in-dot handles any shape
        return dequant_matmul_reference(x, values, scale, nt=False)
    k, n = values.shape
    if (
        W8A16_SPLIT_K
        and block_n is None  # an explicit block_n is a schedule override
        and k >= W8A16_SPLIT_K
        and n % 1024 == 0
        and k % 256 == 0
    ):
        bn2 = 2048 if n % 2048 == 0 else 1024
        out = _w8a16_2d_call(
            x2, values, scale, block_n=bn2, block_k=256,
            interpret=interpret,
        )
        return out.reshape(*lead, n)
    if block_n is None:
        block_n = pick_block_n(values.shape[1], values.shape[0])
    assert values.shape[1] % block_n == 0
    out = _w8a16_call(
        x2, values, scale, block_n=block_n, interpret=interpret
    )
    return out.reshape(*lead, values.shape[1])


def w8a16_matmul_nt(
    x: jnp.ndarray,
    values: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """x (..., K) @ dequant(values (N, K) int8, scale (N, 1)).T -> f32.

    The (N, K) row-major-by-output layout lets the tied lm_head reuse
    the embedding's int8 table without a transposed copy."""
    x2, lead = _flatten_leading(x)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if x2.shape[0] > _MAX_KERNEL_ROWS or values.shape[0] % 128:
        return dequant_matmul_reference(x, values, scale, nt=True)
    if block_n is None:
        block_n = pick_block_n(values.shape[0], values.shape[1])
    assert values.shape[0] % block_n == 0
    out = _w8a16_nt_call(
        x2, values, scale.reshape(1, -1),
        block_n=block_n, interpret=interpret,
    )
    return out.reshape(*lead, values.shape[0])


def w8a8_matmul(
    x: jnp.ndarray,
    values: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Dynamic per-row activation quantization + int8 MXU matmul.

    out = (q(x) @ values) * x_scale * scale, accumulated int32 on the
    MXU. Skips the in-kernel VPU convert entirely; activation
    quantization adds one cheap (B, K) pass outside the kernel.
    """
    x2, lead = _flatten_leading(x)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if x2.shape[0] > _MAX_KERNEL_ROWS:
        return dequant_matmul_reference(x, values, scale, nt=False)
    if block_n is None:
        block_n = pick_block_n(values.shape[1], values.shape[0])
    xf = x2.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    out = _w8a8_call(
        x_q, x_scale, values, scale, block_n=block_n, interpret=interpret
    )
    return out.reshape(*lead, values.shape[1])


def quantize_weight_int4(
    w: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int4, K-half nibble packing.

    q in [-7, 7]; packed (K/2, N) int8 holds orig row i in the LOW
    nibble and row i + K/2 in the HIGH nibble, so the kernel computes
    dot(x[:, :K/2], lo) + dot(x[:, K/2:], hi) — two half-K MXU passes,
    no interleave/relayout of the unpacked tiles.
    """
    w = jnp.asarray(w, jnp.float32)
    k = w.shape[0]
    assert k % 2 == 0
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int32)
    lo = q[: k // 2] & 0xF
    hi = q[k // 2 :] & 0xF
    packed = jax.lax.bitcast_convert_type(
        (lo | (hi << 4)).astype(jnp.uint8), jnp.int8
    )
    return packed, scale


def _unpack_int4(w32):
    """int32 sign-extended nibbles from packed bytes (already int32)."""
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(w32, 28), jnp.int32(28)
    )
    hi = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(w32, 24), jnp.int32(28)
    )
    return lo, hi


def _w4a16_kernel(x_ref, w_ref, s_ref, o_ref):
    w32 = w_ref[...].astype(jnp.int32)
    lo, hi = _unpack_int4(w32)
    kh = x_ref.shape[1] // 2
    acc = jnp.dot(
        x_ref[:, :kh], lo.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    acc += jnp.dot(
        x_ref[:, kh:], hi.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = acc * s_ref[...]


@functools.partial(
    jax.jit, static_argnames=("block_n", "interpret")
)
def _w4a16_call(x, packed, scale, *, block_n: int, interpret: bool):
    b, k = x.shape
    n = packed.shape[1]
    b_pad = max(16, _round_up(b, 16))
    x = jnp.pad(x.astype(jnp.bfloat16), ((0, b_pad - b), (0, 0)))
    grid = (n // block_n,)
    out = pl.pallas_call(
        _w4a16_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, k), lambda i: (0, 0)),
            pl.BlockSpec((k // 2, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((b_pad, block_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b_pad, n), jnp.float32),
        interpret=interpret,
    )(x, packed, scale)
    return out[:b]


def w4a16_matmul(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """x (..., K) @ dequant-int4(packed (K/2, N), scale (1, N)) -> f32."""
    x2, lead = _flatten_leading(x)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = packed.shape[1]
    if x2.shape[0] > _MAX_KERNEL_ROWS or n % 128:
        return dequant_matmul_int4_reference(x, packed, scale)
    if block_n is None:
        block_n = pick_block_n(n, packed.shape[0])
    assert n % block_n == 0
    out = _w4a16_call(x2, packed, scale, block_n=block_n,
                      interpret=interpret)
    return out.reshape(*lead, n)


def dequant_matmul_int4_reference(
    x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray
) -> jnp.ndarray:
    """Plain-XLA W4A16 reference: identical unpack + dot math."""
    w32 = packed.astype(jnp.int32)
    lo, hi = _unpack_int4(w32)
    w = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return acc * scale


def dequant_matmul_reference(
    x: jnp.ndarray,
    values: jnp.ndarray,
    scale: jnp.ndarray,
    nt: Optional[bool] = None,
) -> jnp.ndarray:
    """Plain-XLA W8A16 reference: bitwise-comparable math to the Pallas
    kernel (int8 -> bf16 convert, bf16 dot with f32 accumulation,
    per-channel scale on the accumulator). values (K, N), or (N, K)
    with nt=True (inferred from shapes when unambiguous — pass nt
    explicitly for square matrices)."""
    if nt is None:
        assert values.shape[0] != values.shape[1], (
            "square quantized matrix: pass nt= explicitly"
        )
        nt = values.shape[0] != x.shape[-1]
    w = values.astype(jnp.bfloat16)
    if not nt:
        acc = jax.lax.dot_general(
            x.astype(jnp.bfloat16), w,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc * scale
    acc = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return acc * scale.reshape(1, -1)
