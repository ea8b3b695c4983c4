"""Quantization: weight-only INT8/INT4 matmul kernels and KV-cache quant.

The reference has no quantization (SURVEY.md §2); these are the serving-side
kernels the north star requires:

* ``QuantizedTensor`` — int payload + fp scales, the framework-wide carrier.
* ``quantize_int8`` / ``quantize_int4`` — symmetric per-channel (or
  per-group) weight quantization.
* ``quantized_matmul`` — Pallas kernel: bf16 activations x int8/int4 weights,
  dequantized in-register on the way into the MXU, per-channel scales folded
  into the fp32 output tile (exact — scales commute with the contraction).
* ``quantize_kv_pages`` — per-token symmetric int8 quantization of paged KV,
  layout-matched to ``ops.paged_attention`` (scales broadcast along lanes so
  the page DMA stays tiled).

INT4 is stored packed, two nibbles per int8 byte along the contraction axis;
the kernel sign-extends with shifts. This keeps HBM traffic at 0.5 B/weight
without relying on native int4 tiling support.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class QuantizedTensor(NamedTuple):
    """values: int8 payload (possibly nibble-packed), scales: fp32.

    For weights: logical shape (k, n); int8 -> values (k, n); int4 -> values
    (k // 2, n) with rows 2i (low nibble) and 2i+1 (high nibble) packed.
    scales: (n,) per output channel. ``bits`` is static pytree metadata.
    """

    values: jax.Array
    scales: jax.Array
    bits: int  # 8 or 4


# bits is static (selects the kernel's unpack path); keep it out of the traced
# leaves so QuantizedTensor can cross jit boundaries.
jax.tree_util.register_pytree_node(
    QuantizedTensor,
    lambda qt: ((qt.values, qt.scales), qt.bits),
    lambda bits, leaves: QuantizedTensor(leaves[0], leaves[1], bits),
)



from flash_attention_tpu.ops._mxu import matmul_precision as _precision


def quantize_int8(w, axis: int = 0) -> QuantizedTensor:
    """Symmetric per-channel int8 quantization; ``axis`` is the contraction
    (reduced) axis, scales live on the remaining axis."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QuantizedTensor(q, scale.squeeze(axis), 8)


def quantize_int4(w, axis: int = 0) -> QuantizedTensor:
    """Symmetric per-channel int4; packs pairs along ``axis`` into int8."""
    if axis != 0:
        raise NotImplementedError("int4 packing implemented for axis=0")
    k, n = w.shape
    if k % 2 != 0:
        raise ValueError("contraction dim must be even for int4 packing")
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int32)
    lo = q[0::2] & 0xF          # (k//2, n)
    hi = (q[1::2] & 0xF) << 4
    packed = (lo | hi).astype(jnp.int8)
    return QuantizedTensor(packed, scale.squeeze(0), 4)


def dequantize(qt: QuantizedTensor) -> jax.Array:
    """Reference (plain-JAX) dequantization to fp32."""
    if qt.bits == 8:
        return qt.values.astype(jnp.float32) * qt.scales[None, :]
    v = qt.values.astype(jnp.int32)
    lo = (v << 28) >> 28        # sign-extend low nibble
    hi = (v << 24) >> 28        # sign-extend high nibble
    k2, n = v.shape
    w = jnp.stack([lo, hi], axis=1).reshape(2 * k2, n)
    return w.astype(jnp.float32) * qt.scales[None, :]


def _qmm_kernel(x_ref, w_ref, scale_ref, o_ref, acc_ref, *, bits: int,
                block_k: int):
    """One (block_m, block_n) output tile; grid dim 2 walks the contraction."""

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # (bm, bk) activation dtype
    if bits == 8:
        w = w_ref[...].astype(x.dtype)  # (bk, bn)
    else:
        v = w_ref[...].astype(jnp.int32)            # (bk//2, bn) packed
        lo = (v << 28) >> 28
        hi = (v << 24) >> 28
        w = jnp.concatenate([lo, hi], axis=1)        # (bk//2, 2*bn)
        # rows 2i, 2i+1 were packed into row i: restore (bk, bn) order
        w = w.reshape(v.shape[0], 2, v.shape[1]).reshape(2 * v.shape[0],
                                                         v.shape[1])
        w = w.astype(x.dtype)
    acc_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_precision(x.dtype),
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _store():
        scale = scale_ref[...]  # (8, bn) broadcast sublanes; row 0 used
        o_ref[...] = (acc_ref[...] * scale[:1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "interpret", "out_dtype"))
def quantized_matmul(
    x,                   # (m, k) bf16/f32 activations
    w: QuantizedTensor,  # logical (k, n)
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=None,
    interpret: bool | None = None,
):
    """y = x @ dequant(w): weight-only quantized matmul.

    Per-channel scales are applied to the fp32 accumulator tile, which is
    exact: sum_k x_k (q_kn s_n) == (sum_k x_k q_kn) s_n.
    """
    if interpret is None:
        interpret = jax.default_backend() == 'cpu'
    m, k = x.shape
    n = w.scales.shape[0]
    out_dtype = out_dtype or x.dtype
    pack = 1 if w.bits == 8 else 2
    block_m = min(block_m, _round_up(m, 8))

    # Real model dims are rarely divisible by the requested 512 (Llama-2-7B:
    # hidden 11008 = 128*86, vocab 32000 = 128*250 — the reference keeps shape
    # generality in host dispatch, flash_api.cpp:178-183). Snap each block to
    # the largest 128-multiple divisor <= requested; only if no such divisor
    # exists (dim not a multiple of 128) fall back to zero-padding the
    # operands, which is exact for the contraction (0 * q == 0) and sliced
    # away on the n axis.
    values, scales = w.values, w.scales
    block_k = _pick_block(k, block_k, 128)
    if block_k == 0:
        kp = _round_up(k, 128)
        x = jnp.pad(x, ((0, 0), (0, kp - k)))
        values = jnp.pad(values, ((0, (kp - k) // pack), (0, 0)))
        k, block_k = kp, _pick_block(kp, 512, 128)
    if w.bits == 4:
        # Mosaic rejects the int4 nibble-unpack reshape
        # (bk//2, 2*bn) -> (bk//2, 2, bn) -> (bk, bn) for non-pow2 block_k
        # ("infer-vector-layout: unsupported shape cast"; 384 fails,
        # 128/256/512 compile). Pad k to a 128-multiple if needed, then take
        # the largest pow2 block in {512, 256, 128} that divides k — 128
        # always qualifies once k is a 128-multiple.
        if k % 128:
            kp = _round_up(k, 128)
            x = jnp.pad(x, ((0, 0), (0, kp - k)))
            values = jnp.pad(values, ((0, (kp - k) // pack), (0, 0)))
            k = kp
        block_k = 512
        while k % block_k:
            block_k >>= 1
        block_k = min(block_k, k)
    n_logical = n
    block_n = _pick_block(n, block_n, 128)
    if w.bits == 4 and n % 128:
        # The int4 nibble-unpack reshape needs lane-aligned tiles: Mosaic
        # rejects e.g. (64, 400) -> (128, 200) ("unsupported shape cast")
        # when n is not a 128-multiple. Take the zero-pad path. (int8 has no
        # reshape and handles ragged n fine.)
        block_n = 0
    if block_n == 0:
        np_ = _round_up(n, 128)
        values = jnp.pad(values, ((0, 0), (0, np_ - n)))
        scales = jnp.pad(scales, ((0, np_ - n),), constant_values=1.0)
        n = np_
        block_n = _pick_block(n, 512, 128)
    mp = _round_up(m, block_m)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))

    scales8 = jnp.broadcast_to(scales.astype(jnp.float32)[None, :], (8, n))

    y = pl.pallas_call(
        functools.partial(_qmm_kernel, bits=w.bits, block_k=block_k),
        grid=(mp // block_m, n // block_n, k // block_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k // pack, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((8, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * x.dtype.itemsize + k * n // pack + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, values, scales8)
    return y[:m, :n_logical] if n_logical != n else y[:m]


def quantize_kv_pages(pages, dtype=jnp.int8):
    """Per-token symmetric quantization of KV pages to int8 or fp8 (e4m3).

    pages: (num_kv_heads, total_pages, page_size<=128, head_dim) float.
    Returns (values in ``dtype`` same shape, scales (hk, pages, 8, 128) f32):
    per page, ONE (8, 128) tile — the smallest slice Mosaic DMAs — whose lane
    t holds token t's scale (broadcast over the 8 sublanes). The paged kernel
    folds these into the score/probability tiles rather than dequantizing
    K/V (see ops.paged_attention).
    """
    hk, P, ps, _ = pages.shape
    p = pages.astype(jnp.float32)
    amax = jnp.max(jnp.abs(p), axis=-1, keepdims=True)
    if dtype == jnp.int8:
        scale = jnp.maximum(amax / 127.0, 1e-8)
        q = jnp.clip(jnp.round(p / scale), -127, 127).astype(jnp.int8)
    elif dtype == jnp.float8_e4m3fn:
        scale = jnp.maximum(amax / 448.0, 1e-8)  # e4m3 max finite
        q = (p / scale).astype(jnp.float8_e4m3fn)
    else:
        raise ValueError(f"unsupported KV quant dtype {dtype}")
    lanes = jnp.pad(scale[..., 0], ((0, 0), (0, 0), (0, 128 - ps)),
                    constant_values=1.0)          # (hk, P, 128)
    scales = jnp.broadcast_to(lanes[:, :, None, :], (hk, P, 8, 128))
    return q, scales


def _round_up(a: int, b: int) -> int:
    return ((a + b - 1) // b) * b


def _pick_block(dim: int, requested: int, mult: int) -> int:
    """Largest multiple of ``mult`` that divides ``dim`` and is <= requested;
    ``dim`` itself if it fits inside one block; 0 if no such divisor exists."""
    if dim <= requested:
        return dim
    b = (requested // mult) * mult
    while b >= mult:
        if dim % b == 0:
            return b
        b -= mult
    return 0
