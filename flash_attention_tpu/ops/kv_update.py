"""In-place paged-KV token write (Pallas, aliased).

The decode step writes one token's K/V per sequence into its page slot.
Round 3 did this with gather/modify/scatter on the cache arrays
(``llama._scatter_token_kv``): correct, but inside the decode layer scan the
functional update forced XLA to materialize per-layer cache copies — at
8 layers / 2048 pages that is ~8 GB of pure copy traffic per decoded token,
and it measured as ~95% of the decode step wall-clock (the kernels
themselves are ~0.8 ms of bandwidth SOL).

This kernel updates the cache IN PLACE: ``input_output_aliases`` hands the
pallas_call the same HBM buffers for input and output, and the kernel does a
read-modify-write of exactly the touched (page_size, head_dim) page tiles —
2 * hk DMAs of one tile per sequence per direction, ~33 MB/step at the same
geometry instead of ~8 GB. The caller passes the WHOLE layer-stacked cache
and a traced ``layer`` index, so nothing is ever sliced out of the stack
(the companion change in ``ops.paged_attention`` reads the same 5D cache
directly).

Correctness of the RMW under duplicate targets: the scheduler's padded rows
all aim at the same trash page; the grid is sequential ("arbitrary"
semantics) and every step waits its write-back DMAs, so later rows see
earlier rows' writes — same semantics as the old scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kv_write_kernel(
    # scalar prefetch
    wpage_ref,   # (b,) int32 — physical page per sequence
    woff_ref,    # (b,) int32 — token offset within that page
    layer_ref,   # (1,) int32 — cache layer (dummy when not layered)
    kscale_ref,  # (b * hk,) f32 SMEM — per-head scales (dummy when not quant)
    vscale_ref,
    # inputs (aliased with the outputs; the kernel uses the out refs)
    _k_in, _v_in, _ks_in, _vs_in,
    kval_ref,    # (1, hk, d) VMEM — this token's K rows, already cache dtype
    vval_ref,
    # outputs (the cache buffers themselves)
    k_pages_ref, v_pages_ref, k_scales_ref, v_scales_ref,
    # scratch
    k_buf,       # (hk, page_size, d) VMEM
    v_buf,
    ks_buf,      # (hk, 8, 128) VMEM (dummy when not quantized)
    vs_buf,
    sems,        # DMA sems (4, hk)
    *,
    num_kv_heads: int,
    quantized: bool,
    layered: bool,
):
    b = pl.program_id(0)
    page = wpage_ref[b]
    off = woff_ref[b]

    def tile_copies(pages_ref, scales_ref, buf, sbuf, srow):
        pre = (layer_ref[0],) if layered else ()
        cs = []
        for h in range(num_kv_heads):
            cs.append(pltpu.make_async_copy(
                pages_ref.at[(*pre, h, page)], buf.at[h], sems.at[srow, h]))
        if quantized:
            for h in range(num_kv_heads):
                cs.append(pltpu.make_async_copy(
                    scales_ref.at[(*pre, h, page)], sbuf.at[h],
                    sems.at[srow + 1, h]))
        return cs

    def tile_copies_out(pages_ref, scales_ref, buf, sbuf, srow):
        pre = (layer_ref[0],) if layered else ()
        cs = []
        for h in range(num_kv_heads):
            cs.append(pltpu.make_async_copy(
                buf.at[h], pages_ref.at[(*pre, h, page)], sems.at[srow, h]))
        if quantized:
            for h in range(num_kv_heads):
                cs.append(pltpu.make_async_copy(
                    sbuf.at[h], scales_ref.at[(*pre, h, page)],
                    sems.at[srow + 1, h]))
        return cs

    k_in = tile_copies(k_pages_ref, k_scales_ref, k_buf, ks_buf, 0)
    v_in = tile_copies(v_pages_ref, v_scales_ref, v_buf, vs_buf, 2)
    for c in k_in + v_in:
        c.start()
    for c in k_in + v_in:
        c.wait()

    # overwrite sublane ``off`` of every head's page tile with this token
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, k_buf.shape[1], 1), 1)
    sel = sub == off
    k_buf[...] = jnp.where(sel, kval_ref[0][:, None, :], k_buf[...])
    v_buf[...] = jnp.where(sel, vval_ref[0][:, None, :], v_buf[...])
    if quantized:
        # scale tile (8, 128): lane t = token t's scale (all sublanes equal).
        # Per-head SMEM scalar broadcast — a (hk,) vector reshaped to
        # (hk, 1, 1) is a lane->sublane relayout Mosaic rejects
        # ("infer-vector-layout: unsupported shape cast").
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        lsel = lane == off
        for h in range(num_kv_heads):
            ks_buf[h] = jnp.where(lsel, kscale_ref[b * num_kv_heads + h],
                                  ks_buf[h])
            vs_buf[h] = jnp.where(lsel, vscale_ref[b * num_kv_heads + h],
                                  vs_buf[h])

    k_out = tile_copies_out(k_pages_ref, k_scales_ref, k_buf, ks_buf, 0)
    v_out = tile_copies_out(v_pages_ref, v_scales_ref, v_buf, vs_buf, 2)
    for c in k_out + v_out:
        c.start()
    # must complete before the next grid step: rows may share a target page
    # (the scheduler's dummy rows all aim at the trash page)
    for c in k_out + v_out:
        c.wait()


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0, 1, 2, 3))
def write_token_kv(
    k_pages,     # (hk, P, ps, d) or layer-stacked (L, hk, P, ps, d)
    v_pages,
    k_scales,    # (hk, P, 8, 128) f32 / (L, ...) or None
    v_scales,
    kval,        # (b, hk, d) in the cache dtype (pre-quantized if int8/fp8)
    vval,
    kscale,      # (b, hk) f32 or None
    vscale,
    wpage,       # (b,) int32
    woff,        # (b,) int32
    layer=None,  # int32 scalar when the cache is layer-stacked
    interpret: bool | None = None,
):
    """Write one token row per sequence into its page slot, in place.

    Returns (k_pages, v_pages, k_scales, v_scales) — the SAME buffers,
    updated (``input_output_aliases``; the jit donates them).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    layered = k_pages.ndim == 5
    if layered and layer is None:
        raise ValueError("a layer-stacked (5D) cache needs the layer index")
    hk, _, page_size, d = k_pages.shape[1:] if layered else k_pages.shape
    b = kval.shape[0]
    quantized = k_scales is not None
    if quantized:
        scale_buf = (hk, 8, 128)
    else:
        scale_buf = (1, 8, 128)
        k_scales = jnp.zeros((1, 1, 8, 128), jnp.float32)
        v_scales = k_scales
        kscale = jnp.zeros((b, hk), jnp.float32)
        vscale = kscale

    layer_arr = (jnp.zeros((1,), jnp.int32) if layer is None
                 else jnp.asarray(layer, jnp.int32).reshape(1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # k_pages (aliased)
            pl.BlockSpec(memory_space=pl.ANY),   # v_pages (aliased)
            pl.BlockSpec(memory_space=pl.ANY),   # k_scales (aliased)
            pl.BlockSpec(memory_space=pl.ANY),   # v_scales (aliased)
            pl.BlockSpec((1, hk, d), lambda b_, *_: (b_, 0, 0)),
            pl.BlockSpec((1, hk, d), lambda b_, *_: (b_, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((hk, page_size, d), k_pages.dtype),
            pltpu.VMEM((hk, page_size, d), v_pages.dtype),
            pltpu.VMEM(scale_buf, jnp.float32),
            pltpu.VMEM(scale_buf, jnp.float32),
            pltpu.SemaphoreType.DMA((4, hk)),
        ],
    )

    kernel = functools.partial(
        _kv_write_kernel, num_kv_heads=hk, quantized=quantized,
        layered=layered)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
            jax.ShapeDtypeStruct(k_scales.shape, k_scales.dtype),
            jax.ShapeDtypeStruct(v_scales.shape, v_scales.dtype),
        ],
        # inputs 5..8 are (k_pages, v_pages, k_scales, v_scales) counting the
        # 5 scalar-prefetch args first, mapped onto outputs 0..3
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        wpage.astype(jnp.int32), woff.astype(jnp.int32), layer_arr,
        kscale.astype(jnp.float32).reshape(-1),
        vscale.astype(jnp.float32).reshape(-1),
        k_pages, v_pages, k_scales, v_scales,
        kval, vval,
    )
    k_pages, v_pages, ks, vs = out
    if not quantized:
        return k_pages, v_pages, None, None
    return k_pages, v_pages, ks, vs
