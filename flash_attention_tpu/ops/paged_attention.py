"""Paged-attention decode kernel (Pallas / TPU).

The serving-side complement of the training kernels: one new query token per
sequence attends to a KV cache stored in non-contiguous fixed-size pages
scattered across HBM (virtual memory for KV). The reference kernel library
has no serving path at all (SURVEY.md §2.3); this is the TPU-native design:

* K/V pages live in HBM (``memory_space=pltpu.ANY``); the kernel gathers the
  pages a sequence actually owns with one async DMA per page, all in flight
  concurrently, double-buffered so the next compute block's pages load while
  the current block computes.
* Page indices and sequence lengths are scalar-prefetched
  (``pltpu.PrefetchScalarGridSpec``) so DMA source addresses are known before
  the kernel body runs.
* GQA is the natural layout: grid cell = (batch, kv_head); the q heads of the
  group form the MXU's M dimension.
* Online softmax over compute blocks, identical math to the training forward
  (flash_fwd.py), with per-sequence length masking.
* Optionally the KV pages are int8-quantized with per-token scales, packed
  as the lanes of one (8, 128) tile per page (the smallest slice Mosaic will
  DMA). The scales are NOT applied to the K/V tiles: they fold into the
  online softmax — ``s *= kscale[token]`` after the QK matmul and
  ``p *= vscale[token]`` before the PV matmul — so dequantization costs two
  (group, block) lane-aligned multiplies instead of a (block, head_dim)
  tile pass, and page bandwidth drops ~1.9x vs bf16. Requires
  page_size == 128 (scale lane == token-in-page).

Every scheduled sequence must have length >= 1 (pad empty batch slots with a
dummy length-1 sequence); the double-buffer prefetch chain relies on block 0
of every (batch, kv_head) cell being live.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_tpu.ops._mxu import matmul_precision as _precision

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


class MultiPageCopy:
    """One async DMA per (non-contiguous) page into a VMEM slot buffer.

    ``prefix`` is the tuple of leading indices ahead of the page axis:
    ``(kv_head,)`` for a (hk, P, ps, d) cache, ``(layer, kv_head)`` for the
    layer-stacked (L, hk, P, ps, d) cache the decode scan passes whole."""

    def __init__(self, pages_hbm_ref, vmem_buf, sem, page_indices_ref,
                 start, num_pages: int, prefix: tuple):
        self._copies = [
            pltpu.make_async_copy(
                pages_hbm_ref.at[(*prefix, page_indices_ref[start + i])],
                vmem_buf.at[i],
                sem,
            )
            for i in range(num_pages)
        ]

    def start(self):
        for c in self._copies:
            c.start()

    def wait(self):
        for c in self._copies:
            c.wait()


def _paged_attn_kernel(
    # scalar prefetch
    lengths_ref,        # (b,) int32
    page_indices_ref,   # (b * pages_per_seq,) int32
    layer_ref,          # (1,) int32 — cache layer when layered, else dummy
    # inputs
    q_ref,              # (1, 1, group, head_dim) VMEM block
    k_pages_ref,        # (hk, total_pages, page_size, d) HBM
    k_scales_ref,       # (hk, total_pages, page_size, d or 128) HBM (maybe dummy)
    v_pages_ref,
    v_scales_ref,
    # outputs
    o_ref,              # (1, 1, group, head_dim) VMEM block
    # scratch
    buffer_index_ref,   # (1,) int32 SMEM
    m_scr,              # (group, 128) f32
    l_scr,
    acc_scr,            # (group, head_dim) f32
    k_buf,              # (2, pages_per_block, page_size, d) VMEM
    v_buf,
    k_scale_buf,        # (2, pages_per_block, page_size, s) VMEM (maybe dummy)
    v_scale_buf,
    k_sems,             # DMA sem (2,) — one per buffer slot
    v_sems,
    *,
    batch_size: int,
    pages_per_seq: int,
    pages_per_block: int,
    page_size: int,
    sm_scale: float,
    quantized: bool,
    window: int | None,
    softcap: float | None,
    layered: bool,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)
    num_blocks = pl.num_programs(2)
    num_kv_heads = pl.num_programs(1)
    bk = pages_per_block * page_size
    length = lengths_ref[b]

    def win_start(blen):
        """First live key position under the sliding window: the decode
        query sits at position blen - 1 and sees the last ``window`` tokens
        (itself included). None = dense decode, start 0."""
        if window is None:
            return jnp.int32(0)
        return jnp.maximum(blen - window, 0)

    # first live compute block of a (b, h) cell; always < ceil(length / bk)
    # because win_start < length, so every cell still has >= 1 live block
    lo_block = win_start(length) // bk

    def copies(b_, h_, i_, slot):
        start = b_ * pages_per_seq + i_ * pages_per_block
        pre = (layer_ref[0], h_) if layered else (h_,)
        cs = [
            MultiPageCopy(k_pages_ref, k_buf.at[slot], k_sems.at[slot],
                          page_indices_ref, start, pages_per_block, pre),
            MultiPageCopy(v_pages_ref, v_buf.at[slot], v_sems.at[slot],
                          page_indices_ref, start, pages_per_block, pre),
        ]
        if quantized:
            cs.append(MultiPageCopy(k_scales_ref, k_scale_buf.at[slot],
                                    k_sems.at[slot], page_indices_ref, start,
                                    pages_per_block, pre))
            cs.append(MultiPageCopy(v_scales_ref, v_scale_buf.at[slot],
                                    k_sems.at[slot], page_indices_ref, start,
                                    pages_per_block, pre))
        return cs

    def next_live_block(b_, h_, i_):
        """Grid coords of the next block that computes. Each (b, h) cell's
        live blocks are contiguous in [win_start // bk, ceil(length / bk)):
        dense decode starts at 0 (length >= 1 keeps block 0 live), sliding
        window starts at the block holding the window's first key. One hop
        to the next cell's first live block therefore suffices. Returns
        b == batch_size when the grid ends."""
        blen_cur = lengths_ref[b_]
        i_n = i_ + 1
        # past this cell's last live block (or the grid edge) -> next cell
        cell_done = (i_n == num_blocks) | (i_n * bk >= blen_cur)
        h_n = jnp.where(cell_done, h_ + 1, h_)
        b_n = jnp.where(h_n == num_kv_heads, b_ + 1, b_)
        h_n = jnp.where(h_n == num_kv_heads, 0, h_n)
        blen_next = lengths_ref[jnp.minimum(b_n, batch_size - 1)]
        i_n = jnp.where(cell_done, win_start(blen_next) // bk, i_n)
        return b_n, h_n, i_n

    @pl.when((i >= lo_block) & (i * bk < length))
    def _run():
        # ---- init accumulators on the first live block of this (b, h) ----
        @pl.when(i == lo_block)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        # ---- warm-up: the very first live block starts its own DMA ----
        is_first = (b == 0) & (h == 0) & (i == lo_block)

        @pl.when(is_first)
        def _first():
            buffer_index_ref[0] = 0
            for c in copies(b, h, i, 0):
                c.start()

        slot = buffer_index_ref[0]

        # ---- prefetch the next live block into the other slot ----
        b_n, h_n, i_n = next_live_block(b, h, i)

        @pl.when(b_n < batch_size)
        def _prefetch():
            nxt = 1 - slot
            bc = jnp.minimum(b_n, batch_size - 1)
            for c in copies(bc, h_n, i_n, nxt):
                c.start()

        buffer_index_ref[0] = jnp.where(b_n < batch_size, 1 - slot, slot)

        # ---- wait for this block's pages ----
        for c in copies(b, h, i, slot):
            c.wait()

        k = k_buf[slot].reshape(bk, -1)
        v = v_buf[slot].reshape(bk, -1)
        if quantized:
            # int8 payloads are exact in bf16; scales fold into s/p below
            k = k.astype(q_ref.dtype)
            v = v.astype(q_ref.dtype)

        q = q_ref[0, 0]  # (group, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_precision(q.dtype),
        ) * sm_scale  # (group, bk)
        if quantized:
            # scale tile (ppb, 8, 128): sublane 0, lane t = scale of token t
            # of page ppb — a free relayout to a (bk,) lane vector, applied
            # as a row-broadcast multiply on the score tile
            ks = k_scale_buf[slot][:, 0, :].reshape(bk).astype(jnp.float32)
            s = s * ks[None, :]
        if softcap is not None:
            # logit soft-capping (Gemma-2), applied to the FULL logit — i.e.
            # after the fused per-token k-scales — and before masking, so
            # MASK_VALUE still dominates the capped (-softcap, softcap) range
            s = softcap * jnp.tanh(s * (1.0 / softcap))

        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        live = i * bk + col < length
        if window is not None:
            live &= i * bk + col >= win_start(length)
        s = jnp.where(live, s, MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev[:, :1], m_curr)
        alpha = jnp.exp(m_prev[:, :1] - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

        if quantized:
            vs = v_scale_buf[slot][:, 0, :].reshape(bk).astype(jnp.float32)
            p = p * vs[None, :]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_precision(v.dtype),
        )
        acc_scr[...] = acc_scr[...] * alpha + pv

        # ---- epilogue on the last live block of this (b, h) ----
        is_last = (i + 1) * bk >= length

        @pl.when(is_last)
        def _store():
            l = l_scr[:, :1]
            inv = jnp.where(l > 0.0, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)
            o_ref[0, 0] = (acc_scr[...] * inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "pages_per_block", "window", "softcap",
                     "interpret"),
)
def paged_attention(
    q,              # (b, num_q_heads, head_dim)
    k_pages,        # (num_kv_heads, total_pages, page_size, head_dim)
    v_pages,
    lengths,        # (b,) int32 — current length of each sequence (>= 1)
    page_indices,   # (b, pages_per_seq) int32
    *,
    k_scales=None,  # (num_kv_heads, total_pages, 8, 128) f32: lane = token
    v_scales=None,
    sm_scale: float | None = None,
    pages_per_block: int = 8,
    window: int | None = None,
    softcap: float | None = None,
    interpret: bool | None = None,
    layer=None,     # int32 scalar: cache layer when k_pages is 5D
):
    """Single-token decode attention against a paged KV cache.

    ``k_pages``/``v_pages`` may be the whole layer-stacked cache
    (L, num_kv_heads, total_pages, page_size, head_dim) with ``layer`` a
    traced int32 scalar selecting the layer — the decode scan passes the
    full cache arrays and the kernel's page DMAs index [layer, head, page]
    directly, so no per-layer 260MB+ cache slice ever materializes (the
    xs/ys slicing through ``lax.scan`` was measured to dominate the decode
    step wall-clock: ~8 GB of pure copy churn per token at 8 layers).

    ``softcap``: optional logit soft-capping — scaled scores squash to
    ``softcap * tanh(s / softcap)`` before masking (the decode half of the
    training kernels' ``softcap``; Gemma-2 models).

    ``window``: sliding-window decode — the query (position length-1) sees
    only the last ``window`` tokens, itself included (key positions in
    [length - window, length)). Compute blocks wholly below the window start
    are skipped — no DMA, no MXU — so the engine may free (and the table may
    dangle) any page whose whole block is behind the window. This is the
    decode half of the training kernels' ``window_size=(window-1, 0)``.

    Returns o (b, num_q_heads, head_dim) in q.dtype. Output rows for batch
    slots the scheduler padded with dummies (length-1, trash page) are
    garbage by construction; rows violating the lengths >= 1 invariant
    return exact zeros.
    """
    b, h, d = q.shape
    layered = k_pages.ndim == 5
    if layered and layer is None:
        raise ValueError("a layer-stacked (5D) cache needs the layer index")
    if not layered and layer is not None:
        raise ValueError("layer given but the cache is not layer-stacked")
    hk, total_pages, page_size, _ = k_pages.shape[1:] if layered \
        else k_pages.shape
    _, pages_per_seq = page_indices.shape
    group = h // hk
    if h % hk != 0:
        raise ValueError(f"q heads {h} not divisible by kv heads {hk}")
    if sm_scale is None:
        sm_scale = 1.0 / d**0.5
    pages_per_block = min(pages_per_block, pages_per_seq)
    if pages_per_seq % pages_per_block != 0:
        raise ValueError(
            f"pages_per_seq {pages_per_seq} must be a multiple of "
            f"pages_per_block {pages_per_block}")
    num_blocks = pages_per_seq // pages_per_block
    quantized = k_scales is not None
    if quantized and page_size != 128:
        raise ValueError(
            f"quantized KV requires page_size == 128 (scale lane = token in "
            f"page); got {page_size}")
    if window is not None and window < 1:
        raise ValueError(f"window must be >= 1 (the decode token always sees "
                         f"itself); got {window}")
    if interpret is None:
        interpret = jax.default_backend() == 'cpu'
    # A length-0 row would make block (b, 0, 0) dead: its warm-up DMA never
    # starts and later live blocks hang on unsignalled semaphores. Clamp to
    # the documented >= 1 invariant so the kernel launch stays deadlock-free;
    # the violating rows' outputs are zeroed after the call (ADVICE r2: a
    # clamped row otherwise attends to page-table slot 0 and returns
    # plausible-looking garbage — make misuse obviously empty instead).
    orig_lengths = lengths
    lengths = jnp.maximum(lengths, 1)

    # (b, hk, group, d) so each grid cell sees its GQA group as the M dim.
    q_grouped = q.reshape(b, hk, group, d)

    if quantized:
        scale_shape = (2, pages_per_block, 8, 128)
        scale_dtype = k_scales.dtype
    else:
        # dummy buffers/arrays so the kernel arity is fixed
        scale_shape = (2, 1, 8, 128)
        scale_dtype = jnp.float32
        k_scales = jnp.zeros((1, 1, 8, 128), jnp.float32)
        v_scales = k_scales

    kernel = functools.partial(
        _paged_attn_kernel,
        batch_size=b,
        pages_per_seq=pages_per_seq,
        pages_per_block=pages_per_block,
        page_size=page_size,
        sm_scale=sm_scale,
        quantized=quantized,
        window=window,
        softcap=softcap,
        layered=layered,
    )

    layer_arr = (jnp.zeros((1,), jnp.int32) if layer is None
                 else jnp.asarray(layer, jnp.int32).reshape(1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, hk, num_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, group, d),
                         lambda b_, h_, i_, *_: (b_, h_, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # k_pages
            pl.BlockSpec(memory_space=pl.ANY),  # k_scales
            pl.BlockSpec(memory_space=pl.ANY),  # v_pages
            pl.BlockSpec(memory_space=pl.ANY),  # v_scales
        ],
        out_specs=pl.BlockSpec((1, 1, group, d),
                               lambda b_, h_, i_, *_: (b_, h_, 0, 0)),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((group, 128), jnp.float32),
            pltpu.VMEM((group, 128), jnp.float32),
            pltpu.VMEM((group, d), jnp.float32),
            pltpu.VMEM((2, pages_per_block, page_size, d), k_pages.dtype),
            pltpu.VMEM((2, pages_per_block, page_size, d), v_pages.dtype),
            pltpu.VMEM(scale_shape, scale_dtype),
            pltpu.VMEM(scale_shape, scale_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hk, group, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32),
        page_indices.reshape(-1).astype(jnp.int32),
        layer_arr,
        q_grouped,
        k_pages,
        k_scales,
        v_pages,
        v_scales,
    )
    o = jnp.where((orig_lengths > 0)[:, None, None, None], o, 0)
    return o.reshape(b, h, d)


def paged_attention_reference(q, k_pages, v_pages, lengths, page_indices,
                              *, k_scales=None, v_scales=None,
                              sm_scale=None, window=None, softcap=None):
    """Plain-JAX oracle: gather pages densely and run masked attention."""
    b, h, d = q.shape
    hk, _, page_size, _ = k_pages.shape
    group = h // hk
    if sm_scale is None:
        sm_scale = 1.0 / d**0.5
    if k_scales is not None:
        page_size = k_pages.shape[2]
        ks = k_scales[:, :, 0, :page_size]  # (hk, P, ps) per-token scales
        vs = v_scales[:, :, 0, :page_size]
        k_pages = k_pages.astype(jnp.float32) * ks[..., None]
        v_pages = v_pages.astype(jnp.float32) * vs[..., None]
    # (b, hk, pages_per_seq * page_size, d)
    k = k_pages[:, page_indices].transpose(1, 0, 2, 3, 4).reshape(b, hk, -1, d)
    v = v_pages[:, page_indices].transpose(1, 0, 2, 3, 4).reshape(b, hk, -1, d)
    qg = q.reshape(b, hk, group, d).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhtd->bhgt", qg, k.astype(jnp.float32)) * sm_scale
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    t = s.shape[-1]
    mask = jnp.arange(t)[None, :] < lengths[:, None]  # (b, t)
    if window is not None:
        mask &= (jnp.arange(t)[None, :]
                 >= jnp.maximum(lengths - window, 0)[:, None])
    s = jnp.where(mask[:, None, None, :], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgt,bhtd->bhgd", p, v.astype(jnp.float32))
    return o.reshape(b, h, d).astype(q.dtype)
