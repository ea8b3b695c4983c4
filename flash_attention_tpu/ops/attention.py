"""Public flash-attention API.

The TPU-native replacement for the reference's pybind surface
(``/root/reference/csrc/flash_attn/flash_api.cpp:471-476``):

* ``flash_attention`` — idiomatic differentiable entry point (custom_vjp),
  layout (batch, seqlen, heads, head_dim) like the reference's torch API.
* ``fwd`` / ``bwd`` — exact API-parity with the reference's ``fwd``/``bwd``
  (mha_fwd flash_api.cpp:156-223, mha_bwd :228-317).
* ``varlen_fwd`` / ``varlen_bwd`` — packed variable-length batches driven by
  ``cu_seqlens`` like the reference (mha_varlen_fwd :319-381), lowered onto
  the TPU-idiomatic segment-ids representation (static shapes; the
  cu_seqlens -> segment-ids/positions conversion is jittable).

All shape validation that the reference does in C++ (flash_api.cpp:178-183,
:329-345) happens here in Python.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from flash_attention_tpu.ops import flash_bwd as _bwd_mod
from flash_attention_tpu.ops import flash_fwd as _fwd_mod
from flash_attention_tpu.ops.configs import MIN_BLOCK, BlockSizes

_INTERPRET_DEFAULT = None  # resolved from backend at call time


class SegmentIds(NamedTuple):
    """Packed-sequence segment ids (TPU-native varlen representation).

    q and kv are int32 arrays of shape (batch, seqlen_{q,kv}); tokens attend
    only within equal segment ids. Ids must be laid out in contiguous runs.
    """

    q: jax.Array
    kv: jax.Array


def _default_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_head_dim(d: int) -> int:
    """Pad head_dim for kernel blocks. Mosaic accepts a last block dim equal
    to the full array dim, so d == 64 runs unpadded (half the MXU contraction
    but also half the FLOPs/DMA — measured ~1.6x faster than padding to 128);
    other sizes round up to a lane multiple."""
    if d in (64, 128, 256, 512):
        return d
    return _round_up(d, MIN_BLOCK)


def _pad_seq(x, target_len: int, axis: int, value=0):
    pad = target_len - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _kernel_dtype(dtype):
    """Kernel storage dtype. TPU Mosaic has no fp16; fp16 inputs are upcast
    to f32 inside the kernel path (exceeding the reference's fp16-math parity;
    bf16 is the native TPU performance path) and cast back on output. CPU
    interpret mode matches the TPU behavior so tests exercise the same math."""
    if dtype == jnp.float16:
        return jnp.float32
    return dtype


def _prep_bhsd(x, seq_pad: int, d_pad: int):
    """(b, s, h, d) -> padded (b, h, s_pad, d_pad), in kernel dtype."""
    x = x.astype(_kernel_dtype(x.dtype))
    x = jnp.swapaxes(x, 1, 2)
    x = _pad_seq(x, seq_pad, axis=2)
    if d_pad != x.shape[-1]:
        x = _pad_seq(x, d_pad, axis=3)
    return x


def _float0_like(x):
    return jnp.zeros(x.shape, dtype=jax.dtypes.float0)


def merge_partials(o1, lse1, o2, lse2):
    """Merge two attention partials computed over disjoint kv sets.

    o*: (b, sq, h, d); lse*: (b, h, sq) natural-log-sum-exp per row.
    Returns (o, lse) equal to attention over the union of the kv sets.
    Rows dead in one partial carry lse = -inf there and weight to exactly 0.
    (Also re-exported by parallel.sharded_attention — the same primitive
    merges ring-attention steps across chips and kv chunks within one.)
    """
    lse_max = jnp.maximum(lse1, lse2)
    # Rows dead in BOTH partials (lse_max == -inf) would turn the stable
    # log-sum-exp into -inf - -inf = nan; substitute a safe 0 there (the
    # exp(-inf - 0) weights are exactly 0 either way) and keep lse = -inf.
    alive = lse_max != -jnp.inf
    lm = jnp.where(alive, lse_max, 0.0)
    # stable log(exp(lse1) + exp(lse2))
    lse = jnp.where(
        alive,
        lm + jnp.log(jnp.exp(lse1 - lm) + jnp.exp(lse2 - lm)),
        -jnp.inf)
    ls = jnp.where(alive, lse, 0.0)
    a1 = jnp.exp(lse1 - ls)[..., None].swapaxes(1, 2)  # (b, sq, h, 1)
    a2 = jnp.exp(lse2 - ls)[..., None].swapaxes(1, 2)
    o = o1.astype(jnp.float32) * a1 + o2.astype(jnp.float32) * a2
    return o.astype(o1.dtype), lse


_merge_partials = merge_partials


# --------------------------------------------------------------------------
# Core padded-layout fwd/bwd wrappers (shared by dense and varlen paths)
# --------------------------------------------------------------------------


# Longest K/V a single forward launch streams. Above this the one-shot
# kernel regime (whole sequence one block, state in SSA — see flash_fwd /
# configs.for_shape) no longer fits VMEM and the scratch grid loses ~14
# points of SOL (16k dense measured 75% vs 89% at 8k). So auto-configured
# dense/causal/right-windowed forwards CHUNK the kv axis: each <=8192-wide
# chunk runs the one-shot kernel, partials combine with the online-softmax
# LSE merge (parallel.merge_partials — the same primitive ring attention
# uses; merge traffic is O(b*h*sq*d) per chunk, ~2 ms against the ~60 ms an
# 8k-chunk pair computes). Backward is untouched: custom_vjp consumes only
# (o, lse), which are bit-for-bit a valid attention result.
KV_SPLIT = 8192


def _fwd_padded(q, k, v, segs, *, causal, sm_scale, block_sizes, interpret,
                window=None, softcap=None, empty_lse=0.0, kv_split=None):
    """q (b,sq,h,d); k/v (b,sk,hk,d); segs None or (q_seg, kv_seg, q_pos, kv_pos)."""
    b, sq, h, d = q.shape
    _, sk, hk, _ = k.shape

    # ---- long-KV chunked path (see KV_SPLIT above) ----
    split = KV_SPLIT if kv_split is None else kv_split
    band = _fwd_mod.normalize_band(causal, window)
    if (segs is None and block_sizes is None and sk > split
            and (band is None or band[0] is None)):
        # Chunk c covers global cols [c0, c1). The global band constraint
        # rel_g = col_g - row - (sk - sq) <= wr becomes, in chunk-local
        # lower-right coordinates, rel_c <= wr + (sk - c1): a plain
        # right-bounded window per chunk (the last chunk's shift is 0, so
        # plain causal stays plain causal there). Left-bounded windows are
        # excluded above: a chunk-local left bound can go negative, which
        # the <0 = unbounded window convention cannot express.
        wr = None if band is None else band[1]
        o = lse = None
        for c0 in range(0, sk, split):
            c1 = min(c0 + split, sk)
            cwin = None
            if wr is not None:
                wr_c = wr + (sk - c1)
                # chunk fully live for every row (max rel_c = sq - 1)
                cwin = None if wr_c >= sq - 1 else (-1, wr_c)
            oc, lsec = _fwd_padded(
                q, k[:, c0:c1], v[:, c0:c1], None,
                causal=False, sm_scale=sm_scale, block_sizes=None,
                interpret=interpret, window=cwin, softcap=softcap,
                # -inf marks rows dead in this chunk so the merge weights
                # them out exactly (exp(-inf - lse) == 0)
                empty_lse=float("-inf"), kv_split=sk,
            )
            o, lse = (oc, lsec) if o is None else _merge_partials(
                o, lse, oc, lsec)
        # Rows dead in EVERY chunk (sq > sk causal tops): restore the
        # public sentinel (O = 0, lse = empty_lse), and keep the merge's
        # 0 * nan out of O.
        dead = jnp.isneginf(lse)
        o = jnp.where(jnp.swapaxes(dead, 1, 2)[..., None],
                      jnp.zeros_like(o), o)
        lse = jnp.where(dead, jnp.float32(empty_lse), lse)
        return o, lse
    if h % hk != 0:
        raise ValueError(f"num_heads {h} must be divisible by num_heads_k {hk}")
    if d != k.shape[-1]:
        raise ValueError("q and k head_dim mismatch")
    if interpret is None:
        interpret = _default_interpret()
    if block_sizes is None:
        block_sizes = BlockSizes.for_shape(sq, sk, d, n_heads=h,
                                           n_kv_heads=hk, causal=causal,
                                           segmented=segs is not None)
    if sm_scale is None:
        sm_scale = 1.0 / d**0.5

    sq_pad = _round_up(sq, min(block_sizes.block_q, _round_up(sq, MIN_BLOCK)))
    sk_pad = _round_up(sk, min(block_sizes.block_kv, _round_up(sk, MIN_BLOCK)))
    d_pad = _pad_head_dim(d)

    qp = _prep_bhsd(q, sq_pad, d_pad)
    kp = _prep_bhsd(k, sk_pad, d_pad)
    vp = _prep_bhsd(v, sk_pad, d_pad)
    seg_args = (None,) * 4
    if segs is not None:
        q_seg, kv_seg, q_pos, kv_pos = segs
        seg_args = (
            _pad_seq(q_seg.astype(jnp.int32), sq_pad, 1, value=-2),
            _pad_seq(kv_seg.astype(jnp.int32), sk_pad, 1, value=-1),
            _pad_seq(q_pos.astype(jnp.int32), sq_pad, 1, value=0),
            _pad_seq(kv_pos.astype(jnp.int32), sk_pad, 1, value=0),
        )

    o, lse = _fwd_mod.flash_fwd(
        qp, kp, vp, *seg_args,
        causal=causal, sm_scale=sm_scale, block_sizes=block_sizes,
        seqlen_q=sq, seqlen_k=sk, window=window, softcap=softcap,
        interpret=interpret, empty_lse=empty_lse,
    )
    o = jnp.swapaxes(o[:, :, :sq, :d], 1, 2).astype(q.dtype)  # (b, sq, h, d)
    lse = lse[:, :, :sq]  # (b, h, sq)
    return o, lse


def flash_attention(
    q,
    k,
    v,
    causal: bool = False,
    sm_scale: float | None = None,
    segment_ids: SegmentIds | None = None,
    block_sizes: BlockSizes | None = None,
    interpret: bool | None = None,
    window_size: tuple | None = None,
    softcap: float | None = None,
    return_lse: bool = False,
):
    """Differentiable flash attention.

    Args:
      q: (batch, seqlen_q, num_heads, head_dim)
      k, v: (batch, seqlen_k, num_heads_k, head_dim)
      causal: lower-right-aligned causal masking (mask.h:172 semantics).
      sm_scale: softmax scale, default 1/sqrt(head_dim).
      segment_ids: optional SegmentIds for packed batches.
      window_size: optional (left, right) sliding window — query i attends
        keys in [i + off - left, i + off + right] with lower-right alignment
        (off = seqlen_k - seqlen_q); entries < 0 mean unbounded (the upstream
        flash-attention convention). Composes with causal (right -> 0) and
        with segment_ids (window over within-segment positions).
      softcap: optional logit soft-capping (Gemma-2 style): scaled scores are
        squashed to ``softcap * tanh(s / softcap)`` before masking/softmax.
      return_lse: additionally return LSE (batch, num_heads, seqlen_q) fp32.

    Returns:
      o (batch, seqlen_q, num_heads, head_dim), optionally (o, lse).
    """
    segs = None
    if segment_ids is not None:
        q_pos, kv_pos = _positions_from_segment_ids(segment_ids)
        segs = (segment_ids.q, segment_ids.kv, q_pos, kv_pos)
    if window_size is not None:
        window_size = tuple(window_size)  # hashable static arg
    o, lse = _flash_attention_custom(
        q, k, v, segs, causal, sm_scale, block_sizes, interpret, window_size,
        softcap,
    )
    if return_lse:
        return o, lse
    return o


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash_attention_custom(q, k, v, segs, causal, sm_scale, block_sizes,
                            interpret, window, softcap):
    o, lse = _fwd_padded(
        q, k, v, segs,
        causal=causal, sm_scale=sm_scale, block_sizes=block_sizes,
        interpret=interpret, window=window, softcap=softcap,
    )
    return o, lse


def _flash_attention_fwd(q, k, v, segs, causal, sm_scale, block_sizes,
                         interpret, window, softcap):
    o, lse = _fwd_padded(
        q, k, v, segs,
        causal=causal, sm_scale=sm_scale, block_sizes=block_sizes,
        interpret=interpret, window=window, softcap=softcap,
    )
    return (o, lse), (q, k, v, segs, o, lse)


def _flash_attention_bwd(causal, sm_scale, block_sizes, interpret, window,
                         softcap, res, cts):
    q, k, v, segs, o, lse = res
    do, _ = cts  # cotangent of lse unsupported (matches reference bwd API)
    dq, dk, dv = bwd(
        q, k, v, o, lse, do,
        is_causal=causal, sm_scale=sm_scale, block_sizes=block_sizes,
        interpret=interpret, segs=segs, window_size=window, softcap=softcap,
    )
    dsegs = None
    if segs is not None:
        dsegs = tuple(_float0_like(s) for s in segs)
    return dq, dk, dv, dsegs


_flash_attention_custom.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def _positions_from_segment_ids(segment_ids: SegmentIds):
    """Within-segment positions for causal masking of packed batches.

    Requires contiguous segment runs. If q and kv token counts per segment
    differ, use varlen_fwd (which applies the per-segment lower-right shift).
    """

    def pos(seg):
        b, s = seg.shape
        idx = jnp.arange(s, dtype=jnp.int32)[None, :]
        boundary = jnp.concatenate(
            [jnp.ones((b, 1), bool), seg[:, 1:] != seg[:, :-1]], axis=1
        )
        start = jax.lax.cummax(jnp.where(boundary, idx, 0), axis=1)
        return idx - start

    return pos(segment_ids.q), pos(segment_ids.kv)


# --------------------------------------------------------------------------
# Reference-parity API: fwd / bwd
# --------------------------------------------------------------------------


def fwd(
    q, k, v, is_causal: bool = False, *,
    sm_scale: float | None = None,
    block_sizes: BlockSizes | None = None,
    interpret: bool | None = None,
    segs=None,
    window_size: tuple | None = None,
    softcap: float | None = None,
    empty_lse: float = 0.0,
    kv_split: int | None = None,
):
    """Forward pass: (o, lse). Parity with reference ``fwd`` (flash_api.cpp:156).

    q: (b, sq, h, d); k/v: (b, sk, hk, d). Returns o (b, sq, h, d) and
    lse (b, h, sq) fp32 (the reference's ``l`` tensor, flash_api.cpp:187-188).
    ``window_size``: optional (left, right) sliding window, upstream
    flash-attention semantics (entries < 0 = unbounded).
    ``kv_split``: override the KV_SPLIT chunking threshold (tests force small
    values to exercise the chunked long-KV path at CPU-sized shapes).
    """
    o, lse = _fwd_padded(
        q, k, v, segs,
        causal=is_causal, sm_scale=sm_scale, block_sizes=block_sizes,
        interpret=interpret, empty_lse=empty_lse, softcap=softcap,
        window=None if window_size is None else tuple(window_size),
        kv_split=kv_split,
    )
    return o, lse


def bwd(
    q, k, v, o, lse, do, is_causal: bool = False, *,
    sm_scale: float | None = None,
    block_sizes: BlockSizes | None = None,
    interpret: bool | None = None,
    segs=None,
    window_size: tuple | None = None,
    softcap: float | None = None,
    parts: str = "all",
):
    """Backward pass: (dq, dk, dv). Parity with reference ``bwd``
    (flash_api.cpp:228-317). dk/dv have kv-head count (GQA group-reduced
    in-kernel, replacing flash_api.cpp:265-272, 301-312 host reduction).

    ``parts``: profiling hook — "di" runs only the D=rowsum(dO∘O) preprocess
    and returns it raw, "dq" runs K1+K2 and returns dq; "all" the full bwd
    (see flash_bwd; mirrors the reference's per-kernel timing breakdown)."""
    b, sq, h, d = q.shape
    _, sk, hk, _ = k.shape
    if interpret is None:
        interpret = _default_interpret()
    if block_sizes is None:
        block_sizes = BlockSizes.for_shape(sq, sk, d)
    if sm_scale is None:
        sm_scale = 1.0 / d**0.5

    sq_pad = _round_up(sq, min(block_sizes.block_q_dq, _round_up(sq, MIN_BLOCK)))
    sq_pad = _round_up(sq_pad, min(block_sizes.block_q_dkv, _round_up(sq, MIN_BLOCK)))
    sk_pad = _round_up(sk, min(block_sizes.block_kv_dq, _round_up(sk, MIN_BLOCK)))
    sk_pad = _round_up(sk_pad, min(block_sizes.block_kv_dkv, _round_up(sk, MIN_BLOCK)))
    # bwd keeps head_dim padded to 128: its transposed matmuls (dV += P^T dO,
    # dK += dS^T Q) put d on the MXU output dim, where 64-wide tiles measure
    # ~25% slower than padded 128 (the opposite of fwd, which wins unpadded)
    d_pad = _round_up(d, MIN_BLOCK)

    qp = _prep_bhsd(q, sq_pad, d_pad)
    kp = _prep_bhsd(k, sk_pad, d_pad)
    vp = _prep_bhsd(v, sk_pad, d_pad)
    op = _prep_bhsd(o, sq_pad, d_pad)
    dop = _prep_bhsd(do, sq_pad, d_pad)
    lsep = _pad_seq(lse.astype(jnp.float32), sq_pad, axis=2)
    seg_args = (None,) * 4
    if segs is not None:
        q_seg, kv_seg, q_pos, kv_pos = segs
        seg_args = (
            _pad_seq(q_seg.astype(jnp.int32), sq_pad, 1, value=-2),
            _pad_seq(kv_seg.astype(jnp.int32), sk_pad, 1, value=-1),
            _pad_seq(q_pos.astype(jnp.int32), sq_pad, 1, value=0),
            _pad_seq(kv_pos.astype(jnp.int32), sk_pad, 1, value=0),
        )

    out = _bwd_mod.flash_bwd(
        qp, kp, vp, op, lsep, dop, *seg_args,
        causal=is_causal, sm_scale=sm_scale, block_sizes=block_sizes,
        seqlen_q=sq, seqlen_k=sk, interpret=interpret, parts=parts,
        softcap=softcap,
        window=None if window_size is None else tuple(window_size),
    )
    if parts == "di":
        return out
    if parts == "dq":
        return jnp.swapaxes(out[:, :, :sq, :d], 1, 2).astype(q.dtype)
    dq, dk, dv = out
    dq = jnp.swapaxes(dq[:, :, :sq, :d], 1, 2).astype(q.dtype)
    dk = jnp.swapaxes(dk[:, :, :sk, :d], 1, 2).astype(k.dtype)
    dv = jnp.swapaxes(dv[:, :, :sk, :d], 1, 2).astype(v.dtype)
    return dq, dk, dv


# --------------------------------------------------------------------------
# Varlen API (cu_seqlens -> segment ids/positions, packed layout)
# --------------------------------------------------------------------------


def _varlen_segs(cu_q, cu_k, total_q: int, total_k: int):
    """Build (q_seg, kv_seg, q_pos_shifted, kv_pos) from cu_seqlens.

    The reference's BlockInfo (block_info.h:9-21) reads cu_seqlens per CTA;
    on TPU we precompute per-token segment ids and within-sequence positions
    once (O(total) work, fused by XLA) and let the kernel mask with them.
    q positions are pre-shifted by (len_k - len_q) per sequence so the kernel's
    single comparison kv_pos <= q_pos realizes lower-right causal alignment
    (mask.h:172).
    """
    cu_q = cu_q.astype(jnp.int32)
    cu_k = cu_k.astype(jnp.int32)

    def seg_and_pos(cu, total):
        idx = jnp.arange(total, dtype=jnp.int32)
        seg = jnp.searchsorted(cu, idx, side="right").astype(jnp.int32) - 1
        pos = idx - cu[seg]
        # tokens beyond cu[-1] (padding inside the packed buffer) -> seg -1
        seg = jnp.where(idx < cu[-1], seg, -1)
        return seg, pos

    q_seg, q_pos = seg_and_pos(cu_q, total_q)
    kv_seg, kv_pos = seg_and_pos(cu_k, total_k)
    len_q = jnp.diff(cu_q)
    len_k = jnp.diff(cu_k)
    shift = len_k - len_q  # per sequence
    q_seg_safe = jnp.clip(q_seg, 0, len_q.shape[0] - 1)
    q_pos = q_pos + shift[q_seg_safe]
    return q_seg[None], kv_seg[None], q_pos[None], kv_pos[None]


def varlen_fwd(
    q, k, v, cu_seqlens_q, cu_seqlens_k,
    max_seqlen_q: int | None = None, max_seqlen_k: int | None = None,
    is_causal: bool = False, *,
    sm_scale: float | None = None,
    block_sizes: BlockSizes | None = None,
    interpret: bool | None = None,
    window_size: tuple | None = None,
    softcap: float | None = None,
):
    """Packed variable-length forward. Parity with reference ``varlen_fwd``
    (flash_api.cpp:319-381).

    q: (total_q, h, d); k/v: (total_k, hk, d); cu_seqlens int32 (nseq+1,).
    Returns o (total_q, h, d) and lse (h, total_q) fp32 — packed layout
    (deviation from the reference's (b, h, max_sq) LSE, which only existed to
    match its kernel's stride scheme; ``varlen_bwd`` consumes this form).
    ``window_size``: optional (left, right) sliding window over
    within-sequence positions (per-sequence lower-right alignment).
    """
    total_q, h, d = q.shape
    total_k, hk, _ = k.shape
    segs4 = _varlen_segs(cu_seqlens_q, cu_seqlens_k, total_q, total_k)
    o, lse = _fwd_padded(
        q[None], k[None], v[None], segs4,
        causal=is_causal, sm_scale=sm_scale, block_sizes=block_sizes,
        interpret=interpret, softcap=softcap,
        window=None if window_size is None else tuple(window_size),
    )
    return o[0], lse[0]


def varlen_bwd(
    q, k, v, o, lse, do, cu_seqlens_q, cu_seqlens_k,
    max_seqlen_q: int | None = None, max_seqlen_k: int | None = None,
    is_causal: bool = False, *,
    sm_scale: float | None = None,
    block_sizes: BlockSizes | None = None,
    interpret: bool | None = None,
    window_size: tuple | None = None,
    softcap: float | None = None,
):
    """Packed variable-length backward. Parity with reference ``varlen_bwd``
    (flash_api.cpp:383-468). lse is the packed (h, total_q) form returned by
    ``varlen_fwd``."""
    total_q, h, d = q.shape
    total_k, hk, _ = k.shape
    segs4 = _varlen_segs(cu_seqlens_q, cu_seqlens_k, total_q, total_k)
    dq, dk, dv = bwd(
        q[None], k[None], v[None], o[None], lse[None], do[None],
        is_causal=is_causal, sm_scale=sm_scale, block_sizes=block_sizes,
        interpret=interpret, segs=segs4, window_size=window_size,
        softcap=softcap,
    )
    return dq[0], dk[0], dv[0]
