"""Fused flash-attention forward kernel (Pallas / TPU).

TPU-native re-design of the reference forward
(``/root/reference/src/flash_fwd_kernel.h`` ``compute_attn_1rowblock``):

* The reference's CTA grid ``(num_m_block, batch, head)`` with an in-kernel
  loop over K/V tiles becomes a Pallas grid ``(batch, head, q_blocks,
  kv_blocks)`` whose innermost dimension is the online-softmax reduction —
  Mosaic's pipeline double-buffers the HBM->VMEM K/V block DMAs, replacing
  Turing's register-file K prefetch (flash_fwd_kernel.h:312,327-331). In the
  measured-fastest ONE-SHOT configs the whole K/V sequence is a single block
  (kv_blocks == 1): no reduction dim, no cross-step state, the block
  streamed as ``block_kv_inner``-wide sub-tiles with (m, l, acc) in SSA.
* Warp-shuffle rowmax/rowsum (flash_fwd_kernel.h:385-474) become plain
  ``jnp.max/sum`` VPU reductions over the (block_q, block_kv) score tile.
* smem aliasing/swizzles (flash_fwd_kernel.h:120-124, kernel_traits.h:64-67)
  have no analogue: Mosaic owns VMEM layout.
* Causal is lower-right aligned: (row, col) masked iff
  ``col - row > seqlen_k - seqlen_q`` (mask.h:172). Fully-above-diagonal KV
  blocks are skipped (the analogue of n_block_max, flash_fwd_kernel.h:241-271)
  and their K/V DMAs elided by clamping the BlockSpec index map (Pallas skips
  the copy when the block index is unchanged between grid steps); within
  live blocks a static (q-band, kv-block) lax.switch and the one-cell
  diagonal-triangle unroll resolve the live sub-tile ranges at trace time
  (the analogue of n_masking_steps — no dynamic control flow).
* Fully-masked rows produce O=0, LSE=0 (flash_fwd_kernel.h:717-730, :766-785).
* GQA/MQA: the K/V index maps divide the q-head index by the group size —
  no head expansion is materialized (contrast flash_api.cpp:265-272).

Outputs O (q.dtype) and LSE = m + log(l) (fp32, flash_fwd_kernel.h:770).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_tpu.ops import segments
from flash_attention_tpu.ops.configs import BlockSizes

from flash_attention_tpu.ops._mxu import matmul_precision as _precision

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128
MIN_BLOCK_F32CAP = 128


def normalize_band(causal: bool, window) -> tuple | None:
    """Fold ``causal`` and a flash-attn-style ``window_size`` into one band.

    Returns (left, right) with ``None`` meaning unbounded on that side, or
    ``None`` when no banding applies at all (dense). Window entries < 0 mean
    unbounded (the reference ecosystem's -1 convention); causal clamps the
    right bound to 0. Shared by the fwd and bwd launchers so schedule and
    mask agree. For the varlen/segmented path, pass causal=False — causality
    there is a per-token position compare, not a global band."""
    if window is None:
        return (None, 0) if causal else None
    wl, wr = window
    wl = None if wl is None or wl < 0 else int(wl)
    wr = None if wr is None or wr < 0 else int(wr)
    if causal:
        wr = 0 if wr is None else min(wr, 0)
    if wl is None and wr is None:
        return (None, 0) if causal else None
    return (wl, wr)


def _fwd_kernel(
    # refs (segment refs present only when segmented=True; the m/l/acc
    # scratch refs only when one_shot=False)
    *refs,
    sm_scale: float,
    causal: bool,
    band: tuple | None,  # (left, right) window bounds, None entry = infinite;
    # causal folds in as right == 0 (dense path). None = no banding at all.
    segmented: bool,
    seqlen_q: int,
    seqlen_k: int,
    block_q: int,
    block_kv: int,
    block_kv_inner: int,
    block_q_inner: int,
    block_h: int,
    group: int,
    empty_lse: float,
    softcap: float | None,
    force_branch: str | None,
    one_shot: bool,
):
    if segmented:
        (lo_ref, hi_ref,  # scalar-prefetch (b, nq): live kv-block range
         q_seg_ref, kv_seg_ref, q_pos_ref, kv_pos_ref,
         q_ref, k_ref, v_ref, o_ref, lse_ref, *scr) = refs
    else:
        (q_ref, k_ref, v_ref, o_ref, lse_ref, *scr) = refs
    if not one_shot:
        m_scr, l_scr, acc_scr = scr

    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)
    inner = block_kv_inner
    nsubs = block_kv // inner
    rq = block_q_inner
    nstripes = block_q // rq
    d = q_ref.shape[-1]

    if not one_shot:
        @pl.when(ki == 0)
        def _init():
            # Only lane 0 of m/l is ever read; acc garbage is wiped by
            # alpha == 0 the moment a row comes alive, but never-alive rows
            # multiply acc by inv == 0 in the epilogue, and 0 * NaN-garbage
            # is NaN — so acc does need the zero fill.
            m_scr[:, :, :1] = jnp.full_like(m_scr[:, :, :1], -jnp.inf)
            l_scr[:, :, :1] = jnp.zeros_like(l_scr[:, :, :1])
            acc_scr[...] = jnp.zeros_like(acc_scr)

    def _online_softmax_step(hp, sub, masked, m_prev, l_prev, acc,
                             row0=0, rows=None, cw=None):
        """One (rows, inner) score sub-tile; the online-softmax state
        (m, l, acc) flows through as SSA values — callers read/write the
        cross-grid-step scratch once per grid step, not once per sub-tile.
        ``sub`` may be a python int (unrolled sweeps) or a traced scalar
        (the bounded fori sweep over a causal/window block's live range);
        ``row0``/``rows`` select a static q-row stripe of the block (the
        masked-state striping — full block by default)."""
        # ``hp`` indexes the head packed into this grid step (block_h > 1
        # amortizes the fixed per-grid-step cost over several heads' MXU
        # work; measured a loss on v5e, so the default stays 1).
        if rows is None:
            rows = block_q
        if cw is None:
            cw = inner  # column width: interior sub-tiling granularity
        q = q_ref[0, hp, pl.ds(row0, rows), :]  # (rows, d)
        k = k_ref[0, hp // group, pl.ds(sub * cw, cw), :]  # (cw, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_precision(q.dtype),
        )  # (block_q, inner)
        s *= sm_scale
        if softcap is not None:
            # logit soft-capping (Gemma-2): squash the scaled score into
            # (-softcap, softcap) BEFORE masking, so MASK_VALUE still
            # dominates every capped live score. VPU-only; zero cost when
            # softcap is None (python-level specialization).
            s = softcap * jnp.tanh(s * (1.0 / softcap))

        # ---- masking ----
        # ``masked`` selects the branch: interior blocks skip the
        # iota/compare/select entirely (see the lax.switch below — the
        # analogue of the reference's n_masking_steps,
        # flash_fwd_kernel.h:241-271). Masked lanes get MASK_VALUE;
        # exp(MASK_VALUE - m) underflows to exactly 0 for any live row, so no
        # second select over the tile is needed.
        col0 = ki * block_kv + sub * cw  # global col of this sub-tile

        def apply_mask(s):
            shape = (rows, cw)
            sl = pl.ds(sub * cw, cw)
            rsl = pl.ds(row0, rows)
            if segmented:
                q_seg = jax.lax.broadcast_in_dim(q_seg_ref[0, 0, rsl], shape, (0,))
                kv_seg = jax.lax.broadcast_in_dim(kv_seg_ref[0, 0, sl], shape, (1,))
                mask = q_seg == kv_seg
                if causal or band is not None:
                    q_pos = jax.lax.broadcast_in_dim(q_pos_ref[0, 0, rsl], shape, (0,))
                    kv_pos = jax.lax.broadcast_in_dim(kv_pos_ref[0, 0, sl], shape, (1,))
                    if causal:
                        mask &= kv_pos <= q_pos
                    if band is not None:
                        # sliding window over per-sequence positions (the
                        # varlen analogue of the dense band below)
                        wl, wr = band
                        if wl is not None:
                            mask &= kv_pos >= q_pos - wl
                        if wr is not None:
                            mask &= kv_pos <= q_pos + wr
            elif band is not None:
                # Banded (causal and/or sliding-window) mask, lower-right
                # aligned: key col relative to query row is
                # rel = col - row - (seqlen_k - seqlen_q); live iff
                # -left <= rel <= right (None bound = unbounded). Plain causal
                # is right == 0. The OOB-column (padding) mask is implied
                # whenever right <= 0: col >= seqlen_k gives rel >= 1 for
                # every real row, so the right-bound compare covers both.
                # (Pad q rows may pass garbage; the wrapper slices them off.)
                wl, wr = band
                col_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
                row_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                rel = ((col0 + col_ids) - (qi * block_q + row0 + row_ids)
                       - (seqlen_k - seqlen_q))
                mask = None
                if wr is not None:
                    mask = rel <= wr
                if wl is not None:
                    lo = rel >= -wl
                    mask = lo if mask is None else mask & lo
                if wr is None or wr > 0:
                    mask &= (col0 + col_ids) < seqlen_k  # OOB not implied
            else:
                col_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
                mask = (col0 + col_ids) < seqlen_k  # OOB cols (padding)
            return jnp.where(mask, s, MASK_VALUE)

        if masked:
            s = apply_mask(s)

        # ---- online softmax ----
        m_curr = jnp.max(s, axis=-1, keepdims=True)  # (block_q, 1)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)              # (block_q, 1)
        p = jnp.exp(s - m_next)
        if masked:
            # Fully-masked rows (m == MASK_VALUE) would give p == exp(0) == 1;
            # guard on the (block_q, 1) row vector instead of the full tile.
            # Rows dead to the end keep l == 0, which zeroes the epilogue
            # output. Interior (unmasked) blocks have every lane live, so
            # they skip the guard.
            row_alive = m_next > MASK_VALUE * 0.5
            psum = jnp.where(row_alive, jnp.sum(p, axis=-1, keepdims=True), 0.0)
        else:
            psum = jnp.sum(p, axis=-1, keepdims=True)
        l_next = alpha * l_prev + psum

        v = v_ref[0, hp // group, pl.ds(sub * cw, cw), :]  # (cw, d)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_precision(v.dtype),
        )
        return m_next, l_next, acc * alpha + pv

    def _state_init(rows):
        return (jnp.full((rows, 1), -jnp.inf, jnp.float32),
                jnp.zeros((rows, 1), jnp.float32),
                jnp.zeros((rows, d), jnp.float32))

    def _state_load(hp, row0=0, rows=None):
        rows = block_q if rows is None else rows
        if one_shot:
            return _state_init(rows)
        rsl = pl.ds(row0, rows)
        return m_scr[hp, rsl, :1], l_scr[hp, rsl, :1], acc_scr[hp, rsl, :]

    def _state_save(hp, m, l, acc, row0=0, rows=None):
        rows = block_q if rows is None else rows
        if one_shot:
            _store_one(hp, m, l, acc, row0, rows)
        else:
            rsl = pl.ds(row0, rows)
            m_scr[hp, rsl, :1] = m
            l_scr[hp, rsl, :1] = l
            acc_scr[hp, rsl, :] = acc

    def _store_one(hp, m, l, acc, row0=0, rows=None):
        rows = block_q if rows is None else rows
        alive = l > 0.0
        inv = jnp.where(alive, 1.0 / jnp.where(alive, l, 1.0), 0.0)
        o_ref[0, hp, pl.ds(row0, rows), :] = (acc * inv).astype(o_ref.dtype)
        lse = jnp.where(alive, m + jnp.log(jnp.where(alive, l, 1.0)),
                        empty_lse)
        # LSE is stored (b, h, 8, sq): q rows on lanes, 8 broadcast
        # sublanes (the minimum f32 tile). One (block_q, 1) ->
        # (8, block_q) relayout per q block; 16x less stream traffic in
        # bwd than a 128-lane broadcast. The wrapper returns sublane 0 as
        # the reference's dense (b, h, sq) `l` (flash_api.cpp:187-188).
        lse_ref[0, hp, :, pl.ds(row0, rows)] = jnp.broadcast_to(
            lse[:, 0][None, :], (lse_ref.shape[2], rows))

    def _run(masked, n_live=None):
        # Two-level kv tiling: the grid step DMA'd a block_kv-wide K/V block;
        # process it in block_kv_inner-wide sub-tiles (python-unrolled) so the
        # next sub-tile's QK^T (MXU) overlaps this one's softmax (VPU) and the
        # fp32 score tile stays small. The outer (also python-unrolled) loop
        # runs every head packed into this grid step. ``n_live`` statically
        # truncates the sweep (the padded tail block: sub-tiles entirely
        # beyond seqlen_k contribute nothing and are skipped).
        for hp in range(block_h):
            m, l, acc = _state_load(hp)
            for sub in range(nsubs if n_live is None else n_live):
                m, l, acc = _online_softmax_step(hp, sub, masked, m, l, acc)
            _state_save(hp, m, l, acc)


    # Block-level schedule. Three states: pruned (outside the band — no
    # compute, and the wrapper's clamped index map already elided the DMA),
    # interior (live, no masking work at all), and masked (blocks straddling
    # a band edge, plus the padded tail block). A single top-level lax.switch
    # keeps this a real branch — nesting a dynamic cond INSIDE pl.when makes
    # Mosaic predicate both paths and causal degenerates to dense cost
    # (measured, round 1). Plain causal is the band (None, 0); a sliding
    # window adds/changes the bounds but reuses the same schedule.
    if band is not None and not segmented:
        wl, wr = band
        off = seqlen_k - seqlen_q
        first_row = qi * block_q
        last_row = first_row + block_q - 1
        first_col = ki * block_kv
        last_col = first_col + block_kv - 1
        should_run = True
        interior = True
        if wr is not None:
            # live iff the first col is allowed by the LAST (widest) row;
            # interior iff even the FIRST row allows this block's last col
            should_run &= first_col <= last_row + off + wr
            interior &= last_col <= first_row + off + wr
        if wl is not None:
            should_run &= last_col >= first_row + off - wl
            interior &= first_col >= last_row + off - wl
        if wr is None or wr > 0:
            interior &= last_col < seqlen_k  # padded tail still needs masking

        # Static causal-diagonal specialization: under plain causal with
        # sq == sk (off == 0, right bound 0, no left bound, no padded tail)
        # and square blocks, the masked state is EXACTLY the diagonal blocks
        # (qi == ki), where q-row stripe ri's live columns are statically
        # [0, (ri+1)*rq) — so the dead upper-right triangle is skipped with
        # a fully unrolled (rq x rq)-tile triangle sweep, and only each
        # stripe's last tile (the one the diagonal crosses) pays the mask.
        # This is the 2D analogue of the reference's n_masking_steps
        # (flash_fwd_kernel.h:241-271), resolved at trace time. A dynamic
        # fori over qi-dependent sub-tile bounds was measured far slower
        # (8k causal 42% vs 56% SOL base) — Mosaic's loop overhead swamps
        # the triangle savings — hence static-only, general masked blocks
        # fall back to the full-width masked sweep.
        diag_static = (nstripes > 1 and wl is None and wr == 0 and off == 0
                       and block_q == block_kv
                       and seqlen_q == block_q * pl.num_programs(2)
                       and seqlen_k == block_kv * nk)

        def _masked_blk():
            if not diag_static:
                _run(True)
                return
            for hp in range(block_h):
                for ri in range(nstripes):
                    m, l, acc = _state_load(hp, ri * rq, rq)
                    for sub in range(ri + 1):
                        # tiles strictly below the diagonal are fully live
                        m, l, acc = _online_softmax_step(
                            hp, sub, sub == ri, m, l, acc,
                            row0=ri * rq, rows=rq, cw=rq)
                    _state_save(hp, m, l, acc, ri * rq, rq)

        # Band switch: the live kv sub-range of q block qi is
        # [ (qi·bq + off - wl)/inner, (qi·bq + bq - 1 + off + wr)/inner ] —
        # dynamic in qi (and offset by ki when the grid streams several kv
        # blocks), but a lax.switch over static (BAND, ki) branches (a band
        # = a run of consecutive q blocks sharing one conservative
        # sub-range) resolves it at trace time: each branch is a fully
        # unrolled sweep of its live sub-tiles, and sub-tiles live for EVERY
        # row of the band skip masking entirely. This is how causal/windowed
        # configs approach the dense rate: compute ~= the exact band FLOPs
        # (plus <= one block_q of raggedness per band) with zero dynamic
        # control flow. (The dynamic-fori version of the same pruning
        # measured 42% vs 56% SOL — see _masked_blk's note.) Branch count is
        # capped at 16; wider grids fall back to the block-state schedule.
        nq_static = pl.num_programs(2)
        band_switch = (not segmented and nq_static > 1 and nk <= 2
                       and (one_shot or nk * 8 <= 16))
        gsubs = nsubs * nk  # sub-tiles across the whole kv sequence

        def _band_branch(b, ki_s, gq):
            lo_row = b * gq * block_q               # band's first row
            hi_row = min((b + 1) * gq, nq_static) * block_q - 1
            glo, ghi = 0, gsubs                     # global sub-tile range
            if wr is not None:
                ghi = min(gsubs, max(0, (hi_row + off + wr) // inner + 1))
            if wr is None or wr > 0:
                ghi = min(ghi, -(-seqlen_k // inner))
            if wl is not None:
                glo = min(gsubs, max(0, (lo_row + off - wl) // inner))
            # intersect with kv block ki_s (sub indices are block-relative)
            sub_lo = min(max(glo - ki_s * nsubs, 0), nsubs)
            sub_hi = min(max(ghi - ki_s * nsubs, 0), nsubs)
            if sub_lo >= sub_hi and not one_shot:
                # dead block in the scratch regime: a pure no-op (one-shot
                # still runs the empty sweep so dead q rows store zeros)
                return lambda: None

            def branch():
                for hp in range(block_h):
                    m, l, acc = _state_load(hp)
                    for sub in range(sub_lo, sub_hi):
                        # masked unless this sub-tile is live for every row
                        # of the band (and every column is a real column)
                        col_first = (ki_s * nsubs + sub) * inner
                        col_last = col_first + inner - 1
                        live = col_last < seqlen_k
                        if wr is not None:
                            live &= col_last <= lo_row + off + wr
                        if wl is not None:
                            live &= col_first >= hi_row + off - wl
                        m, l, acc = _online_softmax_step(
                            hp, sub, not live, m, l, acc)
                    _state_save(hp, m, l, acc)
            return branch

        need_mask = jnp.logical_not(interior)
        if force_branch is not None and one_shot:
            force_branch = None  # debug forcing targets the multi-block path
        if force_branch == "nomask":     # perf-debug: mask-free ceiling
            jax.lax.cond(should_run, functools.partial(_run, False),
                         lambda: None)
        elif force_branch == "mask":     # perf-debug: round-1 behavior
            jax.lax.cond(should_run, functools.partial(_run, True),
                         lambda: None)
        elif band_switch:
            gq = -(-nq_static // 8)  # q blocks per band: 8 bands x nk <= 16
            nbands = -(-nq_static // gq)
            jax.lax.switch((qi // gq) * nk + ki,
                           [_band_branch(b, k_, gq)
                            for b in range(nbands) for k_ in range(nk)])
        elif one_shot:
            # nk == 1: no cross-step state, outputs written by _state_save;
            # fully-dead q blocks still store (zero rows) via the empty sub
            # range, so no pruned state exists.
            _masked_blk()
        else:
            state = jnp.where(should_run, jnp.where(need_mask, 2, 1), 0)
            jax.lax.switch(state, [lambda: None,
                                   functools.partial(_run, False),
                                   _masked_blk])
    elif segmented:
        # Live range from the precomputed per-(batch, q-block) metadata
        # (ops.segments): blocks outside [lo, hi] have no token pair in the
        # same segment (or are fully causal-masked) — skip them; their K/V
        # DMAs were already elided by the clamped index maps.
        bi = pl.program_id(0)
        lo = lo_ref[bi, qi]
        hi = hi_ref[bi, qi]
        jax.lax.cond((ki >= lo) & (ki <= hi),
                     functools.partial(_run, True), lambda: None)
    elif seqlen_k != block_kv * nk:
        # Only the padded tail block needs the OOB-column mask, and only its
        # first ceil(live_cols / inner) sub-tiles hold real columns — both
        # bounds are static (the tail block index is nk - 1).
        n_live = -(-(seqlen_k - (nk - 1) * block_kv) // inner)
        if one_shot:
            _run(True, n_live=n_live)
        else:
            jax.lax.cond(ki == nk - 1,
                         functools.partial(_run, True, n_live=n_live),
                         functools.partial(_run, False))
    else:
        _run(False)

    if not one_shot:
        @pl.when(ki == nk - 1)
        def _store():
            for hp in range(block_h):
                _store_one(hp, m_scr[hp, :, :1], l_scr[hp, :, :1],
                           acc_scr[hp])


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "block_sizes", "seqlen_q", "seqlen_k",
        "window", "softcap", "interpret", "debug", "empty_lse",
        "force_branch",
    ),
)
def flash_fwd(
    q,  # (b, h, sq_pad, d_pad)
    k,  # (b, hk, sk_pad, d_pad)
    v,  # (b, hk, sk_pad, d_pad)
    q_seg=None,   # (b, sq_pad) int32 or None
    kv_seg=None,  # (b, sk_pad) int32 or None
    q_pos=None,   # (b, sq_pad) int32 (pre-shifted for lower-right causal)
    kv_pos=None,  # (b, sk_pad) int32
    *,
    causal: bool,
    sm_scale: float,
    block_sizes: BlockSizes,
    seqlen_q: int,  # actual (pre-padding) seqlen_q
    seqlen_k: int,
    window: tuple | None = None,  # sliding window (left, right): query row i
    # (lower-right aligned) sees key cols in [i+off-left, i+off+right];
    # entries < 0 mean unbounded. Composes with causal (right clamps to 0).
    softcap: float | None = None,  # logit soft-capping (Gemma-2):
    # s -> softcap * tanh(s / softcap) after sm_scale, before masking
    interpret: bool = False,
    debug: bool = False,
    empty_lse: float = 0.0,  # lse sentinel for fully-masked rows
    force_branch: str | None = None,  # perf-debug ONLY ("nomask"/"mask"):
    # forces the causal masking branch; "nomask" is WRONG numerics (the
    # mask-free ceiling for attribution experiments). Explicit static kwarg
    # instead of a module global so a stale jit cache can't outlive a toggle
    # (ADVICE r2).
):
    """Launch the forward kernel on pre-padded (b, h, s, d) inputs.

    Returns (o, lse) with o (b, h, sq_pad, d_pad) q.dtype, lse (b, h, sq_pad) f32.
    """
    b, h, sq_pad, d = q.shape
    _, hk, sk_pad, _ = k.shape
    group = h // hk
    segmented = q_seg is not None

    block_q = min(block_sizes.block_q, sq_pad)
    block_kv = min(block_sizes.block_kv, sk_pad)
    if q.dtype == jnp.float32:
        # f32 operands double every block's footprint; the wide bf16-tuned
        # tiles (block_kv up to 8192) blow VMEM. Cap like flash_bwd's
        # f32_cap — the f32 path is the fp16-upcast parity path, not the
        # perf path. Snap down so the cap still divides the (already
        # padded) sequence lengths.

        def _snap(pad_len, cap):
            b_ = min(pad_len, cap)
            while pad_len % b_:
                b_ -= MIN_BLOCK_F32CAP
            return b_

        block_q = _snap(sq_pad, min(block_q, 1024))
        block_kv = _snap(sk_pad, min(block_kv, 1024))
    nq = sq_pad // block_q
    nk = sk_pad // block_kv
    # Head packing: run block_h heads per grid step to amortize the fixed
    # per-grid-step cost (~1.5 us measured on v5e) — the dominant term at
    # small seqlens where a head's whole attention fits in one block. Needs
    # whole GQA groups per step so the packed K/V head block aligns 1:1 with
    # the q head block; otherwise fall back to 1 (the round-2 layout).
    block_h = getattr(block_sizes, "block_h", 1) or 1
    block_h = math.gcd(block_h, h)
    if block_h % group:
        block_h = 1
    block_hk = block_h // group if block_h > 1 else 1
    if block_h > 1:
        def k_head_idx(h_):
            return h_  # kv head blocks align 1:1 with q head blocks
    else:
        def k_head_idx(h_):
            return h_ // group
    grid = (b, h // block_h, nq, nk)

    # Causality folds into a (left, right) band; a sliding window narrows it
    # (normalize_band). The segmented path keeps causal as per-token position
    # compares and only passes the window part of the band.
    band = normalize_band(False if segmented else causal, window)
    if band is not None and not segmented:
        # Clamp K/V index maps so pruned (skipped) blocks re-use an adjacent
        # live block and no DMA is issued for them.
        wl, wr = band
        off = seqlen_k - seqlen_q

        def kv_block_idx(qi, ki):
            lo = 0
            hi = nk - 1
            if wr is not None:
                hi = jnp.maximum(
                    jax.lax.div(qi * block_q + block_q - 1 + off + wr,
                                block_kv), 0)
            if wl is not None:
                lo = jnp.clip(
                    jax.lax.div(qi * block_q + off - wl, block_kv), 0, nk - 1)
            return jnp.clip(ki, lo, jnp.maximum(hi, lo))
    else:
        def kv_block_idx(qi, ki):
            return ki

    q_spec = pl.BlockSpec((1, block_h, block_q, d),
                          lambda b_, h_, qi, ki: (b_, h_, qi, 0))
    k_spec = pl.BlockSpec(
        (1, block_hk, block_kv, d),
        lambda b_, h_, qi, ki: (b_, k_head_idx(h_), kv_block_idx(qi, ki), 0),
    )
    v_spec = pl.BlockSpec(
        (1, block_hk, block_kv, d),
        lambda b_, h_, qi, ki: (b_, k_head_idx(h_), kv_block_idx(qi, ki), 0),
    )
    in_specs = [q_spec, k_spec, v_spec]
    inputs = [q, k, v]
    if segmented:
        # Segment-aware block skipping (ops.segments): per-(batch, q-block)
        # [lo, hi] kv-block ranges ride in as scalar prefetch; index maps
        # clamp the kv block index into the live range so out-of-range grid
        # steps re-use a block and their DMA is elided, and the kernel skips
        # their compute. Replaces round 1's full-dense segmented cost.
        kv_lo, kv_hi = segments.block_ranges(
            q_seg, q_pos, kv_seg, kv_pos, block_q, block_kv, causal=causal,
            causal_dir="kv_le_q")

        def kv_idx_seg(b_, qi, ki, lo_ref, hi_ref):
            return segments.clamp_for_dma(
                ki, lo_ref[b_, qi], hi_ref[b_, qi], nk)

        # Per-token metadata is stored (b, 8, s_pad) — 8 broadcast sublanes so
        # the (1, 8, block) BlockSpec satisfies TPU (8, 128) tiling.
        seg_specs = [
            pl.BlockSpec((1, 8, block_q),
                         lambda b_, h_, qi, ki, lo, hi: (b_, 0, qi)),
            pl.BlockSpec((1, 8, block_kv),
                         lambda b_, h_, qi, ki, lo, hi:
                         (b_, 0, kv_idx_seg(b_, qi, ki, lo, hi))),
            pl.BlockSpec((1, 8, block_q),
                         lambda b_, h_, qi, ki, lo, hi: (b_, 0, qi)),
            pl.BlockSpec((1, 8, block_kv),
                         lambda b_, h_, qi, ki, lo, hi:
                         (b_, 0, kv_idx_seg(b_, qi, ki, lo, hi))),
        ]
        q_spec = pl.BlockSpec(
            (1, block_h, block_q, d),
            lambda b_, h_, qi, ki, lo, hi: (b_, h_, qi, 0))
        k_spec = pl.BlockSpec(
            (1, block_hk, block_kv, d),
            lambda b_, h_, qi, ki, lo, hi:
            (b_, k_head_idx(h_), kv_idx_seg(b_, qi, ki, lo, hi), 0))
        v_spec = pl.BlockSpec(
            (1, block_hk, block_kv, d),
            lambda b_, h_, qi, ki, lo, hi:
            (b_, k_head_idx(h_), kv_idx_seg(b_, qi, ki, lo, hi), 0))
        in_specs = seg_specs + [q_spec, k_spec, v_spec]
        to8 = lambda x: jnp.broadcast_to(x[:, None, :], (x.shape[0], 8, x.shape[1]))
        inputs = [to8(q_seg), to8(kv_seg), to8(q_pos), to8(kv_pos)] + inputs

    out_shape = [
        jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
        # LSE (b, h, 8, sq): q rows on lanes, 8 broadcast sublanes.
        jax.ShapeDtypeStruct((b, h, 8, sq_pad), jnp.float32),
    ]
    if segmented:
        out_specs = [
            pl.BlockSpec((1, block_h, block_q, d),
                         lambda b_, h_, qi, ki, lo, hi: (b_, h_, qi, 0)),
            pl.BlockSpec((1, block_h, 8, block_q),
                         lambda b_, h_, qi, ki, lo, hi: (b_, h_, 0, qi)),
        ]
    else:
        out_specs = [
            pl.BlockSpec((1, block_h, block_q, d),
                         lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
            pl.BlockSpec((1, block_h, 8, block_q),
                         lambda b_, h_, qi, ki: (b_, h_, 0, qi)),
        ]

    block_kv_inner = min(getattr(block_sizes, "block_kv_inner", block_kv)
                         or block_kv, block_kv)
    if block_kv % block_kv_inner:
        # block_kv was clamped to sk_pad above; a non-dividing inner tile
        # would silently truncate the sub-tile loop (ADVICE r1). Snap to the
        # largest common divisor (both are 128-multiples, so gcd is too).
        block_kv_inner = math.gcd(block_kv, block_kv_inner)
    block_q_inner = min(getattr(block_sizes, "block_q_inner", block_q)
                        or block_q, block_q)
    if block_q % block_q_inner:
        block_q_inner = math.gcd(block_q, block_q_inner)
    # Single-kv-block specialization (VERDICT r2 #2): when the whole K/V
    # sequence fits one block there is no cross-grid-step softmax state, so
    # the online-softmax (m, l, acc) stays in SSA values and the m/l/acc
    # VMEM scratch (and its per-cell init + epilogue re-read) disappears.
    one_shot = (nk == 1) and not segmented
    kernel = functools.partial(
        _fwd_kernel,
        sm_scale=sm_scale,
        causal=causal,
        band=band,
        segmented=segmented,
        seqlen_q=seqlen_q,
        seqlen_k=seqlen_k,
        block_q=block_q,
        block_kv=block_kv,
        block_kv_inner=block_kv_inner,
        block_q_inner=block_q_inner,
        block_h=block_h,
        group=group,
        empty_lse=empty_lse,
        softcap=softcap,
        force_branch=force_branch,
        one_shot=one_shot,
    )

    scratch_shapes = [] if one_shot else [
        pltpu.VMEM((block_h, block_q, LANES), jnp.float32),  # running max m
        pltpu.VMEM((block_h, block_q, LANES), jnp.float32),  # running sum l
        pltpu.VMEM((block_h, block_q, d), jnp.float32),      # output accum
    ]
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
    )
    cost_estimate = pl.CostEstimate(
        flops=int(4 * b * h * sq_pad * sk_pad * d * (0.5 if causal else 1.0)),
        bytes_accessed=(
            q.size * q.dtype.itemsize
            + k.size * k.dtype.itemsize * (h // hk)
            + v.size * v.dtype.itemsize * (h // hk)
            + b * h * sq_pad * d * q.dtype.itemsize
        ),
        transcendentals=b * h * sq_pad * sk_pad,
    )
    if segmented:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        o, lse = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=compiler_params,
            cost_estimate=cost_estimate,
            interpret=interpret,
            debug=debug,
        )(kv_lo, kv_hi, *inputs)
    else:
        o, lse = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            compiler_params=compiler_params,
            cost_estimate=cost_estimate,
            interpret=interpret,
            debug=debug,
        )(*inputs)
    return o, lse[:, :, 0, :]
