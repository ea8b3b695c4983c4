"""Flash-attention backward (Pallas / TPU).

TPU-native re-design of the reference's three-part recompute backward
(``/root/reference/src/flash_bwd_launch_template.h:70-146``):

* [K1] ``D = rowsum(dO ∘ O)`` (flash_bwd_preprocess_kernel.h:24-96) is plain
  JAX — a fused elementwise+reduce XLA does optimally; no kernel needed.
* [K2] dQ kernel (flash_bwd_kernel.h:29-838): grid over q blocks, streams K/V
  blocks innermost, recomputes S = scale·QKᵀ and dP = dO·Vᵀ, forms
  P = exp(S − LSE), dS = P∘(dP − D), accumulates dQ += dS·K, and applies the
  final ``scale`` rescale in the epilogue (flash_bwd_kernel.h:764-766).
* [K3] dK/dV kernel (flash_bwd_kernel.h:843-1676): grid over kv blocks,
  streams q blocks ascending; dV += Pᵀ·dO, dK += dSᵀ·Q. Instead of the
  reference's host-side GQA expand-then-reduce (flash_api.cpp:265-272,
  301-312), the GQA group is an extra inner reduction dimension of the grid,
  so dK/dV are accumulated per **kv head** directly in VMEM scratch.

Like the reference (and unlike FA2), there are **no atomics and no dq-accum
buffer**: K2 owns dQ rows, K3 owns dK/dV columns, trading recompute FLOPs for
zero contention — the natural Pallas decomposition.

P is formed from the saved LSE (= m + log l), so it is the already-normalized
softmax probability; fully-masked rows (LSE = 0 sentinel) yield P = 0 via the
mask and contribute nothing.
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
from flash_attention_tpu.ops.flash_fwd import normalize_band

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
from flash_attention_tpu.ops._mxu import matmul_precision as _precision

LANES = 128


def _mask_scores(
    s, qi, ki, block_q, block_kv, *, causal, segmented,
    seqlen_q, seqlen_k, n_kv_blocks, band=None,
    q_seg=None, kv_seg=None, q_pos=None, kv_pos=None,
    col0=None, row0=None,
):
    """Set masked-out lanes of the (block_q, block_kv) score tile to
    MASK_VALUE. p = exp(s - lse) then underflows to exactly 0 on masked
    lanes (and on fully-masked rows, whose lse is the 0 sentinel), so callers
    need no second select. Under causal the OOB-column (padding) mask is
    implied by the causal compare in global coordinates.

    ``band`` is the normalized (left, right) window (flash_fwd.normalize_band
    output): for the dense path causal is already folded into it (right = 0);
    for the segmented path it holds only the window part and applies over
    per-token positions alongside the causal position compare.

    Segment/position args are 1D (block,) vectors (already sliced from their
    (b, 8, s) refs). ``col0``/``row0`` override the global coordinates of
    s[0, 0] (sub-tile sweeps pass block-base + sub offsets); they default to
    the whole-block coordinates."""
    s_shape = s.shape
    if col0 is None:
        col0 = ki * block_kv
    if row0 is None:
        row0 = qi * block_q

    def apply_mask(s):
        if segmented:
            qs = jax.lax.broadcast_in_dim(q_seg, s_shape, (0,))
            ks = jax.lax.broadcast_in_dim(kv_seg, s_shape, (1,))
            mask = qs == ks  # pad tokens carry sentinel segs (-1/-2): masked
            if causal or band is not None:
                qp = jax.lax.broadcast_in_dim(q_pos, s_shape, (0,))
                kp = jax.lax.broadcast_in_dim(kv_pos, s_shape, (1,))
                if causal:
                    mask &= kp <= qp
                if band is not None:
                    wl, wr = band
                    if wl is not None:
                        mask &= kp >= qp - wl
                    if wr is not None:
                        mask &= kp <= qp + wr
        elif band is not None:
            # banded (causal and/or sliding-window): rel = col - row - off;
            # live iff -left <= rel <= right. right <= 0 implies the
            # OOB-column mask (col >= seqlen_k gives rel >= 1 for real rows).
            wl, wr = band
            col_ids = jax.lax.broadcasted_iota(jnp.int32, s_shape, 1)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, s_shape, 0)
            rel = ((col0 + col_ids) - (row0 + row_ids)
                   - (seqlen_k - seqlen_q))
            mask = None
            if wr is not None:
                mask = rel <= wr
            if wl is not None:
                lo = rel >= -wl
                mask = lo if mask is None else mask & lo
            if wr is None or wr > 0:
                mask &= (col0 + col_ids) < seqlen_k
        elif causal:
            # col >= seqlen_k implies col - row > off for every real row, so
            # one compare covers the padding mask too. (Pad q rows may pass
            # garbage; their do/dq contributions are zero/sliced.)
            col_ids = jax.lax.broadcasted_iota(jnp.int32, s_shape, 1)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, s_shape, 0)
            off = seqlen_k - seqlen_q
            mask = (col0 + col_ids) - (row0 + row_ids) <= off
        else:
            col_ids = jax.lax.broadcasted_iota(jnp.int32, s_shape, 1)
            mask = (col0 + col_ids) < seqlen_k
        return jnp.where(mask, s, MASK_VALUE)

    # Apply unconditionally: a dynamic lax.cond here turns the enclosing
    # pl.when(should_run) into full predicated execution and defeats causal
    # block skipping entirely (measured: causal == dense wall-clock).
    if (segmented or causal or band is not None
            or seqlen_k != block_kv * n_kv_blocks):
        return apply_mask(s)
    return s


def _di_kernel(o_ref, do_ref, di_ref):
    """[K1] D = rowsum(dO ∘ O) (flash_bwd_preprocess_kernel.h:24-96).

    Computed as the DIAGONAL of dO·Oᵀ with the matmul done in the *input
    dtype* — the exact same MXU contraction (dtype, pass structure, tree
    order over head_dim) as dP = dO·Vᵀ in K2/K3. When attention is fully
    concentrated on one key (O row ≡ V row), dP and D are then sums of the
    same exact fp32 products in the same order, so dS = P∘(dP − D) cancels
    bitwise, exactly as the reference's kernels do. Anything else leaves
    ~1e-7 noise that fails the mean_rel parity gate on degenerate shapes:
    a VPU tree-reduce of dO∘O differs from the MXU tree, and an fp32
    dot-with-ones of the fp32 products uses the multi-pass fp32 MXU
    decomposition, which does not match a single-pass bf16 dP (bf16 suite).

    Diagonal extraction is a masked rowsum — summing one nonzero fp32 per
    row is exact in any reduction order, so it cannot perturb the value.
    """
    o = o_ref[0, 0]    # (block_q, d), input dtype
    do = do_ref[0, 0]
    m = jax.lax.dot_general(
        do, o, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_precision(do.dtype),
    )  # (block_q, block_q) fp32
    rows = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    di = jnp.sum(jnp.where(rows == cols, m, 0.0), axis=-1)  # (block_q,)
    # D stored (b, h, 8, sq) — rows on lanes, 8 broadcast sublanes, like LSE.
    di_ref[0, 0] = jnp.broadcast_to(di[None, :], di_ref.shape[2:])


def _dq_kernel(
    *refs,
    sm_scale: float,
    causal: bool,
    band: tuple | None,
    segmented: bool,
    seqlen_q: int,
    seqlen_k: int,
    block_q: int,
    block_kv: int,
    block_kv_inner: int,
    softcap: float | None,
    one_shot: bool,
):
    """[K2] dQ: the same grid/state structure as the forward kernel — kv
    streamed innermost, dq accumulator as the cross-step state — so it gets
    the same three specializations (see flash_fwd._fwd_kernel): SSA one-shot
    when the whole kv sequence fits one block (no VMEM scratch), kv sub-tiles
    (block_kv_inner) bounding the fp32 score tile so block_kv can grow wide,
    and the static (q-band, kv-block) switch pruning causal/window work at
    trace time."""
    if segmented:
        (lo_ref, hi_ref,  # scalar-prefetch (b, nq): live kv-block range
         q_seg_ref, kv_seg_ref, q_pos_ref, kv_pos_ref,
         q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
         dq_ref, *scr) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
         dq_ref, *scr) = refs
    if not one_shot:
        (acc_scr,) = scr

    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)
    inner = block_kv_inner
    nsubs = block_kv // inner
    d = q_ref.shape[-1]

    if not one_shot:
        @pl.when(ki == 0)
        def _init():
            acc_scr[...] = jnp.zeros_like(acc_scr)

    def _broadcast_rowstats():
        # lse/di are (bq,) lane vectors; broadcast along rows — column-
        # constant, so ONE relayout serves every sub-tile of a sweep.
        lse = jax.lax.broadcast_in_dim(
            lse_ref[0, 0, 0, :], (block_q, inner), (0,))
        di = jax.lax.broadcast_in_dim(
            di_ref[0, 0, 0, :], (block_q, inner), (0,))
        return lse, di

    def _step(sub, masked, acc, lse, di):
        q = q_ref[0, 0]    # (bq, d)
        do = do_ref[0, 0]
        k = k_ref[0, 0, pl.ds(sub * inner, inner), :]  # (inner, d)
        v = v_ref[0, 0, pl.ds(sub * inner, inner), :]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_precision(q.dtype),
        ) * sm_scale
        if softcap is not None:
            # recompute the fwd capping; keep tanh for the chain-rule factor
            t = jnp.tanh(s * (1.0 / softcap))
            s = softcap * t
        if masked:
            need_pos = segmented and (causal or band is not None)
            sl = pl.ds(sub * inner, inner)
            s = _mask_scores(
                s, qi, ki, block_q, block_kv,
                causal=causal, band=band, segmented=segmented,
                seqlen_q=seqlen_q, seqlen_k=seqlen_k, n_kv_blocks=nk,
                q_seg=q_seg_ref[0, 0, :] if segmented else None,
                kv_seg=kv_seg_ref[0, 0, sl] if segmented else None,
                q_pos=q_pos_ref[0, 0, :] if need_pos else None,
                kv_pos=kv_pos_ref[0, 0, sl] if need_pos else None,
                col0=ki * block_kv + sub * inner,
            )
        p = jnp.exp(s - lse)  # normalized probs; masked lanes underflow to 0
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_precision(do.dtype),
        )
        ds = p * (dp - di)
        if softcap is not None:
            # d(cap·tanh(x/cap))/dx = 1 - tanh²; masked lanes have p = 0 so
            # their (garbage-t) product is still exactly 0
            ds = ds * (1.0 - t * t)
        return acc + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_precision(k.dtype),
        )

    def _acc_load():
        if one_shot:
            return jnp.zeros((block_q, d), jnp.float32)
        return acc_scr[...]

    def _acc_save(acc):
        if one_shot:
            dq_ref[0, 0] = (acc * sm_scale).astype(dq_ref.dtype)
        else:
            acc_scr[...] = acc

    def _run(masked, n_live=None):
        acc = _acc_load()
        lse, di = _broadcast_rowstats()
        for sub in range(nsubs if n_live is None else n_live):
            acc = _step(sub, masked, acc, lse, di)
        _acc_save(acc)

    if band is not None and not segmented:
        wl, wr = band
        off = seqlen_k - seqlen_q
        should_run = True
        if wr is not None:
            should_run &= ki * block_kv <= qi * block_q + block_q - 1 + off + wr
        if wl is not None:
            should_run &= (ki * block_kv + block_kv - 1
                           >= qi * block_q + off - wl)

        # static (q-band, kv-block) switch — see flash_fwd for the analysis
        nq_static = pl.num_programs(2)
        band_switch = nq_static > 1 and nk <= 2
        gsubs = nsubs * nk

        def _band_branch(b, ki_s, gq):
            lo_row = b * gq * block_q
            hi_row = min((b + 1) * gq, nq_static) * block_q - 1
            glo, ghi = 0, gsubs
            if wr is not None:
                ghi = min(gsubs, max(0, (hi_row + off + wr) // inner + 1))
            if wr is None or wr > 0:
                ghi = min(ghi, -(-seqlen_k // inner))
            if wl is not None:
                glo = min(gsubs, max(0, (lo_row + off - wl) // inner))
            sub_lo = min(max(glo - ki_s * nsubs, 0), nsubs)
            sub_hi = min(max(ghi - ki_s * nsubs, 0), nsubs)
            if sub_lo >= sub_hi and not one_shot:
                return lambda: None

            def branch():
                acc = _acc_load()
                lse, di = _broadcast_rowstats()
                for sub in range(sub_lo, sub_hi):
                    col_first = (ki_s * nsubs + sub) * inner
                    col_last = col_first + inner - 1
                    live = col_last < seqlen_k
                    if wr is not None:
                        live &= col_last <= lo_row + off + wr
                    if wl is not None:
                        live &= col_first >= hi_row + off - wl
                    acc = _step(sub, not live, acc, lse, di)
                _acc_save(acc)
            return branch

        if band_switch:
            gq = -(-nq_static // 8)
            jax.lax.switch((qi // gq) * nk + ki,
                           [_band_branch(b, k_, gq)
                            for b in range(-(-nq_static // gq))
                            for k_ in range(nk)])
        elif one_shot:
            _run(True)
        else:
            jax.lax.cond(should_run, functools.partial(_run, True),
                         lambda: None)
    elif segmented:
        # segment-aware block skipping (ops.segments; VERDICT r1 weak #5)
        bi = pl.program_id(0)
        should_run = (ki >= lo_ref[bi, qi]) & (ki <= hi_ref[bi, qi])
        jax.lax.cond(should_run, functools.partial(_run, True), lambda: None)
    elif seqlen_k != block_kv * nk:
        # only the padded tail block needs masking, and only its first
        # ceil(live / inner) sub-tiles hold real columns (both static)
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
            dq_ref[0, 0] = (acc_scr[...] * sm_scale).astype(dq_ref.dtype)


def _dkv_kernel(
    *refs,
    sm_scale: float,
    causal: bool,
    band: tuple | None,
    segmented: bool,
    seqlen_q: int,
    seqlen_k: int,
    block_q: int,
    block_kv: int,
    block_q_inner: int,
    softcap: float | None,
    one_shot: bool,
):
    """[K3] dK/dV: the mirror of _dq_kernel — q streamed innermost (after
    the GQA group dim), dk/dv accumulators as the cross-step state. Same
    three specializations, mirrored: SSA one-shot when the whole q sequence
    is one block AND the GQA group is 1, q sub-tiles (block_q_inner)
    bounding the fp32 score tile so block_q can grow wide, and a static
    (kv-band, q-block) switch bounding the live q sub-range per kv band.
    Padded q rows are zeros (p finite, do = 0, di = 0), so every skipped or
    unmasked treatment of them contributes exactly 0 to dk/dv."""
    if segmented:
        (qlo_ref, qhi_ref,  # scalar-prefetch (b, nk): live q-block range
         q_seg_ref, kv_seg_ref, q_pos_ref, kv_pos_ref,
         q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
         dk_ref, dv_ref, *scr) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
         dk_ref, dv_ref, *scr) = refs
    if not one_shot:
        dk_scr, dv_scr = scr

    ki = pl.program_id(2)
    g = pl.program_id(3)
    qi = pl.program_id(4)
    nk_static = pl.num_programs(2)
    ngroup = pl.num_programs(3)
    nq = pl.num_programs(4)
    inner = block_q_inner
    nsubs = block_q // inner
    d = q_ref.shape[-1]

    if not one_shot:
        @pl.when((g == 0) & (qi == 0))
        def _init():
            dk_scr[...] = jnp.zeros_like(dk_scr)
            dv_scr[...] = jnp.zeros_like(dv_scr)

    def _step(sub, masked, dk, dv):
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        q = q_ref[0, 0, pl.ds(sub * inner, inner), :]   # (inner, d)
        do = do_ref[0, 0, pl.ds(sub * inner, inner), :]
        rsl = pl.ds(sub * inner, inner)
        lse = jax.lax.broadcast_in_dim(
            lse_ref[0, 0, 0, rsl], (inner, block_kv), (0,))
        di = jax.lax.broadcast_in_dim(
            di_ref[0, 0, 0, rsl], (inner, block_kv), (0,))

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_precision(q.dtype),
        ) * sm_scale
        if softcap is not None:
            t = jnp.tanh(s * (1.0 / softcap))
            s = softcap * t
        if masked:
            need_pos = segmented and (causal or band is not None)
            s = _mask_scores(
                s, qi, ki, block_q, block_kv,
                causal=causal, band=band, segmented=segmented,
                seqlen_q=seqlen_q, seqlen_k=seqlen_k,
                n_kv_blocks=nk_static,
                q_seg=q_seg_ref[0, 0, rsl] if segmented else None,
                kv_seg=kv_seg_ref[0, 0, :] if segmented else None,
                q_pos=q_pos_ref[0, 0, rsl] if need_pos else None,
                kv_pos=kv_pos_ref[0, 0, :] if need_pos else None,
                row0=qi * block_q + sub * inner,
            )
        p = jnp.exp(s - lse)  # (inner, bkv); masked lanes underflow to 0
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_precision(do.dtype),
        )
        ds = p * (dp - di)
        if softcap is not None:
            ds = ds * (1.0 - t * t)  # tanh chain rule (see _dq_kernel)
        # dV += Pᵀ·dO ; dK += dSᵀ·Q  (transposes via dot dimension numbers —
        # the analogue of the reference's transposed smem views,
        # kernel_traits.h:165-204)
        dv = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_precision(do.dtype),
        )
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_precision(q.dtype),
        )
        return dk, dv

    def _state_load():
        if one_shot:
            return (jnp.zeros((block_kv, d), jnp.float32),
                    jnp.zeros((block_kv, d), jnp.float32))
        return dk_scr[...], dv_scr[...]

    def _state_save(dk, dv):
        if one_shot:
            dk_ref[0, 0] = (dk * sm_scale).astype(dk_ref.dtype)
            dv_ref[0, 0] = dv.astype(dv_ref.dtype)
        else:
            dk_scr[...] = dk
            dv_scr[...] = dv

    def _run(masked):
        dk, dv = _state_load()
        for sub in range(nsubs):
            dk, dv = _step(sub, masked, dk, dv)
        _state_save(dk, dv)

    if band is not None and not segmented:
        # a col c is seen by rows r with c - off - right <= r <= c - off + left
        wl, wr = band
        off = seqlen_k - seqlen_q
        should_run = True
        if wr is not None:
            should_run &= (qi * block_q + block_q - 1
                           >= ki * block_kv - off - wr)
        if wl is not None:
            should_run &= (qi * block_q
                           <= ki * block_kv + block_kv - 1 - off + wl)

        # static (kv-band, q-block) switch — the mirror of _dq_kernel's
        band_switch = nk_static > 1 and nq <= 2
        gsubs = nsubs * nq
        kv_tail_oob = seqlen_k != block_kv * nk_static

        def _band_branch(b, qi_s, gk):
            lo_col = b * gk * block_kv
            hi_col = min((b + 1) * gk, nk_static) * block_kv - 1
            glo, ghi = 0, gsubs
            if wr is not None:
                glo = min(gsubs, max(0, (lo_col - off - wr) // inner))
            if wl is not None:
                ghi = min(gsubs, max(0, (hi_col - off + wl) // inner + 1))
            sub_lo = min(max(glo - qi_s * nsubs, 0), nsubs)
            sub_hi = min(max(ghi - qi_s * nsubs, 0), nsubs)
            if sub_lo >= sub_hi and not one_shot:
                return lambda: None

            def branch():
                dk, dv = _state_load()
                for sub in range(sub_lo, sub_hi):
                    row_first = (qi_s * nsubs + sub) * inner
                    row_last = row_first + inner - 1
                    # unmasked iff live for every (row, col) pair of the
                    # band's blocks — incl. real cols only on the kv tail
                    live = not (kv_tail_oob and hi_col >= seqlen_k)
                    if wr is not None:
                        live &= row_first >= hi_col - off - wr
                    if wl is not None:
                        live &= row_last <= lo_col - off + wl
                    dk, dv = _step(sub, not live, dk, dv)
                _state_save(dk, dv)
            return branch

        if band_switch:
            gk = -(-nk_static // 8)
            jax.lax.switch((ki // gk) * nq + qi,
                           [_band_branch(b, q_, gk)
                            for b in range(-(-nk_static // gk))
                            for q_ in range(nq)])
        elif one_shot:
            _run(True)
        else:
            jax.lax.cond(should_run, functools.partial(_run, True),
                         lambda: None)
    elif segmented:
        bi = pl.program_id(0)
        should_run = (qi >= qlo_ref[bi, ki]) & (qi <= qhi_ref[bi, ki])
        jax.lax.cond(should_run, functools.partial(_run, True), lambda: None)
    elif seqlen_k != block_kv * nk_static:
        # the owned kv block's padded tail cols need masking (ki parallel)
        if one_shot:
            _run(True)
        else:
            jax.lax.cond(ki == nk_static - 1,
                         functools.partial(_run, True),
                         functools.partial(_run, False))
    else:
        _run(False)

    if not one_shot:
        @pl.when((g == ngroup - 1) & (qi == nq - 1))
        def _store():
            dk_ref[0, 0] = (dk_scr[...] * sm_scale).astype(dk_ref.dtype)
            dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "block_sizes", "seqlen_q", "seqlen_k",
        "window", "softcap", "interpret", "debug", "parts",
    ),
)
def flash_bwd(
    q,    # (b, h, sq_pad, d)
    k,    # (b, hk, sk_pad, d)
    v,
    o,    # (b, h, sq_pad, d)
    lse,  # (b, h, sq_pad) f32
    do,   # (b, h, sq_pad, d)
    q_seg=None,
    kv_seg=None,
    q_pos=None,
    kv_pos=None,
    *,
    causal: bool,
    sm_scale: float,
    block_sizes: BlockSizes,
    seqlen_q: int,
    seqlen_k: int,
    window: tuple | None = None,  # sliding window (left, right); < 0 entries
    # mean unbounded (see flash_fwd.normalize_band)
    softcap: float | None = None,  # logit soft-capping; must match the fwd
    interpret: bool = False,
    debug: bool = False,
    parts: str = "all",
):
    """Returns (dq, dk, dv) with dq (b,h,sq_pad,d), dk/dv (b,hk,sk_pad,d).

    ``parts`` is a profiling hook (the analogue of the reference timing
    dot_do_o/dq/dk_dv separately, utils/plot_kernels.py:139-151): "di" runs
    only [K1] and returns di; "dq" runs [K1]+[K2] and returns dq; "all"
    (default) runs everything.
    """
    b, h, sq_pad, d = q.shape
    _, hk, sk_pad, _ = k.shape
    group = h // hk
    segmented = q_seg is not None

    def _snap_block(pad_len: int, cap: int) -> int:
        """Largest block <= cap that DIVIDES pad_len (pad_len is always a
        multiple of 128, so 128 is a universal fallback). A non-dividing
        block makes the grid floor-divide and silently skip the tail rows —
        on TPU the skipped output rows are uninitialized HBM garbage
        (found by the first compiled-on-chip suite run at seqlens 640/384)."""
        bq = min(pad_len, cap)
        while pad_len % bq:
            bq -= 128
        return bq

    # [K1] D = rowsum(dO ∘ O) per query row, fp32, broadcast along LANES
    # (the LSE/di layout is (b, h, sq, LANES) so blocks satisfy (8, 128)
    # tiling; only lane 0 is read). See _di_kernel for why this is a Pallas
    # dot and not jnp.sum.
    # Capped at 256: the diag-of-dO·Oᵀ needs a (bq, bq) fp32 tile, and at
    # 256 K1 stays ~1% of total bwd MACs.
    bq_di = _snap_block(sq_pad, min(block_sizes.block_q_dq, 256))
    di = pl.pallas_call(
        _di_kernel,
        grid=(b, h, sq_pad // bq_di),
        in_specs=[
            pl.BlockSpec((1, 1, bq_di, d), lambda b_, h_, qi: (b_, h_, qi, 0)),
            pl.BlockSpec((1, 1, bq_di, d), lambda b_, h_, qi: (b_, h_, qi, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 8, bq_di), lambda b_, h_, qi: (b_, h_, 0, qi)),
        out_shape=jax.ShapeDtypeStruct((b, h, 8, sq_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(o, do)
    if parts == "di":
        return di
    # lse arrives (b, h, sq); expand to the kernels' (b, h, 8, sq) layout.
    lse = jnp.broadcast_to(
        lse.astype(jnp.float32)[:, :, None, :], (b, h, 8, sq_pad))

    def to8(x):
        return jnp.broadcast_to(x[:, None, :], (x.shape[0], 8, x.shape[1]))

    # causal folds into the band for the dense path; segmented keeps causal
    # as position compares and only takes the window part (see flash_fwd).
    band = normalize_band(False if segmented else causal, window)
    common = dict(
        sm_scale=sm_scale, causal=causal, band=band, segmented=segmented,
        seqlen_q=seqlen_q, seqlen_k=seqlen_k, softcap=softcap,
    )

    # f32 operands double every block's footprint AND the in-kernel
    # s/p/dp/ds intermediates ((bq, bkv) f32 each): 1024x1024 f32 blocks
    # blow the 16MB VMEM scoped limit on v5e (measured: 17.84M requested).
    # The f32 path is the fp16-upcast parity path, not the perf path, so
    # halve its blocks; bf16 keeps the tuned 1024s.
    f32_cap = 512 if q.dtype == jnp.float32 else 1 << 30

    # ------------------------- [K2] dQ -------------------------
    bq = _snap_block(sq_pad, min(block_sizes.block_q_dq, f32_cap))
    bkv = _snap_block(sk_pad, min(block_sizes.block_kv_dq, f32_cap))
    nq, nk = sq_pad // bq, sk_pad // bkv
    bkv_inner = min(getattr(block_sizes, "block_kv_dq_inner", bkv) or bkv, bkv)
    if bkv % bkv_inner:
        bkv_inner = math.gcd(bkv, bkv_inner)
    dq_one_shot = (nk == 1) and not segmented

    if band is not None and not segmented:
        # clamp streamed kv-block indices into the band's live range so
        # pruned blocks re-use an adjacent block and their DMA is elided
        wl_b, wr_b = band
        off = seqlen_k - seqlen_q

        def kv_idx(qi, ki):
            lo = 0
            hi = nk - 1
            if wr_b is not None:
                hi = jnp.maximum(
                    jax.lax.div(qi * bq + bq - 1 + off + wr_b, bkv), 0)
            if wl_b is not None:
                lo = jnp.clip(jax.lax.div(qi * bq + off - wl_b, bkv),
                              0, nk - 1)
            return jnp.clip(ki, lo, jnp.maximum(hi, lo))
    else:
        def kv_idx(qi, ki):
            return ki

    dq_in_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),      # q
        pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, qi, ki: (b_, h_ // group, kv_idx(qi, ki), 0)),  # k
        pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, qi, ki: (b_, h_ // group, kv_idx(qi, ki), 0)),  # v
        pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),  # do
        pl.BlockSpec((1, 1, 8, bq), lambda b_, h_, qi, ki: (b_, h_, 0, qi)),  # lse
        pl.BlockSpec((1, 1, 8, bq), lambda b_, h_, qi, ki: (b_, h_, 0, qi)),  # di
    ]
    dq_inputs = [q, k, v, do, lse, di]
    dq_kernel = functools.partial(_dq_kernel, block_q=bq, block_kv=bkv,
                                  block_kv_inner=bkv_inner,
                                  one_shot=dq_one_shot, **common)
    dq_compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
    )
    if segmented:
        # segment-aware kv-block skipping (ops.segments): compute the live
        # [lo, hi] kv-block range per (batch, q-block), gate the kernel on it
        # and clamp the streamed index maps so pruned DMAs are elided.
        kv_lo, kv_hi = segments.block_ranges(
            q_seg, q_pos, kv_seg, kv_pos, bq, bkv,
            causal=causal, causal_dir="kv_le_q")

        def kv_idx_seg(b_, qi, ki, lo, hi):
            return segments.clamp_for_dma(ki, lo[b_, qi], hi[b_, qi], nk)

        dq_in_specs = [
            pl.BlockSpec((1, 8, bq),
                         lambda b_, h_, qi, ki, lo, hi: (b_, 0, qi)),
            pl.BlockSpec((1, 8, bkv),
                         lambda b_, h_, qi, ki, lo, hi:
                         (b_, 0, kv_idx_seg(b_, qi, ki, lo, hi))),
            pl.BlockSpec((1, 8, bq),
                         lambda b_, h_, qi, ki, lo, hi: (b_, 0, qi)),
            pl.BlockSpec((1, 8, bkv),
                         lambda b_, h_, qi, ki, lo, hi:
                         (b_, 0, kv_idx_seg(b_, qi, ki, lo, hi))),
            pl.BlockSpec((1, 1, bq, d),
                         lambda b_, h_, qi, ki, lo, hi: (b_, h_, qi, 0)),
            pl.BlockSpec((1, 1, bkv, d),
                         lambda b_, h_, qi, ki, lo, hi:
                         (b_, h_ // group, kv_idx_seg(b_, qi, ki, lo, hi), 0)),
            pl.BlockSpec((1, 1, bkv, d),
                         lambda b_, h_, qi, ki, lo, hi:
                         (b_, h_ // group, kv_idx_seg(b_, qi, ki, lo, hi), 0)),
            pl.BlockSpec((1, 1, bq, d),
                         lambda b_, h_, qi, ki, lo, hi: (b_, h_, qi, 0)),
            pl.BlockSpec((1, 1, 8, bq),
                         lambda b_, h_, qi, ki, lo, hi: (b_, h_, 0, qi)),
            pl.BlockSpec((1, 1, 8, bq),
                         lambda b_, h_, qi, ki, lo, hi: (b_, h_, 0, qi)),
        ]
        dq_inputs = [to8(q_seg), to8(kv_seg), to8(q_pos), to8(kv_pos)] + dq_inputs
        dq = pl.pallas_call(
            dq_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(b, h, nq, nk),
                in_specs=dq_in_specs,
                out_specs=pl.BlockSpec(
                    (1, 1, bq, d),
                    lambda b_, h_, qi, ki, lo, hi: (b_, h_, qi, 0)),
                scratch_shapes=(
                    [] if dq_one_shot else [pltpu.VMEM((bq, d), jnp.float32)]),
            ),
            out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
            compiler_params=dq_compiler_params,
            interpret=interpret,
            debug=debug,
        )(kv_lo, kv_hi, *dq_inputs)
    else:
        dq = pl.pallas_call(
            dq_kernel,
            grid=(b, h, nq, nk),
            in_specs=dq_in_specs,
            out_specs=pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
            scratch_shapes=(
                [] if dq_one_shot else [pltpu.VMEM((bq, d), jnp.float32)]),
            compiler_params=dq_compiler_params,
            interpret=interpret,
            debug=debug,
        )(*dq_inputs)

    if parts == "dq":
        return dq

    # ------------------------- [K3] dK/dV -------------------------
    bq = _snap_block(sq_pad, min(block_sizes.block_q_dkv, f32_cap))
    bkv = _snap_block(sk_pad, min(block_sizes.block_kv_dkv, f32_cap))
    nq, nk = sq_pad // bq, sk_pad // bkv
    bq_inner = min(getattr(block_sizes, "block_q_dkv_inner", bq) or bq, bq)
    if bq % bq_inner:
        bq_inner = math.gcd(bq, bq_inner)
    dkv_one_shot = (nq == 1) and (group == 1) and not segmented

    if band is not None and not segmented:
        wl_b, wr_b = band
        off = seqlen_k - seqlen_q

        def q_idx(ki, qi):
            first = 0
            last = nq - 1
            if wr_b is not None:
                first = jax.lax.div(
                    jnp.maximum(ki * bkv - off - wr_b, 0), bq)
                first = jnp.minimum(first, nq - 1)
            if wl_b is not None:
                last = jnp.clip(
                    jax.lax.div(ki * bkv + bkv - 1 - off + wl_b, bq),
                    0, nq - 1)
            return jnp.clip(qi, first, jnp.maximum(last, first))
    else:
        def q_idx(ki, qi):
            return qi

    dkv_in_specs = [
        pl.BlockSpec((1, 1, bq, d),
                     lambda b_, hk_, ki, g, qi: (b_, hk_ * group + g, q_idx(ki, qi), 0)),  # q
        pl.BlockSpec((1, 1, bkv, d), lambda b_, hk_, ki, g, qi: (b_, hk_, ki, 0)),         # k
        pl.BlockSpec((1, 1, bkv, d), lambda b_, hk_, ki, g, qi: (b_, hk_, ki, 0)),         # v
        pl.BlockSpec((1, 1, bq, d),
                     lambda b_, hk_, ki, g, qi: (b_, hk_ * group + g, q_idx(ki, qi), 0)),  # do
        pl.BlockSpec((1, 1, 8, bq),
                     lambda b_, hk_, ki, g, qi: (b_, hk_ * group + g, 0, q_idx(ki, qi))),  # lse
        pl.BlockSpec((1, 1, 8, bq),
                     lambda b_, hk_, ki, g, qi: (b_, hk_ * group + g, 0, q_idx(ki, qi))),  # di
    ]
    dkv_inputs = [q, k, v, do, lse, di]
    dkv_kernel = functools.partial(_dkv_kernel, block_q=bq, block_kv=bkv,
                                   block_q_inner=bq_inner,
                                   one_shot=dkv_one_shot, **common)
    dkv_out_shape = [
        jax.ShapeDtypeStruct((b, hk, sk_pad, d), k.dtype),
        jax.ShapeDtypeStruct((b, hk, sk_pad, d), v.dtype),
    ]
    dkv_scratch = [] if dkv_one_shot else [
        pltpu.VMEM((bkv, d), jnp.float32),
        pltpu.VMEM((bkv, d), jnp.float32),
    ]
    dkv_compiler_params = pltpu.CompilerParams(
        dimension_semantics=(
            "parallel", "parallel", "parallel", "arbitrary", "arbitrary",
        ),
    )
    if segmented:
        # mirrored metadata: the live [lo, hi] Q-block range per (batch,
        # kv-block) — a kv token is seen by q tokens of its segment with
        # q_pos >= kv_pos (lower-right causal).
        q_lo, q_hi = segments.block_ranges(
            kv_seg, kv_pos, q_seg, q_pos, bkv, bq,
            causal=causal, causal_dir="q_ge_kv")

        def q_idx_seg(b_, ki, qi, lo, hi):
            return segments.clamp_for_dma(qi, lo[b_, ki], hi[b_, ki], nq)

        dkv_in_specs = [
            pl.BlockSpec((1, 8, bq),
                         lambda b_, hk_, ki, g, qi, lo, hi:
                         (b_, 0, q_idx_seg(b_, ki, qi, lo, hi))),
            pl.BlockSpec((1, 8, bkv),
                         lambda b_, hk_, ki, g, qi, lo, hi: (b_, 0, ki)),
            pl.BlockSpec((1, 8, bq),
                         lambda b_, hk_, ki, g, qi, lo, hi:
                         (b_, 0, q_idx_seg(b_, ki, qi, lo, hi))),
            pl.BlockSpec((1, 8, bkv),
                         lambda b_, hk_, ki, g, qi, lo, hi: (b_, 0, ki)),
            pl.BlockSpec((1, 1, bq, d),
                         lambda b_, hk_, ki, g, qi, lo, hi:
                         (b_, hk_ * group + g, q_idx_seg(b_, ki, qi, lo, hi), 0)),
            pl.BlockSpec((1, 1, bkv, d),
                         lambda b_, hk_, ki, g, qi, lo, hi: (b_, hk_, ki, 0)),
            pl.BlockSpec((1, 1, bkv, d),
                         lambda b_, hk_, ki, g, qi, lo, hi: (b_, hk_, ki, 0)),
            pl.BlockSpec((1, 1, bq, d),
                         lambda b_, hk_, ki, g, qi, lo, hi:
                         (b_, hk_ * group + g, q_idx_seg(b_, ki, qi, lo, hi), 0)),
            pl.BlockSpec((1, 1, 8, bq),
                         lambda b_, hk_, ki, g, qi, lo, hi:
                         (b_, hk_ * group + g, 0, q_idx_seg(b_, ki, qi, lo, hi))),
            pl.BlockSpec((1, 1, 8, bq),
                         lambda b_, hk_, ki, g, qi, lo, hi:
                         (b_, hk_ * group + g, 0, q_idx_seg(b_, ki, qi, lo, hi))),
        ]
        dkv_inputs = [to8(q_seg), to8(kv_seg), to8(q_pos), to8(kv_pos)] + dkv_inputs
        dk, dv = pl.pallas_call(
            dkv_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(b, hk, nk, group, nq),
                in_specs=dkv_in_specs,
                out_specs=[
                    pl.BlockSpec((1, 1, bkv, d),
                                 lambda b_, hk_, ki, g, qi, lo, hi:
                                 (b_, hk_, ki, 0)),
                    pl.BlockSpec((1, 1, bkv, d),
                                 lambda b_, hk_, ki, g, qi, lo, hi:
                                 (b_, hk_, ki, 0)),
                ],
                scratch_shapes=dkv_scratch,
            ),
            out_shape=dkv_out_shape,
            compiler_params=dkv_compiler_params,
            interpret=interpret,
            debug=debug,
        )(q_lo, q_hi, *dkv_inputs)
    else:
        dk, dv = pl.pallas_call(
            dkv_kernel,
            grid=(b, hk, nk, group, nq),
            in_specs=dkv_in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, bkv, d), lambda b_, hk_, ki, g, qi: (b_, hk_, ki, 0)),
                pl.BlockSpec((1, 1, bkv, d), lambda b_, hk_, ki, g, qi: (b_, hk_, ki, 0)),
            ],
            out_shape=dkv_out_shape,
            scratch_shapes=dkv_scratch,
            compiler_params=dkv_compiler_params,
            interpret=interpret,
            debug=debug,
        )(*dkv_inputs)

    return dq, dk, dv
