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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_tpu.ops.configs import BlockSizes

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


def _mask_scores(
    s, qi, ki, block_q, block_kv, *, causal, segmented,
    seqlen_q, seqlen_k, n_kv_blocks,
    q_seg=None, kv_seg=None, q_pos=None, kv_pos=None,
):
    """Set masked-out lanes of the (block_q, block_kv) score tile to
    MASK_VALUE. p = exp(s - lse) then underflows to exactly 0 on masked
    lanes (and on fully-masked rows, whose lse is the 0 sentinel), so callers
    need no second select. Under causal the OOB-column (padding) mask is
    implied by the causal compare in global coordinates.

    Segment/position args are 1D (block,) vectors (already sliced from their
    (b, 8, s) refs)."""
    s_shape = s.shape

    def apply_mask(s):
        if segmented:
            qs = jax.lax.broadcast_in_dim(q_seg, s_shape, (0,))
            ks = jax.lax.broadcast_in_dim(kv_seg, s_shape, (1,))
            mask = qs == ks  # pad tokens carry sentinel segs (-1/-2): masked
            if causal:
                qp = jax.lax.broadcast_in_dim(q_pos, s_shape, (0,))
                kp = jax.lax.broadcast_in_dim(kv_pos, s_shape, (1,))
                mask &= kp <= qp
        elif causal:
            # col >= seqlen_k implies col - row > off for every real row, so
            # one compare covers the padding mask too. (Pad q rows may pass
            # garbage; their do/dq contributions are zero/sliced.)
            col_ids = jax.lax.broadcasted_iota(jnp.int32, s_shape, 1)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, s_shape, 0)
            off = seqlen_k - seqlen_q
            mask = (ki * block_kv + col_ids) - (qi * block_q + row_ids) <= off
        else:
            col_ids = jax.lax.broadcasted_iota(jnp.int32, s_shape, 1)
            mask = (ki * block_kv + col_ids) < seqlen_k
        return jnp.where(mask, s, MASK_VALUE)

    # Apply unconditionally: a dynamic lax.cond here turns the enclosing
    # pl.when(should_run) into full predicated execution and defeats causal
    # block skipping entirely (measured: causal == dense wall-clock).
    if segmented or causal or seqlen_k != block_kv * n_kv_blocks:
        return apply_mask(s)
    return s


def _di_kernel(o_ref, do_ref, di_ref):
    """[K1] D = rowsum(dO ∘ O) (flash_bwd_preprocess_kernel.h:24-96).

    Computed as a dot_general against a ones matrix — NOT jnp.sum — so the
    fp32 contraction tree over head_dim is identical to the one the MXU uses
    for dP = dO·Vᵀ in K2/K3. When attention is fully concentrated on one key
    (O ≡ V row), dP − D then cancels bitwise, exactly as the reference's
    kernels do; a VPU tree-reduce would leave ~1e-7 noise that fails the
    mean_rel parity gate on degenerate shapes.
    """
    o = o_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    # ones must span full lanes so the contraction stays an MXU matmul (a
    # matvec could lower to a VPU reduce with a different accumulation tree,
    # breaking the bitwise dP - D cancellation).
    ones = jnp.ones((o.shape[-1], LANES), jnp.float32)
    di = jax.lax.dot_general(
        do * o, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, LANES), all lanes equal
    # D stored (b, h, 8, sq) — rows on lanes, 8 broadcast sublanes, like LSE.
    di_ref[0, 0] = jnp.broadcast_to(di[:, 0][None, :], di_ref.shape[2:])


def _dq_kernel(
    *refs,
    sm_scale: float,
    causal: bool,
    segmented: bool,
    seqlen_q: int,
    seqlen_k: int,
    block_q: int,
    block_kv: int,
):
    if segmented:
        (q_seg_ref, kv_seg_ref, q_pos_ref, kv_pos_ref,
         q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
         dq_ref, acc_scr) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
         dq_ref, acc_scr) = refs

    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if causal and not segmented:
        off = seqlen_k - seqlen_q
        should_run = ki * block_kv <= qi * block_q + block_q - 1 + off
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]    # (bq, d)
        k = k_ref[0, 0]    # (bkv, d)
        v = v_ref[0, 0]
        do = do_ref[0, 0]  # (bq, d)
        # lse/di are (bq,) lane vectors; broadcast along rows (one relayout).
        lse = jax.lax.broadcast_in_dim(
            lse_ref[0, 0, 0, :], (block_q, block_kv), (0,))
        di = jax.lax.broadcast_in_dim(
            di_ref[0, 0, 0, :], (block_q, block_kv), (0,))

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        s = _mask_scores(
            s, qi, ki, block_q, block_kv,
            causal=causal, segmented=segmented,
            seqlen_q=seqlen_q, seqlen_k=seqlen_k, n_kv_blocks=nk,
            q_seg=q_seg_ref[0, 0, :] if segmented else None,
            kv_seg=kv_seg_ref[0, 0, :] if segmented else None,
            q_pos=q_pos_ref[0, 0, :] if (segmented and causal) else None,
            kv_pos=kv_pos_ref[0, 0, :] if (segmented and causal) else None,
        )
        p = jnp.exp(s - lse)  # normalized probs; masked lanes underflow to 0
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di)
        acc_scr[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == nk - 1)
    def _store():
        dq_ref[0, 0] = (acc_scr[...] * sm_scale).astype(dq_ref.dtype)


def _dkv_kernel(
    *refs,
    sm_scale: float,
    causal: bool,
    segmented: bool,
    seqlen_q: int,
    seqlen_k: int,
    block_q: int,
    block_kv: int,
):
    if segmented:
        (q_seg_ref, kv_seg_ref, q_pos_ref, kv_pos_ref,
         q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs

    ki = pl.program_id(2)
    g = pl.program_id(3)
    qi = pl.program_id(4)
    ngroup = pl.num_programs(3)
    nq = pl.num_programs(4)

    @pl.when((g == 0) & (qi == 0))
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    if causal and not segmented:
        # Skip q blocks entirely above the (lower-right) diagonal band for
        # this kv block: need rows r with ki*bkv <= r + off.
        off = seqlen_k - seqlen_q
        should_run = qi * block_q + block_q - 1 >= ki * block_kv - off
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = jax.lax.broadcast_in_dim(
            lse_ref[0, 0, 0, :], (block_q, block_kv), (0,))
        di = jax.lax.broadcast_in_dim(
            di_ref[0, 0, 0, :], (block_q, block_kv), (0,))

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        s = _mask_scores(
            s, qi, ki, block_q, block_kv,
            causal=causal, segmented=segmented,
            seqlen_q=seqlen_q, seqlen_k=seqlen_k,
            n_kv_blocks=pl.num_programs(2),
            q_seg=q_seg_ref[0, 0, :] if segmented else None,
            kv_seg=kv_seg_ref[0, 0, :] if segmented else None,
            q_pos=q_pos_ref[0, 0, :] if (segmented and causal) else None,
            kv_pos=kv_pos_ref[0, 0, :] if (segmented and causal) else None,
        )
        p = jnp.exp(s - lse)  # (bq, bkv); masked lanes underflow to 0
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di)
        # dV += Pᵀ·dO ; dK += dSᵀ·Q  (transposes via dot dimension numbers —
        # the analogue of the reference's transposed smem views,
        # kernel_traits.h:165-204)
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when((g == ngroup - 1) & (qi == nq - 1))
    def _store():
        dk_ref[0, 0] = (dk_scr[...] * sm_scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "block_sizes", "seqlen_q", "seqlen_k",
        "interpret", "debug",
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
    interpret: bool = False,
    debug: bool = False,
):
    """Returns (dq, dk, dv) with dq (b,h,sq_pad,d), dk/dv (b,hk,sk_pad,d)."""
    b, h, sq_pad, d = q.shape
    _, hk, sk_pad, _ = k.shape
    group = h // hk
    segmented = q_seg is not None

    # [K1] D = rowsum(dO ∘ O) per query row, fp32, broadcast along LANES
    # (the LSE/di layout is (b, h, sq, LANES) so blocks satisfy (8, 128)
    # tiling; only lane 0 is read). See _di_kernel for why this is a Pallas
    # dot and not jnp.sum.
    bq_di = min(block_sizes.block_q_dq, sq_pad)
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
    # lse arrives (b, h, sq); expand to the kernels' (b, h, 8, sq) layout.
    lse = jnp.broadcast_to(
        lse.astype(jnp.float32)[:, :, None, :], (b, h, 8, sq_pad))

    def to8(x):
        return jnp.broadcast_to(x[:, None, :], (x.shape[0], 8, x.shape[1]))

    common = dict(
        sm_scale=sm_scale, causal=causal, segmented=segmented,
        seqlen_q=seqlen_q, seqlen_k=seqlen_k,
    )

    # ------------------------- [K2] dQ -------------------------
    bq = min(block_sizes.block_q_dq, sq_pad)
    bkv = min(block_sizes.block_kv_dq, sk_pad)
    nq, nk = sq_pad // bq, sk_pad // bkv

    if causal and not segmented:
        off = seqlen_k - seqlen_q

        def kv_idx(qi, ki):
            last = jax.lax.div(qi * bq + bq - 1 + off, bkv)
            return jnp.clip(ki, 0, jnp.maximum(last, 0))
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
    if segmented:
        seg_specs = [
            pl.BlockSpec((1, 8, bq), lambda b_, h_, qi, ki: (b_, 0, qi)),
            pl.BlockSpec((1, 8, bkv), lambda b_, h_, qi, ki: (b_, 0, kv_idx(qi, ki))),
            pl.BlockSpec((1, 8, bq), lambda b_, h_, qi, ki: (b_, 0, qi)),
            pl.BlockSpec((1, 8, bkv), lambda b_, h_, qi, ki: (b_, 0, kv_idx(qi, ki))),
        ]
        dq_in_specs = seg_specs + dq_in_specs
        dq_inputs = [to8(q_seg), to8(kv_seg), to8(q_pos), to8(kv_pos)] + dq_inputs

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, block_q=bq, block_kv=bkv, **common),
        grid=(b, h, nq, nk),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        debug=debug,
    )(*dq_inputs)

    # ------------------------- [K3] dK/dV -------------------------
    bq = min(block_sizes.block_q_dkv, sq_pad)
    bkv = min(block_sizes.block_kv_dkv, sk_pad)
    nq, nk = sq_pad // bq, sk_pad // bkv

    if causal and not segmented:
        off = seqlen_k - seqlen_q

        def q_idx(ki, qi):
            first = jax.lax.div(jnp.maximum(ki * bkv - off, 0), bq)
            return jnp.clip(qi, jnp.minimum(first, nq - 1), nq - 1)
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
    if segmented:
        seg_specs = [
            pl.BlockSpec((1, 8, bq), lambda b_, hk_, ki, g, qi: (b_, 0, q_idx(ki, qi))),
            pl.BlockSpec((1, 8, bkv), lambda b_, hk_, ki, g, qi: (b_, 0, ki)),
            pl.BlockSpec((1, 8, bq), lambda b_, hk_, ki, g, qi: (b_, 0, q_idx(ki, qi))),
            pl.BlockSpec((1, 8, bkv), lambda b_, hk_, ki, g, qi: (b_, 0, ki)),
        ]
        dkv_in_specs = seg_specs + dkv_in_specs
        dkv_inputs = [to8(q_seg), to8(kv_seg), to8(q_pos), to8(kv_pos)] + dkv_inputs

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, block_q=bq, block_kv=bkv, **common),
        grid=(b, hk, nk, group, nq),
        in_specs=dkv_in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bkv, d), lambda b_, hk_, ki, g, qi: (b_, hk_, ki, 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda b_, hk_, ki, g, qi: (b_, hk_, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hk, sk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b, hk, sk_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bkv, d), jnp.float32),
            pltpu.VMEM((bkv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary", "arbitrary",
            ),
        ),
        interpret=interpret,
        debug=debug,
    )(*dkv_inputs)

    return dq, dk, dv
