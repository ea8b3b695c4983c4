"""Mixture-of-Experts: grouped matmul kernel + token dispatch (TPU-native).

The reference is a dense-attention kernel library (SURVEY.md §0); the MoE
layer extends the framework to the Mixtral model family. The TPU-native
design (megablox-style, NOT the GShard capacity/dropping einsum):

* Routing: top-k over the router logits, softmax over the selected k
  (Mixtral semantics — softmax-then-topk renormalized is identical).
* Dispatch: the T*k (token, expert) assignments are stably sorted by expert
  and scattered into a padded buffer where every expert's rows start on a
  row-block boundary, so each row block belongs to EXACTLY one expert. No
  capacity factor, no token dropping — the padded buffer's static size is
  ceil(T*k/B)*B + (E_local+1)*B (each group wastes < one block of padding;
  the +1 group collects assignments outside this shard's expert range under
  expert parallelism).
* Grouped matmul (``grouped_matmul``): a Pallas kernel gridded over
  (row_blocks, n_blocks, k_blocks) whose weight BlockSpec index map reads
  the row block's expert id from scalar prefetch — each (B, bk) activation
  tile contracts against ITS expert's (bk, bn) weight tile on the MXU.
  Dead blocks (padding / out-of-shard assignments) skip the MXU and write
  zeros.
* Combine: one permutation gather back to (T, k, D) order and a weighted
  sum over k — no scatter-add.
* Expert parallelism: shard the expert axis of the weight stacks over a
  mesh axis and pass ``expert_offset = axis_index * E_local``; assignments
  outside [offset, offset + E_local) land in the overflow group (zero
  output) and the caller psums partial outputs over the axis — the same
  single-collective pattern as the row-parallel dense FFN.

Backward (``grouped_matmul`` is a custom_vjp):
  dx = grouped_matmul(dy, w^T)          — same block->expert map
  dw[e] = x[group e]^T @ dy[group e]    — ``_gmm_dw``: grid (k, n, rows)
          with rows innermost; the accumulator flushes per expert because
          group rows are contiguous in the sorted buffer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_tpu.ops._mxu import matmul_precision as _precision


def _pick_block(dim: int, want: int, mult: int) -> int:
    """Largest divisor of ``dim`` that is <= want and a multiple of ``mult``
    (0 if none). Mirrors ops.quant's divisor snapping."""
    b = min(want, dim)
    b -= b % mult
    while b >= mult:
        if dim % b == 0:
            return b
        b -= mult
    return 0


def _gmm_kernel(be_ref, x_ref, w_ref, o_ref, acc_ref):
    i = pl.program_id(0)
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(be_ref[i] >= 0)
    def _mac():
        x = x_ref[...]
        acc_ref[...] += jax.lax.dot_general(
            x, w_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(x.dtype))

    @pl.when(kk == pl.num_programs(2) - 1)
    def _store():
        o_ref[...] = jnp.where(be_ref[i] >= 0, acc_ref[...],
                               0.0).astype(o_ref.dtype)


def _gmm_impl(x, w, block_expert, *, block_n, block_k, interpret, out_dtype):
    n_rows, dk = x.shape
    e, _, dn = w.shape
    nb = block_expert.shape[0]
    assert n_rows % nb == 0
    br = n_rows // nb
    bn = _pick_block(dn, block_n, 128) or dn
    bk = _pick_block(dk, block_k, 128) or dk

    return pl.pallas_call(
        _gmm_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, dn // bn, dk // bk),
            in_specs=[
                pl.BlockSpec((br, bk), lambda i, j, kk, be: (i, kk)),
                pl.BlockSpec((1, bk, bn),
                             lambda i, j, kk, be: (jnp.maximum(be[i], 0),
                                                   kk, j)),
            ],
            out_specs=pl.BlockSpec((br, bn), lambda i, j, kk, be: (i, j)),
            scratch_shapes=[pltpu.VMEM((br, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, dn), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * dk * dn,
            bytes_accessed=(n_rows * dk * x.dtype.itemsize
                            + nb * bk * dn * w.dtype.itemsize
                            + n_rows * dn * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(block_expert.astype(jnp.int32), x, w)


def _gmm_dw_kernel(be_ref, x_ref, dy_ref, dw_ref, acc_ref):
    i = pl.program_id(2)
    be = be_ref[i]

    @pl.when((i == 0) | (be != be_ref[jnp.maximum(i - 1, 0)]))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(be >= 0)
    def _mac():
        x = x_ref[...]
        acc_ref[...] += jax.lax.dot_general(
            x, dy_ref[...], (((0,), (0,)), ((), ())),   # x^T @ dy
            preferred_element_type=jnp.float32,
            precision=_precision(x.dtype))

    # written EVERY step so the flush on an index-map change always carries
    # the group's latest partial sum (dead blocks overwrite the trash slot)
    dw_ref[0] = acc_ref[...].astype(dw_ref.dtype)


def _gmm_dw_impl(x, dy, block_expert, n_experts, *, block_n, block_k,
                 interpret, out_dtype):
    n_rows, dk = x.shape
    _, dn = dy.shape
    nb = block_expert.shape[0]
    br = n_rows // nb
    bn = _pick_block(dn, block_n, 128) or dn
    bk = _pick_block(dk, block_k, 128) or dk

    dw = pl.pallas_call(
        _gmm_dw_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            # rows innermost: each expert's row blocks are consecutive, so
            # the (1, bk, bn) accumulator flushes once per (expert, kk, j)
            grid=(dk // bk, dn // bn, nb),
            in_specs=[
                pl.BlockSpec((br, bk), lambda kk, j, i, be: (i, kk)),
                pl.BlockSpec((br, bn), lambda kk, j, i, be: (i, j)),
            ],
            # slot n_experts is the trash slot for dead blocks
            out_specs=pl.BlockSpec(
                (1, bk, bn),
                lambda kk, j, i, be: (jnp.where(be[i] >= 0, be[i],
                                                n_experts), kk, j)),
            scratch_shapes=[pltpu.VMEM((bk, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((n_experts + 1, dk, dn), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * dk * dn,
            bytes_accessed=(n_rows * (dk + dn) * x.dtype.itemsize * (dn // bn)
                            + (n_experts + 1) * dk * dn * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(block_expert.astype(jnp.int32), x, dy)
    return dw[:n_experts]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gmm(x, w, block_expert, block_n, block_k, interpret):
    return _gmm_impl(x, w, block_expert, block_n=block_n, block_k=block_k,
                     interpret=interpret, out_dtype=x.dtype)


def _gmm_fwd(x, w, block_expert, block_n, block_k, interpret):
    return (_gmm(x, w, block_expert, block_n, block_k, interpret),
            (x, w, block_expert))


def _gmm_bwd(block_n, block_k, interpret, res, dy):
    import numpy as np
    x, w, block_expert = res
    dx = _gmm_impl(dy, jnp.swapaxes(w, 1, 2), block_expert,
                   block_n=block_n, block_k=block_k, interpret=interpret,
                   out_dtype=x.dtype)
    dw = _gmm_dw_impl(x, dy, block_expert, w.shape[0], block_n=block_n,
                      block_k=block_k, interpret=interpret,
                      out_dtype=w.dtype)
    dbe = np.zeros(block_expert.shape, jax.dtypes.float0)
    return dx, dw, dbe


_gmm.defvjp(_gmm_fwd, _gmm_bwd)


def grouped_matmul(x, w, block_expert, *, block_n: int = 512,
                   block_k: int = 512, interpret: bool | None = None):
    """y[r] = x[r] @ w[expert_of_block(r)].

    x (N, K) with N a multiple of the row-block size; w (E, K, M);
    block_expert (N / B,) int32 — the expert of each row block, -1 for dead
    (all-padding) blocks, whose output rows are exact zeros. Differentiable
    in x and w.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _gmm(x, w, block_expert, block_n, block_k, interpret)


# --------------------------------------------------------------------- moe


def route(x, router_w, n_top: int):
    """Top-k routing, Mixtral semantics. x (T, D), router_w (D, E) ->
    (weights (T, k) f32 normalized over the k winners, ids (T, k) int32,
    router logits (T, E) f32 for aux losses)."""
    logits = jax.lax.dot_general(
        x.astype(jnp.float32), router_w.astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        precision=_precision(jnp.float32))  # (T, E)
    top_logits, top_ids = jax.lax.top_k(logits, n_top)
    weights = jax.nn.softmax(top_logits, axis=-1)
    return weights, top_ids.astype(jnp.int32), logits


def moe_ffn(x, router_w, w_gate, w_up, w_down, *, n_top: int, act,
            expert_offset=None, block_rows: int = 128,
            interpret: bool | None = None):
    """Sparse MoE feed-forward over a flat token batch.

    x (T, D); router_w (D, E_global); w_gate/w_up (E_local, D, F);
    w_down (E_local, F, D); ``act`` is the fp32 gate activation (the model's
    ``_act``). ``expert_offset``: this shard's first global expert id under
    expert parallelism (traced; None = single shard owning all experts).
    Returns (out (T, D) in x.dtype — PARTIAL under EP, psum it over the
    expert axis — and the router logits (T, E_global) for aux losses).
    """
    t, d = x.shape
    e_local = w_gate.shape[0]
    weights, ids, logits = route(x, router_w, n_top)
    if expert_offset is not None:
        local = (ids >= expert_offset) & (ids < expert_offset + e_local)
        ids = jnp.where(local, ids - expert_offset, e_local)  # overflow group
        weights = jnp.where(local, weights, 0.0)
    tk = t * n_top
    br = block_rows
    e_flat = ids.reshape(tk)
    t_flat = jnp.repeat(jnp.arange(t, dtype=jnp.int32), n_top)
    # stable sort by expert keeps (token, slot) order within a group
    perm = jnp.argsort(e_flat, stable=True)
    se = e_flat[perm]
    # rows per group, incl. the overflow group (index e_local)
    g = jnp.zeros((e_local + 1,), jnp.int32).at[e_flat].add(1)
    gstart = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(g)[:-1]])
    pg = -(-g // br) * br                     # group sizes padded to blocks
    pstart = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(pg)[:-1]])
    rank = jnp.arange(tk, dtype=jnp.int32) - gstart[se]
    pos = pstart[se] + rank                   # padded-buffer row per (t, j)
    n_pad = (-(-tk // br) + e_local + 1) * br  # static worst case
    xs = jnp.zeros((n_pad, d), x.dtype).at[pos].set(x[t_flat[perm]])
    # expert of each row block; blocks of the overflow group or wholly in
    # tail padding are dead (-1)
    bstart = jnp.arange(n_pad // br, dtype=jnp.int32) * br
    bexp = jnp.searchsorted(jnp.cumsum(pg), bstart, side="right")
    bexp = jnp.where(bexp < e_local, bexp, -1).astype(jnp.int32)

    gate = grouped_matmul(xs, w_gate, bexp, interpret=interpret)
    up = grouped_matmul(xs, w_up, bexp, interpret=interpret)
    h = (act(gate).astype(x.dtype) * up)
    y = grouped_matmul(h, w_down, bexp, interpret=interpret)  # (n_pad, D)

    # unsort back to (T, k, D) order, then the weighted combine
    yu = jnp.zeros((tk, d), x.dtype).at[perm].set(y[pos])
    out = jnp.sum(yu.reshape(t, n_top, d).astype(jnp.float32)
                  * weights[..., None], axis=1)
    return out.astype(x.dtype), logits
