"""Distributed flash attention: head-parallel (TP) and context-parallel (ring).

The reference is strictly single-GPU (SURVEY.md §2.3); these are the
TPU-native scaling layers the north star requires:

* ``shard_flash_attention`` — heads sharded over the ``model`` mesh axis via
  shard_map; zero communication during attention (GQA co-locates each KV head
  with its query group). The all-reduce belongs to the caller's o-projection.
* ``ring_flash_attention`` — kv-sequence sharded over the ``context`` axis;
  KV chunks rotate around the ring with ``jax.lax.ppermute`` while each chip
  computes a partial flash attention on the chunk in front of it, merging
  partials with the online-softmax LSE merge. Communication is point-to-point
  over ICI and overlaps with compute.
* ``merge_partials`` — the (o, lse) combine primitive; the cross-chip
  generalization of the kernel's in-tile online-softmax rescale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from flash_attention_tpu.ops.attention import (  # noqa: F401 — re-export
    bwd, flash_attention, fwd, merge_partials)

# lse sentinel for rows with no attended keys in a *partial* result. Finite
# (not -inf) so exp/logaddexp arithmetic in the merge stays NaN-free; any
# real contribution dominates it. (merge_partials itself now also tolerates
# -inf sentinels — it lives in ops.attention, shared with the long-KV
# chunked forward.)
EMPTY_LSE = -1e37


def _ring_positions(me, step, n, b, sq_local, sk_local, seq_offset):
    """Global (q_pos, kv_pos) for the chunk held at ``step`` (source chip
    ``(me - step) % n``), with q pre-shifted for lower-right alignment."""
    src = (me - step) % n
    q_pos = (me * sq_local + jnp.arange(sq_local, dtype=jnp.int32)[None]
             + seq_offset)
    kv_pos = src * sk_local + jnp.arange(sk_local, dtype=jnp.int32)[None]
    return (jnp.broadcast_to(q_pos, (b, sq_local)),
            jnp.broadcast_to(kv_pos, (b, sk_local)))


def ring_flash_attention(
    q,
    k,
    v,
    axis_name: str,
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    axis_size: int | None = None,
    seq_offset_k_minus_q: int = 0,
):
    """Context-parallel attention over a ring; call INSIDE shard_map.

    Each device holds its local q chunk (b, sq_local, h, d) and kv chunk
    (b, sk_local, hk, d) of sequence-sharded tensors. KV chunks rotate
    ``ppermute`` steps around ``axis_name`` while each chip computes a
    partial flash attention on the chunk in front of it; partials merge via
    the online-softmax LSE merge. Point-to-point ICI traffic only, overlapped
    with compute by XLA's async collectives. Differentiable: the backward
    rotates KV (and their gradient accumulators) around the ring again,
    reusing the saved global LSE — see ``_ring_bwd``.

    ``seq_offset_k_minus_q`` is total_seqlen_k - total_seqlen_q for the
    lower-right causal alignment (0 for self-attention).
    """
    if sm_scale is None:
        sm_scale = 1.0 / q.shape[-1] ** 0.5
    n = axis_size if axis_size is not None else jax.lax.axis_size(axis_name)
    return _ring_custom(q, k, v, axis_name, causal, sm_scale, n,
                        seq_offset_k_minus_q)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _ring_custom(q, k, v, axis_name, causal, sm_scale, n, seq_offset):
    o, lse = _ring_fwd_impl(q, k, v, axis_name, causal, sm_scale, n,
                            seq_offset)
    return o, lse


def _ring_fwd_impl(q, k, v, axis_name, causal, sm_scale, n, seq_offset):
    me = jax.lax.axis_index(axis_name)
    b, sq_local, h, d = q.shape
    sk_local = k.shape[1]
    zeros_q = jnp.zeros((b, sq_local), jnp.int32)
    zeros_k = jnp.zeros((b, sk_local), jnp.int32)

    o = None
    lse = None
    k_blk, v_blk = k, v
    perm = [(i, (i + 1) % n) for i in range(n)]

    for step in range(n):
        if causal:
            q_pos, kv_pos = _ring_positions(me, step, n, b, sq_local,
                                            sk_local, seq_offset)
            segs = (zeros_q, zeros_k, q_pos, kv_pos)
            o_i, lse_i = fwd(q, k_blk, v_blk, is_causal=True,
                             sm_scale=sm_scale, segs=segs,
                             empty_lse=EMPTY_LSE)
        else:
            o_i, lse_i = fwd(q, k_blk, v_blk, is_causal=False,
                             sm_scale=sm_scale, empty_lse=EMPTY_LSE)
        # Rotate kv to the next chip; the transfer overlaps with the next
        # step's compute (XLA schedules the ppermute async over ICI).
        if step < n - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        if o is None:
            o, lse = o_i, lse_i
        else:
            o, lse = merge_partials(o, lse, o_i, lse_i)

    # Normalize the sentinel: rows that saw no keys anywhere -> lse 0 like the
    # single-chip kernel (flash_fwd_kernel.h:766-785 semantics).
    lse = jnp.where(lse <= EMPTY_LSE / 2, 0.0, lse)
    return o, lse


def _ring_vjp_fwd(q, k, v, axis_name, causal, sm_scale, n, seq_offset):
    o, lse = _ring_fwd_impl(q, k, v, axis_name, causal, sm_scale, n,
                            seq_offset)
    return (o, lse), (q, k, v, o, lse)


def _ring_vjp_bwd(axis_name, causal, sm_scale, n, seq_offset, res, cts):
    """Ring backward: dQ accumulates locally (its rows never move); dK/dV
    accumulate in buffers that travel WITH their KV chunk, so after the full
    rotation (plus one final hop) each chunk's gradients arrive back on the
    chip that owns it. P is recomputed per chunk from the saved global LSE,
    so partial dQ/dK/dV contributions over disjoint chunks sum exactly."""
    q, k, v, o, lse = res
    do, _ = cts  # lse cotangent unsupported (matches dense custom_vjp)
    me = jax.lax.axis_index(axis_name)
    b, sq_local, h, d = q.shape
    sk_local = k.shape[1]
    zeros_q = jnp.zeros((b, sq_local), jnp.int32)
    zeros_k = jnp.zeros((b, sk_local), jnp.int32)
    perm = [(i, (i + 1) % n) for i in range(n)]

    dq = jnp.zeros(q.shape, jnp.float32)
    dk_rot = jnp.zeros(k.shape, jnp.float32)
    dv_rot = jnp.zeros(v.shape, jnp.float32)
    k_blk, v_blk = k, v

    for step in range(n):
        segs = None
        if causal:
            q_pos, kv_pos = _ring_positions(me, step, n, b, sq_local,
                                            sk_local, seq_offset)
            segs = (zeros_q, zeros_k, q_pos, kv_pos)
        dq_i, dk_i, dv_i = bwd(q, k_blk, v_blk, o, lse, do,
                               is_causal=causal, sm_scale=sm_scale, segs=segs)
        dq = dq + dq_i.astype(jnp.float32)
        dk_rot = dk_rot + dk_i.astype(jnp.float32)
        dv_rot = dv_rot + dv_i.astype(jnp.float32)
        if step < n - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            dk_rot = jax.lax.ppermute(dk_rot, axis_name, perm)
            dv_rot = jax.lax.ppermute(dv_rot, axis_name, perm)
    # The chunk in hand after the last step came from chip me+1; one final
    # hop returns every chunk's accumulated gradient to its home chip.
    dk_rot = jax.lax.ppermute(dk_rot, axis_name, perm)
    dv_rot = jax.lax.ppermute(dv_rot, axis_name, perm)
    return dq.astype(q.dtype), dk_rot.astype(k.dtype), dv_rot.astype(v.dtype)


_ring_custom.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


def shard_flash_attention(
    q,
    k,
    v,
    mesh: Mesh,
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    data_axis: str = "data",
    model_axis: str = "model",
    context_axis: str | None = None,
    **fwd_kwargs,
):
    """Mesh-sharded attention: batch on ``data``, heads on ``model``, and
    optionally kv-sequence on ``context`` (ring attention).

    q: (b, sq, h, d); k/v: (b, sk, hk, d). Requires h and hk divisible by the
    model-axis size (GQA co-location; for hk < tp replicate kv outside).
    Returns o (b, sq, h, d) sharded like q.
    """
    b, sq, h, d = q.shape
    hk = k.shape[2]
    tp = mesh.shape[model_axis]
    if h % tp != 0 or hk % tp != 0:
        raise ValueError(f"heads ({h}, {hk}) must divide model axis {tp}")

    if context_axis is None:
        qspec = P(data_axis, None, model_axis, None)
        kvspec = P(data_axis, None, model_axis, None)

        def local(q_, k_, v_):
            # flash_attention (not fwd): differentiable through custom_vjp so
            # sharded training steps can jax.grad straight through
            return flash_attention(q_, k_, v_, causal=causal,
                                   sm_scale=sm_scale, **fwd_kwargs)

        return jax.shard_map(
            local, mesh=mesh, in_specs=(qspec, kvspec, kvspec),
            out_specs=qspec, check_vma=False,
        )(q, k, v)

    cp = mesh.shape[context_axis]
    qspec = P(data_axis, context_axis, model_axis, None)
    kvspec = P(data_axis, context_axis, model_axis, None)

    def local_ring(q_, k_, v_):
        o, _ = ring_flash_attention(
            q_, k_, v_, context_axis,
            causal=causal, sm_scale=sm_scale, axis_size=cp,
            seq_offset_k_minus_q=k.shape[1] - sq,
        )
        return o

    return jax.shard_map(
        local_ring, mesh=mesh, in_specs=(qspec, kvspec, kvspec),
        out_specs=qspec, check_vma=False,
    )(q, k, v)
