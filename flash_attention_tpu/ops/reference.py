"""Pure-JAX reference attention — the parity oracle.

Plays the role torch SDPA / ``vanilla_attention_ref`` play in the reference
test suite (``/root/reference/test_flash_attn.py:134-248``): a trusted fp32
implementation of exactly the semantics our kernels must reproduce:

* GQA/MQA head-group expansion (q heads // kv heads groups).
* **Lower-right-aligned** causal masking: position (row, col) is masked iff
  ``col - row > seqlen_k - seqlen_q`` (matches ``mask.h:172`` and the test's
  ``causal_lower_right`` construction, test_flash_attn.py:121-131).
* Fully-masked rows produce O = 0 and LSE = 0 (flash_fwd_kernel.h:717-730,
  :766-785).
* LSE defined as ``L = m + log(sum(exp(s - m)))`` (natural log,
  flash_fwd_kernel.h:770), shape (batch, heads, seqlen_q).
* Optional segment-ids masking (our TPU-native varlen representation).

All math in float32 regardless of input dtype; outputs cast back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _build_mask(
    seqlen_q: int,
    seqlen_k: int,
    causal: bool,
    q_segment_ids=None,
    kv_segment_ids=None,
    q_positions=None,
    kv_positions=None,
    window=None,
):
    """Boolean (sq, sk) or (b, sq, sk) mask; True = attend allowed.

    ``window`` is flash-attn's (left, right) sliding window: query row i
    sees key cols in [i + off - left, i + off + right] (lower-right
    alignment, off = seqlen_k - seqlen_q); entries < 0 mean unbounded.
    """
    mask = None
    if q_positions is None:
        rows = jnp.arange(seqlen_q)[:, None]
        cols = jnp.arange(seqlen_k)[None, :]
        rel = (cols - rows) - (seqlen_k - seqlen_q)  # lower-right alignment
        if causal:
            mask = rel <= 0
        if window is not None:
            wl, wr = window
            if wl is not None and wl >= 0:
                m2 = rel >= -wl
                mask = m2 if mask is None else (mask & m2)
            if wr is not None and wr >= 0:
                m2 = rel <= wr
                mask = m2 if mask is None else (mask & m2)
    else:
        # varlen: positions are per-token within each segment, with the
        # q positions pre-shifted by (len_k - len_q) per segment.
        rel = kv_positions[..., None, :] - q_positions[..., :, None]
        if causal:
            mask = rel <= 0
        if window is not None:
            wl, wr = window
            if wl is not None and wl >= 0:
                m2 = rel >= -wl
                mask = m2 if mask is None else (mask & m2)
            if wr is not None and wr >= 0:
                m2 = rel <= wr
                mask = m2 if mask is None else (mask & m2)
    if q_segment_ids is not None:
        seg = q_segment_ids[..., :, None] == kv_segment_ids[..., None, :]
        mask = seg if mask is None else (mask & seg)
    return mask


def reference_attention(
    q,
    k,
    v,
    causal: bool = False,
    sm_scale: float | None = None,
    q_segment_ids=None,
    kv_segment_ids=None,
    q_positions=None,
    kv_positions=None,
    window=None,
    softcap: float | None = None,
    return_lse: bool = True,
):
    """Dense reference attention.

    Args:
      q: (batch, seqlen_q, num_heads, head_dim)
      k, v: (batch, seqlen_k, num_heads_k, head_dim); num_heads % num_heads_k == 0
      causal: lower-right-aligned causal masking.
      sm_scale: softmax scale; defaults to 1/sqrt(head_dim) like the reference
        (flash_fwd_kernel.h:350-352 hardcodes it).
      q_segment_ids / kv_segment_ids: optional int32 (batch, seqlen) segment ids;
        tokens only attend within their segment.
      q_positions / kv_positions: optional int32 (batch, seqlen) positions used
        for causal masking in segment mode.
      softcap: optional logit soft-capping (Gemma-2 style): the scaled score
        is squashed to ``softcap * tanh(s / softcap)`` before masking.

    Returns:
      (o, lse): o (b, sq, h, d) in q.dtype; lse (b, h, sq) float32.
    """
    b, sq, h, d = q.shape
    _, sk, hk, _ = k.shape
    assert h % hk == 0, f"GQA requires num_heads {h} divisible by num_heads_k {hk}"
    group = h // hk
    scale = (1.0 / d**0.5) if sm_scale is None else sm_scale

    qf = q.astype(jnp.float32)
    kf = jnp.repeat(k.astype(jnp.float32), group, axis=2)
    vf = jnp.repeat(v.astype(jnp.float32), group, axis=2)

    # full-f32 contraction on TPU (default precision is bf16-grade there);
    # on CPU f32 is natively exact and the override is skipped
    prec = (jax.lax.Precision.HIGHEST
            if jax.default_backend() == "tpu" else None)
    s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf, precision=prec) * scale
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    mask = _build_mask(
        sq, sk, causal, q_segment_ids, kv_segment_ids, q_positions,
        kv_positions, window,
    )
    if mask is not None:
        if mask.ndim == 2:
            mask = mask[None, None]
        elif mask.ndim == 3:
            mask = mask[:, None]  # (b, 1, sq, sk)
        s = jnp.where(mask, s, MASK_VALUE)

    m = jnp.max(s, axis=-1, keepdims=True)
    # Fully-masked rows: m == MASK_VALUE -> force p = 0 and lse = 0.
    row_alive = m > MASK_VALUE * 0.5
    p = jnp.where(row_alive, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vf, precision=prec)
    denom = jnp.where(l == 0.0, 1.0, l)
    o = o / jnp.swapaxes(denom, 1, 2)
    lse = jnp.where(row_alive, m + jnp.log(denom), 0.0)[..., 0]  # (b, h, sq)
    if return_lse:
        return o.astype(q.dtype), lse
    return o.astype(q.dtype)


def reference_attention_bwd(q, k, v, do, causal: bool = False,
                            sm_scale: float | None = None, **mask_kwargs):
    """Oracle gradients (dq, dk, dv) via autodiff of the fp32 reference —
    the role torch SDPA's autograd plays for the reference's bwd tests."""

    def f(q, k, v):
        return reference_attention(q, k, v, causal=causal, sm_scale=sm_scale,
                                   return_lse=False, **mask_kwargs)

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(do)
