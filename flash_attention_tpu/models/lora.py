"""Multi-LoRA serving: per-request low-rank adapters over one base model.

A LoRA adapter adds ``x @ A @ B`` (rank-r bottleneck, scaled alpha/r) to a
subset of the projections. For SERVING many adapters at once, the engine
stacks every registered adapter on a leading axis and each batch row
carries an adapter id; inside the layer the row's (A, B) slices are
gathered and applied as two small einsums — one dispatch serves a mixed
batch of adapters (id 0 is the all-zeros null adapter, i.e. the base
model). This is the TPU-shaped equivalent of the batched-gather LoRA
kernels (BGMV) GPU engines use: the gather is a leading-axis index pull
(DMA-friendly) and the bottleneck matmuls stay dense.

The reference is a kernel library with no serving layer (SURVEY.md §0);
multi-LoRA extends the engine the same way the scheduler/allocator do.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# projections LoRA can target, with their (in, out) dims per LlamaConfig
_TARGET_DIMS = {
    "wq": lambda c: (c.dim, c.n_heads * c.head_dim),
    "wk": lambda c: (c.dim, c.n_kv_heads * c.head_dim),
    "wv": lambda c: (c.dim, c.n_kv_heads * c.head_dim),
    "wo": lambda c: (c.n_heads * c.head_dim, c.dim),
    "w_gate": lambda c: (c.dim, c.hidden_dim),
    "w_up": lambda c: (c.dim, c.hidden_dim),
    "w_down": lambda c: (c.hidden_dim, c.dim),
}


def init_adapter(rng, cfg, rank: int, targets=("wq", "wk", "wv", "wo"),
                 alpha: float | None = None, dtype=jnp.float32):
    """Random LoRA adapter: {target: (A (L, din, r), B (L, r, dout))}.

    Standard LoRA init — A gaussian, B ZEROS — makes a fresh adapter a
    no-op; tests overwrite B to exercise the math. ``alpha/r`` is folded
    into B once here so serving never rescales."""
    alpha = float(rank) if alpha is None else alpha
    out = {}
    for t in targets:
        din, dout = _TARGET_DIMS[t](cfg)
        rng, k = jax.random.split(rng)
        a = (jax.random.normal(k, (cfg.n_layers, din, rank), jnp.float32)
             * din ** -0.5 * (alpha / rank)).astype(dtype)
        out[t] = (a, jnp.zeros((cfg.n_layers, rank, dout), dtype))
    return out


def merge_adapter(params, adapter):
    """Fold an adapter into the base weights: W' = W + A @ B. The serving
    oracle — a stacked per-row adapter must generate exactly what the
    merged model does."""
    out = dict(params)
    for t, (a, b) in adapter.items():
        out[t] = params[t] + jnp.einsum("ldr,lro->ldo", a, b).astype(
            params[t].dtype)
    return out


def stack_adapters(cfg, adapters: list, rank: int, targets, n_slots: int,
                   dtype=jnp.float32):
    """Stack adapters on a slot axis, id 0 = the null adapter (base model).

    Returns {target: (A (L, n_slots, din, r), B (L, n_slots, r, dout))} —
    the LAYER axis leads so the stacks ride the model's ``lax.scan`` like
    the weights do. ``n_slots`` is fixed up front (engine capacity) so
    registering another adapter never changes the jitted step's shapes —
    it writes a slot."""
    stacks = {}
    for t in targets:
        din, dout = _TARGET_DIMS[t](cfg)
        a = jnp.zeros((cfg.n_layers, n_slots, din, rank), dtype)
        b = jnp.zeros((cfg.n_layers, n_slots, rank, dout), dtype)
        for i, ad in enumerate(adapters, start=1):
            stacks_t = (a, b)
            a, b = set_slot({t: stacks_t}, i, ad, (t,))[t]
        stacks[t] = (a, b)
    return stacks


def set_slot(stacks, slot: int, adapter, targets):
    """Write ``adapter`` into stack slot ``slot`` (shape-preserving)."""
    out = {}
    for t in targets:
        a, b = stacks[t]
        if t in adapter:
            out[t] = (a.at[:, slot].set(adapter[t][0].astype(a.dtype)),
                      b.at[:, slot].set(adapter[t][1].astype(b.dtype)))
        else:
            out[t] = (a.at[:, slot].set(0.0), b.at[:, slot].set(0.0))
    return out


def delta(h, lr, target, ids):
    """Per-row LoRA delta for one layer: h (b, [s,] din) @ A[ids] @ B[ids].

    lr: {target: (A (n_slots, din, r), B (n_slots, r, dout))} — THIS layer's
    slices (the leading layer axis is consumed by the caller's scan).
    ids (b,) int32. Returns the delta in h.dtype, or None if the target is
    not adapted."""
    if lr is None or target not in lr:
        return None
    a, b = lr[target]
    a_sel, b_sel = a[ids], b[ids]        # (b, din, r), (b, r, dout)
    h32 = h.astype(jnp.float32)
    a32, b32 = a_sel.astype(jnp.float32), b_sel.astype(jnp.float32)
    if h.ndim == 3:                      # (b, s, din)
        t = jnp.einsum("bsd,bdr->bsr", h32, a32)
        d = jnp.einsum("bsr,bro->bso", t, b32)
    else:                                # (b, din)
        t = jnp.einsum("bd,bdr->br", h32, a32)
        d = jnp.einsum("br,bro->bo", t, b32)
    return d.astype(h.dtype)
