"""On-device token sampling for the serving engine (VERDICT r2 weak #7).

Round 2 sampled on the host: every decode step pulled the full (batch, vocab)
logits block to numpy (2 MB at batch 16 / vocab 32k) and looped Python per
request. Through the axon tunnel that host round-trip — not the kernels —
was the decode throughput ceiling. This module keeps the whole
logits→token path on device; the engine reads back one (batch,) int32.

Replay property (the reference point is ``Engine._sample``'s contract): the
random bits for a request's token at position ``p`` are a pure function of
``(seed, p)`` — ``fold_in(PRNGKey(seed), p)`` — so preemption + re-prefill
replays the identical completion. No call-count-stateful RNG anywhere.

Semantics vs the old host sampler: temperature, top-k, and top-p (nucleus)
mean the same thing; the one deliberate difference is tie handling at the
top-p cut — the host version kept a prefix of an argsort (dropping tied
logits past the cut), this keeps every token tied with the cut threshold.
A tie at the boundary draws from an identical distribution either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _row_keys(seeds, positions):
    """One PRNG key per batch row, derived only from (seed, position)."""
    return jax.vmap(lambda s, p: jax.random.fold_in(jax.random.PRNGKey(s), p))(
        seeds, positions)


def _mask_row(scaled, top_k, top_p):
    """Apply top-k and top-p to one (vocab,) row of temperature-scaled
    logits; returns the row with excluded entries at -inf. Needs one
    descending sort (shared by both filters)."""
    v = scaled.shape[0]
    srt = jnp.sort(scaled)[::-1]
    thr_k = jnp.where(top_k > 0,
                      srt[jnp.clip(top_k - 1, 0, v - 1)],
                      -jnp.inf)
    probs = jax.nn.softmax(srt)
    # smallest prefix with cumulative prob >= top_p, always >= 1 token
    cut = jnp.searchsorted(jnp.cumsum(probs), top_p)
    thr_p = jnp.where(top_p < 1.0, srt[jnp.clip(cut, 0, v - 1)], -jnp.inf)
    thr = jnp.maximum(thr_k, thr_p)
    return jnp.where(scaled >= thr, scaled, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("need_filters",))
def sample_tokens(logits, temps, top_ks, top_ps, seeds, positions,
                  *, need_filters: bool):
    """Sample one token per row, fully on device.

    logits (b, vocab) f32; temps (b,) f32 (<= 0 means greedy); top_ks (b,)
    int32 (0 = off); top_ps (b,) f32 (1.0 = off); seeds/positions (b,) int32.
    ``need_filters`` is a static host-known flag: when no request in the
    batch uses top-k/top-p the per-row vocab sort is compiled out entirely
    (the common greedy/temperature path).
    """
    logits = logits.astype(jnp.float32)
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
    if need_filters:
        scaled = jax.vmap(_mask_row)(scaled, top_ks, top_ps)
    keys = _row_keys(seeds, positions)
    sampled = jax.vmap(jax.random.categorical)(keys, scaled).astype(jnp.int32)
    return jnp.where(temps <= 0.0, greedy_tok, sampled)
