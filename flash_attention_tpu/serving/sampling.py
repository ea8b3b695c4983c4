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


# Distinct sub-streams off the (seed, position) key so the three speculative
# consumers (the draft's own draw, the accept/reject uniform, the residual
# resample) never correlate: rejection sampling is only exact when the accept
# uniform is independent of the draft's draw.
_DRAFT_TAG = 1
_ACCEPT_TAG = 2
_RESAMPLE_TAG = 3


def _spec_keys(seeds, positions, tag):
    """(b,) keys for sub-stream ``tag`` at absolute output ``positions``."""
    def one(s, p):
        return jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(s), p), tag)
    return jax.vmap(one)(seeds, positions)


def draft_sample(logits, temps, seeds, positions):
    """Sample the draft model's next token inside the rollout scan.

    Same greedy/temperature semantics as ``sample_tokens`` but keyed on the
    ``_DRAFT_TAG`` sub-stream and with no top-k/top-p (the engine rejects
    filtered requests in speculative mode — filters break the rejection-
    sampling guarantee). Not jitted: called from inside ``draft_rollout``'s
    ``lax.scan`` body.
    """
    logits = logits.astype(jnp.float32)
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
    keys = _spec_keys(seeds, positions, _DRAFT_TAG)
    sampled = jax.vmap(jax.random.categorical)(keys, scaled).astype(jnp.int32)
    return jnp.where(temps <= 0.0, greedy_tok, sampled)


@jax.jit
def spec_accept(target_logits, draft_logits, draft_tokens, temps, seeds,
                positions):
    """Speculative-decoding acceptance (Leviathan et al. rejection sampling).

    target_logits (b, g+1, V) f32 — the target model's logits at the g+1
    verification positions (the fed token + g draft tokens); draft_logits
    (b, g, V) — the distributions the g draft tokens were sampled from;
    draft_tokens (b, g) int32; temps/seeds (b,); positions (b,) int32 — the
    absolute output index of the FIRST token emitted this step (replay keys).

    Greedy (temp <= 0) is the one-hot limit of the same rule: p and q
    collapse to one-hot argmax rows, so ``u * q[d] < p[d]`` accepts exactly
    when the draft token equals the target argmax (u in [0,1) is strictly
    below 1 and never below 0), and the residual resample is the target
    argmax — bitwise-deterministic, no special case.

    Returns (out_tokens (b, g+1) int32, n_emit (b,) int32): row i emits
    ``out_tokens[i, :n_emit[i]]`` — its accepted draft prefix plus one token
    (the rejection resample, or the bonus draw when everything was accepted).
    Emitted tokens are distributed EXACTLY as g+1 sequential target-model
    samples; the draft only changes how many arrive per step.
    """
    b, c, v = target_logits.shape
    g = c - 1
    posj = positions[:, None] + jnp.arange(c, dtype=jnp.int32)[None, :]
    flat = lambda tag: _spec_keys(
        jnp.repeat(seeds, c), posj.reshape(-1), tag)

    def dist(logits):
        soft = jax.nn.softmax(
            logits.astype(jnp.float32)
            / jnp.maximum(temps, 1e-6)[:, None, None], axis=-1)
        hard = jax.nn.one_hot(jnp.argmax(logits, -1), v, dtype=jnp.float32)
        return jnp.where((temps > 0.0)[:, None, None], soft, hard)

    p = dist(target_logits)                          # (b, g+1, V)
    u = jax.vmap(lambda k: jax.random.uniform(k, ()))(
        flat(_ACCEPT_TAG)).reshape(b, c)
    gum = jax.vmap(lambda k: jax.random.gumbel(k, (v,)))(
        flat(_RESAMPLE_TAG)).reshape(b, c, v)

    if g:
        q = dist(draft_logits)                       # (b, g, V)
        pd = jnp.take_along_axis(p[:, :g], draft_tokens[..., None],
                                 -1)[..., 0]
        qd = jnp.take_along_axis(q, draft_tokens[..., None], -1)[..., 0]
        accept = u[:, :g] * qd < pd                  # (b, g)
        cum = jnp.cumprod(accept.astype(jnp.int32), axis=1)
        n_accept = jnp.sum(cum, axis=1)              # (b,)
        resid = jnp.concatenate(
            [jnp.maximum(p[:, :g] - q, 0.0), p[:, g:]], axis=1)
    else:
        n_accept = jnp.zeros((b,), jnp.int32)
        resid = p
    # all-zero residual (p == q exactly) only occurs at positions that were
    # accepted anyway; fall back to p so the argmax below stays well-defined
    resid = jnp.where(jnp.sum(resid, -1, keepdims=True) > 0.0, resid, p)
    resample = jnp.argmax(jnp.log(resid) + gum, axis=-1).astype(jnp.int32)
    if g:
        keep = jnp.arange(g)[None, :] < n_accept[:, None]
        out = jnp.where(keep, draft_tokens, resample[:, :g])
        out = jnp.concatenate([out, resample[:, g:]], axis=1)
    else:
        out = resample
    return out, (n_accept + 1).astype(jnp.int32)


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


@jax.jit
def token_logprobs(logits, tokens):
    """log p(token) under the RAW model distribution (no temperature, no
    filters — the OpenAI-style per-token logprob). logits (b, vocab),
    tokens (b,) int32 -> (b,) f32."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, tokens[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
