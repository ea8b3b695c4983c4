"""Speculative decoding: draft-model proposal rollout.

The serving-side half of speculative decoding (the reference is a kernel
library with no serving layer; this extends the engine the same way the
scheduler/allocator do). A small draft model proposes ``n_draft`` tokens;
the target model verifies them all in ONE ``prefill_chunk`` dispatch
(``Engine._spec_decode_batch``); ``sampling.spec_accept`` keeps the longest
valid prefix plus one corrected/bonus token. Output tokens are distributed
exactly as sequential target-model samples — the draft only changes how many
arrive per engine step.

Cache layout: the draft model has its OWN page arrays but shares the
allocator's page ids/tables with the target cache, so one page table drives
both models and the allocator stays single.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from flash_attention_tpu.models import llama
from flash_attention_tpu.serving import sampling


def _rollout_body(
    params,
    k_pages,       # draft-model paged cache (L_d, hk_d, P, ps, hd_d) — donated
    v_pages,
    k_scales,      # draft cache scales or None — donated
    v_scales,
    tokens,        # (b,) int32 — the last committed token per row
    lengths,       # (b,) int32 — committed length INCLUDING that token
    page_tables,   # (b, pages_per_seq) int32 — page ids SHARED with the
                   # target cache (same allocator slots, separate arrays)
    temps,         # (b,) f32 — per-request temperature (<= 0 greedy)
    seeds,         # (b,) int32
    positions,     # (b,) int32 — output index of the first drafted token
    cfg: llama.LlamaConfig,
    n_draft: int,
    tp_axis: str | None = None,
):
    """``n_draft`` autoregressive draft-model tokens per row in ONE dispatch.

    Speculative decoding's proposal phase: a ``lax.scan`` over the decode
    core keeps all n_draft small-model steps (paged attention, KV writes,
    greedy/temperature sampling) on device — behind the axon tunnel each
    separate dispatch costs ~29 ms of RPC, which would eat the entire
    speculation win. Draft token j is keyed (seed, positions + j) on the
    draft sub-stream, so the proposal sequence is replay-deterministic and
    independent of the accept/reject uniforms (``sampling._spec_keys``).

    Returns (draft_tokens (b, n_draft) int32, draft_logits (b, n_draft, V)
    f32, k_pages, v_pages, k_scales, v_scales).

    The scan runs n_draft + 1 steps, not n_draft: each step writes only the
    FED token's KV, so after n_draft steps the cache would hold t0..d_{g-1}
    but not d_g — and when verification accepts everything plus the bonus
    token, the next step's draft attention would read that never-written
    slot as zeros and silently poison every later proposal (found as p/q
    acceptance ratios drifting from 1.0 with draft == target). The extra
    step feeds d_g purely for its KV write; its sampled token is discarded
    (its key, (seed, positions + n_draft) on the draft sub-stream, is never
    used for an emitted decision). When verification rejects early the
    speculative writes past the committed frontier are stale garbage in
    RESERVED-not-committed slots — rewritten by later feeds before `lengths`
    ever lets a read reach them.
    """
    ps = k_pages.shape[-2]

    def step(carry, j):
        tok, ln, kp, vp, kps, vps = carry
        wpage = jnp.take_along_axis(page_tables, ((ln - 1) // ps)[:, None],
                                    axis=1)[:, 0]
        woff = (ln - 1) % ps
        logits, kp, vp, kps, vps = llama._decode_core(
            params, kp, vp, kps, vps, tok, ln, page_tables, wpage, woff,
            cfg, tp_axis)
        nxt = sampling.draft_sample(logits, temps, seeds, positions + j)
        return (nxt, ln + 1, kp, vp, kps, vps), (nxt, logits)

    carry = (tokens, lengths, k_pages, v_pages, k_scales, v_scales)
    (_, _, k_pages, v_pages, k_scales, v_scales), (toks, logs) = jax.lax.scan(
        step, carry, jnp.arange(n_draft + 1, dtype=jnp.int32))
    return (toks[:n_draft].T, jnp.swapaxes(logs[:n_draft], 0, 1),
            k_pages, v_pages, k_scales, v_scales)


draft_rollout = functools.partial(
    jax.jit, static_argnames=("cfg", "n_draft", "tp_axis"),
    donate_argnums=(1, 2, 3, 4))(_rollout_body)


def tp_draft_rollout(params, k_pages, v_pages, k_scales, v_scales, tokens,
                     lengths, page_tables, temps, seeds, positions, *,
                     cfg: llama.LlamaConfig, n_draft: int, mesh,
                     axis: str = "model"):
    """Tensor-parallel draft rollout: the scan body's decode core runs
    kv-head-local with two psums per layer (like ``tp_decode_step``), so the
    post-psum logits are replicated and every shard draws the SAME draft
    token — the sampled carry stays consistent across shards without extra
    communication."""
    from jax.sharding import PartitionSpec as P
    from flash_attention_tpu.parallel.tp_inference import (local_config,
                                                           tree_specs)
    tp = mesh.shape[axis]
    cfg_local = local_config(cfg, tp)
    pspecs = tree_specs(params)
    cache_spec = P(None, axis, None, None, None)
    scale_spec = cache_spec if k_scales is not None else None
    rep = P()

    def body(params, kp, vp, kps, vps, tokens, lengths, tables, temps,
             seeds, positions):
        return _rollout_body(params, kp, vp, kps, vps, tokens, lengths,
                             tables, temps, seeds, positions, cfg_local,
                             n_draft, tp_axis=axis)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, cache_spec, cache_spec, scale_spec, scale_spec,
                  rep, rep, rep, rep, rep, rep),
        out_specs=(rep, rep, cache_spec, cache_spec, scale_spec, scale_spec),
        check_vma=False,
    )(params, k_pages, v_pages, k_scales, v_scales, tokens, lengths,
      page_tables, temps, seeds, positions)
