"""Multi-step decode: k engine decode steps in ONE device dispatch.

The reference is a kernel library with no serving layer (SURVEY.md §2.3);
this extends the engine's decode path the same way speculative decoding
does, but without a draft model: the TARGET model's own autoregressive
decode loop runs ``decode_block`` steps inside one ``lax.scan`` dispatch
(vLLM's "multi-step scheduling"). Per-step host work — the ~29 ms axon-RPC
round-trip, the (batch,) readback, the Python scheduler tick — amortizes
over k tokens instead of paying per token, which is the measured decode
throughput ceiling at low batch (README: 47 tok/s at batch 1 / ctx 4096,
dispatch-bound, kernels idle most of the wall-clock).

Exactness contract (gated in tests/test_multistep.py): the emitted token
stream is BITWISE the single-step engine's, greedy and sampled — sampling
keys are a pure function of (seed, output position) (serving.sampling), so
step j of the block draws with the identical key the single-step engine
would use. Stop conditions (eos / stop_ids / max_new_tokens) are applied on
the host over the (batch, k) readback: a row stopping at step j < k simply
discards its tail — the discarded draws' keys belong to output positions
that never materialize, and the discarded tokens' speculative KV writes land
in reserved-not-committed page slots reclaimed by ``seq_truncate`` (the same
mechanism speculative decoding uses for rejected proposals).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from flash_attention_tpu.models import llama
from flash_attention_tpu.serving import sampling


def _rollout_body(
    params,
    k_pages,       # paged cache (L, hk, P, ps, hd) — donated
    v_pages,
    k_scales,      # cache scales or None — donated
    v_scales,
    tokens,        # (b,) int32 — the last committed token per row
    lengths,       # (b,) int32 — committed length INCLUDING that token
    page_tables,   # (b, pages_per_seq) int32
    temps,         # (b,) f32 (<= 0 greedy)
    top_ks,        # (b,) int32 (0 = off)
    top_ps,        # (b,) f32 (1.0 = off)
    seeds,         # (b,) int32
    positions,     # (b,) int32 — output index of the first emitted token
    lora_ids,      # (b,) int32 or None
    cfg: llama.LlamaConfig,
    n_steps: int,
    need_filters: bool,
    want_logprobs: bool,
    tp_axis: str | None = None,
):
    """``n_steps`` autoregressive target-model tokens per row in ONE dispatch.

    Step j feeds the previous step's sample, writes its KV at position
    ``lengths - 1 + j`` (the host pre-reserves the slots — the
    ``Engine._multistep_decode_batch`` grow loop), and samples output index
    ``positions + j`` with the exact single-step key. Returns
    (tokens (b, n_steps) int32, logprobs (b, n_steps) f32 — zeros unless
    ``want_logprobs``, k_pages, v_pages, k_scales, v_scales).
    """
    ps = k_pages.shape[-2]

    def step(carry, j):
        tok, ln, kp, vp, kps, vps = carry
        wpage = jnp.take_along_axis(page_tables, ((ln - 1) // ps)[:, None],
                                    axis=1)[:, 0]
        woff = (ln - 1) % ps
        logits, kp, vp, kps, vps = llama._decode_core(
            params, kp, vp, kps, vps, tok, ln, page_tables, wpage, woff,
            cfg, tp_axis, lora_ids)
        nxt = sampling.sample_tokens(logits, temps, top_ks, top_ps, seeds,
                                     positions + j,
                                     need_filters=need_filters)
        lp = (sampling.token_logprobs(logits, nxt) if want_logprobs
              else jnp.zeros_like(temps))
        return (nxt, ln + 1, kp, vp, kps, vps), (nxt, lp)

    carry = (tokens, lengths, k_pages, v_pages, k_scales, v_scales)
    (_, _, k_pages, v_pages, k_scales, v_scales), (toks, lps) = jax.lax.scan(
        step, carry, jnp.arange(n_steps, dtype=jnp.int32))
    return toks.T, lps.T, k_pages, v_pages, k_scales, v_scales


decode_rollout = functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "need_filters", "want_logprobs",
                     "tp_axis"),
    donate_argnums=(1, 2, 3, 4))(_rollout_body)


def tp_decode_rollout(params, k_pages, v_pages, k_scales, v_scales, tokens,
                      lengths, page_tables, temps, top_ks, top_ps, seeds,
                      positions, *, cfg: llama.LlamaConfig, n_steps: int,
                      need_filters: bool, want_logprobs: bool, mesh,
                      axis: str = "model"):
    """Tensor-parallel multi-step decode: the scan body's decode core runs
    kv-head-local with two psums per layer (``tp_decode_step``), so the
    post-psum logits are replicated and every shard draws the SAME token —
    the sampled carry stays consistent across shards with no extra
    communication (the same property ``spec.tp_draft_rollout`` relies on)."""
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
             top_ks, top_ps, seeds, positions):
        return _rollout_body(params, kp, vp, kps, vps, tokens, lengths,
                             tables, temps, top_ks, top_ps, seeds, positions,
                             None, cfg_local, n_steps, need_filters,
                             want_logprobs, tp_axis=axis)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, cache_spec, cache_spec, scale_spec, scale_spec,
                  rep, rep, rep, rep, rep, rep, rep, rep),
        out_specs=(rep, rep, cache_spec, cache_spec, scale_spec, scale_spec),
        check_vma=False,
    )(params, k_pages, v_pages, k_scales, v_scales, tokens, lengths,
      page_tables, temps, top_ks, top_ps, seeds, positions)
