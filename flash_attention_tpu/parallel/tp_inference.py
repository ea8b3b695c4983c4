"""Tensor-parallel serving: decode and prefill sharded over a mesh axis.

Megatron-style partitioning of the Llama layers across the ``model`` axis:

* wq/wk/wv and w_gate/w_up are column-parallel (output features local) — the
  attention heads and their GQA KV heads are co-located per chip, so the
  whole attention block (including the paged-KV cache, sharded on the
  kv-head axis) runs with **zero communication**;
* wo and w_down are row-parallel — one ``psum`` each over ICI per layer;
* embeddings / norms / lm_head are replicated (logits come out replicated).

Implemented with ``jax.shard_map`` around the same ``models.llama`` step
functions, driven by a head-local ``LlamaConfig`` — the single-chip code path
IS the per-chip code path, which keeps parity trivially testable on a
virtual CPU mesh (SURVEY.md §4.6 strategy).
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, PartitionSpec as P

from flash_attention_tpu.models import llama
from flash_attention_tpu.ops.quant import QuantizedTensor


def local_config(cfg: llama.LlamaConfig, tp: int) -> llama.LlamaConfig:
    if cfg.n_heads % tp or cfg.n_kv_heads % tp:
        raise ValueError(
            f"heads {cfg.n_heads}/{cfg.n_kv_heads} must divide tp={tp}")
    if cfg.n_experts:
        # MoE: the EXPERT axis shards (expert parallelism); each local
        # expert keeps the full hidden_dim. Routing stays global.
        if cfg.n_experts % tp:
            raise ValueError(f"n_experts {cfg.n_experts} must divide tp={tp}")
        return dataclasses.replace(
            cfg, n_heads=cfg.n_heads // tp, n_kv_heads=cfg.n_kv_heads // tp,
            n_experts=cfg.n_experts // tp)
    if cfg.hidden_dim % tp:
        raise ValueError(f"hidden {cfg.hidden_dim} must divide tp={tp}")
    return dataclasses.replace(
        cfg, n_heads=cfg.n_heads // tp, n_kv_heads=cfg.n_kv_heads // tp,
        hidden_dim=cfg.hidden_dim // tp)


# PartitionSpecs for the stacked-layer param tree. Column-parallel weights
# shard their output dim; row-parallel their input dim.
def param_specs() -> dict:
    return {
        "embed": P(),
        "wq": P(None, None, "model"),
        "wk": P(None, None, "model"),
        "wv": P(None, None, "model"),
        "wo": P(None, "model", None),
        "w_gate": P(None, None, "model"),
        "w_up": P(None, None, "model"),
        "w_down": P(None, "model", None),
        "norm_attn": P(),
        "norm_mlp": P(),
        # Gemma-2 sandwich norms apply AFTER each layer's psum, so they are
        # replicated like the pre-norms (absent from Llama param trees;
        # tree_specs only looks up keys that exist)
        "norm_post_attn": P(),
        "norm_post_mlp": P(),
        # Qwen-2 QKV biases: column-parallel like their projections' output
        # dim (absent from bias-free param trees)
        "bq": P(None, "model"),
        "bk": P(None, "model"),
        "bv": P(None, "model"),
        "norm_out": P(),
        "lm_head": P(),
    }


def _qt_spec(spec: P, qt: QuantizedTensor) -> QuantizedTensor:
    """Partition specs for a QuantizedTensor leaf: values like the plain
    weight; per-output-channel scales follow the output dim."""
    if len(spec) == 0:  # replicated (e.g. lm_head)
        return QuantizedTensor(P(), P(), qt.bits)  # type: ignore
    # values (L, k, n) share the weight's spec; scales are (L, n)
    out_axis = spec[2] if len(spec) > 2 else None
    return QuantizedTensor(spec, P(None, out_axis), qt.bits)  # type: ignore


def tree_specs(params) -> dict:
    specs = param_specs()
    if "w_router" in params:
        # MoE: expert parallelism — shard the stacked (L, E, d_in, d_out)
        # expert weights on the EXPERT axis; the router is replicated
        # (routing is global) and the FFN psum combines partial outputs.
        specs["w_router"] = P()
        specs["w_gate"] = P(None, "model", None, None)
        specs["w_up"] = P(None, "model", None, None)
        specs["w_down"] = P(None, "model", None, None)
    out = {}
    for k, v in params.items():
        if isinstance(v, QuantizedTensor):
            out[k] = _qt_spec(specs[k], v)
        else:
            out[k] = specs[k]
    return out


def tp_decode_step(params, k_pages, v_pages, tokens, lengths, page_tables,
                   write_page, write_off, *, cfg: llama.LlamaConfig,
                   mesh: Mesh, axis: str = "model",
                   k_scales=None, v_scales=None):
    """Tensor-parallel batched decode step (see module docstring).

    params: full (unsharded or sharded) param tree; k_pages/v_pages
    (L, hk, P, ps, hd), optionally int8 with per-token scales (sharded on the
    kv-head axis like the pages). Returns (logits replicated, k_pages,
    v_pages, k_scales, v_scales).
    """
    tp = mesh.shape[axis]
    cfg_local = local_config(cfg, tp)
    pspecs = tree_specs(params)
    cache_spec = P(None, axis, None, None, None)
    scale_spec = cache_spec if k_scales is not None else None
    rep = P()

    def step(params, kp, vp, kps, vps, tokens, lengths, tables, wpage, woff):
        return llama.decode_step(
            params, kp, vp, kps, vps, tokens, lengths, tables, wpage, woff,
            cfg_local, tp_axis=axis)

    return jax.shard_map(
        step, mesh=mesh,
        in_specs=(pspecs, cache_spec, cache_spec, scale_spec, scale_spec,
                  rep, rep, rep, rep, rep),
        out_specs=(rep, cache_spec, cache_spec, scale_spec, scale_spec),
        check_vma=False,
    )(params, k_pages, v_pages, k_scales, v_scales, tokens, lengths,
      page_tables, write_page, write_off)


def tp_prefill_chunk(params, tokens, done, chunk_len, k_pages, v_pages,
                     k_scales, v_scales, prefix_tables, *,
                     cfg: llama.LlamaConfig, mesh: Mesh, axis: str = "model"):
    """Tensor-parallel chunked prefill (one chunk). The prefix page gather
    and the chunk attention are kv-head-local (zero communication) like
    ``tp_decode_step``; returns (logits replicated, ks, vs kv-head-sharded)."""
    tp = mesh.shape[axis]
    cfg_local = local_config(cfg, tp)
    pspecs = tree_specs(params)
    cache_spec = P(None, axis, None, None, None)
    scale_spec = cache_spec if k_scales is not None else None
    kv_spec = P(None, None, None, axis, None)
    rep = P()

    def step(params, tokens, done, chunk_len, kp, vp, kps, vps, tables):
        return llama.prefill_chunk(params, tokens, done, chunk_len, kp, vp,
                                   kps, vps, tables, cfg_local, tp_axis=axis)

    return jax.shard_map(
        step, mesh=mesh,
        in_specs=(pspecs, rep, rep, rep, cache_spec, cache_spec, scale_spec,
                  scale_spec, rep),
        out_specs=(rep, kv_spec, kv_spec),
        check_vma=False,
    )(params, tokens, done, chunk_len, k_pages, v_pages, k_scales, v_scales,
      prefix_tables)


def tp_prefill(params, tokens, *, cfg: llama.LlamaConfig, mesh: Mesh,
               axis: str = "model", logit_rows=None):
    """Tensor-parallel prompt forward. Returns (logits, ks, vs) with
    ks/vs (L, b, s, hk_local-sharded, hd). ``logit_rows``: lm_head applied
    only at each row's given position (see ``llama.prefill``)."""
    tp = mesh.shape[axis]
    cfg_local = local_config(cfg, tp)
    pspecs = tree_specs(params)
    kv_spec = P(None, None, None, axis, None)

    if logit_rows is None:
        def step(params, tokens):
            return llama.prefill(params, tokens, cfg_local, tp_axis=axis)

        return jax.shard_map(
            step, mesh=mesh,
            in_specs=(pspecs, P()),
            out_specs=(P(), kv_spec, kv_spec),
            check_vma=False,
        )(params, tokens)

    def step(params, tokens, rows):
        return llama.prefill(params, tokens, cfg_local, tp_axis=axis,
                             logit_rows=rows)

    return jax.shard_map(
        step, mesh=mesh,
        in_specs=(pspecs, P(), P()),
        out_specs=(P(), kv_spec, kv_spec),
        check_vma=False,
    )(params, tokens, logit_rows)
