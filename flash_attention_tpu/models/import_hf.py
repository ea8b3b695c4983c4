"""Import HuggingFace Llama / Mistral / Gemma-2 / Qwen-2 weights into this framework.

Gives users of standard checkpoints a direct load path into the serving
engine: ``params = from_hf(model)`` (or ``from_hf_state_dict``), optionally
followed by ``models.llama.quantize_params`` for weight-only int8/int4
serving.

Convention mapping (verified by logits-parity tests vs ``transformers``):
 * torch ``nn.Linear`` stores (out, in); our matmuls are x @ w with
   w (in, out) — every projection is transposed on import.
 * HF RoPE is the half-split ("rotate_half") convention — identical to
   ``models.llama._rope``.
 * q/k/v/o projections are per-layer; we stack them on a leading layer axis
   for ``lax.scan``.
 * Gemma-2 RMSNorm computes ``x * (1 + w)`` with a zero-centered stored
   weight (modeling_gemma2.Gemma2RMSNorm); ours computes ``x * g`` — every
   Gemma norm weight gets +1 on import.
 * Gemma-2's four per-layer norms map: input_layernorm → norm_attn,
   post_attention_layernorm → norm_post_attn (sandwich),
   pre_feedforward_layernorm → norm_mlp,
   post_feedforward_layernorm → norm_post_mlp.
 * HF ``layer_types`` (sliding at even indices for Gemma-2) maps to
   ``window_pattern``; Mistral's config-wide ``sliding_window`` maps with
   pattern 1 (every layer slides). Both sides count the window as "last W
   keys, query included".
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from flash_attention_tpu.models.llama import LlamaConfig


def _window_from_hf(hf_config) -> tuple[int | None, int]:
    """(sliding_window, window_pattern) from an HF config.

    Gemma-2 publishes per-layer ``layer_types``; Mistral a single
    ``sliding_window`` for every layer; Llama neither.
    """
    window = getattr(hf_config, "sliding_window", None)
    if window is None:
        return None, 1
    types = getattr(hf_config, "layer_types", None)
    if not types or all(t == "sliding_attention" for t in types):
        return int(window), 1
    # alternating local/global (Gemma-2): sliding layers every `period`
    # starting at 0 — verify the published pattern really has that shape
    # rather than silently mis-masking an exotic checkpoint
    period = next((i for i, t in enumerate(types[1:], 1)
                   if t == "sliding_attention"), len(types))
    ok = (types[0] == "sliding_attention"
          and all((t == "sliding_attention") == (i % period == 0)
                  for i, t in enumerate(types)))
    if not ok:
        raise ValueError(f"unsupported layer_types pattern: {types}")
    return int(window), period


def _rope_scaling_from_hf(hf_config):
    """Map HF ``rope_scaling`` to LlamaConfig.rope_scaling. Only the
    Llama-3.1 remap ("llama3") is modeled; anything else fails loudly
    rather than silently serving a model with wrong positional geometry."""
    rs = getattr(hf_config, "rope_scaling", None)
    if rs is None:
        return None
    kind = rs.get("rope_type", rs.get("type", "default"))
    if kind == "default":
        return None
    if kind != "llama3":
        raise ValueError(f"unsupported rope_scaling type: {kind!r}")
    return (float(rs["factor"]), float(rs["low_freq_factor"]),
            float(rs["high_freq_factor"]),
            int(rs["original_max_position_embeddings"]))


def config_from_hf(hf_config) -> LlamaConfig:
    window, pattern = _window_from_hf(hf_config)
    kind = getattr(hf_config, "model_type", "llama")
    kw = {}
    if kind == "gemma2":
        qs = getattr(hf_config, "query_pre_attn_scalar", None)
        kw = dict(
            attn_softcap=getattr(hf_config, "attn_logit_softcapping", None),
            final_softcap=getattr(hf_config, "final_logit_softcapping", None),
            act="gelu",  # hidden_activation = gelu_pytorch_tanh
            post_norms=True,
            query_scale=None if qs is None else float(qs),
            embed_scale=True,
        )
    if kind == "mixtral":
        kw = dict(n_experts=hf_config.num_local_experts,
                  n_experts_per_tok=hf_config.num_experts_per_tok)
    return LlamaConfig(
        vocab_size=hf_config.vocab_size,
        # Qwen-2 carries QKV biases; its older configs have no
        # attention_bias attribute (implicitly true for the family)
        attn_bias=bool(getattr(hf_config, "attention_bias",
                               kind == "qwen2")),
        dim=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=hf_config.num_attention_heads,
        n_kv_heads=getattr(hf_config, "num_key_value_heads",
                           hf_config.num_attention_heads),
        head_dim=getattr(hf_config, "head_dim", None)
        or hf_config.hidden_size // hf_config.num_attention_heads,
        hidden_dim=hf_config.intermediate_size,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        rope_scaling=_rope_scaling_from_hf(hf_config),
        norm_eps=hf_config.rms_norm_eps,
        sliding_window=window,
        window_pattern=pattern,
        **kw,
    )


def from_hf_state_dict(state_dict, cfg: LlamaConfig, dtype=jnp.bfloat16):
    """Build the params tree from a HF Llama / Mistral / Gemma-2 state dict
    (torch tensors or numpy arrays keyed
    ``model.layers.N.self_attn.q_proj.weight`` etc.)."""
    # Gemma RMSNorm stores zero-centered weights and computes x*(1+w)
    norm_shift = 1.0 if cfg.post_norms else 0.0

    def get(name):
        t = state_dict[name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t)

    def stack_linear(fmt):
        # nn.Linear holds (out, in): transpose to (in, out) then stack layers
        return jnp.asarray(
            np.stack([get(fmt.format(i)).T for i in range(cfg.n_layers)]),
            dtype)

    def stack_vec(fmt):
        return jnp.asarray(
            np.stack([get(fmt.format(i)) + norm_shift
                      for i in range(cfg.n_layers)]), dtype)

    def stack_experts(fmt):
        # Mixtral experts: nn.Linear (out, in) per (layer, expert) ->
        # (L, E, in, out)
        return jnp.asarray(
            np.stack([np.stack([get(fmt.format(i, e)).T
                                for e in range(cfg.n_experts)])
                      for i in range(cfg.n_layers)]), dtype)

    pre_mlp_norm = ("model.layers.{}.pre_feedforward_layernorm.weight"
                    if cfg.post_norms
                    else "model.layers.{}.post_attention_layernorm.weight")
    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype),
        "wq": stack_linear("model.layers.{}.self_attn.q_proj.weight"),
        "wk": stack_linear("model.layers.{}.self_attn.k_proj.weight"),
        "wv": stack_linear("model.layers.{}.self_attn.v_proj.weight"),
        "wo": stack_linear("model.layers.{}.self_attn.o_proj.weight"),
        "norm_attn": stack_vec("model.layers.{}.input_layernorm.weight"),
        "norm_mlp": stack_vec(pre_mlp_norm),
        "norm_out": jnp.asarray(get("model.norm.weight") + norm_shift, dtype),
    }
    if cfg.n_experts:  # Mixtral sparse MoE block (w1 gate / w3 up / w2 down)
        params["w_router"] = stack_linear(
            "model.layers.{}.block_sparse_moe.gate.weight")
        params["w_gate"] = stack_experts(
            "model.layers.{}.block_sparse_moe.experts.{}.w1.weight")
        params["w_up"] = stack_experts(
            "model.layers.{}.block_sparse_moe.experts.{}.w3.weight")
        params["w_down"] = stack_experts(
            "model.layers.{}.block_sparse_moe.experts.{}.w2.weight")
    else:
        params["w_gate"] = stack_linear(
            "model.layers.{}.mlp.gate_proj.weight")
        params["w_up"] = stack_linear("model.layers.{}.mlp.up_proj.weight")
        params["w_down"] = stack_linear(
            "model.layers.{}.mlp.down_proj.weight")
    if cfg.post_norms:  # Gemma-2 sandwich norms
        params["norm_post_attn"] = stack_vec(
            "model.layers.{}.post_attention_layernorm.weight")
        params["norm_post_mlp"] = stack_vec(
            "model.layers.{}.post_feedforward_layernorm.weight")
    if cfg.attn_bias:  # Qwen-2 QKV biases (1-D: no transpose, no shift)
        for ours, theirs in (("bq", "q_proj"), ("bk", "k_proj"),
                             ("bv", "v_proj")):
            params[ours] = jnp.asarray(
                np.stack([get(f"model.layers.{i}.self_attn.{theirs}.bias")
                          for i in range(cfg.n_layers)]), dtype)
    if "lm_head.weight" in state_dict:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype)
    else:  # tied embeddings
        params["lm_head"] = params["embed"].T
    return params


def from_hf(model, dtype=jnp.bfloat16):
    """Import from an instantiated ``transformers`` causal-LM model
    (Llama / Mistral / Gemma-2)."""
    cfg = config_from_hf(model.config)
    return from_hf_state_dict(model.state_dict(), cfg, dtype), cfg
