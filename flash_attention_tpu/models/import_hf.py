"""Import HuggingFace Llama weights into this framework's parameter tree.

Gives users of standard Llama checkpoints a direct load path into the
serving engine: ``params = from_hf(model)`` (or ``from_hf_state_dict``),
optionally followed by ``models.llama.quantize_params`` for weight-only
int8/int4 serving.

Convention mapping (verified by a logits-parity test vs ``transformers``):
 * torch ``nn.Linear`` stores (out, in); our matmuls are x @ w with
   w (in, out) — every projection is transposed on import.
 * HF RoPE is the half-split ("rotate_half") convention — identical to
   ``models.llama._rope``.
 * q/k/v/o projections are per-layer; we stack them on a leading layer axis
   for ``lax.scan``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from flash_attention_tpu.models.llama import LlamaConfig


def config_from_hf(hf_config) -> LlamaConfig:
    return LlamaConfig(
        vocab_size=hf_config.vocab_size,
        dim=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=hf_config.num_attention_heads,
        n_kv_heads=getattr(hf_config, "num_key_value_heads",
                           hf_config.num_attention_heads),
        head_dim=hf_config.hidden_size // hf_config.num_attention_heads,
        hidden_dim=hf_config.intermediate_size,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        norm_eps=hf_config.rms_norm_eps,
    )


def from_hf_state_dict(state_dict, cfg: LlamaConfig, dtype=jnp.bfloat16):
    """Build the params tree from a HF Llama state dict (torch tensors or
    numpy arrays keyed ``model.layers.N.self_attn.q_proj.weight`` etc.)."""

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
            np.stack([get(fmt.format(i)) for i in range(cfg.n_layers)]), dtype)

    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype),
        "wq": stack_linear("model.layers.{}.self_attn.q_proj.weight"),
        "wk": stack_linear("model.layers.{}.self_attn.k_proj.weight"),
        "wv": stack_linear("model.layers.{}.self_attn.v_proj.weight"),
        "wo": stack_linear("model.layers.{}.self_attn.o_proj.weight"),
        "w_gate": stack_linear("model.layers.{}.mlp.gate_proj.weight"),
        "w_up": stack_linear("model.layers.{}.mlp.up_proj.weight"),
        "w_down": stack_linear("model.layers.{}.mlp.down_proj.weight"),
        "norm_attn": stack_vec("model.layers.{}.input_layernorm.weight"),
        "norm_mlp": stack_vec("model.layers.{}.post_attention_layernorm.weight"),
        "norm_out": jnp.asarray(get("model.norm.weight"), dtype),
    }
    if "lm_head.weight" in state_dict:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype)
    else:  # tied embeddings
        params["lm_head"] = params["embed"].T
    return params


def from_hf(model, dtype=jnp.bfloat16):
    """Import from an instantiated ``transformers`` Llama model."""
    cfg = config_from_hf(model.config)
    return from_hf_state_dict(model.state_dict(), cfg, dtype), cfg
