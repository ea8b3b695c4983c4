"""Training entry point: rematerialized forward + cross-entropy loss.

The training forward must produce the inference prefill's logits exactly,
and remat (jax.checkpoint around the layer-scan body) must not change
gradients — it only changes what is saved vs recomputed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models import llama


@pytest.mark.parametrize("cfg", [
    llama.LlamaConfig.tiny(),
    llama.LlamaConfig.tiny_gemma2(),   # grouped scan (window_pattern=2)
    llama.LlamaConfig.tiny_qwen2(),    # QKV biases
], ids=["llama", "gemma2", "qwen2"])
def test_train_forward_matches_prefill_and_remat_grads(cfg):
    params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 33)), jnp.int32)
    tgt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 33)), jnp.int32)
    tgt = tgt.at[1, 20:].set(-100)     # ignored positions

    lg_train, ks, vs = llama.prefill(params, toks, cfg, return_kv=False,
                                     remat=True)
    assert ks is None and vs is None
    lg_inf, _, _ = llama.prefill(params, toks, cfg)
    np.testing.assert_allclose(np.asarray(lg_train), np.asarray(lg_inf),
                               rtol=1e-5, atol=1e-6)

    g_r = jax.grad(lambda p: llama.train_loss(p, toks, tgt, cfg,
                                              remat=True))(params)
    g_n = jax.grad(lambda p: llama.train_loss(p, toks, tgt, cfg,
                                              remat=False))(params)
    for k in g_r:
        np.testing.assert_allclose(np.asarray(g_r[k]), np.asarray(g_n[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    # ignored positions contribute no gradient: perturbing them is invisible
    loss = float(llama.train_loss(params, toks, tgt, cfg))
    tgt2 = tgt.at[1, 25].set(-7)       # a different ignored marker
    assert float(llama.train_loss(params, toks, tgt2, cfg)) == loss
    assert 0.0 < loss < 20.0
