"""LoRA fine-tuning end to end: train adapter weights only (base frozen)
through the rematerialized training path, then SERVE the trained adapter
through the multi-LoRA engine — the full train -> serve loop on one stack.

Toy task: after a [BOS, x] prompt the model must emit x+1 three times.
The base model can't do it; a rank-4 adapter learns it in a few hundred
Adam steps; the engine with that adapter generates the pattern while the
base rows in the SAME batch still produce base outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

optax = pytest.importorskip("optax")

from flash_attention_tpu.models import llama, lora
from flash_attention_tpu.serving.engine import Engine

CFG = llama.LlamaConfig.tiny(vocab_size=64, n_layers=2)
TARGETS = ("wq", "wv", "w_gate", "w_down")
RANK = 4


def _batch(rng, n=16):
    """[1, x, x+1, x+1, x+1] rows; loss only on the 3 answer tokens."""
    x = rng.integers(2, 60, size=n)
    toks = np.stack([np.ones(n), x, x + 1, x + 1, x + 1], axis=1)
    tgt = np.full((n, 5), -100)
    tgt[:, 1:4] = toks[:, 2:5]  # predict token t+1 from position t
    return jnp.asarray(toks, jnp.int32), jnp.asarray(tgt, jnp.int32)


def test_lora_finetune_then_serve():
    params = llama.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    adapter = lora.init_adapter(jax.random.PRNGKey(1), CFG, RANK, TARGETS)
    stacks = lora.stack_adapters(CFG, [adapter], RANK, TARGETS, n_slots=2)
    rng = np.random.default_rng(0)

    def loss_fn(stacks, toks, tgt):
        p = {**params, "lora": stacks}
        ids = jnp.ones((toks.shape[0],), jnp.int32)  # every row: adapter 1
        return llama.train_loss(p, toks, tgt, CFG, remat=True, lora_ids=ids)

    opt = optax.adam(1e-2)
    opt_state = opt.init(stacks)

    @jax.jit
    def step(stacks, opt_state, toks, tgt):
        loss, g = jax.value_and_grad(loss_fn)(stacks, toks, tgt)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(stacks, updates), opt_state, loss

    toks0, tgt0 = _batch(rng)
    first = float(loss_fn(stacks, toks0, tgt0))
    loss = None
    for i in range(120):
        toks, tgt = _batch(rng)
        stacks, opt_state, loss = step(stacks, opt_state, toks, tgt)
    assert float(loss) < 0.2 < first, (first, float(loss))

    # base weights were never touched: slot 0 (null adapter) == base model
    t_probe, _ = _batch(rng, n=2)
    base_logits, _, _ = llama.prefill(params, t_probe, CFG)
    null_logits, _, _ = llama.prefill(
        {**params, "lora": stacks}, t_probe, CFG,
        lora_ids=jnp.zeros((2,), jnp.int32))
    np.testing.assert_allclose(np.asarray(null_logits),
                               np.asarray(base_logits), rtol=1e-5, atol=1e-6)

    # serve the TRAINED adapter: mixed batch, adapter rows learned the task
    trained = {t: (stacks[t][0][:, 1], stacks[t][1][:, 1]) for t in TARGETS}
    eng = Engine(CFG, params, total_pages=32, page_size=16, max_batch=4,
                 max_seq_len=64, kv_dtype=jnp.float32, lora_rank=RANK,
                 lora_targets=TARGETS)
    eng.add_adapter("tuned", trained)
    hits = 0
    for x in (5, 23, 41):
        r_tuned = eng.add_request([1, x], max_new_tokens=3, lora="tuned")
        eng.run()
        hits += r_tuned.output == [x + 1] * 3
    assert hits >= 2, hits  # the tuned adapter reproduces the task
