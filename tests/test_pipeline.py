"""Pipeline parallelism: loss/grad parity vs single-device train_loss.

Runs on the 8-virtual-device CPU mesh (tests/conftest.py). The contract:
``pipeline_train_loss`` over any (pipe[, data]) mesh equals
``llama.train_loss`` on one device — same math, different schedule.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from flash_attention_tpu.models import llama
from flash_attention_tpu.parallel.pipeline import pipeline_train_loss

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs >= 4 devices")


def _data(cfg, b=4, s=32, seed=0):
    rng = np.random.default_rng(seed)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    tgts = np.asarray(rng.integers(0, cfg.vocab_size, (b, s)), np.int32)
    tgts[0, -5:] = -100  # exercise the ignore mask
    return toks, jnp.asarray(tgts)


@pytest.mark.parametrize("n_stages,n_micro", [(2, 2), (2, 4), (4, 4)])
def test_pipeline_loss_matches_single(n_stages, n_micro):
    cfg = llama.LlamaConfig.tiny(n_layers=4)
    params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    toks, tgts = _data(cfg)
    want = llama.train_loss(params, toks, tgts, cfg, remat=False)
    mesh = Mesh(np.asarray(jax.devices()[:n_stages]), axis_names=("pipe",))
    got = pipeline_train_loss(params, toks, tgts, cfg, mesh=mesh,
                              n_micro=n_micro, remat=False)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)


def test_pipeline_grads_match_single():
    cfg = llama.LlamaConfig.tiny(n_layers=4)
    params = llama.init_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    toks, tgts = _data(cfg, seed=1)
    want = jax.grad(llama.train_loss)(params, toks, tgts, cfg)
    mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("pipe",))

    def loss(p):
        return pipeline_train_loss(p, toks, tgts, cfg, mesh=mesh, n_micro=4)

    got = jax.grad(loss)(params)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=5e-4, atol=5e-6,
            err_msg=k)


def test_pipeline_composes_with_data_parallel():
    cfg = llama.LlamaConfig.tiny(n_layers=4)
    params = llama.init_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    toks, tgts = _data(cfg, b=8, seed=2)
    want = llama.train_loss(params, toks, tgts, cfg, remat=False)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                axis_names=("data", "pipe"))
    got = pipeline_train_loss(params, toks, tgts, cfg, mesh=mesh,
                              data_axis="data", n_micro=2, remat=False)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)


def test_pipeline_gemma2_grouped_windows():
    """Alternating window/global layers: the per-stage scan over layer
    GROUPS must keep each sub-layer's static window."""
    cfg = llama.LlamaConfig.tiny_gemma2(n_layers=4)
    params = llama.init_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    toks, tgts = _data(cfg, seed=3)
    want = llama.train_loss(params, toks, tgts, cfg, remat=False)
    mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("pipe",))
    got = pipeline_train_loss(params, toks, tgts, cfg, mesh=mesh,
                              n_micro=4, remat=False)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)


def test_pipeline_moe():
    cfg = llama.LlamaConfig.tiny_moe(n_layers=4)
    params = llama.init_params(jax.random.PRNGKey(4), cfg, jnp.float32)
    toks, tgts = _data(cfg, seed=4)
    want = llama.train_loss(params, toks, tgts, cfg, remat=False)
    mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("pipe",))
    got = pipeline_train_loss(params, toks, tgts, cfg, mesh=mesh,
                              n_micro=2, remat=False)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)


def test_pipeline_rejects_bad_geometry():
    cfg = llama.LlamaConfig.tiny(n_layers=3)
    params = llama.init_params(jax.random.PRNGKey(5), cfg, jnp.float32)
    toks, tgts = _data(cfg)
    mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("pipe",))
    with pytest.raises(ValueError, match="n_layers"):
        pipeline_train_loss(params, toks, tgts, cfg, mesh=mesh)
    cfg4 = llama.LlamaConfig.tiny(n_layers=4)
    params4 = llama.init_params(jax.random.PRNGKey(5), cfg4, jnp.float32)
    with pytest.raises(ValueError, match="batch"):
        pipeline_train_loss(params4, toks, tgts, cfg4, mesh=mesh, n_micro=3)
