"""Mixture-of-Experts: grouped matmul, MoE FFN, Mixtral model family, EP.

Oracles: a per-token Python loop over the routed experts (dispatch-free) and
a dense compute-all-experts einsum (for gradients). The model-level gate is
the same engine-vs-dense-greedy parity every other family gets, plus HF
Mixtral logits parity in tests/test_hf_import.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models import llama
from flash_attention_tpu.ops import moe

CFG = llama.LlamaConfig.tiny_moe()


def _act(a):
    return jax.nn.silu(a.astype(jnp.float32))


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def _moe_oracle(x, rw, wg, wu, wd, k):
    """Per-token loop: route, run each winner expert densely, combine."""
    w, ids, _ = moe.route(x, rw, k)
    out = np.zeros(x.shape, np.float32)
    xf = np.asarray(x, np.float32)
    for t in range(x.shape[0]):
        for j in range(k):
            e = int(ids[t, j])
            h = (np.asarray(_act(jnp.asarray(xf[t] @ np.asarray(wg[e]))))
                 * (xf[t] @ np.asarray(wu[e])))
            out[t] += float(w[t, j]) * (h @ np.asarray(wd[e]))
    return out


def test_grouped_matmul_matches_dense():
    rng = np.random.default_rng(0)
    e, k_dim, n_dim, br = 4, 256, 384, 128
    nb = 6
    x = jnp.asarray(rng.normal(size=(nb * br, k_dim)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(e, k_dim, n_dim)), jnp.float32)
    be = jnp.asarray([2, 0, 0, 3, -1, 1], jnp.int32)
    y = moe.grouped_matmul(x, w, be)
    for i in range(nb):
        blk = y[i * br:(i + 1) * br]
        if int(be[i]) < 0:
            assert float(jnp.max(jnp.abs(blk))) == 0.0  # dead block => zeros
        else:
            want = x[i * br:(i + 1) * br] @ w[int(be[i])]
            np.testing.assert_allclose(np.asarray(blk), np.asarray(want),
                                       rtol=1e-5, atol=1e-4)


def test_moe_ffn_matches_per_token_oracle():
    rng = np.random.default_rng(1)
    t, d, f, e, k = 53, 256, 512, 8, 2
    x = jnp.asarray(rng.normal(size=(t, d)), jnp.float32)
    rw = jnp.asarray(rng.normal(size=(d, e)) * 0.1, jnp.float32)
    wg = jnp.asarray(rng.normal(size=(e, d, f)) * 0.05, jnp.float32)
    wu = jnp.asarray(rng.normal(size=(e, d, f)) * 0.05, jnp.float32)
    wd = jnp.asarray(rng.normal(size=(e, f, d)) * 0.05, jnp.float32)
    out, _ = moe.moe_ffn(x, rw, wg, wu, wd, n_top=k, act=_act)
    want = _moe_oracle(x, rw, wg, wu, wd, k)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_moe_ffn_expert_parallel_partials_sum():
    """Two shards of 4 experts each (expert_offset 0 / 4): partial outputs
    must sum to the single-shard result — the EP psum contract."""
    rng = np.random.default_rng(2)
    t, d, f, e, k = 37, 256, 512, 8, 2
    x = jnp.asarray(rng.normal(size=(t, d)), jnp.float32)
    rw = jnp.asarray(rng.normal(size=(d, e)) * 0.1, jnp.float32)
    wg = jnp.asarray(rng.normal(size=(e, d, f)) * 0.05, jnp.float32)
    wu = jnp.asarray(rng.normal(size=(e, d, f)) * 0.05, jnp.float32)
    wd = jnp.asarray(rng.normal(size=(e, f, d)) * 0.05, jnp.float32)
    full, _ = moe.moe_ffn(x, rw, wg, wu, wd, n_top=k, act=_act)
    o0, _ = moe.moe_ffn(x, rw, wg[:4], wu[:4], wd[:4], n_top=k, act=_act,
                        expert_offset=jnp.int32(0))
    o1, _ = moe.moe_ffn(x, rw, wg[4:], wu[4:], wd[4:], n_top=k, act=_act,
                        expert_offset=jnp.int32(4))
    np.testing.assert_allclose(np.asarray(o0 + o1), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_moe_grads_match_dense_autodiff():
    """custom_vjp grouped matmul: dx/dw match jax.grad of a dense
    compute-all-experts formulation with identical routing."""
    rng = np.random.default_rng(3)
    t, d, f, e, k = 37, 256, 512, 8, 2
    x = jnp.asarray(rng.normal(size=(t, d)), jnp.float32)
    rw = jnp.asarray(rng.normal(size=(d, e)) * 0.1, jnp.float32)
    wg = jnp.asarray(rng.normal(size=(e, d, f)) * 0.05, jnp.float32)
    wu = jnp.asarray(rng.normal(size=(e, d, f)) * 0.05, jnp.float32)
    wd = jnp.asarray(rng.normal(size=(e, f, d)) * 0.05, jnp.float32)

    def dense(x, wg_, wu_, wd_):
        w, ids, _ = moe.route(x, rw, k)
        h = jnp.einsum("td,edf->tef", x, wg_)
        u = jnp.einsum("td,edf->tef", x, wu_)
        y = jnp.einsum("tef,efd->ted", _act(h) * u, wd_)
        cw = jnp.sum(jax.nn.one_hot(ids, e, dtype=jnp.float32)
                     * w[..., None], axis=1)
        return jnp.sum(y * cw[..., None], axis=1)

    def loss_kernel(*a):
        o, _ = moe.moe_ffn(a[0], rw, a[1], a[2], a[3], n_top=k, act=_act)
        return jnp.sum(jnp.sin(o))

    def loss_dense(*a):
        return jnp.sum(jnp.sin(dense(*a)))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(x, wg, wu, wd)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(x, wg, wu, wd)
    for a, b in zip(gk, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def _greedy_dense(params, prompt, n_new):
    toks = list(prompt)
    for _ in range(n_new):
        logits, _, _ = llama.prefill(params,
                                     jnp.asarray(toks, jnp.int32)[None], CFG)
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


def test_moe_engine_matches_dense_greedy(params):
    from flash_attention_tpu.serving.engine import Engine
    eng = Engine(CFG, params, total_pages=96, page_size=16, max_batch=4,
                 max_seq_len=256, kv_dtype=jnp.float32)
    rng = np.random.default_rng(4)
    prompts = [list(map(int, rng.integers(0, 255, size=n)))
               for n in (5, 23, 17)]
    reqs = [eng.add_request(p, max_new_tokens=6) for p in prompts]
    done = eng.run()
    assert len(done) == 3
    for req, prompt in zip(reqs, prompts):
        want = _greedy_dense(params, prompt, 6)
        assert req.output == want, (req.output, want)


def test_moe_chunked_prefill_matches_full(params):
    """prefill_chunk through the MoE FFN == the same columns of prefill."""
    rng = np.random.default_rng(5)
    toks = jnp.asarray(rng.integers(0, 255, size=(2, 48)), jnp.int32)
    full_logits, ks, vs = llama.prefill(params, toks, CFG)
    ps, npp = 16, 2
    total_pages = 16
    kp = jnp.zeros((CFG.n_layers, CFG.n_kv_heads, total_pages, ps,
                    CFG.head_dim), jnp.float32)
    vp = jnp.zeros_like(kp)
    tables = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    # write the first npp*ps=32 tokens' KV into pages
    dest = jnp.asarray([0, 1, 2, 3], jnp.int32)
    src_row = jnp.asarray([0, 0, 1, 1], jnp.int32)
    src_page = jnp.asarray([0, 1, 0, 1], jnp.int32)
    kp, vp, _, _ = llama.write_prefill_to_pages(
        kp, vp, (ks, vs), dest, src_row, src_page, ps)
    done = jnp.asarray([32, 32], jnp.int32)
    clen = jnp.asarray([16, 16], jnp.int32)
    logits, _, _ = llama.prefill_chunk(params, toks[:, 32:], done, clen,
                                       kp, vp, None, None, tables, CFG)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(full_logits[:, 32:]),
                               rtol=1e-4, atol=1e-4)


def test_moe_train_loss_grads(params):
    rng = np.random.default_rng(6)
    toks = jnp.asarray(rng.integers(0, 255, size=(2, 32)), jnp.int32)
    tgt = jnp.asarray(rng.integers(0, 255, size=(2, 32)), jnp.int32)
    loss, grads = jax.value_and_grad(llama.train_loss)(params, toks, tgt,
                                                       CFG)
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    # router and expert stacks get nonzero gradient signal
    assert float(jnp.max(jnp.abs(grads["w_router"]))) > 0
    assert float(jnp.max(jnp.abs(grads["w_gate"]))) > 0


def test_moe_tensor_parallel_engine_matches_single(params):
    """Expert-parallel engine (experts sharded over the model axis) must
    reproduce single-device generations exactly."""
    from jax.sharding import Mesh
    from flash_attention_tpu.serving.engine import Engine

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    rng = np.random.default_rng(7)
    prompts = [list(map(int, rng.integers(0, 255, size=n))) for n in (8, 21)]

    def gen(mesh):
        eng = Engine(CFG, params, total_pages=64, page_size=16, max_batch=2,
                     max_seq_len=128, kv_dtype=jnp.float32, mesh=mesh)
        reqs = [eng.add_request(p, max_new_tokens=5) for p in prompts]
        eng.run()
        return [r.output for r in reqs]

    single = [_greedy_dense(params, p, 5) for p in prompts]
    mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("model",))
    tp = gen(mesh)
    assert tp == single


def test_moe_quantize_params_rejected(params):
    with pytest.raises(NotImplementedError, match="MoE"):
        llama.quantize_params(params)
