"""Logit soft-capping (Gemma-2 style) parity tests.

Capability beyond the reference repo (causal/dense only): scaled attention
scores are squashed to ``softcap * tanh(s / softcap)`` before masking and
softmax. In the kernels this is one VPU tanh on the score tile in the fwd
(flash_fwd._online_softmax_step) and the same recompute plus the
``1 - tanh^2`` chain-rule factor on dS in both bwd kernels (flash_bwd); the
decode half lives in paged_attention (applied after the fused per-token
quant scales, i.e. to the full logit).

Oracle: ops.reference / paged_attention_reference with the same capping;
gates are the repo's standard fwd/bwd tolerances (utils/metrics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu import bwd, flash_attention, fwd, varlen_bwd, varlen_fwd
from flash_attention_tpu.ops.paged_attention import (
    paged_attention,
    paged_attention_reference,
)
from flash_attention_tpu.ops.reference import (
    reference_attention,
    reference_attention_bwd,
)
from flash_attention_tpu.utils.metrics import assert_metrics

TOLS = {"atol": 5e-3, "mean_atol": 2e-4, "mean_rtol": 1e-2}
LSE_TOLS = {"atol": 1e-2, "mean_atol": 1e-3, "mean_rtol": 1e-2}

# Gemma-2 uses 50 (attention); small caps stress the tanh saturation and the
# bwd 1 - tanh^2 factor (scores at d=128 easily exceed |s| = 5).
SOFTCAPS = [50.0, 5.0]


def _setup(seed, b, sq, sk, h, hk, d, dtype=jnp.float16):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    return (jax.random.normal(ks[0], (b, sq, h, d), dtype),
            jax.random.normal(ks[1], (b, sk, hk, d), dtype),
            jax.random.normal(ks[2], (b, sk, hk, d), dtype),
            jax.random.normal(ks[3], (b, sq, h, d), dtype))


@pytest.mark.parametrize("softcap", SOFTCAPS)
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seqlen_q,seqlen_k", [
    (256, 256), (63, 63), (129, 257), (640, 384),
])
def test_softcap_fwd(seqlen_q, seqlen_k, causal, softcap):
    q, k, v, _ = _setup(11, 2, seqlen_q, seqlen_k, 4, 2, 128)
    o, lse = fwd(q, k, v, is_causal=causal, softcap=softcap)
    o_r, lse_r = reference_attention(q, k, v, causal=causal, softcap=softcap)
    tag = f"cap={softcap},{seqlen_q}x{seqlen_k},causal={causal}"
    assert_metrics(f"o[{tag}]", o, o_r, TOLS)
    assert_metrics(f"lse[{tag}]", lse, lse_r, LSE_TOLS)


@pytest.mark.parametrize("softcap", SOFTCAPS)
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seqlen_q,seqlen_k", [(256, 256), (129, 257)])
def test_softcap_bwd(seqlen_q, seqlen_k, causal, softcap):
    q, k, v, do = _setup(12, 2, seqlen_q, seqlen_k, 4, 2, 128)
    o, lse = fwd(q, k, v, is_causal=causal, softcap=softcap)
    dq, dk, dv = bwd(q, k, v, o, lse, do, is_causal=causal, softcap=softcap)
    dq_r, dk_r, dv_r = reference_attention_bwd(
        q, k, v, do, causal=causal, softcap=softcap)
    tag = f"cap={softcap},{seqlen_q}x{seqlen_k},causal={causal}"
    assert_metrics(f"dq[{tag}]", dq, dq_r, TOLS)
    assert_metrics(f"dk[{tag}]", dk, dk_r, TOLS)
    assert_metrics(f"dv[{tag}]", dv, dv_r, TOLS)


def test_softcap_differentiable():
    """custom_vjp path (flash_attention) with softcap, incl. GQA."""
    q, k, v, do = _setup(13, 1, 192, 384, 4, 1, 128, jnp.float32)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, softcap=30.0)
                       * do)

    def loss_ref(q, k, v):
        o, _ = reference_attention(q, k, v, causal=True, softcap=30.0)
        return jnp.sum(o.astype(jnp.float32) * do)

    g = jax.grad(loss, (0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for a, b, n in zip(g, g_r, "q k v".split()):
        assert_metrics(f"d{n}", a, b, TOLS)


def test_softcap_composes_with_window():
    q, k, v, _ = _setup(14, 1, 300, 300, 4, 4, 128)
    o, _ = fwd(q, k, v, is_causal=True, window_size=(64, 0), softcap=20.0)
    o_r, _ = reference_attention(q, k, v, causal=True, window=(64, 0),
                                 softcap=20.0)
    assert_metrics("o[win+cap]", o, o_r, TOLS)


def test_softcap_changes_output():
    """Guard against the flag being silently dropped anywhere in the stack."""
    q, k, v, _ = _setup(15, 1, 128, 128, 2, 2, 128)
    o_dense = fwd(q, k, v, is_causal=True)[0]
    o_cap = fwd(q, k, v, is_causal=True, softcap=5.0)[0]
    assert float(jnp.max(jnp.abs(o_dense.astype(jnp.float32)
                                 - o_cap.astype(jnp.float32)))) > 1e-3


@pytest.mark.parametrize("causal", [False, True])
def test_softcap_varlen(causal):
    rng = np.random.default_rng(16)
    lens = [17, 64, 111]
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    total = int(cu[-1])
    ks = jax.random.split(jax.random.PRNGKey(17), 4)
    q = jax.random.normal(ks[0], (total, 4, 128), jnp.float16)
    k = jax.random.normal(ks[1], (total, 4, 128), jnp.float16)
    v = jax.random.normal(ks[2], (total, 4, 128), jnp.float16)
    do = jax.random.normal(ks[3], (total, 4, 128), jnp.float16)

    o, lse = varlen_fwd(q, k, v, cu, cu, is_causal=causal, softcap=25.0)
    dq, dk, dv = varlen_bwd(q, k, v, o, lse, do, cu, cu, is_causal=causal,
                            softcap=25.0)
    # per-sequence oracle (the reference suite's vanilla-ref-per-seq pattern)
    for i, (s0, s1) in enumerate(zip(cu[:-1], cu[1:])):
        qs, ks_, vs, dos = (t[s0:s1][None] for t in (q, k, v, do))
        o_r, _ = reference_attention(qs, ks_, vs, causal=causal, softcap=25.0)
        dq_r, dk_r, dv_r = reference_attention_bwd(
            qs, ks_, vs, dos, causal=causal, softcap=25.0)
        assert_metrics(f"o[seq{i}]", o[s0:s1], o_r[0], TOLS)
        assert_metrics(f"dq[seq{i}]", dq[s0:s1], dq_r[0], TOLS)
        assert_metrics(f"dk[seq{i}]", dk[s0:s1], dk_r[0], TOLS)
        assert_metrics(f"dv[seq{i}]", dv[s0:s1], dv_r[0], TOLS)


@pytest.mark.parametrize("quantized", [False, True])
def test_softcap_paged_decode(quantized):
    """Decode-side softcap, incl. its interaction with fused int8 KV scales
    (the cap must see the FULL logit, i.e. after the per-token k-scale)."""
    b, h, hk, d, page_size, pps = 3, 4, 2, 128, 128, 8
    total_pages = b * pps + 1
    ks = jax.random.split(jax.random.PRNGKey(18), 4)
    q = jax.random.normal(ks[0], (b, h, d), jnp.float32)
    kp = jax.random.normal(ks[1], (hk, total_pages, page_size, d), jnp.float32)
    vp = jax.random.normal(ks[2], (hk, total_pages, page_size, d), jnp.float32)
    k_scales = v_scales = None
    if quantized:
        kq = jnp.clip(jnp.round(kp * 40), -127, 127)
        vq = jnp.clip(jnp.round(vp * 40), -127, 127)
        kp, vp = kq.astype(jnp.int8), vq.astype(jnp.int8)
        k_scales = jnp.broadcast_to(
            jax.random.uniform(ks[3], (hk, total_pages, 1, 128),
                               jnp.float32, 0.01, 0.05),
            (hk, total_pages, 8, 128))
        v_scales = k_scales
    lengths = jnp.array([5, 700, 1024], jnp.int32)
    tables = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps)
    o = paged_attention(q, kp, vp, lengths, tables, k_scales=k_scales,
                        v_scales=v_scales, softcap=10.0)
    o_r = paged_attention_reference(q, kp, vp, lengths, tables,
                                    k_scales=k_scales, v_scales=v_scales,
                                    softcap=10.0)
    assert_metrics(f"o[paged,quant={quantized}]", o, o_r, TOLS)
