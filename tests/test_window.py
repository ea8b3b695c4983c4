"""Sliding-window (local) attention parity tests.

Capability beyond the reference repo (which is causal/dense only): the
upstream flash-attention ecosystem's ``window_size=(left, right)`` API —
query i attends keys j with ``i + off - left <= j <= i + off + right``
(lower-right alignment, off = seqlen_k - seqlen_q; entries < 0 = unbounded).
On TPU the window is a band generalization of the causal 3-state block
schedule (flash_fwd.normalize_band): plain causal is the band (inf, 0), a
window narrows both edges, and out-of-band blocks are pruned with their DMAs
elided — so a 4k-window 16k-seq attention does ~4k-seq work per query block.

Oracle: ops.reference with the same window mask; gates are the repo's
standard fwd/bwd tolerances (utils/metrics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu import bwd, flash_attention, fwd, varlen_bwd, varlen_fwd
from flash_attention_tpu.ops.flash_fwd import normalize_band
from flash_attention_tpu.ops.reference import (
    reference_attention,
    reference_attention_bwd,
)
from flash_attention_tpu.utils.metrics import assert_metrics

TOLS = {"atol": 5e-3, "mean_atol": 2e-4, "mean_rtol": 1e-2}
LSE_TOLS = {"atol": 1e-2, "mean_atol": 1e-3, "mean_rtol": 1e-2}

WINDOWS = [
    (64, 0),     # causal-style band
    (64, 32),    # two-sided
    (-1, 16),    # right-only bound
    (50, -1),    # left-only bound
]


def _setup(seed, b, sq, sk, h, hk, d, dtype=jnp.float16):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    return (jax.random.normal(ks[0], (b, sq, h, d), dtype),
            jax.random.normal(ks[1], (b, sk, hk, d), dtype),
            jax.random.normal(ks[2], (b, sk, hk, d), dtype),
            jax.random.normal(ks[3], (b, sq, h, d), dtype))


def test_normalize_band():
    # causal alone is the (inf, 0) band; window narrows it; -1 = unbounded
    assert normalize_band(False, None) is None
    assert normalize_band(True, None) == (None, 0)
    assert normalize_band(False, (-1, -1)) is None
    assert normalize_band(True, (-1, -1)) == (None, 0)
    assert normalize_band(False, (64, 32)) == (64, 32)
    assert normalize_band(True, (64, 32)) == (64, 0)
    assert normalize_band(True, (64, -1)) == (64, 0)
    assert normalize_band(False, (-1, 16)) == (None, 16)


@pytest.mark.parametrize("window", WINDOWS)
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seqlen_q,seqlen_k", [
    (256, 256), (63, 63), (129, 257), (640, 384), (1025, 1025),
])
def test_window_fwd(seqlen_q, seqlen_k, causal, window):
    q, k, v, _ = _setup(3, 2, seqlen_q, seqlen_k, 4, 2, 128)
    o, lse = fwd(q, k, v, is_causal=causal, window_size=window)
    o_r, lse_r = reference_attention(q, k, v, causal=causal, window=window)
    tag = f"win={window},{seqlen_q}x{seqlen_k},causal={causal}"
    assert_metrics(f"o[{tag}]", o, o_r, TOLS)
    assert_metrics(f"lse[{tag}]", lse, lse_r, LSE_TOLS)


@pytest.mark.parametrize("window", WINDOWS)
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seqlen_q,seqlen_k", [(256, 256), (129, 257), (640, 384)])
def test_window_bwd(seqlen_q, seqlen_k, causal, window):
    q, k, v, do = _setup(4, 2, seqlen_q, seqlen_k, 4, 2, 128)
    o, lse = fwd(q, k, v, is_causal=causal, window_size=window)
    dq, dk, dv = bwd(q, k, v, o, lse, do, is_causal=causal,
                     window_size=window)
    dq_r, dk_r, dv_r = reference_attention_bwd(q, k, v, do, causal=causal,
                                               window=window)
    tag = f"win={window},{seqlen_q}x{seqlen_k},causal={causal}"
    assert_metrics(f"dq[{tag}]", dq, dq_r, TOLS)
    assert_metrics(f"dk[{tag}]", dk, dk_r, TOLS)
    assert_metrics(f"dv[{tag}]", dv, dv_r, TOLS)


def test_window_differentiable():
    """flash_attention(window_size=...) custom_vjp round-trips gradients."""
    q, k, v, _ = _setup(5, 1, 256, 256, 4, 2, 128, jnp.float32)

    def f(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True,
                                       window_size=(64, -1)))

    def g(q, k, v):
        return jnp.sum(reference_attention(q, k, v, causal=True,
                                           window=(64, -1), return_lse=False))

    for got, want in zip(jax.grad(f, (0, 1, 2))(q, k, v),
                         jax.grad(g, (0, 1, 2))(q, k, v)):
        assert_metrics("grad[window diff]", got, want, TOLS)


def test_window_degenerate_diagonal():
    """window (0, 0) + causal: every query sees exactly one key — O must be
    exactly V at the aligned position (softmax over one element)."""
    q, k, v, _ = _setup(6, 1, 128, 128, 2, 2, 128)
    o, _ = fwd(q, k, v, is_causal=True, window_size=(0, 0))
    assert_metrics("o[diag]", o, v, {"atol": 1e-3, "mean_atol": 1e-4,
                                     "mean_rtol": 1e-2})


def test_window_matches_unwindowed_when_wide():
    """A window wider than the sequence must be numerically identical to no
    window at all (band normalization + pruning must not perturb values)."""
    q, k, v, _ = _setup(7, 1, 320, 320, 2, 2, 128)
    o_w, lse_w = fwd(q, k, v, is_causal=True, window_size=(4096, 4096))
    o, lse = fwd(q, k, v, is_causal=True)
    assert np.array_equal(np.asarray(o_w), np.asarray(o))
    assert np.array_equal(np.asarray(lse_w), np.asarray(lse))


@pytest.mark.parametrize("causal", [False, True])
def test_window_varlen(causal):
    """Windowed packed varlen vs per-sequence oracle (ragged lengths)."""
    lens_q = [100, 57, 200]
    lens_k = [80, 57, 150]
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(lens_q)]), jnp.int32)
    cu_k = jnp.asarray(np.concatenate([[0], np.cumsum(lens_k)]), jnp.int32)
    tq, tk = int(cu_q[-1]), int(cu_k[-1])
    ks = jax.random.split(jax.random.PRNGKey(8), 4)
    q = jax.random.normal(ks[0], (tq, 4, 128), jnp.float16)
    k = jax.random.normal(ks[1], (tk, 2, 128), jnp.float16)
    v = jax.random.normal(ks[2], (tk, 2, 128), jnp.float16)
    do = jax.random.normal(ks[3], (tq, 4, 128), jnp.float16)
    win = (40, -1) if causal else (40, 24)
    o, lse = varlen_fwd(q, k, v, cu_q, cu_k, is_causal=causal,
                        window_size=win)
    dq, dk, dv = varlen_bwd(q, k, v, o, lse, do, cu_q, cu_k,
                            is_causal=causal, window_size=win)
    for i in range(len(lens_q)):
        s, e = int(cu_q[i]), int(cu_q[i + 1])
        sk_, ek_ = int(cu_k[i]), int(cu_k[i + 1])
        o_r, _ = reference_attention(
            q[None, s:e], k[None, sk_:ek_], v[None, sk_:ek_],
            causal=causal, window=win)
        dq_r, dk_r, dv_r = reference_attention_bwd(
            q[None, s:e], k[None, sk_:ek_], v[None, sk_:ek_], do[None, s:e],
            causal=causal, window=win)
        tag = f"varlen win seq{i} causal={causal}"
        assert_metrics(f"o[{tag}]", o[s:e], o_r[0], TOLS)
        assert_metrics(f"dq[{tag}]", dq[s:e], dq_r[0], TOLS)
        assert_metrics(f"dk[{tag}]", dk[sk_:ek_], dk_r[0], TOLS)
        assert_metrics(f"dv[{tag}]", dv[sk_:ek_], dv_r[0], TOLS)
