"""Parity coverage for the round-5 block-config specializations.

The forward/backward kernels pick between several structurally different
code paths based on BlockSizes (see flash_fwd._fwd_kernel and
flash_bwd._dq_kernel):

  * one-shot (nk == 1): online-softmax state in SSA, no VMEM scratch
  * wide-KV one-shot with block_kv_inner sub-tiles
  * static causal-diagonal triangle (diag_static / block_q_inner)
  * static (q-band, kv-block) switch (band_switch, incl. nk == 2)
  * classic multi-block scratch grid

These tests pin every path against the fp32 oracle with explicit
BlockSizes, independent of what for_shape currently picks, using
MIN_BLOCK-sized tiles so the whole matrix runs in interpret mode quickly.
"""

import jax
import jax.numpy as jnp
import pytest

import flash_attention_tpu as fat
from flash_attention_tpu.ops.configs import BlockSizes
from flash_attention_tpu.ops.reference import reference_attention

D = 128


def _mk(sq, sk, h, hk, key=0):
    kq, kk, kv, kd = jax.random.split(jax.random.PRNGKey(key), 4)
    q = jax.random.normal(kq, (1, sq, h, D), jnp.float32)
    k = jax.random.normal(kk, (1, sk, hk, D), jnp.float32)
    v = jax.random.normal(kv, (1, sk, hk, D), jnp.float32)
    do = jax.random.normal(kd, (1, sq, h, D), jnp.float32)
    return q, k, v, do


def _check_fwd(q, k, v, bs, causal, window=None, atol=5e-5, lse_atol=5e-4):
    o, lse = fat.fwd(q, k, v, is_causal=causal, window_size=window,
                     block_sizes=bs)
    o_ref, lse_ref = reference_attention(q, k, v, causal=causal,
                                         window=window)
    assert float(jnp.abs(o - o_ref).max()) < atol
    assert float(jnp.abs(lse - lse_ref).max()) < lse_atol
    return o, lse


def _check_bwd(q, k, v, do, bs, causal, window=None, atol=2e-4):
    o, lse = fat.fwd(q, k, v, is_causal=causal, window_size=window,
                     block_sizes=bs)
    dq, dk, dv = fat.bwd(q, k, v, o, lse, do, is_causal=causal,
                         window_size=window, block_sizes=bs)

    def loss(q, k, v):
        o_ref, _ = reference_attention(q, k, v, causal=causal, window=window)
        return jnp.sum(o_ref * do)

    dq_r, dk_r, dv_r = jax.grad(loss, (0, 1, 2))(q, k, v)
    for a, b in ((dq, dq_r), (dk, dk_r), (dv, dv_r)):
        assert float(jnp.abs(a - b).max()) < atol


# one-shot band switch, per-qi bands (nq = 4, nk = 1)
BS_BAND1 = BlockSizes(block_q=128, block_kv=512, block_kv_inner=128)
# (band, ki) switch at nk = 2
BS_BAND2 = BlockSizes(block_q=128, block_kv=256, block_kv_inner=128)
# one-shot static diagonal triangle (256^2 block, 128-row stripes)
BS_DIAG = BlockSizes(block_q=256, block_kv=256, block_kv_inner=128,
                     block_q_inner=128)
# classic scratch grid (control)
BS_GRID = BlockSizes(block_q=128, block_kv=128)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("window", [None, (200, None), (100, 30)])
@pytest.mark.parametrize("bs", [BS_BAND1, BS_BAND2, BS_GRID],
                         ids=["band-nk1", "band-nk2", "grid"])
def test_fwd_band_paths_square(causal, window, bs):
    q, k, v, _ = _mk(512, 512, 2, 2)
    _check_fwd(q, k, v, bs, causal, window)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("shape", [(512, 200), (200, 500), (450, 450)],
                         ids=["sq>sk", "sq<sk", "ragged"])
@pytest.mark.parametrize("bs", [BS_BAND1, BS_BAND2],
                         ids=["band-nk1", "band-nk2"])
def test_fwd_band_paths_uneven(causal, shape, bs):
    sq, sk = shape
    q, k, v, _ = _mk(sq, sk, 2, 2)
    _check_fwd(q, k, v, bs, causal)


@pytest.mark.parametrize("causal", [False, True])
def test_fwd_diag_triangle(causal):
    q, k, v, _ = _mk(256, 256, 2, 2)
    _check_fwd(q, k, v, BS_DIAG, causal)
    # multi-block diagonal (nq = nk = 2) falls back to the full masked sweep
    q, k, v, _ = _mk(512, 512, 2, 2)
    _check_fwd(q, k, v, BS_DIAG, causal)


@pytest.mark.parametrize("causal", [False, True])
def test_fwd_oneshot_gqa(causal):
    q, k, v, _ = _mk(384, 384, 4, 2)
    _check_fwd(q, k, v, BS_BAND1, causal)


# dq wide one-shot (bkv_dq = whole seq, sub-tiled), dkv classic
BS_DQ_WIDE = BlockSizes(block_q=256, block_kv=512, block_kv_inner=256,
                        block_q_dq=128, block_kv_dq=512,
                        block_kv_dq_inner=128,
                        block_q_dkv=256, block_kv_dkv=128)
# dq (band, ki) switch at nk = 2; dkv with q sub-tiles
BS_DQ_BAND2 = BlockSizes(block_q=256, block_kv=512,
                         block_q_dq=128, block_kv_dq=256,
                         block_kv_dq_inner=128,
                         block_q_dkv=256, block_kv_dkv=256,
                         block_q_dkv_inner=128)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("bs", [BS_DQ_WIDE, BS_DQ_BAND2],
                         ids=["dq-wide", "dq-band2"])
def test_bwd_dq_paths(causal, bs):
    q, k, v, do = _mk(512, 512, 2, 2)
    _check_bwd(q, k, v, do, bs, causal)


@pytest.mark.parametrize("causal", [False, True])
def test_bwd_dq_paths_uneven_gqa(causal):
    q, k, v, do = _mk(450, 380, 4, 2)
    _check_bwd(q, k, v, do, BS_DQ_BAND2, causal)


@pytest.mark.parametrize("causal", [False, True])
def test_bwd_window_wide(causal):
    q, k, v, do = _mk(512, 512, 2, 2)
    _check_bwd(q, k, v, do, BS_DQ_WIDE, causal, window=(200, None))


@pytest.mark.parametrize("causal", [False, True])
def test_default_table_buckets(causal):
    """for_shape buckets (small shapes drive the same code paths the big
    buckets pick; the wide entries clamp to the padded sequence)."""
    for sq, sk in ((300, 300), (1000, 1000), (700, 1500)):
        q, k, v, do = _mk(sq, sk, 2, 2)
        _check_fwd(q, k, v, None, causal)
        _check_bwd(q, k, v, do, None, causal)


@pytest.mark.parametrize("causal", [False, True])
def test_for_shape_invariants(causal):
    """Every table entry must keep the kernel launchable: inner tiles divide
    their blocks with a bounded unroll, and the wide rows clamp onto the
    padded sequence the wrapper will produce."""
    for sk in (128, 500, 512, 1000, 1024, 1600, 2000, 2048, 3000, 4096,
               5000, 8000, 8192, 12000, 16384, 40000):
        bs = BlockSizes.for_shape(sk, sk, D, causal=causal)
        sk_pad = -(-sk // 128) * 128
        bkv_eff = min(bs.block_kv, sk_pad)
        for inner in (bs.block_kv_inner, bs.block_kv_dq_inner):
            if inner is None:
                continue
            eff = inner if bkv_eff % inner == 0 else None
            if eff is None:
                # the wrapper gcd-snaps; the table should avoid needing it
                import math
                eff = math.gcd(bkv_eff, inner)
            assert bkv_eff % eff == 0
            assert bkv_eff // eff <= 16, (sk, causal, bkv_eff, eff)
        if bs.block_q_inner is not None:
            assert bs.block_q % bs.block_q_inner == 0
    seg = BlockSizes.for_shape(4096, 4096, D, causal=causal, segmented=True)
    assert seg.block_kv_inner is None  # varlen keeps the classic grid
