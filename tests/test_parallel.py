"""Distributed attention tests on a virtual 8-device CPU mesh.

The reference has nothing distributed (SURVEY.md §2.3); this is the hostless
multi-chip test strategy: forced host-platform device count + shard_map, so
TP and ring/context-parallel logic is validated without a pod (SURVEY.md §4.6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.ops.reference import reference_attention
from flash_attention_tpu.parallel import (
    make_mesh,
    merge_partials,
    ring_flash_attention,
    shard_flash_attention,
)
from flash_attention_tpu.utils.metrics import assert_metrics

TOLS = {"atol": 5e-3, "mean_atol": 2e-4, "mean_rtol": 1e-2}

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _qkv(key, b, sq, sk, h, hk, d, dtype=jnp.float16):
    ks = jax.random.split(key, 3)
    return (
        jax.random.normal(ks[0], (b, sq, h, d), dtype),
        jax.random.normal(ks[1], (b, sk, hk, d), dtype),
        jax.random.normal(ks[2], (b, sk, hk, d), dtype),
    )


def test_merge_partials_equals_joint():
    q, k, v = _qkv(jax.random.PRNGKey(0), 1, 128, 256, 2, 2, 64)
    from flash_attention_tpu import fwd

    o1, lse1 = fwd(q, k[:, :128], v[:, :128])
    o2, lse2 = fwd(q, k[:, 128:], v[:, 128:])
    o, lse = merge_partials(o1, lse1, o2, lse2)
    o_ref, lse_ref = reference_attention(q, k, v)
    assert_metrics("merged o", o, o_ref, TOLS)
    assert_metrics("merged lse", lse, lse_ref, {"atol": 1e-2, "mean_atol": 1e-3})


@pytest.mark.parametrize("causal", [False, True])
def test_tp_head_sharded(causal):
    mesh = make_mesh(data=2, model=4)
    q, k, v = _qkv(jax.random.PRNGKey(1), 2, 256, 256, 8, 4, 64)
    o = shard_flash_attention(q, k, v, mesh, causal=causal)
    o_ref, _ = reference_attention(q, k, v, causal=causal)
    assert_metrics(f"tp o[causal={causal}]", o, o_ref, TOLS)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_context_parallel(causal):
    mesh = make_mesh(data=1, model=2, context=4)
    q, k, v = _qkv(jax.random.PRNGKey(2), 1, 512, 512, 4, 4, 64)
    o = shard_flash_attention(q, k, v, mesh, causal=causal, context_axis="context")
    o_ref, _ = reference_attention(q, k, v, causal=causal)
    assert_metrics(f"ring o[causal={causal}]", o, o_ref, TOLS)


def test_ring_inside_shard_map_lse():
    """Ring attention returns a usable global LSE."""
    mesh = make_mesh(data=1, model=1, context=8)
    q, k, v = _qkv(jax.random.PRNGKey(3), 1, 1024, 1024, 2, 2, 64)
    from jax.sharding import PartitionSpec as P

    def local(q_, k_, v_):
        return ring_flash_attention(
            q_, k_, v_, "context", causal=True, axis_size=8
        )

    o, lse = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "context"), P(None, "context"), P(None, "context")),
        out_specs=(P(None, "context"), P(None, None, "context")),
        check_vma=False,
    )(q, k, v)
    o_ref, lse_ref = reference_attention(q, k, v, causal=True)
    assert_metrics("ring lse o", o, o_ref, TOLS)
    assert_metrics("ring lse", lse, lse_ref, {"atol": 1e-2, "mean_atol": 1e-3})


@pytest.mark.parametrize("causal", [False, True])
def test_ring_gradients(causal):
    """Ring attention backward (rotating dK/dV accumulators) must match the
    dense flash-attention gradients."""
    from jax.sharding import PartitionSpec as P

    from flash_attention_tpu import flash_attention

    mesh = make_mesh(data=1, model=1, context=4)
    q, k, v = _qkv(jax.random.PRNGKey(4), 1, 256, 256, 2, 2, 64,
                   dtype=jnp.float32)

    def ring_loss(q, k, v):
        def local(q_, k_, v_):
            o, _ = ring_flash_attention(q_, k_, v_, "context",
                                        causal=causal, axis_size=4)
            return o

        o = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(None, "context"),) * 3,
            out_specs=P(None, "context"), check_vma=False,
        )(q, k, v)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def dense_loss(q, k, v):
        o = flash_attention(q, k, v, causal=causal)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g = jax.grad(ring_loss, (0, 1, 2))(q, k, v)
    g_ref = jax.grad(dense_loss, (0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), g, g_ref):
        assert_metrics(f"ring-bwd {name}[causal={causal}]", a, b, TOLS)
