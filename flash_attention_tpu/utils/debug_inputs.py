"""Deterministic identity-pattern test inputs — the analogue of the
reference's ``use_identity_inputs`` debug mode
(``/root/reference/test_flash_attn.py:74-109, 718-749``).

Set ``FAT_IDENTITY_INPUTS=1`` and the parity suites replace random Q/K/V/dO
with one-hot rows: token ``i`` of every head is ``e_{i mod head_dim}``. Score
matrices then hold exact 0/1 blocks and outputs become readable index
patterns, so a failing case's ``FAT_FAIL_DUMP`` forensics CSV shows *which*
rows/columns/blocks went wrong (an off-by-one block boundary reads as a
shifted stripe) instead of statistical noise. Complements the statistical
dump — opt-in, never on in CI.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

IDENTITY_ENV = "FAT_IDENTITY_INPUTS"


def identity_inputs_enabled() -> bool:
    return os.environ.get(IDENTITY_ENV, "").strip() not in ("", "0")


def identity_sequence(seqlen: int, heads: int, head_dim: int, dtype):
    """(seqlen, heads, head_dim): row i is one-hot at column i % head_dim,
    identical across heads (test_flash_attn.py:74-83)."""
    rows = jnp.eye(head_dim, dtype=dtype)[jnp.arange(seqlen) % head_dim]
    return jnp.broadcast_to(rows[:, None, :], (seqlen, heads, head_dim))


def identity_batch(batch: int, seqlen: int, heads: int, head_dim: int, dtype):
    """(batch, seqlen, heads, head_dim), same pattern in every batch row."""
    seq = identity_sequence(seqlen, heads, head_dim, dtype)
    return jnp.broadcast_to(seq[None], (batch, *seq.shape))


def identity_packed(lens, heads: int, head_dim: int, dtype):
    """Packed (sum(lens), heads, head_dim); the one-hot pattern RESTARTS at
    column 0 for each sequence (test_flash_attn.py:101-109), so a cross-
    sequence leak shows up as a phase-shifted stripe."""
    lens = [int(l) for l in np.asarray(lens)]
    if not lens or sum(lens) == 0:
        return jnp.zeros((0, heads, head_dim), dtype)
    return jnp.concatenate(
        [identity_sequence(l, heads, head_dim, dtype) for l in lens if l > 0],
        axis=0)
