"""Device-mesh helpers.

The reference has no distributed layer at all (SURVEY.md §2.3 — zero
collective calls); on TPU the entire transport is XLA collectives over
ICI/DCN, organized by a named mesh. Axes:

  data    — batch (pure DP, no comms in attention)
  model   — heads / hidden (TP; all-reduce after o-proj)
  context — kv sequence (CP; ring attention / LSE-merge)
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    model: int = 1,
    context: int = 1,
    devices=None,
) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    need = data * model * context
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, model, context)
    return Mesh(arr, axis_names=("data", "model", "context"))
