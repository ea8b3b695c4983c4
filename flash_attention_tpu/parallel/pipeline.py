"""Pipeline parallelism: GPipe-style microbatched training over a mesh axis.

The reference has no distributed layer at all (SURVEY.md §2.3); DP/TP/CP
landed in earlier rounds, this closes the remaining strategy. The TPU-native
formulation (scaling-book style): every stage runs the SAME program under
``shard_map``; the stacked (L, ...) layer weights are simply sharded on the
``pipe`` axis (in_specs P("pipe") on the layer axis — stage s owns layers
[s*L/S, (s+1)*L/S) with no manual slicing), and the stage boundary is one
``ppermute`` of the activation per schedule tick.

Schedule: M microbatches flow through S stages over M + S - 1 ticks
(``lax.scan``). At tick t, stage s works on microbatch t - s (idle outside
[0, M) — the GPipe bubble, fraction (S-1)/(M+S-1)). Stage 0 embeds
microbatch t; the last stage computes the per-microbatch cross-entropy and
accumulates; everyone ppermutes its output right. The loss is psummed over
the pipe axis at the end (only the last stage contributed).

Differentiable end to end: grads flow backwards through the scan and the
ppermute transpose (a reverse ppermute), composing with per-layer remat
(``jax.checkpoint``) and the flash kernel's custom_vjp. Composes with data
parallelism by adding a ``data`` axis to the mesh: the batch shards over
``data``, weights replicate over it, and the final psum averages over both.

Loss/grad parity vs single-device ``llama.train_loss`` is gated in
tests/test_pipeline.py (including Gemma-2 grouped-window and Mixtral MoE
stacks); ``__graft_entry__.dryrun_multichip`` exercises a (dp, pp)
factorization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from flash_attention_tpu.models import llama


def stage_specs(params, axis: str = "pipe") -> dict:
    """PartitionSpecs staging the stacked-layer weights over ``axis``.

    Every per-layer leaf shards its leading (layer) axis; embed / final norm
    / lm_head replicate (stage 0 and stage S-1 read them, the others carry
    dead copies — replicating beats a scatter for these small tensors)."""
    out = {}
    per_layer = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                 "norm_attn", "norm_mlp", "norm_post_attn", "norm_post_mlp",
                 "bq", "bk", "bv", "w_router"}
    for k, v in params.items():
        if k in per_layer:
            out[k] = P(*((axis,) + (None,) * (v.ndim - 1)))
        else:
            out[k] = P()
    return out


def _stage_forward(x, weights, cfg: llama.LlamaConfig, positions, *,
                   remat: bool, post: bool, bias: bool, moe: bool):
    """Run this stage's local layer slice on ``x`` (no KV collection) —
    the same ``llama._dense_layer`` math as single-device prefill."""
    period = cfg.window_pattern if cfg.sliding_window is not None else 1

    def body(x, wg):
        for j in range(period):
            w = jax.tree.map(lambda a: a[j], wg) if period > 1 else wg
            x, _ = llama._dense_layer(
                x, w, cfg, positions, cfg.layer_window(j), tp_axis=None,
                lora_ids=None, kv_fake_quant=None, post=post, bias=bias,
                moe=moe, has_lora=False)
        return x, None

    xs = llama._group_layers(weights, period)
    x, _ = jax.lax.scan(jax.checkpoint(body) if remat else body, x, xs)
    return x


def pipeline_train_loss(params, tokens, targets, cfg: llama.LlamaConfig, *,
                        mesh: Mesh, axis: str = "pipe",
                        data_axis: str | None = None,
                        n_micro: int | None = None, remat: bool = True):
    """Pipeline-parallel ``llama.train_loss`` (mean next-token CE).

    tokens/targets (b, s) int32 (targets -100 = ignore); the batch must
    divide n_micro (default: the pipe-axis size) times the data-axis size.
    Returns the replicated scalar loss; wrap in jax.value_and_grad.
    """
    n_stages = mesh.shape[axis]
    if cfg.n_layers % n_stages:
        raise ValueError(f"n_layers {cfg.n_layers} must divide the pipe "
                         f"axis {n_stages}")
    period = cfg.window_pattern if cfg.sliding_window is not None else 1
    if (cfg.n_layers // n_stages) % period:
        raise ValueError(f"layers per stage {cfg.n_layers // n_stages} must "
                         f"divide window_pattern {period}")
    dp = mesh.shape[data_axis] if data_axis else 1
    m = n_micro or n_stages
    b, s = tokens.shape
    if b % (m * dp):
        raise ValueError(f"batch {b} must divide n_micro {m} x dp {dp}")
    post, bias, moe = cfg.post_norms, "bq" in params, "w_router" in params
    if "lora" in params:
        raise ValueError("pipeline training with LoRA stacks is not "
                         "supported yet")
    from flash_attention_tpu.ops.quant import QuantizedTensor
    if any(isinstance(v, QuantizedTensor) for v in params.values()):
        raise ValueError("pipeline training takes float weights "
                         "(quantized tensors do not train)")

    pspecs = stage_specs(params, axis)
    tok_spec = P(data_axis) if data_axis else P()

    def run(params, tokens, targets):
        sid = jax.lax.axis_index(axis)
        bl = tokens.shape[0]
        mb = bl // m
        toks = tokens.reshape(m, mb, s)
        tgts = targets.reshape(m, mb, s)
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32),
                                     (mb, s))
        weights = llama._layer_weights(params)
        dtype = params["embed"].dtype

        def embed(mi):
            x = params["embed"][toks[mi]]
            if cfg.embed_scale:
                x = (x.astype(jnp.float32) * cfg.dim**0.5).astype(x.dtype)
            return x

        def head_loss(x, mi):
            x = llama._rmsnorm(x, params["norm_out"], cfg.norm_eps)
            logits = llama._mm(x, params["lm_head"]).astype(jnp.float32)
            if cfg.final_softcap is not None:
                logits = cfg.final_softcap * jnp.tanh(
                    logits / cfg.final_softcap)
            tgt = tgts[mi]
            valid = tgt >= 0
            safe = jnp.where(valid, tgt, 0)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
            return jnp.sum(nll * valid), jnp.sum(valid)

        right = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(carry, t):
            x_buf, loss_sum, valid_sum = carry
            mi = jnp.clip(t - sid, 0, m - 1)
            x_in = jnp.where(sid == 0, embed(jnp.clip(t, 0, m - 1)), x_buf)
            active = (t >= sid) & (t - sid < m)
            # the GPipe bubble: idle ticks skip the stage compute entirely
            x_out = jax.lax.cond(
                active,
                lambda x: _stage_forward(x, weights, cfg, positions,
                                         remat=remat, post=post, bias=bias,
                                         moe=moe),
                lambda x: x,
                x_in)
            is_last = sid == n_stages - 1
            nll, nv = jax.lax.cond(
                active & is_last,
                lambda: head_loss(x_out, mi),
                lambda: (jnp.float32(0.0), jnp.int32(0)))
            x_next = jax.lax.ppermute(x_out, axis, right)
            return (x_next, loss_sum + nll, valid_sum + nv), None

        x0 = jnp.zeros((mb, s, cfg.dim), dtype)
        (_, loss_sum, valid_sum), _ = jax.lax.scan(
            tick, (x0, jnp.float32(0.0), jnp.int32(0)),
            jnp.arange(m + n_stages - 1, dtype=jnp.int32))
        # only the last stage accumulated; psum replicates over the pipe
        # axis (and sums the data shards when dp > 1)
        axes = (axis,) if data_axis is None else (axis, data_axis)
        loss_sum = jax.lax.psum(loss_sum, axes)
        valid_sum = jax.lax.psum(valid_sum, axes)
        return loss_sum / jnp.maximum(valid_sum, 1)

    return jax.shard_map(
        run, mesh=mesh,
        in_specs=(pspecs, tok_spec, tok_spec),
        out_specs=P(),
        check_vma=False,
    )(params, tokens, targets)
