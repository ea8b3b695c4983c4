#!/usr/bin/env python
"""Benchmark harness — the TPU analogue of the reference's ``benchmark.sh``
ncu sweep (``/root/reference/benchmark.sh:17-37``): forward attention over the
README config (B=4, H=32, D=128, seq 512..16k) measuring achieved TFLOP/s vs
the chip's peak (the analogue of ``sm__throughput.avg.pct_of_peak``).

Timing methodology: the axon tunnel acks dispatch before execution, so
``block_until_ready`` alone under-reports wildly. We force completion with a
scalar host readback and remove the RPC round-trip by timing chains of N
dependent kernel applications inside one jit and fitting the slope:
t_kernel = (t(N) - t(1)) / (N - 1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
headline value is %-of-speed-of-light at seq>=8k and vs_baseline is relative
to the reference's ~63% SM throughput on T4 (README.md:20-22).
"""

import json
import time

import jax
import jax.numpy as jnp

from flash_attention_tpu import fwd

# bf16 peak matmul throughput per chip.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
}
REFERENCE_PCT_SOL = 63.0  # reference's ~63% SM throughput on T4 (README.md:20-22)


def _chip_peak() -> float:
    kind = jax.devices()[0].device_kind
    for name, peak in PEAK_FLOPS.items():
        if kind.startswith(name):
            return peak
    return 197e12  # conservative default (v5e)


def _chain(n, causal):
    """jit fn applying the fwd kernel n times with a data dependency, ending
    in a scalar readback that forces completion through the tunnel."""

    def g(q, k, v):
        o = q
        for _ in range(n):
            o = fwd(o, k, v, is_causal=causal)[0]
        return jnp.sum(o.astype(jnp.float32))

    return jax.jit(g)


def _time_readback(f, args, reps=3):
    float(f(*args))  # warm / compile
    t0 = time.perf_counter()
    for _ in range(reps):
        float(f(*args))
    return (time.perf_counter() - t0) / reps


def slope_time(chain_factory, args, n_chain, retries=3):
    """Per-application time via the chain-slope method, guarded against RPC
    jitter: when tn <= t1, retry with a doubled chain instead of silently
    clamping (round 1's max(dt, 1e-9) emitted physically-impossible rows into
    committed CSVs — twice). Returns None when the signal never rises above
    the jitter; callers must skip the row, never fabricate it."""
    t1 = _time_readback(chain_factory(1), args)
    for _ in range(retries):
        tn = _time_readback(chain_factory(n_chain), args)
        dt = (tn - t1) / (n_chain - 1)
        if dt > 0:
            return dt
        n_chain *= 2
    return None


def bench_fwd(batch, seqlen, heads, head_dim, causal, dtype=jnp.bfloat16,
              n_chain=None):
    # Short sequences need longer chains: the slope method loses the signal
    # in RPC jitter when N*t_kernel ~ the ~29 ms round-trip.
    if n_chain is None:
        n_chain = max(9, min(129, (8192 // seqlen) ** 2 * 9))
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    shape = (batch, seqlen, heads, head_dim)
    q = jax.random.normal(kq, shape, dtype)
    k = jax.random.normal(kk, shape, dtype)
    v = jax.random.normal(kv, shape, dtype)

    dt = slope_time(lambda n: _chain(n, causal), (q, k, v), n_chain)
    if dt is None:
        raise RuntimeError(
            f"slope timing lost to RPC jitter after retries at seq={seqlen} "
            f"causal={causal}; refusing to emit a fabricated number")
    flops = 4 * batch * heads * seqlen * seqlen * head_dim
    if causal:
        flops //= 2
    return flops / dt, dt


def main():
    peak = _chip_peak()
    rows = []
    for seqlen in (512, 1024, 2048, 4096, 8192, 16384):
        for causal in (False, True):
            tflops, dt = bench_fwd(4, seqlen, 32, 128, causal)
            pct = 100.0 * tflops / peak
            rows.append(dict(seqlen=seqlen, causal=causal,
                             tflops=tflops / 1e12, pct_sol=pct, ms=dt * 1e3))
            print(f"# seq={seqlen:6d} causal={int(causal)} "
                  f"{tflops/1e12:7.1f} TFLOP/s  {pct:5.1f}% SOL  {dt*1e3:8.3f} ms",
                  flush=True)

    # headline = MEAN of the dense seq>=8k rows (not best-of: round 1's max()
    # cherry-picked the luckier of two tunnel-noisy points)
    long_rows = [r for r in rows if r["seqlen"] >= 8192 and not r["causal"]]
    headline = sum(r["pct_sol"] for r in long_rows) / len(long_rows)
    print(json.dumps({
        "metric": "fwd attention % of single-chip SOL (B4 H32 D128 bf16, mean dense seq>=8k)",
        "value": round(headline, 2),
        "unit": "%",
        "vs_baseline": round(headline / REFERENCE_PCT_SOL, 3),
    }))


if __name__ == "__main__":
    main()
