"""Block-size tuner for the fwd kernel on the real chip (seq 8192 README config)."""
import time, sys
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from flash_attention_tpu import fwd
from flash_attention_tpu.ops.configs import BlockSizes

B,S,H,D = 4,8192,32,128
kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(kq, (B,S,H,D), jnp.bfloat16)
k = jax.random.normal(kk, (B,S,H,D), jnp.bfloat16)
v = jax.random.normal(kv, (B,S,H,D), jnp.bfloat16)

def chain(n, causal, bs):
    def g(q,k,v):
        o = q
        for _ in range(n):
            o = fwd(o,k,v,is_causal=causal,block_sizes=bs)[0]
        return jnp.sum(o.astype(jnp.float32))
    return jax.jit(g)

def t_read(f, args, reps=3):
    float(f(*args))
    t0=time.perf_counter()
    for _ in range(reps): float(f(*args))
    return (time.perf_counter()-t0)/reps

CONFIGS = [(1024,1024),(1024,2048),(2048,1024),(2048,2048),(1024,4096),(4096,1024),(512,4096),(2048,4096)]
if len(sys.argv) > 1:
    CONFIGS = [tuple(map(int, a.split(","))) for a in sys.argv[1:]]

for bq, bkv in CONFIGS:
    bs = BlockSizes(block_q=bq, block_kv=bkv)
    for causal in (False, True):
        try:
            t1 = t_read(chain(1,causal,bs),(q,k,v))
            t5 = t_read(chain(5,causal,bs),(q,k,v))
            dt = (t5-t1)/4
            fl = 4*B*H*S*S*D*(0.5 if causal else 1)
            print(f"bq={bq:5d} bkv={bkv:5d} causal={int(causal)} {fl/dt/1e12:7.1f} TFLOP/s {100*fl/dt/197e12:5.1f}% SOL {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"bq={bq} bkv={bkv} causal={causal} FAILED: {str(e)[:200]}", flush=True)
