"""Block-size tuner for the bwd kernels on the real chip."""
import time, sys
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from flash_attention_tpu import fwd, bwd
from flash_attention_tpu.ops.configs import BlockSizes

B,S,H,D = 4,8192,32,128
kq, kk, kv, kd = jax.random.split(jax.random.PRNGKey(0), 4)
q = jax.random.normal(kq, (B,S,H,D), jnp.bfloat16)
k = jax.random.normal(kk, (B,S,H,D), jnp.bfloat16)
v = jax.random.normal(kv, (B,S,H,D), jnp.bfloat16)
o, lse = jax.jit(lambda q,k,v: fwd(q,k,v))(q,k,v)
do = jax.random.normal(kd, (B,S,H,D), jnp.bfloat16)

def chain(n, causal, bs):
    def g(q,k,v,o,lse,do):
        dq = do
        for _ in range(n):
            dq, dk, dv = bwd(q,k,v,o,lse,dq,is_causal=causal,block_sizes=bs)
            # force dk/dv to be live: fold a tiny function of them into dq
            dq = dq + (jnp.sum(dk.astype(jnp.float32)) * 1e-30 +
                       jnp.sum(dv.astype(jnp.float32)) * 1e-30).astype(dq.dtype)
        return jnp.sum(dq.astype(jnp.float32))
    return jax.jit(g)

def t_read(f, args, reps=3):
    float(f(*args))
    t0=time.perf_counter()
    for _ in range(reps): float(f(*args))
    return (time.perf_counter()-t0)/reps

CONFIGS = [(512,512),(1024,1024),(512,1024),(1024,512),(256,256)]
if len(sys.argv) > 1:
    CONFIGS = [tuple(map(int, a.split(","))) for a in sys.argv[1:]]

args = (q,k,v,o,lse,do)
for bq, bkv in CONFIGS:
    bs = BlockSizes(block_q_dq=bq, block_kv_dq=bkv, block_q_dkv=bq, block_kv_dkv=bkv)
    for causal in (False, True):
        try:
            t1 = t_read(chain(1,causal,bs),args)
            t5 = t_read(chain(5,causal,bs),args)
            dt = (t5-t1)/4
            # bwd flops: dq kernel 3 matmuls + dkv kernel 4 matmuls (recompute) + di
            fl = 2*B*H*S*S*D*(3+4)*(0.5 if causal else 1)
            print(f"bq={bq:5d} bkv={bkv:5d} causal={int(causal)} {fl/dt/1e12:7.1f} TFLOP/s {100*fl/dt/197e12:5.1f}% SOL {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"bq={bq} bkv={bkv} causal={causal} FAILED: {str(e)[:160]}", flush=True)
