import time, numpy as np, jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from functools import partial

C, W = 12, 38400
sig = jnp.asarray(np.random.randint(-20,20,size=(80_000_000,)).astype(np.int8))

@partial(jax.jit, static_argnums=(1,))
def direct(ptrs0, N):
    def body(ptrs, _):
        wins = jax.vmap(lambda p: jax.lax.dynamic_slice(sig, (p,), (W,)))(ptrs)
        s = wins.astype(jnp.float32).sum()
        return ptrs + 38192 + (s.astype(jnp.int64) % 3), s
    return jax.lax.scan(body, ptrs0, None, length=N)[1].sum()

@partial(jax.jit, static_argnums=(1,))
def two_stage(ptrs0, N):
    def body(ptrs, _):
        base = jnp.min(ptrs)
        buf = jax.lax.dynamic_slice(sig, (base,), (2*W,))
        wins = jax.vmap(lambda p: jax.lax.dynamic_slice(buf, (p,), (W,)))(ptrs - base)
        s = wins.astype(jnp.float32).sum()
        return ptrs + 38192 + (s.astype(jnp.int64) % 3), s
    return jax.lax.scan(body, ptrs0, None, length=N)[1].sum()

p0 = jnp.arange(C, dtype=jnp.int64) * 3000
for name, f in (("direct", direct), ("two_stage", two_stage)):
    ts = {}
    for N in (50, 500):
        out = f(p0, N); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for r in range(2):
            out = f(p0 + r, N); jax.block_until_ready(out)
        ts[N] = (time.perf_counter()-t0)/2
    print(f"{name}: marginal {((ts[500]-ts[50])/450)*1e6:.1f} us/step", flush=True)
