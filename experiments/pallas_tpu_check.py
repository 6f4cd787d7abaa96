"""Quick real-TPU check of the batched streaming kernel vs the scan."""
import time
import numpy as np
import jax, jax.numpy as jnp
from cheetah_pose_estimation_tpu.ops import banded, pallas_banded as pb

rng = np.random.default_rng(0)

def make(B, N, d=54):
    diag = rng.normal(size=(B, N, d, d)).astype(np.float32)
    diag = np.einsum('bnij,bnkj->bnik', diag, diag) + 10*np.eye(d)[None,None]
    lower = 0.1*rng.normal(size=(B, 3, N, d, d)).astype(np.float32)
    rhs = rng.normal(size=(B, N, d)).astype(np.float32)
    return jnp.asarray(diag), jnp.asarray(lower), jnp.asarray(rhs)

for (B, N) in ((10, 64), (1, 256)):
    diag, lower, rhs = make(B, N)
    sol_p = jax.jit(jax.vmap(pb.solve))
    sol_s = jax.jit(jax.vmap(lambda d, l, r: banded.solve(
        banded.BlockBanded(d, l), r)))
    try:
        t0=time.time(); xp = sol_p(diag, lower, rhs); xp.block_until_ready()
        print(f"B{B}xN{N} pallas compile+run {time.time()-t0:.1f}s")
        xs = sol_s(diag, lower, rhs); xs.block_until_ready()
        err = float(jnp.max(jnp.abs(xp-xs))/jnp.max(jnp.abs(xs)))
        for name, f in (("pallas", sol_p), ("scan", sol_s)):
            f(diag, lower, rhs).block_until_ready()
            t0=time.time()
            for _ in range(20): x = f(diag, lower, rhs)
            x.block_until_ready()
            print(f"  {name}: {(time.time()-t0)/20*1e3:.2f} ms")
        print(f"  rel_err={err:.2e}")
    except Exception as e:
        print(f"B{B}xN{N} pallas FAILED: {repr(e)[:300]}")
