import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from gps_optimize_slam_tpu.ops.pallas_scan import associative_scan_vmem
from gps_optimize_slam_tpu.ops import kalman_parallel as kp

print("platform:", jax.devices()[0].platform)

# 1. plain add scan, compiled (not interpret)
x = jnp.asarray(np.random.default_rng(0).normal(size=517).astype(np.float32))
got = jax.jit(lambda a: associative_scan_vmem(lambda u, v: u + v, a, 0.0))(x)
want = jax.lax.associative_scan(lambda u, v: u + v, x)
print("add max dev:", float(jnp.max(jnp.abs(got - want))))

# 2. vmapped quat chain through the product path (vmap over batch of 4)
rng = np.random.default_rng(1)
q = rng.normal(size=(4, 300, 4)).astype(np.float32)
q /= np.linalg.norm(q, axis=-1, keepdims=True)
dq = jnp.asarray(q[:, 1:])
init = jnp.asarray(q[:, 0])
f = jax.jit(jax.vmap(lambda i, d: kp.parallel_quat_chain(i, d)))
out = f(init, dq)
out.block_until_ready()
print("vmapped quat chain ok, shape", out.shape)

# parity vs lax path via explicit (non-default) scan_fn
lax_scan = lambda c, e, reverse=False: jax.lax.associative_scan(c, e, reverse=reverse)
g = jax.jit(jax.vmap(lambda i, d: kp.parallel_quat_chain(i, d, scan_fn=lax_scan)))
ref = g(init, dq)
print("quat dev:", float(jnp.max(jnp.abs(jnp.abs(jnp.sum(out*ref,-1))-1))))
