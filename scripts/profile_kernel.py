"""Isolate the Pallas mixed-add kernel's pure throughput from the XLA
gather/transpose glue: feed a pre-materialized point rectangle and time the
kernel alone, then time the glue alone (gather+transpose, no kernel).

Usage: python scripts/profile_kernel.py [lanes] [depth] [iters]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zprize_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

from zprize_tpu.curve.spec import BLS12_377_G1
from zprize_tpu.msm.accum_kernel import make_mixed_add_rect, make_mixed_add_multi

curve = BLS12_377_G1
nl = curve.field.n_limbs

lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 24576
depth = int(sys.argv[2]) if len(sys.argv) > 2 else 32
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5

def sync(x):
    return jax.device_get(x[0].ravel()[0] if isinstance(x, tuple) else x.ravel()[0])

rng = np.random.default_rng(0)
rx = jnp.asarray(rng.integers(0, 1 << 15, (depth, nl, lanes), dtype=np.uint32))
ry = jnp.asarray(rng.integers(0, 1 << 15, (depth, nl, lanes), dtype=np.uint32))
inf = jnp.zeros((depth, 1, lanes), jnp.uint32)
ax = jnp.zeros((nl, lanes), jnp.uint32)
ay = jnp.asarray(np.ones((nl, lanes), np.uint32))
az = jnp.zeros((nl, lanes), jnp.uint32)

fn = make_mixed_add_rect(curve, lanes, 512 if lanes >= 512 else 128, depth)
out = fn(ax, ay, az, rx, ry, inf); sync(out)
t0 = time.time()
for _ in range(iters):
    out = fn(ax, ay, az, rx, ry, inf)
sync(out)
dt = (time.time() - t0) / iters
adds = depth * lanes
print(f"rect kernel: depth={depth} lanes={lanes}: {dt*1e3:.1f} ms "
      f"-> {adds/dt/1e6:.2f} M adds/s")

# glue alone: gather + transpose of the same volume
n = 1 << 18
px = jnp.asarray(rng.integers(0, 1 << 15, (n, nl), dtype=np.uint32))
py = jnp.asarray(rng.integers(0, 1 << 15, (n, nl), dtype=np.uint32))
idx = jnp.asarray(rng.integers(0, n, (depth, lanes), dtype=np.int32))

@jax.jit
def glue(px, py, idx):
    gx = jnp.take(px, idx.reshape(-1), axis=0)
    gy = jnp.take(py, idx.reshape(-1), axis=0)
    rx = gx.reshape(depth, lanes, nl).transpose(0, 2, 1)
    ry = gy.reshape(depth, lanes, nl).transpose(0, 2, 1)
    return rx, ry

r = glue(px, py, idx); sync(r[0])
t0 = time.time()
for _ in range(iters):
    r = glue(px, py, idx)
sync(r[0])
dt2 = (time.time() - t0) / iters
print(f"glue (gather+transpose): {dt2*1e3:.1f} ms "
      f"({2*depth*lanes*nl*4/1e6:.0f} MB gathered)")

# per-rank path kernel for comparison (multi, rank_batch=1): one rank per call
fn1 = make_mixed_add_multi(curve, lanes, 512 if lanes >= 512 else 128, 1)
args = (ax, ay, az, rx[0:1].reshape(1, nl, lanes), ry[0:1].reshape(1, nl, lanes), inf[0:1].reshape(1, 1, lanes))
try:
    out = fn1(*args); sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn1(*args)
    sync(out)
    dt3 = (time.time() - t0) / iters
    print(f"single-rank kernel dispatch: {dt3*1e3:.2f} ms/rank "
          f"-> x{depth} = {dt3*depth*1e3:.1f} ms for same work")
except Exception as e:
    print("multi kernel skipped:", str(e)[:100])
