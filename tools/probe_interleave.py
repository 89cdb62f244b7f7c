"""Does XLA-TPU overlap two independent gather->compute chains?

The wavefront launch is a serial chain of pool-wide passes: each pass's
gather depends on the previous pass's state, so the gather DMA and the
VPU arithmetic of one pass cannot overlap ACROSS passes.  Splitting the
pool into two independent halves and interleaving their passes presents
XLA with two data-independent chains — if its latency-hiding scheduler
overlaps half A's arithmetic with half B's gather DMA, a split-pool
launch would hide up to min(gather, compute) per pass.

This probes exactly that with a launch-shaped workload (data-dependent
locally-coherent row gathers + elementwise arithmetic), same total work:
  seq:   12 passes over one (N,) chain
  split: 12 interleaved passes over two independent (N/2,) chains

Run alone (single-owner tunnel): python tools/probe_interleave.py
Printed times include one ~26 ms RPC pull per iteration.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from cuda_volpath_tpu.runtime import configure_jax

configure_jax()

import jax
import jax.numpy as jnp
import numpy as np

V = 1 << 22          # 4M rows x 4 u8 = 16 MB table
PASSES = 12


def _pass(table, x):
    # locally-coherent data-dependent fetch position (like the launch:
    # neighboring lanes hit neighboring rows), then VPU work
    idx = (x * jnp.float32(V)).astype(jnp.int32) % V
    rows = jnp.take(table, idx, axis=0).astype(jnp.float32)
    y = rows.sum(axis=-1)
    # a few transcendentals standing in for the masked post-body
    z = jnp.exp(-y * 1e-3) + jnp.log1p(x) * 0.5
    return (x + z * 1e-5) % 1.0


@jax.jit
def seq(table, x):
    for _ in range(PASSES):
        x = _pass(table, x)
    return x


@jax.jit
def split(table, a, b):
    for _ in range(PASSES):
        a = _pass(table, a)
        b = _pass(table, b)
    return a, b


def timeit(fn, *args, iters=30):
    out = fn(*args)
    leaves = jax.tree.leaves(out)
    float(leaves[0].sum())
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        leaves = jax.tree.leaves(out)
        float(leaves[0].sum())
    return (time.time() - t0) / iters


def main():
    n = 1 << 20
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 255, (V, 4), dtype=np.uint8))
    # near-raster start positions -> locally coherent gathers
    x = jnp.asarray(np.linspace(0, 1, n, dtype=np.float32)
                    + rng.random(n, dtype=np.float32) * 1e-4)
    a, b = x[: n // 2], x[n // 2:]

    t_seq = timeit(seq, table, x)
    t_split = timeit(split, table, a, b)
    ns_seq = t_seq / (n * PASSES) * 1e9
    ns_split = t_split / (n * PASSES) * 1e9
    print(f"seq   (1x{n}):      {t_seq * 1e3:7.1f} ms  "
          f"{ns_seq:5.2f} ns/lane-pass", flush=True)
    print(f"split (2x{n // 2}):  {t_split * 1e3:7.1f} ms  "
          f"{ns_split:5.2f} ns/lane-pass", flush=True)
    print(f"overlap gain: {(t_seq - t_split) / t_seq * 100:+.1f}%",
          flush=True)


if __name__ == "__main__":
    main()
