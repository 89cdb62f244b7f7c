"""Does index coherence change XLA row-gather speed on the TPU?

BENCH.md's roofline measured ~4.2-6.6 ns/row for RANDOM indices, flat in
table size — this probes whether sorted / spatially-local / duplicate-heavy
index streams gather faster (HBM burst + VMEM reuse), which would make a
periodic coherence sort of the lane pool a throughput lever.

Run alone (single-owner tunnel): python tools/probe_gather_coherence.py

NOTE: the printed ns/row INCLUDE the ~26 ms host-pull RPC per iteration
(~26 ns/row at 1M rows) — subtract it for device cost.  Measured on v5e
(see BENCH.md "gather coherence probe"): random ~68 ns/row net, sorted /
block-local ~4 ns/row — the launch's raster spawn order keeps its real
fetch streams at the coherent floor.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

from cuda_volpath_tpu.runtime import configure_jax

configure_jax()

import jax
import jax.numpy as jnp
import numpy as np


def bench(table, idx, iters=30):
    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(axis=0))
    r = take(table, idx)
    float(r.sum())
    t0 = time.time()
    for _ in range(iters):
        r = take(table, idx + (r[:1] * 0).astype(jnp.int32))  # vary input
        float(r.sum())
    dt = (time.time() - t0) / iters
    return dt / idx.shape[0] * 1e9  # ns per row


def main():
    v = 1 << 22          # 4M rows of 4 channels u8 = 16 MB table
    n = 1 << 20          # 1M gathers
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 255, (v, 4), dtype=np.uint8))

    rand = jnp.asarray(rng.integers(0, v, n, dtype=np.int32))
    srt = jnp.sort(rand)
    # spatially local: blocks of 128 consecutive lanes hit a 512-row window
    base = rng.integers(0, v - 512, n // 128, dtype=np.int32)
    local = jnp.asarray((np.repeat(base, 128)
                         + rng.integers(0, 512, n, dtype=np.int32))
                        .astype(np.int32))
    same = jnp.asarray(np.full(n, v // 2, np.int32))

    for name, idx in [("random", rand), ("sorted", srt),
                      ("local512", local), ("broadcast", same)]:
        ns = bench(table, idx)
        print(f"{name:10s} {ns:6.2f} ns/row", flush=True)


if __name__ == "__main__":
    main()
