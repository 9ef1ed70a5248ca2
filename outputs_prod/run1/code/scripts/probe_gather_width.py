"""Is TPU gather/scatter cost per-ROW or per-BYTE? Decides whether packing
8 trilinear corners (or 4^3 hash blocks) into one wide table row wins.
Also: scatter-add row-width scaling and u32-packed bf16 pairs."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from garmentdreamer_tpu.core.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = 1 << 20
K = 8


def _sync(x):
    return np.asarray(x)


def timed(name, fn, *args):
    _sync(fn(*args))
    t0 = time.perf_counter()
    _sync(fn(*args))
    dt = (time.perf_counter() - t0) / K
    print(json.dumps({"name": name, "ms": round(dt * 1e3, 2)}), flush=True)
    return dt


def gather_probe(width, T, dtype=jnp.float32, n=N):
    key = jax.random.key(0)
    table = jax.random.normal(key, (T, width), dtype)
    idxs = jax.random.randint(key, (K, n), 0, T, jnp.int32)

    @jax.jit
    def loop(table, idxs):
        def body(acc, idx):
            return acc + table[idx].sum(), None

        return jax.lax.scan(body, jnp.zeros((), dtype), idxs)[0]

    timed(f"gather_{n//1000}k_rows_w{width}_{dtype.__name__}_T{T}", loop, table, idxs)


def scatter_probe(width, T, n=N):
    key = jax.random.key(0)
    idxs = jax.random.randint(key, (K, n), 0, T, jnp.int32)
    cts = jax.random.normal(key, (K, n, width), jnp.float32)

    @jax.jit
    def loop(idxs, cts):
        def body(acc, args):
            idx, ct = args
            return acc + jnp.zeros((T, width)).at[idx].add(ct).sum(), None

        return jax.lax.scan(body, 0.0, (idxs, cts))[0]

    timed(f"scatter_add_{n//1000}k_rows_w{width}_T{T}", loop, idxs, cts)


def main():
    for width, T in ((2, 1 << 19), (8, 1 << 19), (16, 1 << 16), (64, 1 << 13),
                     (128, 1 << 12), (256, 1 << 11)):
        gather_probe(width, T)
    gather_probe(2, 1 << 19, jnp.bfloat16)
    gather_probe(1, 1 << 19, jnp.float32)  # u32-packed-pair equivalent
    # fewer rows, same bytes: is it rows or bytes?
    gather_probe(16, 1 << 16, n=N // 8)
    for width, T in ((2, 1 << 19), (16, 1 << 16), (128, 1 << 12)):
        scatter_probe(width, T)
    scatter_probe(2, 1 << 19, n=N // 8)


if __name__ == "__main__":
    main()
