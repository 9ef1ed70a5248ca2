"""Decide the hash-grid table-gradient design at production row counts
(262k visible pixels x 16 levels x 8 corners = 33.5M rows; also the 1M-pixel
full-res count 134M is probed at 1/4 scale). Variants:

A. native narrow scatter-add (what jax autodiff emits for a merged gather)
B. wide-row grouping: 64 slots/row via on-the-fly one-hot lane placement,
   chunked with lax.map to bound the (chunk, 128) temp
C. sort + segment_sum(indices_are_sorted) -- segsum cost isolated
"""

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

T_ALL = (1 << 19) * 16  # 16-level flat table
K = 4


def _sync(x):
    return np.asarray(x)


def timed(name, fn, *args):
    _sync(fn(*args))
    t0 = time.perf_counter()
    _sync(fn(*args))
    dt = (time.perf_counter() - t0) / K
    print(json.dumps({"name": name, "ms": round(dt * 1e3, 2)}), flush=True)
    return dt


def main():
    key = jax.random.key(0)
    for M in (1 << 24, 1 << 25):  # 16.8M / 33.5M rows
        idxs = jax.random.randint(key, (K, M), 0, T_ALL, jnp.int32)
        cts = jax.random.normal(key, (K, M, 2), jnp.float32)

        @jax.jit
        def native(idxs, cts):
            def body(acc, args):
                idx, ct = args
                return acc + jnp.zeros((T_ALL, 2)).at[idx].add(ct).sum(), None

            return jax.lax.scan(body, 0.0, (idxs, cts))[0]

        timed(f"A_native_narrow_{M>>20}M", native, idxs, cts)

        @jax.jit
        def wide_grouped(idxs, cts):
            def body(acc, args):
                idx, ct = args  # (M,), (M, 2)
                n_chunks = 8
                idx_c = idx.reshape(n_chunks, -1)
                ct_c = ct.reshape(n_chunks, -1, 2)

                def one(args2):
                    ic, cc = args2
                    row = ic >> 6
                    lane = ic & 63
                    oh = (lane[:, None] == jnp.arange(64)[None, :])
                    wide = (oh[:, :, None] * cc[:, None, :]).reshape(-1, 128)
                    return jnp.zeros((T_ALL // 64, 128)).at[row].add(wide)

                out = jax.lax.map(one, (idx_c, ct_c))
                return acc + out.sum(), None

            return jax.lax.scan(body, 0.0, (idxs, cts))[0]

        timed(f"B_wide64_chunked_{M>>20}M", wide_grouped, idxs, cts)

        idxs_s = jnp.sort(idxs, axis=1)

        @jax.jit
        def segsum_sorted(idxs, cts):
            def body(acc, args):
                idx, ct = args
                out = jax.ops.segment_sum(ct, idx, num_segments=T_ALL,
                                          indices_are_sorted=True)
                return acc + out.sum(), None

            return jax.lax.scan(body, 0.0, (idxs, cts))[0]

        timed(f"C_segsum_presorted_{M>>20}M", segsum_sorted, idxs_s, cts)


if __name__ == "__main__":
    main()
