"""On-chip cost attribution for the NeTF texture field at production query
counts (1024^2 fit renders): full field fwd / fwd+bwd, isolated gather,
sorted-indices gather, scatter-add vs sort+segment_sum backward.

Each probe repeats its op K times inside ONE jit (scan over stacked inputs)
so the ~5-8 ms tunnel dispatch overhead amortizes (memory: isolated op
micro-probes inflate)."""

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
T = 1 << 19
K = 8


def _sync(x):
    return np.asarray(x)


def timed(name, fn, *args, extra=None):
    _sync(fn(*args))
    t0 = time.perf_counter()
    _sync(fn(*args))
    dt = (time.perf_counter() - t0) / K
    rec = {"name": name, "ms": round(dt * 1e3, 2)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return dt


def main():
    key = jax.random.key(0)
    table = jax.random.normal(key, (T, 2), jnp.float32)
    idxs = jax.random.randint(key, (K, N), 0, T, jnp.int32)
    idxs_sorted = jnp.sort(idxs, axis=1)
    cts = jax.random.normal(key, (K, N, 2), jnp.float32)

    @jax.jit
    def gather_loop(table, idxs):
        def body(acc, idx):
            return acc + table[idx].sum(), None

        return jax.lax.scan(body, 0.0, idxs)[0]

    timed("gather_1M_rows", gather_loop, table, idxs)
    timed("gather_1M_rows_presorted_vals", gather_loop, table, idxs_sorted)

    from jax import lax

    def g_sorted(tab, idx):
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        return lax.gather(tab, idx[:, None], dn, (1, 2),
                          indices_are_sorted=True, mode="clip")

    @jax.jit
    def gather_sorted_flag(table, idxs):
        def body(acc, idx):
            return acc + g_sorted(table, idx).sum(), None

        return jax.lax.scan(body, 0.0, idxs)[0]

    timed("gather_1M_rows_sorted_flag", gather_sorted_flag, table, idxs_sorted)

    @jax.jit
    def scatter_add_loop(idxs, cts):
        def body(acc, args):
            idx, ct = args
            return acc + jnp.zeros((T, 2)).at[idx].add(ct).sum(), None

        return jax.lax.scan(body, 0.0, (idxs, cts))[0]

    timed("scatter_add_1M_rows", scatter_add_loop, idxs, cts)

    @jax.jit
    def sort_segsum_loop(idxs, cts):
        def body(acc, args):
            idx, ct = args
            order_key, c0, c1 = jax.lax.sort(
                (idx, ct[:, 0], ct[:, 1]), num_keys=1)
            out = jax.ops.segment_sum(
                jnp.stack([c0, c1], -1), order_key, num_segments=T,
                indices_are_sorted=True)
            return acc + out.sum(), None

        return jax.lax.scan(body, 0.0, (idxs, cts))[0]

    timed("sort_segsum_1M_rows", sort_segsum_loop, idxs, cts)

    # full field at production query count
    from garmentdreamer_tpu.texture.encoders import HashGridEncoder, MLP
    import flax.linen as nn

    class Field(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = HashGridEncoder(name="encoder")(x)
            return MLP(3, 64, 3, name="mlp")(h)

    field = Field()
    pts = jax.random.uniform(key, (N, 3), jnp.float32, -1.0, 1.0)
    params = field.init(key, pts[:128])

    @jax.jit
    def fwd(p, x):
        def body(acc, _):
            return acc + field.apply(p, x).sum(), None

        return jax.lax.scan(body, 0.0, jnp.arange(2))[0]

    t = timed("field_fwd_1M_x2", fwd, params, pts)
    print(json.dumps({"name": "field_fwd_1M_ms", "ms": round(t / 2 * K * 1e3, 2)}),
          flush=True)

    @jax.jit
    def fwdbwd(p, x):
        g = jax.grad(lambda pp: field.apply(pp, x).sum())(p)
        return jax.tree_util.tree_reduce(lambda a, b: a + b.sum(), g, 0.0)

    _sync(fwdbwd(params, pts))
    t0 = time.perf_counter()
    _sync(fwdbwd(params, pts))
    print(json.dumps({"name": "field_fwdbwd_1M_ms",
                      "ms": round((time.perf_counter() - t0) * 1e3, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
