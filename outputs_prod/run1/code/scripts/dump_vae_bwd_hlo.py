"""Compile the REAL encoder image-gradient (as the SDS step uses it) and
print every convolution / big-copy op in the optimized HLO with shapes, to
find where the 222 ms backward goes."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from garmentdreamer_tpu.guidance.vae import AutoencoderKL, VAEConfig


def main():
    cfg = VAEConfig(dtype=jnp.bfloat16)
    model = AutoencoderKL(cfg)
    enc = lambda p, x, r: model.apply(p, x, r, method=AutoencoderKL.sample_latents)

    B = 4
    x = jnp.zeros((B, 512, 512, 3), jnp.float32)
    rng = jax.random.key(0)
    params = jax.eval_shape(lambda: model.init(jax.random.key(0), x[:1], rng))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)

    def loss(img):
        lat = enc(params, img, rng)
        return jnp.sum(lat.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))
    txt = g.lower(x).compile().as_text()

    n_bytes = {}
    for line in txt.splitlines():
        line = line.strip()
        m = re.search(r"= (\S+?)\[?[\d,]*\]? ?(convolution|dot)\(", line)
        if "convolution(" in line or " dot(" in line:
            # pull result shape and operand shapes
            shapes = re.findall(r"(bf16|f32|f16)\[([\d,]+)\]", line)
            kind = "conv" if "convolution(" in line else "dot"
            dims = re.search(r"(window=\{[^}]*\}|dim_labels=\S+)", line)
            dl = re.search(r"dim_labels=(\S+?)[, ]", line)
            print(kind, shapes[:3], dl.group(1) if dl else "", line[:60])
        for dt, sh in re.findall(r"(bf16|f32)\[([\d,]+)\]", line):
            if "copy(" in line or "transpose(" in line:
                sz = 1
                for d in sh.split(","):
                    sz *= int(d)
                sz *= 2 if dt == "bf16" else 4
                if sz > 50_000_000:
                    key = f"{line.split('=')[1].strip()[:40]}"
                    n_bytes[key] = sz
                break
    print("\nBIG copies/transposes (>50MB):")
    for k, v in sorted(n_bytes.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {v/1e6:7.1f} MB  {k}")

    # fusion count + total size stats
    n_fus = txt.count(" fusion(")
    print(f"\nfusions: {n_fus}, convolutions: {txt.count('convolution(')}, "
          f"dots: {txt.count(' dot(')}")


if __name__ == "__main__":
    main()
