"""Metric3D converter contract vs the generated checkpoint key manifest
(VERDICT r2 next-7).

tests/fixtures/metric3d_keys.txt is the state_dict of the REFERENCE torch
model (vit_large_reg + RAFTDepthNormalDPT5 instantiated by
tests/fixtures/gen_metric3d_manifest.py) -- the model code defines the
``metric_depth_vit_large_800k.pth`` layout, so this is the exact key/shape
oracle without the checkpoint. Asserts normal/convert.py consumes every key
(minus the documented inference-unused ones) and produces our
NormalEstimator tree leaf-for-leaf.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

MANIFEST = os.path.join(os.path.dirname(__file__), "fixtures", "metric3d_keys.txt")

# present in the checkpoint, unused at inference (DINOv2 MIM mask token)
IGNORED_KEYS = {"encoder.mask_token"}


def _ignored(k: str) -> bool:
    # ResidualBlock registers norm3 twice -- as an attribute AND inside the
    # downsample Sequential (RAFTDepthNormalDPTDecoder5.py:436,466-467), so
    # downsample.1.* are byte-identical aliases of the consumed norm3.*
    return k in IGNORED_KEYS or ".downsample.1." in k


def _load_manifest():
    out = {}
    with open(MANIFEST) as f:
        for line in f:
            name, shape = line.split()
            out[name] = tuple(int(s) for s in shape.split(","))
    return out


class RecordingDict(dict):
    def __init__(self, manifest):
        super().__init__({k: np.zeros(s, np.float32) for k, s in manifest.items()})
        self.touched = set()

    def __getitem__(self, k):
        self.touched.add(k)
        return super().__getitem__(k)


def _tree_paths_shapes(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(p.key if hasattr(p, "key") else str(p) for p in path)
        out[name] = tuple(leaf.shape)
    return out


@pytest.mark.slow
def test_metric3d_converter_consumes_manifest_and_matches_model():
    from garmentdreamer_tpu.normal.convert import convert_torch_state_dict
    from garmentdreamer_tpu.normal.model import NormalEstimator, NormalEstimatorConfig

    manifest = _load_manifest()
    assert len(manifest) > 500  # ViT-L (24 blocks) + RAFT decoder
    sd = RecordingDict(manifest)
    tree = convert_torch_state_dict(sd)

    untouched = {k for k in set(manifest) - sd.touched if not _ignored(k)}
    assert not untouched, (
        f"{len(untouched)} checkpoint keys never read, e.g. "
        f"{sorted(untouched)[:8]}"
    )

    cfg = NormalEstimatorConfig.large()
    model = NormalEstimator(cfg)
    ref = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 616, 1064, 3)))
    )
    got = _tree_paths_shapes({"params": tree})
    want = _tree_paths_shapes(ref)
    assert set(got) == set(want), (
        f"tree path mismatch: extra={sorted(set(got)-set(want))[:6]} "
        f"missing={sorted(set(want)-set(got))[:6]}"
    )
    # torch->flax transposes mean shapes differ only by permutation; compare
    # sorted dims + exact rank
    bad = {
        k: (got[k], want[k])
        for k in want
        if sorted(got[k]) != sorted(want[k]) or len(got[k]) != len(want[k])
    }
    assert not bad, f"shape mismatches: {dict(list(bad.items())[:6])}"
