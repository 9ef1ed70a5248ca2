"""Generate the Metric3D ``metric_depth_vit_large_800k`` checkpoint KEY
manifest (names + shapes) by instantiating the reference torch model --
the model code DEFINES the checkpoint layout, so its randomly-initialized
``state_dict()`` is the exact key/shape oracle, no download needed
(VERDICT r2 next-7).

Run from the repo root (writes tests/fixtures/metric3d_keys.txt):

    python tests/fixtures/gen_metric3d_manifest.py

The generated manifest is committed; tests/test_metric3d_manifest.py
consumes it without importing the reference.
"""

import os
import sys
from types import SimpleNamespace

REF = "/root/reference/Garment_3DGS/Normal_estimator_Metric3D"
OUT = os.path.join(os.path.dirname(__file__), "metric3d_keys.txt")


def _load_module(name, path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    import torch

    # load the two model files directly -- the mono package __init__ chain
    # pulls in mmcv, which is not installed here and not needed for this
    vit_mod = _load_module(
        "ref_vit_reg", os.path.join(REF, "mono/model/backbones/ViT_DINO_reg.py")
    )
    dec_mod = _load_module(
        "ref_raft_dec",
        os.path.join(REF, "mono/model/decode_heads/RAFTDepthNormalDPTDecoder5.py"),
    )
    vit_large_reg = vit_mod.vit_large_reg
    RAFTDepthNormalDPT5 = dec_mod.RAFTDepthNormalDPT5

    cfg = SimpleNamespace(
        model=SimpleNamespace(
            decode_head=SimpleNamespace(
                in_channels=[1024, 1024, 1024, 1024],
                feature_channels=[256, 512, 1024, 1024],
                decoder_channels=[128, 256, 512, 1024, 1024],
                use_cls_token=True,
                up_scale=7,
                num_register_tokens=4,
                hidden_channels=[128, 128, 128, 128],
                n_gru_layers=3,
                n_downsample=2,
                iters=8,
                slow_fast_gru=True,
                detach=False,
            )
        ),
        data_basic=SimpleNamespace(depth_range=(0, 1), depth_normalize=(0.1, 200)),
    )

    with torch.no_grad():
        enc = vit_large_reg(checkpoint=None)
        dec = RAFTDepthNormalDPT5(cfg)

    with open(OUT, "w") as f:
        for prefix, mod in (("encoder.", enc), ("decoder.", dec)):
            for k, v in mod.state_dict().items():
                f.write(f"{prefix}{k} {','.join(str(s) for s in v.shape)}\n")
    n = sum(1 for _ in open(OUT))
    print(f"wrote {OUT}: {n} keys")


if __name__ == "__main__":
    main()
