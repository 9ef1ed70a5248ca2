"""RAFT-DPT depth+normal decoder (Flax, NHWC) for the Metric3D normal
estimator -- stage 2.

TPU-native re-design of the reference decoder ``RAFTDepthNormalDPT5``
(reference: mono/model/decode_heads/RAFTDepthNormalDPTDecoder5.py:736-999) with
the config of vit.raft5.large.py:8-15 (iters=8, n_downsample=2) over
dino_vit_large_reg.dpt_raft.py:1-18 (feature 256/512/1024/1024,
decoder 128/256/512/1024/1024, hidden 128x3, 3 GRU layers, slow_fast).

Structure mirrored from the reference:

* token->feature pyramid (Token2Feature/EncoderFeature, :607-698): DPT readout
  (patch proj + cls/register proj, gelu) then per-level resampling to
  1/14, 1/14, 1/7, 1/4 of the input;
* DPT fusion (DecoderFeature, :700-733) down to a 1/4-res feature map whose
  last two channels are depth/normal confidences (:924-926);
* init heads: soft-argmax depth over 256 log-spaced bins in [0.1, 200]
  (:794-836) and a normal MLP whose output is concatenated with the
  confidence channel and normalized with an elu kappa (:838-848, norm_normalize
  :237-244);
* 3-level ConvGRU refinement (BasicMultiUpdateBlock :362-410) on the 6-channel
  state (depth, conf, normal4) with slow-fast scheduling (:959-966), and
  convex-combination 4x upsampling of the state via a predicted 9-way mask
  (upsample_flow :858-872).

Iteration count note (TPU win): in eval mode the reference appends one output
per GRU iteration and the *consumer* (mono/utils/do_test.py:271-278) reads
``normal_out_list[0]`` -- the output of the FIRST iteration -- so running
``iters=1`` produces bit-identical consumed results at 1/8 the refinement
cost. ``iters`` stays a config knob with the reference default of 8.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["RaftDecoderConfig", "RaftDepthNormalDecoder", "norm_normalize"]


@dataclasses.dataclass(frozen=True)
class RaftDecoderConfig:
    vit_channels: int = 1024
    num_register_tokens: int = 4
    feature_channels: Tuple[int, ...] = (256, 512, 1024, 1024)  # 1/4, 1/7, 1/14, 1/14
    decoder_channels: Tuple[int, ...] = (128, 256, 512, 1024, 1024)
    hidden_dim: int = 128
    n_gru_layers: int = 3
    n_downsample: int = 2  # state lives at 1/2^n of the 616x1064 crop... (1/4)
    iters: int = 8
    slow_fast_gru: bool = True
    min_depth: float = 0.1
    max_depth: float = 200.0
    regress_scale: float = 100.0
    num_depth_anchors: int = 256
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def large() -> "RaftDecoderConfig":
        return RaftDecoderConfig()

    @staticmethod
    def tiny(vit_channels: int = 64) -> "RaftDecoderConfig":
        return RaftDecoderConfig(
            vit_channels=vit_channels,
            feature_channels=(16, 32, vit_channels, vit_channels),
            decoder_channels=(8, 16, 32, vit_channels, vit_channels),
            hidden_dim=16,
            num_depth_anchors=32,
            iters=2,
        )


# ---------------------------------------------------------------------------
# resize helpers (torch F.interpolate semantics)
# ---------------------------------------------------------------------------


def resize_bilinear_ac(x: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with align_corners=True on an NHWC tensor (the
    reference's ``interp``/``upflow4``/FuseBlock upsample all use
    align_corners=True -- RAFTDepthNormalDPTDecoder5.py:358-360,601-603)."""
    H, W = x.shape[1], x.shape[2]
    h, w = shape
    if (H, W) == (h, w):
        return x

    def axis_coords(n_in: int, n_out: int) -> jnp.ndarray:
        if n_out == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))

    ys, xs = axis_coords(H, h), axis_coords(W, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    c = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    top = a * (1 - wx) + b * wx
    bot = c * (1 - wx) + d * wx
    return top * (1 - wy) + bot * wy


def resize_nearest(x: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], shape[0], shape[1], x.shape[3]), method="nearest")


def pool2x(x: jnp.ndarray) -> jnp.ndarray:
    """avg_pool2d(3, stride 2, pad 1) with count_include_pad=True (:352-353)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    return s / 9.0


def norm_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize (nx,ny,nz) and squash kappa = elu(k)+1.01 on the last axis
    (reference norm_normalize, RAFTDepthNormalDPTDecoder5.py:237-244)."""
    n, kappa = x[..., :3], x[..., 3:4]
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True)) + 1e-10
    kappa = jax.nn.elu(kappa) + 1.0 + 0.01
    return jnp.concatenate([n / norm, kappa], axis=-1)


# ---------------------------------------------------------------------------
# DPT token -> feature pyramid
# ---------------------------------------------------------------------------


class Readout(nn.Module):
    """DPT readout: patch tokens projected, cls+register tokens projected and
    broadcast-added, gelu (:607-628)."""

    cfg: RaftDecoderConfig

    @nn.compact
    def __call__(self, patch: jnp.ndarray, learn: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        p = nn.Dense(c.vit_channels, dtype=c.dtype, name="project_patch")(patch)
        l = nn.Dense(c.vit_channels, use_bias=False, dtype=c.dtype, name="project_learn")(learn)
        return nn.gelu(p + l[:, None, None, :], approximate=False)


class Token2Feature(nn.Module):
    """Readout + resample to one pyramid level (:630-679). ``scale`` follows
    the reference: 1 -> identity, int>1 -> transposed conv, float>1 ->
    nearest-resize then 1x1 conv."""

    cfg: RaftDecoderConfig
    out_channels: int
    scale: float

    @nn.compact
    def __call__(self, patch: jnp.ndarray, learn: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        x = Readout(c, name="readout")(patch, learn)
        if self.scale == 1:
            if self.out_channels != c.vit_channels:
                x = nn.Conv(self.out_channels, (1, 1), dtype=c.dtype, name="sample")(x)
            return x
        if float(self.scale).is_integer():
            s = int(self.scale)
            return nn.ConvTranspose(
                self.out_channels, (s, s), strides=(s, s), padding="VALID",
                dtype=c.dtype, name="sample",
            )(x)
        h = int(x.shape[1] * self.scale)
        w = int(x.shape[2] * self.scale)
        x = resize_nearest(x, (h, w))
        return nn.Conv(self.out_channels, (1, 1), dtype=c.dtype, name="sample")(x)


class ConvBlock(nn.Module):
    """DPT residual conv unit (:542-570)."""

    cfg: RaftDecoderConfig
    channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.channels, (3, 3), dtype=self.cfg.dtype, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), dtype=self.cfg.dtype, name="conv2")(y)
        return x + y


class FuseBlock(nn.Module):
    """DPT fusion: optional skip branch, trunk, optional align-corners
    upsample, 1x1 projection (:572-605)."""

    cfg: RaftDecoderConfig
    in_channels: int
    out_channels: int
    fuse: bool = True
    upsample: bool = True
    scale_factor: float = 2.0

    @nn.compact
    def __call__(self, x1, x2=None):
        if x2 is not None:
            x1 = x1 + ConvBlock(self.cfg, self.in_channels, name="way_branch")(x2)
        out = ConvBlock(self.cfg, self.in_channels, name="way_trunk")(x1)
        if self.upsample:
            h = int(out.shape[1] * self.scale_factor)
            w = int(out.shape[2] * self.scale_factor)
            out = resize_bilinear_ac(out, (h, w))
        return nn.Conv(self.out_channels, (1, 1), dtype=self.cfg.dtype, name="out_conv")(out)


class LayerNorm2d(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(name="ln")(x)


class ResidualBlock(nn.Module):
    """RAFT residual block with 'layer' norm, stride 1 (:422-481)."""

    cfg: RaftDecoderConfig
    planes: int

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        y = nn.Conv(self.planes, (3, 3), dtype=c.dtype, name="conv1")(x)
        y = nn.relu(nn.LayerNorm(dtype=c.dtype, name="norm1")(y))
        y = nn.Conv(self.planes, (3, 3), dtype=c.dtype, name="conv2")(y)
        y = nn.relu(nn.LayerNorm(dtype=c.dtype, name="norm2")(y))
        if x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), dtype=c.dtype, name="downsample")(x)
            x = nn.LayerNorm(dtype=c.dtype, name="norm3")(x)
        return nn.relu(x + y)


class ContextHead(nn.Module):
    """ResidualBlock + 3x3 conv, one per (hidden, context) output
    (ContextFeatureEncoder :484-540)."""

    cfg: RaftDecoderConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = ResidualBlock(c, c.hidden_dim, name="res")(x)
        return nn.Conv(c.hidden_dim, (3, 3), dtype=c.dtype, name="conv")(x)


class ConvGRU(nn.Module):
    """ConvGRU cell with precomputed context injections cz/cr/cq (:330-350)."""

    cfg: RaftDecoderConfig

    @nn.compact
    def __call__(self, h, cz, cr, cq, x):
        c = self.cfg
        d = c.hidden_dim
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(nn.Conv(d, (3, 3), dtype=c.dtype, name="convz")(hx) + cz)
        r = jax.nn.sigmoid(nn.Conv(d, (3, 3), dtype=c.dtype, name="convr")(hx) + cr)
        rhx = jnp.concatenate([r * h, x], axis=-1)
        q = jnp.tanh(nn.Conv(d, (3, 3), dtype=c.dtype, name="convq")(rhx) + cq)
        return (1 - z) * h + z * q


class FlowHead(nn.Module):
    """Depth (2ch) + normal (4ch) delta head (:314-327)."""

    cfg: RaftDecoderConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = c.hidden_dim  # hidden_dim = 2*128 // 2 in the reference
        d = nn.Conv(2, (3, 3), dtype=c.dtype, name="conv2d")(
            nn.relu(nn.Conv(h, (3, 3), dtype=c.dtype, name="conv1d")(x))
        )
        n = nn.Conv(4, (3, 3), dtype=c.dtype, name="conv2n")(
            nn.relu(nn.Conv(h, (3, 3), dtype=c.dtype, name="conv1n")(x))
        )
        return jnp.concatenate([d, n], axis=-1)


class UpdateBlock(nn.Module):
    """BasicMultiUpdateBlock (:362-410): three GRU levels + flow/mask heads."""

    cfg: RaftDecoderConfig

    @nn.compact
    def __call__(self, nets, inps, flow, iter08=True, iter16=True, iter32=True, update=True):
        c = self.cfg
        net0, net1, net2 = nets
        if iter32:
            net2 = ConvGRU(c, name="gru32")(net2, *inps[2], pool2x(net1))
        if iter16:
            x16 = jnp.concatenate(
                [
                    resize_bilinear_ac(pool2x(net0), net1.shape[1:3]),
                    resize_bilinear_ac(net2, net1.shape[1:3]),
                ],
                axis=-1,
            )
            net1 = ConvGRU(c, name="gru16")(net1, *inps[1], x16)
        if iter08:
            x08 = jnp.concatenate(
                [flow, resize_bilinear_ac(net1, net0.shape[1:3])], axis=-1
            )
            net0 = ConvGRU(c, name="gru08")(net0, *inps[0], x08)
        if not update:
            return (net0, net1, net2), None, None

        delta = FlowHead(c, name="flow_head")(net0)
        factor = 2 ** c.n_downsample
        m = nn.Conv(c.hidden_dim, (3, 3), dtype=c.dtype, name="mask0")(net0)
        m = nn.Conv(factor * factor * 9, (1, 1), dtype=c.dtype, name="mask2")(nn.relu(m))
        return (net0, net1, net2), 0.25 * m, delta


def upsample_flow(flow: jnp.ndarray, mask: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Convex-combination upsampling of the NHWC state by ``factor`` using a
    predicted per-pixel softmax over the 3x3 neighborhood (:858-872)."""
    B, H, W, D = flow.shape
    mask = mask.reshape(B, H, W, 9, factor, factor)
    mask = jax.nn.softmax(mask, axis=3)
    # 3x3 patches of flow: (B, H, W, 9*D) with patch index ordered (dy, dx).
    patches = jax.lax.conv_general_dilated_patches(
        flow, (3, 3), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # conv_general_dilated_patches returns channels ordered (C, 3, 3).
    patches = patches.reshape(B, H, W, D, 9)
    up = jnp.einsum("bhwkuv,bhwdk->bhwuvd", mask, patches)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * factor, W * factor, D)
    return up


class RaftDepthNormalDecoder(nn.Module):
    """Full decoder: tokens -> per-iteration (depth, conf, normal, kappa) at
    input resolution. Returns dict with ``normal_out_list`` stacked on a
    leading axis (list index == GRU iteration, reference :951-997)."""

    cfg: RaftDecoderConfig

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, grid: Tuple[int, int]):
        c = self.cfg
        B, N, D = tokens.shape
        gh, gw = grid
        R = c.num_register_tokens
        patch = tokens[:, 1 + R :, :].reshape(B, gh, gw, D)
        learn = tokens[:, : 1 + R, :].reshape(B, (1 + R) * D)

        # --- token2feature pyramid (EncoderFeature :681-698) ---
        f3 = Token2Feature(c, c.feature_channels[3], 1.0, name="read_3")(patch, learn)
        f2 = Token2Feature(c, c.feature_channels[2], 1.0, name="read_2")(patch, learn)
        f1 = Token2Feature(c, c.feature_channels[1], 2.0, name="read_1")(patch, learn)
        f0 = Token2Feature(c, c.feature_channels[0], 3.5, name="read_0")(patch, learn)

        # --- DPT fusion to 1/4 (DecoderFeature :700-733) ---
        dch = c.decoder_channels
        x = FuseBlock(c, dch[4], dch[3], fuse=False, upsample=False, name="upconv_3")(f3)
        x = FuseBlock(c, dch[3], dch[2], name="upconv_2")(x, f2)
        x = FuseBlock(c, dch[2], dch[1] + 2, scale_factor=7 / 4, name="upconv_1")(x, f1)

        feature_map = x[..., :-2]
        depth_conf = x[..., -2:-1]
        normal_conf = x[..., -1:]

        # --- init depth: soft-argmax over log bins (:794-836) ---
        prob = nn.Conv(c.num_depth_anchors, (3, 3), dtype=c.dtype, name="depth_reg0")(feature_map)
        prob = nn.Conv(c.num_depth_anchors, (1, 1), dtype=c.dtype, name="depth_reg1")(nn.relu(prob))
        prob = jax.nn.softmax(prob, axis=-1)
        bins = jnp.exp(
            jnp.linspace(math.log(c.min_depth), math.log(c.max_depth), c.num_depth_anchors)
        ).astype(prob.dtype)
        d = jnp.sum(prob * bins, axis=-1, keepdims=True)
        d = (self._clamp(d) - c.max_depth) / c.regress_scale

        # --- init normal MLP (:776-786, 838-848) ---
        nrm = nn.Conv(128 if c.vit_channels >= 256 else c.hidden_dim, (3, 3),
                      dtype=c.dtype, name="normal0")(feature_map)
        w = nrm.shape[-1]
        nrm = nn.Conv(w, (1, 1), dtype=c.dtype, name="normal1")(nn.relu(nrm))
        nrm = nn.Conv(w, (1, 1), dtype=c.dtype, name="normal2")(nn.relu(nrm))
        nrm = nn.Conv(3, (1, 1), dtype=c.dtype, name="normal3")(nn.relu(nrm))
        normal_pred = norm_normalize(jnp.concatenate([nrm, normal_conf], axis=-1))

        state = jnp.concatenate([d, depth_conf, normal_pred], axis=-1)  # 6ch @1/4

        # --- context features -> hidden init + per-level cz/cr/cq (:932-938) ---
        levels = [f0, f1, f2]
        nets: List[jnp.ndarray] = []
        inps = []
        for i, lv in enumerate(levels):
            h = ContextHead(c, name=f"ctx_hidden{i}")(lv)
            ctx = ContextHead(c, name=f"ctx_inp{i}")(lv)
            nets.append(jnp.tanh(h))
            zqr = nn.Conv(3 * c.hidden_dim, (3, 3), dtype=c.dtype, name=f"zqr{i}")(nn.relu(ctx))
            inps.append(tuple(jnp.split(zqr, 3, axis=-1)))

        update = UpdateBlock(c, name="update_block")
        factor = 2 ** c.n_downsample
        depth_list, conf_list, normal_list = [], [], []
        nets_t = tuple(nets)
        for _ in range(c.iters):
            flow = state
            if c.n_gru_layers == 3 and c.slow_fast_gru:
                nets_t, _, _ = update(nets_t, inps, flow, iter08=False, iter16=False,
                                      iter32=True, update=False)
            if c.n_gru_layers >= 2 and c.slow_fast_gru:
                nets_t, _, _ = update(nets_t, inps, flow, iter08=False, iter16=True,
                                      iter32=c.n_gru_layers == 3, update=False)
            nets_t, mask, delta = update(nets_t, inps, flow,
                                         iter32=c.n_gru_layers == 3,
                                         iter16=c.n_gru_layers >= 2)
            state = state + delta
            up = upsample_flow(state, mask, factor)
            depth_list.append(self._clamp(up[..., 0:1] * c.regress_scale + c.max_depth))
            conf_list.append(up[..., 1:2])
            normal_list.append(norm_normalize(up[..., 2:6]))

        return {
            "prediction": depth_list[-1],
            "confidence": conf_list[-1],
            "prediction_normal": normal_list[-1],
            "normal_out_list": jnp.stack(normal_list),
            "depth_out_list": jnp.stack(depth_list),
        }

    def _clamp(self, x):
        c = self.cfg
        y = nn.relu(x - c.min_depth) + c.min_depth
        return c.max_depth - nn.relu(c.max_depth - y)
