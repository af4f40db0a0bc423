"""ViT patch-feature backbone (DINOv3-style) in flax.

TPU-native re-design of the reference's timm-wrapped frozen DINOv3
(`semantic-slam/models/dino_backbone.py:15-108`): a ViT-S/16 with a CLS
token plus 4 register ("storage") tokens, returning a grid of patch
features with the reference's post-hoc BatchNorm outlier suppression
(`dino_backbone.py:53-56`, per the DINOv3 paper's A.2 recipe).

Differences by design:
- pure flax module; weights come from an orbax checkpoint or from a
  converted timm state dict (`convert_timm_state_dict`) — this container
  has no network egress, so pretrained weights are a deployment input,
  not a download;
- bfloat16 activations on the matmul path (MXU-native), f32 layernorms;
- patch <-> pixel coordinate converters are free functions usable inside
  jitted pipelines.

Reference call parity: `forward` == DinoBackbone.forward,
`extract_at_keypoints` == ops.sampling.bilinear_sample (bit-tested
against grid_sample), converters == `dino_backbone.py:154-178`.
"""

from __future__ import annotations

from dataclasses import field
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class MlpBlock(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(head_dim)
        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x + Attention(self.dim, self.num_heads, self.dtype, name="attn")(y)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        x = x + MlpBlock(self.dim, int(self.dim * self.mlp_ratio), self.dtype,
                         name="mlp")(y)
        return x


class ViTBackbone(nn.Module):
    """ViT with CLS + register tokens, emitting a patch-feature grid.

    Defaults are ViT-S/16 at 448 px = the reference configuration
    (`dino_backbone.py:25-40`: 28x28 grid, 384 dims, 4 storage tokens).
    """

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 16
    num_registers: int = 4
    mlp_ratio: float = 4.0
    # Canonical positional-embedding grid. The param is stored at this
    # fixed (pos_grid, pos_grid) resolution and bilinearly resized to the
    # input's patch grid at apply time (timm's interpolation recipe), so
    # one checkpoint serves any input resolution — train at 448^2, run
    # SLAM on 640x480. 28 = 448/16, the DINOv3 grid, which also makes
    # `convert_timm_state_dict` a direct copy.
    pos_grid: int = 28
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """images: (B, H, W, 3) normalized RGB -> (B, H/16, W/16, C) f32
        patch features, batch-normed (outlier suppression)."""
        B, H, W, _ = images.shape
        gh, gw = H // self.patch_size, W // self.patch_size

        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )(images)
        x = x.reshape(B, gh * gw, self.embed_dim)

        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim)
        )
        reg = self.param(
            "register_tokens",
            nn.initializers.normal(0.02),
            (1, self.num_registers, self.embed_dim),
        )
        pg = self.pos_grid
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, pg * pg, self.embed_dim),
        )
        if (gh, gw) != (pg, pg):
            pos = jax.image.resize(
                pos.reshape(1, pg, pg, self.embed_dim),
                (1, gh, gw, self.embed_dim),
                method="bilinear",
            ).reshape(1, gh * gw, self.embed_dim)
        x = x + pos
        tokens = jnp.concatenate(
            [
                jnp.tile(cls, (B, 1, 1)),
                jnp.tile(reg, (B, 1, 1)),
                x,
            ],
            axis=1,
        ).astype(self.dtype)

        for i in range(self.depth):
            tokens = Block(
                self.embed_dim, self.num_heads, self.mlp_ratio, self.dtype,
                name=f"block{i}",
            )(tokens)
        tokens = nn.LayerNorm(dtype=jnp.float32, name="norm")(tokens)

        # Drop CLS + registers: the reference's token stripping
        # (`dino_backbone.py:91`).
        patches = tokens[:, 1 + self.num_registers :, :].astype(jnp.float32)

        # BatchNorm over the flattened token axis — the reference's
        # feature_norm (`dino_backbone.py:97-101`).
        flat = patches.reshape(B * gh * gw, self.embed_dim)
        flat = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            dtype=jnp.float32,
            name="feature_norm",
        )(flat)
        return flat.reshape(B, gh, gw, self.embed_dim)


def patch_to_pixel(patch_coords: jnp.ndarray, patch_size: int = 16) -> jnp.ndarray:
    """Patch-grid coords -> pixel coords at patch centers
    (`dino_backbone.py:154-165`: pixel = patch * 16 + 8)."""
    return patch_coords * patch_size + patch_size / 2


def pixel_to_patch(pixel_coords: jnp.ndarray, patch_size: int = 16) -> jnp.ndarray:
    """Inverse of :func:`patch_to_pixel` (`dino_backbone.py:167-178`)."""
    return (pixel_coords - patch_size / 2) / patch_size


def convert_timm_state_dict(
    state_dict: dict, depth: int = 12, pos_grid: int = 28
) -> dict:
    """Map a timm DINOv3 ViT state dict (numpy arrays) onto this module's
    parameter tree, for deployments that ship pretrained weights.

    Expects timm names: patch_embed.proj.{weight,bias}, cls_token,
    reg_token, pos_embed, blocks.N.{norm1,attn.qkv,attn.proj,norm2,
    mlp.fc1,mlp.fc2}.{weight,bias}, norm.{weight,bias}. The last
    pos_grid^2 rows of pos_embed are taken (prefix-token embeddings, when
    present, are dropped — the reference strips prefix tokens the same
    way, `dino_backbone.py:91`). ``feature_norm`` (the post-hoc BatchNorm,
    `dino_backbone.py:56`) is initialized fresh — identity, like the
    reference's newly-constructed BatchNorm1d.

    Layout conventions (conv (out,in,kh,kw), linear (out,in), fused qkv
    [q;k;v] rows, head-major reshape) are pinned by
    tests/test_timm_convert.py against a torch mirror forward.
    """

    def t(w):  # torch linear (out, in) -> flax (in, out)
        return np.asarray(w).T

    embed_dim = int(np.asarray(state_dict["cls_token"]).shape[-1])
    params = {
        "feature_norm": {
            "scale": np.ones((embed_dim,), np.float32),
            "bias": np.zeros((embed_dim,), np.float32),
        },
        "patch_embed": {
            # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
            "kernel": np.transpose(
                np.asarray(state_dict["patch_embed.proj.weight"]), (2, 3, 1, 0)
            ),
            "bias": np.asarray(state_dict["patch_embed.proj.bias"]),
        },
        "cls_token": np.asarray(state_dict["cls_token"]),
        "register_tokens": np.asarray(
            state_dict.get("reg_token", state_dict.get("register_tokens"))
        ),
        "pos_embed": np.asarray(state_dict["pos_embed"])[:, -pos_grid * pos_grid :],
        "norm": {
            "scale": np.asarray(state_dict["norm.weight"]),
            "bias": np.asarray(state_dict["norm.bias"]),
        },
    }
    for i in range(depth):
        p = f"blocks.{i}."
        params[f"block{i}"] = {
            "norm1": {
                "scale": np.asarray(state_dict[p + "norm1.weight"]),
                "bias": np.asarray(state_dict[p + "norm1.bias"]),
            },
            "attn": {
                "qkv": {
                    "kernel": t(state_dict[p + "attn.qkv.weight"]),
                    "bias": np.asarray(state_dict[p + "attn.qkv.bias"]),
                },
                "proj": {
                    "kernel": t(state_dict[p + "attn.proj.weight"]),
                    "bias": np.asarray(state_dict[p + "attn.proj.bias"]),
                },
            },
            "norm2": {
                "scale": np.asarray(state_dict[p + "norm2.weight"]),
                "bias": np.asarray(state_dict[p + "norm2.bias"]),
            },
            "mlp": {
                "fc1": {
                    "kernel": t(state_dict[p + "mlp.fc1.weight"]),
                    "bias": np.asarray(state_dict[p + "mlp.fc1.bias"]),
                },
                "fc2": {
                    "kernel": t(state_dict[p + "mlp.fc2.weight"]),
                    "bias": np.asarray(state_dict[p + "mlp.fc2.bias"]),
                },
            },
        }
    return params
