"""Converter parity: `convert_timm_state_dict` vs a torch mirror forward.

No network egress in this container, so the real timm DINOv3 weights
cannot be downloaded; what CAN go wrong mechanically in the converter —
every transpose / axis-order / key mapping — is verified here by
building a timm-layout state dict in torch (same key names and tensor
layouts timm's ViT uses: conv (out,in,kh,kw), linear (out,in), fused
qkv [q;k;v] rows, head-major reshape), running a torch forward that
mirrors the module architecture (`models/backbone.py` — pre-norm
blocks, CLS + 4 registers, pos on patch tokens, final LayerNorm), and
asserting the converted flax forward matches numerically in f32.
Reference contract: `semantic-slam/models/dino_backbone.py:44-108`.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from semantic_slam_master_tpu.models import backbone as backbone_mod  # noqa: E402

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)

DIM, DEPTH, HEADS, PATCH = 64, 2, 2, 16
GRID = 4  # pos_grid and input grid (64 px / 16)


def _timm_state_dict(rng):
    def t(*shape):
        return torch.tensor(rng.normal(0, 0.05, size=shape).astype(np.float32))

    sd = {
        "patch_embed.proj.weight": t(DIM, 3, PATCH, PATCH),
        "patch_embed.proj.bias": t(DIM),
        "cls_token": t(1, 1, DIM),
        "reg_token": t(1, 4, DIM),
        "pos_embed": t(1, GRID * GRID, DIM),
        "norm.weight": t(DIM),
        "norm.bias": t(DIM),
    }
    for i in range(DEPTH):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = t(DIM)
        sd[p + "norm1.bias"] = t(DIM)
        sd[p + "attn.qkv.weight"] = t(3 * DIM, DIM)
        sd[p + "attn.qkv.bias"] = t(3 * DIM)
        sd[p + "attn.proj.weight"] = t(DIM, DIM)
        sd[p + "attn.proj.bias"] = t(DIM)
        sd[p + "norm2.weight"] = t(DIM)
        sd[p + "norm2.bias"] = t(DIM)
        sd[p + "mlp.fc1.weight"] = t(4 * DIM, DIM)
        sd[p + "mlp.fc1.bias"] = t(4 * DIM)
        sd[p + "mlp.fc2.weight"] = t(DIM, 4 * DIM)
        sd[p + "mlp.fc2.bias"] = t(DIM)
    return sd


def _torch_forward(sd, images):
    """timm-convention ViT forward (pre-norm, fused qkv, head-major)."""
    import torch.nn.functional as F

    x = torch.tensor(np.transpose(images, (0, 3, 1, 2)))  # NCHW
    x = F.conv2d(
        x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"], stride=PATCH
    )
    B, C, gh, gw = x.shape
    x = x.flatten(2).transpose(1, 2)  # (B, N, C)
    x = x + sd["pos_embed"]
    cls = sd["cls_token"].expand(B, -1, -1)
    reg = sd["reg_token"].expand(B, -1, -1)
    x = torch.cat([cls, reg, x], dim=1)

    hd = DIM // HEADS
    for i in range(DEPTH):
        p = f"blocks.{i}."
        y = F.layer_norm(x, (DIM,), sd[p + "norm1.weight"], sd[p + "norm1.bias"])
        qkv = F.linear(y, sd[p + "attn.qkv.weight"], sd[p + "attn.qkv.bias"])
        N = qkv.shape[1]
        qkv = qkv.reshape(B, N, 3, HEADS, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, H, N, hd)
        attn = (q @ k.transpose(-2, -1)) / np.sqrt(hd)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, DIM)
        x = x + F.linear(out, sd[p + "attn.proj.weight"], sd[p + "attn.proj.bias"])
        y = F.layer_norm(x, (DIM,), sd[p + "norm2.weight"], sd[p + "norm2.bias"])
        y = F.linear(y, sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"])
        y = F.gelu(y)
        y = F.linear(y, sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"])
        x = x + y

    x = F.layer_norm(x, (DIM,), sd["norm.weight"], sd["norm.bias"])
    patches = x[:, 1 + 4 :, :]  # strip CLS + registers
    return patches.reshape(B, gh, gw, DIM).detach().numpy()


def test_converted_forward_matches_torch():
    rng = np.random.default_rng(0)
    sd = _timm_state_dict(rng)
    params = backbone_mod.convert_timm_state_dict(
        {k: v.numpy() for k, v in sd.items()}, depth=DEPTH, pos_grid=GRID
    )

    model = backbone_mod.ViTBackbone(
        embed_dim=DIM, depth=DEPTH, num_heads=HEADS, pos_grid=GRID,
        dtype=jnp.float32,
    )
    images = rng.normal(0, 1, size=(2, 64, 64, 3)).astype(np.float32)
    # init to get batch_stats for feature_norm, then swap in converted params
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(images))
    assert jax.tree.map(
        jnp.shape, variables["params"]
    ) == jax.tree.map(np.shape, params), "converted tree shape mismatch"

    # feature_norm (BatchNorm) is identity at init (scale 1, bias 0, mean 0,
    # var 1), so the eval-mode output equals the raw patch features.
    out = model.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        jnp.asarray(images),
    )
    ref = _torch_forward(sd, images)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_convert_rejects_missing_keys():
    with pytest.raises(KeyError):
        backbone_mod.convert_timm_state_dict({}, depth=1)
