"""Descriptor refiner: 384-d backbone features -> 128-d L2-normalized
descriptors.

Architecture parity with the reference
(`models/descriptor_refiner.py:11-125`): input projection + ReLU,
(num_layers - 2) residual blocks of [LayerNorm -> Dense -> ReLU ->
LayerNorm -> Dense -> +identity -> ReLU], output projection, and L2
normalization ONLY at the very end (the R2D2 recipe the reference
follows, `:85-86`). Orthogonal init everywhere to prevent descriptor
collapse (`:47-56`).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def _orthogonal():
    return nn.initializers.orthogonal(scale=1.0)


class ResidualBlock(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.LayerNorm(name="norm1")(x)
        y = nn.relu(
            nn.Dense(self.dim, kernel_init=_orthogonal(), dtype=self.dtype,
                     name="fc1")(y)
        )
        y = nn.LayerNorm(name="norm2")(y)
        y = nn.Dense(self.dim, kernel_init=_orthogonal(), dtype=self.dtype,
                     name="fc2")(y)
        return nn.relu(y + identity)


class DescriptorRefiner(nn.Module):
    hidden_dim: int = 384
    output_dim: int = 128
    num_layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        """features: (..., C) backbone features at keypoints ->
        (..., output_dim) unit descriptors."""
        x = nn.relu(
            nn.Dense(
                self.hidden_dim, kernel_init=_orthogonal(), dtype=self.dtype,
                name="input_proj",
            )(features)
        )
        for i in range(self.num_layers - 2):
            x = ResidualBlock(self.hidden_dim, self.dtype, name=f"res{i}")(x)
        x = nn.Dense(
            self.output_dim, kernel_init=_orthogonal(), dtype=self.dtype,
            name="output_proj",
        )(x)
        # L2 normalize only at the end (R2D2; `descriptor_refiner.py:86`).
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8
        )
