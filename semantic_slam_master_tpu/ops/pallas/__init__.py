"""Pallas TPU kernels for the hot ops.

Each kernel has a pure-XLA reference implementation in ``ops/``; the
Pallas variants exist where XLA's lowering leaves large factors on the
table (elementwise-gather scalarization, unfused stencil chains). Use
``is_tpu()`` to gate dispatch; every kernel also runs under
``interpret=True`` on CPU for correctness tests.
"""

from __future__ import annotations

import jax


def is_tpu() -> bool:
    return jax.default_backend() == "tpu"


from . import patches  # noqa: E402

__all__ = ["is_tpu", "patches"]
