#!/usr/bin/env python
"""Environment check — the reference's check_unified_lift_env.sh equivalent
(which probes its four conda envs; this framework needs one)."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    import jax
    import flax
    import optax
    import numpy as np

    import segsplat_tpu

    print(f"segsplat_tpu {segsplat_tpu.__version__}")
    print(f"jax {jax.__version__} | flax {flax.__version__} | "
          f"optax {optax.__version__} | numpy {np.__version__}")
    print(f"backend: {jax.default_backend()} | devices: {jax.devices()}")
    import jax.numpy as jnp
    x = jnp.ones((256, 256))
    y = float((x @ x).sum())
    assert y == 256.0 ** 3, y
    print("device matmul: OK")
    try:
        import torch
        print(f"torch {torch.__version__} (cpu, .pt artifact IO only)")
    except ImportError:
        print("torch: absent (.pt artifacts unavailable; .npz path active)")
    print("ALL OK")


if __name__ == "__main__":
    main()
