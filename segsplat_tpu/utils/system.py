"""System helpers: output dirs, checkpoint discovery, deterministic run state.

Reference equivalents: utils/system_utils.py:19-45 (mkdir_p,
searchForMaxIteration) and utils/general_utils.py:112-133 (safe_state — stdout
timestamping + seeding; the reference also pins cuda:0, which has no TPU
counterpart: device selection is JAX's).
"""

from __future__ import annotations

import os
import random
import re
import sys
from datetime import datetime

import numpy as np


def mkdir_p(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def search_for_max_iteration(folder: str) -> int | None:
    """Largest N among ``iteration_<N>`` entries under ``folder`` (recursive),
    mirroring the reference's searchForMaxIteration
    (utils/system_utils.py:27-45). Only the iteration directory/file pattern
    counts — stray artifacts with digits in their names (e.g. a copied
    grid_3187vox.ply) must not resolve load_iteration=-1 to a nonexistent
    iteration."""
    best = None
    for root, dirs, files in os.walk(folder):
        for name in dirs + files:
            m = re.fullmatch(r"iteration_(\d+)(?:\.[A-Za-z0-9]+)?", name)
            if m:
                v = int(m.group(1))
                best = v if best is None else max(best, v)
    return best


class _TimestampedStdout:
    def __init__(self, wrapped, silent: bool):
        self._w = wrapped
        self._silent = silent

    def write(self, x):
        if self._silent:
            return
        if x.endswith("\n"):
            ts = datetime.now().strftime("%d/%m %H:%M:%S")
            self._w.write(x.replace("\n", f" [{ts}]\n"))
        else:
            self._w.write(x)

    def flush(self):
        self._w.flush()


def safe_state(silent: bool = False, seed: int = 0) -> None:
    """Deterministic run state: seeds python/numpy and timestamps stdout lines
    (reference utils/general_utils.py:112-133). JAX randomness is explicit-key,
    so no global device seed exists to set."""
    sys.stdout = _TimestampedStdout(sys.stdout, silent)
    random.seed(seed)
    np.random.seed(seed)
