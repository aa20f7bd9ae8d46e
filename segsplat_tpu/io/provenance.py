"""Weights-provenance tainting for feature artifacts.

The reference's feature extractor (script/extract_lseg_features.py:43-62)
requires a real LSeg checkpoint; ours falls back to random-init weights so the
pipeline stays exercisable offline. Random-weight features flowing silently
through lift → query → render → eval would produce confidently wrong labels
with nothing downstream recording the taint, so every stage:

  * stamps ``weights_source`` into its artifacts (``_weights_provenance.json``
    next to directory-shaped outputs; a ``weights_source`` field inside
    .pt/.npz artifacts), and
  * REFUSES tainted input unless explicitly overridden
    (``--allow_random_weights`` on the CLIs), in which case the taint
    propagates to its own outputs.

``weights_source`` values: ``"checkpoint:<name>"`` (real weights),
``"random"`` (taint), or None/absent (pre-provenance artifacts — treated as
untainted for backward compatibility, since only OUR extractor can produce
random-weight features and it always stamps them).
"""

from __future__ import annotations

import json
import os
from typing import Optional

PROVENANCE_FILE = "_weights_provenance.json"
RANDOM = "random"


def write_provenance(dir_path: str, weights_source: str, **extra) -> str:
    """Write ``_weights_provenance.json`` into ``dir_path``. Returns the path."""
    os.makedirs(dir_path, exist_ok=True)
    path = os.path.join(dir_path, PROVENANCE_FILE)
    with open(path, "w") as f:
        json.dump({"weights_source": weights_source, **extra}, f, indent=1)
    return path


def read_weights_source(path: str) -> Optional[str]:
    """weights_source recorded for ``path`` (a directory, or a file whose
    directory carries the sidecar). None when no provenance exists."""
    d = path if os.path.isdir(path) else os.path.dirname(os.path.abspath(path))
    p = os.path.join(d, PROVENANCE_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f).get("weights_source")


def is_tainted(weights_source: Optional[str]) -> bool:
    return weights_source is not None and str(weights_source) == RANDOM


def require_untainted(weights_source: Optional[str], allow: bool,
                      what: str) -> None:
    """Raise unless ``weights_source`` is clean or the caller opted in."""
    if is_tainted(weights_source) and not allow:
        raise RuntimeError(
            f"{what} was produced with RANDOM weights (weights_source="
            f"{weights_source!r}): downstream labels would be confidently "
            f"wrong. Re-extract with a real checkpoint, or pass "
            f"--allow_random_weights / allow_random_weights=True to "
            f"propagate the taint explicitly.")
