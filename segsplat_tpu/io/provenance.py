"""Weights-provenance tainting for feature artifacts.

The reference's feature extractor (script/extract_lseg_features.py:43-62)
requires a real LSeg checkpoint; ours falls back to random-init weights so the
pipeline stays exercisable offline. Random-weight features flowing silently
through lift → query → render → eval would produce confidently wrong labels
with nothing downstream recording the taint, so every stage:

  * stamps ``weights_source`` into a ``_weights_provenance.json`` sidecar
    next to its outputs (directory-granular: one sidecar covers every
    artifact in the directory), and
  * REFUSES tainted input unless explicitly overridden
    (``--allow_random_weights`` on the CLIs), in which case the taint
    propagates to its own outputs.

``weights_source`` values: ``"checkpoint:<name>"`` (real weights),
``"random"`` (taint), or None/absent (pre-provenance artifacts — treated as
untainted for backward compatibility, since only OUR extractor can produce
random-weight features and it always stamps them). Eval CLIs additionally
accept ``--require_provenance`` (strict mode) which rejects UNSTAMPED
artifacts too, closing the backward-compat backdoor for runs that must only
score provenance-stamped inputs.

Because the sidecar is directory-granular, ``write_provenance`` never
downgrades: writing a clean stamp into a directory already stamped
``random`` keeps the taint (the tainted co-located artifacts are still
there) and records the attempted clean source under ``shadowed_sources``.
"""

from __future__ import annotations

import json
import os
from typing import Optional

PROVENANCE_FILE = "_weights_provenance.json"
RANDOM = "random"


def write_provenance(dir_path: str, weights_source: str, **extra) -> str:
    """Write ``_weights_provenance.json`` into ``dir_path``. Returns the path.

    Never downgrades: if the directory is already stamped ``random`` and the
    new stamp is clean, the taint is kept (the sidecar is directory-granular
    — the tainted co-located artifacts still exist) and the clean source is
    recorded under ``shadowed_sources`` for forensics."""
    os.makedirs(dir_path, exist_ok=True)
    path = os.path.join(dir_path, PROVENANCE_FILE)
    record = {"weights_source": weights_source, **extra}
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
        if is_tainted(prior.get("weights_source")) and not is_tainted(
                weights_source):
            shadowed = prior.get("shadowed_sources", [])
            record = dict(prior)
            record["shadowed_sources"] = shadowed + [weights_source]
    with open(path, "w") as f:
        json.dump(record, f, indent=1)
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
                      what: str, strict: bool = False) -> None:
    """Raise unless ``weights_source`` is clean or the caller opted in.

    ``strict=True`` (the eval CLIs' ``--require_provenance``) additionally
    rejects UNSTAMPED artifacts (weights_source None/absent) — the
    backward-compat default treats those as untainted, which strict runs
    must not."""
    if is_tainted(weights_source) and not allow:
        raise RuntimeError(
            f"{what} was produced with RANDOM weights (weights_source="
            f"{weights_source!r}): downstream labels would be confidently "
            f"wrong. Re-extract with a real checkpoint, or pass "
            f"--allow_random_weights / allow_random_weights=True to "
            f"propagate the taint explicitly.")
    if strict and weights_source is None:
        raise RuntimeError(
            f"{what} carries NO weights-provenance stamp and "
            f"--require_provenance is set: strict runs only accept artifacts "
            f"whose producing stage stamped a _weights_provenance.json "
            f"sidecar (io/provenance.py). Re-run the producing stage, or "
            f"drop --require_provenance to accept pre-provenance artifacts.")
