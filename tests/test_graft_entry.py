"""Regression tests for the driver contract (__graft_entry__.py).

Round-3 postmortem: ``dryrun_multichip`` called ``jax.devices()`` BEFORE
forcing the CPU platform, and with the axon tunnel relay wedged that first
backend query sleeps forever in the claim/rebind loop — MULTICHIP_r03.json
recorded rc=124 for a dry run that needs no TPU at all. The contract is that
the dry run NEVER queries the default backend: it must force N virtual CPU
devices unconditionally.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_never_touches_default_backend():
    """Run dryrun_multichip(2) in a subprocess with the conftest's CPU-forcing
    env scrubbed, so the subprocess comes up on whatever default backend the
    image preimports (axon TPU — dead-tunnel-hang territory). A hard timeout
    converts the historical hang into a test failure."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_NUM_CPU_DEVICES")}
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(2)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, f"stdout={r.stdout[-500:]}\nstderr={r.stderr[-800:]}"
    assert "dryrun_multichip ok" in r.stdout
    assert "lift ok" in r.stdout
    assert "render ok" in r.stdout


def test_entry_compiles_in_process():
    """entry() must return a jittable fn + args (single-chip compile check)."""
    sys.path.insert(0, REPO)
    try:
        import jax

        import __graft_entry__ as g
        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        assert out[0].shape[-1] == 64 or out[0].ndim >= 2
    finally:
        sys.path.remove(REPO)
