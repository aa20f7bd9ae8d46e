"""Subprocess worker for the multi-host smoke test (tests/test_multihost.py).

Runs as one of N processes: initializes jax.distributed against a local
coordinator, builds the global (view, tensor) mesh, and psums a per-process
value across processes. Prints ONE json line with the results.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    coord, num, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        # cross-process CPU collectives need the gloo backend where available
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    from segsplat_tpu.parallel import multihost

    try:
        topo = multihost.initialize(coordinator_address=coord,
                                    num_processes=num, process_id=pid)
    except Exception as e:  # pragma: no cover - environment capability probe
        print(json.dumps({"ok": False, "stage": "init", "err": repr(e)}))
        return

    out = {"ok": True, "topo": topo, "psum": None, "psum_err": None}
    try:
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = multihost.make_global_mesh()
        from segsplat_tpu.parallel.mesh import VIEW_AXIS

        n = len(jax.devices())
        arr = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(VIEW_AXIS)),
            (jnp.arange(len(jax.local_devices()), dtype=jnp.float32)
             + 10.0 * jax.process_index()).reshape(-1),
            (n,))

        @jax.jit
        def total(x):
            return jnp.sum(x)

        out["psum"] = float(total(arr))
    except Exception as e:  # pragma: no cover
        out["psum_err"] = repr(e)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
