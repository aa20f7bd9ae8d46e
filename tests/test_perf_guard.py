"""The tunnel-independent perf guard's comparison contract (scripts/perf_guard.py).

The heavy part (lower+compile the three bench configs) runs out-of-band —
~2 min/program on the single core — so the suite covers the drift logic and
the scene-builder contract bench.py shares with the guard."""

import numpy as np


def test_compare_flags_drift_and_respects_tolerance(capsys):
    from scripts.perf_guard import compare

    base = {"platform": "cpu",
            "prog": {"flops": 1000.0, "bytes_accessed": 500.0,
                     "temp_bytes": 100, "wall_s_per_unit": 1.0}}
    ok = {"platform": "cpu",
          "prog": {"flops": 1005.0, "bytes_accessed": 500.0,
                   "temp_bytes": 100, "wall_s_per_unit": 1.2}}
    assert compare(base, ok) == 0  # 0.5% count, 20% wall: inside tolerance

    drift = {"prog": {"flops": 1100.0, "bytes_accessed": 500.0,
                      "temp_bytes": 100, "wall_s_per_unit": 1.5}}
    n = compare(base, drift)
    assert n == 2  # flops +10% and wall +50% both out of tolerance
    out = capsys.readouterr().out
    assert "DRIFT" in out and "flops" in out


def test_bench_scene_builders_are_deterministic_and_complete():
    """perf_guard tracks exactly the benched shapes: the builders must be
    seed-fixed (two calls identical) and expose the full raster input set."""
    import bench

    a = bench.headline_render_scene(W=320, H=180, N=2_000)
    b = bench.headline_render_scene(W=320, H=180, N=2_000)
    assert set(a) >= {"xyz", "scales", "quats", "opac", "logits", "kw"}
    np.testing.assert_array_equal(np.asarray(a["xyz"]), np.asarray(b["xyz"]))

    h = bench.hostile_render_scene(W=320, H=180, N=2_000)
    assert h["kw"]["max_per_tile"] == 512 and h["kw"]["max_tiles_per_axis"] == 6
    # the hostile scene must actually be hostile: heavier opacity tail low end
    assert float(np.asarray(h["opac"]).min()) < 0.05
