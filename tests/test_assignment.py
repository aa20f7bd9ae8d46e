"""On-device LAP solver vs scipy.optimize.linear_sum_assignment (the reference's
exact dependency, train_unified_lift.py:260)."""

import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment as scipy_lap

from segsplat_tpu.ops.assignment import linear_sum_assignment


def _check(cost):
    col_of_row, row_of_col = linear_sum_assignment(jnp.asarray(cost))
    col_of_row = np.asarray(col_of_row)
    row_of_col = np.asarray(row_of_col)
    n = cost.shape[0]
    # valid permutation
    assert sorted(col_of_row.tolist()) == list(range(n))
    assert (row_of_col[col_of_row] == np.arange(n)).all()
    # optimal total cost (ties may pick a different optimal matching)
    ri, ci = scipy_lap(cost)
    ours = cost[np.arange(n), col_of_row].sum()
    theirs = cost[ri, ci].sum()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_random_square():
    rng = np.random.default_rng(0)
    for n in (1, 2, 5, 16, 64):
        for _ in range(3):
            _check(rng.random((n, n)).astype(np.float32))


def test_negative_costs():
    rng = np.random.default_rng(1)
    _check((rng.random((32, 32)) * 2 - 1).astype(np.float32))


def test_ties_and_duplicates():
    rng = np.random.default_rng(2)
    c = rng.integers(0, 3, (24, 24)).astype(np.float32)  # heavy ties
    _check(c)
    _check(np.zeros((8, 8), np.float32))


def test_identity_structure():
    n = 10
    c = np.ones((n, n), np.float32)
    np.fill_diagonal(c, 0.0)
    col_of_row, _ = linear_sum_assignment(jnp.asarray(c))
    np.testing.assert_array_equal(np.asarray(col_of_row), np.arange(n))


def test_reference_cost_shape():
    """The training-path shape: softmax-sum cost with absent-id zero rows
    (losses.virtual_gt_labels)."""
    rng = np.random.default_rng(3)
    n = 256
    c = -rng.random((n, n)).astype(np.float32)
    c[100:] = 0.0  # absent ids
    _check(c)


def test_row_mask_subset_matches_subset_solve():
    rng = np.random.default_rng(5)
    n = 64
    c = rng.random((n, n)).astype(np.float32)
    mask = np.zeros(n, bool)
    mask[[3, 10, 11, 40]] = True
    col_of_row, row_of_col = linear_sum_assignment(jnp.asarray(c),
                                                   row_mask=jnp.asarray(mask))
    col_of_row = np.asarray(col_of_row)
    assert (col_of_row[~mask] == -1).all()
    sel = col_of_row[mask]
    assert len(set(sel.tolist())) == mask.sum(), "assigned columns distinct"
    # optimal for the selected sub-problem
    ri, ci = scipy_lap(c[mask])
    ours = c[mask][np.arange(mask.sum()), sel].sum()
    np.testing.assert_allclose(ours, c[mask][ri, ci].sum(), rtol=1e-5)


def test_repeated_standalone_calls_same_shape():
    """Regression for the CPU-backend hoisted-constant drop that killed the
    hard-scene GT eval's SECOND match_miou call ("Execution supplied 1
    buffers but compiled program expected 2"): the default row_mask and the
    row loop must not hoist constant buffers into the compiled program, so
    repeated standalone calls with identical shapes — interleaved with other
    jitted work, as in scripts/pseudo_label_loop.match_miou — stay alive and
    agree with each other and with scipy."""
    import jax

    rng = np.random.default_rng(7)
    n = 257  # the hard-scene eval's dim (256-class codebook + background)
    c = rng.random((n, n)).astype(np.float32)
    col1, _ = linear_sum_assignment(jnp.asarray(c))
    # interleave an unrelated jitted program (consolidate/knn ran between
    # the two match_miou calls in the crashing run)
    jax.jit(lambda x: (x @ x.T).sum())(jnp.asarray(c[:64, :64])).block_until_ready()
    col2, _ = linear_sum_assignment(jnp.asarray(c))
    np.testing.assert_array_equal(np.asarray(col1), np.asarray(col2))
    ri, ci = scipy_lap(c)
    ours = c[np.arange(n), np.asarray(col1)].sum()
    np.testing.assert_allclose(ours, c[ri, ci].sum(), rtol=1e-5)
