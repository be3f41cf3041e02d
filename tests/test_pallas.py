"""Unit tests for the Pallas TPU kernels, run off-TPU via interpret mode.

The production fast path uses these kernels only on a TPU backend
(EngineConfig.pallas), so the default CPU suite never exercised them —
a Mosaic-visible regression would ship silently.  pallas_call's
interpreter executes the same kernel bodies on CPU; these tests pin the
kernels' semantics against numpy references.

Interpret mode is slow (seconds per call), so sizes stay small; shapes
cover the edge geometry: single row (n=128), multi-row with row carry,
and multi-tile (grid > 1) for the affine scan.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from tuun_tpu.engine.pallas_ops import (AFFINE_CHUNK, LANE, affine_scan_f32,
                                        prefix_max_f32, prefix_sum_f32)


def test_prefix_sum_single_row():
    x = np.arange(LANE, dtype=np.float32)
    out = np.asarray(prefix_sum_f32(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(out, np.cumsum(x), rtol=1e-6)


def test_prefix_sum_multi_row_carry():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(4 * LANE).astype(np.float32)
    out = np.asarray(prefix_sum_f32(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(out, np.cumsum(x.astype(np.float64)),
                               rtol=1e-5, atol=1e-4)


def test_prefix_kernels_multi_chunk_grid_carry(monkeypatch):
    # Large blocks scan as a sequential grid with the running total in
    # SMEM scratch (one whole-array VMEM block OOMs at 2^20 lanes); force
    # a tiny chunk so interpret mode exercises the tile carry quickly.
    import tuun_tpu.engine.pallas_ops as po
    monkeypatch.setattr(po, "PREFIX_CHUNK", 2)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(8 * LANE).astype(np.float32)
    out = np.asarray(po.prefix_sum_f32(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(out, np.cumsum(x.astype(np.float64)),
                               rtol=1e-5, atol=1e-4)
    outm = np.asarray(po.prefix_max_f32(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(outm, np.maximum.accumulate(x))


def test_prefix_sum_unsupported_size_falls_back():
    # Not a multiple of 128: must fall back to associative_scan (no
    # interpret needed — it never reaches pallas_call).
    x = np.ones(100, np.float32)
    out = np.asarray(prefix_sum_f32(jnp.asarray(x)))
    np.testing.assert_allclose(out, np.arange(1, 101, dtype=np.float32))


def test_prefix_max_single_row():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(LANE).astype(np.float32)
    out = np.asarray(prefix_max_f32(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(out, np.maximum.accumulate(x))


def test_prefix_max_neg_big_saturation():
    # The reset edge-scan feeds -3e18 sentinel lanes; the kernel's NEG_BIG
    # padding must not leak past real values.
    x = np.full(2 * LANE, -3.0e18, np.float32)
    x[5] = 7.0
    x[200] = 9.0
    out = np.asarray(prefix_max_f32(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(out, np.maximum.accumulate(x))


def _affine_reference(a, ff, live, h0):
    n, J = a.shape
    h = h0.astype(np.float64).copy()
    ref = np.zeros((n, J))
    for i in range(n):
        if live[i]:
            y = ff[i] - np.dot(a[i], h)
            h = np.concatenate([[y], h[:-1]])
        ref[i] = h
    return ref, h


@pytest.mark.parametrize("n,J", [(LANE, 1), (2 * LANE, 2), (4 * LANE, 3)])
def test_affine_scan_matches_sequential(n, J):
    rng = np.random.default_rng(n + J)
    a = (rng.standard_normal((n, J)) * 0.3).astype(np.float32)
    ff = rng.standard_normal(n).astype(np.float32)
    live = rng.random(n) > 0.2
    h0 = rng.standard_normal(J).astype(np.float32)
    res = affine_scan_f32(jnp.asarray(a), jnp.asarray(ff),
                          jnp.asarray(live), jnp.asarray(h0), interpret=True)
    assert res is not None
    hs, hist = np.asarray(res[0]), np.asarray(res[1])
    ref, h_end = _affine_reference(a, ff, live, h0)
    np.testing.assert_allclose(hs, ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(hist, h_end, rtol=1e-4, atol=1e-4)


def test_affine_scan_multi_tile_carry(monkeypatch):
    # Force the sequential grid (tile carry through SMEM scratch) with a
    # small chunk so the test stays fast: 4 rows, 2 tiles of 2.
    import tuun_tpu.engine.pallas_ops as po
    monkeypatch.setattr(po, "AFFINE_CHUNK", 2)
    n, J = 4 * LANE, 2
    rng = np.random.default_rng(9)
    a = (rng.standard_normal((n, J)) * 0.4).astype(np.float32)
    ff = rng.standard_normal(n).astype(np.float32)
    live = np.ones(n, bool)
    h0 = np.array([0.5, -0.25], np.float32)
    res = po.affine_scan_f32(jnp.asarray(a), jnp.asarray(ff),
                             jnp.asarray(live), jnp.asarray(h0),
                             interpret=True)
    assert res is not None
    hs, hist = np.asarray(res[0]), np.asarray(res[1])
    ref, h_end = _affine_reference(a, ff, live, h0)
    np.testing.assert_allclose(hs, ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(hist, h_end, rtol=1e-4, atol=1e-4)


def test_affine_scan_all_dead_lanes_pass_history_through():
    n, J = LANE, 2
    a = np.full((n, J), 0.9, np.float32)
    ff = np.ones(n, np.float32)
    live = np.zeros(n, bool)
    h0 = np.array([3.0, -2.0], np.float32)
    res = affine_scan_f32(jnp.asarray(a), jnp.asarray(ff),
                          jnp.asarray(live), jnp.asarray(h0), interpret=True)
    hs, hist = np.asarray(res[0]), np.asarray(res[1])
    np.testing.assert_allclose(hs, np.broadcast_to(h0, (n, J)))
    np.testing.assert_allclose(hist, h0)


def test_affine_scan_unsupported_shapes_return_none():
    mk = lambda *s: jnp.zeros(s, jnp.float32)
    # n not a multiple of LANE
    assert affine_scan_f32(mk(100, 2), mk(100), mk(100), mk(2)) is None
    # J too large
    assert affine_scan_f32(mk(LANE, 5), mk(LANE), mk(LANE), mk(5)) is None
