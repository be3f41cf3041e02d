"""Mesh-sharded voice rendering (tuun_tpu.parallel) and the driver entry
points (__graft_entry__) — conftest provides 8 virtual CPU devices."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tuun_tpu import engine, ir
from tuun_tpu.parallel import default_mesh, render_voices_meshed

needs_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


def note(freq):
    return ir.Fin(
        ir.BinaryPointOp(ir.Operator.SUBTRACT, ir.Time(), ir.Const(2.0)),
        ir.Sine(ir.Const(freq), ir.Const(0.0)))


@needs_devices
def test_meshed_mix_matches_single_device_sum():
    voices = [note(0.5 + 0.3 * i) for i in range(5)]  # 5 voices, pad to 8
    n, sr = 48, 8
    mesh = default_mesh(8)
    mix = render_voices_meshed(voices, n, sr, mesh=mesh, block=16)
    ref = sum(engine.render(w, n, sr, precision="fast", seed=i, block=16,
                            jit=True)
              for i, w in enumerate(voices))
    assert len(mix) == len(ref)
    np.testing.assert_allclose(mix, ref, atol=1e-5)


@needs_devices
def test_graft_entry_points():
    import __graft_entry__ as g
    fn, args = g.entry()
    y, v, state, caps = jax.jit(fn)(*args)
    assert y.shape == (8192,)
    assert int(v) == 8192
    assert np.isfinite(np.asarray(y)).all()
    g.dryrun_multichip(8)


@needs_devices
def test_tracker_with_mesh_matches_meshless():
    """A Tracker built with a Mesh shards voice groups over the voice
    axis; output must match the meshless tracker exactly."""
    from tuun_tpu.tracker import Tracker

    def song(t):
        for i in range(5):
            t.play(f"v{i}", note(0.4 + 0.3 * i), start=4 * i)
        return t.run_to_completion(max_seconds=4.0)

    ref = song(Tracker(8, 16, precision="fast", jit=True))
    mesh = default_mesh(8)
    got = song(Tracker(8, 16, precision="fast", jit=True, mesh=mesh))
    n = min(len(ref), len(got))
    np.testing.assert_allclose(np.asarray(got[:n]), np.asarray(ref[:n]),
                               atol=1e-5)
    assert np.all(np.asarray(ref[n:]) == 0) and np.all(np.asarray(got[n:]) == 0)
