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
