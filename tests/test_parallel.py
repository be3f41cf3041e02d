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


def reloc_note(freq):
    # Relocatable: NCO sine under a symbolic Fin — a pure function of the
    # absolute sample index (no filter/reset state).
    return ir.BinaryPointOp(
        ir.Operator.MULTIPLY,
        note(freq),
        ir.Fin(ir.BinaryPointOp(ir.Operator.SUBTRACT, ir.Time(),
                                ir.Const(2.0)), ir.Const(0.5)))


@needs_devices
def test_lane_sharded_render_matches_voice_only():
    """On a (4, 2) mesh the relocatable path genuinely splits each block's
    lanes over the time axis; output must equal the voice-axis-only
    stateful path and the meshless sum."""
    voices = [reloc_note(0.5 + 0.3 * i) for i in range(5)]
    n, sr = 48, 8
    mesh = default_mesh(8)
    assert mesh.shape["time"] == 2
    lane = render_voices_meshed(voices, n, sr, mesh=mesh, block=16)
    stateful = render_voices_meshed(voices, n, sr, mesh=mesh, block=16,
                                    lane_shard=False)
    ref = sum(engine.render(w, n, sr, precision="fast", seed=i, block=16,
                            jit=True)
              for i, w in enumerate(voices))
    np.testing.assert_allclose(lane, stateful, atol=1e-5)
    np.testing.assert_allclose(lane, ref, atol=1e-5)


@needs_devices
def test_lane_sharded_output_is_time_sharded():
    """The lane-sharded step's device output is genuinely partitioned
    over the time axis (each device holds block/T lanes), not a
    full-width compute with a relayout."""
    from tuun_tpu.engine.graph import CompiledVoice, EngineConfig
    from tuun_tpu.parallel import _render_reloc_lane_sharded

    mesh = default_mesh(8)
    w = reloc_note(0.7)
    cfg = EngineConfig(8, precision="fast", jit=True, use_pallas=False,
                       timeline=False)
    voice = CompiledVoice(w, cfg)
    assert voice.relocatable
    out = _render_reloc_lane_sharded(voice, [voice.params()], 16, mesh, 16)
    assert out.shape == (16,)
    ref = engine.render(w, 16, 8, precision="fast", jit=True, block=16)
    np.testing.assert_allclose(out, ref, atol=1e-5)
