"""Long-window drift tests: the block engine against the native C++ oracle
over many block boundaries (phase carries, filter state, envelope chains),
in both precision modes."""

from pathlib import Path

import numpy as np
import pytest

from tuun_tpu import engine, native, optimizer
from tuun_tpu.evaluator import Evaluator
from tuun_tpu.expr import ESeq, EWaveform

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native toolchain unavailable")

STDLIB = Path(__file__).resolve().parent.parent / "tuun_tpu" / "stdlib" / "v0"
SR = 8000
SECONDS = 2.0

CORPUS = [
    "$440 * Ww",
    "sawtooth(110) | fin(time - 3)",
    "triangle(220) | fin(time - 3)",
    "pulse(0.3, 150) | fin(time - 3)",
    "square(110) | lpf(0.707, 900) | fin(time - 3)",
    "$220 | ADSR(0.3, 0.4, 0.6, 0.5, 0.3)",
    "{[$300, $440, $550]} | fin(time - 3)",
    "sine(2*pi*(220 + 30 * sine(2*pi*110, pi/2)), 0) | fin(time - 3)",
    "noise * 0.5 | lpf(0.9, 500) | fin(time - 3)",
]


def _waveform(text):
    ev = Evaluator(SR, 60, STDLIB)
    out = ev.evaluate_source(text, opens=("std",))
    w = out.waveform.waveform if isinstance(out, ESeq) else out.waveform
    return optimizer.optimize(w)


@pytest.mark.parametrize("text", CORPUS)
def test_exact_mode_long(text):
    w = _waveform(text)
    n = int(SECONDS * SR)
    ref = native.render(w, n, SR)
    got = engine.render(w, n, SR, precision="exact", block=1024, jit=False)
    assert len(got) == len(ref), text
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3, err_msg=text)


@pytest.mark.parametrize("text", ["$440 * Ww", "sawtooth(110) | fin(time - 3)",
                                  "square(110) | lpf(0.707, 900) | fin(time - 3)"])
def test_fast_mode_long(text):
    """Fast mode (uint32 NCO, f32 carries, parallel IIR) against the f64
    oracle: sample tolerance loosened, but length and spectrum must hold."""
    w = _waveform(text)
    n = int(SECONDS * SR)
    ref = native.render(w, n, SR)
    got = engine.render(w, n, SR, precision="fast", block=1024, jit=False)
    assert len(got) == len(ref), text
    # Sample-level agreement except at reset discontinuities, where the
    # NCO's trigger sign can move an edge by one sample: the fraction of
    # large-mismatch samples must stay below the per-period edge count.
    err = np.abs(got - ref)
    frac_large = float((err > 5e-2).mean())
    # An IIR filter rings for ~10 samples after each jittered edge, so the
    # large-error fraction scales with edge density x ring length.
    assert frac_large < 0.02, (text, frac_large)
    assert float(np.median(err)) < 1e-3, text
    # Spectral agreement is tight.
    F = np.abs(np.fft.rfft(ref * np.hanning(len(ref))))
    G = np.abs(np.fft.rfft(got * np.hanning(len(got))))
    corr = np.corrcoef(np.log1p(F), np.log1p(G))[0, 1]
    assert corr > 0.995, (text, corr)


# ---------------------------------------------------------------------------
# Fast-mode drift study: the documented error envelope (docs/design.md §3)
# ---------------------------------------------------------------------------
#
# Dynamic-frequency (FM) sines integrate with an f32 prefix sum and a
# mod-2pi carried accumulator; the carry picks up ~1 ulp of the per-block
# phase total (~2e-3 rad at 2^17-sample blocks) per block, a LINEAR phase
# drift of ~0.6 rad/hour at 8 kHz for a 220 Hz carrier.  That is a pure
# phase offset — frequency content is unaffected — but it is the fast
# mode's largest long-run deviation and this test pins its envelope
# (measured: FM max |err| 0.10 / 0.30 / 0.58 at 10/30/60 min; PM roughly
# half).  Constant-frequency sines use the integer NCO and do not drift
# at all (test_fast_index_boundary covers their length semantics).


@pytest.mark.parametrize("text,per_min", [
    ("sine(2*pi*(220 + 30 * sine(2*pi*3, 0)), 0) | fin(time - 3700)",
     0.020),   # FM: frequency-modulation drive
    ("sine(2*pi*220, 4 * sine(2*pi*3, 0)) | fin(time - 3700)",
     0.0070),  # PM: phase-modulation drive
])
def test_fm_fast_drift_envelope(text, per_min):
    """Fast-mode FM/PM drift vs the f64 oracle stays inside the
    documented linear envelope (2x the measured slope) out to an hour."""
    from tuun_tpu.engine import CompiledVoice, EngineConfig

    sr = 8000
    win = 4096
    w = _waveform_at(text, sr)
    n = 60 * 60 * sr + win
    ref = native.render(w, n, sr)
    voice = CompiledVoice(w, EngineConfig(sr, "fast", jit=True))
    P = voice.params()
    st = voice.init(P)
    blk = 1 << 17
    got = np.empty(n, np.float32)
    done = 0
    while done < n:
        k = min(blk, n - done)
        y, _, st, _ = voice.render_block(P, st, blk, 0, k, fast=False)
        got[done:done + k] = np.asarray(y)[:k]
        done += k
    for minutes in (10, 30, 60):
        off = minutes * 60 * sr
        err = np.abs(got[off:off + win] - ref[off:off + win])
        budget = 2.0 * per_min * minutes
        assert err.max() < budget, (text, minutes, err.max(), budget)
    # The drift is phase-only: spectra must still match tightly.
    off = 60 * 60 * sr
    F = np.abs(np.fft.rfft(ref[off:off + win] * np.hanning(win)))
    G = np.abs(np.fft.rfft(got[off:off + win] * np.hanning(win)))
    corr = np.corrcoef(np.log1p(F), np.log1p(G))[0, 1]
    assert corr > 0.999, (text, corr)


def _waveform_at(text, sr):
    ev = Evaluator(sr, 60, STDLIB)
    out = ev.evaluate_source(text, opens=("std",))
    w = out.waveform.waveform if isinstance(out, ESeq) else out.waveform
    return optimizer.optimize(w)


def test_fast_index_boundary_2pow24():
    """Past 2^24 samples the fast (reloc) path's f32 lane indices can
    shift a Fin boundary by at most one sample (graph.py length-algebra
    notes); the stateful path stays exact.  Pins both behaviors at a
    cutoff just above the boundary, reconstructing state near the
    boundary instead of rendering 16.8M samples."""
    import jax.numpy as jnp
    from tuun_tpu import ir
    from tuun_tpu.engine import CompiledVoice, EngineConfig
    from tuun_tpu.engine.graph import reconstruct_state

    sr = 8000
    dur = 2100.0                   # cutoff 16,800,000 > 2^24
    cutoff = 16_800_000
    w = optimizer.optimize(ir.Fin(
        ir.BinaryPointOp(ir.Operator.SUBTRACT, ir.Time(), ir.Const(dur)),
        ir.Const(1.0)))
    voice = CompiledVoice(w, EngineConfig(sr, "fast", jit=True))
    P = voice.params()
    lits = voice.lits_for(P)
    assert lits == (cutoff,)
    n = 4096
    pos = cutoff - 2048
    # Stateful path: state reconstructed at pos, exact boundary.
    st = (jnp.int32(pos), reconstruct_state(voice.root, P, lits, pos))
    y, v, _, _ = voice.render_block(P, st, n, 0, n, fast=False)
    assert int(v) == 2048
    ys = np.asarray(y)
    assert np.all(ys[:2048] == 1.0) and np.all(ys[2048:] == 0.0)
    # Fast (reloc) path: valid end is exact scalar arithmetic; the lane
    # MASK may zero at most one sample adjacent to the boundary.
    st = (jnp.int32(pos), voice.init(P)[1])
    y, v, _, _ = voice.render_block(P, st, n, 0, n, fast=True)
    assert int(v) == 2048
    yf = np.asarray(y)
    assert np.all(yf[2048:] == 0.0)
    assert np.all(yf[:2047] == 1.0)   # at most the last sample may drop
