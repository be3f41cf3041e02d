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
