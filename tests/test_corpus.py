"""Conformance corpus tests: the reference's docs + .tuun files run through
the full front-end + engine compile, plus engine-backed precompute."""

from pathlib import Path

import numpy as np
import pytest

from tuun_tpu import ir, optimizer, oracle
from tuun_tpu.engine import EngineConfig
from tuun_tpu.engine.precompute import precompute
from tuun_tpu.evaluator import Evaluator
from tuun_tpu.tools.web_checker import check_files

REFERENCE = Path("/root/reference")
REFERENCE_DOCS = REFERENCE / "docs"
STDLIB = Path(__file__).resolve().parent.parent / "tuun_tpu" / "stdlib" / "v0"


@pytest.mark.skipif(not REFERENCE_DOCS.is_dir(),
                    reason="reference docs not available")
def test_reference_docs_corpus():
    # Same corpus the reference's check-web-examples.sh gates on: every
    # <tuun-synth> example in docs (md + html) and the web demo page.
    files = sorted(REFERENCE_DOCS.glob("**/*.md"))
    files += sorted(REFERENCE_DOCS.glob("**/*.html"))
    files += sorted((REFERENCE / "web").glob("*.html"))
    report = check_files(files)
    assert not report.failed, report.failed
    # 34 md examples + 5 in docs/tuun/index.html + 5 in web/index.html
    # minus one expression-less demo block (a skip, like the reference's
    # checker treats it).
    assert len(report.ok) + len(report.skipped) >= 44
    assert len(report.ok) >= 43


def test_precompute_bakes_finite_subtrees():
    ev = Evaluator(100, 60, STDLIB)
    out = ev.evaluate_source("$10 * Qw", opens=("std",))
    w = optimizer.optimize(out.waveform.waveform)
    cfg = EngineConfig(100, precision="exact", jit=False)
    pw = precompute(w, 100, cfg=cfg)
    assert isinstance(pw, ir.Fixed)
    ref = oracle.render(w, 200, 100)
    got = oracle.render(pw, 200, 100)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_precompute_keeps_dynamic_parts():
    # A Marked subtree is dynamic: its children may bake but it may not.
    w = ir.BinaryPointOp(
        ir.Operator.MULTIPLY,
        ir.Marked("m", ir.Const(0.5)),
        ir.Fin(ir.BinaryPointOp(ir.Operator.SUBTRACT, ir.Time(),
                                ir.Const(0.5)), ir.Time()))
    cfg = EngineConfig(100, precision="exact", jit=False)
    pw = precompute(w, 100, cfg=cfg)
    assert any(isinstance(n, ir.Marked) for n in pw.walk())
    ref = oracle.render(w, 100, 100)
    got = oracle.render(pw, 100, 100)
    np.testing.assert_allclose(got, ref, atol=1e-6)
