"""Pin the bench MCD leg's plumbing (tools/mcd_reference.py) at toy scale.

The slow whole-pipeline test (tests/test_mcd_pipeline.py) proves the recipe;
this fast test proves the TOOL bench.py imports — workspace build, reference
render with patched randomness, converted-weights render, numpy MCD."""

import os
import sys

import pytest

torch = pytest.importorskip("torch")

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools")
)


def test_mcd_tool_toy(tmp_path):
    from mcd_reference import mcd_vs_reference

    out = mcd_vs_reference(str(tmp_path), scale="toy")
    assert out["mcd_vs_reference_db"] < 0.5, out
    assert out["audio_sec"] > 0.5
    # torch global randomness must be restored after the reference render
    assert torch.rand(2, 2).abs().sum() > 0
