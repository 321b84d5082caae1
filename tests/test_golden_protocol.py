"""Pinned tiny-protocol goldens: per-task curves (exact to 0.1pp) and
per-epoch loss components (1e-3 relative) against ``golden_protocol.json``.

A subtle numerics regression that still clears the coarse >=12% learning floor
(tests/test_end_to_end.py) shows up here as a loss/curve drift. Regenerate the
golden ONLY for an intended numerics change:
``python -c "import sys; sys.path.insert(0,'tests'); ..."`` (see
golden_protocol.py docstring) — and say why in the commit message.
"""

import json
import os

import pytest

from golden_protocol import run_golden_protocol

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_protocol.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def fresh():
    curves, stats = run_golden_protocol()
    return {"curves": curves, "stats": stats}


def test_golden_curves(golden, fresh):
    for key in ("top1", "top4", "nme_top1"):
        want, got = golden["curves"][key], fresh["curves"][key]
        assert len(want) == len(got) == 3
        for t, (w, g) in enumerate(zip(want, got)):
            assert abs(w - g) <= 0.1, f"{key} task {t}: golden {w} vs run {g}"


def test_golden_epoch_losses(golden, fresh):
    assert len(golden["stats"]) == len(fresh["stats"]) > 0
    for (t0, e0, d0), (t1, e1, d1) in zip(golden["stats"], fresh["stats"]):
        assert (t0, e0) == (t1, e1)
        for k in ("total", "ce", "clip", "unicl"):
            assert abs(d0[k] - d1[k]) <= 1e-3 * max(1.0, abs(d0[k])), (
                f"task {t0} epoch {e0} {k}: golden {d0[k]} vs run {d1[k]}")
