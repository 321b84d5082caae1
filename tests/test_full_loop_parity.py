"""Full-LOOP cross-implementation parity: the REFERENCE's actual training loop
(``/root/reference/trainer.py`` → ``models/proof.py``) executed side-by-side
with team_tpu on identical data, identical batch order, and transplanted
parameters (round-2 verdict missing #3 / next-round item 2).

Module-level parity (``test_reference_parity.py``) pins every numeric module;
THIS test pins the orchestration: epoch cadence, evolution call sequence,
herding/memory feedback, distance-matrix merge ordering, LR stepping. Any
divergence the module tests cannot see shows up here as a per-epoch loss or
per-task accuracy mismatch.

Tolerances: losses compare at 1e-3 relative (f32 drift over two systems'
different reduction orders); accuracy curves at the 0.5 percentage-point
north-star bar (BASELINE.md).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loop_harness import (  # noqa: E402
    install_reference_stubs,
    make_tiny_backbone,
    run_reference,
    run_team,
    write_nested_dataset,
)

ARGS = dict(
    prefix="parity", dataset="iiminsects202", memory_size=12, memory_per_class=6,
    fixed_memory=False, device=[-1], seed=42, model_name="proof",
    convnet_type="clip", tuned_epoch=2, lr_scheduler="cosine", init_cls=2,
    increment=2, batch_size=8, weight_decay=5e-5, init_lr=0.004, min_lr=0.0,
    milestones=[200], gamma=0.2, momentum=0.9, shuffle=True,
    projection_type="pure_mlp", context_prompt_length_per_task=4,
    optimizer="adam",
)


@pytest.fixture(scope="module")
def runs(tmp_path_factory):
    install_reference_stubs()
    root = str(tmp_path_factory.mktemp("nested_ds"))
    sandbox = str(tmp_path_factory.mktemp("ref_sandbox"))
    write_nested_dataset(root)
    torch_model, jax_params, _cfg, tok = make_tiny_backbone()
    ref = run_reference(root, sandbox, dict(ARGS), torch_model, tok)
    team = run_team(root, dict(ARGS), jax_params, ref)
    return ref, team


def test_protocol_alignment(runs):
    """Same class order, labels, and per-task train-set composition (incl.
    herding replay rows) — the precondition for everything below."""
    ref, team = runs
    assert ref["class_order"] == team["class_order"]
    assert ref["class_to_label"] == team["class_to_label"]
    assert len(ref["eval"]) == len(team["eval"]) == 3
    import os

    for t, (rv, tv) in enumerate(zip(ref["train_views"], team["train_views"])):
        rb = [os.path.basename(p) for p in rv["paths"]]
        tb = [os.path.basename(p) for p in tv["paths"]]
        assert rb == tb, f"task {t}: train rows differ"
        np.testing.assert_array_equal(rv["labels"], tv["labels"])


def test_rehearsal_memory_parity(runs):
    """Herding exemplar selection feeds later tasks — must pick the same rows."""
    import os

    ref, team = runs
    rm = [os.path.basename(p) for p in ref["memory_paths"]]
    tm = [os.path.basename(p) for p in team["memory_paths"]]
    assert rm == tm


def test_per_epoch_losses(runs):
    """Epoch-summed CE / CLIP / UniCL within 1e-3 relative of the reference."""
    ref, team = runs
    n_batches = sum(len(e) for t in ref["train_orders"] for e in t)
    assert len(ref["ce"]) == len(ref["clip"]) == len(ref["unicl"]) == n_batches

    # segment the flat per-batch records by (task, epoch)
    seg, pos = {}, 0
    for t, epochs in enumerate(ref["train_orders"]):
        for e, batches in enumerate(epochs):
            k = len(batches)
            seg[(t, e)] = dict(
                ce=sum(ref["ce"][pos:pos + k]),
                clip=sum(ref["clip"][pos:pos + k]),
                unicl=sum(ref["unicl"][pos:pos + k]),
            )
            pos += k
    assert pos == n_batches

    assert team["epoch_stats"], "team epoch stats hook did not fire"
    for task, epoch, stats in team["epoch_stats"]:
        want = seg[(task, epoch)]
        for key in ("ce", "clip", "unicl"):
            r, m = want[key], stats[key]
            assert abs(r - m) <= 1e-3 * max(1.0, abs(r)), (
                f"task {task} epoch {epoch} {key}: ref {r:.6f} vs team {m:.6f}")


def test_task_accuracy_curves(runs):
    """Per-task top1/top4 CNN curves within the 0.5%-point north-star bar."""
    ref, team = runs
    for t, (re, te) in enumerate(zip(ref["eval"], team["eval"])):
        for key in ("top1", "top4"):
            r = float(re["cnn"][key])
            m = float(te["cnn"][key])
            assert abs(r - m) <= 0.5, f"task {t} cnn {key}: ref {r} vs team {m}"
        if re["nme"] is not None:
            assert te["nme"] is not None
            r, m = float(re["nme"]["top1"]), float(te["nme"]["top1"])
            assert abs(r - m) <= 0.5, f"task {t} nme top1: ref {r} vs team {m}"
