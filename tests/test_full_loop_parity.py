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


# ---------------------------------------------------------------------------
# FULL-WIDTH single-task parity (VERDICT r4 item 4): one task at the real
# ViT-B/16 width — 224px images, D=512 embeddings, S=197 towers — against the
# executed reference. Width-dependent numerics (reduction orders at D=512,
# S=197 fusion forms) are exactly what the tiny harness above cannot see.
# slow-marked: ~6 min on the 1-core CPU host (torch full-width forwards).
# ---------------------------------------------------------------------------

ARGS_FULLWIDTH = dict(
    prefix="parity_fw", dataset="iiminsects202", memory_size=12,
    memory_per_class=2, fixed_memory=False, device=[-1], seed=42,
    model_name="proof", convnet_type="clip", tuned_epoch=2,
    lr_scheduler="cosine", init_cls=6, increment=2, batch_size=8,
    weight_decay=5e-5, init_lr=0.004, min_lr=0.0, milestones=[200],
    gamma=0.2, momentum=0.9, shuffle=True, projection_type="pure_mlp",
    context_prompt_length_per_task=4, optimizer="adam",
)


@pytest.fixture(scope="module")
def runs_fullwidth(tmp_path_factory):
    from team_tpu.backbone.clip import CLIPConfig

    install_reference_stubs()
    root = str(tmp_path_factory.mktemp("nested_ds_fw"))
    sandbox = str(tmp_path_factory.mktemp("ref_sandbox_fw"))
    # 6 classes, init_cls=6 -> ONE task (the reference's zero-shot eval
    # topk(k=5) needs >=5 total classes); 224px JPEGs for the real patch grid
    write_nested_dataset(root, num_classes=6, img_size=224,
                         train_per_stage=2, test_per_stage=1)
    torch_model, jax_params, _cfg, tok = make_tiny_backbone(
        cfg=CLIPConfig.vit_b16())
    ref = run_reference(root, sandbox, dict(ARGS_FULLWIDTH), torch_model, tok,
                        img_size=224)
    team = run_team(root, dict(ARGS_FULLWIDTH), jax_params, ref,
                    full_width=True)
    return ref, team


@pytest.mark.slow
def test_fullwidth_single_task_parity(runs_fullwidth):
    """Per-epoch CE/CLIP/UniCL sums <=1e-3-rel and task accuracy <=0.5 pp vs
    the executed reference at real ViT-B/16 width
    (``/root/reference/models/proof.py:348-517``)."""
    ref, team = runs_fullwidth
    assert len(ref["eval"]) == len(team["eval"]) == 1
    # batch alignment precondition
    import os as _os

    rv, tv = ref["train_views"][0], team["train_views"][0]
    assert [_os.path.basename(p) for p in rv["paths"]] == \
           [_os.path.basename(p) for p in tv["paths"]]

    # per-epoch loss sums
    seg, pos = {}, 0
    for e, batches in enumerate(ref["train_orders"][0]):
        k = len(batches)
        seg[(0, e)] = dict(ce=sum(ref["ce"][pos:pos + k]),
                           clip=sum(ref["clip"][pos:pos + k]),
                           unicl=sum(ref["unicl"][pos:pos + k]))
        pos += k
    assert team["epoch_stats"], "team epoch stats hook did not fire"
    for task, epoch, stats in team["epoch_stats"]:
        want = seg[(task, epoch)]
        for key in ("ce", "clip", "unicl"):
            r, m = want[key], stats[key]
            assert abs(r - m) <= 1e-3 * max(1.0, abs(r)), (
                f"FULL-WIDTH task {task} epoch {epoch} {key}: "
                f"ref {r:.6f} vs team {m:.6f}")

    # accuracy at the 0.5-pp bar
    re, te = ref["eval"][0], team["eval"][0]
    for key in ("top1", "top4"):
        r, m = float(re["cnn"][key]), float(te["cnn"][key])
        assert abs(r - m) <= 0.5, f"fullwidth cnn {key}: ref {r} vs team {m}"
    if re["nme"] is not None:
        assert te["nme"] is not None
        r, m = float(re["nme"]["top1"]), float(te["nme"]["top1"])
        assert abs(r - m) <= 0.5, f"fullwidth nme top1: ref {r} vs team {m}"
