"""Checkpoint/resume integration: train 2 tasks, kill, resume, finish — curves
and learner state must carry across processes (a capability the reference
lacks entirely, SURVEY.md §5)."""

import os

import numpy as np

from team_tpu.config import Config
from team_tpu.trainer import train


def _cfg(tmp, resume=False):
    return Config(
        prefix="ck", dataset="synthetic_insects", model_name="proof",
        convnet_type="clip", init_cls=2, increment=2, memory_size=12,
        tuned_epoch=1, batch_size=8, init_lr=0.01, optimizer="adam",
        context_prompt_length_per_task=3, seed=[3], shuffle=True,
        log_dir=os.path.join(tmp, "logs"),
        checkpoint_dir=os.path.join(tmp, "ckpt"), resume=resume,
        extras={"tiny_backbone": True, "dataset_kwargs": {"num_classes": 6, "img_size": 32}},
    )


def test_checkpoint_save_and_resume(tmp_path):
    tmp = str(tmp_path)
    res_full = train(_cfg(tmp))
    assert len(res_full["cnn_top1"]) == 3

    # resume run starts from the last saved task: nothing left to train,
    # curves restored intact — including the NME curve (regression: it used
    # to restart empty on resume, silently losing earlier tasks)
    res_resumed = train(_cfg(tmp, resume=True))
    np.testing.assert_allclose(res_resumed["cnn_top1"], res_full["cnn_top1"])
    np.testing.assert_allclose(res_resumed["nme_top1"], res_full["nme_top1"])
    assert len(res_full["nme_top1"]) == 3

    # partial resume: wipe the later checkpoints, keep task 0, retrain rest
    import shutil

    for t in (1, 2):
        p = os.path.join(tmp, "ckpt", f"task_{t}")
        if os.path.isdir(p):
            shutil.rmtree(p)
    res_partial = train(_cfg(tmp, resume=True))
    assert len(res_partial["cnn_top1"]) == 3
    np.testing.assert_allclose(res_partial["cnn_top1"][0], res_full["cnn_top1"][0])


def test_checkpoint_simplecil(tmp_path):
    cfg = _cfg(str(tmp_path))
    cfg.model_name = "simplecil"
    res = train(cfg)
    cfg2 = _cfg(str(tmp_path), resume=True)
    cfg2.model_name = "simplecil"
    res2 = train(cfg2)
    np.testing.assert_allclose(res2["cnn_top1"], res["cnn_top1"])


def test_fix_mode_projectors_survive_resume(tmp_path):
    """Fix-mode lifecycle projectors (bias-scaled per task) are part of the
    learner state and must persist across resume."""
    import jax.numpy as jnp
    import numpy as np

    from team_tpu.checkpoint import TaskCheckpointer
    from team_tpu.config import Config
    from team_tpu.learners.factory import get_model

    cfg = Config(parity_mode=False, lifecycle_weight=0.5,
                 extras={"tiny_backbone": True})
    learner = get_model("proof", cfg)
    learner.dims = type("D", (), {"feature_dim": 8})()
    learner.integrate_with_state_distance()
    want = np.asarray(learner._evo_projectors["3-4"]["b"]).copy()

    ck = TaskCheckpointer(str(tmp_path))
    ck.save(0, learner, {"top1": [50.0]})

    fresh = get_model("proof", Config(parity_mode=False,
                                      extras={"tiny_backbone": True}))
    curves = {}
    assert ck.restore_latest(fresh, curves) == 0
    np.testing.assert_array_equal(np.asarray(fresh._evo_projectors["3-4"]["b"]), want)
