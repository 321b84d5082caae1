"""Learner factory (reference ``utils/factory.py:1-13``)."""

from __future__ import annotations

from team_tpu.config import Config


def get_model(model_name: str, cfg: Config):
    name = model_name.lower()
    if name == "proof":
        from team_tpu.learners.proof import Learner
    elif name == "simplecil":
        from team_tpu.learners.simplecil import Learner
    elif name == "zs_clip":
        from team_tpu.learners.zs_clip import Learner
    else:
        raise AssertionError(f"Unknown model {model_name}")
    return Learner(cfg)
