from team_tpu.learners.factory import get_model  # noqa: F401
