from team_tpu.losses.clip_loss import clip_loss  # noqa: F401
from team_tpu.losses.unicl import unicl_loss  # noqa: F401
