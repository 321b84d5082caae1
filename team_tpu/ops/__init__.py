from team_tpu.ops.attention import multi_head_attention  # noqa: F401
from team_tpu.ops.flash_attention import flash_attention  # noqa: F401
