from team_tpu.ops.attention import multi_head_attention  # noqa: F401
from team_tpu.ops.flash_attention import flash_attention  # noqa: F401
from team_tpu.ops.int8_matmul import (  # noqa: F401
    int8_linear,
    ln_quantize,
    quantize_rows,
    quantize_weight,
    quantized_linear,
)
from team_tpu.ops.mha_short import fused_mha_packed, fused_mha_short  # noqa: F401
from team_tpu.ops.preprocess import normalize_uint8_kernel, preprocess_batch  # noqa: F401
