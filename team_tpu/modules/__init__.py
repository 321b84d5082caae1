from team_tpu.modules.linears import cosine_linear_forward, init_cosine_linear  # noqa: F401
from team_tpu.modules.projections import apply_projection_bank, init_projection_bank  # noqa: F401
from team_tpu.modules.fusion import fusion_attention, init_fusion  # noqa: F401
from team_tpu.modules.temporal_gcn import init_temporal_gcn, temporal_gcn_forward  # noqa: F401
from team_tpu.modules.state_distance import StateDistanceMatrix  # noqa: F401
