from team_tpu.backbone.clip import CLIPConfig, CLIPModel  # noqa: F401
from team_tpu.backbone.tokenizer import Tokenizer  # noqa: F401
