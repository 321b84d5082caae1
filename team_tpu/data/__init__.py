from team_tpu.data.manager import DataManager  # noqa: F401
from team_tpu.data.loader import ArrayLoader  # noqa: F401
