from team_tpu.utils.toolkit import accuracy, count_parameters, set_random  # noqa: F401
