"""CLI entry-point smoke test (reference ``main.py`` contract: --config JSON,
JSON overrides CLI)."""

import os
import subprocess
import sys


def test_main_cli_smoke():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys; sys.argv = ['main', '--config', 'exps/synthetic_smoke.json'];"
        "from team_tpu.main import main; main()"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd="/root/repo",
                          env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "final average accuracy" in (proc.stdout + proc.stderr)
