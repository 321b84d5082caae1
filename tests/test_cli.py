"""CLI entry-point smoke test (reference ``main.py`` contract: --config JSON,
JSON overrides CLI)."""

import os
import subprocess
import sys


def test_bench_preflight_ping(monkeypatch):
    """bench._preflight_ping: the round-end watchdog must survive BOTH tunnel
    failure modes (hang -> TimeoutExpired, fast fail -> nonzero returncode)
    without raising, and stop on the first healthy ping."""
    import bench

    calls = {"n": 0}

    def ok(*a, **k):
        calls["n"] += 1
        class R:
            returncode = 0
            stderr = b""
        return R()

    monkeypatch.setattr(subprocess, "run", ok)
    assert bench._preflight_ping(attempts=3, ping_timeout=1, sleep_s=0) == "ok"
    assert calls["n"] == 1  # healthy: one ping, no retries

    def hang(cmd, timeout=None, **k):
        calls["n"] += 1
        raise subprocess.TimeoutExpired(cmd, timeout)

    calls["n"] = 0
    monkeypatch.setattr(subprocess, "run", hang)
    # ALL attempts hung -> "hang": the caller emits a sentinel JSON record
    # and exits nonzero instead of hanging in main() (ADVICE r4)
    assert bench._preflight_ping(attempts=2, ping_timeout=1, sleep_s=0) == "hang"
    assert calls["n"] == 2  # hung pings are killed and retried, bounded

    def fail(*a, **k):
        calls["n"] += 1
        class R:
            returncode = 1
            stderr = b"UNAVAILABLE: tunnel down"
        return R()

    calls["n"] = 0
    monkeypatch.setattr(subprocess, "run", fail)
    # fast nonzero exits -> "fail": init raises promptly, main()'s re-exec
    # retry path owns this mode, so the caller still runs main()
    assert bench._preflight_ping(attempts=2, ping_timeout=1, sleep_s=0) == "fail"
    assert calls["n"] == 2


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
