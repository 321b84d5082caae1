"""Wall-clock phase attribution for the full CIL protocol (VERDICT r5 item 2).

The reference has only two wall prints (``trainer.py:86,104-105``); the axon
tunnel adds costs the device profiler cannot see (graph warm-start, dispatch
round-trips, host loops), so protocol regressions need HOST-side attribution.
This is a zero-dependency cumulative timer: learners wrap their protocol
phases in :func:`phase`, and a run that sets ``TEAM_PHASE_TIMES=1`` gets a
per-phase table (sum / count / per-call list) from :func:`report` — disabled
runs pay one ``if`` per phase.

Phases NEST (``task_total`` contains ``train_epochs`` etc.); the report is an
attribution aid, not a partition — sum leaf phases, not everything.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, List

ENABLED = os.environ.get("TEAM_PHASE_TIMES", "0") == "1"

_CALLS: Dict[str, List[float]] = defaultdict(list)


@contextlib.contextmanager
def phase(name: str):
    if not ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _CALLS[name].append(time.perf_counter() - t0)


def reset() -> None:
    _CALLS.clear()


def report() -> Dict[str, Dict]:
    """{phase: {sum, count, first, rest_mean, calls}} — ``first`` vs
    ``rest_mean`` separates compile warm-start (task 1) from steady state."""
    out = {}
    for name, calls in sorted(_CALLS.items()):
        rest = calls[1:]
        out[name] = {
            "sum": round(sum(calls), 2),
            "count": len(calls),
            "first": round(calls[0], 2),
            "rest_mean": round(sum(rest) / len(rest), 2) if rest else None,
            "calls": [round(c, 2) for c in calls],
        }
    return out


def format_report() -> str:
    rows = ["phase                     sum(s)  n  first   rest_mean"]
    for name, r in report().items():
        rm = f"{r['rest_mean']:.2f}" if r["rest_mean"] is not None else "-"
        rows.append(f"{name:<25} {r['sum']:>6.1f} {r['count']:>3}  "
                    f"{r['first']:>6.2f}  {rm:>6}")
    return "\n".join(rows)
