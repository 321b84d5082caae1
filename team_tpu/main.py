"""CLI entry point.

Counterpart of reference ``main.py:12-56``: argparse merged with a JSON
experiment file (JSON wins — ``args.update(param)`` semantics).
"""

from __future__ import annotations

import argparse
import os

if os.environ.get("TEAM_PLATFORM"):
    # the axon TPU plugin ignores JAX_PLATFORMS; jax.config wins (CLAUDE.md).
    # TEAM_PLATFORM=cpu enables host-only smoke runs / virtual-device meshes.
    import jax

    jax.config.update("jax_platforms", os.environ["TEAM_PLATFORM"])

from team_tpu.config import load_config
from team_tpu.trainer import train


def setup_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="TEAM-TPU temporal-evolution CIL")
    parser.add_argument("--config", type=str, default="./exps/IIMinsects202.json")
    parser.add_argument("--name", type=str, default="")
    parser.add_argument("--model_name", type=str, default="proof")
    parser.add_argument("--dataset", type=str, default="iiminsects202")
    parser.add_argument("--device", type=str, default="0")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--temporal", action="store_true")
    return parser


def main() -> None:
    args = setup_parser().parse_args()
    overrides = vars(args).copy()
    overrides["device"] = [int(d) for d in str(overrides["device"]).split(",")]
    cfg = load_config(args.config, overrides=overrides)
    train(cfg)


if __name__ == "__main__":
    main()
