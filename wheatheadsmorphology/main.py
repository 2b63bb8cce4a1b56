#!/usr/bin/env python
"""Standalone morphology CLI (reference: wheatheadsmorphology/main.py).

Run: python wheatheadsmorphology/main.py -c wheatheadsmorphology/config.yaml
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wheat3dgs_tpu.morphology import load_config, run_pipeline


def get_args():
    p = argparse.ArgumentParser(
        description="Run the wheat-head morphology pipeline")
    p.add_argument("-c", "--config", type=Path,
                   default=Path(__file__).with_name("config.yaml"))
    return p.parse_args()


if __name__ == "__main__":
    args = get_args()
    cfg = load_config(args.config)
    run_pipeline(cfg)
