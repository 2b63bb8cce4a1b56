#!/usr/bin/env python
"""Resilient training launcher: checkpoint cadence + stall auto-resume.

The reference leaves crash recovery to SLURM job retries
(/root/reference/run_wheat_3dgs.sh:1-11) and loses everything since the
last manual checkpoint. This launcher makes long runs survive the failure
mode we actually observe on a remote-TPU attachment — the device RPC
wedging mid-compile, leaving the process asleep forever:

- injects a dense --checkpoint_iterations cadence (every --ckpt_every),
- watches the run's metrics.jsonl mtime; if it goes stale for longer than
  --stall_s, kills the child (by exact PID) and relaunches from the most
  recent chkpnt*.npz via --start_checkpoint,
- stops after --max_restarts to avoid looping on a deterministic crash.

Usage (all unrecognized args pass through to train_vanilla_3dgs.py):
  python scripts/train_watchdog.py -s SCENE -m MODEL --iterations 30000 \
      [--ckpt_every 1000] [--stall_s 300] [--max_restarts 8]
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_checkpoint(model_path: str):
    best = None
    for p in glob.glob(os.path.join(model_path, "chkpnt*.npz")):
        m = re.search(r"chkpnt(\d+)\.npz$", p)
        if m:
            it = int(m.group(1))
            if best is None or it > best[0]:
                best = (it, p)
    return best


def main():
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--ckpt_every", type=int, default=1000)
    ap.add_argument("--stall_s", type=float, default=300.0)
    ap.add_argument("--max_restarts", type=int, default=8)
    args, passthrough = ap.parse_known_args()

    def get_flag(name, default=None):
        for i, a in enumerate(passthrough):
            if a == name and i + 1 < len(passthrough):
                return passthrough[i + 1]
        return default

    model_path = get_flag("-m") or get_flag("--model_path")
    iters = int(get_flag("--iterations", "15000"))
    assert model_path, "pass -m/--model_path"
    metrics_path = os.path.join(model_path, "metrics.jsonl")

    cadence = sorted(set(range(args.ckpt_every, iters + 1, args.ckpt_every))
                     | {iters})
    if "--checkpoint_iterations" not in passthrough:
        passthrough = passthrough + ["--checkpoint_iterations",
                                     *map(str, cadence)]

    restarts = 0
    while True:
        cmd = [sys.executable,
               os.path.join(REPO, "train_vanilla_3dgs.py"), *passthrough]
        ck = latest_checkpoint(model_path) if os.path.isdir(model_path) \
            else None
        if ck and "--start_checkpoint" not in cmd:
            if ck[0] >= iters:
                print(f"[watchdog] checkpoint {ck[0]} >= {iters}: done")
                return 0
            cmd += ["--start_checkpoint", ck[1]]
            print(f"[watchdog] resuming from iter {ck[0]}", flush=True)
        child = subprocess.Popen(cmd)
        start_ts = time.time()
        print(f"[watchdog] child pid {child.pid}", flush=True)
        stalled = False
        while True:
            try:
                rc = child.wait(timeout=30)
                break
            except subprocess.TimeoutExpired:
                pass
            try:
                mtime = os.path.getmtime(metrics_path)
            except OSError:
                mtime = 0.0   # not created yet (scene load / first compiles)
            # Progress signal = the newer of (this child's start, its last
            # metrics write): a pre-existing metrics file from the previous
            # attempt must not trigger an instant kill, and first compiles
            # can legitimately take minutes.
            age = time.time() - max(mtime, start_ts)
            if age > args.stall_s:
                print(f"[watchdog] metrics stale {age:.0f}s > "
                      f"{args.stall_s:.0f}s: killing {child.pid}",
                      flush=True)
                child.send_signal(signal.SIGKILL)
                child.wait()
                rc = None
                stalled = True
                break
        if rc == 0:
            print("[watchdog] training finished")
            return 0
        restarts += 1
        if restarts > args.max_restarts:
            print(f"[watchdog] giving up after {restarts - 1} restarts "
                  f"(last rc={rc}, stalled={stalled})")
            return 1
        print(f"[watchdog] restart {restarts}/{args.max_restarts} "
              f"(rc={rc}, stalled={stalled})", flush=True)
        time.sleep(5)


if __name__ == "__main__":
    sys.exit(main())
