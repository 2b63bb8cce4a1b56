#!/usr/bin/env python
"""Resilient run_3d_seg launcher: stall auto-restart on top of the seg
pipeline's loop-state checkpointing (seg/pipeline.py::run_segmentation
resume=True).

The remote-TPU attachment can wedge mid-run (a blocked transfer hangs the
host thread forever — observed twice on 2026-08-20); this wrapper watches
the artifact tree's loop_state.npz mtime and kills + relaunches the child,
which resumes from the last consistent checkpoint.

Usage: python scripts/seg_watchdog.py --base <model>/wheat-head/<exp>
           [--stall_s 1500] [--max_restarts 8] -- <cmd...>
"""
import argparse
import os
import signal
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True,
                    help="artifact dir containing loop_state.npz")
    ap.add_argument("--stall_s", type=float, default=1500.0)
    ap.add_argument("--max_restarts", type=int, default=8)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- <command to run>")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    assert cmd, "pass the seg command after --"
    ckpt = os.path.join(args.base, "loop_state.npz")

    restarts = 0
    while True:
        child = subprocess.Popen(cmd)
        start_ts = time.time()
        print(f"[seg-watchdog] child pid {child.pid}", flush=True)
        stalled = False
        while True:
            try:
                rc = child.wait(timeout=30)
                break
            except subprocess.TimeoutExpired:
                pass
            try:
                mtime = os.path.getmtime(ckpt)
            except OSError:
                mtime = 0.0
            age = time.time() - max(mtime, start_ts)
            if age > args.stall_s:
                print(f"[seg-watchdog] checkpoint stale {age:.0f}s > "
                      f"{args.stall_s:.0f}s: killing {child.pid}",
                      flush=True)
                child.send_signal(signal.SIGKILL)
                child.wait()
                rc, stalled = None, True
                break
        if rc == 0:
            print("[seg-watchdog] done")
            return 0
        restarts += 1
        if restarts > args.max_restarts:
            print(f"[seg-watchdog] giving up after {restarts - 1} restarts")
            return 1
        print(f"[seg-watchdog] restart {restarts}/{args.max_restarts} "
              f"(rc={rc}, stalled={stalled})", flush=True)
        time.sleep(5)


if __name__ == "__main__":
    sys.exit(main())
