#!/usr/bin/env python
"""Aggregate per-plot metric artifacts into per-scene + mean/std CSVs
(reference: summarize_results.py).

Two layouts are understood:
- ours: <base>/plot_*/(results.json from metrics.py)  [method "wheat3dgs"]
- nerfstudio baselines: <base>/plot_*/<method>/<run>/test_results.json
"""

import json
import os
import sys
from argparse import ArgumentParser
from datetime import datetime
from pathlib import Path

import pandas as pd


def _dir_size_mb(path: Path) -> float:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total / 1e6


def collect_ours(base: Path):
    rows = []
    for plot in sorted(p for p in base.iterdir()
                       if p.is_dir() and p.name.startswith("plot_")):
        res = plot / "results.json"
        if not res.exists():
            print(f"results.json not found for {plot.name}")
            continue
        data = json.load(open(res))
        method_key = sorted(data.keys())[-1]   # latest ours_<iteration>
        m = data[method_key]
        pc_dir = plot / "point_cloud"
        rows.append({
            "scene": plot.name, "method": f"wheat3dgs/{method_key}",
            "psnr": m.get("PSNR"), "ssim": m.get("SSIM"),
            "lpips": m.get("LPIPS"),
            "storage_mb": _dir_size_mb(pc_dir) if pc_dir.exists() else None})
    return rows


def collect_nerfstudio(base: Path, method: str):
    rows = []
    for plot in sorted(p for p in base.iterdir()
                       if p.is_dir() and p.name.startswith("plot_")):
        mdir = plot / method
        if not mdir.is_dir():
            print(f"Method {method} not found for {plot.name}")
            continue
        runs = [f for f in mdir.iterdir() if f.is_dir()
                and len(f.name) == 17 and f.name[4] == "-"]
        if not runs:
            continue
        latest = sorted(runs, key=lambda x: datetime.strptime(
            x.name, "%Y-%m-%d_%H%M%S"))[-1]
        tr = latest / "test_results.json"
        if not tr.exists():
            continue
        results = json.load(open(tr))["results"]
        ckpts = list((latest / "nerfstudio_models").glob("*.ckpt")) \
            if (latest / "nerfstudio_models").exists() else []
        rows.append({
            "scene": plot.name, "method": method,
            "psnr": results.get("psnr"), "ssim": results.get("ssim"),
            "lpips": results.get("lpips"), "fps": results.get("fps"),
            "storage_mb": sum(os.path.getsize(c) for c in ckpts) / 1e6
            if ckpts else None})
    return rows


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--base_path", "-b", required=True)
    parser.add_argument("--methods", nargs="*", default=["ours"])
    parser.add_argument("--output_folder", "-o", default=".")
    args = parser.parse_args(argv)
    base = Path(args.base_path)
    out = Path(args.output_folder)
    out.mkdir(parents=True, exist_ok=True)

    all_rows = []
    for method in args.methods:
        rows = collect_ours(base) if method == "ours" else \
            collect_nerfstudio(base, method)
        all_rows += rows
    if not all_rows:
        sys.exit("no results found")
    df = pd.DataFrame(all_rows)
    per_scene = out / "results_per_scene.csv"
    df.to_csv(per_scene, index=False)

    numeric = df.select_dtypes("number").columns
    summary = df.groupby("method")[list(numeric)].agg(["mean", "std"])
    summary_path = out / "results_summary.csv"
    summary.to_csv(summary_path)
    print(df.to_string(index=False))
    print(f"wrote {per_scene} and {summary_path}")


if __name__ == "__main__":
    main()
