#!/usr/bin/env python
"""Split a nerfstudio transforms.json into train/test files using the wheat
camera rule (cam id > 10 => test; reference: create_train_test_jsons.py)."""

import copy
import json
import os
import re
from argparse import ArgumentParser
from pathlib import Path


def cam_id_of(file_path: str) -> int:
    """Extract the camera index from names like ..._cam_12.png or
    plot_000_12.png; 0 if none found."""
    name = Path(file_path).name
    m = re.search(r"cam_(\d+)", name)
    if m:
        return int(m.group(1))
    m = re.search(r"_(\d+)\.[a-zA-Z]+$", name)
    return int(m.group(1)) if m else 0


def create_train_test_splits(transforms_json_path: str,
                             output_prefix: str = ""):
    with open(transforms_json_path) as f:
        data = json.load(f)
    train = copy.deepcopy(data)
    test = copy.deepcopy(data)
    train["frames"] = [fr for fr in data.get("frames", [])
                       if cam_id_of(fr["file_path"]) <= 10]
    test["frames"] = [fr for fr in data.get("frames", [])
                      if cam_id_of(fr["file_path"]) > 10]
    base = output_prefix or os.path.dirname(transforms_json_path)
    train_path = os.path.join(base, "transforms_train.json")
    test_path = os.path.join(base, "transforms_test.json")
    with open(train_path, "w") as f:
        json.dump(train, f, indent=2)
    with open(test_path, "w") as f:
        json.dump(test, f, indent=2)
    print(f"{len(train['frames'])} train / {len(test['frames'])} test frames")
    return train_path, test_path


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("transforms_json")
    parser.add_argument("--output_prefix", default="")
    a = parser.parse_args()
    create_train_test_splits(a.transforms_json, a.output_prefix)
