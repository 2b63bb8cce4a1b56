#!/usr/bin/env python
"""Split a nerfstudio transforms.json into train/test files using the wheat
camera rule (cam id > 10 => test).

CLI- and artifact-compatible with the reference tool
(create_train_test_jsons.py:118-123): `--transforms_json` input,
`--output_prefix` naming, and a third `split.json`
({"train": [...], "test": [...]}) for nerfstudio's --data.split-path.
"""

import copy
import json
import re
from argparse import ArgumentParser
from pathlib import Path


def cam_id_of(file_path: str) -> int:
    """Extract the camera index from names like ..._cam_12.png; falls back
    to the trailing _<n> group (our synthetic plots' naming), 0 if none."""
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
    parent = Path(transforms_json_path).parent
    if output_prefix:
        train_path = f"{output_prefix}_train.json"
        test_path = f"{output_prefix}_test.json"
        split_path = f"{output_prefix}_split.json"
    else:
        train_path = str(parent / "transforms_train.json")
        test_path = str(parent / "transforms_test.json")
        split_path = str(parent / "split.json")
    with open(train_path, "w") as f:
        json.dump(train, f, indent=2)
    with open(test_path, "w") as f:
        json.dump(test, f, indent=2)
    with open(split_path, "w") as f:
        json.dump({"train": [fr["file_path"] for fr in train["frames"]],
                   "test": [fr["file_path"] for fr in test["frames"]]},
                  f, indent=2)
    print(f"{len(train['frames'])} train / {len(test['frames'])} test frames")
    print(f"Train JSON saved to: {train_path}")
    print(f"Test JSON saved to: {test_path}")
    print(f"Split JSON saved to: {split_path}")
    return {"train_path": train_path, "test_path": test_path,
            "split_path": split_path, "num_train": len(train["frames"]),
            "num_test": len(test["frames"])}


if __name__ == "__main__":
    parser = ArgumentParser(
        description="Create train and test splits for Nerfstudio")
    parser.add_argument("transforms_json_pos", nargs="?", default=None,
                        help="positional convenience alias")
    parser.add_argument("--transforms_json", default=None,
                        help="Path to the transforms.json file")
    parser.add_argument("--output_prefix", default="",
                        help="Prefix for output filenames "
                             "(default: same directory as input)")
    a = parser.parse_args()
    path = a.transforms_json or a.transforms_json_pos
    if not path:
        parser.error("--transforms_json is required")
    create_train_test_splits(path, a.output_prefix)
