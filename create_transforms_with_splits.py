#!/usr/bin/env python
"""Annotate a nerfstudio transforms.json with train/val/test filename lists
in place (reference: create_transforms_with_splits.py — val == test, wheat
cam-id > 10 rule)."""

import copy
import json
from argparse import ArgumentParser

from create_train_test_jsons import cam_id_of


def add_split_lists(transforms_json_path: str, output_path: str = None):
    with open(transforms_json_path) as f:
        data = json.load(f)
    frames = data.get("frames", [])
    ids = [cam_id_of(fr["file_path"]) for fr in frames]
    i_train = [i for i, v in enumerate(ids) if v <= 10]
    i_test = [i for i, v in enumerate(ids) if v > 10]
    assert len(frames) == len(i_train) + len(i_test)
    out = copy.deepcopy(data)
    out["train_filenames"] = [frames[i]["file_path"] for i in i_train]
    out["val_filenames"] = [frames[i]["file_path"] for i in i_test]
    out["test_filenames"] = [frames[i]["file_path"] for i in i_test]
    output_path = output_path or transforms_json_path
    with open(output_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {output_path}: {len(i_train)} train / {len(i_test)} test")
    return output_path


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("transforms_json")
    parser.add_argument("--output", default=None)
    a = parser.parse_args()
    add_split_lists(a.transforms_json, a.output)
