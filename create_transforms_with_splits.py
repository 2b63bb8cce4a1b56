#!/usr/bin/env python
"""Annotate a nerfstudio transforms.json with train/val/test filename lists
(val == test, wheat cam-id > 10 rule).

CLI- and artifact-compatible with the reference tool
(create_transforms_with_splits.py:91-96): `--transforms_json` input,
`--output_suffix` naming (writes `<stem><suffix>.json` next to the input
rather than overwriting it); `--output` overrides the full output path.
"""

import copy
import json
from argparse import ArgumentParser
from pathlib import Path

from create_train_test_jsons import cam_id_of


def add_split_lists(transforms_json_path: str, output_suffix: str =
                    "_with_splits", output_path: str = None):
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
    if output_path is None:
        p = Path(transforms_json_path)
        output_path = str(p.parent / f"{p.stem}{output_suffix}{p.suffix}")
    with open(output_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"Total frames: {len(frames)}")
    print(f"Training frames: {len(i_train)}, camera IDs <= 10")
    print(f"Validation frames: {len(i_test)}, camera IDs > 10")
    print(f"Testing frames: {len(i_test)}, camera IDs > 10")
    print(f"\nModified transforms.json saved to: {output_path}")
    return output_path


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("transforms_json_pos", nargs="?", default=None,
                        help="positional convenience alias")
    parser.add_argument("--transforms_json", default=None,
                        help="Path to the transforms.json file")
    parser.add_argument("--output_suffix", default="_with_splits",
                        help="Suffix for output filename")
    parser.add_argument("--output", default=None,
                        help="explicit output path (overrides the suffix)")
    a = parser.parse_args()
    path = a.transforms_json or a.transforms_json_pos
    if not path:
        parser.error("--transforms_json is required")
    add_split_lists(path, a.output_suffix, a.output)
