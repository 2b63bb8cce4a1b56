"""YAML + pydantic config for the morphology pipeline (reference:
wheatheadsmorphology/main.py:29-141)."""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Literal, Union

from pydantic import BaseModel, DirectoryPath, StrictInt, field_validator


class MorphologyConfig(BaseModel):
    data_folder: DirectoryPath
    output_folder: DirectoryPath
    file_format: Literal["ply", "txt"]
    subsampling_threshold: StrictInt
    clusterer_definition: Dict[str, Any]
    sor_parameters: Dict[str, Any]
    splines_smoothing_value: Union[int, float]
    distance_percentile: Union[int, float]
    get_bboxes: bool
    get_processed_pcd: bool

    @field_validator("clusterer_definition")
    @classmethod
    def _check_clusterer(cls, v):
        if v.get("type") not in ("dbscan", "hdbscan"):
            raise ValueError('clusterer_definition.type must be "dbscan" or '
                             '"hdbscan"')
        if v["type"] == "dbscan" and not isinstance(
                v.get("epsilon"), (int, float)):
            raise ValueError("dbscan needs a numeric epsilon")
        if v["type"] == "hdbscan":
            if not isinstance(v.get("min_cluster_size"), int):
                raise ValueError("hdbscan needs int min_cluster_size")
            if not isinstance(v.get("epsilon_hdbscan"), (int, float)):
                raise ValueError("hdbscan needs numeric epsilon_hdbscan")
        if not isinstance(v.get("min_samples"), int):
            raise ValueError("min_samples must be an int")
        return v

    @field_validator("sor_parameters")
    @classmethod
    def _check_sor(cls, v):
        if not isinstance(v.get("k"), int):
            raise ValueError('sor_parameters must include int "k"')
        if not isinstance(v.get("std_ratio"), (int, float)):
            raise ValueError('sor_parameters must include numeric "std_ratio"')
        return v

    @field_validator("distance_percentile")
    @classmethod
    def _check_percentile(cls, v):
        if not 1 <= float(v) <= 100:
            raise ValueError("distance_percentile must be in [1, 100]")
        return v


def load_config(config_path) -> MorphologyConfig:
    """Read YAML, resolve paths relative to the config file, validate."""
    import yaml

    config_path = Path(config_path).resolve()
    raw = yaml.safe_load(config_path.read_text())
    base = config_path.parent
    if "data_folder" in raw:
        raw["data_folder"] = (
            base / os.path.expandvars(str(raw["data_folder"]))).resolve()
    if "output_folder" in raw:
        out = (base / os.path.expandvars(str(raw["output_folder"]))).resolve()
        os.makedirs(out, exist_ok=True)
        raw["output_folder"] = out
    return MorphologyConfig(**raw)
