"""Wheat-head morphology / phenotyping (reference: wheatheadsmorphology/).

Host/CPU package (numpy/scipy/sklearn): per-head point clouds -> structural
traits (length, width, volume, curvature, inclination) + bounding boxes +
inspection PLY. open3d and the external hdbscan package are replaced with
scipy Qhull / PCA boxes and sklearn's HDBSCAN."""

from .pipeline import run_pipeline  # noqa: F401
from .traits import compute_traits  # noqa: F401
from .pcp_utils import (main_cluster_extraction,  # noqa: F401
                        statistical_outlier_removal, subsample_pcd)
from .bbox import (extract_bounding_box, load_bounding_boxes,  # noqa: F401
                   points_in_bbox, save_bounding_boxes)
from .config import MorphologyConfig, load_config  # noqa: F401
