from .flashsplat import (alpha_views, apply_pts_filter, lift_view,  # noqa: F401
                         multi_instance_opt)
from .pipeline import (SegContext, find_match, lift_counts,  # noqa: F401
                       reset_label, run_segmentation)
