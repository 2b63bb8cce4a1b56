from .gaussians import (GaussianParams, GaussianState,  # noqa: F401
                        add_densification_stats, create_from_pcd,
                        densify_and_prune, grow_capacity, init_state,
                        prune_mask, reset_opacity)
from .optim import AdamState, adam_init, adam_step  # noqa: F401
