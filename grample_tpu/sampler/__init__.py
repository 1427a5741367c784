from grample_tpu.sampler.collapse import (  # noqa: F401
    NEIGHBOR_VAR_MAX,
    CollapseError,
    collapse_var,
    collapsible_vars,
    is_collapsible,
    pick_random_collapsible,
)
from grample_tpu.sampler.chains import ChainGroup  # noqa: F401
