from parallax_tpu.utils import dbc, metrics, pytree  # noqa: F401
from parallax_tpu.utils.metrics import (  # noqa: F401
    contact_metrics,
    contact_metrics_bm,
    log_metrics,
    set_debug_logging,
    timestep_metrics,
)
from parallax_tpu.utils.pytree import (  # noqa: F401
    static_field,
    tree_get,
    tree_select,
    tree_set,
    tree_stack,
    tree_unstack,
)
