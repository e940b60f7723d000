from parallax_tpu.utils import dbc, pytree  # noqa: F401
from parallax_tpu.utils.pytree import (  # noqa: F401
    static_field,
    tree_get,
    tree_select,
    tree_set,
    tree_stack,
    tree_unstack,
)
