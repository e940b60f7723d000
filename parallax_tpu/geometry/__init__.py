from parallax_tpu.geometry import math  # noqa: F401
from parallax_tpu.geometry.math import (  # noqa: F401
    Transform2,
    cross2,
    fast_normal,
    is_point_in_triangle,
    order_clockwise,
    perpendicular_vector,
    random_direction,
    rotate,
)
