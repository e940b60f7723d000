from parallax_tpu.engine import collider, world  # noqa: F401
from parallax_tpu.engine.world import BodyDef, World, WorldConfig  # noqa: F401
