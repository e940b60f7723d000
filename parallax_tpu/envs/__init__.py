from parallax_tpu.envs import base, billiards, bouncer, lunar_lander, plane_env, robocup  # noqa: F401
from parallax_tpu.envs.billiards import Billiards, BilliardsConfig  # noqa: F401
from parallax_tpu.envs.bouncer import Bouncer, BouncerConfig  # noqa: F401
from parallax_tpu.envs.base import (  # noqa: F401
    ConstantControl,
    Control,
    Environment,
    Judge,
    PolicyControl,
    TimeStep,
    evaluate,
)
from parallax_tpu.envs.lunar_lander import LanderConfig, LunarLander  # noqa: F401
from parallax_tpu.envs.plane_env import PlaneEnvMixin, PlaneState  # noqa: F401
from parallax_tpu.envs.robocup import RoboCup, RoboCupConfig  # noqa: F401
