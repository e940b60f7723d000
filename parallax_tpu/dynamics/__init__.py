from parallax_tpu.dynamics import bodies, impulses, integrator, joints, solver  # noqa: F401
from parallax_tpu.dynamics.bodies import BodyParams, BodyState  # noqa: F401
from parallax_tpu.dynamics.impulses import ContactSolverConfig  # noqa: F401
from parallax_tpu.dynamics.joints import Joints  # noqa: F401
