"""parallax_tpu — TPU-native, batched, differentiable 2D rigid-body physics
and RL environments.

A ground-up JAX/XLA rebuild of the capabilities of ``cotix``
(DelftMercurians/Parallax): support-function convex shapes, GJK/EPA and
analytic narrow phase, impulse-based contact resolution with restitution /
friction / Baumgarte stabilization, spring-damper joints, continuous-time
control/judge environment semantics, and the LunarLander / RoboCup SSL
environments — all as one fused, branchless, fixed-shape program that steps
thousands of worlds per device and shards over a multi-host TPU mesh.

Layer map (bottom-up):

* ``geometry``  — shapes, supports, GJK/EPA/SAT narrow phase, contacts
* ``dynamics``  — SoA body state, integrators, impulses, contact/joint solvers
* ``engine``    — World: one jitted step over (bodies x contacts x joints)
* ``envs``      — env API (reset/step/rollout, auto-reset), Control/Judge
                  continuous-time evaluation, LunarLander, RoboCup
* ``parallel``  — mesh construction, batch sharding, multi-host rollouts
* ``ops``       — Pallas TPU kernels for the hot paths
* ``utils``     — pytrees, contracts, checkpointing, metrics
"""

__version__ = "0.1.0"

from parallax_tpu import geometry, utils  # noqa: F401
