"""Roofline attribution from a device trace (round-3 VERDICT #9, #2, #7).

Captures a jax.profiler trace of the batch-minor rollout of ANY plane env
on the real TPU, aggregates device-side op SELF time by phase (the named
scopes ``integrate`` / ``collide`` / ``solve_contacts`` / ``joints`` plus
an "env/other" remainder), and reports each phase against BOTH rooflines:

* **%VPU** (the round-3 missing denominator, VERDICT weak #3): flops come
  from XLA's own ``cost_analysis()`` of each phase compiled standalone at
  the env's real shapes — shape-exact counts of the XLA math, for any env
  (the Pallas solver kernel shares its math 1:1 with the XLA twin
  ``solve_contacts_bm``, which is what gets counted; its one-hot MXU
  matmuls can legitimately exceed the VPU-only ceiling).
* **%HBM**: bytes come from an analytic LOWER bound (live inputs read
  once + outputs written once) derived from the env's own structures —
  body count, PairTable lanes, packed aux rows, obs width — not per-env
  hand constants (VERDICT weak #2/#7).  cost_analysis bytes are NOT used:
  they count logical operand bytes, measured 6-29x above the HBM peak.

Peaks used (TPU v5e, one chip):
    HBM bandwidth  819 GB/s
    VPU f32        ~3.9 TFLOP/s   ((8,128) lanes x 4 ALUs x 0.94 GHz)
    MXU bf16       197 TFLOP/s    (not the relevant ceiling: the physics
                                   step is elementwise/VPU + HBM bound)

    timeout 3000 python tools/roofline.py [batch] [--env lander|robocup|billiards|bouncer]
"""

import collections
import glob
import gzip
import json
import sys
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/parallax_jax_cache")

HBM_PEAK = 819e9  # bytes/s
VPU_PEAK = 3.9e12  # f32 flop/s

PHASES = ("integrate", "collide", "solve_contacts", "joints")


def make_env(name):
    if name == "lander":
        from parallax_tpu.envs.lunar_lander import LunarLander

        return LunarLander()
    if name == "robocup":
        from parallax_tpu.envs.robocup import RoboCup

        return RoboCup()
    if name == "billiards":
        from parallax_tpu.envs.billiards import Billiards

        return Billiards()
    if name == "billiards48":
        from parallax_tpu.envs.billiards import Billiards, BilliardsConfig

        return Billiards(BilliardsConfig(n_object=47))
    if name == "bouncer":
        from parallax_tpu.envs.bouncer import Bouncer

        return Bouncer()
    raise SystemExit(f"unknown --env {name!r} (lander|robocup|billiards|"
                     f"billiards48|bouncer)")


def capture(env, B, inner=200):
    from parallax_tpu.utils.profiling import trace

    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))

    def policy(_, obs):
        return jnp.zeros((obs.shape[0], env.action_size), jnp.float32)

    @jax.jit
    def run(states):
        states, traj = env.rollout_batch(states, policy, inner)
        return states, traj.reward.sum() + traj.obs.sum() + traj.done.sum()

    states, w = run(states)
    jax.block_until_ready(w)

    logdir = "/tmp/parallax_roofline"
    t0 = time.perf_counter()
    with trace(logdir):
        states, w = run(states)
        jax.block_until_ready(w)
    wall = time.perf_counter() - t0
    return logdir, wall, inner


def capture_train(env, B, horizon=100, segments=4):
    """Trace ONE full train step (fwd + bwd + Adam; make_train_step).

    Named phase scopes propagate into the transpose ops, so the per-phase
    totals below include each phase's backward (that is the point: the
    round-4 finding is that the solver's vjp dominates training —
    DESIGN §7d)."""
    import optax

    from parallax_tpu.parallel.rollout import make_train_step
    from parallax_tpu.utils.profiling import trace

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "w1": jax.random.normal(k1, (env.observation_size, 32)) * 0.3,
        "b1": jnp.zeros(32),
        "w2": jax.random.normal(k2, (32, env.action_size)) * 0.1,
        "b2": jnp.zeros(env.action_size),
    }

    def policy(p, obs):
        h = jnp.tanh(obs @ p["w1"] + p["b1"])
        return jnp.tanh(h @ p["w2"] + p["b2"])

    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(params)
    ts = jax.jit(make_train_step(env, policy, optimizer, horizon,
                                 checkpoint_segments=segments))
    states = env.reset_fn_batch(jax.random.split(k3, B))
    params, opt_state, states, m = ts(params, opt_state, states)
    float(jax.device_get(m["loss"]))  # host fetch: see bench.bench_train

    logdir = "/tmp/parallax_roofline_train"
    t0 = time.perf_counter()
    with trace(logdir):
        params, opt_state, states, m = ts(params, opt_state, states)
        float(jax.device_get(m["loss"]))
    wall = time.perf_counter() - t0
    return logdir, wall, horizon


def device_phase_times(logdir):
    """Sum device op SELF time (us) per named-scope phase.

    The device trace's "XLA Ops" track nests container rows (the
    ``jit_*`` module row rides a separate "XLA Modules" thread, but
    ``while.N`` bodies ride XLA Ops enclosing their children), so naive
    duration sums double-count ~2x.  We keep only the XLA Ops thread and
    compute flame-graph self time: each event's duration minus the
    duration of events nested inside it on the same thread."""
    paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device pids: process_name metadata containing "TPU"
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    op_tids = {
        (e["pid"], e.get("tid"))
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "thread_name"
        and e["pid"] in device_pids
        and e.get("args", {}).get("name") == "XLA Ops"
    }
    rows = [
        e
        for e in events
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids
    ]
    # self time via a nesting stack per thread (rows sorted by start,
    # containers before their children at equal start)
    rows.sort(key=lambda e: (e.get("tid"), e["ts"], -e.get("dur", 0)))
    totals = collections.Counter()
    unattributed = collections.Counter()
    stack = []  # (tid, end_ts, child_sum_accumulator index)
    child_sum = {}  # id(event) -> total child duration
    for e in rows:
        ts, dur = e["ts"], e.get("dur", 0)
        while stack and (stack[-1][0] != e.get("tid") or stack[-1][1] <= ts):
            stack.pop()
        if stack:
            child_sum[stack[-1][2]] = child_sum.get(stack[-1][2], 0) + dur
        stack.append((e.get("tid"), ts + dur, id(e)))
    per_phase_ops = collections.defaultdict(collections.Counter)
    for e in rows:
        self_us = e.get("dur", 0) - child_sum.get(id(e), 0)
        if self_us <= 0:
            continue
        blob = e.get("name", "") + json.dumps(e.get("args", {}))
        for ph in PHASES:
            if ph in blob:
                totals[ph] += self_us
                per_phase_ops[ph][e.get("name", "?")] += self_us
                break
        else:
            totals["env/other"] += self_us
            unattributed[e.get("name", "?")] += self_us
    return totals, unattributed, per_phase_ops


def _cost(fn, *args):
    """(flops, bytes) from XLA's cost analysis of fn compiled at args."""
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception as exc:  # pragma: no cover - backend-dependent
        print(f"# cost_analysis unavailable ({exc!r})")
        return 0.0, 0.0


def traffic_model(env, B):
    """Per-step HBM-traffic LOWER bound (bytes) per phase, derived from the
    env's own structures (VERDICT #7: no per-env hand constants): body
    planes from the world's body count, contact lanes from the PairTable,
    aux rows from the env's packed plane aux, obs width from the env.  Each
    phase's live inputs read once + outputs written once; fusion can only
    reduce traffic below per-op sums, never below this bound, so
    achieved-GB/s numbers are conservative (true utilization >= reported).
    """
    import numpy as np

    world = getattr(env, "_bm_world", env.world)
    n = int(world.params.mass.shape[-1])
    C = int(world.table.n_contacts)
    states = jax.eval_shape(
        env.reset_fn_batch,
        jax.ShapeDtypeStruct((B, 2), jnp.uint32),
    )
    aux = jax.eval_shape(lambda st: env.plane_pack(st), states)
    aux_rows = sum(
        int(np.prod(l.shape[:-1]))
        for l in jax.tree_util.tree_leaves(aux)
        if jnp.issubdtype(l.dtype, jnp.floating)
    )
    obs_rows = int(env.observation_size)
    f = 4 * B  # bytes per [*, B] f32 row
    planes = 6 * n
    # joint-free worlds compile the joints phase away entirely: charging it
    # bytes would inflate the conservative TOTAL bound
    has_joints = int(world.joints.n_joints > 0)
    return {
        "integrate": (planes + planes) * f,
        "collide": (planes + aux_rows + 6 * C) * f,
        "solve_contacts": (6 * C + planes + planes) * f,
        "joints": (planes + planes) * f * has_joints,
        # obs/reward/flags/reset merge: planes+aux in, obs+reward+2 flags
        # + merged planes/aux out
        "env/other": (2 * (planes + aux_rows) + obs_rows + 4) * f,
    }


def phase_costs(env, B):
    """Per-phase VPU-flop counts per STEP, compiler-derived: each phase is
    compiled standalone at the env's real shapes and XLA's cost_analysis()
    reports its flops (VERDICT weak #3: the missing denominator under the
    compute-bound claim).  Bytes from cost_analysis are NOT used — they
    count logical operand bytes, not HBM traffic (measured 6-29x above the
    819 GB/s peak) — the analytic lower bound above serves %HBM.
    env/other's flops come from compiling the full step with physics
    swapped for identity (pre/post/obs/watchdog/reset only)."""
    from parallax_tpu.engine.batched import (
        apply_joints_bm,
        collide_batched,
        solve_contacts_bm,
    )

    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))
    ps = env._to_planes(states)
    s, aux = ps.s, ps.aux
    world = getattr(env, "_bm_world", env.world)
    cfg = world.config
    dt = cfg.dt
    gx, gy = cfg.gravity
    mov = jnp.isfinite(world.params.mass).astype(s.vx.dtype)[:, None]

    # the lander reads its per-world terrain planes from aux
    # (envs/lunar_lander.py:_lander_plane_physics); other envs use the
    # world's static part table
    override = None
    ground_parts = getattr(env, "_ground_parts", None)
    if ground_parts is not None and hasattr(aux, "tox"):
        override = {
            p: (aux.tox[i], aux.toy[i]) for i, p in enumerate(ground_parts)
        }

    def integrate(s):
        # bound to physics_core's formulas (engine/batched.py:1061-1078)
        s = s._replace(
            px=s.px + s.vx * dt, py=s.py + s.vy * dt,
            angle=s.angle + s.omega * dt,
        )
        return s._replace(vx=s.vx + gx * dt * mov, vy=s.vy + gy * dt * mov)

    def collide(s):
        return collide_batched(world, s, override)

    con = jax.eval_shape(collide, s)
    con = jax.tree_util.tree_map(lambda a: jnp.zeros(a.shape, a.dtype), con)

    def solve(s, con):
        # the Pallas kernel shares this math 1:1; count the XLA twin
        return solve_contacts_bm(
            world, s, con,
            iterations=cfg.solver_iterations,
            position_iterations=cfg.position_iterations,
            dt=dt, config=cfg.contact,
        )

    def joints(s):
        return apply_joints_bm(world, s)

    def env_only(ps):
        # full step with physics swapped for identity: pre + post + obs +
        # watchdog + auto-reset — exactly the "env/other" remainder
        saved = env.__dict__.get("plane_physics")
        env.plane_physics = lambda s, aux: (s, con)
        try:
            actions = jnp.zeros((B, env.action_size), jnp.float32)
            return env._step_planes(ps, actions)
        finally:
            if saved is None:
                env.__dict__.pop("plane_physics", None)
            else:
                env.plane_physics = saved

    costs = {}
    costs["integrate"] = _cost(integrate, s)[0]
    costs["collide"] = _cost(collide, s)[0]
    costs["solve_contacts"] = _cost(solve, s, con)[0]
    costs["joints"] = _cost(joints, s)[0]
    costs["env/other"] = _cost(env_only, ps)[0]
    return costs


def main():
    args = [a for a in sys.argv[1:]]
    env_name = "lander"
    if "--env" in args:
        i = args.index("--env")
        if i + 1 >= len(args):
            raise SystemExit("--env needs a value: lander|robocup|billiards|"
                             "billiards48|bouncer")
        env_name = args[i + 1]
        del args[i : i + 2]
    train = "--train" in args
    if train:
        args.remove("--train")
    B = int(args[0]) if args else 8192

    env = make_env(env_name)

    if train:
        # TRAIN-step attribution: device self-time per phase across one
        # fwd+bwd+Adam step (horizon 100, 4 segments — the bench --train
        # program).  No flop/byte rooflines here: each phase mixes its
        # forward, its remat replay and its transpose.
        logdir, wall, horizon = capture_train(env, B)
        totals, unattributed, _ = device_phase_times(logdir)
        tot = sum(totals.values())
        if tot == 0:
            raise SystemExit("no TPU device events in the trace")
        print(f"# TRAIN env={env_name} B={B} h={horizon}, wall {wall:.2f}s, "
              f"device busy {tot / 1e6:.3f}s")
        print(f"{'phase (fwd+bwd)':<18}{'ms/trainstep':>14}{'share':>8}")
        for ph in list(PHASES) + ["env/other"]:
            us = totals.get(ph, 0)
            if us:
                print(f"{ph:<18}{us / 1e3:>14.2f}{100 * us / tot:>7.1f}%")
        print(f"{'TOTAL':<18}{tot / 1e3:>14.2f}")
        print(f"# {B * horizon / (tot / 1e6) / 1e6:.2f}M train env-steps/s "
              f"device-side")
        top = unattributed.most_common(30)
        print("# top unattributed ops:",
              ", ".join(f"{n} ({d / 1e3:.2f}ms)" for n, d in top))
        return
    flops = phase_costs(env, B)
    model = traffic_model(env, B)
    logdir, wall, inner = capture(env, B)
    totals, unattributed, per_phase_ops = device_phase_times(logdir)

    dev_total_us = sum(totals.values())
    if dev_total_us == 0:
        raise SystemExit(
            "no events matched a TPU device pid in the trace — backend was "
            "not TPU, or the trace's process_name rows use a different label"
        )
    print(f"# env={env_name} B={B}, {inner} steps traced, wall {wall:.2f}s, "
          f"device busy {dev_total_us / 1e6:.3f}s "
          f"({dev_total_us / 1e4 / wall:.1f}% of wall)")
    print(f"{'phase':<16}{'us/step':>10}{'GB/s (>=)':>11}{'% HBM':>8}"
          f"{'GFLOP/s':>10}{'% VPU':>8}")
    tot_fl = tot_by = 0.0
    for ph in list(PHASES) + ["env/other"]:
        us = totals.get(ph, 0) / inner
        fl = flops.get(ph, 0.0)
        by = model.get(ph, 0.0)
        tot_fl += fl
        tot_by += by
        if us == 0:
            print(f"{ph:<16}{'—':>10}")
            continue
        gbs = by / (us * 1e-6) / 1e9
        gfs = fl / (us * 1e-6) / 1e9
        print(f"{ph:<16}{us:>10.2f}{gbs:>11.1f}"
              f"{100 * gbs * 1e9 / HBM_PEAK:>7.1f}%"
              f"{gfs:>10.1f}{100 * gfs * 1e9 / VPU_PEAK:>7.1f}%")
    step_us = dev_total_us / inner
    print(f"{'TOTAL':<16}{step_us:>10.2f}"
          f"{tot_by / (step_us * 1e-6) / 1e9:>11.1f}"
          f"{100 * tot_by / (step_us * 1e-6) / HBM_PEAK:>7.1f}%"
          f"{tot_fl / (step_us * 1e-6) / 1e9:>10.1f}"
          f"{100 * tot_fl / (step_us * 1e-6) / VPU_PEAK:>7.1f}%")
    print(f"# throughput {B / (step_us * 1e-6) / 1e6:.1f}M "
          f"env-steps/s device-side at B={B}")
    print("# solve_contacts runs as the Pallas kernel on device: its flops "
          "are the XLA twin's count, and one-hot MXU matmuls put its "
          "GFLOP/s above the pure-VPU ceiling by design")
    for ph in list(PHASES) + ["env/other"]:
        ops = per_phase_ops.get(ph)
        if ops:
            top = ops.most_common(15)
            print(f"# {ph} top ops:",
                  ", ".join(f"{n} ({d / inner:.1f}us)" for n, d in top))
    if unattributed:
        top = unattributed.most_common(25)
        print("# top unattributed ops:",
              ", ".join(f"{n} ({d / inner:.2f}us/step)" for n, d in top))


if __name__ == "__main__":
    main()
