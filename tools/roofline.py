"""Roofline attribution from a device trace (round-3 VERDICT #9).

Captures a jax.profiler trace of the batch-minor LunarLander rollout on
the real TPU, aggregates device-side op durations by phase (the named
scopes ``integrate`` / ``collide`` / ``solve_contacts`` / ``joints`` plus
an "env/other" remainder), and reports each phase's achieved HBM
bandwidth against the v5e roofline, from an analytic lower bound on the
phase's HBM traffic.

Peaks used (TPU v5e, one chip):
    HBM bandwidth  819 GB/s
    VPU f32        ~3.9 TFLOP/s   ((8,128) lanes x 4 ALUs x 0.94 GHz)
    MXU bf16       197 TFLOP/s    (not the relevant ceiling: the physics
                                   step is elementwise/VPU + HBM bound)

The HBM-traffic model is a LOWER bound: each phase's live inputs read
once + outputs written once.  Fusion can only reduce traffic below the
sum of per-op traffic, never below this bound, so achieved-GB/s numbers
are conservative (true utilization >= reported).

    timeout 3000 python tools/roofline.py [batch]
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
    for e in rows:
        self_us = e.get("dur", 0) - child_sum.get(id(e), 0)
        if self_us <= 0:
            continue
        blob = e.get("name", "") + json.dumps(e.get("args", {}))
        for ph in PHASES:
            if ph in blob:
                totals[ph] += self_us
                break
        else:
            totals["env/other"] += self_us
            unattributed[e.get("name", "?")] += self_us
    return totals, unattributed


def lander_traffic_model(B):
    """Per-step HBM-traffic lower bound (bytes) per phase, lander world.

    n=4 bodies, C=48 contact lanes (pp manifolds), 7 terrain parts x 8
    vertex rows; every plane is f32 [rows, B]."""
    f = 4 * B  # bytes per [*, B] row
    planes = 6 * 4  # px/py/vx/vy/angle/omega x n=4 bodies
    terrain = 7 * 8 * 2  # x+y vertex rows
    C = 48
    return {
        "integrate": (planes + planes) * f,  # read + write state planes
        "collide": (planes + terrain + 6 * C) * f,  # state+terrain -> lanes
        "solve_contacts": (6 * C + planes + planes) * f,  # lanes+state -> state
        "joints": (planes + planes) * f,
        "env/other": (planes + terrain + 2 + 9 + 2) * f,  # obs/reward/reset
    }


def main():
    from parallax_tpu.envs.lunar_lander import LunarLander

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    env = LunarLander()
    logdir, wall, inner = capture(env, B)
    totals, unattributed = device_phase_times(logdir)
    model = lander_traffic_model(B)

    dev_total_us = sum(totals.values())
    if dev_total_us == 0:
        raise SystemExit(
            "no events matched a TPU device pid in the trace — backend was "
            "not TPU, or the trace's process_name rows use a different label"
        )
    print(f"# B={B}, {inner} steps traced, wall {wall:.2f}s, "
          f"device busy {dev_total_us / 1e6:.3f}s "
          f"({dev_total_us / 1e4 / wall:.1f}% of wall)")
    print(f"{'phase':<16}{'us/step':>10}{'GB/s (>=)':>12}{'% HBM peak':>12}")
    for ph in list(PHASES) + ["env/other"]:
        us = totals.get(ph, 0) / inner
        if us == 0:
            print(f"{ph:<16}{'—':>10}")
            continue
        gbs = model[ph] / (us * 1e-6) / 1e9
        print(f"{ph:<16}{us:>10.2f}{gbs:>12.1f}{100 * gbs * 1e9 / HBM_PEAK:>11.1f}%")
    step_us = dev_total_us / inner
    total_bytes = sum(model.values())
    print(f"{'TOTAL':<16}{step_us:>10.2f}"
          f"{total_bytes / (step_us * 1e-6) / 1e9:>12.1f}"
          f"{100 * total_bytes / (step_us * 1e-6) / HBM_PEAK:>11.1f}%")
    print(f"# throughput {B / (step_us * 1e-6) / 1e6:.1f}M "
          f"env-steps/s device-side at B={B}")
    if unattributed:
        top = unattributed.most_common(5)
        print("# top unattributed ops:",
              ", ".join(f"{n} ({d / inner:.1f}us/step)" for n, d in top))


if __name__ == "__main__":
    main()
