"""Forced-failure tests of bench.py's probe/retry shell (VERDICT r2 #1).

BENCH_r02.json is a stack trace because one transient axon backend-init
failure killed the bench outright.  These tests drive `wait_for_backend`
and `resilient_main` with injected probes/clocks — no TPU, no sleeping —
and pin: backoff schedule, deadline exhaustion, recovery mid-schedule, and
child-failure retry.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import bench  # noqa: E402


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def sleep(self, s):
        self.t += s
        self.slept.append(s)

    slept: list


def make_clock():
    c = FakeClock()
    c.slept = []
    return c


def test_probe_success_first_try_no_sleep():
    clock = make_clock()
    attempts = bench.wait_for_backend(
        probe=lambda: True, _sleep=clock.sleep, _clock=clock
    )
    assert attempts == 1
    assert clock.slept == []


def test_backoff_schedule_then_recovery():
    clock = make_clock()
    calls = {"n": 0}

    def probe():
        calls["n"] += 1
        return calls["n"] >= 4  # fails 3x, recovers on the 4th

    attempts = bench.wait_for_backend(
        probe=probe, max_wait=600.0, _sleep=clock.sleep, _clock=clock
    )
    assert attempts == 4
    # exponential backoff from the documented schedule
    assert clock.slept == [15.0, 30.0, 60.0]


def test_deadline_exhaustion_raises():
    clock = make_clock()
    with pytest.raises(RuntimeError, match="unavailable"):
        bench.wait_for_backend(
            probe=lambda: False, max_wait=600.0, _sleep=clock.sleep, _clock=clock
        )
    # never sleeps past the budget: total sleep <= max_wait
    assert sum(clock.slept) <= 600.0
    # the last sleep is clamped so the loop terminates exactly at the deadline
    assert clock.t == 600.0


def test_resilient_main_retries_failed_child():
    clock = make_clock()
    child_rcs = iter([1, 0])  # first child dies (tunnel dropped mid-run)

    rc = bench.resilient_main(
        run_child=lambda: next(child_rcs),
        probe=lambda: True,
        _sleep=clock.sleep,
        _clock=clock,
    )
    assert rc == 0


def test_resilient_main_gives_up_after_max_attempts():
    clock = make_clock()
    n = {"children": 0}

    def run_child():
        n["children"] += 1
        return 124  # hung child, killed every time

    rc = bench.resilient_main(
        run_child=run_child, probe=lambda: True, max_attempts=3,
        _sleep=clock.sleep, _clock=clock,
    )
    assert rc == 124
    assert n["children"] == 3


def test_resilient_main_probe_never_recovers():
    clock = make_clock()
    rc = bench.resilient_main(
        run_child=lambda: pytest.fail("child must not run without a live backend"),
        probe=lambda: False,
        max_wait=600.0,
        _sleep=clock.sleep,
        _clock=clock,
    )
    assert rc == 1


def test_arg_parsing():
    args = bench._parse_args(["--batch", "4096"])
    assert args.batch == 4096
    with pytest.raises(SystemExit):
        bench._parse_args(["--batch"])  # flag without a value
    with pytest.raises(SystemExit):
        bench._parse_args(["--sweep", "--batch", "4096"])  # conflicting


def test_arg_parsing_train():
    args = bench._parse_args(["--train", "--all"])
    assert args.train and args.all
    with pytest.raises(SystemExit):
        bench._parse_args(["--sweep", "--train"])  # mutually exclusive


def test_bench_train_smoke():
    """bench_train runs the real make_train_step path end-to-end (tiny
    shapes) and emits a driver-format record."""
    from parallax_tpu.envs.lunar_lander import LunarLander

    rec = bench.bench_train(LunarLander(), "lander", batch=8, horizon=8,
                            chain=1)
    assert rec["metric"] == "lander_train_env_steps_per_sec_per_chip_batch8_h8"
    assert rec["unit"] == "env-steps/s"
    assert rec["value"] > 0
    assert rec["vs_baseline"] == round(rec["value"] / bench.TARGET, 4)
