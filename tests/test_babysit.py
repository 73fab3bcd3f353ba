"""Supervisor behavior: completion passthrough, stall kill + resume flag."""

import os
import sys

from tools.babysit import supervise


def test_completion_passthrough(tmp_path):
    log = str(tmp_path / "run.log")
    code = supervise([sys.executable, "-c", "print('done')"], str(tmp_path), log,
                     stall_seconds=60, max_restarts=1, poll=0.2)
    assert code == 0
    assert "done" in open(log).read()


def test_stall_detection_and_resume_flag(tmp_path):
    """A script that hangs silently on first launch and completes when
    --resume is passed (simulating checkpoint recovery)."""
    log = str(tmp_path / "run.log")
    script = tmp_path / "fake_train.py"
    script.write_text(
        "import sys, time\n"
        "if '--resume' in sys.argv:\n"
        "    print('resumed ok', flush=True)\n"
        "    sys.exit(0)\n"
        "print('starting', flush=True)\n"
        "time.sleep(3600)\n"
    )
    # small startup grace keeps the test fast: the grace window is
    # time-based (first N seconds after launch), after which the 3s stall
    # budget kills the silent hang
    code = supervise([sys.executable, str(script)], str(tmp_path), log,
                     stall_seconds=3, max_restarts=2, poll=0.5, grace_seconds=6)
    assert code == 0
    content = open(log).read()
    assert "starting" in content and "resumed ok" in content


def test_max_restarts(tmp_path):
    # rc=7: a genuine failure (rc=3 is the voluntary-recycle code and does
    # not consume the restart budget — covered below)
    log = str(tmp_path / "run.log")
    code = supervise([sys.executable, "-c", "raise SystemExit(7)"], str(tmp_path), log,
                     stall_seconds=60, max_restarts=1, poll=0.2)
    assert code == 1


def test_recycle_rc3_does_not_consume_restart_budget(tmp_path):
    """A run that voluntarily recycles (rc=3, max_steps_per_run) any number
    of times must be relaunched with --resume and NOT count as a failure —
    max_restarts=0 still reaches completion."""
    log = str(tmp_path / "run.log")
    marker = tmp_path / "count.txt"
    script = tmp_path / "fake_train.py"
    script.write_text(
        "import os, sys\n"
        f"p = {str(marker)!r}\n"
        "n = int(open(p).read()) if os.path.exists(p) else 0\n"
        "open(p, 'w').write(str(n + 1))\n"
        "print('launch', n, 'resume=' + str('--resume' in sys.argv), flush=True)\n"
        "sys.exit(3 if n < 2 else 0)\n"
    )
    code = supervise([sys.executable, str(script)], str(tmp_path), log,
                     stall_seconds=60, max_restarts=0, poll=0.2)
    assert code == 0
    content = open(log).read()
    assert "launch 0 resume=False" in content
    assert "launch 1 resume=True" in content  # relaunches carry --resume
    assert "launch 2 resume=True" in content
