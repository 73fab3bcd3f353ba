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
    # generous startup grace: on a loaded 1-core host the interpreter can
    # take several seconds to produce its first output; only the silence
    # AFTER "starting" should count toward the 3s stall
    code = supervise([sys.executable, str(script)], str(tmp_path), log,
                     stall_seconds=3, max_restarts=2, poll=0.5, grace_seconds=120)
    assert code == 0
    content = open(log).read()
    assert "starting" in content and "resumed ok" in content


def test_max_restarts(tmp_path):
    log = str(tmp_path / "run.log")
    code = supervise([sys.executable, "-c", "raise SystemExit(3)"], str(tmp_path), log,
                     stall_seconds=60, max_restarts=1, poll=0.2)
    assert code == 1
