"""Stall-watching training supervisor (failure detection + elastic recovery).

The reference has no failure handling beyond resume-from-checkpoint
(SURVEY.md §5.3); on this TPU platform long runs can stall on transient
device-tunnel hiccups (the process sleeps forever on a device op). This
supervisor launches a training command, watches its log file for progress,
and on stall kills the process and relaunches it with ``--resume`` pointing
at the run's store directory — the drivers' checkpoint-per-validation/epoch
makes that lossless up to the last check.

Usage::

    python -m tools.babysit --store_dir runs/<name> --stall_seconds 420 \
        --max_restarts 5 -- python -m imbalanced_regression_tpu.tasks.stsb ...

The training command is everything after ``--``. On restart the supervisor
appends ``--resume <store_dir>`` (deduplicated).
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def _mtime(path: str) -> float:
    try:
        return os.path.getmtime(path)
    except OSError:
        return 0.0


def supervise(cmd: list[str], store_dir: str, log_file: str, stall_seconds: int,
              max_restarts: int, poll: float = 10.0,
              grace_seconds: int | None = None) -> int:
    """Run ``cmd``, restarting with ``--resume`` on stalls/crashes.

    ``grace_seconds`` is the silence budget during each launch's startup
    window (interpreter start + device attach + jit compile can be
    legitimately silent for many minutes on TPU — a post-OOM re-attach was
    measured at >15 min); the tighter ``stall_seconds`` applies only once
    the startup window has passed. Defaults to ``max(stall_seconds, 1500)``.

    The startup window is TIME-based (first ``grace_seconds`` after launch),
    not first-output-based: the platform prints an early banner long before
    the attach hang, which would otherwise flip the budget to
    ``stall_seconds`` right before the silent window it exists to cover."""
    if grace_seconds is None:
        grace_seconds = max(stall_seconds, 1500)
    restarts = 0
    launches = 0
    while True:
        run_cmd = list(cmd)
        if launches > 0 and "--resume" not in run_cmd:
            run_cmd += ["--resume", store_dir]
        print(f"[babysit] launch (restart {restarts}): {' '.join(run_cmd)}", flush=True)
        launches += 1
        with open(log_file, "ab") as log_fh:
            proc = subprocess.Popen(run_cmd, stdout=log_fh, stderr=subprocess.STDOUT)
            launch_time = time.time()
            last_progress = launch_time
            last_size = os.path.getsize(log_file) if os.path.exists(log_file) else 0
            while True:
                code = proc.poll()
                if code is not None:
                    if code == 0:
                        print("[babysit] run completed", flush=True)
                        return 0
                    if code == 3:
                        # voluntary supervised recycle (max_steps_per_run):
                        # relaunch without consuming the failure budget
                        print("[babysit] run recycled itself (rc=3), relaunching",
                              flush=True)
                        restarts -= 1
                    else:
                        print(f"[babysit] run exited with {code}", flush=True)
                    break
                size = os.path.getsize(log_file) if os.path.exists(log_file) else 0
                if size != last_size:
                    last_size = size
                    last_progress = time.time()
                in_startup = time.time() - launch_time < grace_seconds
                threshold = grace_seconds if in_startup else stall_seconds
                if time.time() - last_progress > threshold:
                    print(f"[babysit] stall detected (> {threshold}s silent), killing",
                          flush=True)
                    proc.send_signal(signal.SIGTERM)
                    try:
                        proc.wait(timeout=20)
                    except subprocess.TimeoutExpired:
                        proc.kill()
                        proc.wait()
                    break
                time.sleep(poll)
        restarts += 1
        if restarts > max_restarts:
            print("[babysit] max restarts exceeded", flush=True)
            return 1


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" not in argv:
        raise SystemExit("usage: babysit [opts] -- <training command...>")
    split = argv.index("--")
    parser = argparse.ArgumentParser()
    parser.add_argument("--store_dir", required=True, help="run store dir (for --resume)")
    parser.add_argument("--log_file", default=None)
    parser.add_argument("--stall_seconds", type=int, default=420)
    parser.add_argument("--grace_seconds", type=int, default=None,
                        help="silence budget before the first output of each "
                             "launch (default max(stall_seconds, 120))")
    parser.add_argument("--max_restarts", type=int, default=5)
    args = parser.parse_args(argv[:split])
    cmd = argv[split + 1:]
    log_file = args.log_file or os.path.join(args.store_dir, "babysit.log")
    os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
    raise SystemExit(supervise(cmd, args.store_dir, log_file, args.stall_seconds,
                               args.max_restarts, grace_seconds=args.grace_seconds))


if __name__ == "__main__":
    main()
