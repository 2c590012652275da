#!/usr/bin/env python
"""Run a trainer under a wedge watchdog; auto-resume from periodic checkpoints.

Long runs through the remote-device tunnel occasionally wedge on a dropped
op: the log freezes, CPU time stops growing, and every thread sleeps in a
futex wait (CLAUDE.md "Environment gotchas").  The documented remedy is
"kill by PID and restart" — this wrapper automates exactly that.  A stall is
declared only when BOTH the log file and the child's CPU time are frozen for
the full window, so long silent XLA compiles (which burn host CPU, or at
least creep) are not killed.

On restart the newest periodic checkpoint ``<info>_<epoch>`` in
``--model_dir`` (written when the trainer runs with ``--checkpoint_epochs``)
is passed as ``--resume`` so completed epochs are not repaid.

Usage:
  python tools/watchdog_run.py --log /tmp/real8k.log --info real8k \
      --model_dir exp/urbansed/model --stall_s 900 --max_restarts 3 -- \
      python train_sedt.py --dataname urbansed ... --checkpoint_epochs 20

The separator ``--`` splits watchdog flags from the trainer command.  The
trainer's stdout/stderr are appended to ``--log``.  Exits with the child's
exit code once it terminates on its own.
"""
from __future__ import annotations

import argparse
import os
import re
import signal
import subprocess
import sys
import time


def child_cpu_ticks(pid: int) -> int | None:
    """utime+stime from /proc/<pid>/stat (None once the process is gone)."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(") ", 1)[1].split()
        return int(parts[11]) + int(parts[12])  # fields 14,15 (1-indexed)
    except (FileNotFoundError, ProcessLookupError, IndexError, ValueError):
        return None


def wait_for_tunnel(port: int, cap_s: float, poll_s: float = 30.0) -> None:
    """Block (up to ``cap_s``) until the axon device relay accepts.

    Restarting a trainer against a dead relay just hangs at jax init and
    burns the restart budget; when the tunnel itself is down (the relay
    process can die — ports refuse), hold the restart until it returns.
    Only active under the axon platform.
    """
    import socket

    if os.environ.get("JAX_PLATFORMS") != "axon":
        return
    t0 = time.time()
    while time.time() - t0 < cap_s:
        s = socket.socket()
        s.settimeout(2.0)
        try:
            s.connect(("127.0.0.1", port))
            return
        except OSError:
            pass
        finally:
            s.close()
        print(f"[watchdog] relay :{port} down, waiting", flush=True)
        time.sleep(max(0.0, min(poll_s, cap_s - (time.time() - t0))))
    print(f"[watchdog] relay still down after {cap_s:.0f}s, trying anyway",
          flush=True)


def newest_checkpoint(model_dir: str, info: str) -> str | None:
    """Name of the highest-epoch ``<info>_<epoch>`` periodic checkpoint."""
    pat = re.compile(re.escape(info) + r"_(\d+)$")
    best, best_epoch = None, -1
    try:
        names = os.listdir(model_dir)
    except FileNotFoundError:
        return None
    for name in names:
        m = pat.match(name)
        if m and int(m.group(1)) > best_epoch:
            best, best_epoch = name, int(m.group(1))
    return best


def with_resume(cmd: list[str], ckpt: str) -> list[str]:
    cmd = list(cmd)
    if "--resume" in cmd:
        cmd[cmd.index("--resume") + 1] = ckpt
    else:
        cmd += ["--resume", ckpt]
    return cmd


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--log", required=True, help="append child stdout/stderr here")
    ap.add_argument("--info", required=True, help="run tag (checkpoint prefix)")
    ap.add_argument("--model_dir", required=True,
                    help="where the trainer writes <info>_<epoch> checkpoints")
    ap.add_argument("--stall_s", default=900.0, type=float,
                    help="frozen log AND frozen CPU for this long = wedge")
    ap.add_argument("--poll_s", default=30.0, type=float)
    ap.add_argument("--max_restarts", default=3, type=int)
    ap.add_argument("--tunnel_port", default=8082, type=int,
                    help="axon relay port probed before each (re)start")
    ap.add_argument("--tunnel_wait_s", default=7200.0, type=float,
                    help="max time to hold a (re)start for a dead relay")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- then the trainer command")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no trainer command given (put it after --)")

    restarts = 0
    while True:
        wait_for_tunnel(args.tunnel_port, args.tunnel_wait_s)
        logf = open(args.log, "ab", buffering=0)
        # own process group so a wedged child's helper threads die with it
        child = subprocess.Popen(cmd, stdout=logf, stderr=logf,
                                 start_new_session=True)
        print(f"[watchdog] started pid {child.pid}: {' '.join(cmd)}",
              flush=True)
        frozen_since = None
        last = (None, -1)  # (cpu ticks, log size)
        while True:
            try:
                child.wait(timeout=args.poll_s)
                logf.close()
                print(f"[watchdog] child exited {child.returncode}", flush=True)
                return child.returncode
            except subprocess.TimeoutExpired:
                pass
            cur = (child_cpu_ticks(child.pid),
                   os.path.getsize(args.log) if os.path.exists(args.log) else -1)
            if cur != last:
                last, frozen_since = cur, None
                continue
            frozen_since = frozen_since or time.time()
            if time.time() - frozen_since < args.stall_s:
                continue
            print(f"[watchdog] wedge: log+CPU frozen {args.stall_s:.0f}s, "
                  f"killing pid {child.pid}", flush=True)
            try:
                os.killpg(child.pid, signal.SIGKILL)  # pgid == pid (setsid)
            except ProcessLookupError:
                pass
            child.wait()
            logf.close()
            break
        restarts += 1
        if restarts > args.max_restarts:
            print("[watchdog] restart budget exhausted", flush=True)
            return 86
        ckpt = newest_checkpoint(args.model_dir, args.info)
        if ckpt:
            cmd = with_resume(cmd, ckpt)
            print(f"[watchdog] restart {restarts}, resuming from {ckpt}",
                  flush=True)
        else:
            print(f"[watchdog] restart {restarts}, no checkpoint yet — "
                  "from scratch", flush=True)


if __name__ == "__main__":
    sys.exit(main())
