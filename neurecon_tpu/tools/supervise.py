"""Training supervisor: run a (train) command under a stall/crash watchdog.

Long runs on remote-attached accelerators can hang inside a single device
dispatch (observed mid-round: a 300k-iter run froze for 20+ min with the
process alive and sleeping) or die outright; either way the fix is the same —
kill, restart, let checkpoint auto-resume pick up the newest state
(CheckpointIO.load_file(None) resumes from the highest global_step). The
reference has nothing in this space (its failure handling is a
KeyboardInterrupt save, ref train.py:275-280); this supervisor adds the
missing crash/hang recovery loop:

  python -m neurecon_tpu.tools.supervise --stall_sec 900 --max_restarts 3 -- \
      python -m neurecon_tpu.train --config configs/neus.yaml

The child's stdout/stderr stream through (and stamp the progress clock); a
child that exits 0 ends supervision; a stalled or crashed child is killed
(SIGTERM, then SIGKILL) and restarted up to --max_restarts times. Restarting
on rc!=0 can be disabled with --no_restart_on_error (e.g. for config typos).
"""
from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import threading
import time


def supervise(cmd, stall_sec=900, max_restarts=3, restart_on_error=True,
              poll_sec=10, log=print):
    """Returns the final exit code (0 = child completed)."""
    restarts = 0
    while True:
        log(f"[supervise] start (attempt {restarts + 1}): {' '.join(cmd)}")
        last_progress = time.time()
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT)

        def pump():
            nonlocal last_progress
            for line in proc.stdout:
                last_progress = time.time()
                sys.stdout.buffer.write(line)
                sys.stdout.flush()

        t = threading.Thread(target=pump, daemon=True)
        t.start()

        stalled = False
        while proc.poll() is None:
            time.sleep(poll_sec)
            if time.time() - last_progress > stall_sec:
                log(f"[supervise] no output for >{stall_sec}s — "
                    f"killing pid {proc.pid}")
                stalled = True
                proc.send_signal(signal.SIGTERM)
                try:
                    proc.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    proc.kill()
                    proc.wait()
                break
        t.join(timeout=5)
        rc = proc.returncode

        if rc == 0 and not stalled:
            log("[supervise] child completed (rc=0)")
            return 0
        if not stalled and not restart_on_error:
            log(f"[supervise] child failed rc={rc}; not restarting")
            return rc
        restarts += 1
        if restarts > max_restarts:
            log(f"[supervise] giving up after {max_restarts} restarts")
            return rc if rc is not None else 1
        log(f"[supervise] child {'stalled' if stalled else f'died rc={rc}'}; "
            f"restarting ({restarts}/{max_restarts})")
        time.sleep(5)


def main(argv=None):
    ap = argparse.ArgumentParser(
        usage="python -m neurecon_tpu.tools.supervise [opts] -- cmd ...")
    ap.add_argument("--stall_sec", type=int, default=900,
                    help="kill+restart if the child prints nothing this long")
    ap.add_argument("--max_restarts", type=int, default=3)
    ap.add_argument("--no_restart_on_error", action="store_true",
                    help="only restart on stalls, not nonzero exits")
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (put it after --)")
    return supervise(cmd, stall_sec=args.stall_sec,
                     max_restarts=args.max_restarts,
                     restart_on_error=not args.no_restart_on_error)


if __name__ == "__main__":
    sys.exit(main())
