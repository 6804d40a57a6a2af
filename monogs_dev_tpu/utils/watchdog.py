"""Stall-watchdog subprocess runner for TPU jobs.

The remote-attached TPU transport in this environment (axon relay)
intermittently wedges an RPC: the process blocks forever on a futex with
~zero CPU, no error raised. The workaround is supervision: run the job as a
child process that prints progress lines, kill it if stdout goes quiet for
`stall_s`, and retry — the persistent XLA compile cache (.jax_cache) makes
retries cheap. Used by bench.py; tools/ probes reuse it via run_supervised.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time
from typing import List, Optional


def run_supervised(
    argv: List[str],
    stall_s: float = 420.0,
    max_attempts: int = 4,
    total_timeout_s: float = 5400.0,
    env: Optional[dict] = None,
) -> List[str]:
    """Run `argv`, restarting whenever stdout stalls for `stall_s`.

    Returns the captured stdout lines of the first successful attempt.
    Raises RuntimeError after `max_attempts` failures.
    """
    deadline = time.time() + total_timeout_s
    for attempt in range(1, max_attempts + 1):
        lines: List[str] = []
        proc = subprocess.Popen(
            argv,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env={**os.environ, **(env or {})},
            start_new_session=True,  # so we can signal the whole group
        )
        os.set_blocking(proc.stdout.fileno(), False)
        last_output = time.time()
        raw = b""
        stalled = False
        while True:
            if proc.poll() is not None:
                tail = proc.stdout.read()
                if tail:
                    raw += tail
                break
            try:
                chunk = proc.stdout.read()
            except BlockingIOError:
                chunk = None
            if chunk:
                raw += chunk
                last_output = time.time()
                sys.stderr.write(chunk.decode(errors="replace"))
                sys.stderr.flush()
            now = time.time()
            if now - last_output > stall_s or now > deadline:
                stalled = True
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass  # child exited during the sleep window
                proc.wait()
                break
            time.sleep(1.0)
        lines = raw.decode(errors="replace").splitlines()
        if not stalled and proc.returncode == 0:
            return lines
        why = "stalled" if stalled else f"exit {proc.returncode}"
        print(
            f"[watchdog] attempt {attempt}/{max_attempts} {why}; "
            f"{'retrying' if attempt < max_attempts else 'giving up'}",
            file=sys.stderr,
            flush=True,
        )
        if time.time() > deadline:
            break
        time.sleep(10.0)  # let the relay claim settle before reattaching
    raise RuntimeError(f"supervised job failed after {max_attempts} attempts")
