#!/bin/bash
# One-shot TPU measurement session: run the moment the relay recovers.
# Chains the transport probe, kernel/tracking labs, mapping cost, and the
# full bench breakdown — one process at a time (the chip admits one claim),
# each under its own timeout, all logs under /tmp/tpu_session/.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_session
run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" > "/tmp/tpu_session/$name.log" 2>&1
  echo "rc=$? tail:"; tail -5 "/tmp/tpu_session/$name.log"
}
run transport 600 python tools/probe_transport.py
run track_loop 900 python tools/probe_track_loop.py
run map_cost 1200 python tools/probe_map_cost.py
run bench_breakdown 2400 python tools/probe_bench_breakdown.py
echo "=== done; logs in /tmp/tpu_session/ ==="
