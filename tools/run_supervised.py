"""Run any tool under the stall watchdog: python tools/run_supervised.py <script> [args]."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from monogs_dev_tpu.utils.watchdog import run_supervised

if __name__ == "__main__":
    run_supervised([sys.executable, *sys.argv[1:]], stall_s=360.0, max_attempts=5)
