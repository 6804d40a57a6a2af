"""Process-wide device dispatch lock.

The frontend (tracking) and backend (mapping) host threads time-slice one
chip — the TPU analogue of the reference's two processes sharing one GPU
(SURVEY.md §2 "Parallelism & communication"). Concurrent dispatch from two
Python threads is legal JAX, but remote-attached TPU transports (the axon
relay used in this environment) wedge on concurrent in-flight RPCs, so
every device-touching section takes this re-entrant lock and blocks on its
results before releasing. On directly-attached TPUs the lock is cheap and
harmless (held sections would serialize on the chip anyway).
"""

from __future__ import annotations

import threading

DEVICE_LOCK = threading.RLock()
