"""Poll for TPU tunnel recovery; exit 0 the moment a device op succeeds.

The axon relay (``/root/.tpu_init.py``) is attached by the orchestrator;
when it is down, ``jax.devices()`` blocks forever in backend init. Each
probe therefore runs in a CHILD process bounded internally by
``faulthandler.dump_traceback_later`` (never shell ``timeout`` — killing
a process that holds the device wedges it; a child that never connected
holds nothing). Run this watcher in the background; its exit means the
TPU is usable again.
"""

from __future__ import annotations

import subprocess
import sys
import time

PROBE = """
import faulthandler
faulthandler.dump_traceback_later(120, exit=True)
import jax
import jax.numpy as jnp
assert jax.devices()[0].platform != "cpu", jax.devices()
print("sum:", float(jnp.ones((128, 128)).sum()), flush=True)
print("TPU_OK", flush=True)
"""


def main() -> None:
    deadline = time.time() + float(sys.argv[1]) if len(sys.argv) > 1 else None
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", PROBE], capture_output=True, text=True
        )
        ok = "TPU_OK" in proc.stdout
        print(
            f"[tpu_watch] probe {attempt}: ok={ok} "
            f"({time.time() - t0:.0f}s) {time.strftime('%H:%M:%S')}",
            flush=True,
        )
        if ok:
            print("[tpu_watch] TPU ALIVE", flush=True)
            return
        if deadline and time.time() > deadline:
            print("[tpu_watch] gave up (deadline)", flush=True)
            sys.exit(1)
        time.sleep(90)


if __name__ == "__main__":
    main()
