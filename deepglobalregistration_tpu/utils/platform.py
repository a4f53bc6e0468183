"""Platform probing helpers for the tunneled-TPU environment.

The axon PJRT backend reaches its chip through local TCP relay ports; when the
relay is down, backend initialization HANGS for tens of minutes rather than
failing fast, so tools that want a CPU fallback must not call jax.devices() to
find out. ``tpu_reachable`` answers in milliseconds by checking whether any
relay listener accepts a connection.
"""

from __future__ import annotations

import os
import socket

# Relay port plan from the environment's tunnel bootstrap (/root/.tpu_init.py).
_RELAY_PORTS = (8082, 8083, 8087, 8092, 8093, 8097, 8102, 8103, 8107,
                8112, 8113, 8117)


def tpu_reachable(timeout: float = 0.25) -> bool:
    """True when an axon relay listener is accepting connections."""
    if os.environ.get("JAX_PLATFORMS", "") not in ("", "axon"):
        return False
    for port in _RELAY_PORTS:
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.settimeout(timeout)
        try:
            s.connect(("127.0.0.1", port))
            return True
        except OSError:
            continue
        finally:
            s.close()
    return False
