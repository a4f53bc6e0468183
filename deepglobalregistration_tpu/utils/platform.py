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


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist compiled executables across processes. On the tunneled TPU a
    big jit costs 1-5 min to compile; every entry point should call this
    before the first trace."""
    import os

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      path or os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def select_platform() -> str:
    """Entry-point guard: when the environment pins JAX_PLATFORMS=axon but no
    relay listener is up, backend init HANGS for tens of minutes — fall back
    to CPU immediately instead. Must run before the first backend touch.
    Returns the platform chosen ('axon' or 'cpu')."""
    import logging
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS") == "axon" and not tpu_reachable():
        logging.getLogger(__name__).warning(
            "axon TPU relay unreachable — falling back to CPU")
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    return os.environ.get("JAX_PLATFORMS") or "default"
