"""Device-placement helpers.

On a tunneled accelerator backend (this image's axon TPU plugin) every
distinct-shape scrap op pays a compile round-trip of ~0.4 s, so all
host-side preparation — problem construction, batch stacking, offline prior
training — runs under :func:`host_cpu`; the jitted solves transfer the one
stacked batch at call time.
"""
from __future__ import annotations

import contextlib

import jax


def host_cpu():
    """Context manager pinning uncommitted ops to the host CPU device
    (no-op on backends without a CPU device)."""
    try:
        return jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:
        return contextlib.nullcontext()
