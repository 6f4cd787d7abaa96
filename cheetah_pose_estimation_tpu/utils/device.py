"""Device-placement helpers.

On a tunneled accelerator backend (this image's axon TPU plugin) every
distinct-shape scrap op pays a compile round-trip of ~0.4 s, so all
host-side preparation — problem construction, batch stacking, offline prior
training — runs under :func:`host_cpu`; the jitted solves transfer the one
stacked batch at call time.
"""
from __future__ import annotations

import contextlib
import os

import jax


def enable_compile_cache(path: str = None) -> None:
    """Enable JAX's persistent compilation cache (verified working on the
    tunneled TPU backend: a cached production-solver compile loads in ~0.1 s
    vs ~8 min cold). Called by the CLI/bench entry points; cache lives under
    the repo so repeated pipeline invocations on one machine share it."""
    # one cache subdir per platform: the tunneled backend remote-compiles
    # on a machine whose CPU features differ from this host's, and a local
    # CPU process loading those AOT entries risks SIGILL (or silent
    # miscomputation). The in-process jax config takes precedence over the
    # environment: the axon plugin force-selects itself past
    # JAX_PLATFORMS=cpu from the env, so scripts pin the platform via
    # jax.config.update("jax_platforms", "cpu") — keying the cache off the
    # env alone filed those CPU compiles under the tunnel's dir (and
    # loaded the tunnel host's incompatible CPU AOT entries back)
    cfg_plat = getattr(jax.config, "jax_platforms", None) or ""
    plat = (cfg_plat or os.environ.get("JAX_PLATFORMS", "default")
            ).split(",")[0] or "default"
    if plat == "cpu":
        # CPU AOT entries are ISA-feature-specific too: a cache populated
        # on one host emits "machine type doesn't match ... could lead to
        # SIGILL" when loaded on another (observed with avx512 subset
        # mismatches), so key the subdir by the host's CPU feature set
        import hashlib
        try:
            with open("/proc/cpuinfo", encoding="utf-8") as f:
                flags = next((ln for ln in f if ln.startswith("flags")), "")
            plat = "cpu-" + hashlib.md5(flags.encode()).hexdigest()[:10]
        except OSError:
            pass
    if os.environ.get("CHEETAH_NO_COMPILE_CACHE"):
        return
    p = path or os.path.join(os.environ.get(
        "CHEETAH_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")),
        plat)
    try:
        jax.config.update("jax_compilation_cache_dir", p)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without the knobs: cold compiles only


def host_cpu():
    """Context manager pinning uncommitted ops to the host CPU device
    (no-op on backends without a CPU device)."""
    try:
        return jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:
        return contextlib.nullcontext()
