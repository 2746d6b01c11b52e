"""Persistent XLA compilation cache.

On the tunneled TPU runtime a medium jit (one while_loop body) costs tens of
seconds to compile; the pipeline's level step costs minutes. The persistent
cache makes every run after the first start hot.
"""

from __future__ import annotations

import hashlib
import os
import platform

import jax

_ENABLED = False
_CACHE_PATH: str | None = None


def record_platform_sidecar_if_ready() -> None:
    """Record the platform-version sidecar once the backend is live (safe
    to call any time; no-op before backend init or when caching is off)."""
    if _CACHE_PATH:
        _record_platform_sidecar(_CACHE_PATH)


def _host_key() -> str:
    """Short fingerprint of the host CPU's ISA features. XLA:CPU AOT
    artifacts bake in the compile machine's features and LOAD (with a
    SIGILL-risk warning, VERDICT r3 weak #8) on hosts that lack them —
    keying the cache directory per host keeps one machine's artifacts from
    being offered to another."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(feats.encode()).hexdigest()[:10]
    except OSError:
        pass
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def _stable_platform_version(version: str) -> str:
    """Strip per-deployment build stamps from a PJRT platform_version.

    The tunneled axon runtime reports e.g.

        PJRT C API
        axon 0.1.0; SerializedExecutable v9; compile-cache v14; compat c49
        TFRT TPU v5 lite
        Built on Nov 12 2025 14:16:36 (1762985796) cl/831091709

    and jax hashes the WHOLE string into every compilation-cache key
    (jax._src.cache_key._hash_platform). The last line changes whenever the
    axon service redeploys — which happens between terminal sessions — so a
    terminal relaunch rotated every key and cold-recompiled the entire
    program set on a warm cache dir (round 4: 61 fresh entries, a 13x-slow
    draw 1 inside the official bench; PROGRESS.md 'wedge reattribution').
    Executable compatibility is governed by the lines this KEEPS
    ('SerializedExecutable v9', 'compat c49', the chip generation): when
    those bump, keys still rotate. If a same-compat redeploy does change
    codegen, the cached executable either fails to deserialize (jax warns
    and recompiles — compiler._cache_read swallows the error) or runs the
    old binary, the standard persistent-cache contract."""
    lines = [ln for ln in version.splitlines()
             if not ln.startswith("Built on ")]
    return "\n".join(lines)


def _install_stable_platform_key() -> None:
    """Key the persistent cache on the SANITIZED platform version.

    Patches jax._src.cache_key._hash_platform (the get() entry table looks
    the symbol up at call time, so the patch takes effect everywhere).
    Disable with MESHFLOW_STABLE_CACHE_KEY=0."""
    if os.environ.get("MESHFLOW_STABLE_CACHE_KEY", "1").strip() in (
            "0", "off", "no"):
        return
    try:
        import jax._src.cache_key as ck

        if getattr(ck._hash_platform, "_meshflow_stable", False):
            return

        def _hash_platform(hash_obj, backend):
            ck._hash_string(hash_obj, backend.platform)
            ck._hash_string(
                hash_obj, _stable_platform_version(backend.platform_version))

        _hash_platform._meshflow_stable = True
        ck._hash_platform = _hash_platform
    except Exception:
        pass


def _record_platform_sidecar(path: str) -> None:
    """Forensics for the relaunch-miss hypothesis: record the full and
    sanitized platform versions beside the cache entries. A later session
    whose FULL version differs while the SANITIZED one matches proves the
    build-stamp rotation (and demonstrates the fix preserved its entries)."""
    try:
        import jax._src.xla_bridge as xb

        if not getattr(xb, "_backends", None):
            # Never force backend init here (enable_persistent_cache runs at
            # package import; the tunneled backend's init can wedge minutes).
            # The apps call enable twice — pre- and post-init — via
            # record_platform_sidecar_if_ready(); the second call records.
            return
        import jax

        dev = jax.devices()[0]
        full = dev.client.platform_version
        sidecar = os.path.join(path, "platform_version.txt")
        prev = None
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                prev = f.read()
        cur = full + "\n--sanitized--\n" + _stable_platform_version(full)
        if prev is not None and prev != cur:
            prev_san = prev.split("--sanitized--\n")[-1].strip()
            note = ("SAME compat, new build stamp — stable key preserved "
                    "the cache" if prev_san ==
                    _stable_platform_version(full).strip()
                    else "compat changed — keys legitimately rotated")
            with open(os.path.join(path, "platform_changes.log"), "a") as f:
                f.write(f"{cur!r} (was {prev!r}): {note}\n")
        with open(sidecar, "w") as f:
            f.write(cur)
    except Exception:
        pass


def enable_persistent_cache(path: str | None = None) -> None:
    global _ENABLED
    if _ENABLED:
        return
    env = os.environ.get("MESHFLOW_JIT_CACHE")
    if env is not None and env.strip().lower() in ("", "0", "off", "none"):
        # Explicitly disabled (e.g. the driver's CPU dryrun: every cached-
        # executable LOAD prints a spurious XLA:CPU machine-mismatch
        # LOG(ERROR) about LLVM tuning pseudo-features — see
        # __graft_entry__.py — and a clean tail beats a warm cache there).
        _ENABLED = True
        return
    path = path or env or os.path.expanduser("~/.cache/meshflow_jax")
    path = os.path.join(path, f"host-{platform.machine()}-{_host_key()}")
    _install_stable_platform_key()
    try:
        os.makedirs(path, exist_ok=True)
        global _CACHE_PATH
        _CACHE_PATH = path
        _record_platform_sidecar(path)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache EVERY compile, not just slow ones: small problems (the
        # per-vertex demo: 1k verts, 54 jits all under 1 s each) pay ~9 s
        # of cold XLA compiles that a 1.0-s threshold never persists;
        # threshold 0 cuts the second process to ~2.5 s (the remainder is
        # Python tracing, which is not cacheable). Disk cost is negligible.
        min_secs = float(os.environ.get("MESHFLOW_JIT_CACHE_MIN_SECS", "0"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        # enable() runs at package import — before backend init — so the
        # forensics sidecar can't be recorded here. bench.py calls
        # record_platform_sidecar_if_ready() explicitly post-init; for app
        # sessions, record at exit (no-op if the backend never came up).
        import atexit

        atexit.register(record_platform_sidecar_if_ready)
        _ENABLED = True
    except Exception:
        pass
