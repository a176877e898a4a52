"""TPU-relay liveness guard — makes the evidence pipeline un-killable.

The dev/driver environment reaches its TPU through a local relay
process (``python3 -u /root/.tpu_init.py``) whose stdin is pumped by an
external orchestrator.  A ``sitecustomize`` on ``PYTHONPATH`` registers
the ``axon`` PJRT plugin at interpreter start; when the relay is DOWN,
the plugin's client-init retries forever and the first call that
initializes JAX backends (``import jax`` → ``jax.devices()``) hangs
indefinitely — **even under ``JAX_PLATFORMS=cpu``**, because the env
var was latched before user code ran.  Round 4's driver runs both died
exactly this way (rc=124, no evidence emitted — VERDICT r4 weak #1).

This module embodies the manual workaround in code, with three levels:

- :func:`relay_process_alive` — instant /proc scan for the relay
  (never ``pgrep -f``: pattern-matching PIDs is banned in this repo).
- :func:`force_cpu` — unconditional in-process scrub to the CPU
  backend.  Used by code that never wants the TPU (tests, the
  multichip dryrun): pops the ``axon`` backend factory before any
  backend initializes and re-points ``jax_platforms`` at ``cpu``, so
  nothing can hang no matter what state the relay is in.  A no-op if
  backends already initialized (no hang risk remains then) or if axon
  was never registered.
- :func:`ensure_usable_backend` — for code that WANTS the TPU when it
  is reachable (bench, the single-chip driver entry).  Relay process
  missing → scrub immediately (costs ~0 ms).  Relay process present →
  prove the backend actually initializes in a watchdog child process
  with a hard deadline; on timeout/failure → scrub.  Returns a small
  dict describing what happened so evidence files can self-explain.

Empirical facts this design rests on (measured with the relay dead):
interpreter start is fine (the sitecustomize swallows register errors
and the registration itself does not dial); the hang is at *backend
initialization*; popping ``jax._src.xla_bridge._backend_factories
['axon']`` plus ``jax.config.update("jax_platforms", "cpu")`` converts
the hang into a 2 s CPU init, with ``xla_force_host_platform_device_
count`` still honoured (8 virtual devices for mesh work).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

_RELAY_MARKERS = ("tpu_init",)
_AXON_ENV = "PALLAS_AXON_POOL_IPS"
_AXON_SITE_MARKER = ".axon_site"

# cached ensure_usable_backend() result (the probe is not free; callers
# may consult the guard more than once per process)
_GUARD_RESULT: dict | None = None


def axon_registered() -> bool:
    """Whether the axon sitecustomize was in play at interpreter start."""
    if os.environ.get(_AXON_ENV):
        return True
    # after a scrub the env var is gone but the factory may still exist
    if "jax" in sys.modules:
        try:
            from jax._src import xla_bridge as xb

            return "axon" in getattr(xb, "_backend_factories", {})
        except Exception:
            return False
    return False


def relay_pid() -> int | None:
    """Pid of the relay pump process, or None. Never signals anything."""
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read().replace(b"\0", b" ").decode(
                        "utf-8", "replace"
                    )
            except OSError:
                continue
            if any(m in cmd for m in _RELAY_MARKERS):
                return int(pid)
    except OSError:
        pass
    return None


def relay_process_alive() -> bool:
    """Scan /proc for the relay pump process. Never signals anything."""
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read().replace(b"\0", b" ").decode(
                        "utf-8", "replace"
                    )
            except OSError:
                continue
            if any(m in cmd for m in _RELAY_MARKERS):
                return True
    except OSError:
        pass
    return False


def _backends_initialized() -> bool:
    if "jax" not in sys.modules:
        return False
    try:
        from jax._src import xla_bridge as xb

        return bool(getattr(xb, "_backends", None))
    except Exception:
        return False


def _scrub_env() -> None:
    """Make child processes safe: no axon sitecustomize, CPU backend."""
    os.environ.pop(_AXON_ENV, None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    pp = os.environ.get("PYTHONPATH", "")
    parts = [
        p for p in pp.split(os.pathsep) if p and _AXON_SITE_MARKER not in p
    ]
    if parts:
        os.environ["PYTHONPATH"] = os.pathsep.join(parts)
    else:
        os.environ.pop("PYTHONPATH", None)


def force_cpu() -> dict:
    """Unconditionally pin this process (and its children) to the CPU
    backend so no JAX call can hang on the relay.

    Safe at any point: if backends are ALREADY initialized there is no
    hang risk left and the live configuration is not disturbed (popping
    the factory or flipping ``jax_platforms`` mid-run would be the only
    way to break something). Returns an info dict.
    """
    info: dict = {"scrubbed": False, "axon": axon_registered()}
    _scrub_env()
    if not info["axon"]:
        return info
    if _backends_initialized():
        info["already_initialized"] = True
        return info
    # sitecustomize imported jax to register the plugin, so 'jax' is in
    # sys.modules whenever axon is registered; the import here is cheap
    import jax
    from jax._src import xla_bridge as xb

    xb._backend_factories.pop("axon", None)
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    info["scrubbed"] = True
    return info


def _probe_backend(timeout_s: float) -> dict:
    """Prove ``import jax; jax.devices()`` completes, in a child with a
    hard deadline (the child inherits the current env, so it exercises
    the exact init path the parent is about to take)."""
    code = (
        "import json, jax; ds = jax.devices(); "
        "print(json.dumps({'platform': ds[0].platform, 'n': len(ds)}))"
    )
    t0 = time.perf_counter()
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            timeout=timeout_s,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return {"ok": False, "why": "timeout", "probe_s": timeout_s}
    dt = time.perf_counter() - t0
    if out.returncode != 0:
        return {
            "ok": False,
            "why": f"rc={out.returncode}",
            "probe_s": round(dt, 1),
            "tail": out.stderr[-300:],
        }
    import json as _json

    try:
        dev = _json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:
        return {"ok": False, "why": "unparseable", "probe_s": round(dt, 1)}
    return {"ok": True, "probe_s": round(dt, 1), **dev}


def ensure_usable_backend(
    probe_timeout_s: float | None = None, *, want_tpu: bool = True
) -> dict:
    """Guarantee the first real JAX backend init in this process cannot
    hang. Returns ``{"mode": "tpu"|"cpu"|"native", "relay": ...}``.

    - axon not registered: nothing to guard (``mode="native"``).
    - relay process missing: scrub to CPU instantly (``relay="down"``).
    - relay present: watchdog-probe the init in a child; scrub on
      timeout/failure (``relay="stuck"``), pass through on success
      (``relay="up"``).

    Results are cached per process (the probe costs a real backend
    init over the tunnel).
    """
    global _GUARD_RESULT
    if _GUARD_RESULT is not None:
        return _GUARD_RESULT
    if probe_timeout_s is None:
        probe_timeout_s = float(os.environ.get("IK_RELAY_PROBE_S", "90"))
    if not axon_registered():
        _GUARD_RESULT = {"mode": "native", "relay": "absent"}
        return _GUARD_RESULT
    if _backends_initialized():
        # too late to guard, but also no risk left
        import jax

        plat = jax.devices()[0].platform
        _GUARD_RESULT = {
            "mode": "tpu" if plat in ("tpu", "axon") else plat,
            "relay": "initialized",
        }
        return _GUARD_RESULT
    if not want_tpu:
        info = force_cpu()
        _GUARD_RESULT = {"mode": "cpu", "relay": "skipped", **info}
        return _GUARD_RESULT
    rpid = relay_pid()
    if rpid is None:
        info = force_cpu()
        _GUARD_RESULT = {"mode": "cpu", "relay": "down", **info}
        return _GUARD_RESULT
    # cross-process probe cache: the child probe costs a FULL remote
    # backend init on the tunnel, and the parent then inits again — a
    # healthy cold start otherwise pays that twice (round-5 review
    # finding). A fresh marker for the SAME relay pid skips the probe;
    # a relay restart changes the pid and re-probes.
    cache_s = float(os.environ.get("IK_RELAY_PROBE_CACHE_S", "600"))
    marker = os.path.join(
        tempfile.gettempdir(), f"ik_relay_ok_{os.getuid()}"
    )
    if cache_s > 0:
        try:
            with open(marker) as f:
                cached_pid = int(f.read().strip() or "0")
            fresh = (time.time() - os.stat(marker).st_mtime) < cache_s
            if fresh and cached_pid == rpid:
                _GUARD_RESULT = {
                    "mode": "tpu", "relay": "up", "probe": "cached",
                }
                return _GUARD_RESULT
        except (OSError, ValueError):
            pass
    pr = _probe_backend(probe_timeout_s)
    if pr.get("ok"):
        if cache_s > 0:
            try:  # remember the healthy probe for sibling processes
                with open(marker, "w") as f:
                    f.write(str(rpid))
            except OSError:
                pass
        _GUARD_RESULT = {
            "mode": "tpu" if pr.get("platform") in ("tpu", "axon") else "cpu",
            "relay": "up",
            "probe_s": pr.get("probe_s"),
            "platform": pr.get("platform"),
            "n_devices": pr.get("n"),
        }
        return _GUARD_RESULT
    info = force_cpu()
    _GUARD_RESULT = {
        "mode": "cpu",
        "relay": "stuck",
        "probe": pr,
        **info,
    }
    return _GUARD_RESULT


def reset_for_tests() -> None:
    """Drop the cached guard result (unit tests only)."""
    global _GUARD_RESULT
    _GUARD_RESULT = None
