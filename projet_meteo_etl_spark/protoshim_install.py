"""Installer for the vendored ``google.protobuf`` shim
(:mod:`projet_meteo_etl_spark._vendor.protoshim`).

PySpark 4's ``transformWithStateInPandas`` talks to the JVM state
server over a protobuf socket protocol; the generated
``StateMessage_pb2`` module imports ``google.protobuf`` inside every
Python *worker* process.  Where the real runtime is installed, this
module does nothing.  Where it is absent, it

1. puts the shim directory on the driver's ``sys.path`` (cheap,
   idempotent), and
2. ships a content-hashed zip of the shim to executors via
   ``SparkContext.addPyFile`` — the only channel that reaches worker
   Python processes of an already-running session (the JVM computes
   worker ``PYTHONPATH`` from the registered pyFiles, so env-var edits
   after session start would not propagate).

The zip name embeds a hash of the shim sources so a code change can
never collide with a stale file already registered under the same
name (``addFile`` rejects same-name/different-content re-adds).
"""

from __future__ import annotations

import hashlib
import os
import sys
import tempfile
import zipfile

_SHIM_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "_vendor", "protoshim"
)


def _have_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def using_shim() -> bool:
    """True when the importable ``google.protobuf`` is our shim (vs a
    real installed runtime)."""
    try:
        import google.protobuf as gp
    except ImportError:
        return False
    return "protoshim" in (getattr(gp, "__file__", "") or "")


def driver_install() -> bool:
    """Make ``google.protobuf`` importable in THIS process; True on
    success.  Prefers a real runtime; falls back to the shim dir."""
    if _have_protobuf():
        return True
    if not os.path.isdir(os.path.join(_SHIM_DIR, "google", "protobuf")):
        return False
    if _SHIM_DIR not in sys.path:
        sys.path.insert(0, _SHIM_DIR)
    # a half-imported namespace 'google' (e.g. from a failed probe)
    # would shadow the shim: extend its search path instead
    g = sys.modules.get("google")
    if g is not None:
        shim_google = os.path.join(_SHIM_DIR, "google")
        if shim_google not in getattr(g, "__path__", []):
            g.__path__.append(shim_google)
    return _have_protobuf()


def _shim_zip() -> str:
    """Build (once per content version) a zip of the shim package in
    the temp dir; returns its path."""
    files = []
    for root, _dirs, names in os.walk(os.path.join(_SHIM_DIR, "google")):
        for n in sorted(names):
            if n.endswith(".py"):
                files.append(os.path.join(root, n))
    files.sort()
    h = hashlib.sha256()
    for p in files:
        with open(p, "rb") as f:
            # archive-relative path, not absolute: identical shim
            # content must produce the same content-hashed zip name
            # regardless of install location
            h.update(os.path.relpath(p, _SHIM_DIR).encode())
            h.update(f.read())
    zpath = os.path.join(
        tempfile.gettempdir(), f"protoshim-{h.hexdigest()[:16]}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + f".tmp{os.getpid()}"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for p in files:
                z.write(p, os.path.relpath(p, _SHIM_DIR))
        os.replace(tmp, zpath)  # atomic: concurrent builders converge
    return zpath


def ensure_on_executors(spark) -> None:
    """Make ``google.protobuf`` importable in the session's Python
    workers.  No-op when a real runtime is installed (workers share the
    driver's site-packages).  Idempotent: the content-hashed name makes
    repeat ``addPyFile`` calls cheap no-ops.

    Two channels, because Spark spawns two kinds of Python process
    here:

    - task workers (per-partition ``handleInputRows``) pick up
      ``addPyFile`` entries through the function's pythonIncludes;
    - the TWS *driver worker* (state-schema pre-init) is spawned by
      ``StreamingPythonRunner``, which ignores pythonIncludes and
      builds worker ``PYTHONPATH`` from the function's captured
      ``envVars`` — fed from ``sc.environment`` at UDF-creation time.
      So the shim path is also merged into
      ``sc.environment["PYTHONPATH"]`` BEFORE the UDF is created.
    """
    if not driver_install():
        raise NotImplementedError(
            "no protobuf runtime and the vendored shim is unavailable"
        )
    if not using_shim():
        return  # real protobuf: executors already have it
    sc = spark.sparkContext
    zpath = _shim_zip()
    sc.addPyFile(zpath)
    extra = os.pathsep.join([zpath, _SHIM_DIR])
    current = sc.environment.get("PYTHONPATH", "")
    parts = [p for p in current.split(os.pathsep) if p]
    for p in (zpath, _SHIM_DIR):
        if p not in parts:
            parts.append(p)
    sc.environment["PYTHONPATH"] = os.pathsep.join(parts) if parts else extra
