"""Installer for the google.protobuf bridge (see _pb_bridge/google).

transformWithState's Python workers import protobuf gencode; this module
makes that import succeed in three tiers:

1. ``native`` — a real ``google.protobuf`` is importable: do nothing.
2. ``bridged`` — no protobuf package, but google-cloud-sdk's vendored
   pure-python protobuf 4.23.2 is on disk: put the bridge shim first on
   the DRIVER's sys.path, and provision both worker flavors:

   - ``sc.environment["PYTHONPATH"]`` gains the bridge dir. This is
     what reaches the transformWithState DRIVER-SIDE worker — a
     separate python process the JVM launches with PYTHONPATH built
     from spark-internal zips plus the UDF's envVars, which IGNORES
     pyFiles includes (probed empirically: its PYTHONPATH ends with
     the spark-core JAR, whose ``google/protobuf`` resource directory
     python sees as an EMPTY namespace package — the exact source of
     the ``cannot import name 'descriptor' ... (unknown location)``
     crash). A regular package beats a namespace portion anywhere on
     the path (PEP 420), so appending the bridge dir suffices.
   - ``sc.addPyFile`` of a shim zip, covering task workers on a real
     cluster where ``sc.environment`` paths don't exist on the
     executor filesystem. (In local mode the env path already covers
     them.)

3. raise ImportError — neither exists; callers (tests/queries) skip or
   error, loudly.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile

_BRIDGE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pb_bridge")


def install_protobuf_bridge(spark=None) -> str:
    """Make ``google.protobuf`` importable; returns the tier used
    ("native" or "bridged"), raises ImportError when neither works.
    Pass the SparkSession to also provision the session's Python
    workers (required for any end-to-end transformWithState run)."""
    try:
        import google.protobuf as _gp

        # the bridge may ALREADY be active in this process (an earlier
        # driver-side call) — detectable by the aliased module's real
        # name; a bridged install still must provision THIS session's
        # workers. The native tier deliberately provisions NOTHING and
        # so ASSUMES driver and executors match (a real protobuf on the
        # driver implies one on every executor — true in local mode and
        # under any sane cluster image, and the usual posture for
        # python deps). We must not ship the shim zip "just in case":
        # the shim aliases the cloud-sdk copy UNCONDITIONALLY when it
        # wins the `google` import, so on a cluster whose executors DO
        # have real protobuf it could shadow the native package with
        # the older vendored runtime (ADVICE r9). Executors lacking
        # protobuf under a native driver fail loudly at the lazy
        # gencode import — a config error, not silent corruption.
        if _gp.__name__ != "cloudsdk.google.protobuf":
            return "native"
    except ImportError:
        if _BRIDGE_DIR not in sys.path:
            sys.path.insert(0, _BRIDGE_DIR)
        import google.protobuf  # noqa: F401 - raises if the sdk copy is absent

    if spark is not None:
        env = spark.sparkContext.environment
        prev = env.get("PYTHONPATH", "")
        if _BRIDGE_DIR not in prev.split(os.pathsep):
            env["PYTHONPATH"] = (
                f"{prev}{os.pathsep}{_BRIDGE_DIR}" if prev else _BRIDGE_DIR
            )
        zpath = os.path.join(
            tempfile.gettempdir(), "mrfw_pb_bridge_google.zip"
        )
        if not os.path.exists(zpath):
            tmp = zpath + f".{os.getpid()}.part"
            with zipfile.ZipFile(tmp, "w") as zf:
                zf.write(
                    os.path.join(_BRIDGE_DIR, "google", "__init__.py"),
                    "google/__init__.py",
                )
            os.replace(tmp, zpath)  # atomic: concurrent sessions race here
        # addPyFile is idempotent per path; workers put the zip on
        # sys.path BEFORE executing UDF code, so the shim wins the
        # first `google.*` import inside the state-server client
        spark.sparkContext.addPyFile(zpath)
    return "bridged"
