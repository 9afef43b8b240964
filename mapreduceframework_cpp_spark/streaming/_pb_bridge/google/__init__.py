"""google.protobuf bridge for containers without the protobuf package.

PySpark's transformWithState Python workers lazily import protobuf
gencode (``pyspark/sql/streaming/proto/StateMessage_pb2.py``), which
needs the ``google.protobuf`` runtime. This container does not ship it,
but google-cloud-sdk vendors a PURE-PYTHON protobuf 4.23.2 under the
rewritten package name ``cloudsdk.google.protobuf`` (every internal
import is rewritten too, so the copy is self-consistent). This shim —
placed FIRST on sys.path, so the first ``google.*`` import lands here —
aliases every module of that copy into the canonical ``google.protobuf``
namespace via sys.modules (module OBJECTS are shared, never re-executed
under a second name, so there is exactly one copy of every class) and
synthesizes ``google.protobuf.runtime_version`` (added in protobuf 5.27)
with a NO-OP validator: the gencode was emitted by protoc 6.33 and the
validator's whole job is to reject runtimes older than the gencode,
which is precisely the mismatch this bridge knowingly accepts. The
proto3 wire format and serialized-descriptor format are stable across
those versions (proven by the round-trip tests in tests/test_tws.py).

Honest scope: a bridge to bits that happen to ship in this container's
cloud-sdk, NOT a vendored dependency — on hosts with a real protobuf
package this shim is never first on sys.path for ``google`` (the
installer checks importability first and skips the bridge entirely),
and on hosts with neither it raises ImportError so callers can skip.
"""

from __future__ import annotations

import importlib
import pkgutil
import sys
import types

_THIRD_PARTY = "/usr/lib/google-cloud-sdk/lib/third_party"
if _THIRD_PARTY not in sys.path:
    sys.path.append(_THIRD_PARTY)

import cloudsdk.google.protobuf as _root  # noqa: E402

sys.modules["google.protobuf"] = _root
# `from google.protobuf import X` resolves submodules through the
# module's __name__ ("cloudsdk.google.protobuf"), so attribute-binding
# on the package — done below by each cloudsdk submodule import and
# explicitly for the synthesized module — is what makes from-imports
# work; the sys.modules alias covers plain `import google.protobuf.X`.
protobuf = _root

for _m in pkgutil.walk_packages(
    _root.__path__, "cloudsdk.google.protobuf.", onerror=lambda _n: None
):
    try:
        _mod = importlib.import_module(_m.name)
    except Exception:
        # optional pieces (pyext C extension) are absent in the
        # pure-python copy; nothing that needs them is bridged
        continue
    sys.modules["google." + _m.name[len("cloudsdk.google.") :]] = _mod

_rv = types.ModuleType("google.protobuf.runtime_version")
_rv.__doc__ = (
    "Synthesized stand-in for protobuf>=5.27's runtime_version module; "
    "validation is deliberately a no-op (see package docstring)."
)


class _Domain:
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


_rv.Domain = _Domain
_rv.VersionError = type("VersionError", (Exception,), {})
_rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
sys.modules["google.protobuf.runtime_version"] = _rv
_root.runtime_version = _rv
