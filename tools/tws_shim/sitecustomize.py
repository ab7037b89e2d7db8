"""Environment-specific protobuf shim for transformWithStateInPandas tests.

The container has no installed ``google.protobuf``, but a modern copy
(6.32.0-dev) ships inside the locally-installed Google Cloud SDK at
``platform/google_appengine``. PySpark 4.1's generated StateMessage_pb2
was built by protoc 6.33.0 and its runtime check rejects the one-minor-older
runtime, so we no-op the validator — the message set uses no 6.33-only
features (probed: full encode/decode round-trip passes).

Activated ONLY when this directory is on PYTHONPATH *and*
``SILVIA_TWS_PB_SHIM=1`` — i.e. by tests/test_stream_equivalence.py's
subprocess probe, never in normal operation. Being a ``sitecustomize``
module it runs at interpreter start in BOTH the Spark driver and every
forked Python worker (which is where the TWS state server imports the
proto), the only place early enough to patch before gencode import.
"""
import os
import sys

if os.environ.get("SILVIA_TWS_PB_SHIM") == "1":
    _AE = "/usr/lib/google-cloud-sdk/platform/google_appengine"
    if os.path.isdir(_AE) and _AE not in sys.path:
        sys.path.append(_AE)
    try:
        from google.protobuf import runtime_version as _rv
        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except Exception:
        pass
