"""Ingest/retrieve RPC façade (reference: direct/ingest-server).

The reference exposes the platform over gRPC (rpc/src/main/proto/rpc.proto);
this package implements the same service semantics — request/response
messages on the real protobuf wire format via the pure-python codec in
catalog/proto.py, the reference's validation/status-code contract, and the
same engine surfaces underneath (commit-log writes, random-access reads,
transactions). Only the HTTP/2 transport is absent (grpcio is not
installable here); ``LocalChannel`` replaces it with an in-process
bytes-in/bytes-out dispatch so every call still crosses a genuine
serialization boundary.
"""

from proxima_platform_spark.server.rpc import (
    IngestClient,
    LocalChannel,
    RetrieveClient,
    RpcError,
    RpcServer,
)

__all__ = [
    "IngestClient",
    "LocalChannel",
    "RetrieveClient",
    "RpcError",
    "RpcServer",
]
