"""Protobuf envelope codec — the marshaller the reference left as a
TODO (``marshaller.go:24``: "TODO Protobuf un/marshaller") and never
shipped. Since the reference defines no .proto, this module defines
the obvious wire message for its envelope model (``marshaller.go``'s
``MessageData{UUID, Metadata, Payload}``):

.. code-block:: proto

    syntax = "proto3";
    package watermill;
    message Envelope {
      string uuid = 1;
      map<string, string> metadata = 2;
      bytes payload = 3;
    }

No protoc anywhere in this sandbox, so the message class is built AT
RUNTIME from a hand-assembled ``FileDescriptorProto`` against the
vendored pure-python protobuf runtime (``streaming/pbcompat.py`` —
the same vendoring that powers transformWithState). Serialization is
ALWAYS ``deterministic=True`` so map entries are key-sorted and the
wire bytes are reproducible across processes — the property the
oracle-backed audit (``envelope_proto_roundtrip``) and the golden-byte
tests pin.

Proto3 wire notes the audit relies on (all spec, not implementation
accidents): scalar fields at their default value are omitted (an
EMPTY payload contributes 0 wire bytes); a map entry is a nested
message ``{key=1, value=2}`` carried in a length-delimited field; all
tags here are single-byte (field numbers ≤ 3, inner tags ≤ 2).
"""

from __future__ import annotations

import threading

_LOCK = threading.Lock()
_CLS = None


def envelope_class():
    """The runtime-built ``watermill.Envelope`` message class (cached;
    safe to call on executors — imports the vendored runtime via
    pbcompat's path append)."""
    global _CLS
    if _CLS is not None:
        return _CLS
    with _LOCK:
        if _CLS is not None:
            return _CLS
        from watermill_kinesis_spark.streaming.pbcompat import ensure_protobuf

        if not ensure_protobuf():  # pragma: no cover - sandbox always has it
            raise ImportError("no protobuf runtime available")
        from google.protobuf import (
            descriptor_pb2,
            descriptor_pool,
            message_factory,
        )

        fdp = descriptor_pb2.FileDescriptorProto()
        fdp.name = "watermill_envelope.proto"
        fdp.package = "watermill"
        fdp.syntax = "proto3"
        msg = fdp.message_type.add()
        msg.name = "Envelope"
        T = descriptor_pb2.FieldDescriptorProto
        f = msg.field.add()
        f.name, f.number = "uuid", 1
        f.type, f.label = T.TYPE_STRING, T.LABEL_OPTIONAL
        entry = msg.nested_type.add()
        entry.name = "MetadataEntry"
        entry.options.map_entry = True
        k = entry.field.add()
        k.name, k.number = "key", 1
        k.type, k.label = T.TYPE_STRING, T.LABEL_OPTIONAL
        v = entry.field.add()
        v.name, v.number = "value", 2
        v.type, v.label = T.TYPE_STRING, T.LABEL_OPTIONAL
        m = msg.field.add()
        m.name, m.number = "metadata", 2
        m.type, m.label = T.TYPE_MESSAGE, T.LABEL_REPEATED
        m.type_name = ".watermill.Envelope.MetadataEntry"
        p = msg.field.add()
        p.name, p.number = "payload", 3
        p.type, p.label = T.TYPE_BYTES, T.LABEL_OPTIONAL
        # a PRIVATE pool: Add()ing into the default pool would collide
        # on re-import in long-lived executors
        pool = descriptor_pool.DescriptorPool()
        pool.Add(fdp)
        desc = pool.FindMessageTypeByName("watermill.Envelope")
        _CLS = message_factory.GetMessageClass(desc)
        return _CLS


def encode_envelope(uuid: str, metadata: dict[str, str], payload: bytes) -> bytes:
    """uuid/metadata/payload → deterministic proto3 wire bytes (map
    entries key-sorted, so equal envelopes are equal bytes)."""
    cls = envelope_class()
    env = cls()
    env.uuid = uuid
    for k, v in metadata.items():
        env.metadata[k] = v
    env.payload = payload
    return env.SerializeToString(deterministic=True)


def decode_envelope(data: bytes) -> tuple[str, dict[str, str], bytes]:
    """Wire bytes → (uuid, metadata, payload). Raises
    ``google.protobuf.message.DecodeError`` on malformed input — the
    corrupt-skip layer treats that exactly like a JSON parse failure
    (``subscriber.go:54-59`` semantics)."""
    cls = envelope_class()
    env = cls()
    env.ParseFromString(bytes(data))
    return env.uuid, dict(env.metadata), bytes(env.payload)
