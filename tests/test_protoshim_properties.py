"""Property tests for the vendored protobuf shim over a SYNTHETIC
all-types descriptor (built with the shim's own wire encoder from the
published descriptor.proto field numbers): every scalar type, zigzag,
fixed-width, repeated, packed decode, and nested messages — the paths
``StateMessage_pb2`` does not exercise, so the shim's claim of being a
(minimal) protobuf runtime rather than a single-message codec is
test-backed."""

from __future__ import annotations

import struct
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from projet_meteo_etl_spark.protoshim_install import _SHIM_DIR, driver_install

assert driver_install()
if _SHIM_DIR not in sys.path:  # real-protobuf environments: shim direct
    sys.path.insert(0, _SHIM_DIR)

from google.protobuf import _wire as W  # noqa: E402  (shim-internal)
from google.protobuf import descriptor_pool  # noqa: E402
from google.protobuf.internal import builder  # noqa: E402


def _field(name, num, ftype, label=1, type_name=None):
    out = b""
    nb = name.encode()
    out += W.enc_tag(1, 2) + W.enc_varint(len(nb)) + nb
    out += W.enc_tag(3, 0) + W.enc_varint(num)
    out += W.enc_tag(4, 0) + W.enc_varint(label)
    out += W.enc_tag(5, 0) + W.enc_varint(ftype)
    if type_name:
        tb = type_name.encode()
        out += W.enc_tag(6, 2) + W.enc_varint(len(tb)) + tb
    return W.enc_tag(2, 2) + W.enc_varint(len(out)) + out


def _build_alltypes():
    fields = b"".join(
        [
            _field("f_double", 1, W.TYPE_DOUBLE),
            _field("f_float", 2, W.TYPE_FLOAT),
            _field("f_i64", 3, W.TYPE_INT64),
            _field("f_u64", 4, W.TYPE_UINT64),
            _field("f_i32", 5, W.TYPE_INT32),
            _field("f_fx64", 6, W.TYPE_FIXED64),
            _field("f_fx32", 7, W.TYPE_FIXED32),
            _field("f_bool", 8, W.TYPE_BOOL),
            _field("f_str", 9, W.TYPE_STRING),
            _field("f_bytes", 12, W.TYPE_BYTES),
            _field("f_u32", 13, W.TYPE_UINT32),
            _field("f_sf32", 15, W.TYPE_SFIXED32),
            _field("f_sf64", 16, W.TYPE_SFIXED64),
            _field("f_s32", 17, W.TYPE_SINT32),
            _field("f_s64", 18, W.TYPE_SINT64),
            _field("r_i64", 21, W.TYPE_INT64, label=3),
            _field("r_str", 22, W.TYPE_STRING, label=3),
            _field("m_child", 23, W.TYPE_MESSAGE, type_name=".t.AllTypes"),
        ]
    )
    nb = b"synthetic_alltypes.proto"
    mnb = b"AllTypes"
    msg = W.enc_tag(1, 2) + W.enc_varint(len(mnb)) + mnb + fields
    msg = W.enc_tag(4, 2) + W.enc_varint(len(msg)) + msg
    fdp = (
        W.enc_tag(1, 2)
        + W.enc_varint(len(nb))
        + nb
        + W.enc_tag(2, 2)
        + W.enc_varint(1)
        + b"t"
        + msg
        + W.enc_tag(12, 2)
        + W.enc_varint(6)
        + b"proto3"
    )
    fd = descriptor_pool.Default().AddSerializedFile(fdp)
    g = {}
    builder.BuildMessageAndEnumDescriptors(fd, g)
    builder.BuildTopDescriptorsAndMessages(fd, "synthetic", g)
    return g["AllTypes"]


AllTypes = _build_alltypes()

_i32 = st.integers(-(2**31), 2**31 - 1)
_i64 = st.integers(-(2**63), 2**63 - 1)
_u32 = st.integers(0, 2**32 - 1)
_u64 = st.integers(0, 2**64 - 1)
_f32 = st.floats(allow_nan=False, width=32)
_f64 = st.floats(allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(
    d=_f64,
    f=_f32,
    i64=_i64,
    u64=_u64,
    i32=_i32,
    fx64=_u64,
    fx32=_u32,
    b=st.booleans(),
    s=st.text(max_size=40),
    by=st.binary(max_size=40),
    u32=_u32,
    sf32=_i32,
    sf64=_i64,
    s32=_i32,
    s64=_i64,
    ri=st.lists(_i64, max_size=8),
    rs=st.lists(st.text(max_size=10), max_size=8),
)
def test_all_scalar_types_roundtrip(
    d, f, i64, u64, i32, fx64, fx32, b, s, by, u32, sf32, sf64, s32, s64, ri, rs
):
    m = AllTypes(
        f_double=d,
        f_float=f,
        f_i64=i64,
        f_u64=u64,
        f_i32=i32,
        f_fx64=fx64,
        f_fx32=fx32,
        f_bool=b,
        f_str=s,
        f_bytes=by,
        f_u32=u32,
        f_sf32=sf32,
        f_sf64=sf64,
        f_s32=s32,
        f_s64=s64,
        r_i64=ri,
        r_str=rs,
    )
    wire = m.SerializeToString()
    p = AllTypes()
    p.ParseFromString(wire)
    assert p.f_double == d
    assert p.f_float == struct.unpack("<f", struct.pack("<f", f))[0]
    assert p.f_i64 == i64 and p.f_u64 == u64 and p.f_i32 == i32
    assert p.f_fx64 == fx64 and p.f_fx32 == fx32
    assert p.f_bool == b
    assert p.f_str == s and p.f_bytes == by
    assert p.f_u32 == u32 and p.f_sf32 == sf32 and p.f_sf64 == sf64
    assert p.f_s32 == s32 and p.f_s64 == s64
    assert list(p.r_i64) == ri and list(p.r_str) == rs
    # serialize-parse-serialize is a fixed point (canonical ordering)
    assert p.SerializeToString() == wire


@settings(max_examples=100, deadline=None)
@given(vals=st.lists(_i64, min_size=1, max_size=16))
def test_packed_repeated_decode(vals):
    payload = b"".join(W.enc_signed_varint(v) for v in vals)
    wire = W.enc_tag(21, 2) + W.enc_varint(len(payload)) + payload
    p = AllTypes()
    p.ParseFromString(wire)
    assert list(p.r_i64) == vals


def test_nested_presence_roundtrip():
    m = AllTypes(f_i32=1)
    m.m_child.f_str = "x"
    m.m_child.m_child.f_bool = True  # two levels of auto-vivify
    p = AllTypes()
    p.ParseFromString(m.SerializeToString())
    assert p.HasField("m_child")
    assert p.m_child.HasField("m_child")
    assert p.m_child.f_str == "x" and p.m_child.m_child.f_bool is True
    q = AllTypes(f_i32=1)
    _ = q.m_child.f_str  # read-only access: NOT present
    assert not q.HasField("m_child")


def test_zigzag_spec_pins():
    # published encoding table: 0→0, -1→1, 1→2, -2→3
    assert W.enc_zigzag(0) == b"\x00"
    assert W.enc_zigzag(-1) == b"\x01"
    assert W.enc_zigzag(1) == b"\x02"
    assert W.enc_zigzag(-2) == b"\x03"
    v, _ = W.dec_varint(W.enc_zigzag(-(2**62)), 0)
    assert W.from_zigzag(v) == -(2**62)


def test_malformed_input_raises():
    from google.protobuf.message import DecodeError

    p = AllTypes()
    with pytest.raises(DecodeError):
        p.ParseFromString(b"\x80")  # truncated varint tag
    with pytest.raises(DecodeError):
        # field 9 (string), length 10, only 2 bytes of payload
        p.ParseFromString(W.enc_tag(9, 2) + W.enc_varint(10) + b"ab")


def test_unsupported_field_type_rejected_loudly():
    """Upgrade tripwire: a descriptor carrying a field type the wire
    codec has no entry for (TYPE_GROUP here; a future protobuf release's
    new type hits the same path) must raise at descriptor-BUILD time —
    the shim may never silently mis-decode state-server bytes.  If a
    PySpark upgrade regenerates StateMessage_pb2 with such a type, this
    is the loud failure the builder sees."""
    from google.protobuf.message import DecodeError

    nb = b"synthetic_group.proto"
    mnb = b"HasGroup"
    fields = _field("g", 1, 10)  # TYPE_GROUP — unsupported by design
    msg = W.enc_tag(1, 2) + W.enc_varint(len(mnb)) + mnb + fields
    msg = W.enc_tag(4, 2) + W.enc_varint(len(msg)) + msg
    fdp = (
        W.enc_tag(1, 2)
        + W.enc_varint(len(nb))
        + nb
        + W.enc_tag(2, 2)
        + W.enc_varint(1)
        + b"g"
        + msg
        + W.enc_tag(12, 2)
        + W.enc_varint(6)
        + b"proto3"
    )
    with pytest.raises(DecodeError, match="unsupported field type 10"):
        descriptor_pool.Default().AddSerializedFile(fdp)


def test_packed_repeated_numeric_emit_pin():
    """proto3 default: repeated numeric fields serialize PACKED (one
    LEN record), byte-identical to the real runtime; repeated strings
    stay unpacked per spec.  Round-trips through the shim's own packed
    decoder."""
    m = AllTypes(r_i64=[1, 2, 300], r_str=["a", "b"])
    raw = m.SerializeToString()
    # field 21 packed: tag(21,LEN) + len(4) + varints 1,2,300(2 bytes)
    packed = W.enc_tag(21, 2) + W.enc_varint(4) + b"\x01\x02" + b"\xac\x02"
    assert packed in raw
    # no per-element varint tag for field 21 anywhere
    assert raw.count(bytes(W.enc_tag(21, 0))) == 0
    # strings: one LEN record per element, not packed
    assert raw.count(bytes(W.enc_tag(22, 2))) == 2
    p = AllTypes()
    p.ParseFromString(raw)
    assert list(p.r_i64) == [1, 2, 300]
    assert list(p.r_str) == ["a", "b"]
