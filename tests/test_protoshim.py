"""Vendored google.protobuf shim: wire-format pins and generated-module
drive (the exact call shapes PySpark's TWS state clients make).

The byte pins are protocol-level invariants — any protobuf runtime,
real or shim, must produce them — so these tests stay valid if a real
runtime ever appears in the environment.
"""

from __future__ import annotations

import sys

import pytest

from projet_meteo_etl_spark.protoshim_install import (
    _shim_zip,
    driver_install,
    using_shim,
)

assert driver_install(), "no protobuf runtime available at all"


def _sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


# ------------------------------------------------------------- wire pins


def test_sethandlestate_bytes_pin():
    sm = _sm()
    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    # field 2 (LEN, 4) > field 1 (LEN, 2) > field 1 varint 2
    assert m.SerializeToString() == bytes.fromhex("12040a020802")


def test_default_scalars_not_serialized():
    sm = _sm()
    # proto3 implicit presence: PRE_INIT (=0) and fetchWithArrow=False
    # serialize to NOTHING
    assert sm.SetHandleState(state=sm.PRE_INIT).SerializeToString() == b""
    put = sm.ListStatePut(value=[b"x"], fetchWithArrow=False)
    assert b"\x10" not in put.SerializeToString()  # no field-2 tag


def test_negative_int64_ten_bytes():
    sm = _sm()
    b = sm.TimerInfo(timestampMs=-5).SerializeToString()
    # tag(field 2, varint) + 10-byte two's-complement varint
    assert len(b) == 11
    p = sm.TimerInfo()
    p.ParseFromString(b)
    assert p.timestampMs == -5


def test_string_utf8_roundtrip():
    sm = _sm()
    cmd = sm.StateCallCommand(stateName="élan-日本", schema="s")
    p = sm.StateCallCommand()
    p.ParseFromString(cmd.SerializeToString())
    assert p.stateName == "élan-日本"


# ------------------------------------------------- message semantics


def test_oneof_exclusivity_and_whichoneof():
    sm = _sm()
    v = sm.ValueStateCall(stateName="s", get=sm.Get())
    assert v.WhichOneof("method") == "get"
    # setting a sibling clears the first (real-protobuf semantics);
    # oneof members assign through the constructor path only
    v2 = sm.ValueStateCall(
        stateName="s",
        valueStateUpdate=sm.ValueStateUpdate(value=b"\x00\x01"),
    )
    assert v2.WhichOneof("method") == "valueStateUpdate"
    p = sm.ValueStateCall()
    p.ParseFromString(v2.SerializeToString())
    assert p.WhichOneof("method") == "valueStateUpdate"
    assert p.valueStateUpdate.value == b"\x00\x01"


def test_nested_presence_on_mutation_only():
    sm = _sm()
    cmd = sm.StateCallCommand()
    cmd.stateName = "totals"
    # reading a message field does NOT mark it present...
    assert cmd.ttl.durationMs == 0
    assert not cmd.HasField("ttl")
    # ...mutating it does, and the presence survives the wire
    cmd.ttl.durationMs = 5000
    assert cmd.HasField("ttl")
    p = sm.StateCallCommand()
    p.ParseFromString(cmd.SerializeToString())
    assert p.HasField("ttl") and p.ttl.durationMs == 5000
    # empty-but-present message: explicit kwargs construction
    call = sm.StatefulProcessorCall(getValueState=sm.StateCallCommand())
    q = sm.StatefulProcessorCall()
    q.ParseFromString(call.SerializeToString())
    assert q.WhichOneof("method") == "getValueState"


def test_repeated_bytes_and_messages():
    sm = _sm()
    resp = sm.StateResponseWithListGet(
        statusCode=0, value=[b"a", b"bb", b""], requireNextFetch=True
    )
    p = sm.StateResponseWithListGet()
    p.ParseFromString(resp.SerializeToString())
    assert list(p.value) == [b"a", b"bb", b""]
    assert p.requireNextFetch is True

    t = sm.StateResponseWithTimer(statusCode=0)
    t.timer.add(timestampMs=123)
    t.timer.add(timestampMs=456, key=b"k")
    q = sm.StateResponseWithTimer()
    q.ParseFromString(t.SerializeToString())
    got = [(x.timestampMs, x.HasField("key")) for x in q.timer]
    assert got == [(123, False), (456, True)]
    assert q.timer[1].key == b"k"


def test_unknown_fields_skipped():
    sm = _sm()
    known = sm.SetImplicitKey(key=b"zz").SerializeToString()
    # append an unknown varint field (number 15) and an unknown
    # length-delimited field (number 14): parser must skip both
    extra = bytes.fromhex("7807") + bytes.fromhex("7203616263")
    p = sm.SetImplicitKey()
    p.ParseFromString(known + extra)
    assert p.key == b"zz"


def test_enum_wrapper_names():
    sm = _sm()
    assert sm.HandleState.Name(sm.CLOSED) == "CLOSED"
    assert sm.HandleState.Value("INITIALIZED") == sm.INITIALIZED


# --------------------------------------------------------- installer


def test_installer_idempotent_and_zip_complete():
    if not using_shim():
        pytest.skip("real protobuf installed; shim inactive")
    assert driver_install()  # second call: no-op, still true
    import zipfile

    names = set(zipfile.ZipFile(_shim_zip()).namelist())
    assert "google/__init__.py" in names
    assert "google/protobuf/__init__.py" in names
    assert "google/protobuf/internal/builder.py" in names


def test_shim_is_the_import_source_when_no_real_runtime():
    if not using_shim():
        pytest.skip("real protobuf installed; shim inactive")
    import google.protobuf as gp

    assert "_vendor" in gp.__file__
    # version string mirrors the gencode's protoc
    assert gp.__version__ == "6.33.0"
    assert "google" in sys.modules
