"""miniproto wire-format + shim pins (vendor/miniproto.py).

The stand-in must speak EXACTLY the protobuf wire format the JVM state
server speaks, so these tests assert golden byte strings assembled by
hand from the public wire spec (varint tags, length-delimited fields),
not just self-round-trips.
"""

from __future__ import annotations

import pytest

from providenciasbigdata_spark.vendor import miniproto, protoshim


@pytest.fixture(scope="module")
def sm():
    """The stand-in module, built from the installed pyspark's own
    serialized descriptor (never a hand-copied schema)."""
    return protoshim._build_stand_in()


def test_varint_edges():
    out = bytearray()
    miniproto.write_varint(out, 0)
    assert bytes(out) == b"\x00"
    out = bytearray()
    miniproto.write_varint(out, 300)
    assert bytes(out) == b"\xac\x02"  # spec example
    out = bytearray()
    miniproto.write_varint(out, -1)
    assert bytes(out) == b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"  # 10-byte
    v, i = miniproto.read_varint(b"\xac\x02", 0)
    assert (v, i) == (300, 2)
    with pytest.raises(ValueError):
        miniproto.read_varint(b"\xac", 0)  # truncated


def test_golden_bytes_set_handle_state(sm):
    """StateRequest{statefulProcessorCall{setHandleState{state=INITIALIZED}}}
    — assembled by hand: every tag/length byte explicit."""
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    inner = bytes([0x08, sm.INITIALIZED])                     # field 1 varint
    call_f = sm.StatefulProcessorCall._FIELDS["setHandleState"]["number"]
    call = bytes([(call_f << 3) | 2, len(inner)]) + inner
    req_f = sm.StateRequest._FIELDS["statefulProcessorCall"]["number"]
    want = bytes([(req_f << 3) | 2, len(call)]) + call
    assert req.SerializeToString() == want


def test_default_scalars_skipped_oneof_kept(sm):
    # plain scalar at default: zero bytes on the wire
    assert sm.StateResponse(statusCode=0, errorMessage="").SerializeToString() == b""
    # oneof member at default value: still serialized (explicit presence)
    vsc = sm.ValueStateCall(stateName="", clear=sm.Clear())
    data = vsc.SerializeToString()
    assert data != b""
    back = sm.ValueStateCall()
    back.ParseFromString(data)
    assert back.WhichOneof("method") == "clear"


def test_oneof_set_clears_siblings(sm):
    req = sm.ImplicitGroupingKeyRequest(
        setImplicitKey=sm.SetImplicitKey(key=b"k")
    )
    assert req.WhichOneof("method") == "setImplicitKey"
    req.removeImplicitKey = sm.RemoveImplicitKey()
    assert req.WhichOneof("method") == "removeImplicitKey"
    assert not req.HasField("setImplicitKey")


def test_nested_assignment_auto_vivifies(sm):
    """state_call_command.ttl.durationMs = N must mark ttl present —
    the exact pattern pyspark's api client uses for TTL config."""
    cmd = sm.StateCallCommand()
    cmd.stateName = "totals"
    assert not cmd.HasField("ttl")
    cmd.ttl.durationMs = 5000
    assert cmd.HasField("ttl")
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.ttl.durationMs == 5000 and back.stateName == "totals"
    # reading a message field does NOT create presence
    probe = sm.StateCallCommand()
    _ = probe.ttl.durationMs
    assert not probe.HasField("ttl")
    assert probe.SerializeToString() == b""


def test_signed_ints_round_trip(sm):
    for v in (-1, -5, 0, 1, 2**62, -(2**62)):
        rt = sm.RegisterTimer(expiryTimestampMs=v)
        back = sm.RegisterTimer()
        back.ParseFromString(rt.SerializeToString())
        assert back.expiryTimestampMs == v
    # negative int32 (statusCode) encodes as 10-byte varint like protobuf
    resp = sm.StateResponse(statusCode=-3)
    data = resp.SerializeToString()
    assert len(data) == 11  # 1 tag + 10 varint bytes
    back = sm.StateResponse()
    back.ParseFromString(data)
    assert back.statusCode == -3


def test_repeated_message_and_packed_varint_parse(sm):
    # repeated message: unpacked, one tag per element (JVM form too)
    t1 = sm.TimerInfo(timestampMs=100)
    t2 = sm.TimerInfo(timestampMs=200)
    resp = sm.StateResponseWithTimer(statusCode=0, timer=[t1, t2])
    # construct by kwargs list
    data = resp.SerializeToString()
    back = sm.StateResponseWithTimer()
    back.ParseFromString(data)
    assert [t.timestampMs for t in back.timer] == [100, 200]

    # packed varint parse: hand-encode a packed repeated int64 field and
    # check the parser unpacks it (the JVM packs repeated scalars)
    num = sm.StateResponseWithTimer._FIELDS["statusCode"]["number"]
    # fake a packed encoding of a varint field is not valid for singular;
    # instead pack the repeated 'value' (bytes) is not varint — use a
    # synthetic: repeated int64 exists on no response message here, so
    # verify the decoder path directly on a crafted class
    flds = {"xs": {"name": "xs", "number": 1, "label": 3, "type": "int64",
                   "oneof_index": None, "proto3_optional": False}}
    cls = type("Packed", (miniproto.Message,), {
        "_FIELDS": flds, "_ONEOF_OF": {},
        "_BY_NUMBER": {1: flds["xs"]},
    })
    payload = bytearray()
    for v in (1, 300, 7):
        miniproto.write_varint(payload, v)
    wire = bytearray([0x0A, len(payload)]) + payload  # field 1, wt2
    m = cls()
    m.ParseFromString(bytes(wire))
    assert m.xs == [1, 300, 7]


def test_unknown_fields_skipped(sm):
    # field 1000 varint + a real statusCode
    wire = bytearray()
    miniproto.write_varint(wire, (1000 << 3) | 0)
    miniproto.write_varint(wire, 42)
    miniproto.write_varint(wire, (1 << 3) | 0)  # statusCode = field 1
    miniproto.write_varint(wire, 7)
    m = sm.StateResponse()
    m.ParseFromString(bytes(wire))
    assert m.statusCode == 7


def test_schema_is_self_derived(sm):
    """The stand-in is built from pyspark's OWN serialized descriptor —
    message names pyspark's clients use must all exist."""
    for name in (
        "StateRequest", "StateResponse", "StatefulProcessorCall",
        "StateVariableRequest", "ImplicitGroupingKeyRequest",
        "TimerRequest", "TimerValueRequest", "ExpiryTimerRequest",
        "StateCallCommand", "TimerStateCallCommand", "ValueStateCall",
        "ListStateCall", "MapStateCall", "SetImplicitKey",
        "RemoveImplicitKey", "Exists", "Get", "RegisterTimer",
        "DeleteTimer", "ListTimers", "ValueStateUpdate", "Clear",
        "ListStateGet", "ListStatePut", "AppendValue", "AppendList",
        "GetValue", "ContainsKey", "UpdateValue", "Iterator", "Keys",
        "Values", "RemoveKey", "SetHandleState", "TTLConfig",
        "StateResponseWithLongTypeVal", "StateResponseWithStringTypeVal",
        "StateResponseWithListGet", "StateResponseWithMapKeysOrValues",
        "StateResponseWithMapIterator", "StateResponseWithTimer",
        "KeyAndValuePair", "TimerInfo", "UtilsRequest", "ParseStringSchema",
    ):
        assert hasattr(sm, name), name
    # HandleState enum constants at module level, generated-code style
    for const in ("PRE_INIT", "CREATED", "INITIALIZED", "DATA_PROCESSED",
                  "TIMER_PROCESSED", "CLOSED"):
        assert isinstance(getattr(sm, const), int), const


def test_shim_defers_to_real_protobuf(monkeypatch):
    """With google.protobuf importable, find_spec must return None —
    the real runtime always wins."""
    finder = protoshim._StateMessageShimFinder()
    monkeypatch.setattr(protoshim, "_have_real_protobuf", lambda: True)
    assert finder.find_spec(protoshim.TARGET) is None
    monkeypatch.setattr(protoshim, "_have_real_protobuf", lambda: False)
    assert finder.find_spec(protoshim.TARGET) is not None
    assert finder.find_spec("some.other.module") is None
