"""Wire-format tests for the vendored minimal protobuf runtime
(remote_shuffle_spark/vendor/protoshim) — the shim that makes the Spark 4
transformWithStateInPandas state-server protocol runnable in this
container.

Ground truth here is the PUBLIC protobuf encoding spec: known-byte pins
are hand-computed from tag = (field_number << 3) | wire_type, varints,
and length-delimited framing.  The end-to-end ground truth — the JVM's
canonical protobuf parsing every request and producing every response —
is exercised by the TWS queries themselves (ext_stream_tws_*)."""

from __future__ import annotations

import pytest

from remote_shuffle_spark.vendor import ensure_protobuf

ensure_protobuf()

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_shim_activation_matches_environment():
    """When the real protobuf is installed (cluster images) the shim must
    NOT load; when it is absent (this container) the shim must.  Either
    way ensure_protobuf's answer and the imported package must agree."""
    import google.protobuf as gp

    shim_active = "rssmini" in gp.__version__
    assert ensure_protobuf() == shim_active
    if not shim_active:
        pytest.skip("real google.protobuf installed — shim correctly dormant")


def test_known_bytes_sethandlestate():
    # StateRequest.statefulProcessorCall = field 2 (LEN) -> tag 0x12
    # StatefulProcessorCall.setHandleState = field 1 (LEN) -> tag 0x0a
    # SetHandleState.state = field 1 (varint) -> tag 0x08, CLOSED = 5
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CLOSED)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12040a020805")


def test_known_bytes_empty_oneof_submessage_is_present():
    # An EMPTY submessage chosen in a oneof must still be framed (tag +
    # length 0) — presence is how the JVM learns the oneof case.
    req = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    )
    # StateRequest.implicitGroupingKeyRequest = field 4 -> tag 0x22
    # ImplicitGroupingKeyRequest.removeImplicitKey = field 2 -> tag 0x12
    assert req.SerializeToString() == bytes.fromhex("22021200")


def test_proto3_scalar_default_is_absent():
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"").SerializeToString() == b""
    assert sm.StateResponse(statusCode=2).SerializeToString() == bytes.fromhex("0802")


def test_negative_int64_ten_byte_varint():
    rt = sm.RegisterTimer(expiryTimestampMs=-1)
    data = rt.SerializeToString()
    # field 1 varint, -1 = 10 x 0xff then 0x01
    assert data == bytes.fromhex("08ffffffffffffffffff01")
    back = sm.RegisterTimer()
    back.ParseFromString(data)
    assert back.expiryTimestampMs == -1


def test_int64_boundaries_roundtrip():
    for v in (0, 1, -1, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        m = sm.RegisterTimer(expiryTimestampMs=v)
        back = sm.RegisterTimer()
        back.ParseFromString(m.SerializeToString())
        assert back.expiryTimestampMs == v, v


def test_string_utf8_and_bytes_fields():
    c = sm.StateCallCommand(stateName="ключ🗝", schema="n long")
    back = sm.StateCallCommand()
    back.ParseFromString(c.SerializeToString())
    assert back.stateName == "ключ🗝"
    assert back.schema == "n long"
    assert back.mapStateValueSchema == ""  # unset -> proto3 default


def test_repeated_bytes_preserved_in_order():
    vals = [b"a", b"", b"cc", bytes(range(256))]
    m = sm.ListStatePut(value=vals, fetchWithArrow=False)
    back = sm.ListStatePut()
    back.ParseFromString(m.SerializeToString())
    assert back.value == vals
    assert back.fetchWithArrow is False


def test_repeated_submessage_and_bool():
    m = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[
            sm.TimerInfo(key=b"k1", timestampMs=123),
            sm.TimerInfo(timestampMs=-456),
        ],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithTimer()
    back.ParseFromString(m.SerializeToString())
    assert [(t.key, t.timestampMs) for t in back.timer] == [(b"k1", 123), (b"", -456)]
    assert back.requireNextFetch is True


def test_oneof_last_set_wins():
    req = sm.StateVariableRequest(
        valueStateCall=sm.ValueStateCall(stateName="a", get=sm.Get())
    )
    req.listStateCall = sm.ListStateCall(stateName="b", exists=sm.Exists())
    assert req.WhichOneof("method") == "listStateCall"
    back = sm.StateVariableRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.WhichOneof("method") == "listStateCall"
    assert back.listStateCall.stateName == "b"


def test_unknown_fields_skipped():
    # Simulate a future JVM adding field 15 (varint) and field 14 (LEN)
    # to StateResponse: parser must skip both and keep the known fields.
    base = sm.StateResponse(statusCode=7, value=b"xy").SerializeToString()
    unknown = bytes.fromhex("7804") + bytes.fromhex("720268690a")[:4]  # 15<<3|0, 14<<3|2 len 2
    back = sm.StateResponse()
    back.ParseFromString(base + unknown)
    assert back.statusCode == 7 and back.value == b"xy"


def test_enum_constants_and_wrapper():
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    assert sm.HandleState.Value("DATA_PROCESSED") == 3
    assert sm.HandleState.Name(4) == "TIMER_PROCESSED"


def test_unsupported_feature_fails_loud():
    from remote_shuffle_spark.vendor.protoshim.google.protobuf import _mini

    fs = _mini.FieldSpec()
    fs.type = 18  # sint64 (zigzag) — outside the supported subset
    fs.number = 1
    with pytest.raises(NotImplementedError):
        _mini.MiniMessage._enc_one(bytearray(), fs, 1)


def test_descriptor_parse_covers_all_messages():
    # The parsed FileDescriptor must expose every message the pyspark
    # state clients instantiate (a missing one would fail at import, but
    # pin the inventory so a pyspark upgrade surfaces loudly here).
    needed = {
        "StateRequest", "StateResponse", "StateResponseWithLongTypeVal",
        "StateResponseWithStringTypeVal", "StateResponseWithListGet",
        "StateResponseWithMapKeysOrValues", "KeyAndValuePair",
        "StateResponseWithMapIterator", "TimerInfo", "StateResponseWithTimer",
        "StatefulProcessorCall", "StateVariableRequest",
        "ImplicitGroupingKeyRequest", "TimerRequest", "TimerValueRequest",
        "ExpiryTimerRequest", "GetProcessingTime", "GetWatermark",
        "UtilsRequest", "ParseStringSchema", "StateCallCommand",
        "TimerStateCallCommand", "ValueStateCall", "ListStateCall",
        "MapStateCall", "SetImplicitKey", "RemoveImplicitKey", "Exists",
        "Get", "RegisterTimer", "DeleteTimer", "ListTimers",
        "ValueStateUpdate", "Clear", "ListStateGet", "ListStatePut",
        "AppendValue", "AppendList", "GetValue", "ContainsKey",
        "UpdateValue", "Iterator", "Keys", "Values", "RemoveKey",
        "SetHandleState", "TTLConfig",
    }
    have = set(sm.DESCRIPTOR.message_types_by_name)
    missing = needed - have
    assert not missing, missing


def test_nested_write_to_unset_submessage_fails_loud():
    """Real protobuf auto-vivifies on nested write; the shim doesn't
    model attachment, so the fail-loud policy demands the write RAISE
    instead of silently discarding (reads of unset submessages still
    return defaults)."""
    req = sm.StateRequest()
    assert req.statefulProcessorCall.setHandleState.state == 0  # read ok
    with pytest.raises(NotImplementedError, match="UNSET submessage"):
        req.statefulProcessorCall.setHandleState = sm.SetHandleState(state=1)


def test_nested_write_to_non_oneof_submessage_vivifies(sm=sm):
    """pyspark's state client sets TTL via the nested-write idiom
    (state_call_command.ttl.durationMs = x) — the vivified submessage
    must ATTACH ON WRITE so the config lands on the wire (the round-7
    pre-fix shim handed back an unattached instance and silently dropped
    the TTL; caught because freezing it made the drop loud)."""
    cmd = sm.StateCallCommand(stateName="n", schema="n long")
    cmd.ttl.durationMs = 123456
    data = cmd.SerializeToString()
    back = sm.StateCallCommand()
    back.ParseFromString(data)
    assert back.ttl.durationMs == 123456
    # TTLConfig.durationMs field 1 varint inside StateCallCommand.ttl
    # field 4 LEN: tag 0x22, len 4, tag 0x08, varint 123456
    assert bytes.fromhex("2204") + bytes([0x08]) in data


def test_pure_read_does_not_set_presence():
    """Lazy attach: READING an unset submessage must not flip presence,
    equality, or the wire (real protobuf never attaches on read — an
    accidental hasTtl=true/durationMs=0 would be instantly-expiring
    state, the review-confirmed hazard of attach-on-read)."""
    cmd = sm.StateCallCommand(stateName="n")
    _ = cmd.ttl.durationMs  # pure read through the vivified default
    assert not cmd.HasField("ttl")
    assert cmd.SerializeToString() == sm.StateCallCommand(stateName="n").SerializeToString()


def test_deep_chain_through_frozen_oneof_fails_loud():
    """Review-confirmed hole, now closed: a write chained through an
    UNSET ONEOF member must raise at the write, not vanish — every child
    reached through a frozen parent is itself frozen."""
    req = sm.StateRequest()
    with pytest.raises(NotImplementedError, match="UNSET submessage"):
        req.statefulProcessorCall.getValueState.ttl.durationMs = 5555
    assert req.SerializeToString() == b""


def test_multi_field_nested_writes_accumulate():
    cmd = sm.StateCallCommand()
    cmd.ttl.durationMs = 7
    cmd.stateName = "x"
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.ttl.durationMs == 7 and back.stateName == "x"


# ---- enumerated full-descriptor coverage (round-8 verdict item 5) ----------
# The shim serves a SUBSET of protobuf; today's five processors touch only
# part of StateMessage's message inventory.  These tests walk EVERY message
# type and EVERY field the generated module declares, so a pyspark minor
# bump that adds a field outside the subset (sint/fixed/map/packed) or a new
# RPC message fails HERE, loudly, not in a worker crash mid-stream.

from remote_shuffle_spark.vendor.protoshim.google.protobuf import _mini


def _sample(fs, depth=2):
    """A non-default sample value for a FieldSpec (presence matters in
    proto3: defaults don't round-trip).  Distinct per field number so a
    cross-wired tag would be caught by the equality check."""
    t, n = fs.type, fs.number
    if t in (_mini.TYPE_INT64, _mini.TYPE_INT32):
        return -(n * 7 + 3)  # negative: exercises the 10-byte varint
    if t in (_mini.TYPE_UINT64, _mini.TYPE_UINT32):
        return n * 7 + 3
    if t == _mini.TYPE_BOOL:
        return True
    if t == _mini.TYPE_ENUM:
        return 1
    if t == _mini.TYPE_STRING:
        return f"s{n}☃"
    if t == _mini.TYPE_BYTES:
        return bytes([n & 0xFF, 0, 0xFF])
    if t == _mini.TYPE_DOUBLE:
        return n + 0.5
    if t == _mini.TYPE_FLOAT:
        return n + 0.5  # exactly representable in binary32
    if t == _mini.TYPE_MESSAGE:
        return _full_instance(fs.msg_cls, depth - 1) if depth else fs.msg_cls()
    raise AssertionError(f"field type {t} outside the shim subset: {fs.name}")


def _full_instance(cls, depth=2):
    """Instance with every NON-ONEOF field set (oneofs are exercised
    member-by-member in the oneof test; setting them all here would just
    test last-set-wins again)."""
    kwargs = {}
    for fs in cls.DESCRIPTOR.fields:
        if fs.oneof_index is not None and not fs.proto3_optional:
            continue
        v = _sample(fs, depth)
        kwargs[fs.name] = [v, _sample(fs, depth)] if fs.repeated else v
    return cls(**kwargs)


def _all_message_classes():
    return [getattr(sm, name) for name in sorted(sm.DESCRIPTOR.message_types_by_name)]


def test_every_declared_message_roundtrips_fully_populated():
    checked = 0
    for cls in _all_message_classes():
        msg = _full_instance(cls)
        back = cls()
        back.ParseFromString(msg.SerializeToString())
        assert back == msg, cls.__name__
        # and a second serialize is byte-stable (canonical ordering)
        assert back.SerializeToString() == msg.SerializeToString(), cls.__name__
        checked += 1
    assert checked >= 45  # StateMessage declares ~46 messages today


def test_every_oneof_member_roundtrips_alone():
    hit = 0
    for cls in _all_message_classes():
        desc = cls.DESCRIPTOR
        for fs in desc.fields:
            if fs.oneof_index is None or fs.proto3_optional:
                continue
            msg = cls(**{fs.name: _sample(fs)})
            back = cls()
            back.ParseFromString(msg.SerializeToString())
            assert back.WhichOneof(desc.oneofs[fs.oneof_index]) == fs.name
            assert getattr(back, fs.name) == getattr(msg, fs.name), (
                cls.__name__, fs.name)
            hit += 1
    assert hit >= 40  # StateRequest/StatefulProcessorCall/... oneof members


def test_every_field_type_in_module_is_inside_the_subset():
    """The loud guard: if a pyspark upgrade regenerates StateMessage_pb2
    with any field type the shim can't serialize (sint*, fixed*, groups,
    maps arrive as a repeated message of a *MapEntry nested type — which
    _parse_message flattens, so its key/value fields land here too), this
    enumerates the offender by name instead of crashing a worker."""
    supported = _mini._VARINT_TYPES | _mini._LEN_TYPES | {
        _mini.TYPE_DOUBLE, _mini.TYPE_FLOAT}
    offenders = [
        (cls.__name__, fs.name, fs.type)
        for cls in _all_message_classes()
        for fs in cls.DESCRIPTOR.fields
        if fs.type not in supported
    ]
    assert not offenders, offenders
    # message-typed fields must all have a resolved runtime class
    unresolved = [
        (cls.__name__, fs.name)
        for cls in _all_message_classes()
        for fs in cls.DESCRIPTOR.fields
        if fs.type == _mini.TYPE_MESSAGE and fs.msg_cls is None
    ]
    assert not unresolved, unresolved
