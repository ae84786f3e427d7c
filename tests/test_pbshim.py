"""Unit tests for the vendored minimal protobuf runtime (vendor/pbshim).

Exercises the shim THROUGH PySpark's real generated module
(pyspark/sql/streaming/proto/StateMessage_pb2.py) — the exact consumer it
exists for — covering every construction/mutation pattern the
transformWithState clients use plus wire-format edge cases (negative
int64 two's-complement varints, proto3_optional presence, oneof
last-write-wins, empty-message presence).

The live end-to-end check is tests/test_streaming.py::
test_timetick_stream_emits_heartbeats, where the JVM state server parses
bytes this runtime produced.
"""

from __future__ import annotations

import sys

import pytest

from milvus_cdc_spark.session import ensure_protobuf

ensure_protobuf()

sm = pytest.importorskip(
    "pyspark.sql.streaming.proto.StateMessage_pb2",
    reason="pyspark build without transformWithState protos",
)


def _is_shim() -> bool:
    import google.protobuf

    return getattr(google.protobuf, "__version__", "").endswith("pbshim")


def test_client_construction_roundtrip():
    cmd = sm.StateCallCommand()
    cmd.stateName = "ts_state"
    cmd.schema = '{"type":"struct"}'
    cmd.ttl.durationMs = 5000  # auto-vivified submessage becomes present
    call = sm.StatefulProcessorCall(getValueState=cmd)
    req = sm.StateRequest(version=2, statefulProcessorCall=call)
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.version == 2
    assert back.WhichOneof("method") == "statefulProcessorCall"
    c2 = back.statefulProcessorCall.getValueState
    assert c2.stateName == "ts_state"
    assert c2.schema == '{"type":"struct"}'
    assert c2.ttl.durationMs == 5000


def test_empty_message_oneof_presence():
    """oneof dispatch on the JVM side rides presence of EMPTY messages
    (Exists/Get/Clear) — they must serialize even with no fields set."""
    vs = sm.ValueStateCall(stateName="s", exists=sm.Exists())
    b = sm.StateVariableRequest()
    b.ParseFromString(sm.StateVariableRequest(valueStateCall=vs).SerializeToString())
    assert b.WhichOneof("method") == "valueStateCall"
    assert b.valueStateCall.WhichOneof("method") == "exists"


def test_plain_read_does_not_mark_present():
    r = sm.StateCallCommand()
    _ = r.ttl  # read without mutation
    assert not r.HasField("ttl")
    assert r.SerializeToString() == b""


def test_repeated_bytes_and_bool():
    put = sm.ListStatePut(value=[b"a", b"bb"], fetchWithArrow=False)
    b = sm.ListStatePut()
    b.ParseFromString(put.SerializeToString())
    assert list(b.value) == [b"a", b"bb"]
    assert b.fetchWithArrow is False


def test_enum_module_scope_constants():
    assert sm.PRE_INIT == 0 and sm.TIMER_PROCESSED == 4 and sm.CLOSED == 5
    sh = sm.SetHandleState(state=sm.TIMER_PROCESSED)
    b = sm.SetHandleState()
    b.ParseFromString(sh.SerializeToString())
    assert b.state == sm.TIMER_PROCESSED


def test_repeated_message_with_proto3_optional():
    t1 = sm.TimerInfo(timestampMs=123)
    t2 = sm.TimerInfo(key=b"k", timestampMs=456)
    resp = sm.StateResponseWithTimer(
        statusCode=0, timer=[t1, t2], requireNextFetch=True
    )
    b = sm.StateResponseWithTimer()
    b.ParseFromString(resp.SerializeToString())
    assert b.requireNextFetch is True
    assert [x.timestampMs for x in b.timer] == [123, 456]
    assert b.timer[1].key == b"k"


def test_negative_int64_wire_format():
    """Negative varints are 10-byte two's complement on the wire — the
    JVM parser requires this exact encoding."""
    neg = sm.RegisterTimer(expiryTimestampMs=-1)
    assert neg.SerializeToString().hex() == "08ffffffffffffffffff01"
    b = sm.RegisterTimer()
    b.ParseFromString(neg.SerializeToString())
    assert b.expiryTimestampMs == -1


def test_oneof_last_write_wins():
    call = sm.StatefulProcessorCall(getValueState=sm.StateCallCommand(stateName="a"))
    # setting a sibling oneof member must clear the first
    call2 = sm.StatefulProcessorCall(
        getValueState=sm.StateCallCommand(stateName="a"),
        getListState=sm.StateCallCommand(stateName="b"),
    )
    b = sm.StatefulProcessorCall()
    b.ParseFromString(call2.SerializeToString())
    if _is_shim():
        # kwargs are applied in order; the shim clears displaced members
        assert b.WhichOneof("method") == "getListState"
    assert call.WhichOneof("method") == "getValueState"


def test_shim_never_shadows_real_protobuf():
    """The shim dir is appended to sys.path only when google.protobuf is
    missing; with ANY protobuf importable, ensure_protobuf is a no-op."""
    import google.protobuf  # noqa: F401  (importable either way by now)

    before = list(sys.path)
    ensure_protobuf()
    assert sys.path == before


def test_orphaned_vivified_child_cannot_resurrect_oneof():
    """A child auto-vivified under a oneof member, displaced by a sibling
    assignment, must not re-mark its old field present when mutated —
    that left presence with no value and a KeyError at serialization."""
    req = sm.StateRequest()
    orphan = req.statefulProcessorCall  # vivified, not present
    req.implicitGroupingKeyRequest.setImplicitKey.key = b"k"  # oneof switch
    orphan.setHandleState.state = 1  # mutate the displaced child
    assert req.WhichOneof("method") == "implicitGroupingKeyRequest"
    b = sm.StateRequest()
    b.ParseFromString(req.SerializeToString())  # must not raise
    assert b.WhichOneof("method") == "implicitGroupingKeyRequest"
    assert b.implicitGroupingKeyRequest.setImplicitKey.key == b"k"


def test_shim_google_is_namespace_friendly(tmp_path):
    """ADVICE r6: a regular ``google`` package shadows PEP-420 namespace
    portions (google-auth et al.) no matter the sys.path order. The shim's
    ``google/__init__.py`` therefore extend_path-s itself, so a sibling
    ``google.<dist>`` living elsewhere on sys.path stays importable after
    the shim activates. Runs in a subprocess for a clean import state."""
    import os
    import subprocess

    sibling = tmp_path / "google" / "authlike"
    sibling.mkdir(parents=True)
    # A namespace portion: NO google/__init__.py at this site.
    (sibling / "__init__.py").write_text("MARK = 'sibling-ok'\n")

    code = (
        "import sys\n"
        f"sys.path.insert(0, {str(tmp_path)!r})\n"
        "sys.path.insert(0, '/root/repo')\n"
        "from milvus_cdc_spark.session import ensure_protobuf\n"
        "ensure_protobuf()\n"
        "import google.protobuf  # resolves (real lib or shim)\n"
        "from google.authlike import MARK\n"
        "assert MARK == 'sibling-ok', MARK\n"
        "print('ns-ok')\n"
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env
    )
    assert out.returncode == 0, out.stderr
    assert "ns-ok" in out.stdout
