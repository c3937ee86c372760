"""Structured tracing spans (`utils/tracing.py`, the reference's
tracing-profile analog) — Chrome trace-event export round-trip."""

import importlib
import json


def test_span_export(tmp_path, monkeypatch):
    out = tmp_path / "trace.json"
    monkeypatch.setenv("BINIUS_TRACE_FILE", str(out))
    monkeypatch.setenv("BINIUS_TRACE_PHASES", "0")
    from binius_tpu.utils import tracing
    tr = importlib.reload(tracing)
    assert tr.enabled()
    with tr.span("outer"):
        with tr.span("inner", category="kernel"):
            pass
    tr.instant("marker")
    tr.record("legacy", 0.0, 0.5)
    tr.save(str(out))
    data = json.loads(out.read_text())
    names = [e["name"] for e in data["traceEvents"]]
    assert names == ["inner", "outer", "marker", "legacy"]
    kinds = {e["name"]: e["ph"] for e in data["traceEvents"]}
    assert kinds == {"inner": "X", "outer": "X", "marker": "i", "legacy": "X"}
    # restore pristine module state for other tests
    monkeypatch.delenv("BINIUS_TRACE_FILE")
    importlib.reload(tracing)
