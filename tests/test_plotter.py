import json
import os

import pytest

from expann_tpu.pyplotter import prepare_data, static_plot, transform_value


RECORDS = [
    {
        "time_per_query_ns": 1e6,
        "time_to_build_ns": 2e9,
        "average_distance": 1.0,
        "average_squared_distance": 1.0,
        "recall": 0.9,
        "engine_name": "Anti-Topo Engine+",
        "param_list": {"M": "60", "ef_search_mult": "3"},
    },
    {
        "time_per_query_ns": 5e5,
        "time_to_build_ns": 1e9,
        "average_distance": 1.1,
        "average_squared_distance": 1.2,
        "recall": 0.95,
        "engine_name": "Anti-Topo Engine+",
        "param_list": {"M": "60", "ef_search_mult": "6"},
    },
]


def test_transforms():
    # ns/query -> QPS; build ns -> s (reference src/pyplotter.py:41-49)
    assert transform_value("time_per_query_ns", 1e6) == 1000.0
    assert transform_value("time_to_build_ns", 2e9) == 2.0
    assert transform_value("recall", 0.9) == 0.9


def test_prepare_data_metric_axes():
    d = prepare_data(RECORDS, "recall", "time_per_query_ns")
    assert d["x"] == [0.9, 0.95]
    assert d["y"] == [1000.0, 2000.0]
    assert all("Param List" in a for a in d["annotations"])


def test_prepare_data_param_axis():
    d = prepare_data(RECORDS, "ef_search_mult", "recall", use_param_x=True)
    assert d["x"] == [3.0, 6.0]


def test_static_plot(tmp_path):
    out = str(tmp_path / "plot.png")
    static_plot(RECORDS, "recall", "time_per_query_ns", out)
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_stdlib_dashboard_serves(tmp_path):
    """The zero-dependency dashboard actually serves: the page renders and
    /data returns exactly prepare_data's columns (live re-read per request,
    like the reference Dash app's callbacks)."""
    import http.client
    import threading

    from expann_tpu.pyplotter import make_stdlib_dashboard

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    (data_dir / "all.json").write_text(json.dumps(RECORDS))
    (data_dir / "latest.json").write_text(json.dumps(RECORDS[:1]))

    srv = make_stdlib_dashboard(str(data_dir))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/")
        page = conn.getresponse().read().decode()
        assert "expann-tpu benchmark dashboard" in page
        assert "Queries per Second" in page  # axis labels embedded

        conn.request("GET", "/data?file=all.json&x=recall&y=time_per_query_ns")
        got = json.loads(conn.getresponse().read())
        assert got == prepare_data(RECORDS, "recall", "time_per_query_ns")

        # latest.json + param axis, through the same query params
        conn.request("GET", "/data?file=latest.json&x=ef_search_mult&y=recall&px=1")
        got = json.loads(conn.getresponse().read())
        assert got == prepare_data(
            RECORDS[:1], "ef_search_mult", "recall", use_param_x=True
        )

        # path traversal via file= is rejected
        conn.request("GET", "/data?file=../secret.json&x=recall&y=recall")
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
        conn.close()
    finally:
        srv.shutdown()
        t.join(timeout=10)


def test_serve_dashboard_requires_dash(tmp_path, monkeypatch):
    """serve_dashboard builds a real Dash app when dash is installed and
    raises ImportError otherwise (documented: static_plot is the in-image
    workflow)."""
    pytest.importorskip("dash")
    # dash present: construct the app without running the server
    import expann_tpu.pyplotter as pp

    served = {}
    monkeypatch.setattr(
        "dash.Dash.run", lambda self, **kw: served.setdefault("ran", True),
        raising=False,
    )
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    (data_dir / "latest.json").write_text(json.dumps(RECORDS))
    (data_dir / "all.json").write_text(json.dumps(RECORDS))
    pp.serve_dashboard(str(data_dir))
