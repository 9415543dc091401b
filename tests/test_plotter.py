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
