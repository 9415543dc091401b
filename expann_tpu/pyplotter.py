"""Benchmark result plotting.

Counterpart of the reference's Dash dashboard (reference:
src/pyplotter.py): an interactive recall-vs-QPS scatter over the
``data/<ds_name>/data/{all,latest}.json`` result files, with any metric or
engine param on either axis and the same transforms (time_per_query_ns ->
QPS = 1e9/x, time_to_build_ns -> seconds).

Dash/plotly are not available in this image, so the module provides:
  * ``prepare_data`` — the same record->points transform, importable and
    tested,
  * a matplotlib static-plot CLI:
      python -m expann_tpu.pyplotter [--config config.json] [--file all.json]
          [--x recall --y time_per_query_ns] [--out plot.png]
  * when Dash *is* importable, ``serve_dashboard()`` launches an interactive
    app with metric/param axis dropdowns and hover annotations.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

AXIS_LABELS = {
    "recall": "Recall",
    "time_per_query_ns": "Queries per Second",
    "average_distance": "Average Distance",
    "average_squared_distance": "Average Squared Distance",
    "time_to_build_ns": "Time to Build (s)",
}


def transform_value(axis: str, value):
    """Reference's axis transforms (src/pyplotter.py:41-49)."""
    value = float(value)
    if axis == "time_to_build_ns":
        return value / 1e9
    if axis == "time_per_query_ns":
        return 1e9 / value if value != 0 else 0.0
    return value


def prepare_data(
    records: List[dict], x_axis: str, y_axis: str,
    use_param_x: bool = False, use_param_y: bool = False,
) -> Dict[str, list]:
    """Turn bench_data records into plot columns {x, y, annotations,
    engine}, mirroring the reference's prepare_data."""
    out = {"x": [], "y": [], "annotations": [], "engine": []}
    for bd in records:
        params = bd.get("param_list", {})
        if use_param_x and x_axis not in params:
            continue
        if use_param_y and y_axis not in params:
            continue
        xv = params.get(x_axis, 0) if use_param_x else bd.get(x_axis, 0)
        yv = params.get(y_axis, 0) if use_param_y else bd.get(y_axis, 0)
        out["x"].append(transform_value(x_axis, xv) if not use_param_x else float(xv))
        out["y"].append(transform_value(y_axis, yv) if not use_param_y else float(yv))
        ann = "Statistics:\n" + "\n".join(
            f"{k}: {v}" for k, v in bd.items() if k != "param_list"
        )
        ann += "\n\nParam List:\n" + "\n".join(
            f"{k}: {v}" for k, v in params.items()
        )
        out["annotations"].append(ann)
        out["engine"].append(bd.get("engine_name", "?"))
    return out


def load_records(data_folder: str, file_name: str) -> List[dict]:
    with open(os.path.join(data_folder, file_name)) as f:
        return json.load(f)


def static_plot(
    records: List[dict], x_axis: str, y_axis: str, out_path: str,
    use_param_x: bool = False, use_param_y: bool = False,
) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = prepare_data(records, x_axis, y_axis, use_param_x, use_param_y)
    fig, ax = plt.subplots(figsize=(9, 6))
    engines = sorted(set(data["engine"]))
    for eng in engines:
        xs = [x for x, e in zip(data["x"], data["engine"]) if e == eng]
        ys = [y for y, e in zip(data["y"], data["engine"]) if e == eng]
        ax.scatter(xs, ys, label=eng, alpha=0.75)
    ax.set_xlabel(AXIS_LABELS.get(x_axis, x_axis))
    ax.set_ylabel(AXIS_LABELS.get(y_axis, y_axis))
    if y_axis == "time_per_query_ns":
        ax.set_yscale("log")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def serve_dashboard(data_folder: str, k_value: int = 10):  # pragma: no cover
    """Interactive Dash app, available only when dash/plotly are installed
    (they are not in this image; the static CLI below is the default)."""
    import dash
    from dash import dcc, html
    from dash.dependencies import Input, Output
    import plotly.graph_objs as go

    app = dash.Dash(__name__)
    app.title = "expann-tpu plots"
    metric_opts = [{"label": v, "value": k} for k, v in AXIS_LABELS.items()]

    app.layout = html.Div(
        [
            dcc.Dropdown(id="file", options=[
                {"label": f, "value": f} for f in ("all.json", "latest.json")
            ], value="all.json"),
            dcc.Dropdown(id="x-axis", options=metric_opts, value="recall"),
            dcc.Dropdown(id="y-axis", options=metric_opts, value="time_per_query_ns"),
            dcc.Graph(id="scatter"),
        ]
    )

    @app.callback(
        Output("scatter", "figure"),
        [Input("file", "value"), Input("x-axis", "value"), Input("y-axis", "value")],
    )
    def update(file_name, x_axis, y_axis):
        data = prepare_data(load_records(data_folder, file_name), x_axis, y_axis)
        return {
            "data": [
                go.Scatter(
                    x=data["x"], y=data["y"], mode="markers",
                    text=data["annotations"], hoverinfo="text",
                )
            ],
            "layout": go.Layout(
                xaxis={"title": AXIS_LABELS.get(x_axis, x_axis)},
                yaxis={"title": AXIS_LABELS.get(y_axis, y_axis), "type": "log"},
            ),
        }

    app.run(debug=False)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="config.json")
    p.add_argument("--file", default="all.json")
    p.add_argument("--x", default="recall")
    p.add_argument("--y", default="time_per_query_ns")
    p.add_argument("--param-x", action="store_true")
    p.add_argument("--param-y", action="store_true")
    p.add_argument("--out", default="plot.png")
    p.add_argument("--serve", action="store_true", help="launch Dash app if available")
    args = p.parse_args(argv)

    with open(args.config) as f:
        config = json.load(f)
    data_folder = f"./data/{config['ds_name']}/data/"

    if args.serve:
        serve_dashboard(data_folder, config.get("k", 10))
        return 0

    records = load_records(data_folder, args.file)
    static_plot(records, args.x, args.y, args.out, args.param_x, args.param_y)
    print(f"wrote {args.out} ({len(records)} records)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
