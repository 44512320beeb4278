"""MetricsLogger JSONL scalar sink (parity: reference RandLANet.py:97-107
TensorBoard summaries)."""
import json
import math

import numpy as np

from pointunet_tpu.core.metrics_sink import MetricsLogger, read_scalars


def test_metrics_logger_roundtrip(tmp_path):
    logdir = str(tmp_path / "run")
    with MetricsLogger(logdir) as sink:
        sink.log(1, loss=2.5, lr=1e-4)
        sink.log(2, loss=np.float32(1.25), accuracy=0.5)
    rows = read_scalars(sink.path)
    assert [r["step"] for r in rows] == [1, 2]
    assert rows[0]["loss"] == 2.5
    assert rows[0]["lr"] == 1e-4
    assert rows[1]["loss"] == 1.25
    assert rows[1]["accuracy"] == 0.5
    assert all("wall_time" in r for r in rows)


def test_metrics_logger_appends_and_handles_nonfinite(tmp_path):
    logdir = str(tmp_path / "run")
    with MetricsLogger(logdir) as sink:
        sink.log(1, loss=1.0)
    with MetricsLogger(logdir) as sink:
        sink.log(2, loss=float("nan"), grad_norm=float("inf"))
        path = sink.path
    rows = read_scalars(path)
    assert len(rows) == 2              # append, not truncate
    assert isinstance(rows[1]["loss"], str)        # JSON-safe non-finite
    assert isinstance(rows[1]["grad_norm"], str)
    # every line individually valid JSON
    with open(path) as f:
        for line in f:
            json.loads(line)
