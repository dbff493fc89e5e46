"""File tracker: params truncation, metric series, lifecycle, artifacts."""

import json

import numpy as np

from dlsc_tpu.tracking import Tracker
from dlsc_tpu.tracking.tracker import load_metrics


def test_tracker_lifecycle(tmp_path):
    t = Tracker("expA", run_name="r1", root=tmp_path)
    t.log_params({"cfg_optimizer.lr": 1e-4, "cfg_long": "x" * 1000,
                  "cfg_none": None})
    t.log_metric("train/loss", 1.5, step=0)
    t.log_metric("train/loss", 1.2, step=1)
    t.log_metrics({"val/acc": 0.7, "val/loss": 0.9}, step=1)
    t.log_array(np.eye(3), "confmat.npy")
    t.log_text("hello", "notes.txt")
    t.finish("FINISHED")

    params = json.loads((t.run_dir / "params.json").read_text())
    assert len(params["cfg_long"]) == 250            # reference truncation
    assert params["cfg_none"] == "None"
    ms = load_metrics(t.run_dir)
    assert [m["value"] for m in ms if m["name"] == "train/loss"] == [1.5, 1.2]
    meta = json.loads((t.run_dir / "meta.json").read_text())
    assert meta["status"] == "FINISHED" and meta["run_name"] == "r1"
    assert (t.artifacts_dir / "confmat.npy").exists()
    assert (t.artifacts_dir / "notes.txt").read_text() == "hello"


def test_tracker_respects_env_root(tmp_path, monkeypatch):
    monkeypatch.setenv("DLSC_TRACKING_DIR", str(tmp_path / "envroot"))
    t = Tracker("expB")
    assert str(t.run_dir).startswith(str(tmp_path / "envroot"))
    t.finish()
