"""Script CLI surfaces: parse_cli grammar, tracking_ui --print, check_specs."""

import pytest


def test_parse_cli_grammar():
    import scripts.train as T

    path, name, ov = T.parse_cli(
        ["model=ast", "--config-name", "optimization", "a.b=1",
         "--config-path", "/tmp/cfgs", "+c=2"]
    )
    assert path == "/tmp/cfgs"
    assert name == "optimization"
    assert ov == ["model=ast", "a.b=1", "+c=2"]


def test_parse_cli_help_exits():
    import scripts.train as T

    with pytest.raises(SystemExit):
        T.parse_cli(["--help"])


def test_check_specs_runs(capsys):
    import scripts.check_specs as C

    C.main()
    out = capsys.readouterr().out
    assert "jax" in out and "device" in out


def test_tracking_ui_print(tmp_path, capsys):
    from dlsc_tpu.tracking import Tracker

    t = Tracker("exp1", root=tmp_path)
    t.log_metric("val/acc", 0.5, 1)
    t.finish()

    import sys
    import scripts.tracking_ui as U

    old = sys.argv
    sys.argv = ["tracking_ui.py", "--root", str(tmp_path), "--print"]
    try:
        U.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    assert "exp1/" in out and "val/acc" in out
