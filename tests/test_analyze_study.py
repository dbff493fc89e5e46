"""analyze_study CLI over a populated sqlite study."""

import json

from dlsc_tpu.hpo import Study, TPESampler, TrialPruned


def test_analyze_study_end_to_end(tmp_path, capsys):
    db = tmp_path / "s.db"
    study = Study("analyzeme", db, "maximize", sampler=TPESampler(seed=0))

    def objective(trial):
        x = trial.suggest_float("lr", 1e-4, 1e-1, log=True)
        wd = trial.suggest_float("wd", 0.0, 0.3)
        c = trial.suggest_categorical("opt", ["adam", "sgd"])
        for e in range(3):
            trial.report(x * (e + 1), e)
        if trial.number % 5 == 4:
            raise TrialPruned()
        return x * (1.5 if c == "adam" else 1.0) - 0.01 * wd

    study.optimize(objective, n_trials=20)

    import scripts.analyze_study as A

    out = tmp_path / "analysis"
    A.main(["analyzeme", "--storage", f"sqlite:///{db}", "--out", str(out), "--csv"])
    text = capsys.readouterr().out
    assert "best trial" in text
    assert "parameter importances" in text
    files = {p.name for p in out.iterdir()}
    assert "optimization_history.png" in files
    assert "analyzeme_trials.csv" in files
    # plot-family parity with the reference (analyze_study.py:196-216):
    assert "parallel_coordinate.png" in files
    assert any(f.startswith("contour_") for f in files), files
    assert any(f.startswith("slice_") for f in files), files
    summary = json.loads((out / "analyzeme_summary.json").read_text())
    assert summary["n_trials"] == 20
    assert "importances" in summary
    # lr should dominate both importance measures for this objective
    assert max(summary["importances"], key=summary["importances"].get) == "lr"
    assert max(summary["importances_binned"],
               key=summary["importances_binned"].get) == "lr"


def test_analyze_list(tmp_path, capsys):
    db = tmp_path / "s.db"
    Study("a1", db).optimize(lambda t: t.suggest_float("x", 0, 1), n_trials=2)
    import scripts.analyze_study as A

    A.main(["--list", "--storage", f"sqlite:///{db}"])
    assert "a1: 2 trials" in capsys.readouterr().out


def test_analyze_reference_cli_flags(tmp_path, capsys):
    """The reference CLI surface (scripts/analyze_study.py:277-315):
    --study-name/-s, --storage-path as a bare .db path, --export CSV,
    --no-plots to skip figure generation."""
    db = tmp_path / "ref.db"
    from dlsc_tpu.hpo import Study
    Study("refstudy", db).optimize(
        lambda t: t.suggest_float("x", 0, 1), n_trials=3)
    import scripts.analyze_study as A

    out = tmp_path / "an"
    csv = tmp_path / "exported.csv"
    A.main(["--study-name", "refstudy", "--storage-path", str(db),
            "--out", str(out), "--export", str(csv), "--no-plots"])
    text = capsys.readouterr().out
    assert "best trial" in text
    assert csv.exists() and "number,state,value" in csv.read_text().splitlines()[0]
    assert not any(p.suffix == ".png" for p in out.iterdir())
