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


def test_fanova_ranks_dominant_parameter_first(tmp_path):
    """Real fANOVA (VERDICT r2 #3): a 30-trial stub study with one dominant
    parameter must rank it first, ahead of a weak and a noise parameter."""
    import numpy as np
    from dlsc_tpu.hpo.fanova import fanova_importances

    rng = np.random.default_rng(0)
    db = tmp_path / "f.db"
    study = Study("fanova30", db, "maximize", sampler=TPESampler(
        n_startup_trials=100, seed=1))  # pure random sampling: unbiased design

    def objective(trial):
        a = trial.suggest_float("dominant", 0.0, 1.0)
        b = trial.suggest_float("weak", 0.0, 1.0)
        trial.suggest_float("noise", 0.0, 1.0)
        return 10.0 * a + 0.5 * b + float(rng.normal(0, 0.05))

    study.optimize(objective, n_trials=30)
    imps = fanova_importances(study.trials)
    assert set(imps) == {"dominant", "weak", "noise"}
    ranked = list(imps)
    assert ranked[0] == "dominant", imps
    assert imps["dominant"] > 0.8, imps
    assert abs(sum(imps.values()) - 1.0) < 1e-9


def test_fanova_main_effect_ratio_is_quantitative():
    """The tree-marginalization math is exact: for an additive step function
    y = 2·1[a>.5] + 1·1[b>.5], the main-effect variances are 1.0 and 0.25,
    so fANOVA importances must come out near (0.8, 0.2)."""
    import numpy as np
    from dlsc_tpu.hpo.fanova import fanova_importances

    class T:
        state = "COMPLETE"
        def __init__(self, params, value):
            self.params, self.value = params, value

    rng = np.random.default_rng(3)
    trials = []
    for _ in range(200):
        a, b = rng.uniform(size=2)
        v = 2.0 * (a > 0.5) + 1.0 * (b > 0.5)
        trials.append(T({"a": float(a), "b": float(b)}, float(v)))
    imps = fanova_importances(trials)
    assert abs(imps["a"] - 0.8) < 0.08, imps
    assert abs(imps["b"] - 0.2) < 0.08, imps


def test_fanova_categorical_and_summary_key(tmp_path, capsys):
    """Categorical params participate; the summary JSON exposes the fANOVA
    numbers and the importances plot uses them (primary source)."""
    db = tmp_path / "c.db"
    study = Study("fcat", db, "maximize", sampler=TPESampler(
        n_startup_trials=100, seed=2))

    def objective(trial):
        c = trial.suggest_categorical("arch", ["big", "small"])
        x = trial.suggest_float("lr", 0.0, 1.0)
        return (5.0 if c == "big" else 0.0) + 0.1 * x

    study.optimize(objective, n_trials=24)
    import scripts.analyze_study as A

    out = tmp_path / "an"
    A.main(["fcat", "--storage", f"sqlite:///{db}", "--out", str(out)])
    text = capsys.readouterr().out
    assert "fANOVA" in text
    summary = json.loads((out / "fcat_summary.json").read_text())
    assert max(summary["importances_fanova"],
               key=summary["importances_fanova"].get) == "arch"


def test_html_reports(tmp_path, capsys):
    """--html writes the five reference-parity interactive reports
    (reference scripts/analyze_study.py:183-216 plotly file set) as
    self-contained SVG+JS — no plotly/network dependency."""
    db = tmp_path / "h.db"
    study = Study("htmlme", db, "maximize", sampler=TPESampler(seed=1))

    def objective(trial):
        x = trial.suggest_float("lr", 1e-4, 1e-1, log=True)
        wd = trial.suggest_float("wd", 0.0, 0.3)
        for e in range(2):
            trial.report(x * (e + 1), e)
        return x - 0.05 * wd

    study.optimize(objective, n_trials=12)

    import scripts.analyze_study as A

    out = tmp_path / "analysis"
    A.main(["htmlme", "--storage", f"sqlite:///{db}", "--out", str(out),
            "--no-plots", "--html"])
    names = {p.name for p in out.iterdir()}
    for f in ("optimization_history.html", "param_importances.html",
              "parallel_coordinate.html", "contour.html", "slice.html"):
        assert f in names, (f, names)
    hist = (out / "optimization_history.html").read_text()
    assert "<svg" in hist and "data-tip" in hist  # marks + hover payloads
    assert "<script>" in hist
    pc = (out / "parallel_coordinate.html").read_text()
    assert "mousedown" in pc and "brushes" in pc  # axis drag-brushing JS
    assert "lr" in pc and "wd" in pc
    # every completed trial appears as a polyline with its params payload
    assert pc.count('class="pt ln"') == 12
