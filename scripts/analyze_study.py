#!/usr/bin/env python
"""Study analytics CLI (reference: scripts/analyze_study.py:42-335).

Usage:
    python scripts/analyze_study.py --list [--storage sqlite:///optuna_studies.db]
    python scripts/analyze_study.py STUDY_NAME [--storage ...] [--out DIR] [--csv]

Reports trial-state stats, pruning-epoch stats, the best trial with its
learning curve, parameter importances (fANOVA-style: random-forest-free
variance attribution via per-parameter correlation of ranks), and writes
matplotlib plots (optimization history, importances, slice plots) + CSV
export.
"""

from __future__ import annotations

import argparse
import csv as _csv
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from dlsc_tpu.hpo import StudyManager, TrialState


def param_importances(trials) -> dict[str, float]:
    """Rank-correlation importance proxy (fANOVA needs a forest; this is the
    dependency-free equivalent: squared Spearman correlation between each
    parameter and the objective, normalized)."""
    done = [t for t in trials if t.state == TrialState.COMPLETE and t.value is not None]
    if len(done) < 3:
        return {}
    names = sorted({k for t in done for k in t.params})
    values = np.asarray([t.value for t in done], dtype=float)
    rv = np.argsort(np.argsort(values))
    scores = {}
    for name in names:
        xs = []
        for t in done:
            v = t.params.get(name)
            if isinstance(v, str) or isinstance(v, bool):
                v = hash(str(v)) % 1000  # categorical: arbitrary but consistent
            xs.append(float(v) if v is not None else np.nan)
        xs = np.asarray(xs)
        ok = ~np.isnan(xs)
        if ok.sum() < 3 or np.std(xs[ok]) == 0:
            continue
        rx = np.argsort(np.argsort(xs[ok]))
        r = np.corrcoef(rx, rv[ok])[0, 1]
        scores[name] = float(r**2)
    total = sum(scores.values()) or 1.0
    return {k: v / total for k, v in sorted(scores.items(), key=lambda kv: -kv[1])}


def analyze(study, out_dir: Path, export_csv: bool) -> None:
    trials = study.trials
    states = {s: len(study.trials_by_state(s)) for s in
              (TrialState.COMPLETE, TrialState.PRUNED, TrialState.FAIL,
               TrialState.RUNNING)}
    print(f"study: {study.study_name} ({study.direction})")
    print(f"trials: {len(trials)} {states}")

    pruned = study.trials_by_state(TrialState.PRUNED)
    if pruned:
        epochs = [t.last_step for t in pruned if t.last_step is not None]
        if epochs:
            print(f"pruning epochs: mean={np.mean(epochs):.1f} "
                  f"median={np.median(epochs):.0f} min={min(epochs)} max={max(epochs)}")

    try:
        best = study.best_trial
    except ValueError:
        print("no completed trials yet")
        return
    print(f"best trial #{best.number}: value={best.value:.4f}")
    for k, v in best.params.items():
        print(f"    {k} = {v}")
    if best.intermediate_values:
        curve = [best.intermediate_values[s] for s in sorted(best.intermediate_values)]
        print(f"    learning curve ({len(curve)} points): "
              f"{', '.join(f'{v:.3f}' for v in curve[:12])}"
              + (" …" if len(curve) > 12 else ""))

    imps = param_importances(trials)
    if imps:
        print("parameter importances (rank-correlation proxy):")
        for k, v in imps.items():
            print(f"    {k}: {v:.3f}")

    out_dir.mkdir(parents=True, exist_ok=True)
    _plots(study, imps, out_dir)
    if export_csv:
        path = out_dir / f"{study.study_name}_trials.csv"
        names = sorted({k for t in trials for k in t.params})
        with open(path, "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["number", "state", "value", *names])
            for t in trials:
                w.writerow([t.number, t.state, t.value,
                            *[t.params.get(n) for n in names]])
        print(f"csv → {path}")
    (out_dir / f"{study.study_name}_summary.json").write_text(
        json.dumps({**study.summary(), "importances": imps}, indent=2))


def _plots(study, imps, out_dir: Path) -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    done = [t for t in study.trials if t.value is not None]
    if done:
        fig, ax = plt.subplots(figsize=(9, 5))
        xs = [t.number for t in done]
        ys = [t.value for t in done]
        ax.scatter(xs, ys, s=14, label="trial value")
        best = (np.maximum if study.direction == "maximize" else np.minimum).accumulate(ys)
        ax.plot(xs, best, color="C1", label="best so far")
        ax.set_xlabel("trial"); ax.set_ylabel("objective")
        ax.set_title("Optimization history"); ax.legend()
        fig.savefig(out_dir / "optimization_history.png", dpi=120,
                    bbox_inches="tight")
        plt.close(fig)
    if imps:
        fig, ax = plt.subplots(figsize=(8, 4))
        ks = list(imps)[::-1]
        ax.barh(ks, [imps[k] for k in ks])
        ax.set_title("Parameter importances")
        fig.savefig(out_dir / "param_importances.png", dpi=120,
                    bbox_inches="tight")
        plt.close(fig)
    # slice plots per numeric parameter
    names = sorted({k for t in done for k in t.params})
    for name in names:
        pts = [(t.params[name], t.value) for t in done
               if name in t.params and not isinstance(t.params[name], (str, bool))]
        if len(pts) < 3:
            continue
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.scatter(*zip(*pts), s=12)
        ax.set_xlabel(name); ax.set_ylabel("objective")
        ax.set_title(f"slice: {name}")
        fig.savefig(out_dir / f"slice_{name.replace('.', '_')}.png", dpi=120,
                    bbox_inches="tight")
        plt.close(fig)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("study_name", nargs="?")
    p.add_argument("--storage", default="sqlite:///optuna_studies.db")
    p.add_argument("--out", default="outputs/study_analysis")
    p.add_argument("--csv", action="store_true")
    p.add_argument("--list", action="store_true")
    args = p.parse_args(argv)

    mgr = StudyManager(args.study_name or "", args.storage)
    if args.list or not args.study_name:
        for s in mgr.list_studies():
            print(f"  {s['study_name']}: {s['n_trials']} trials ({s['direction']})")
        return
    study = mgr.load_study()
    analyze(study, Path(args.out), args.csv)


if __name__ == "__main__":
    main()
