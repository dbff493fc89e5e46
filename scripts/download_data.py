#!/usr/bin/env python
"""Download ESC-50 / UrbanSound8K archives (reference: scripts/download_data.py).

Usage:
    python scripts/download_data.py esc50 [--out data/raw]
    python scripts/download_data.py urbansound8k [--out data/raw]

Downloads with a progress bar, extracts, and normalizes the directory name.
In zero-egress environments this fails fast with instructions; use
``python -m dlsc_tpu.data.synthetic`` fixtures for offline development.
"""

import argparse
import shutil
import sys
import urllib.request
import zipfile
from pathlib import Path

DATASETS = {
    "esc50": {
        "url": "https://github.com/karolpiczak/ESC-50/archive/master.zip",
        "final_dir": "ESC-50-master",
    },
    "urbansound8k": {
        # The reference uses the goo.gl shortener (scripts/download_data.py:86)
        # which Google shut down in 2025 — dead even with egress. This is the
        # direct zenodo record the shortener used to resolve to (tar.gz, not
        # zip: extraction dispatches on the suffix below).
        "url": ("https://zenodo.org/records/1203745/files/"
                "UrbanSound8K.tar.gz?download=1"),
        "final_dir": "UrbanSound8K",
    },
}


def download_and_extract(name: str, out_root: Path) -> Path:
    spec = DATASETS[name]
    out_root.mkdir(parents=True, exist_ok=True)
    final = out_root / spec["final_dir"]
    if final.exists():
        print(f"{final} already present — skipping download")
        return final
    ext = ".tar.gz" if ".tar.gz" in spec["url"] else ".zip"
    archive = out_root / f"{name}{ext}"
    print(f"downloading {spec['url']} → {archive}")

    def hook(blocks, bs, total):
        if total > 0:
            pct = min(blocks * bs / total * 100, 100)
            sys.stdout.write(f"\r  {pct:5.1f}%")
            sys.stdout.flush()

    try:
        urllib.request.urlretrieve(spec["url"], archive, reporthook=hook)
    except Exception as e:
        raise SystemExit(
            f"\ndownload failed ({e}). If this machine has no egress, fetch "
            f"{spec['url']} elsewhere and place the extracted tree at {final}."
        )
    print("\nextracting…")
    if ext == ".tar.gz":
        import tarfile

        with tarfile.open(archive, "r:gz") as t:
            # filter='data' pins safe extraction semantics (rejects absolute
            # paths / path traversal; the py3.14 default, explicit here)
            t.extractall(out_root, filter="data")
    else:
        with zipfile.ZipFile(archive) as z:
            z.extractall(out_root)
    archive.unlink(missing_ok=True)
    if not final.exists():
        # normalize top-level dir name if the archive used another
        candidates = [d for d in out_root.iterdir() if d.is_dir()]
        if len(candidates) == 1:
            shutil.move(str(candidates[0]), str(final))
    print(f"done → {final}")
    return final


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", choices=sorted(DATASETS))
    p.add_argument("--out", default="data/raw")
    args = p.parse_args()
    download_and_extract(args.dataset, Path(args.out))


if __name__ == "__main__":
    main()
