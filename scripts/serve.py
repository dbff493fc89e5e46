"""Serve an exported artifact over HTTP with micro-batched inference.

    python scripts/serve.py +artifact=outputs/export/ast [+port=8000] \
        [+host=0.0.0.0] [+window_ms=5] [+top_k=5]

Endpoints (see dlsc_tpu/server.py): GET /healthz, POST /predict (WAV
bytes), POST /predict_raw (JSON {"pcm": [...], "sample_rate": N}).
Deployment needs only the artifact dir produced by scripts/export.py — no
model code, no checkpoint. The reference has no serving entry to mirror
(its scripts/evaluate.py is a 0-byte file).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import scripts.train as train_script  # noqa: E402
from dlsc_tpu.config import compose  # noqa: E402


def main(argv: list[str] | None = None) -> None:
    config_path, config_name, overrides = train_script.parse_cli(
        list(argv if argv is not None else sys.argv[1:])
    )
    cfg = compose(config_path, config_name, overrides)
    artifact = cfg.select("artifact", default=None)
    if not artifact:
        raise SystemExit("pass +artifact=<export dir> (from scripts/export.py)")

    from dlsc_tpu.server import ModelServer

    server = ModelServer(
        str(artifact),
        window_ms=float(cfg.select("window_ms", default=5.0)),
        top_k=int(cfg.select("top_k", default=5)),
    )
    host = str(cfg.select("host", default="127.0.0.1"))
    port = int(cfg.select("port", default=8000))
    httpd = server.make_http_server(host, port)
    print(f"serving {artifact} on http://{host}:{httpd.server_address[1]} "
          f"(batch {server.manifest['batch']}, "
          f"{server.manifest.get('num_classes', '?')} classes)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
