"""HTTP batch-serving entry point (beyond-reference).

The reference serves one question per REPL turn
(reference CRCT/Interactive_demo.py:250-258); this serves the same pred
dicts over HTTP with dynamic batching onto the jitted fixed-shape eval
path — see crct_tpu/serve.py for the API.

Usage:
    python -m crct_tpu.cli.serve -qa_file qa_pairs_test.npy \\
        -dataset_config config/plotqa.json -eval_set test \\
        -start_checkpoint crct_tpu.ckpt -port 8373
"""

from __future__ import annotations

from crct_tpu.config import read_command_line
from crct_tpu.serve import make_server


def main(argv=None):
    params = read_command_line(argv)
    if params.get('serve_no_dataset') and \
            not params.get('serve_detector_weights'):
        raise SystemExit("-serve_no_dataset needs -serve_detector_weights: "
                         "with no feature shards, figures can only arrive "
                         "through POST /v1/figures ingestion")
    print("Loading model and warming up the compiled eval step "
          "(first compile can take minutes)...", flush=True)
    server = make_server(params)
    host, port = server.server_address[:2]
    ingest = " | POST /v1/figures (PNG ingest)" if server.ingestor else ""
    print(f"Serving QA on http://{host or '0.0.0.0'}:{port} "
          f"(max_batch={params['serve_max_batch']}, "
          f"max_delay={params['serve_max_delay_ms']}ms). "
          f"POST /v1/answer | POST /v1/answers | GET /healthz{ingest}",
          flush=True)
    # containerized deploys stop with SIGTERM: drain the batcher and close
    # the socket instead of dying mid-dispatch
    import signal
    import threading

    def _graceful(*_):
        threading.Thread(target=server.shutdown, daemon=True).start()

    try:
        signal.signal(signal.SIGTERM, _graceful)
    except ValueError:          # not the main thread
        pass
    try:
        server.serve_forever()
    except KeyboardInterrupt:  # pragma: no cover - interactive
        pass
    finally:
        server.server_close()
        print("Server stopped.", flush=True)


if __name__ == "__main__":
    main()
