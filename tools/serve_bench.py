"""Serving throughput/latency bench: the live HTTP server under load.

Measures what a production caller sees: concurrent POST /v1/answer
requests against `crct_tpu.serve.make_server` with the FLAGSHIP model
(config/vilbert.json geometry, bf16), dynamic batching coalescing them
onto the fixed-shape jitted eval path.  Complements bench.py's
`eval_candidate_rows_per_sec_per_chip` (the raw dispatch ceiling) by
including everything serving adds on top: HTTP, JSON, per-question
example building on the batcher thread, and the candidate fan-out of
real (synthetic-schema) figures.

Prints ONE JSON line:
  {"serve_questions_per_sec_per_chip", "latency_ms_p50", "latency_ms_p95",
   "mean_coalesced_batch", "dispatches", "sequential_latency_ms_p50", ...}

Usage:
  python tools/serve_bench.py                 # TPU, flagship model
  python tools/serve_bench.py --cpu --tiny    # CPU smoke (CI-sized)

Axon notes: the flagship eval-step compile (~minutes) is paid inside
make_server's warmup, before any timed request; remote AOT compiles are
not cached across processes, so expect the wait on every fresh run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _post(base: str, payload: dict, timeout: float = 600.0) -> dict:
    req = urllib.request.Request(
        base + "/v1/answer", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def main(argv=None):
    ap = argparse.ArgumentParser(description="HTTP serving bench")
    ap.add_argument("--threads", type=int, default=16,
                    help="concurrent client threads")
    ap.add_argument("--requests", type=int, default=256,
                    help="total timed requests across all threads")
    ap.add_argument("--sequential", type=int, default=32,
                    help="extra single-thread requests for the unbatched "
                         "latency baseline (0 = skip)")
    ap.add_argument("--max-batch", type=int, default=64,
                    help="server-side dynamic batching cap")
    ap.add_argument("--chunk", type=int, default=480,
                    help="candidate rows per compiled eval dispatch "
                         "(bench.py uses 480/chip = compute-bound)")
    ap.add_argument("--fast", type=int, default=0, metavar="K",
                    help="serve with -fast_scorer -fast_scorer_topk K "
                         "(throughput/latency only: the bench has no "
                         "trained fast head, so ANSWERS are from a "
                         "random shortlist head -- exact-protocol "
                         "numerics require cli.train_fast_scorer)")
    ap.add_argument("--cpu", action="store_true", help="force CPU")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model config (smoke, pairs with --cpu)")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from crct_tpu.config import default_params
    from crct_tpu.data.synthetic import generate_dataset
    from crct_tpu.serve import make_server

    root = tempfile.mkdtemp(prefix="serve_bench_")
    feat_dim = 64 if args.tiny else 1024
    cfg = generate_dataset(root, n_images=16, division=8, n_questions=8,
                           feat_dim=feat_dim, splits=("test",))
    if args.tiny:
        tiny = {"vocab_size": 30522, "hidden_size": 64,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "intermediate_size": 128, "v_feature_size": 64,
                "v_hidden_size": 32, "v_num_hidden_layers": 1,
                "v_num_attention_heads": 2, "v_intermediate_size": 32,
                "bi_hidden_size": 32, "bi_num_attention_heads": 4,
                "v_biattention_id": [0], "t_biattention_id": [1],
                "max_position_embeddings": 512, "plotqa_vocab_types": 12,
                "pooling_method": "mul"}
        model_config = os.path.join(root, "tiny.json")
        with open(model_config, "w") as f:
            json.dump(tiny, f)
    else:
        model_config = os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "config", "vilbert.json")

    params = default_params(
        figure_feat_path=cfg["figure_feat_path"],
        qa_parent_dir=cfg["qa_parent_dir"],
        dataset_config={
            "dataset_files_divisions": cfg["dataset_files_divisions"]},
        eval_set="test", eval_batch_size=args.chunk,
        save_path=os.path.join(root, "results"),
        model_config=model_config, bf16=not args.tiny,
        serve_max_batch=args.max_batch, serve_max_delay_ms=5.0,
    )
    if args.fast:
        params["fast_scorer"] = True
        params["fast_scorer_topk"] = args.fast

    print(f"[serve_bench] building server + warmup compile "
          f"(flagship={'no' if args.tiny else 'yes'}, "
          f"chunk={args.chunk}"
          + (f", fast topk={args.fast}" if args.fast else "")
          + ")...", flush=True)
    t0 = time.perf_counter()
    server = make_server(params, port=0)
    print(f"[serve_bench] server ready in {time.perf_counter() - t0:.1f}s",
          flush=True)
    srv_thread = threading.Thread(target=server.serve_forever, daemon=True)
    srv_thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"

    qas = [(int(img), qi) for img, lst in server.img_to_qas.items()
           for qi in range(len(lst))]

    # ---- sequential baseline (no coalescing possible) -------------------
    seq_lat = []
    for i in range(args.sequential):
        img, qi = qas[i % len(qas)]
        t = time.perf_counter()
        _post(base, {"image_index": img, "question_id": qi})
        seq_lat.append((time.perf_counter() - t) * 1e3)

    # ---- concurrent load -------------------------------------------------
    server.scorer.dispatches = 0
    server.batcher.batch_sizes.clear()
    latencies: list = []
    errors: list = []
    lock = threading.Lock()
    # distribute the remainder so exactly --requests requests are issued
    counts = [args.requests // args.threads +
              (1 if t < args.requests % args.threads else 0)
              for t in range(args.threads)]
    starts = list(np.cumsum([0] + counts[:-1]))

    def worker(tid: int) -> None:
        mine = []
        try:
            for i in range(counts[tid]):
                img, qi = qas[(starts[tid] + i) % len(qas)]
                t = time.perf_counter()
                rec = _post(base, {"image_index": img, "question_id": qi})
                mine.append((time.perf_counter() - t) * 1e3)
                assert rec.get("answer") is not None or \
                    rec.get("cls_output") is None
        except Exception as exc:  # noqa: BLE001 - surface in the report
            with lock:
                errors.append(f"thread {tid}: {type(exc).__name__}: {exc}")
        with lock:
            latencies.extend(mine)

    threads = [threading.Thread(target=worker, args=(t,))
               for t in range(args.threads)]
    t_wall = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_wall

    n = len(latencies)
    if n == 0:
        errors.append("no requests completed — percentiles unavailable")
    lat = np.asarray(latencies) if latencies else np.full(1, np.nan)
    batch_sizes = server.batcher.batch_sizes
    n_chips = max(1, len(jax.local_devices())) if not args.cpu else 1
    result = {
        "serve_questions_per_sec_per_chip": round(n / wall / n_chips, 1),
        "latency_ms_p50": round(float(np.percentile(lat, 50)), 1)
        if n else None,
        "latency_ms_p95": round(float(np.percentile(lat, 95)), 1)
        if n else None,
        "sequential_latency_ms_p50":
            round(float(np.percentile(np.asarray(seq_lat), 50)), 1)
            if seq_lat else None,
        "mean_coalesced_batch":
            round(float(np.mean(batch_sizes)), 1) if batch_sizes else 0.0,
        "dispatches": int(server.scorer.dispatches),
        "eval_rows_per_dispatch": args.chunk,
        "fast_topk": args.fast,
        "requests": n,
        "threads": args.threads,
        "wall_s": round(wall, 2),
        "errors": errors,
    }
    print(json.dumps(result))
    server.shutdown()
    server.server_close()
    return result


if __name__ == "__main__":
    main()
