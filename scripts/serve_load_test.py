#!/usr/bin/env python
"""Serving load test: measures /v1/generate throughput with and without
dynamic request batching (serve_batching.py).

Usage: python scripts/serve_load_test.py [--model DIR] [--requests 16]
Starts two in-process servers (max_batch=1 and max_batch=8), fires N
concurrent identical greedy requests at each, and reports wall-clock + the
observed batch sizes.
"""

import argparse
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

# NOTE: do not run this with PYTHONPATH set — any PYTHONPATH value breaks the
# axon TPU plugin registration on the dev image; the repo root is added here.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kjarni_tpu.serve import _Engine, KjarniHTTPServer, make_handler


def post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())
    except urllib.error.HTTPError as e:
        raise RuntimeError(f"{path} -> HTTP {e.code}: {e.read().decode()}")


def run(model_dir: str, n_requests: int, max_batch: int,
        window_ms: float, scheduler: str = "batch",
        max_new_tokens: int = 16, stagger_ms: float = 0.0) -> dict:
    engine = _Engine({"generate": model_dir}, max_batch=max_batch,
                     batch_window_ms=window_ms, scheduler=scheduler)
    srv = KjarniHTTPServer(("127.0.0.1", 0), make_handler(engine))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_port}"
    body = {"prompt": "hello world the doctor went",
            "max_new_tokens": max_new_tokens, "preset": "greedy"}
    post(base, "/v1/generate", body)  # warm / compile

    texts = [None] * n_requests
    lat = [0.0] * n_requests

    def burst():
        barrier = threading.Barrier(n_requests + 1)

        def client(i):
            barrier.wait()
            if stagger_ms:
                # requests trickle in over the stagger window instead of
                # arriving as one burst — the mid-flight-join scenario
                time.sleep(i * stagger_ms / 1000.0 / n_requests)
            t0 = time.perf_counter()
            texts[i] = post(base, "/v1/generate", body)["text"]
            lat[i] = time.perf_counter() - t0

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_requests)]
        for t in threads:
            t.start()
        barrier.wait()
        t0 = time.perf_counter()
        for t in threads:
            t.join()
        return time.perf_counter() - t0

    burst()          # warm the batch-size buckets (compiles)
    wall = burst()   # timed
    stats = (post(base, "/v1/batch_stats", {})
             if max_batch > 1 and scheduler == "batch" else {})
    srv.shutdown()
    assert len(set(texts)) == 1, "greedy outputs diverged across requests"
    ordered = sorted(lat)
    p50 = ordered[len(ordered) // 2]
    p95 = ordered[min(int(len(ordered) * 0.95), len(ordered) - 1)]
    return {"scheduler": scheduler, "max_batch": max_batch,
            "requests": n_requests, "stagger_ms": stagger_ms,
            "wall_s": round(wall, 3),
            "req_per_sec": round(n_requests / wall, 2),
            "tok_per_sec": round(n_requests * max_new_tokens / wall, 1),
            "p50_s": round(p50, 3), "p95_s": round(p95, 3),
            "batch_sizes": stats.get("batch_sizes", {})}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="local model dir")
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--window-ms", type=float, default=100.0)
    ap.add_argument("--max-new-tokens", type=int, default=16)
    ap.add_argument("--stagger-ms", type=float, default=400.0,
                    help="second pass: spread arrivals over this window "
                         "(0 disables the staggered runs)")
    ap.add_argument("--skip-sequential", action="store_true")
    args = ap.parse_args()
    if not args.skip_sequential:
        print(json.dumps(run(args.model, args.requests, 1, args.window_ms,
                             "batch", args.max_new_tokens)))
    print(json.dumps(run(args.model, args.requests, 8, args.window_ms,
                         "batch", args.max_new_tokens)))
    print(json.dumps(run(args.model, args.requests, 8, args.window_ms,
                         "continuous", args.max_new_tokens)))
    if args.stagger_ms:
        print(json.dumps(run(args.model, args.requests, 8, args.window_ms,
                             "batch", args.max_new_tokens,
                             stagger_ms=args.stagger_ms)))
        print(json.dumps(run(args.model, args.requests, 8, args.window_ms,
                             "continuous", args.max_new_tokens,
                             stagger_ms=args.stagger_ms)))


if __name__ == "__main__":
    main()
