"""HTTP serving load probe: micro-batching vs per-request forwards.

Starts two in-process API servers on a tiny model (one plain, one with
--batch-window-ms), fires N concurrent clients at each, and reports
throughput, latency percentiles, and the achieved batching factor
(images per device forward, from /health). Mechanism demonstration — on
a dev tunnel the absolute numbers measure this host, but the batching
factor and the relative throughput are platform-independent.

Usage: python benchmarks/api_load_probe.py [--clients 16] [--requests 64]
       [--window-ms 20] [--platform cpu]
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--window-ms", type=float, default=20.0)
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--channels", type=int, default=16)
    p.add_argument("--groups", type=int, default=2)
    p.add_argument("--blocks", type=int, default=2)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import cv2
    import tempfile

    from facesr.models import face_enhance_net as fen
    from facesr.ckpt import save_model
    from app.api import serve

    ckpt_dir = tempfile.mkdtemp(prefix="facesr_load_")
    cfg = fen.FaceEnhanceNetConfig(num_channels=args.channels,
                                   num_groups=args.groups,
                                   blocks_per_group=args.blocks)
    model = fen.FaceEnhanceNet(cfg)
    save_model(os.path.join(ckpt_dir, "best_model.fckpt"),
               model.params, cfg, "custom")

    rng = np.random.default_rng(0)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    ok, png = cv2.imencode(".png", img)
    body = png.tobytes()

    def drive(srv_port, label):
        lat = []
        lat_lock = threading.Lock()
        per_client = args.requests // args.clients

        def client():
            conn = http.client.HTTPConnection("127.0.0.1", srv_port, timeout=300)
            for _ in range(per_client):
                t0 = time.perf_counter()
                conn.request("POST", "/super-resolve", body=body)
                resp = conn.getresponse()
                resp.read()
                assert resp.status == 200, resp.status
                with lat_lock:
                    lat.append(time.perf_counter() - t0)
            conn.close()

        threads = [threading.Thread(target=client) for _ in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0

        c = http.client.HTTPConnection("127.0.0.1", srv_port, timeout=60)
        c.request("GET", "/health")
        health = json.loads(c.getresponse().read())
        c.close()
        stats = next(iter(health.get("batching", {}).values()), None)
        factor = (stats["images"] / max(stats["calls"], 1)) if stats else 1.0

        lat_ms = np.sort(np.asarray(lat)) * 1e3
        n = len(lat_ms)
        print(f"{label:10s}: {n / wall:6.1f} req/s | "
              f"p50 {lat_ms[n // 2]:7.1f} ms  p95 {lat_ms[int(n * .95)]:7.1f} ms | "
              f"batching factor {factor:.2f} img/forward")
        return n / wall

    servers = {}
    for label, window in (("serial", 0.0), ("batched", args.window_ms)):
        srv = serve(ckpt_dir, port=0, host="127.0.0.1",
                    batch_window_ms=window, max_batch=args.max_batch)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers[label] = srv

    # warm both (compile) before timing
    for label, srv in servers.items():
        c = http.client.HTTPConnection("127.0.0.1", srv.server_address[1],
                                       timeout=300)
        c.request("POST", "/super-resolve", body=body)
        assert c.getresponse().status == 200
        c.close()

    r_serial = drive(servers["serial"].server_address[1], "serial")
    r_batched = drive(servers["batched"].server_address[1], "batched")
    print(f"speedup: {r_batched / r_serial:.2f}x")
    for srv in servers.values():
        srv.shutdown()


if __name__ == "__main__":
    main()
