#!/usr/bin/env python
"""Chip probe: HTTP serving e2e latency + micro-batching occupancy.

Starts fnst-serve in-process (random flagship params, bf16, --size 256),
then measures, through real HTTP on localhost:

  serial:     one request at a time -> e2e p50 (the web-demo shape;
              the reference's anchor is ~1-2 s in onnxruntime-web,
              /root/reference/README.md:5)
  concurrent: 16 clients x R requests -> throughput + mean batch
              occupancy from /stats (the micro-batching win)

Usage:  python tools/probe_serving.py [rounds=30]
Emits one JSON line; append it to evidence/probe_serving_r3.json.
"""

import io
import json
import os
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    import jax

    from fast_neural_style_transfer_tpu.infer.stylize import Stylizer
    from fast_neural_style_transfer_tpu.models.transformer import TransformerNet
    from fast_neural_style_transfer_tpu.serve import make_server
    from PIL import Image

    device = jax.devices()[0].platform
    sty = Stylizer(TransformerNet.init(jax.random.PRNGKey(0)), precision="bf16")
    srv = make_server(sty.stylize_u8, family="flagship", port=0, size=256,
                      max_batch=16, max_wait_ms=5.0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    payload = buf.getvalue()

    def post() -> float:
        t0 = time.perf_counter()
        req = urllib.request.Request(
            f"{base}/stylize", data=payload, method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            r.read()
        return time.perf_counter() - t0

    post()  # warm the compile + the HTTP path

    serial = sorted(post() for _ in range(rounds))
    p50_serial = serial[len(serial) // 2] * 1e3

    # concurrent: 16 clients, `rounds` requests each
    n_clients = 16
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=n_clients) as ex:
        lat = sorted(f.result() for f in
                     [ex.submit(post) for _ in range(n_clients * rounds)])
    wall = time.perf_counter() - t0
    with urllib.request.urlopen(f"{base}/stats", timeout=60) as r:
        stats = json.load(r)

    print(json.dumps({
        "device": device,
        "serial_p50_ms": round(p50_serial, 2),
        "concurrent_clients": n_clients,
        "concurrent_p50_ms": round(lat[len(lat) // 2] * 1e3, 2),
        "concurrent_p95_ms": round(lat[int(len(lat) * 0.95)] * 1e3, 2),
        "concurrent_rps": round(n_clients * rounds / wall, 1),
        "mean_batch_occupancy": round(stats["mean_batch_occupancy"], 2),
    }))
    srv.shutdown()


if __name__ == "__main__":
    main()
