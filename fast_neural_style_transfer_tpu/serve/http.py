"""HTTP stylization service: the deployed-demo capability, TPU-native.

The reference deploys through an external onnxruntime-web + NextJS app
(/root/reference/README.md:26) that stylizes one request at a time in the
browser. Here the model serves from the chip it trained on: a stdlib
``ThreadingHTTPServer`` front end feeding the :class:`MicroBatcher`, so
concurrent clients share device batches (and one compiled program per
shape bucket) instead of queueing whole forwards behind each other.

Endpoints:
  POST /stylize[?format=jpeg|png]  image bytes in -> stylized image out
  GET  /healthz                    liveness + device + model family
  GET  /stats                      batching occupancy + latency quantiles

Run:  fnst-serve --model run/style_transfer_final.npz --port 8765
      fnst-serve --adain-decoder d.npz --style s.jpg --alpha 0.8 ...
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np

from fast_neural_style_transfer_tpu.serve.batcher import MicroBatcher, QueueFull

__all__ = ["StylizeServer", "make_server", "main"]

_MAX_BODY = 32 * 1024 * 1024  # JPEG/PNG request cap; a 4K png is ~24 MB


class StylizeServer(ThreadingHTTPServer):
    """ThreadingHTTPServer owning the batcher + serving config."""

    daemon_threads = True

    def __init__(self, addr, batcher: MicroBatcher, *, family: str,
                 size: int = 0, request_timeout_s: float = 60.0):
        self.batcher = batcher
        self.family = family
        self.size = size  # >0: resize every request to size x size
        self.request_timeout_s = request_timeout_s
        super().__init__(addr, _Handler)

    def shutdown(self) -> None:  # also stop the dispatcher thread
        super().shutdown()
        self.batcher.close()


class _Handler(BaseHTTPRequestHandler):
    server: StylizeServer
    server_version = "fnst-serve/1.0"
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet by default (tests/daemons)
        pass

    def _reply(self, code: int, body: bytes, ctype: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _reply_json(self, code: int, obj) -> None:
        self._reply(code, json.dumps(obj).encode(), "application/json")

    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        import jax

        if self.path == "/healthz":
            self._reply_json(200, {
                "status": "ok",
                "family": self.server.family,
                "device": jax.devices()[0].platform,
                "size": self.server.size or "native",
            })
        elif self.path == "/stats":
            self._reply_json(200, self.server.batcher.stats.snapshot())
        else:
            self._reply_json(404, {"error": f"no route {self.path}"})

    def do_POST(self) -> None:  # noqa: N802
        from PIL import Image

        if not self.path.startswith("/stylize"):
            self._reply_json(404, {"error": f"no route {self.path}"})
            return
        t0 = time.monotonic()
        ok = False
        try:
            n = int(self.headers.get("Content-Length", 0))
            if not 0 < n <= _MAX_BODY:
                self._reply_json(413 if n > _MAX_BODY else 400,
                                 {"error": f"bad Content-Length {n}"})
                return
            body = self.rfile.read(n)
            try:
                img = Image.open(io.BytesIO(body)).convert("RGB")
            except Exception:
                self._reply_json(400, {"error": "undecodable image"})
                return
            if self.server.size > 0:
                img = img.resize((self.server.size, self.server.size),
                                 Image.BILINEAR)
            arr = np.asarray(img, dtype=np.uint8)
            try:
                fut = self.server.batcher.submit(arr)
            except QueueFull as e:
                self.send_response(503)
                self.send_header("Retry-After", "1")
                body = json.dumps({"error": str(e)}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            out = fut.result(timeout=self.server.request_timeout_s)
            fmt = "png" if self.path.endswith("format=png") else "jpeg"
            buf = io.BytesIO()
            Image.fromarray(out).save(
                buf, format=fmt.upper(),
                **({"quality": 95} if fmt == "jpeg" else {}))
            self._reply(200, buf.getvalue(), f"image/{fmt}")
            ok = True
        except Exception as e:  # noqa: BLE001 — 500 to the client, keep serving
            try:
                self._reply_json(500, {"error": repr(e)})
            except Exception:
                pass
        finally:
            self.server.batcher.stats.record_request(
                time.monotonic() - t0, ok)


def make_server(
    forward: Callable[[np.ndarray], np.ndarray],
    *,
    family: str,
    host: str = "127.0.0.1",
    port: int = 0,
    size: int = 0,
    max_batch: int = 8,
    max_wait_ms: float = 5.0,
    max_pending: int = 256,
    bucket_multiple: int = 64,
) -> StylizeServer:
    """Wire a stylize_u8-style callable behind the HTTP front end.

    ``port=0`` binds an ephemeral port (tests); read it back from
    ``server.server_address[1]``.
    """
    batcher = MicroBatcher(
        forward, max_batch=max_batch, max_wait_ms=max_wait_ms,
        max_pending=max_pending, bucket_multiple=bucket_multiple)
    return StylizeServer((host, port), batcher, family=family, size=size)


def _build_forward(args) -> tuple:
    """Resolve CLI flags to (stylize_u8 callable, family label)."""
    sharding = None
    if args.data_parallel:
        from fast_neural_style_transfer_tpu.parallel.mesh import make_mesh_plan

        sharding = make_mesh_plan().batch_sharding
    if args.adain_decoder:
        if not args.style:
            raise SystemExit("--adain-decoder needs --style <image>")
        from PIL import Image

        from fast_neural_style_transfer_tpu.cli.adain import load_decoder
        from fast_neural_style_transfer_tpu.infer.adain import ArbitraryStylizer
        from fast_neural_style_transfer_tpu.models.vgg_weights import (
            resolve_params,
        )

        sty = ArbitraryStylizer(
            load_decoder(args.adain_decoder),
            resolve_params(args.vgg_weights),
            precision=args.precision, sharding=sharding)
        style = np.asarray(
            Image.open(args.style).convert("RGB"), dtype=np.uint8)
        sty.set_style_u8(style)
        alpha = args.alpha
        return (lambda b: sty.stylize_u8(b, alpha=alpha)), "adain"
    if not args.model:
        raise SystemExit("pass --model (flagship) or --adain-decoder + --style")
    from fast_neural_style_transfer_tpu.infer.stylize import Stylizer

    style = None
    if args.style_index is not None:
        style = args.style_index
    sty = Stylizer.from_checkpoint(
        args.model, style=style, precision=args.precision,
        preserve_color=args.preserve_color, sharding=sharding)
    return sty.stylize_u8, "flagship"


def main(argv: Optional[list] = None) -> None:
    p = argparse.ArgumentParser(
        prog="fnst-serve",
        description="Online stylization HTTP service with micro-batching")
    p.add_argument("--model", help="flagship checkpoint (.npz/.pth/Orbax dir)")
    p.add_argument("--style_index", type=int, default=None,
                   help="style selection for multi-style checkpoints")
    p.add_argument("--adain-decoder", help="AdaIN decoder checkpoint")
    p.add_argument("--style", help="style image for --adain-decoder")
    p.add_argument("--alpha", type=float, default=1.0,
                   help="AdaIN stylization strength")
    p.add_argument("--vgg_weights", default=None,
                   help="VGG19 weights (.npz/.pth) for the AdaIN encoder")
    p.add_argument("--precision", default="bf16",
                   choices=["f32", "bf16", "int8"],
                   help="serving compute dtype (int8: flagship only)")
    p.add_argument("--preserve_color", default="off", choices=["off", "luma"])
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--size", type=int, default=0,
                   help=">0: resize every request to SIZE x SIZE (one "
                        "compiled program); 0: native sizes, bucketed")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard coalesced batches over every chip on the "
                        "mesh (params replicated; batches whose size "
                        "divides the mesh run data-parallel)")
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--max_pending", type=int, default=256)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (demo without a chip)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    forward, family = _build_forward(args)
    # Warm the canonical bucket before accepting traffic so the first
    # request doesn't eat the ~20-40 s TPU compile.
    warm = args.size if args.size > 0 else 256
    forward(np.zeros((1, warm, warm, 3), np.uint8))

    srv = make_server(
        forward, family=family, host=args.host, port=args.port,
        size=args.size, max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms, max_pending=args.max_pending)
    host, port = srv.server_address[:2]

    # SIGTERM (the TPU-VM preemption signal) drains like Ctrl-C: stop
    # accepting, finish in-flight batches, fail what's still queued.
    # Installed BEFORE the ready banner: the banner is the documented
    # "safe to preempt" point, so the handler must already be live when a
    # supervisor reacts to it (a SIGTERM landing in the gap used to hit
    # the default action and kill the process with rc -15).
    import signal

    def _term(signum, frame):
        threading.Thread(target=srv.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _term)

    print(f"fnst-serve: {family} model on http://{host}:{port} "
          f"(max_batch={args.max_batch}, wait={args.max_wait_ms} ms)",
          flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        threading.Thread(target=srv.shutdown, daemon=True).start()


if __name__ == "__main__":
    main()
