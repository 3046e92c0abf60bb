"""Online serving: HTTP front end + request micro-batching.

The reference's deployment is an external onnxruntime-web app
(/root/reference/README.md:26); this subpackage is the TPU-native
equivalent — the trained model served from the chip, with concurrent
requests coalesced into device batches (serve/batcher.py) behind a
stdlib HTTP server (serve/http.py, ``fnst-serve``).
"""

from fast_neural_style_transfer_tpu.serve.batcher import (
    MicroBatcher,
    QueueFull,
    ServingStats,
)
from fast_neural_style_transfer_tpu.serve.http import (
    StylizeServer,
    make_server,
)

__all__ = [
    "MicroBatcher",
    "QueueFull",
    "ServingStats",
    "StylizeServer",
    "make_server",
]
