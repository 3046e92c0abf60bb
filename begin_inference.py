#!/usr/bin/env python
"""Repo-root entry point, argument-compatible with the reference's
``python begin_inference.py --model_path ... --content_image ...``."""

from fast_neural_style_transfer_tpu.cli.begin_inference import main

if __name__ == "__main__":
    main()
