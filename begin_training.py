#!/usr/bin/env python
"""Repo-root entry point, argument-compatible with the reference's
``python begin_training.py --style_image ... --lr ...``."""

from fast_neural_style_transfer_tpu.cli.begin_training import main

if __name__ == "__main__":
    main()
