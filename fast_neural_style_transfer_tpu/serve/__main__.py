"""``python -m fast_neural_style_transfer_tpu.serve`` -> fnst-serve."""

from fast_neural_style_transfer_tpu.serve.http import main

main()
