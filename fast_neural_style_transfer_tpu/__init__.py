"""TPU-native fast neural style transfer framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
HajarHAMDOUCH01/Fast-neural-style-transfer (Johnson et al. 2016 perceptual-loss
feed-forward stylization with instance normalization), designed TPU-first:

- NHWC layouts everywhere (TPU-native), bf16-capable compute with f32 accumulation
- one jitted train step containing stylizer forward + 2x VGG forward + losses +
  grad + Adam update (reference runs these as separate eager calls:
  /root/reference/train.py:162-291)
- data parallelism via ``jax.sharding`` over an ICI mesh (the reference is
  single-device eager PyTorch: /root/reference/train.py:22)
- Pallas kernels for the hot fused ops (Gram matrix, instance-norm fusions)
- host-side input pipeline overlapped with device compute

Beyond the reference: multi-style training in one net (conditional instance
norm, baked for serving — models/transformer.py), AdaIN arbitrary-style
transfer (models/adain.py: any style image at inference, cached-style
serving, spatial sharding, ONNX + torch interchange), int8/u8 serving paths,
and H-sharded spatial parallelism for very large images.

Package layout:
    core/      dtypes, prng, padding/shape utilities
    ops/       conv / norm / gram ops (XLA lowering + Pallas kernels)
    models/    TransformerNet stylizer + VGG19 feature extractor + weight IO
    losses/    perceptual losses with reference-exact normalizations
    data/      dataset scan/decode + prefetching pipeline
    train/     schedules, jitted train step, training loop, checkpointing
    parallel/  mesh construction + sharding policies
    infer/     arbitrary-resolution stylization with shape bucketing
    export/    ONNX export + PyTorch checkpoint interchange
    utils/     image IO, metric logging
"""

__version__ = "0.1.0"
