"""event_flow_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for self-supervised
event-camera optical flow with spiking and artificial neural networks.

Functionally equivalent to tudelft/event_flow (NeurIPS'21), re-architected for TPU:

- on-device, vectorized event->tensor encodings (count / voxel / mask images)
- pure-functional recurrent ANN (FireNet / EV-FlowNet / E2VID) and spiking
  (LIF / PLIF / ALIF / XLIF) convolutional cells, scanned over event windows
  with surrogate-gradient BPTT (``lax.scan`` + ``jax.custom_vjp``)
- contrast-maximization ("image of warped events") loss built on a bilinear
  scatter-add kernel with an analytic backward (XLA scatter / Pallas on TPU)
- SPMD data parallelism over a ``jax.sharding.Mesh`` (batch axis), with the
  event axis of the loss shardable across devices
- streaming HDF5 event pipeline with explicit, functional stream state

Layer map mirrors the reference (see SURVEY.md):
  config/   <- configs/parser.py
  data/     <- dataloader/{h5,base,encodings}.py (encodings moved on-device: ops/)
  ops/      <- utils/iwe.py + models/spiking_util.py + dataloader/encodings.py
  models/   <- models/*
  loss/     <- loss/flow.py
  train/    <- train_flow.py internals
  eval/     <- eval_flow.py internals
  parallel/ <- (new capability; reference is single-device)
  utils/    <- utils/{utils,mlflow,gradients,visualization}.py
"""

__version__ = "0.1.0"
