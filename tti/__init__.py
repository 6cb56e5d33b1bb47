"""tti — textile TPU inspection.

A TPU-native (JAX/XLA/Pallas/pjit) fabric & stitch inspection framework with the
capabilities of ``RishWijewardhena/vision-textile-inspection`` (see SURVEY.md),
re-designed TPU-first:

- ``tti.core``        typed config (no import side effects), logging, errors
- ``tti.calib``       intrinsics/extrinsics IO, ChArUco+PnP (host), ray-plane px->mm (device)
- ``tti.model``       YOLOv8-seg (n/s/m) in flax, NHWC, bf16-friendly; .pt converter
- ``tti.preprocess``  fused undistort + letterbox + normalize, traced into the model graph
- ``tti.postprocess`` DFL decode, fixed-shape batched XLA NMS, mask assembly
- ``tti.kernels``     Pallas TPU kernels (fused remap, mask-proto stage)
- ``tti.measure``     vectorized seam/stitch measurement (envelope, moments, k-means,
                      temporal smoothing) as one jitted op
- ``tti.parallel``    mesh/sharding helpers, batched stream runtime, training step
- ``tti.services``    serial stitch counter, database, MQTT heartbeat, file cleaner
- ``tti.app``         orchestrator (calibrate -> init -> loop -> persist), annotation
- ``tti.cli``         calibrate / run / check-model / capture / bench subcommands
"""

__version__ = "0.1.0"
