"""siammask_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video tracking + segmentation
framework with the capabilities of foolwood/SiamMask.

Design stance (vs the PyTorch reference at /root/reference):

- Models are pure functions over parameter pytrees (no stateful modules); layout is
  NHWC, convs lower to XLA's TPU-native `lax.conv_general_dilated`.
- The tracker is a functional state machine: `tracker_init` / `tracker_step` thread a
  `TrackState` pytree; a whole video is `jax.lax.scan` over frames, fully on-device
  (crop, decode, penalty window, argmax, mask warp-back — one compiled program).
- Training is a pjit'd step over a `jax.sharding.Mesh` with psum gradient collectives.
- Host-side work (image decode, dataset sampling, benchmark file IO) stays host-side;
  everything hot runs under jit.
"""

__version__ = "0.1.0"

from siammask_tpu import config  # noqa: F401
