"""dpcx — Differentiable Point Clouds, TPU-native.

A ground-up JAX/Flax/Pallas re-design of the capabilities of the public
reference `eldar/differentiable-point-clouds` (Insafutdinov & Dosovitskiy,
"Unsupervised Learning of Shape and Pose with Differentiable Point Clouds",
NeurIPS 2018): single-view 3D shape + pose estimation trained purely from
silhouette/depth re-projection consistency, with no 3D supervision.

Layer map (see SURVEY.md §2):

- ``dpcx.geometry``  — quaternion + camera math (ref: dpc/util/quaternion.py,
  dpc/util/camera.py).
- ``dpcx.render``    — the differentiable point-cloud renderer: perspective
  transform, trilinear scatter-splat voxelization, separable Gaussian
  smoothing, DRC expected-visibility projection (ref: dpc/util/point_cloud.py,
  dpc/util/gauss_kernel.py, dpc/util/drc.py). Pure-XLA oracle path plus a
  fused Pallas TPU kernel.
- ``dpcx.nets``      — Flax modules: conv image encoder, FC point-cloud
  decoder, pose-ensemble heads (ref: dpc/nets/).
- ``dpcx.models``    — model assembly + losses incl. min-over-candidates pose
  loss and student distillation (ref: dpc/models/model_pc.py).
- ``dpcx.data``      — jit-compiled synthetic datagen + shard reader
  (replaces the reference's Blender-side scripts, ref: data/ + densify/).
- ``dpcx.train``     — training loop: optax Adam, data-parallel sharding over
  a device mesh, Orbax checkpoints (ref: dpc/run/train_eval.py).
- ``dpcx.eval``      — Chamfer distance + pose metrics
  (ref: dpc/util/point_cloud_distance.py, dpc/run/predict_eval.py).
- ``dpcx.parallel``  — mesh/sharding helpers (no reference counterpart; the
  reference is single-GPU).
"""

__version__ = "0.1.0"
