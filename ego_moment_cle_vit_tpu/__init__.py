"""EGO-Moment-CLE-ViT — TPU-native (JAX / XLA / Pallas / pjit) framework.

A from-scratch, TPU-first rebuild of the capabilities of
``hibana2077/EGO-Moment-CLE-ViT`` (reference: /root/reference):

- CLE-ViT dual-stream backbone (anchor + masked/shuffled positive view),
  with the dual-view augmentation running **on device** as XLA ops.
- EGO-style Graph Polynomial Fusion (GPF) of the two views' token-similarity
  graphs (learnable non-negative Hadamard-power coefficients, PSD-preserving
  symmetrization).
- Graph-weighted high-order moment pooling: second-order covariance with
  Newton–Schulz iSQRT-COV normalization; optional third-order moments via
  Tensor-Sketch (FFT-correct count-sketch, MXU-friendly one-hot matmuls).
- Cross-entropy + instance triplet + CKA kernel-alignment training losses.
- UFG parquet datasets (cotton80, soybean, soy_ageing_*).
- Data-parallel (+ tensor-parallel moment projection) scaling over TPU meshes
  via ``jax.sharding`` / ``jit``.

Subpackages
-----------
ops       Pure-function math core (graph ops, moments, sketch) + Pallas kernels.
models    Flax modules: ViT/Swin backbones, GPF, MomentHead, ClassifierHead,
          and the EGOMomentCLEViT composition.
losses    Triplet and kernel-alignment loss library (vectorized).
data      UFGVC parquet datasets and the on-device dual-view augmentation.
parallel  Mesh/sharding helpers.
train     Train state, optimizer/schedule factory, Trainer/Evaluator engines.
utils     Config, seeding, model introspection, visualization.
"""

__version__ = "0.4.0"
