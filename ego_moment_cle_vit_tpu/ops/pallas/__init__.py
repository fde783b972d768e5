"""Pallas TPU kernels for the hot bilinear math.

Fused, VMEM-resident implementations of the pipeline's non-backbone hot ops
(BASELINE.json north star): the GPF dual-Gram + polynomial fusion, and the
Newton–Schulz iSQRT iteration.  Each exposes a ``*_pallas`` function with a
``jax.custom_vjp`` whose backward recomputes through the numerically
identical pure-XLA path (exact same math, so gradients are exact), plus an
``available(...)`` predicate the dispatcher uses (VMEM budget, platform).

On non-TPU platforms the pure-XLA ops in :mod:`..graph` / :mod:`..moments`
are used unconditionally.
"""

from .gpf import fused_gpf_pallas, fused_gpf_available
from .newton_schulz import newton_schulz_isqrt_pallas, newton_schulz_available
from .window_attention import flash_window_attention, window_attention_available
from .flash_attention import flash_attention_tiled, flash_attention_tiled_available

__all__ = [
    "fused_gpf_pallas",
    "fused_gpf_available",
    "newton_schulz_isqrt_pallas",
    "newton_schulz_available",
    "flash_window_attention",
    "window_attention_available",
    "flash_attention_tiled",
    "flash_attention_tiled_available",
]
