"""Pallas identity copy used as an XLA fusion barrier.

The axon TPU worker faults ("TPU worker process crashed") on certain
fusions of evaluate_shadow's gather-heavy subgraph with its consumers
(device-bisected, tools/repro_eval_kernel.py: the subgraph passes when
its result is a jit OUTPUT, crashes when fused into ANY further
elementwise/data-movement consumer — even a jnp.pad feeding a pallas
call; lax.optimization_barrier is not supported by the backend).

A pallas_call lowers to a custom call, and XLA cannot fuse a producer
into a custom-call operand — so an identity pallas copy makes the
producer subgraph end exactly as if it were a jit root (the passing
configuration). CRITICAL: there must be NO XLA ops between the producer
and the pallas call (no pad, no reshape) or that op becomes the fusible
consumer that crashes. The kernel therefore takes the array at its
natural shape and lets Mosaic handle lane/sublane padding internally.
Cost: one VMEM round-trip over the array (~microseconds at shadow-mask
resolutions).
"""

from __future__ import annotations

import jax
from jax.experimental import pallas as pl

import jax.numpy as jnp


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def fusion_barrier(x: jnp.ndarray) -> jnp.ndarray:
    """Identity, but the producer can no longer fuse into any consumer.

    Whole-array single-block copy — works for any shape/dtype small
    enough for VMEM (shadow masks are ~0.5 MB). No XLA-side reshape or
    pad is inserted (that would re-create the crashing fusion).
    """
    return pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x)
