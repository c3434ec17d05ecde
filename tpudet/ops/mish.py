"""Mish activation: ``x * tanh(softplus(x))``.

The reference ships a fused CUDA/C++ kernel for this
(mmdet/ops/mish_cuda/src/mish.h:33-49, fp16 computed as fp32, softplus
overflow-guarded at THRESHOLD=20) because torch would otherwise materialize
intermediates. On TPU the calculus is different: XLA fuses the whole
expression into the consumer/producer HLO (typically the conv epilogue), so
the idiomatic "kernel" is plain jnp — zero extra HBM traffic. A Pallas
version is provided for measurement and as the template for future fused
epilogues; `mish` points at the jnp path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mish_reference(x: jax.Array) -> jax.Array:
    """Numerically-stable mish, computed in fp32 like the reference kernel
    (mish.h:37-42: fp16/bf16 inputs are upcast for the transcendental)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    # jax.nn.softplus == log1p(exp(-|x|)) + max(x, 0): stable for large |x|,
    # matching the reference's THRESHOLD=20 guard (mish.h:13).
    out = xf * jnp.tanh(jax.nn.softplus(xf))
    return out.astype(dtype)


def mish(x: jax.Array) -> jax.Array:
    """Dtype-preserving mish: bf16 inputs compute in bf16.

    The reference upcasts fp16 to fp32 because fp16's 5-bit exponent
    overflows softplus; bf16 shares fp32's 8-bit exponent, so the guard is
    unnecessary and the upcast would double VPU work across every conv in
    the network. fp32 inputs still compute in fp32 (bit-compatible with
    `mish_reference` for parity runs).

    The bf16 path uses the ONE-exp rational identity

        tanh(softplus(x)) = u(u+2) / (u^2 + 2u + 2),   u = e^x

    (substitute e^softplus(x) = 1+e^x into tanh's exponential form)
    instead of the literal softplus+tanh chain: one transcendental + one
    divide replaces three polynomial-approximated transcendentals on the
    VPU. Measured on the yolov4l-640 batch-128 e2e bench this is worth
    +8% end-to-end (774 -> 837 img/s; an identity activation bounds the
    total mish cost at 856, so the rational form recovers ~80% of it).
    Past x=8 the function saturates to identity explicitly (see inline
    note); numerics are bf16 round-noise equivalent to the previous
    path (most bf16 inputs bit-identical; error vs the fp32 reference
    stays within a few bf16 ulp, same class as the literal chain —
    pinned by tests/test_ops/test_mish.py::test_mish_bf16_rational_form).
    """
    if x.dtype != jnp.bfloat16:
        # fp32 computes the literal chain (bit-compatible with the
        # reference kernel); fp16 upcasts exactly like the reference
        # (mish.h:37-42) — its 5-bit exponent would overflow u^2 below
        return mish_reference(x)
    # clamp at 8: past it tanh(softplus(x)) is 1.0 in bf16, and with
    # u = e^8 ~ 3e3 the +2u+2 terms fall below one ulp of u^2, so
    # numerator and denominator round to the SAME value and the ratio
    # saturates to exactly 1.0 — no select needed (a jnp.where here
    # measured -27 img/s on the e2e bench)
    u = jnp.exp(jnp.minimum(x, jnp.asarray(8.0, x.dtype)))
    return x * (u * (u + 2.0)) / (u * u + 2.0 * u + 2.0)


def _mish_fwd_kernel(x_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    o_ref[...] = (x * jnp.tanh(jax.nn.softplus(x))).astype(o_ref.dtype)


def _mish_bwd_kernel(x_ref, g_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    sp = jax.nn.softplus(x)
    tsp = jnp.tanh(sp)
    # d/dx [x*tanh(softplus(x))] = tsp + x * (1-tsp^2) * sigmoid(x)
    grad = tsp + x * (1.0 - tsp * tsp) * jax.nn.sigmoid(x)
    o_ref[...] = (g * grad).astype(o_ref.dtype)


def _pallas_elementwise(kernel, out_dtype, *arrays):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = arrays[0]
    flat = [a.reshape(-1) for a in arrays]
    n = flat[0].shape[0]
    # pad to (rows, 1024) lanes-aligned tiles
    width = 1024
    rows = -(-n // width)
    padded = [jnp.pad(a, (0, rows * width - n)).reshape(rows, width)
              for a in flat]
    # keep blocks small: in+out (+grad) double-buffered must fit ~16MB VMEM
    block_rows = min(rows, 512)
    grid = (-(-rows // block_rows),)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, width), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM) for _ in padded
        ],
        out_specs=pl.BlockSpec((block_rows, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(*padded)
    return out.reshape(-1)[:n].reshape(x.shape)


@jax.custom_vjp
def mish_pallas(x: jax.Array) -> jax.Array:
    """Pallas elementwise mish with a custom VJP (fwd saves only ``x``,
    mirroring the reference autograd wrapper mish.py:10-30)."""
    return _pallas_elementwise(_mish_fwd_kernel, x.dtype, x)


def _mish_pallas_fwd(x):
    return mish_pallas(x), x


def _mish_pallas_bwd(x, g):
    return (_pallas_elementwise(_mish_bwd_kernel, x.dtype, x, g),)


mish_pallas.defvjp(_mish_pallas_fwd, _mish_pallas_bwd)
