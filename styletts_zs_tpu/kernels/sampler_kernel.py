"""Pallas TPU kernel: fused CFG guidance + ODE update (sampler step tail).

The "fused diffusion sampling step (denoiser step + CFG-doubled batch +
guidance combine)" obligation of ``BASELINE.json:5`` / SURVEY.md §2.3.  The
denoiser forward itself runs through the Pallas attention kernels; this
kernel fuses everything AFTER it — guidance combine, score evaluation, and
the Euler / Heun-correction update — into one VPU pass, so the doubled-batch
denoiser output never round-trips to HBM between those elementwise stages.

Twin: the inline jnp expressions in ``models/diffusion.py`` (use_pallas=False).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _euler_kernel(s_ref, x_ref, dc_ref, du_ref, x_out, d_out, *,
                  guidance: float):
    """x_next = x + (s_next - s_cur) * d,  d = (x - den)/s_cur,
    den = du + g*(dc - du).  Also emits d (needed by the Heun correction)."""
    s_cur = s_ref[0, 0]
    s_next = s_ref[0, 1]
    x = x_ref[0, :, :].astype(jnp.float32)
    dc = dc_ref[0, :, :].astype(jnp.float32)
    du = du_ref[0, :, :].astype(jnp.float32)
    den = du + guidance * (dc - du)
    d = (x - den) / s_cur
    x_out[0, :, :] = (x + (s_next - s_cur) * d).astype(x_out.dtype)
    d_out[0, :, :] = d.astype(d_out.dtype)


def _heun_kernel(s_ref, x_ref, xe_ref, dc_ref, du_ref, d1_ref, x_out, *,
                 guidance: float):
    """Heun: x_next = x + (s_next - s_cur) * 0.5 * (d1 + d2),
    d2 = (x_euler - den2)/s_next, den2 = du + g*(dc - du)."""
    s_cur = s_ref[0, 0]
    s_next = s_ref[0, 1]
    x = x_ref[0, :, :].astype(jnp.float32)
    xe = xe_ref[0, :, :].astype(jnp.float32)
    dc = dc_ref[0, :, :].astype(jnp.float32)
    du = du_ref[0, :, :].astype(jnp.float32)
    d1 = d1_ref[0, :, :].astype(jnp.float32)
    den2 = du + guidance * (dc - du)
    d2 = (xe - den2) / jnp.maximum(s_next, 1e-8)
    x_out[0, :, :] = (x + (s_next - s_cur) * 0.5 * (d1 + d2)).astype(
        x_out.dtype)


def _specs(B, K, D):
    blk = pl.BlockSpec((1, K, D), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    s_blk = pl.BlockSpec((1, 2), lambda b: (0, 0), memory_space=pltpu.SMEM)
    return blk, s_blk


@functools.partial(jax.jit, static_argnames=("guidance",))
def fused_euler_step(x, den_cond, den_uncond, s_cur, s_next, *,
                     guidance: float):
    """Returns (x_euler, d_cur); twin of the inline Euler update."""
    B, K, D = x.shape
    blk, s_blk = _specs(B, K, D)
    sig = jnp.stack([s_cur, s_next]).astype(jnp.float32)[None, :]
    return pl.pallas_call(
        functools.partial(_euler_kernel, guidance=guidance),
        grid=(B,),
        in_specs=[s_blk, blk, blk, blk],
        out_specs=(blk, blk),
        out_shape=(jax.ShapeDtypeStruct((B, K, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, K, D), jnp.float32)),
        interpret=_interpret(),
    )(sig, x, den_cond, den_uncond)


@functools.partial(jax.jit, static_argnames=("guidance",))
def fused_heun_correction(x, x_euler, den2_cond, den2_uncond, d_cur, s_cur,
                          s_next, *, guidance: float):
    B, K, D = x.shape
    blk, s_blk = _specs(B, K, D)
    sig = jnp.stack([s_cur, s_next]).astype(jnp.float32)[None, :]
    return pl.pallas_call(
        functools.partial(_heun_kernel, guidance=guidance),
        grid=(B,),
        in_specs=[s_blk, blk, blk, blk, blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, K, D), jnp.float32),
        interpret=_interpret(),
    )(sig, x, x_euler, den2_cond, den2_uncond, d_cur)
