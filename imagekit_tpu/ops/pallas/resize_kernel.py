"""Fused separable resample as a Pallas TPU kernel.

One grid program per image plane resamples vertically and horizontally in
a single kernel invocation:

    out[b] = clamp(round( Wv[idx[b]] @ plane[b] @ Wh[idx[b]]^T ))

- the f32 intermediate (OH, W) lives in VMEM scratch — the XLA einsum
  version writes it to HBM between the passes (~(OH*W*4)B/image of
  round-trip traffic saved);
- the vertical pass runs in W-tiles so a 1088x1920 u8 plane + f32 tile +
  intermediate + both weight matrices stay under the ~16 MB VMEM budget;
- per-image weight selection uses scalar prefetch (``vidx``) with the
  unique-weight stacks resident in HBM/ANY and the selected matrices
  DMA'd in per program.

Planes beyond the VMEM budget fall back to the einsum path (the caller
checks :func:`fits_vmem`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagekit_tpu.utils.precision import MATMUL_PRECISION

# conservative VMEM budget (bytes) for the working set
_VMEM_BUDGET = 14 * 1024 * 1024
_W_TILE = 512


def fits_vmem(h: int, w: int, oh: int, ow: int) -> bool:
    plane_u8 = h * w
    tile_f32 = h * _W_TILE * 4
    tmp_f32 = oh * w * 4
    wv = oh * h * 4
    wh = ow * w * 4
    out = oh * ow
    return plane_u8 + tile_f32 + tmp_f32 + wv + wh + out < _VMEM_BUDGET


def _resize_plane_kernel(
    vidx_ref,       # scalar prefetch: (B,) i32
    plane_ref,      # (1, H, W) u8 block (this image)
    wv_hbm,         # (U, OH, H) f32 in ANY/HBM
    wh_hbm,         # (U, OW, W) f32 in ANY/HBM
    out_ref,        # (1, OH, OW) u8 block
    wv_vmem,        # scratch (OH, H) f32
    wh_vmem,        # scratch (OW, W) f32
    tmp_ref,        # scratch (OH, W) f32
    sem,            # DMA semaphores (2,)
):
    b = pl.program_id(0)
    u = vidx_ref[b]

    # DMA the selected weight matrices into VMEM
    cp_v = pltpu.make_async_copy(wv_hbm.at[u], wv_vmem, sem.at[0])
    cp_h = pltpu.make_async_copy(wh_hbm.at[u], wh_vmem, sem.at[1])
    cp_v.start()
    cp_h.start()
    cp_v.wait()

    h = plane_ref.shape[1]
    w = plane_ref.shape[2]
    n_tiles = w // _W_TILE
    rem = w - n_tiles * _W_TILE

    # vertical pass, W-tiled: tmp[:, t] = Wv @ plane[:, t]
    def body(t, _):
        start = t * _W_TILE
        # Mosaic can't cast u8->f32 directly; hop through i32
        tile = plane_ref[0, :, pl.ds(start, _W_TILE)].astype(jnp.int32).astype(jnp.float32)
        tmp_ref[:, pl.ds(start, _W_TILE)] = jax.lax.dot(
            wv_vmem[...], tile, preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, n_tiles, body, 0)
    if rem:
        start = n_tiles * _W_TILE
        tile = plane_ref[0, :, pl.ds(start, rem)].astype(jnp.int32).astype(jnp.float32)
        tmp_ref[:, pl.ds(start, rem)] = jax.lax.dot(
            wv_vmem[...], tile, preferred_element_type=jnp.float32
        )

    cp_h.wait()
    # horizontal pass on the VMEM-resident intermediate
    out = jax.lax.dot_general(
        tmp_ref[...],
        wh_vmem[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (OH, OW)
    out = jnp.clip(out, 0.0, 255.0)
    out_ref[0] = jnp.floor(out + 0.5).astype(jnp.int32).astype(jnp.uint8)


def _ceil128(x: int) -> int:
    return (x + 127) // 128 * 128


@functools.partial(jax.jit, static_argnames=("interpret",))
def resize_planes_pallas(
    planes: jax.Array,  # (B, H, W) u8
    wv_u: jax.Array,    # (U, OH, H) f32
    wh_u: jax.Array,    # (U, OW, W) f32
    vidx: jax.Array,    # (B,) i32
    interpret: bool = False,
) -> jax.Array:
    """(B, H, W) u8 -> (B, OH, OW) u8 with per-image weight selection.

    Mosaic requires HBM DMA slices 128-aligned on the minor dim, so H/W
    (and the weight stacks' contraction dims) zero-pad up to multiples of
    128 — free, because weight columns beyond the true size are zero."""
    return pallas_resize_u8(planes, wv_u, wh_u, vidx)


def pallas_resize_u8(planes, wv_u, wh_u, vidx):
    """Traceable core (callable from inside other jitted kernels):
    pads to Mosaic's 128 alignment and invokes the fused kernel."""
    B, H, W = planes.shape
    U, OH, _ = wv_u.shape
    OW = wh_u.shape[1]
    Hp, Wp = _ceil128(H), _ceil128(W)
    if Hp != H or Wp != W:
        planes = jnp.pad(planes, ((0, 0), (0, Hp - H), (0, Wp - W)))
        wv_u = jnp.pad(wv_u, ((0, 0), (0, 0), (0, Hp - H)))
        wh_u = jnp.pad(wh_u, ((0, 0), (0, 0), (0, Wp - W)))
        H, W = Hp, Wp

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H, W), lambda b, vidx: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, OH, OW), lambda b, vidx: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((OH, H), jnp.float32),
            pltpu.VMEM((OW, W), jnp.float32),
            pltpu.VMEM((OH, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _resize_plane_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, OH, OW), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (OH * H * W + OH * OW * W),
            bytes_accessed=B * (H * W + OH * OW) + U * 4 * (OH * H + OW * W),
            transcendentals=0,
        ),
    )(vidx, planes, wv_u, wh_u)


def _resize_plane_kernel_f32(
    vidx_ref, plane_ref, wv_hbm, wh_hbm, out_ref, wv_vmem, wh_vmem, tmp_ref, sem
):
    """f32-in / f32-out variant used inside the fused JPEG decode kernel
    (colour conversion follows the resize, so no clamp/round here)."""
    b = pl.program_id(0)
    u = vidx_ref[b]
    cp_v = pltpu.make_async_copy(wv_hbm.at[u], wv_vmem, sem.at[0])
    cp_h = pltpu.make_async_copy(wh_hbm.at[u], wh_vmem, sem.at[1])
    cp_v.start()
    cp_h.start()
    cp_v.wait()
    w = plane_ref.shape[2]
    n_tiles = w // _W_TILE
    rem = w - n_tiles * _W_TILE

    def body(t, _):
        start = t * _W_TILE
        tile = plane_ref[0, :, pl.ds(start, _W_TILE)]
        tmp_ref[:, pl.ds(start, _W_TILE)] = jax.lax.dot(
            wv_vmem[...], tile, preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, n_tiles, body, 0)
    if rem:
        start = n_tiles * _W_TILE
        tile = plane_ref[0, :, pl.ds(start, rem)]
        tmp_ref[:, pl.ds(start, rem)] = jax.lax.dot(
            wv_vmem[...], tile, preferred_element_type=jnp.float32
        )
    cp_h.wait()
    out_ref[0] = jax.lax.dot_general(
        tmp_ref[...],
        wh_vmem[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def resize_planes_f32_pallas(planes, wv_u, wh_u, vidx):
    """(B, H, W) f32 -> (B, OH, OW) f32; trace-time shapes must already be
    128-aligned on H/W (the fused decode kernel's plane buckets are)."""
    B, H, W = planes.shape
    U, OH, _ = wv_u.shape
    OW = wh_u.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H, W), lambda b, vidx: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, OH, OW), lambda b, vidx: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((OH, H), jnp.float32),
            pltpu.VMEM((OW, W), jnp.float32),
            pltpu.VMEM((OH, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _resize_plane_kernel_f32,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, OH, OW), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (OH * H * W + OH * OW * W),
            bytes_accessed=4 * (B * (H * W + OH * OW) + U * (OH * H + OW * W)),
            transcendentals=0,
        ),
    )(vidx, planes, wv_u, wh_u)


def fits_vmem_f32(h: int, w: int, oh: int, ow: int) -> bool:
    plane = h * w * 4
    tmp = oh * w * 4
    wv = oh * h * 4
    wh = ow * w * 4
    out = oh * ow * 4
    return plane + tmp + wv + wh + out < _VMEM_BUDGET


def resize_planes(
    planes: np.ndarray | jax.Array,
    wv_u: np.ndarray,
    wh_u: np.ndarray,
    vidx: np.ndarray,
) -> jax.Array:
    """Dispatch: Pallas when the working set fits VMEM, einsum otherwise."""
    B, H, W = planes.shape
    OH = wv_u.shape[1]
    OW = wh_u.shape[1]
    if fits_vmem(H, W, OH, OW) and _pallas_ok():
        return resize_planes_pallas(
            jnp.asarray(planes),
            jnp.asarray(wv_u),
            jnp.asarray(wh_u),
            jnp.asarray(vidx),
        )
    return _resize_planes_einsum(
        jnp.asarray(planes),
        jnp.asarray(wv_u),
        jnp.asarray(wh_u),
        jnp.asarray(vidx),
    )


@jax.jit
def _resize_planes_einsum(planes, wv_u, wh_u, vidx):
    hp = MATMUL_PRECISION
    x = planes.astype(jnp.float32)
    wv = wv_u[vidx]
    wh = wh_u[vidx]
    x = jnp.einsum("boh,bhw->bow", wv, x, precision=hp)
    x = jnp.einsum("bpw,bow->bop", wh, x, precision=hp)
    x = jnp.clip(x, 0.0, 255.0)
    return jnp.floor(x + 0.5).astype(jnp.uint8)


_PALLAS_STATE = {"ok": None}


def _pallas_ok() -> bool:
    """Pallas TPU kernels need a TPU (or interpret mode); probe once."""
    if _PALLAS_STATE["ok"] is None:
        import os

        if os.environ.get("IMAGEKIT_NO_PALLAS"):
            _PALLAS_STATE["ok"] = False
        else:
            try:
                # the default *device* decides where jit computations run;
                # a pinned CPU default (tests) must disable the TPU kernels
                # even when the TPU backend is registered
                dev = getattr(jax.config, "jax_default_device", None)
                if dev is not None:
                    _PALLAS_STATE["ok"] = dev.platform == "tpu"
                else:
                    _PALLAS_STATE["ok"] = jax.default_backend() == "tpu"
            except Exception:
                _PALLAS_STATE["ok"] = False
    return _PALLAS_STATE["ok"]
