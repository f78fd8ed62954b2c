"""Fused-subcycle EVP Pallas kernel (evp_algorithm='fused_pallas').

The TPU-native answer to the reference's performance EVP path
(ice_dyn_evp1d.F90 / ice_dyn_core1d.F90 — its gathered shared-memory /
OpenMP-target "accelerator kernel" form of the B-grid subcycle loop,
SURVEY.md §2.3). The reference strategy (gather the planet to one node,
vectorize, scatter back) makes no sense on TPU; the TPU bottleneck is HBM
bandwidth: the plain XLA `fori_loop` streams the ~40-plane working set
from HBM once per subcycle (ndte=120 times). This kernel instead:

 - tiles the domain in y (full rows, so EW-cyclic wrap stays a cheap
   in-register `roll`),
 - DMAs each tile's working set (constants + state, stacked as planes)
   into VMEM once,
 - runs K subcycles entirely in VMEM (the wide-halo trade: halo width
   2K+2 rows of redundant compute buys K subcycles per HBM round trip —
   the freedom the reference notes but never exercises,
   ug_implementation.rst:215-217),
 - writes back the tile interior.

HBM traffic drops by ~K×. The stress/momentum math is literally the same
code as the XLA path (dynamics/evp.py stress_update + common.stepu_dense
traced inside the kernel — core/halo.shift lowers in Pallas by design).
Supported: ew 'cyclic'/'open'/'closed', ns 'open'/'closed' (zero-ghost
semantics provided by the zero padding); tripole/y-cyclic fall back to
the XLA path.

Measured (v5e-1, gx1 320x384, ndte=120, f32): 356 M pt·sub/s vs the XLA
fori_loop's 517 M pt·sub/s. The current Mosaic build stages the full
output plane set in scoped VMEM regardless of the HBM out-spec, which
caps tile_y and raises the wide-halo redundancy to ~3x — the kernel is
compute-bound on that redundancy, so `evp_algorithm='standard_2d'`
remains the default; 'fused_pallas' is the scaling path for domains
where per-subcycle HBM streaming dominates (large ny on multi-chip
meshes, where the XLA loop's working set no longer fits cache-resident
fusion windows).
"""

from __future__ import annotations

import math
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.grid import Grid
from ..dynamics.common import DynPrep, EvpParams, stepu_dense

N_CONST = 26
N_STATE = 14


def _pack_const(grid: Grid, prep: DynPrep, strength, DminTarea, uocn, vocn):
    f = lambda x: x.astype(jnp.float32)
    planes = [
        f(grid.dxT), f(grid.dyT), f(grid.cxm), f(grid.cxp), f(grid.cym),
        f(grid.cyp), f(grid.dxhy), f(grid.dyhx), f(grid.uarear),
        prep.iceTmask.astype(jnp.float32), prep.iceUmask.astype(jnp.float32),
        f(prep.aiU), f(prep.umassdti), f(prep.fm), f(prep.waterx),
        f(prep.watery), f(prep.forcex), f(prep.forcey), f(prep.uvel_init),
        f(prep.vvel_init), f(prep.Cw), f(prep.TbU),
        f(strength), f(DminTarea), f(uocn), f(vocn),
    ]
    assert len(planes) == N_CONST
    return jnp.stack(planes)


def _unpack_const(c, bc):
    g = SimpleNamespace(
        dxT=c[0], dyT=c[1], cxm=c[2], cxp=c[3], cym=c[4], cyp=c[5],
        dxhy=c[6], dyhx=c[7], uarear=c[8], bc=bc)
    prep = DynPrep(
        iceTmask=c[9] > 0.5, iceUmask=c[10] > 0.5, aiU=c[11],
        umassdti=c[12], fm=c[13], waterx=c[14], watery=c[15],
        forcex=c[16], forcey=c[17], uvel_init=c[18], vvel_init=c[19],
        uvel=c[18], vvel=c[19], Cw=c[20], TbU=c[21])
    return g, prep, c[22], c[23], c[24], c[25]


def _pad_x(arr, H: int, nx_pad: int, x_cyclic: bool):
    """Add x halo columns (cyclic wrap values or zeros) and zero-pad the
    lane dimension to the 128-aligned width nx_pad."""
    nx = arr.shape[-1]
    if x_cyclic:
        arr = jnp.concatenate([arr[..., nx - H:], arr, arr[..., :H]],
                              axis=-1)
    else:
        arr = jnp.pad(arr, ((0, 0), (0, 0), (H, H)))
    extra = nx_pad - arr.shape[-1]
    if extra:
        arr = jnp.pad(arr, ((0, 0), (0, 0), (0, extra)))
    return arr


def _chunk_call(const_p, state, p: EvpParams, bc, k: int, tile_y: int,
                halo: int, interpret: bool):
    """One pallas call running k fused subcycles over y tiles.

    Both halos are materialized in HBM before the call: y via zero rows
    (open/closed ghost semantics), x via wrap-value (cyclic) or zero
    columns plus 128-lane alignment padding — inside the kernel every
    boundary is then plain zero-ghost ('open'), which `shift` implements
    as roll+mask (Mosaic-friendly)."""
    from ..core.halo import BC
    from ..dynamics.evp import stress_update

    C, ny_p, nx_pad = const_p.shape
    H = halo
    ny_pad = ny_p - 2 * H
    ntiles = ny_pad // tile_y
    state_p = jnp.pad(_pad_x(state, H, nx_pad, bc.x_cyclic),
                      ((0, 0), (H, H + ny_pad - state.shape[1]), (0, 0)))
    win = tile_y + 2 * H
    bc = BC(ew="open", ns="open")

    def kernel(const_hbm, state_hbm, donor_hbm, out_ref, cbuf, sbuf,
               sem0, sem1, sem2):
        del donor_hbm   # the output aliases this zero buffer's storage
        ty = pl.program_id(0)
        row0 = pl.multiple_of(ty * tile_y, 8)
        cp = pltpu.make_async_copy(
            const_hbm.at[:, pl.ds(row0, win), :], cbuf, sem0)
        sp_ = pltpu.make_async_copy(
            state_hbm.at[:, pl.ds(row0, win), :], sbuf, sem1)
        cp.start()
        sp_.start()
        cp.wait()
        sp_.wait()

        g, prep, strength, DminTarea, uocn, vocn = _unpack_const(cbuf[:], bc)
        st = sbuf[:]
        u, v = st[0], st[1]
        sp = st[2:6]
        sm = st[6:10]
        s12 = st[10:14]

        def body(_, carry):
            u, v, sp, sm, s12 = carry
            sp, sm, s12, strintx, strinty = stress_update(
                g, p, strength, DminTarea, u, v, sp, sm, s12, prep.iceTmask)
            u, v, _, _ = stepu_dense(u, v, strintx, strinty, prep, p,
                                     uocn, vocn)
            return (u, v, sp, sm, s12)

        u, v, sp, sm, s12 = jax.lax.fori_loop(0, k, body, (u, v, sp, sm, s12))
        sbuf[:] = jnp.concatenate([u[None], v[None], sp, sm, s12], axis=0)
        wr = pltpu.make_async_copy(
            sbuf.at[:, pl.ds(H, tile_y), :],
            out_ref.at[:, pl.ds(row0 + H, tile_y), :], sem2)
        wr.start()
        wr.wait()

    out = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        # the output aliases a dedicated zero donor buffer in HBM: keeps
        # the result out of scoped VMEM without read-after-write hazards
        # against the state input that tiles read halos from
        input_output_aliases={2: 0},
        out_shape=jax.ShapeDtypeStruct(
            (N_STATE, ny_pad + 2 * H, nx_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N_CONST, win, nx_pad), jnp.float32),
            pltpu.VMEM((N_STATE, win, nx_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(const_p, state_p, jnp.zeros_like(state_p))
    ny = state.shape[1]
    nx = state.shape[2]
    return out[:, H:H + ny, H:H + nx]


def evp_solve_fused(grid: Grid, p: EvpParams, prep: DynPrep, strength,
                    stressp, stressm, stress12, *, uocn, vocn,
                    k_fuse: int = 8, tile_y: int | None = None,
                    interpret: bool = False):
    """Drop-in replacement for dynamics.evp.evp_solve using the fused
    Pallas kernel. Falls back to the XLA loop for unsupported BCs."""
    from ..dynamics.evp import evp_solve, stress_update
    from .. import constants as cst

    if grid.bc.tripole or grid.bc.y_cyclic:
        return evp_solve(grid, p, prep, strength, stressp, stressm,
                         stress12, uocn=uocn, vocn=vocn)

    ny, nx = grid.shape
    if tile_y is None:
        # VMEM budget: scratch windows + the Mosaic output staging buffer
        # (full (N_STATE, ny_pad+2H, nx_pad) plane set) must fit in ~15MB
        H8 = -(-(2 * k_fuse + 2) // 8) * 8
        nx_eff = -(-(nx + 2 * H8) // 128) * 128
        out_bytes = N_STATE * (ny + 2 * H8 + 64) * nx_eff * 4
        budget = max(2e6, 15e6 - out_bytes) / 4.0 / \
            (N_CONST + N_STATE) / nx_eff
        tile_y = int(max(16, min(ny, budget - 2 * H8)))
    tile_y = max(8, (tile_y // 8) * 8)    # TPU sublane tiling constraint
    # halo covers the 2-cells-per-subcycle dependency cone, rounded up to
    # the (8, 128) HBM tile granularity so DMA windows stay aligned
    H = -(-(2 * k_fuse + 2) // 8) * 8

    DminTarea = (p.deltaminEVP * grid.tarea).astype(jnp.float32)
    zero3 = lambda s: jnp.where(prep.iceTmask[None], s, 0.0)
    const = _pack_const(grid, prep, strength, DminTarea, uocn, vocn)
    # pad the constant planes ONCE (they never change across chunks)
    nx_pad_c = -(-(nx + 2 * H) // 128) * 128
    ntiles_c = math.ceil(ny / tile_y)
    ny_pad_c = ntiles_c * tile_y
    const_p = jnp.pad(
        _pad_x(const, H, nx_pad_c, grid.bc.x_cyclic),
        ((0, 0), (H, H + ny_pad_c - ny), (0, 0)))
    state = jnp.concatenate([
        prep.uvel[None].astype(jnp.float32),
        prep.vvel[None].astype(jnp.float32),
        zero3(stressp).astype(jnp.float32),
        zero3(stressm).astype(jnp.float32),
        zero3(stress12).astype(jnp.float32)], axis=0)

    done = 0
    while done < p.ndte:
        k = min(k_fuse, p.ndte - done)
        state = _chunk_call(const_p, state, p, grid.bc, k, tile_y, H,
                            interpret)
        done += k

    u, v = state[0], state[1]
    sp, sm, s12 = state[2:6], state[6:10], state[10:14]

    # final force diagnostics (same tail as evp_solve)
    _, _, _, strintx, strinty = stress_update(
        grid, p, strength, DminTarea, u, v, sp, sm, s12, prep.iceTmask)
    Cb = prep.TbU / (jnp.sqrt(u ** 2 + v ** 2) + cst.u0)
    return (u, v, sp, sm, s12, strintx, strinty, -u * Cb, -v * Cb)
