"""Fused incremental-remapping tracer-flux Pallas kernel.

The exact-remap transport step (dynamics/remap_exact.py, the TPU-native
redesign of ice_transport_remap.F90 transport_integrals:3188) spends most
of its time in `_family_fluxes`: for each of 6 donor candidates x 2 edge
families it evaluates the tracer dependency-chain moment sums over the
full (ncat, NT, ny, nx) tracer stack and accumulates a spatially shifted
result. Under XLA each candidate becomes its own kLoop fusion that
re-reads the tracer reconstruction stacks and re-writes the 61 MB
accumulator — ~12 passes that measured ~9 ms of the 30 ms remap on a
v5e-1 at gx1 size, with another ~4 ms of one-hot `dot_general` parent
gathers whose layout choice (NT padded 25->32, minor-dim ny) taxes every
downstream op.

This kernel performs the whole candidate x family accumulation in ONE
pass over the tracer stacks:

 - inputs are pre-ghosted (1 ring; cyclic-x wrap or zero, matching
   core/halo.shift ghost semantics) and lane-aligned in XLA,
 - the grid is (ncat, y-tiles); each step DMAs the category's tracer
   window (tc|tx|ty planes), mass reconstruction planes and the
   per-candidate pentagon moments into VMEM,
 - donor access is a static row slice + lane roll inside VMEM,
 - the per-tracer dependency recursion (reference tracer_type 1/2/3
   chains) is resolved at TRACE time: `table` is static, so each flat
   tracer's type picks its exact expression — no type masks, no gathers;
   parent/grandparent planes are memoized VMEM reads,
 - the 6-candidate accumulation lives in registers/VMEM and is written
   once, scaled by sign * areafac.

HBM traffic: read 3 tracer stacks + moments once, write 2 flux stacks
once (~0.5 GB at gx1) vs the XLA path's ~7 GB.

Round 4 adds `transport_fused` — the FULL transport as one kernel:
tracer reconstruction (limited gradients), edge fluxes AND the
flux-divergence update in a single tile pass over the raw (am, trm)
state. The reconstruction stacks, flux stacks, and their XLA pack/
unpack passes never exist; only the edge-moment geometry (2 small
planes in, 120 moment planes out) stays in XLA. Validity is managed by
a 3-ring ghost frame (limiter depth 1 -> donor fluxes depth 1 ->
divergence depth 1; window = TY+8 rows holds the whole chain).
Measured at gx1 on v5e-1 (in-jit steady state): transport 14.7 ms
(flux-only kernel path) -> 5.2 ms; full coupled step 28.9 -> 19.3 ms.
Accuracy: vs an f64 oracle of the same scheme, the one-pass kernel's
chain-solved tracers are ~3x CLOSER (4.6e-4 mean rel) than the XLA f32
path (1.3e-3) — fewer materialization/rounding points.

Supported: ew 'cyclic'/'open'/'closed', ns 'open'/'closed', f32.
Tripole / y-cyclic / f64 use the XLA path (remap_exact._family_fluxes).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# candidate donor offsets (dj, di), in remap_exact.CANDS order
# (("T",-1),("T",0),("T",1),("B",-1),("B",0),("B",1));
# N family: T row = cell north of the edge, B row = the cell itself;
# E family frame x = north: T = east column, B = home column.
OFFS_N = ((1, -1), (1, 0), (1, 1), (0, -1), (0, 0), (0, 1))
OFFS_E = ((-1, 1), (0, 1), (1, 1), (-1, 0), (0, 0), (1, 0))

_NMOM = 10


def _roll_x(a, di):
    return jnp.roll(a, -di, axis=-1) if di else a


def _kernel_body(trbuf, massbuf, mombuf, out_ref, *, NT, TY, ttype, par,
                 gpar):
    """One (y-tile, category) step: accumulate both families' tracer
    moment sums over the 6 donor candidates.

    The parent moment-sum triple (s1, s2, s3) is memoized by parent
    plane per candidate: reference tracer trees hang many children off
    few parents (qice/sice layers all parent to hi), so the 15-op triple
    amortizes to ~6 ops per type-2 child. Roll memoization stays
    per-candidate: keeping rolled full windows alive across candidates
    was measured to blow the Mosaic VMEM stack (16.6 MB > 16 MB)."""
    for fam, offs in enumerate((OFFS_N, OFFS_E)):
        acc = [None] * NT
        maccC = macc0 = None
        for ci, (dj, di) in enumerate(offs):
            memo = {}

            def d(k, dj=dj, di=di, memo=memo):
                """Donor plane k of the tracer window (static slice+roll)."""
                if k not in memo:
                    memo[k] = _roll_x(trbuf[k, 1 + dj:1 + dj + TY, :], di)
                return memo[k]

            mi = _roll_x(massbuf[0, 1 + dj:1 + dj + TY, :], di)
            mxi = _roll_x(massbuf[1, 1 + dj:1 + dj + TY, :], di)
            myi = _roll_x(massbuf[2, 1 + dj:1 + dj + TY, :], di)
            m = [mombuf[fam * 6 * _NMOM + ci * _NMOM + k, 1:1 + TY, :]
                 for k in range(_NMOM)]
            # open-water (aice0) mass reconstruction: category-invariant,
            # carried in the moment buffer tail
            m0i = _roll_x(mombuf[2 * 6 * _NMOM + 2, 1 + dj:1 + dj + TY, :],
                          di)
            m0xi = _roll_x(mombuf[2 * 6 * _NMOM + 3, 1 + dj:1 + dj + TY, :],
                           di)
            m0yi = _roll_x(mombuf[2 * 6 * _NMOM + 4, 1 + dj:1 + dj + TY, :],
                           di)
            # MONO order: 00,10,01,20,11,02,30,21,12,03
            (m00, m10, m01, m20, m11, m02, m30, m21, m12, m03) = m
            C1 = mi * m00 + mxi * m10 + myi * m01   # msum_i
            C2 = mi * m10 + mxi * m20 + myi * m11   # mxsum
            C3 = mi * m01 + mxi * m11 + myi * m02   # mysum
            C4 = mi * m20 + mxi * m30 + myi * m21   # mxxsum
            C5 = mi * m11 + mxi * m21 + myi * m12   # mxysum
            C6 = mi * m02 + mxi * m12 + myi * m03   # myysum

            # mass (area) transports: the category's and the open-water
            # row's msum (C1 IS the category's)
            ms0 = m0i * m00 + m0xi * m10 + m0yi * m01
            maccC = C1 if maccC is None else maccC + C1
            macc0 = ms0 if macc0 is None else macc0 + ms0

            psum = {}

            def parent_sums(p, dj=dj, di=di, psum=psum, C=(C1, C2, C3,
                                                           C4, C5, C6)):
                """(s1, s2, s3) moment sums of parent plane p's
                reconstruction (first moment + x/y second moments)."""
                if p not in psum:
                    C1, C2, C3, C4, C5, C6 = C
                    tcp, txp, typ = d(p), d(NT + p), d(2 * NT + p)
                    psum[p] = (C1 * tcp + C2 * txp + C3 * typ,
                               C2 * tcp + C4 * txp + C5 * typ,
                               C3 * tcp + C5 * txp + C6 * typ)
                return psum[p]

            pg3 = {}
            for n in range(NT):
                tt = int(ttype[n])
                if tt == 1:
                    mts = C1 * d(n) + C2 * d(NT + n) + C3 * d(2 * NT + n)
                elif tt == 2:
                    s1, s2, s3 = parent_sums(int(par[n]))
                    mts = s1 * d(n) + s2 * d(NT + n) + s3 * d(2 * NT + n)
                else:
                    p, g = int(par[n]), int(gpar[n])
                    if (p, g) not in pg3:
                        g1, g2, g3 = parent_sums(g)
                        pg3[(p, g)] = (g1 * d(p) + g2 * d(NT + p) +
                                       g3 * d(2 * NT + p))
                    mts = pg3[(p, g)] * d(n)
                acc[n] = mts if acc[n] is None else acc[n] + mts

        af = mombuf[2 * 6 * _NMOM + fam, 1:1 + TY, :]
        for n in range(NT):
            out_ref[0, fam * NT + n] = -(acc[n] * af)   # sign = -1
        out_ref[0, 2 * NT + fam] = -(maccC * af)
        out_ref[0, 2 * NT + 2 + fam] = -(macc0 * af)


def tracer_fluxes_fused(grid, mom_n, mom_e, mc, mx, my, tc, tx, ty, table,
                        *, tstack=None, tile_y: int = 16,
                        interpret: bool = False):
    """Tracer mass*tracer transports across N and E edges in one fused
    kernel pass. Returns (mtflxe, mtflxn), each (ncat, NT, ny, nx),
    numerically matching remap_exact._family_fluxes (sign=-1, areafac =
    narea*npm / earea*epm).

    mom_n / mom_e: (6, 10, ny, nx) per-candidate translated pentagon
    moments (pentagon_cell_moments output, CANDS order). tstack: the
    (ncat, 3*NT, ny, nx) pre-packed [tc|tx|ty] stack construct_fields
    emits — passing it avoids a 0.2 GB concat on the hot path (the
    XLA-side ghost/concat packing measured ~2.5 ms of the round-3
    kernel's 5.6 ms at gx1).

    The window DMAs are single-buffered: a double-buffered variant was
    measured (round 4) to overflow the 16 MB VMEM at tile_y=16 and to
    run SLOWER at tile_y=8 (more grid steps of fixed cost outweigh the
    overlap). The category-invariant moment planes load once per tile
    (category is the innermost grid dimension), cutting their DMA
    traffic by ncat."""
    bc = grid.bc
    if bc.tripole or bc.y_cyclic:
        raise ValueError("fused remap kernel: tripole/y-cyclic unsupported")
    if tstack is None:
        tstack = jnp.concatenate([tc, tx, ty], axis=1)
    if jnp.dtype(tstack.dtype) != jnp.float32:
        # silent f32 casting would lose precision in a double-precision
        # run; callers must use the XLA path (remap_exact dispatch does)
        raise ValueError(f"fused remap kernel is f32-only, got "
                         f"{tstack.dtype}")
    ncat, NT3, ny, nx = tstack.shape
    NT = NT3 // 3
    f32 = jnp.float32
    TY = max(8, (tile_y // 8) * 8)
    ntiles = math.ceil(ny / TY)
    TYW = TY + 8                      # DMA window (sublane-aligned slack)
    nyg = ntiles * TY + 8             # 1 top ghost + ny + bottom ghost/pad
    nxg = -(-(nx + 2) // 128) * 128

    def ghost(a):
        """(…, ny, nx) -> (…, nyg, nxg): 1 ghost ring (wrap-x if cyclic,
        zeros otherwise; zero y ghosts = open/closed shift semantics),
        zero-padded to the aligned frame."""
        if bc.x_cyclic:
            a = jnp.concatenate([a[..., -1:], a, a[..., :1]], axis=-1)
        else:
            a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(1, 1)])
        pad = [(0, 0)] * (a.ndim - 2) + [(1, nyg - ny - 1),
                                         (0, nxg - nx - 2)]
        return jnp.pad(a, pad)

    tr_pack = ghost(tstack)
    mass_pack = ghost(jnp.stack(
        [mc[1:], mx[1:], my[1:]], axis=1).astype(f32))
    af_n = (grid.narea * grid.npm).astype(f32)
    af_e = (grid.earea * grid.epm).astype(f32)
    mom_pack = ghost(jnp.concatenate([
        mom_n.reshape(6 * _NMOM, ny, nx).astype(f32),
        mom_e.reshape(6 * _NMOM, ny, nx).astype(f32),
        af_n[None], af_e[None],
        mc[0][None].astype(f32), mx[0][None].astype(f32),
        my[0][None].astype(f32)], axis=0))

    from ..dynamics.remap_exact import _TableArrays
    ta = _TableArrays(table)

    def kernel(tr_hbm, mass_hbm, mom_hbm, out_ref, trbuf, massbuf, mombuf,
               s_tr, s_mass, s_mom):
        t = pl.program_id(0)
        c = pl.program_id(1)
        row0 = pl.multiple_of(t * TY, 8)
        cps = [pltpu.make_async_copy(
                   tr_hbm.at[c, :, pl.ds(row0, TYW), :], trbuf, s_tr),
               pltpu.make_async_copy(
                   mass_hbm.at[c, :, pl.ds(row0, TYW), :], massbuf,
                   s_mass)]
        for cp in cps:
            cp.start()

        # the moment planes are category-invariant: with the category
        # innermost in the grid, DMA them only on the first category of
        # each tile (the scratch persists across grid steps); the stall
        # happens ntiles times, not nsteps
        @pl.when(c == 0)
        def _():
            cp = pltpu.make_async_copy(
                mom_hbm.at[:, pl.ds(row0, TYW), :], mombuf, s_mom)
            cp.start()
            cp.wait()

        for cp in cps:
            cp.wait()
        _kernel_body(trbuf, massbuf, mombuf, out_ref,
                     NT=NT, TY=TY, ttype=ta.ttype, par=ta.par,
                     gpar=ta.gpar)

    out = pl.pallas_call(
        kernel,
        grid=(ntiles, ncat),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 3,
        out_specs=pl.BlockSpec((1, 2 * NT + 4, TY, nxg),
                               lambda t, c: (c, 0, t, 0)),
        out_shape=jax.ShapeDtypeStruct((ncat, 2 * NT + 4, ntiles * TY, nxg),
                                       f32),
        scratch_shapes=[
            pltpu.VMEM((3 * NT, TYW, nxg), f32),
            pltpu.VMEM((3, TYW, nxg), f32),
            pltpu.VMEM((2 * 6 * _NMOM + 5, TYW, nxg), f32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(tr_pack, mass_pack, mom_pack)

    dt = tstack.dtype
    mtflxn = out[:, :NT, :ny, 1:1 + nx].astype(dt)
    mtflxe = out[:, NT:2 * NT, :ny, 1:1 + nx].astype(dt)
    # mass (area) fluxes: open-water row (category-invariant, take c=0)
    # + per-category planes -> (ncat+1, ny, nx)
    mflxn = jnp.concatenate(
        [out[0, 2 * NT + 2][None], out[:, 2 * NT]],
        axis=0)[:, :ny, 1:1 + nx].astype(dt)
    mflxe = jnp.concatenate(
        [out[0, 2 * NT + 3][None], out[:, 2 * NT + 1]],
        axis=0)[:, :ny, 1:1 + nx].astype(dt)
    return mflxe, mflxn, mtflxe, mtflxn


# ===========================================================================
# Full fused transport kernel (round 4): construct_fields + edge fluxes +
# update_fields in ONE tile pass — reads the raw (am, trm) state windows,
# writes the updated state. Eliminates the tc/tx/ty reconstruction stacks,
# the 2x(ncat, NT) flux stacks and the separate XLA update pass entirely
# (~7 ms of the 14.7 ms transport at gx1 on v5e-1). Numerics mirror
# dynamics/remap_exact's XLA path op-for-op (same limiter, same chain
# solves); validity is managed by a 3-ring ghost frame: limiter (depth 1)
# -> donor fluxes (depth 1) -> divergence (depth 1).
# ===========================================================================


def _roll2(a, dj, di):
    """shift semantics on window planes: out[j, i] = a[j+dj, i+di]."""
    if dj:
        a = jnp.roll(a, -dj, axis=-2)
    if di:
        a = jnp.roll(a, -di, axis=-1)
    return a


def _lim_grad_win(phi, pm, cnx, cny, puny):
    """Window-local limited_gradient (remap_exact.limited_gradient,
    reference limited_gradient:1295): phi/pm full-window (W, L) planes;
    cnx/cny displaced-center offsets (arrays or 0.0)."""
    pmn = phi
    pmx = phi
    axis = {}
    for (dj, di) in ((1, -1), (1, 0), (1, 1), (0, -1), (0, 1),
                     (-1, -1), (-1, 0), (-1, 1)):
        pmv = _roll2(pm, dj, di)
        v = pmv * _roll2(phi, dj, di) + (1.0 - pmv) * phi
        if dj == 0 or di == 0:
            axis[(dj, di)] = v
        pmn = jnp.minimum(pmn, v)
        pmx = jnp.maximum(pmx, v)
    gx = (axis[(0, 1)] - axis[(0, -1)]) * 0.5
    gy = (axis[(1, 0)] - axis[(-1, 0)]) * 0.5
    pmn = pmn - phi
    pmx = pmx - phi
    w1 = (0.5 - cnx) * gx + (0.5 - cny) * gy
    w2 = (0.5 - cnx) * gx - (0.5 + cny) * gy
    w3 = -(0.5 + cnx) * gx - (0.5 + cny) * gy
    w4 = (0.5 - cny) * gy - (0.5 + cnx) * gx
    qmn = jnp.minimum(jnp.minimum(w1, w2), jnp.minimum(w3, w4))
    qmx = jnp.maximum(jnp.maximum(w1, w2), jnp.maximum(w3, w4))
    lim1 = jnp.where(jnp.abs(qmn) > jnp.abs(pmn),
                     jnp.maximum(0.0, pmn / jnp.where(qmn != 0.0, qmn, 1.0)),
                     1.0)
    lim2 = jnp.where(jnp.abs(qmx) > jnp.abs(pmx),
                     jnp.maximum(0.0, pmx / jnp.where(qmx != 0.0, qmx, 1.0)),
                     1.0)
    lim = jnp.minimum(lim1, lim2) * pm
    return lim * gx, lim * gy


def _mass_recon(am, hm, puny):
    """(mx, my, mxav, myav) for one mass plane (construct_fields mass
    part; centers at the geometric origin, offsets = mass centroid)."""
    mx, my = _lim_grad_win(am, hm, 0.0, 0.0, puny)
    minv = jnp.where(am > puny, 1.0 / jnp.maximum(am, puny), 0.0)
    XXAV = 1.0 / 12.0
    return mx, my, mx * XXAV * minv, my * XXAV * minv


def _construct_win(trm, am, mx, my, mxav, myav, hm, puny, ta):
    """Window-local tracer reconstruction for ONE category
    (construct_fields type-1/2/3 passes on the type-grouped table).
    trm: list of NT (W, L) planes. Returns (tc, tx, ty) plane lists."""
    K1, K2, K3 = ta.K1, ta.K2, ta.K3
    mmask = (am > puny).astype(am.dtype)
    XXAV = 1.0 / 12.0
    tc = [None] * (K1 + K2 + K3)
    tx = [None] * (K1 + K2 + K3)
    ty = [None] * (K1 + K2 + K3)
    ctx1 = {}
    cty1 = {}
    for n in range(K1):
        gx, gy = _lim_grad_win(trm[n], mmask, mxav, myav, puny)
        tc[n] = trm[n] - gx * mxav - gy * myav
        tx[n] = gx
        ty[n] = gy
        if ta.has_dep[n]:
            w2 = am * gx + mx * tc[n]
            w3 = am * gy + my * tc[n]
            denom = am * trm[n]
            dinv = jnp.where(jnp.abs(denom) > puny,
                             1.0 / jnp.where(denom != 0.0, denom, 1.0),
                             0.0)
            ctx1[n] = w2 * XXAV * dinv
            cty1[n] = w3 * XXAV * dinv
    for n in range(K1, K1 + K2):
        p = int(ta.par[n])
        cnx = ctx1[p]
        cny = cty1[p]
        pmask = mmask * (jnp.abs(trm[p]) > puny).astype(am.dtype)
        gx, gy = _lim_grad_win(trm[n], pmask, cnx, cny, puny)
        tc[n] = trm[n] - gx * cnx - gy * cny
        tx[n] = gx
        ty[n] = gy
    for n in range(K1 + K2, K1 + K2 + K3):
        tc[n] = trm[n]
        tx[n] = jnp.zeros_like(trm[n])
        ty[n] = jnp.zeros_like(trm[n])
    return tc, tx, ty


def _fluxes_win(tc, tx, ty, mc, mx, my, m0c, m0x, m0y, mom, af_n, af_e,
                *, NT, ttype, par, gpar):
    """Window-local edge fluxes for both families (the _kernel_body
    accumulation on full-window planes). mom: callable (fam, ci, k) ->
    moment plane. Returns (mtflxe, mtflxn, mflxe_c, mflxn_c, mflx0e,
    mflx0n) — tracer flux plane lists + category/open-water mass."""
    outs = {}
    for fam, offs in enumerate((OFFS_N, OFFS_E)):
        acc = [None] * NT
        maccC = macc0 = None
        for ci, (dj, di) in enumerate(offs):
            memo = {}

            def d(which, k, dj=dj, di=di, memo=memo):
                key = (which, k)
                if key not in memo:
                    src = {"c": tc, "x": tx, "y": ty}[which][k]
                    memo[key] = _roll2(src, dj, di)
                return memo[key]

            mi = _roll2(mc, dj, di)
            mxi = _roll2(mx, dj, di)
            myi = _roll2(my, dj, di)
            m0i = _roll2(m0c, dj, di)
            m0xi = _roll2(m0x, dj, di)
            m0yi = _roll2(m0y, dj, di)
            m = [mom(fam, ci, k) for k in range(_NMOM)]
            (m00, m10, m01, m20, m11, m02, m30, m21, m12, m03) = m
            C1 = mi * m00 + mxi * m10 + myi * m01
            C2 = mi * m10 + mxi * m20 + myi * m11
            C3 = mi * m01 + mxi * m11 + myi * m02
            C4 = mi * m20 + mxi * m30 + myi * m21
            C5 = mi * m11 + mxi * m21 + myi * m12
            C6 = mi * m02 + mxi * m12 + myi * m03
            ms0 = m0i * m00 + m0xi * m10 + m0yi * m01
            maccC = C1 if maccC is None else maccC + C1
            macc0 = ms0 if macc0 is None else macc0 + ms0

            psum = {}

            def parent_sums(p, psum=psum, C=(C1, C2, C3, C4, C5, C6),
                            d=d):
                if p not in psum:
                    C1, C2, C3, C4, C5, C6 = C
                    tcp, txp, typ = d("c", p), d("x", p), d("y", p)
                    psum[p] = (C1 * tcp + C2 * txp + C3 * typ,
                               C2 * tcp + C4 * txp + C5 * typ,
                               C3 * tcp + C5 * txp + C6 * typ)
                return psum[p]

            pg3 = {}
            for n in range(NT):
                tt = int(ttype[n])
                if tt == 1:
                    mts = (C1 * d("c", n) + C2 * d("x", n) +
                           C3 * d("y", n))
                elif tt == 2:
                    s1, s2, s3 = parent_sums(int(par[n]))
                    mts = (s1 * d("c", n) + s2 * d("x", n) +
                           s3 * d("y", n))
                else:
                    p, g = int(par[n]), int(gpar[n])
                    if (p, g) not in pg3:
                        g1, g2, g3 = parent_sums(g)
                        pg3[(p, g)] = (g1 * d("c", p) + g2 * d("x", p) +
                                       g3 * d("y", p))
                    mts = pg3[(p, g)] * d("c", n)
                acc[n] = mts if acc[n] is None else acc[n] + mts

        af = af_n if fam == 0 else af_e
        outs[fam] = ([-(a * af) for a in acc], -(maccC * af),
                     -(macc0 * af))
    mtflxn, mflxn_c, mflx0n = outs[0]
    mtflxe, mflxe_c, mflx0e = outs[1]
    return mtflxe, mtflxn, mflxe_c, mflxn_c, mflx0e, mflx0n


def _update_win(am_old, trm, mtflxe, mtflxn, mflxe, mflxn, tarear, tmask,
                puny, ta):
    """Window-local update_fields for one category: flux divergences,
    mass floor, type-grouped new-value chain solves. Returns
    (am_new, trm_new plane list)."""
    K1, K2, K3 = ta.K1, ta.K2, ta.K3
    NT = K1 + K2 + K3

    def div(fe, fn):
        return fe - _roll2(fe, 0, -1) + fn - _roll2(fn, -1, 0)

    am_pre = am_old - div(mflxe, mflxn) * tarear
    am_new = jnp.where(tmask, jnp.maximum(am_pre, 0.0), 0.0)
    mm = am_new
    # weight-chain floors at puny + physical range rails: identical
    # semantics to remap_exact.update_fields (see its comments; the two
    # engines must stay numerically paired for the on-device equivalence
    # check in bench.py)
    mm_pos = mm > puny

    # old chain products (remap_exact._chain_product, per plane)
    prods = [None] * NT
    for n in range(K1):
        prods[n] = am_old * trm[n]
    for n in range(K1, K1 + K2):
        prods[n] = trm[n] * prods[int(ta.par[n])]
    for n in range(K1 + K2, NT):
        prods[n] = trm[n] * prods[int(ta.par[n])]

    dsafe = lambda d: jnp.where(d != 0.0, d, 1.0)
    out = [None] * NT
    for n in range(K1):
        num = prods[n] - div(mtflxe[n], mtflxn[n]) * tarear
        out[n] = jnp.where(mm_pos, num / dsafe(mm), 0.0)
    for n in range(K1, K1 + K2):
        tp = out[int(ta.par[n])]
        num = prods[n] - div(mtflxe[n], mtflxn[n]) * tarear
        out[n] = jnp.where(mm_pos & (jnp.abs(tp) > puny),
                           num / dsafe(mm * tp), 0.0)
    for n in range(K1 + K2, NT):
        tp2 = out[int(ta.par[n])]
        gp = out[int(ta.gpar[n])]
        num = prods[n] - div(mtflxe[n], mtflxn[n]) * tarear
        out[n] = jnp.where(mm_pos & (jnp.abs(tp2) > puny) &
                           (jnp.abs(gp) > puny),
                           num / dsafe(mm * tp2 * gp), 0.0)
    for n in range(NT):
        lo, hi = float(ta.lo[n]), float(ta.hi[n])
        if lo > -1e30:
            out[n] = jnp.maximum(out[n], lo)
        if hi < 1e30:
            out[n] = jnp.minimum(out[n], hi)
    return am_pre, out


def transport_fused(grid, mom_n, mom_e, am, trm, table, *,
                    tile_y: int = 8, interpret: bool = False):
    """Full fused transport: (am, trm) -> (am_new, trm_new) in one
    Pallas pass (construct + fluxes + update; see section header).

    am: (ncat+1, ny, nx); trm: (ncat, NT, ny, nx); mom_n/mom_e:
    (6, 10, ny, nx) translated pentagon moments. The open-water row's
    mass reconstruction is computed once per tile (category-invariant)
    and persisted in scratch."""
    bc = grid.bc
    if bc.tripole or bc.y_cyclic:
        raise ValueError("fused transport kernel: tripole/y-cyclic "
                         "unsupported")
    if jnp.dtype(trm.dtype) != jnp.float32:
        raise ValueError(f"fused transport kernel is f32-only, got "
                         f"{trm.dtype}")
    ncat, NT, ny, nx = trm.shape
    f32 = jnp.float32
    TY = max(8, (tile_y // 8) * 8)
    ntiles = math.ceil(ny / TY)
    G = 3                              # ghost ring width
    W = TY + 8                         # window rows (G + TY + 5 pad)
    nyg = ntiles * TY + 8              # frame rows: 3 ghosts + ny + pad
    L = -(-(nx + 2 * G) // 128) * 128

    def ghost(a):
        """(…, ny, nx) -> (…, nyg, L): 3-ring ghost frame (wrap-x if
        cyclic, zeros otherwise; zero y ghosts = open/closed shift
        semantics)."""
        if bc.x_cyclic:
            a = jnp.concatenate([a[..., -G:], a, a[..., :G]], axis=-1)
        else:
            a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(G, G)])
        pad = [(0, 0)] * (a.ndim - 2) + [(G, nyg - ny - G),
                                         (0, L - nx - 2 * G)]
        return jnp.pad(a, pad)

    from ..dynamics.remap_exact import _TableArrays
    from .. import constants as cst
    ta = _TableArrays(table)
    puny = float(cst.puny)

    trm_pack = ghost(trm)
    am_pack = ghost(am)
    af_n = (grid.narea * grid.npm).astype(f32)
    af_e = (grid.earea * grid.epm).astype(f32)
    mom_pack = ghost(jnp.concatenate([
        mom_n.reshape(6 * _NMOM, ny, nx).astype(f32),
        mom_e.reshape(6 * _NMOM, ny, nx).astype(f32),
        af_n[None], af_e[None],
        grid.tarear[None].astype(f32),
        grid.hm[None].astype(f32)], axis=0))
    NMOMP = 2 * 6 * _NMOM + 4

    def kernel(trm_hbm, am_hbm, mom_hbm, out_ref, trbuf, ambuf, ambuf0,
               mombuf, m0buf, s_tr, s_am, s_am0, s_mom):
        t = pl.program_id(0)
        c = pl.program_id(1)
        row0 = pl.multiple_of(t * TY, 8)
        c1 = jnp.asarray(c + 1, jnp.int32)
        cps = [pltpu.make_async_copy(
                   trm_hbm.at[c, :, pl.ds(row0, W), :], trbuf, s_tr),
               pltpu.make_async_copy(
                   am_hbm.at[c1, pl.ds(row0, W), :], ambuf, s_am)]
        for cp in cps:
            cp.start()

        @pl.when(c == 0)
        def _():
            cp0 = pltpu.make_async_copy(
                am_hbm.at[0, pl.ds(row0, W), :], ambuf0, s_am0)
            cpm = pltpu.make_async_copy(
                mom_hbm.at[:, pl.ds(row0, W), :], mombuf, s_mom)
            cp0.start()
            cpm.start()
            cp0.wait()
            cpm.wait()
            # open-water mass reconstruction: category-invariant
            hm0 = mombuf[NMOMP - 1]
            m0x, m0y, _, _ = _mass_recon(ambuf0[...], hm0, puny)
            m0buf[0] = m0x
            m0buf[1] = m0y

        for cp in cps:
            cp.wait()

        hm = mombuf[NMOMP - 1]
        tarear = mombuf[NMOMP - 2]
        afn = mombuf[NMOMP - 4]
        afe = mombuf[NMOMP - 3]
        amc = ambuf[...]
        mx, my, mxav, myav = _mass_recon(amc, hm, puny)
        trm_pl = [trbuf[n] for n in range(NT)]
        tc, tx, ty = _construct_win(trm_pl, amc, mx, my, mxav, myav, hm,
                                    puny, ta)

        def mom(fam, ci, k):
            return mombuf[fam * 6 * _NMOM + ci * _NMOM + k]

        mtflxe, mtflxn, mflxe_c, mflxn_c, mflx0e, mflx0n = _fluxes_win(
            tc, tx, ty, amc, mx, my, ambuf0[...], m0buf[0], m0buf[1],
            mom, afn, afe, NT=NT, ttype=ta.ttype, par=ta.par,
            gpar=ta.gpar)

        tmask = hm > 0.5
        am_pre, trm_new = _update_win(amc, trm_pl, mtflxe, mtflxn,
                                      mflxe_c, mflxn_c, tarear, tmask,
                                      puny, ta)
        # open-water area update (c-invariant; XLA takes the c=0 plane).
        # Pre-floor planes are emitted so the XLA side applies the same
        # negative-mass detection + floor as update_fields.
        def divp(fe, fn):
            return fe - _roll2(fe, 0, -1) + fn - _roll2(fn, -1, 0)
        am0_pre = ambuf0[...] - divp(mflx0e, mflx0n) * tarear

        for n in range(NT):
            out_ref[0, n] = trm_new[n][G:G + TY, :]
        out_ref[0, NT] = am_pre[G:G + TY, :]
        out_ref[0, NT + 1] = am0_pre[G:G + TY, :]

    out = pl.pallas_call(
        kernel,
        grid=(ntiles, ncat),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 3,
        out_specs=pl.BlockSpec((1, NT + 2, TY, L),
                               lambda t, c: (c, 0, t, 0)),
        out_shape=jax.ShapeDtypeStruct((ncat, NT + 2, ntiles * TY, L),
                                       f32),
        scratch_shapes=[
            pltpu.VMEM((NT, W, L), f32),
            pltpu.VMEM((W, L), f32),
            pltpu.VMEM((W, L), f32),
            pltpu.VMEM((NMOMP, W, L), f32),
            pltpu.VMEM((2, W, L), f32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(trm_pack, am_pack, mom_pack)

    dt = trm.dtype
    trm_new = out[:, :NT, :ny, G:G + nx].astype(dt)
    am_pre = jnp.concatenate(
        [out[0, NT + 1][None], out[:, NT]], axis=0)[:, :ny,
                                                    G:G + nx].astype(dt)
    return am_pre, trm_new
