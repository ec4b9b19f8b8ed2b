"""Block-row sweeps for the three layered window kernels at benchmark geometry
(1/4-degree x 10 layers, T/S + full closure set) — picks the production
defaults. Differential scan timing; run on the real chip:

    python benchmarks/sweep_window_kernels.py
"""

import pathlib
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from examples.wind_driven_ts_gyre import build  # noqa: E402
from orthogonalsphericalshellgrids_tpu.models.layered import _fill3  # noqa: E402
from orthogonalsphericalshellgrids_tpu.ops.location import CC, CF, FC  # noqa: E402
from orthogonalsphericalshellgrids_tpu.utils.profiling import (  # noqa: E402
    scan_time_diff, stream_probe_gbps)

print("device:", jax.devices()[0].device_kind, flush=True)
model, state = build(nx=1440, ny=680, nz=10, substeps=30)
m = model.baro
u = _fill3(model, state.u, FC, -1)
v = _fill3(model, state.v, CF, -1)
c = _fill3(model, state.c, CC, 1)


def sweep(name, fn, blocks, init):
    for br in blocks:
        try:
            el = scan_time_diff(lambda x, _br=br: fn(x, _br), init,
                                lengths=(8, 24), n_outer=3)
            print(f"{name:10s} block_rows={br!s:5s} {el * 1e6:9.1f} us",
                  flush=True)
        except Exception as e:
            print(f"{name:10s} block_rows={br!s:5s} FAILED "
                  f"{type(e).__name__}: {str(e)[:90]}", flush=True)
    print(f"  probe {stream_probe_gbps():.0f} GB/s", flush=True)


def adv(x, br):
    # LAYERED mode — the production call signature (models/layered.py
    # tracer_tendency): g_pack + static dz select the layered flux-metric
    # path and the S=4 [IV, K_u, K_v, K_c] slab stride. (A round-5 audit
    # found the earlier sweep omitted g_pack, which silently fell back to
    # COLUMN mode and read the stride-4 pack at stride 3 — wrong factor
    # planes; timings re-taken with this fixed.)
    from orthogonalsphericalshellgrids_tpu.ops.pallas_adv import tracer_adv_pallas

    cq, uu, vv = x
    out = tracer_adv_pallas(cq, uu, vv, statics_packed=model.adv_pack,
                            g_pack=model.vert_g[3:5], dz=model.dz,
                            block_rows=br)
    return (out, uu, vv)


def mom(x, br):
    # packs ride in the carry: closure-captured arrays embed as HLO constants
    # and 413 the remote-compile tunnel (make_model's _kernel_packs note)
    from orthogonalsphericalshellgrids_tpu.ops.pallas_mom import momentum_pallas

    uu, vv, ms, ml = x
    gu, gv = momentum_pallas(uu, vv, ms, ml,
                             has_lap=m.nu_h > 0.0, has_drag=True,
                             block_rows=br)
    return (gu, gv, ms, ml)


def vert(x, br):
    from orthogonalsphericalshellgrids_tpu.ops.pallas_vert import vertical_pallas

    uu, vv, cq, vp, vg = x
    names = model.tracer_names
    dgu, dgv, dgc = vertical_pallas(
        uu, vv, cq, vp, vg, dz=model.dz, dzc=model.dzc,
        mode=model.buoyancy, g_b=model.g_b, alpha=model.alpha_T,
        beta=model.beta_S, T0=model.T0, S0=model.S0,
        it_T=names.index("T"), it_S=names.index("S"),
        nu_v=model.nu_v, kappa_v=model.kappa_v, block_rows=br)
    return (dgu, dgv, dgc, vp, vg)


if __name__ == "__main__":
    import sys as _s

    which = _s.argv[1] if len(_s.argv) > 1 else "all"
    if which in ("adv", "all"):
        sweep("adv", adv, [48, 80, 104, 128, 160, None], (c, u, v))
    if which in ("mom", "all"):
        sweep("mom", mom, [64, 104, 152, 232, None],
              (u, v, model.mom_static, model.mom_lay))
    if which in ("vert", "all"):
        sweep("vert", vert, [16, 24, 32, 40, None],
              (u, v, c, model.vert_pack, model.vert_g))
