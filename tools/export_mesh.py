"""Export the trained σ-field as a triangle mesh (.obj / colored .ply).

The reference carries this capability only in its dormant trainer
(nerf/pgc.py:519-537 save_mesh); here it is a first-class CLI over any
trained checkpoint:

    python tools/export_mesh.py --config cfg.txt [--res 128] [--iso 10]
        [--bound 2.0] [--color] [--out mesh.obj]

Loads the latest checkpoint of the experiment (same restore path as
--render_only), evaluates σ on a res³ grid inside [-bound, bound]³ with the
fine field (fused Pallas kernel on TPU), and runs host-side marching
tetrahedra (gbnerf_tpu/utils/mesh.py).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--iso", type=float, default=10.0,
                    help="raw-σ threshold (stable-dreamfusion default 10)")
    ap.add_argument("--bound", type=float, default=None,
                    help="grid half-width; default cp_bound or 2.0")
    ap.add_argument("--color", action="store_true",
                    help="query vertex colors (writes .ply)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from gbnerf_tpu.config import load_reference_config
    from gbnerf_tpu.core.fields import make_field_fn
    from gbnerf_tpu.train.checkpoint import CheckpointManager
    from gbnerf_tpu.train.state import create_train_state
    from gbnerf_tpu.utils.mesh import extract_field_mesh, write_obj, write_ply

    cfg = load_reference_config(args.config)
    t = cfg.train
    expdir = os.path.join(t.basedir, t.expname)
    state, coarse, fine = create_train_state(cfg, jax.random.PRNGKey(t.seed))
    ckpt = CheckpointManager(os.path.join(expdir, "ckpt"))
    step = ckpt.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoint found under {expdir}/ckpt")
    state = ckpt.restore(state)
    ckpt.close()

    model = fine if fine is not None else coarse
    key = "fine" if fine is not None else "coarse"
    field_fn = make_field_fn(model, state.params[key])

    bound = args.bound
    if bound is None:
        bound = getattr(cfg.field, "cp_bound", None) or 2.0
    out = args.out or os.path.join(
        expdir, f"mesh_{step:06d}.{'ply' if args.color else 'obj'}")

    res = extract_field_mesh(field_fn, resolution=args.res, bound=bound,
                             iso=args.iso, color=args.color)
    verts, faces = res[0], res[1]
    if len(faces) == 0:
        raise SystemExit(
            f"empty mesh at iso={args.iso}: the σ grid never crosses the "
            "threshold — try a lower --iso or a larger --bound")
    if args.color:
        write_ply(out, verts, faces, res[2])
    else:
        write_obj(out, verts, faces)
    print(f"export_mesh: step {step}, {len(verts)} verts / {len(faces)} "
          f"faces -> {out}")


if __name__ == "__main__":
    main()
